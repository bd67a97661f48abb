package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (where SQL-expressible)
  * a DuckDB oracle twin over the same parquet tables. The driver hash-
  * compares the two at sf0.01 (CORRECTNESS gate); queries without an
  * oracle get a rows-only check.
  *
  * Determinism contract for oracle queries:
  *   - every query ends in a total-order ORDER BY (unique key suffix);
  *   - money aggregates run in exact DECIMAL then cast to DOUBLE;
  *   - ratios/averages are written as CAST(exact_sum AS DOUBLE)/count in
  *     BOTH engines so the float ops are identical;
  *   - column aliases match the oracle exactly (driver sorts by name).
  */
final case class EngineQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  lazy val all: Seq[EngineQuery] =
    PipelineQueries.all ++ RelationalQueries.all ++ WindowQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ OperatorQueries.all ++
      BatteryQueries.all ++ CorpusQueries.all ++ StatsQueries.all

  lazy val byName: Map[String, EngineQuery] = all.map(q => q.name -> q).toMap
}
