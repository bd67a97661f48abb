package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.QueryRegistry

/** Smoke: every registered query runs at sf0.001 and returns rows; the
  * DuckDB hash-compare itself is the driver's gate (tools/verify_local.py
  * reproduces it locally). */
class QueryRegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("registry names are unique and every oracle key has a query") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} executes and returns rows") {
      assert(q.run(spark, dir).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("percentile_approx stays within 5% of exact quartiles (q58 self-check)") {
    import org.apache.spark.sql.functions._
    val rows = QueryRegistry.byName("q58_approx_quantile")
      .run(spark, dir).collect()
    assert(rows.length % 3 === 0) // three quartile rows per flag
    // exact percentile runs ONLY here at test SF — it buffers whole
    // groups in memory, so it must never ride in the registry query
    val exact = Tables.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("eq"))
      .select(col("l_returnflag"), posexplode(col("eq")))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val a = r.getAs[Double]("approx")
      val q = r.getAs[Double]("quantile")
      val e = exact((r.getAs[String]("l_returnflag"), (q / 0.25).round.toInt - 1))
      assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e at q=$q")
    }
  }

  test("approx_count_distinct stays within 5% of exact (Q17 self-check)") {
    import org.apache.spark.sql.functions._
    val rows = QueryRegistry.byName("q17b_approx_distinct")
      .run(spark, dir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
