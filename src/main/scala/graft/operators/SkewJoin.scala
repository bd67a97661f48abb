package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (fact) side into
  * `saltFactor` sub-keys and replicate the build (dim) side across all
  * salts — the hot key's rows spread over `saltFactor` reducers instead
  * of one straggler.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers the
  * common case at runtime; explicit salting remains the tool when a key's
  * skew is extreme or the join is not an AQE-supported shape.
  *
  * The salt is derived by hashing the fact row's other columns (never
  * rand()) so retries and re-runs are deterministic.
  */
object SkewJoin {

  /** Inner equi-join `fact.key = dim.key` with salting. `saltSource` must
    * be fact-side columns that spread the hot key's rows (e.g. a row id). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = fact.withColumn("__salt",
      pmod(hash(saltSource), lit(saltFactor)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
