package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, attach the most recent
  * right row at or before its timestamp, per key.
  *
  * Composed from built-ins (SURVEY §4.3 preference order (a)): union the
  * two sides tagged, then one ignore-nulls last_value window per key
  * ordered by time. Cost is a single shuffle on the key + one sort — no
  * range-join explosion, no custom SparkPlan needed; at 100 TB this is
  * the same shape as any keyed window aggregation.
  *
  * Ties (equal timestamps) resolve right-row-first so a same-instant
  * quote is visible to the trade, the conventional as-of semantics.
  */
object AsOfJoin {

  /** leftDf(keyCol, tsCol, ...) asof rightDf(keyCol, tsCol, valueCols*).
    * Returns left rows + `asof_<valueCol>` columns (null when no right
    * row precedes). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val leftTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        left.columns.filterNot(c => c == keyCol || c == tsCol)
          .map(col) ++
        valueCols.map(v => lit(null).cast(right.schema(v).dataType)
          .as(s"__r_$v")): _*)
    val rightTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        left.columns.filterNot(c => c == keyCol || c == tsCol)
          .map(c => if (right.columns.contains(c)) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(v => col(v).as(s"__r_$v")): _*)
    // right rows sort before left rows at the same timestamp (__side asc);
    // tieBreak columns make the order total when timestamps can collide
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: col("__side") +: tieBreak.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = leftTagged.unionByName(rightTagged)
      .select(col("*") +:
        valueCols.map(v =>
          last(col(s"__r_$v"), ignoreNulls = true).over(w)
            .as(s"asof_$v")): _*)
    joined.filter(col("__side") === 1)
      .drop("__side")
      .drop(valueCols.map(v => s"__r_$v"): _*)
  }
}
