package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based point classification (the DBSCAN core/border/noise
  * triage) over 2-D integer coordinates — the outlier screen a
  * curation pipeline runs on a cheap 2-D projection of the embedding
  * space: CORE points sit in dense regions (≥ minPts neighbours within
  * eps), BORDER points hang off a core neighbour, NOISE is everything
  * else — candidate junk for review. The reference has no spatial
  * surface; engine-original, standard DBSCAN ε-neighbourhood
  * semantics (Ester et al. 1996) without the transitive cluster
  * labelling (that is ConnectedComponents' job if needed).
  *
  * Scale shape — the classic spatial-grid decomposition: bucket every
  * point into an eps×eps cell (`div` on the SHIFTED non-negative
  * coordinate so truncation equals floor in both engines), explode
  * each point to its 3×3 neighbour-cell probes, and join probes
  * against cells. Any two points within eps land in adjacent cells, so
  * the join enumerates every qualifying pair EXACTLY ONCE (a probe
  * matches the single real cell of the other point) and never
  * all-pairs — pair volume is bounded by cell occupancy, the shuffle
  * key is the 2-integer cell id, and the exact `dx²+dy² ≤ eps²` check
  * runs on BIGINT deltas of already-bucketed (≤ 2·eps) magnitude.
  * Border detection is one semi-join of the pair frame against the
  * core set. No floats anywhere, so a SQL oracle reproduces every
  * classification bit-for-bit.
  */
object GridDbscan {

  /** Classify `points` (columns: id, x, y — fixed-point longs).
    *
    * @return (id, x, y, n_neighbors, pt_class) where pt_class ∈
    *         core | border | noise; n_neighbors EXCLUDES the point
    *         itself (core ⇔ n_neighbors + 1 ≥ minPts).
    */
  def classify(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Long, minPts: Int): DataFrame = {
    require(eps > 0 && minPts >= 1)
    val base = points.select(col(idCol).as("db_id"),
      col(xCol).cast("long").as("db_x"), col(yCol).cast("long").as("db_y"))
    // Shift to non-negative so `div` (truncate toward zero) = floor:
    // both engines derive the identical 1-row min frame.
    val lo = base.agg(min("db_x").as("db_lox"), min("db_y").as("db_loy"))
    val cells = base.crossJoin(broadcast(lo))
      .select(col("db_id"), col("db_x"), col("db_y"),
        expr(s"(db_x - db_lox) div $eps").as("db_cx"),
        expr(s"(db_y - db_loy) div $eps").as("db_cy"))
    val probes = cells
      .select(col("db_id"), col("db_x"), col("db_y"),
        explode(expr("array(-1L, 0L, 1L)")).as("db_ox"), col("db_cx"),
        col("db_cy"))
      .select(col("db_id"), col("db_x"), col("db_y"),
        (col("db_cx") + col("db_ox")).as("db_px"),
        explode(expr("array(-1L, 0L, 1L)")).as("db_oy"), col("db_cy"))
      .select(col("db_id"), col("db_x"), col("db_y"), col("db_px"),
        (col("db_cy") + col("db_oy")).as("db_py"))
    val other = cells.select(col("db_id").as("db_nid"),
      col("db_x").as("db_nx"), col("db_y").as("db_ny"),
      col("db_cx").as("db_px"), col("db_cy").as("db_py"))
    val pairs = probes.join(other, Seq("db_px", "db_py"))
      .filter(col("db_nid") =!= col("db_id"))
      .filter(
        (col("db_x") - col("db_nx")) * (col("db_x") - col("db_nx")) +
          (col("db_y") - col("db_ny")) * (col("db_y") - col("db_ny"))
          <= lit(eps * eps))
      .select(col("db_id"), col("db_nid"))
    val counts = pairs.groupBy("db_id").agg(count(lit(1)).as("db_nn"))
    val classified = base.join(counts, Seq("db_id"), "left")
      .select(col("db_id"), col("db_x"), col("db_y"),
        coalesce(col("db_nn"), lit(0L)).as("db_nn"),
        (coalesce(col("db_nn"), lit(0L)) + 1L >= minPts).as("db_core"))
    // Border: a non-core point with at least one CORE ε-neighbour.
    val coreIds = classified.filter(col("db_core"))
      .select(col("db_id").as("db_nid"))
    val nearCore = pairs.join(coreIds, "db_nid")
      .select(col("db_id")).distinct().withColumn("db_nearcore", lit(true))
    classified.join(nearCore, Seq("db_id"), "left")
      .select(col("db_id").as(idCol), col("db_x").as(xCol),
        col("db_y").as(yCol), col("db_nn").as("n_neighbors"),
        when(col("db_core"), lit("core"))
          .when(coalesce(col("db_nearcore"), lit(false)), lit("border"))
          .otherwise(lit("noise")).as("pt_class"))
  }
}
