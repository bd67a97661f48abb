package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex triangle census + local clustering coefficient over an
  * undirected graph given as a SYMMETRIC directed edge set.
  *
  * lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the neighbourhood-density
  * signal that separates tight near-dup cliques (lcc → 1) from
  * chain-like borderline matches (lcc → 0). Consumed by the KNN-graph
  * report (q114) on top of the mutual-KNN edges. EXT — the reference
  * has no graph surface (its dedup stops at the pairwise idempotency
  * check, /root/reference/scripts/02_idempotency_test.js); this is the
  * neighbourhood-density stage of the curation pipeline built on q103's
  * KNN edges.
  *
  * Enumeration is the ordered-wedge join: orient each undirected edge
  * low→high, build wedges (a; b, c) with a<b<c from the low endpoint,
  * and keep wedges whose closing edge (b, c) exists (left-semi) — each
  * triangle materializes exactly once. With degree bound k (mutual-KNN
  * edges have deg ≤ k by construction) wedge volume is ≤ |V|·k(k−1)/2
  * and every join shuffles on vertex keys — never all-pairs, no driver
  * state. For skew-free scale-out on general graphs, pre-orienting by
  * (degree, id) instead of id bounds wedge fan-out by arboricity; the
  * KNN consumer's degrees are already capped so id-orientation suffices.
  *
  * Contract: `edges(src, dst)` contains BOTH orientations of every
  * undirected edge exactly once each, and no self-loops (the mutual-KNN
  * semi-join construction guarantees both).
  */
object Triangles {

  /** @return (id, deg, n_tri, lcc) — one row per vertex in `vertices`
    *         (isolated vertices included with deg = 0, lcc = 0.0);
    *         lcc rounded to 6 so engine/oracle doubles compare exactly. */
  def census(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    val tri = und.as("e1")
      .join(und.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"),
        col("e2.b").as("c"))
      .join(und.select(col("a").as("b"), col("b").as("c")),
        Seq("b", "c"), "left_semi")
    val triPerVertex = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    vertices.join(deg, Seq("id"), "left")
      .join(triPerVertex, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc",
        when(col("deg") >= 2,
          round(lit(2.0) * col("n_tri") /
            (col("deg") * (col("deg") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)))
  }
}
