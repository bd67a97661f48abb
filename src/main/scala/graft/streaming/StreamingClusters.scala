package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.ConnectedComponents

/** Streaming incremental CONNECTED COMPONENTS — the continuous form of
  * the dedup pipeline's transitive-clustering stage: candidate pairs
  * arrive (e.g. from [[StreamingDedup.candidatePairs]]) and every
  * micro-batch updates a (node, comp) assignment table so "which
  * duplicate cluster is this document in" is always current, without
  * ever rescanning the full pair history.
  *
  * Incremental-view-maintenance form (the classic star-collapse): the
  * state table's component labels ARE node ids (each component's min
  * member — the [[ConnectedComponents]] invariant), so the state is
  * losslessly represented as a STAR edge per node (node — comp).
  * Each batch runs min-label propagation over (state stars ∪ new
  * edges) only: connectivity within old components is preserved by the
  * stars, new edges splice components together, and the propagated
  * label is again the min node id overall. By induction the table
  * after batch k equals batch CC over ALL edges seen through batch k —
  * the exact-parity gate StreamingClustersSpec pins.
  *
  * Scale design (100 TB):
  *   - per batch: CC over |state nodes| + |batch| edges, where the
  *     star graph's diameter is ≤ 2 hops to each old component's
  *     root, so the propagation converges in O(log(new-merge chain))
  *     rounds regardless of how long the stream has run — history
  *     never deepens the graph.
  *   - state is |nodes| rows of two longs, cut each batch (the
  *     ConnectedComponents checkpoint discipline); nothing collects.
  *   - exactly-once: attach via [[writer]] (foreachBatch) with a
  *     checkpointLocation; a replayed batch re-derives the same
  *     assignments (min-label is idempotent over duplicate edges).
  */
final class StreamingClusters(spark: SparkSession) {
  import spark.implicits._

  @volatile private var state: DataFrame =
    spark.emptyDataset[(Long, Long)].toDF("node", "comp")

  /** Current (node, comp) assignments — comp is the min node id of the
    * component over every edge processed so far. */
  def assignments: DataFrame = state

  /** Fold one micro-batch of undirected edges (first two columns =
    * endpoint ids) into the assignment table; returns the new table. */
  def processBatch(edges: DataFrame): DataFrame = synchronized {
    val Array(uCol, vCol, _*) = edges.columns
    val fresh = edges.select(col(uCol).cast("long").as("u"),
      col(vCol).cast("long").as("v"))
    val stars = state.select(col("node").as("u"), col("comp").as("v"))
    val work = stars.union(fresh)
    val nodes = work.select(col("u").as("id"))
      .union(work.select(col("v").as("id"))).distinct()
    state = ConnectedComponents.labels(work, nodes)
      .select(col("id").as("node"), col("cluster_id").as("comp"))
      .localCheckpoint()
    state
  }

  /** foreachBatch writer over a streaming (u, v) edge Dataset. */
  def writer(edges: Dataset[(Long, Long)]): DataStreamWriter[(Long, Long)] =
    edges.writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[(Long, Long)], _: Long) =>
        processBatch(batch.toDF("u", "v")); ()
      }
}
