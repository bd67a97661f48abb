package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** STABLE MATCHING (Gale–Shapley deferred acceptance), proposer side —
  * the unique proposer-optimal stable matching of a two-sided
  * preference market: no matched outcome leaves a proposer–acceptor
  * pair who would both rather be with each other. The mechanism-design
  * primitive behind resident matching, ad–slot assignment and any
  * two-sided pairing where greedy matching ([[Matching]]) ignores the
  * OTHER side's preferences.
  *
  * Round-synchronous deferred acceptance: every free proposer proposes
  * to its best not-yet-rejecting acceptor; every acceptor keeps the
  * best offer it has ever seen (its current hold competes with the new
  * proposals) and rejects the rest. McVitie–Wilson (1971): the result
  * is the proposer-optimal stable matching REGARDLESS of proposal
  * order, so the round-parallel fixpoint equals the classical
  * one-proposal-at-a-time scan — which is exactly how the q332 oracle
  * re-derives it (a sequential recursive-CTE fold), making the gate an
  * agreement between two genuinely different algorithms on a provably
  * unique object.
  *
  * Scale design (100 TB):
  *   - per round: ONE anti-join against the rejection ledger, one
  *     map-side-combining min per proposer (the proposal), one min per
  *     acceptor over proposals ∪ holds (the deferred acceptance), and
  *     one ledger union — all keyed on proposer/acceptor ids, nothing
  *     collects (the loop reads back one scalar: the proposal count,
  *     which is the termination certificate).
  *   - state is the hold table (≤ |acceptors| rows) plus the
  *     rejection ledger (grows to ≤ |prefs|, the natural work bound
  *     of deferred acceptance); lineage is cut every round.
  *   - ranks are caller-supplied integers; all mins are exact struct
  *     orders with id tie-breaks, so the matching is bit-reproducible.
  */
object StableMatching {

  /** The proposer-optimal stable matching.
    *
    * @param prefs one row per (proposer, acceptor) pair the proposer
    *              would accept: columns (proposer, acceptor, rank_p,
    *              rank_a) — rank_p orders acceptors within a proposer
    *              (1 = most preferred), rank_a orders proposers within
    *              an acceptor; both integral and duplicate-free per
    *              pair
    * @param maxRounds round bound (≥ max #proposals any proposer
    *              makes; the loop exits early at the fixpoint)
    * @return (proposer, acceptor, rank_p, rank_a): the matched pairs
    */
  def matching(prefs: DataFrame, maxRounds: Int = 64,
      durableCheckpoints: Boolean = false): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be at least 1")
    def cut(df: DataFrame): DataFrame =
      if (durableCheckpoints) df.checkpoint() else df.localCheckpoint()
    val Array(pCol, aCol, rpCol, raCol, _*) = prefs.columns
    val pf = prefs.select(col(pCol).cast("long").as("sm_p"),
        col(aCol).cast("long").as("sm_a"),
        col(rpCol).cast("long").as("sm_rp"),
        col(raCol).cast("long").as("sm_ra"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val spark = prefs.sparkSession
    import spark.implicits._
    // held: current (acceptor, proposer) holds with both ranks.
    var held = spark.emptyDataset[(Long, Long, Long, Long)]
      .toDF("sm_p", "sm_a", "sm_rp", "sm_ra")
    // rejected: the ledger of (proposer, acceptor) pairs that can
    // never match (acceptor saw a better offer).
    var rejected = spark.emptyDataset[(Long, Long)]
      .toDF("sm_p", "sm_a")
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      // Each free proposer's best remaining acceptor.
      val proposals = pf
        .join(rejected, Seq("sm_p", "sm_a"), "left_anti")
        .join(held.select("sm_p"), Seq("sm_p"), "left_anti")
        .groupBy("sm_p")
        .agg(min(struct(col("sm_rp"), col("sm_a"), col("sm_ra")))
          .as("pk"))
        .select(col("sm_p"), col("pk.sm_a").as("sm_a"),
          col("pk.sm_rp").as("sm_rp"), col("pk.sm_ra").as("sm_ra"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      done = proposals.isEmpty
      if (!done) {
        // Deferred acceptance: per acceptor, keep the best of (hold ∪
        // new proposals) by (rank_a, proposer); reject the rest.
        val contenders = held.union(proposals)
        val best = contenders
          .groupBy("sm_a")
          .agg(min(struct(col("sm_ra"), col("sm_p"), col("sm_rp")))
            .as("bk"))
          .select(col("bk.sm_p").as("sm_p"), col("sm_a"),
            col("bk.sm_rp").as("sm_rp"), col("bk.sm_ra").as("sm_ra"))
        val losers = contenders
          .join(best.select(col("sm_p"), col("sm_a")),
            Seq("sm_p", "sm_a"), "left_anti")
          .select("sm_p", "sm_a")
        held = cut(best)
        rejected = cut(rejected.union(losers))
        proposals.unpersist(blocking = false)
      } else {
        proposals.unpersist(blocking = false)
      }
    }
    pf.unpersist(blocking = false)
    held.select(col("sm_p").as("proposer"), col("sm_a").as("acceptor"),
      col("sm_rp").as("rank_p"), col("sm_ra").as("rank_a"))
  }
}
