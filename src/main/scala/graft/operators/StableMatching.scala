package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
  * Round-synchronous deferred acceptance with ACCEPTOR-MONOTONICITY
  * pruning: every free proposer proposes to its best remaining
  * acceptor; every acceptor keeps the best offer it has ever seen.
  * An acceptor's hold only ever IMPROVES, so once `a` holds `q`,
  * EVERY pair (p, a) with rank_a(p) > rank_a(q) is permanently
  * rejected — whether or not p ever actually proposes to a. That
  * makes the rejection ledger a pure FUNCTION of the current hold
  * table (`prefs ⋈ held` on the acceptor, keeping worse-ranked
  * proposers) instead of accumulated per-round loser state, and it
  * collapses the sequential tail of classical DA: a proposer whose
  * next k acceptors all hold better partners skips all k in ONE
  * round. McVitie–Wilson (1971): the result is the proposer-optimal
  * stable matching REGARDLESS of proposal order — batch-rejecting
  * provably-doomed proposals early changes the schedule, not the
  * fixpoint — which is exactly how the q332 oracle re-derives it (a
  * sequential one-proposal-at-a-time recursive-CTE fold), making the
  * gate an agreement between two genuinely different algorithms on a
  * provably unique object.
  *
  * Scale design (100 TB):
  *   - per round: ONE Spark job, constant-size plan. The proposal
  *     count that certifies termination rides the round's checkpoint
  *     job as a CollectMetrics observation (`Observation`) instead of
  *     a separate `isEmpty` action; the new hold table is the job's
  *     materialized output. Inside the job: one acceptor-keyed join
  *     deriving the ledger from the previous (checkpointed) holds,
  *     one anti-join against it, one map-side-combining min per
  *     proposer, one min per acceptor over proposals ∪ holds —
  *     everything keyed on proposer/acceptor ids, nothing collects.
  *   - NO ledger state: the rejection set is recomputed from the
  *     ≤ |acceptors|-row hold table each round, so the only loop
  *     state is `held` (cut every round — lineage depth stays 1) and
  *     the per-round plan never grows. (A/B history at sf0.1, q332:
  *     r10 shipped 3 jobs/round with an accumulated ledger = 21.0 s;
  *     folding the isEmpty into the checkpoint job = 15.8 s; lazy
  *     ledger-window variants = 13-29 s; this derived-ledger form
  *     also cuts the round COUNT ~2× — numbers in PLANS.md.)
  *   - ranks are caller-supplied integers; all mins are exact struct
  *     orders with id tie-breaks, so the matching is bit-reproducible.
  *   - the loop's shuffle width is sized from the market row count
  *     (restored on exit), and AQE is disabled inside the loop: the
  *     round jobs are latency-bound, and AQE's empty-relation
  *     propagation erases the CollectMetrics node at the termination
  *     round (the DebugObserve finding).
  *   - if `maxRounds` is exhausted while free proposers still have
  *     acceptors left to try, the "stable matching" contract cannot be
  *     met and the loop THROWS (the [[ConnectedComponents]]
  *     discipline) instead of silently returning a partial matching.
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
    * @param maxRounds round bound (≥ the longest displacement chain;
    *              the loop exits early at the fixpoint and throws if
    *              the bound is hit with proposals remaining)
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
    // Size the loop's shuffles from the MARKET, not the session: the
    // session default is tuned for the big scan-bound queries, but
    // every round here shuffles ≤ |prefs| rows — on a small market the
    // fixed per-task cost of 32-partition shuffles dominates the whole
    // operator. One count on the already-persisted prefs (one job,
    // once) picks the width; session values are restored on exit.
    val prefRows = pf.count()
    LoopTuning.withLoopConf(spark, prefRows) {
      // held: current (acceptor, proposer) holds with both ranks.
      var held = spark.emptyDataset[(Long, Long, Long, Long)]
        .toDF("sm_p", "sm_a", "sm_rp", "sm_ra")
      // rejected: pairs that can never match. Derived, not
      // accumulated: holds only improve, so the CURRENT hold table
      // subsumes every earlier rejection at its acceptor. Aliased to
      // fresh attribute names so the pf-vs-pf self-reference below
      // never asks DeduplicateRelations to rewrite across the
      // CollectMetrics node (it refuses — metric names must stay
      // unique — and fails analysis).
      def rejectedFrom(h: DataFrame): DataFrame = pf
        .join(h.select(col("sm_a").as("smh_a"), col("sm_ra").as("smh_ra")),
          col("sm_a") === col("smh_a") && col("sm_ra") > col("smh_ra"))
        .select(col("sm_p").as("smr_p"), col("sm_a").as("smr_a"))
      var rejected = spark.emptyDataset[(Long, Long)]
        .toDF("smr_p", "smr_a")
      var round = 0
      var done = false
      val dbg = sys.env.contains("SPARK_GRAFT_SM_DEBUG")
      while (!done && round < maxRounds) {
        round += 1
        val t0 = System.nanoTime()
        // Each free proposer's best remaining acceptor. The row count
        // (the termination certificate) is observed off the same job
        // that materializes the round's new holds — no separate action.
        val obs = Observation(s"sm_round_$round")
        val proposals = pf
          .join(rejected,
            col("sm_p") === col("smr_p") && col("sm_a") === col("smr_a"),
            "left_anti")
          .join(held.select("sm_p"), Seq("sm_p"), "left_anti")
          .groupBy("sm_p")
          .agg(min(struct(col("sm_rp"), col("sm_a"), col("sm_ra")))
            .as("pk"))
          .select(col("sm_p"), col("pk.sm_a").as("sm_a"),
            col("pk.sm_rp").as("sm_rp"), col("pk.sm_ra").as("sm_ra"))
          .observe(obs, count(lit(1)).as("sm_n"))
        // Deferred acceptance: per acceptor, keep the best of (hold ∪
        // new proposals) by (rank_a, proposer); the rest are covered
        // by the derived rejection set next round.
        val contenders = held.union(proposals)
        val newHeld = cut(contenders
          .groupBy("sm_a")
          .agg(min(struct(col("sm_ra"), col("sm_p"), col("sm_rp")))
            .as("bk"))
          .select(col("bk.sm_p").as("sm_p"), col("sm_a"),
            col("bk.sm_rp").as("sm_rp"), col("bk.sm_ra").as("sm_ra")))
        // AQE's empty-relation propagation ERASES the CollectMetrics
        // node when the observed aggregate materializes empty (the
        // DebugObserve finding) — AQE is off inside the loop, but keep
        // the absent-metric fallback so a caller-configured session
        // can't silently mis-terminate: absent means "probably empty",
        // confirmed with one isEmpty (at most once, at termination).
        val observedCount =
          obs.get.getOrElse("sm_n", -1L).asInstanceOf[Number].longValue()
        val proposalCount =
          if (observedCount >= 0L) observedCount
          else if (proposals.isEmpty) 0L
          else 1L // metric lost but rows exist: run the round normally
        if (dbg) System.err.println(f"[sm] round $round%d " +
          f"${(System.nanoTime() - t0) / 1e6}%.0f ms n=$proposalCount%d")
        if (proposalCount == 0L) done = true
        else {
          held = newHeld
          rejected = rejectedFrom(newHeld)
        }
      }
      if (!done) {
        // Cap exhausted: if any free proposer still has an untried
        // acceptor, the matching below would be partial — refuse.
        val remaining = pf
          .join(rejected,
            col("sm_p") === col("smr_p") && col("sm_a") === col("smr_a"),
            "left_anti")
          .join(held.select("sm_p"), Seq("sm_p"), "left_anti")
          .limit(1).count() > 0L
        if (remaining) {
          pf.unpersist(blocking = false)
          throw new IllegalStateException(
            s"StableMatching.matching: maxRounds=$maxRounds exhausted " +
              "with free proposers still holding untried acceptors — the " +
              "result would not be a stable matching; raise maxRounds " +
              "(needs >= the longest displacement chain, <= the max " +
              "preference-list length)")
        }
      }
      pf.unpersist(blocking = false)
      held.select(col("sm_p").as("proposer"), col("sm_a").as("acceptor"),
        col("sm_rp").as("rank_p"), col("sm_ra").as("rank_a"))
    }
  }
}
