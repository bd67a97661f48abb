package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, StableMatching}

/** Pins the [[StableMatching.CompactMinRows]] shape assumption (round-12
  * VERDICT nit): the bench's "q332 runs a constant-size plan" claim
  * rests on the default-gate market never crossing the compaction
  * engage threshold — compaction is correct at any size (the
  * StableMatchingSpec threshold-0 tests), but engaging it would add a
  * per-cadence checkpoint job to the bench line, silently changing what
  * the recorded number measures. This spec makes the assumption
  * executable: if the q332 fixture (id gate, even/odd split) or the
  * constant ever drifts so the bench market crosses the threshold, it
  * fails LOUDLY with instructions instead of the bench quietly
  * measuring a different plan.
  */
class StableMatchingCompactGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q332's default-gate bench market stays below CompactMinRows") {
    // the q332 fixture, re-derived: embeddings vec_id < 60 (default
    // SPARK_GRAFT_GATE_SCALE=1), evens propose to odds — the pref
    // frame is |evens| x |odds| rows at every SF the bench runs (the
    // id gate, not the SF, bounds the market)
    val pe = Similarity.prepared(
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet"))
      .filter(col("vec_id") < 60L)
    val nProps = pe.filter(col("vec_id") % 2 === 0).count()
    val nAccs = pe.filter(col("vec_id") % 2 === 1).count()
    val prefRows = nProps * nAccs
    assert(prefRows > 0L, "q332 fixture is empty — gate or data changed")
    assert(prefRows < StableMatching.CompactMinRows,
      s"q332's bench market ($nProps x $nAccs = $prefRows pref rows) now " +
        s"crosses CompactMinRows=${StableMatching.CompactMinRows}: the " +
        "bench line would start paying per-cadence compaction jobs. " +
        "Either re-baseline q332's bench cost with compaction engaged, " +
        "or re-derive the threshold — do not let the claim drift silently.")
  }

  test("compaction across the threshold boundary changes no output (engage rule is cost-only)") {
    // correctness must be independent of WHERE the threshold sits: the
    // same 80x80 market (6,400 pref rows) matched with the threshold
    // above it (never engages), at 0 (engages every cadence), and with
    // compaction off must return identical pairs
    import spark.implicits._
    val rnd = new scala.util.Random(332)
    val cells = for (p <- 0L until 80L; a <- 0L until 80L)
      yield (p, a, rnd.nextInt(1000000).toLong)
    val prefs = cells.toDF("p", "a", "s")
      .select(col("p"), col("a"),
        row_number().over(Window.partitionBy("p")
          .orderBy(col("s").desc, col("a"))).cast("long").as("rp"),
        row_number().over(Window.partitionBy("a")
          .orderBy(col("s").desc, col("p"))).cast("long").as("ra"))
      .drop("s")
    def run(minRows: Long, cadence: Int): Set[(Long, Long)] =
      StableMatching.matching(prefs, compactEvery = cadence,
          compactMinRows = minRows)
        .select("proposer", "acceptor").as[(Long, Long)].collect().toSet
    val above = run(StableMatching.CompactMinRows, 4)
    val engaged = run(0L, 4)
    val off = run(0L, 0)
    assert(above === engaged, "threshold position changed the matching")
    assert(above === off, "compaction on/off changed the matching")
    assert(above.size === 80)
  }
}
