package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DamerauLevenshtein, DamerauLevenshteinCol}

/** Native true Damerau–Levenshtein: known vectors (including the
  * OSA-vs-true-DL distinguishers probed against DuckDB), byte-level
  * semantics on multibyte UTF-8, metric properties on a generated
  * sweep, codegen participation, and SQL registration. */
class DamerauLevenshteinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("known vectors match the external-engine probes") {
    // probed against DuckDB damerau_levenshtein on 2026-08-15
    val cases = Seq(
      ("CA", "ABC") -> 2,       // true DL, not OSA (OSA gives 3)
      ("a cat", "a abct") -> 2, // second distinguisher
      ("ab", "ba") -> 1,
      ("abc", "ca") -> 2,
      ("", "abc") -> 3,
      ("abc", "") -> 3,
      ("kitten", "sitting") -> 3,
      ("abcdef", "abcfad") -> 3,
      ("a cat", "an act") -> 2,
      ("same", "same") -> 0)
    for (((a, b), want) <- cases)
      assert(dl(a, b) === want, s"dl('$a','$b')")
  }

  test("byte-level semantics: multibyte chars count per byte") {
    assert(dl("é", "e") === 2)   // 2-byte é vs 1-byte e
    assert(dl("é", "") === 2)
    assert(dl("日本", "本日") === 4)
  }

  test("metric properties on a word sweep") {
    val words = Seq("ring", "rign", "king", "widget", "wigdet", "gadget",
      "", "a", "ab", "ba", "abc", "bca", "red bolt", "hot bolt")
    for (a <- words; b <- words) {
      val d = dl(a, b)
      assert(d === dl(b, a), s"symmetry $a/$b")
      assert((d == 0) === (a == b), s"identity $a/$b")
      // DL is bounded by plain Levenshtein and by max length
      assert(d <= math.max(a.length, b.length))
    }
    // transposition is exactly 1 cheaper than two substitutions here
    assert(dl("widget", "wigdet") === 1)
    assert(dl("ring", "rign") === 1)
  }

  test("column expression stays inside whole-stage codegen") {
    val df = spark.range(8).select(
      DamerauLevenshteinCol(concat(lit("ab"), col("id")),
        lit("ba0")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [damerau_levenshtein"),
      s"damerau_levenshtein must not break codegen:\n$plan")
    assert(df.collect().map(_.getInt(0)).head === 1) // ab0 → ba0
  }

  test("SQL registration callable from spark.sql, null-safe") {
    graft.functions.EngineFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT damerau_levenshtein('CA', 'ABC') AS d, " +
        "damerau_levenshtein(CAST(NULL AS STRING), 'x') AS n")
      .collect().head
    assert(r.getInt(0) === 2)
    assert(r.isNullAt(1))
  }
}
