package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CoreFunctions._
import graft.operators.TextDedup
import graft.streaming.StreamingDedup

/** Property-style tests of the engine's core algebra on RANDOM inputs —
  * the pinned-vector and oracle gates prove specific values; these prove
  * the invariants hold across the input space (scalacheck generators,
  * fixed sample budgets so the suite stays fast and deterministic
  * enough to debug). */
class AlgebraPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming signature == batch minhashSignatures on random documents") {
    // random printable docs of varied length, incl. exact duplicates
    val gen = for {
      n <- Gen.chooseNum(8, 300)
      s <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaNumChar), (2, Gen.const(' ')))).map(_.mkString)
    } yield s
    val texts = (1 to 25).flatMap(_ => gen.sample).distinct
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val batch = TextDedup
      .minhashSignatures(TextDedup.shingles(docs.toDF("doc_id", "text")))
      .as[(Long, Int, Long)].collect()
      .map { case (id, band, mh) => (id, band) -> mh }.toMap
    docs.foreach { case (id, text) =>
      val sig = StreamingDedup.signature(text)
      assert(sig.length === 8, s"doc $id")
      sig.zipWithIndex.foreach { case (mh, band) =>
        assert(batch((id, band)) === mh, s"doc $id band $band")
      }
    }
  }

  test("sampling decision is monotone in rate and pinned at the extremes") {
    // the reference's bucket-compare algebra: for a FIXED key, raising
    // the rate can only ever flip false→true — a key sampled at 10%
    // stays sampled at 20% (the property that makes rate changes safe
    // to roll out: the kept set only grows)
    val keys = (1 to 120)
      .flatMap(_ => Gen.identifier.sample).distinct.take(80)
    val rates = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val cols = rates.zipWithIndex.map { case (r, i) =>
      shouldSample(col("k"), r).as(s"s$i")
    }
    val rows = keys.toDF("k").select(cols: _*).collect()
    rows.foreach { row =>
      val decisions = rates.indices.map(row.getBoolean)
      decisions.sliding(2).foreach { w =>
        assert(!(w.head && !w.last),
          s"monotonicity violated across rates for one key: $decisions")
      }
    }
    // extremes short-circuit without hashing
    val ex = keys.toDF("k")
      .select(shouldSample(col("k"), 1.0).as("all"),
        shouldSample(col("k"), 0.0).as("none"))
      .as[(Boolean, Boolean)].collect()
    assert(ex.forall(r => r._1 && !r._2))
  }

  test("sortedIntersectCount == size(array_intersect) on random sorted distinct arrays") {
    val arrGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
        .map(_.distinct.sorted.toArray))
    val pairs = (1 to 60).flatMap(_ =>
      for (a <- arrGen.sample; b <- arrGen.sample) yield (a, b))
    val got = pairs.toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .as[(Int, Int)].collect()
    got.foreach { case (fast, builtin) => assert(fast === builtin) }
  }

  test("dot_product == HOF fold on random arrays (incl. zeros and denormal-scale values)") {
    val vGen = Gen.listOfN(32, Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6),
      Gen.const(0.0), Gen.const(1e-300), Gen.const(-1e12))).map(_.toArray)
    val rows = (1 to 50).flatMap(_ =>
      for (a <- vGen.sample; b <- vGen.sample) yield (a, b))
    val got = rows.toDF("a", "b")
      .select(dotProduct(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}
