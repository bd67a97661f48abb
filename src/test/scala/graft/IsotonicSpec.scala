package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Isotonic

/** Isotonic/PAVA: the operator's parallel merge schedule must produce
  * EXACTLY the fitted values of the classical sequential
  * stack-based PAVA (uniqueness of the isotonic minimizer makes the
  * fitted values order-independent even where equal-mean block splits
  * are not — which is why only `fit` is compared, as in q297). */
class IsotonicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential stack PAVA over one series; exact cross-multiplied
    * violation test, per-point fit as s/c. */
  private def refPava(ys: Seq[Long]): Seq[Double] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (y <- ys) {
      out += Array(y, 1L)
      while (out.length > 1 && {
        val a = out(out.length - 2); val b = out.last
        a(0) * b(1) > b(0) * a(1)
      }) {
        val b = out.remove(out.length - 1)
        out.last(0) += b(0); out.last(1) += b(1)
      }
    }
    out.toSeq.flatMap(b =>
      Seq.fill(b(1).toInt)(b(0).toDouble / b(1).toDouble))
  }

  private def check(series: Map[Long, Seq[Long]]): Unit = {
    val rows = series.toSeq.flatMap { case (k, ys) =>
      ys.zipWithIndex.map { case (y, i) => (k, i.toLong, y) }
    }
    val got = Isotonic.fit(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    for ((k, ys) <- series; (want, i) <- refPava(ys).zipWithIndex)
      assert(got((k, i.toLong)) == want,
        s"key $k idx $i: got ${got((k, i.toLong))} want $want (ys=$ys)")
  }

  test("already nondecreasing series is returned unchanged") {
    val ys = Seq(1L, 2L, 2L, 5L, 9L)
    check(Map(1L -> ys))
  }

  test("strictly decreasing series pools to the grand mean") {
    val ys = Seq(9L, 7L, 5L, 3L, 1L)
    val got = Isotonic.fit(
        ys.zipWithIndex.map { case (y, i) => (1L, i.toLong, y) }
          .toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(_.getDouble(5)).toSet
    assert(got == Set(5.0))
  }

  test("hand case with an interior violation run") {
    check(Map(1L -> Seq(1L, 5L, 3L, 2L, 8L, 4L, 4L, 10L)))
  }

  test("property: random multi-key series match sequential PAVA exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val series = (1L to 6L).map { k =>
        val n = 5 + rnd.nextInt(28)
        k -> Seq.fill(n)(rnd.nextInt(1000).toLong)
      }.toMap
      check(series)
    }
  }

  test("maxRounds guard throws instead of looping") {
    val df = Seq((1L, 0L, 5L), (1L, 1L, 1L)).toDF("k", "x", "y")
    intercept[IllegalStateException] {
      Isotonic.fit(df, "k", "x", "y", maxRounds = 0)
    }
  }
}
