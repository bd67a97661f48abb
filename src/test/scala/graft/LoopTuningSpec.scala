package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LoopTuning

/** LoopTuning conf scoping: nested tuned loops restore their parent's
  * width and only the outermost exit restores the session's original
  * width + AQE flag — two stacked loops (e.g. an operator calling
  * another tuned operator) can never leave the session
  * mis-configured (round-11 ADVICE finding on session-conf
  * mutation). */
class LoopTuningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def width: String = spark.conf.get("spark.sql.shuffle.partitions")
  private def aqe: String = spark.conf.get("spark.sql.adaptive.enabled")

  test("nested loops restore parent width, outermost restores session conf") {
    val w0 = width
    val a0 = aqe
    LoopTuning.withLoopConf(spark, 1L) {
      assert(width === "1")
      assert(aqe === "false")
      LoopTuning.withLoopConf(spark, 100001L) {
        assert(width === "3") // 100k/50k + 1, still < session width
        // inner exit must restore the OUTER loop's width, not the
        // session's
      }
      assert(width === "1")
      assert(aqe === "false")
    }
    assert(width === w0)
    assert(aqe === a0)
  }

  test("session conf restores even when the loop body throws") {
    val w0 = width
    val a0 = aqe
    intercept[RuntimeException] {
      LoopTuning.withLoopConf(spark, 1L) {
        LoopTuning.withLoopConf(spark, 1L) {
          throw new RuntimeException("boom")
        }
      }
    }
    assert(width === w0)
    assert(aqe === a0)
  }

  test("updateWidth resizes only inside an active loop and caps at session width") {
    val w0 = width
    // outside any loop: a stray call must not narrow the session
    LoopTuning.updateWidth(spark, 1L)
    assert(width === w0)
    LoopTuning.withLoopConf(spark, 1L) {
      assert(width === "1")
      // growth-aware resize mid-loop (the Closure doubling pattern)
      LoopTuning.updateWidth(spark, 50001L)
      assert(width === "2")
      // capped at the TRUE session width even though the live conf is
      // currently narrowed
      LoopTuning.updateWidth(spark, Long.MaxValue / 2)
      assert(width === w0)
    }
    assert(width === w0)
  }
}
