package graft

import org.apache.spark.sql.{GraftColumnBridge, GraftExtensionsTestBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions is the cluster deployment path
  * (spark.sql.extensions=graft.GraftExtensions): every engine scalar
  * function must be injected and must evaluate through the
  * injectFunction builder contract exactly like the per-session
  * registerAll path. The shared test session cannot re-apply a static
  * conf, so the spec drives the extensions object directly through the
  * registry it would build. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def injected = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExtensionsTestBridge.injectedFunctions(ext)
  }

  test("injects every engine scalar function") {
    val names = injected.map(_._1.funcName).toSet
    assert(names === Set("normalize_phone", "hash_bucket",
      "deterministic_sample", "hex_prefix_long", "morton_code",
      "damerau_levenshtein"))
  }

  test("injected builders evaluate like the DataFrame API") {
    import org.apache.spark.sql.functions.col
    val byName = injected.map { case (id, b) => id.funcName -> b }.toMap
    def eval(name: String, args: Any*): Any = {
      val e = byName(name)(args.map(Literal(_)).toIndexedSeq)
      spark.range(1).select(GraftColumnBridge.column(e).as("v"))
        .collect().head.get(0)
    }
    assert(eval("morton_code", 255L, 0L) === 0x5555L)
    assert(eval("morton_code", 3, 5) ===
      graft.functions.Morton.interleave(3L, 5L, 8),
      "INT args must cast like the Column API")
    assert(eval("normalize_phone", "(415) 555-0001") === "+14155550001")
    assert(eval("hex_prefix_long", "ff000000") === 0xff000000L)
    assert(eval("damerau_levenshtein", "CA", "ABC") === 2,
      "true DL (transpositions drift), not OSA")
    val bucket = eval("hash_bucket", "call-123")
    assert(bucket === 0.4224428577400844, // pinned reference vector
      "hash_bucket must match the sampling.js algorithm")
    assert(eval("deterministic_sample", "call-123", 0.5) === true)
    assert(eval("deterministic_sample", "call-123", 0.1) === false)
  }
}
