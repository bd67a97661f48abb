package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextDedup}

/** Semantic tests of the dedup/similarity operators on planted inputs —
  * the oracle gate proves cross-engine equality; these prove the
  * operators find what they claim to find. */
class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8
  private val docs = Seq(
    (0L, base),                                  // original
    (1L, base),                                  // exact duplicate
    (2L, base.replace("lazy", "sleepy")),        // near duplicate
    (3L, "completely different content about spark engines and parquet " * 6),
    (4L, "another unrelated document discussing window functions " * 7))
    .toDF("doc_id", "text")

  test("exact duplicates collapse to one keeper") {
    val groups = TextDedup.exactDuplicates(docs)
    assert(groups.count() === 4) // 5 docs, one exact-dup pair
    val dupGroup = groups.filter(col("n_copies") === 2).collect()
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("keep_doc_id") === 0L)
  }

  test("MinHash banding surfaces exact and near duplicates, not unrelated docs") {
    val sigs = TextDedup.minhashSignatures(TextDedup.shingles(docs))
    val pairs = TextDedup.candidatePairs(sigs)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    // exact dup: all 8 bands agree
    assert(pairs((0L, 1L)) === 8L)
    // near dup: most bands agree
    assert(pairs.getOrElse((0L, 2L), 0L) >= 4L)
    // unrelated docs never become candidates
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)))
  }

  test("Jaccard is 1.0 for exact duplicates and high for near duplicates") {
    val grams = TextDedup.shingles(docs)
    val sigs = TextDedup.minhashSignatures(grams)
    val jac = TextDedup.jaccard(grams, TextDedup.candidatePairs(sigs))
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(jac((0L, 1L)) === 1.0)
    assert(jac((0L, 2L)) > 0.6 && jac((0L, 2L)) < 1.0)
  }

  test("SimHash: identical docs have hamming 0; near dups are close") {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val fp = TextDedup.simhashFingerprints(tokens)
    val pairs = TextDedup.simhashNearDups(fp, maxHamming = 59)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(pairs((0L, 1L)) === 0)
    assert(pairs.get((0L, 2L)).exists(_ <= 10))
  }

  test("IVF probe search recalls most of the exact top-k (q48 vs q27 shape)") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.topKCosine(emb, col("q_id") < 10, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 10, k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
