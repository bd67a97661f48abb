package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CoreFunctions._

/** Text deduplication operators for training-data pipelines: exact
  * (content-hash groupBy), MinHash+LSH candidates (banded, never
  * all-pairs), SimHash fingerprints with chunk-banded near-dup pairs, and
  * exact n-gram Jaccard on candidate pairs.
  *
  * Scale design (100 TB): every operator is a shuffle-on-key aggregation
  * or a band-key join — candidate generation shards on (band, minhash) /
  * (chunk, chunk_val) buckets, so skew is bounded by bucket population,
  * not corpus size; nothing ever collects to the driver.
  */
object TextDedup {

  /** Character k-shingles with positions: (id, i, gram). */
  def shingles(docs: DataFrame, k: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("i"),
        col(textCol))
      .select(col(idCol), col("i"),
        expr(s"substring($textCol, i, $k)").as("gram"))

  /** Exact duplicate groups: one shuffle on the 256-bit content hash. */
  def exactDuplicates(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures as (id, band, minhash) WITHOUT exploding bands
    * into the shuffle: one sha256 per gram remixed per band with cheap
    * arithmetic, folded map-side as `bands` conditional min-aggregates,
    * then unpivoted. Shuffle volume is |docs|, not bands × |grams|. */
  def minhashSignatures(grams: DataFrame, bands: Int = 8,
      idCol: String = "doc_id"): DataFrame = {
    require(bands >= 1 && bands <= 32)
    val aggs = (0 until bands).map(b =>
      min((col("h") * (b * 2 + 1) + lit(b) * lit(2654435761L)) %
        lit(4294967296L)).as(s"m$b"))
    val stackArgs = (0 until bands).map(b => s"$b, m$b").mkString(", ")
    grams
      .withColumn("h", hexPrefixToLong(sha2(col("gram"), 256)))
      .groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        expr(s"stack($bands, $stackArgs) AS (band, minhash)"))
  }

  /** LSH candidate pairs: docs sharing any (band, minhash) bucket.
    * Output: (doc_a, doc_b, n_shared_bands), doc_a < doc_b.
    *
    * Implemented as ONE pass over the signatures — group each bucket,
    * collect its member list, explode the pairs — instead of a self-join,
    * which would compute the whole signature pipeline twice (Spark does
    * not reuse the exchange across the join's two sides here). Bucket
    * member lists are bounded by bucket population; a pathological
    * mega-bucket (every doc identical) is exactly the case where exact
    * dedup should run first. */
  def candidatePairs(sigs: DataFrame): DataFrame =
    sigs.groupBy("band", "minhash")
      .agg(collect_list(col(sigs.columns.head)).as("docs"))
      .filter(size(col("docs")) > 1)
      .select(col("band"), explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("band"), col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct(col("band")).as("n_shared_bands"))

  /** Exact n-gram Jaccard for candidate pairs: integer intersection and
    * set sizes (no float drift), ratio surfaced as double.
    * (Measured: recomputing the cheap shingle explode per consumer beats
    * persisting the distinct gram set — no cache here on purpose.) */
  def jaccard(grams: DataFrame, pairs: DataFrame): DataFrame = {
    val cand = pairs.select("doc_a", "doc_b").distinct()
    // Semi-join prune FIRST: only grams of docs that appear in a
    // candidate pair enter the two big joins. At 100 TB candidates are a
    // sliver of the corpus, so this is the difference between shuffling
    // all grams and shuffling candidates' grams (the semi-join side is
    // small → AQE broadcasts it).
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val gset = grams.select("doc_id", "gram").distinct()
      .join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = gset.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val inter = cand
      .join(gset.toDF("doc_a", "gram"), Seq("doc_a"))
      .join(gset.toDF("doc_b", "gram"), Seq("doc_b", "gram"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    cand.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.toDF("doc_a", "na"), Seq("doc_a"))
      .join(sizes.toDF("doc_b", "nb"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("na"),
        col("nb"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"))
          .as("jaccard"))
  }

  /** 60-bit SimHash fingerprints from a (doc_id, tok) token frame. */
  def simhashFingerprints(tokens: DataFrame): DataFrame =
    tokens
      .select(col("doc_id"), hexPrefixToLong15(sha2(col("tok"), 256)).as("h"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(59))).as("bit"))
      .groupBy("doc_id", "bit")
      .agg(sum(when(expr("(h >> bit) & 1") === 1, 1L).otherwise(-1L))
        .as("bit_score"))
      .groupBy("doc_id")
      .agg(sum(when(col("bit_score") > 0,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
        .otherwise(0L)).as("simhash"))

  /** SimHash near-dup pairs via 15-bit chunk banding (4 chunks), Hamming
    * distance filter on candidates only. Same one-pass bucket-explode
    * shape as [[candidatePairs]] — no self-join recomputation. */
  def simhashNearDups(fingerprints: DataFrame, maxHamming: Int): DataFrame =
    fingerprints.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("chunk_val", expr("(simhash >> (chunk * 15)) & 32767"))
      .groupBy("chunk", "chunk_val")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("docs"))
      .filter(size(col("docs")) > 1)
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
}
