package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.CoreFunctions._

/** Training-corpus preparation operators over `documents` /
  * `embeddings` (EXT, BASELINE.json north star): the mechanical stages
  * between a curated corpus and a training run — chunking documents
  * into model-context windows, packing sequences, repetition-based
  * quality filtering, vocabulary coverage reporting, embedding-space
  * normalization statistics, and quality-weighted sampling.
  *
  * Scale notes (100 TB design point):
  *   - chunking (q85) is a pure per-document explode — embarrassingly
  *     parallel, no shuffle beyond the keyed spread.
  *   - packing (q86) needs GLOBAL prefix sums; the naive single window
  *     over `ORDER BY doc_id` executes on ONE partition. The engine
  *     computes shard-local running sums in parallel and offsets them
  *     with a broadcast of |shards| prefix totals — the standard
  *     two-pass distributed scan. Same algebra, cluster-wide.
  *   - the vocabulary report (q88) aggregates BEFORE ranking: the
  *     window only ever sees the top-k aggregate rows, never raw
  *     tokens.
  */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  /** Model context geometry for q85/q86: 64-token chunks overlapping by
    * 16 (stride 48), packed into 2048-token windows. Interpolated into
    * BOTH the engine code and the oracle SQL so the twins cannot
    * drift. */
  private val ChunkTokens = 64
  private val ChunkOverlap = 16
  private val ChunkStride = ChunkTokens - ChunkOverlap
  private val PackContext = 2048
  /** q86 shard width: docs per shard for the parallel prefix-sum pass. */
  private val PackShard = 100

  /** The q85 chunk frame (doc_id, chunk_idx, n_tokens, chunk_text),
    * without the final sort — shared by the chunking report (q85) and
    * chunk-level dedup (q138). */
  private def chunked(s: SparkSession, dir: String) =
    TextQueries.docsSpread(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("n_chunks", greatest(lit(1L),
        ceil((col("n") - ChunkOverlap).cast("double") / ChunkStride)
          .cast("long")))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"),
          (col("chunk_idx") * ChunkStride + 1).cast("int"),
          lit(ChunkTokens)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))

  /** Oracle twin of [[chunked]] as a CTE chain ending in `chunks`. */
  private lazy val chunkSql =
    s"""t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |  FROM documents),
       |x AS (
       |  SELECT doc_id, toks,
       |    greatest(1, CAST(ceil((n - $ChunkOverlap) / ${ChunkStride}.0) AS BIGINT)) AS n_chunks
       |  FROM t),
       |e AS (
       |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx
       |  FROM x),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    CAST(len(toks[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkTokens]) AS BIGINT) AS n_tokens,
       |    array_to_string(toks[chunk_idx * $ChunkStride + 1 : chunk_idx * $ChunkStride + $ChunkTokens], ' ') AS chunk_text
       |  FROM e)""".stripMargin

  /** The q86 packing frame (doc_id, n_tokens, cum_before + derived
    * pack columns), without the final sort — shared by the packing
    * report (q86) and the efficiency summary (q139). The global
    * prefix sum is shard-local windows + a broadcast |shards|-row
    * prefix join, never a one-partition window over the corpus. */
  private def packed(s: SparkSession, dir: String) = {
    val tok = docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("shard", floor(col("doc_id") / PackShard).cast("long"))
    val wIn = Window.partitionBy("shard").orderBy("doc_id")
    val within = tok.withColumn("cum_in", sum(col("n_tokens")).over(wIn))
    val wSh = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = tok.groupBy("shard")
      .agg(sum(col("n_tokens")).as("shard_toks"))
      .withColumn("prefix",
        sum(col("shard_toks")).over(wSh) - col("shard_toks"))
      .select("shard", "prefix")
    within.join(broadcast(prefix), Seq("shard"))
      .withColumn("cum_before",
        col("prefix") + col("cum_in") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("cum_before"),
        floor(col("cum_before").cast("double") / PackContext)
          .cast("long").as("pack_id"),
        (col("cum_before") % PackContext).as("pack_offset"),
        ((col("cum_before") % PackContext) + col("n_tokens") > PackContext)
          .as("spans_boundary"))
  }

  /** Oracle twin of [[packed]] as a CTE chain ending in `packc`. */
  private lazy val packSql =
    s"""tok AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |packc AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - n_tokens AS cum_before
       |  FROM tok)""".stripMargin

  val all: Seq[EngineQuery] = Seq(

    // EXT — fixed-size token chunking with overlap: every document cut
    // into model-context chunks of ChunkTokens whitespace tokens with
    // ChunkOverlap tokens of context carried across the seam (the
    // document → training-sequence mapping every LLM pipeline runs).
    // Chunk count = max(1, ceil((n - overlap) / stride)), so a short
    // document is one (short) chunk and the final chunk is allowed to
    // run short. Pure per-document expressions: explode + slice.
    EngineQuery("q85_token_chunking",
      (s, dir) => chunked(s, dir).orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH $chunkSql
              |SELECT doc_id, chunk_idx, n_tokens, chunk_text
              |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin)),

    // EXT — sequence packing offsets: concatenate the corpus in doc_id
    // order and cut every PackContext tokens; each document learns its
    // pack id, its offset inside the pack, and whether it spans a pack
    // boundary (the bookkeeping a packed-pretraining data loader
    // needs). The global running sum is computed as shard-local window
    // sums plus a broadcast prefix-total join — never a one-partition
    // window (see the object scaladoc); the oracle states the same
    // arithmetic as one plain window.
    EngineQuery("q86_sequence_packing",
      (s, dir) => packed(s, dir)
        .drop("cum_before")
        .orderBy("doc_id"),
      Some(s"""WITH $packSql
              |SELECT doc_id, n_tokens,
              |  CAST(floor(cum_before / ${PackContext}.0) AS BIGINT) AS pack_id,
              |  CAST(cum_before % $PackContext AS BIGINT) AS pack_offset,
              |  (cum_before % $PackContext) + n_tokens > $PackContext AS spans_boundary
              |FROM packc ORDER BY doc_id""".stripMargin)),

    // EXT — repetition-ratio quality filter: the share of a document's
    // 8-gram occurrences taken by its single most repeated gram, plus
    // the distinct-gram share — the standard "repetitive document"
    // signal (boilerplate, keyword stuffing, generation loops). One
    // keyed aggregation over the shared gram explode.
    EngineQuery("q87_repetition_ratio",
      (s, dir) => TextQueries.gramsDf(s, dir)
        .groupBy("doc_id", "gram")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_grams"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("max_c"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          round(col("max_c").cast("double") / col("n_grams").cast("double"), 6)
            .as("max_gram_share"),
          round(col("n_distinct").cast("double") / col("n_grams").cast("double"), 6)
            .as("distinct_share"))
        .orderBy("doc_id"),
      Some(s"""WITH grams AS (${TextQueries.gramsSql}),
              |gc AS (
              |  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
              |d AS (
              |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams, COUNT(*) AS n_distinct,
              |    MAX(c) AS max_c
              |  FROM gc GROUP BY 1)
              |SELECT doc_id, n_grams, n_distinct,
              |  round(CAST(max_c AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS max_gram_share,
              |  round(CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS distinct_share
              |FROM d ORDER BY doc_id""".stripMargin)),

    // EXT — vocabulary coverage report: the 100 most frequent tokens
    // with rank and the cumulative share of all token occurrences they
    // cover (the head-heaviness check run before fixing a tokenizer
    // vocabulary). Aggregation happens FIRST; the ordered window only
    // sees the 100-row top-k frame, and the corpus total arrives as a
    // broadcast 1-row join (the q67 discipline — never a cartesian).
    EngineQuery("q88_vocab_coverage",
      (s, dir) => {
        val occ = TextQueries.tokens(s, dir)
          .groupBy("tok").agg(count(lit(1)).as("n_occ"))
        val total = occ.agg(sum(col("n_occ")).as("total"))
        val w = Window.orderBy(col("n_occ").desc, col("tok"))
        occ.orderBy(col("n_occ").desc, col("tok")).limit(100)
          .join(broadcast(total), lit(true))
          .withColumn("rank", row_number().over(w).cast("long"))
          .withColumn("cum_occ", sum(col("n_occ"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("rank"), col("tok"), col("n_occ"),
            round(col("cum_occ").cast("double") / col("total").cast("double"), 6)
              .as("cum_share"))
          .orderBy("rank")
      },
      Some("""WITH tk AS (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |occ AS (SELECT tok, COUNT(*) AS n_occ FROM tk GROUP BY 1),
             |tot AS (SELECT SUM(n_occ) AS total FROM occ),
             |top AS (SELECT tok, n_occ FROM occ ORDER BY n_occ DESC, tok LIMIT 100),
             |r AS (
             |  SELECT tok, n_occ,
             |    CAST(row_number() OVER (ORDER BY n_occ DESC, tok) AS BIGINT) AS rank,
             |    SUM(n_occ) OVER (ORDER BY n_occ DESC, tok
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_occ
             |  FROM top)
             |SELECT rank, tok, n_occ,
             |  round(CAST(cum_occ AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
             |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin)),

    // EXT — per-dimension embedding statistics (mean/std): the
    // normalization constants an index build or whitening transform
    // computes over the corpus. Cross-row float sums are
    // order-dependent, so components are fixed-point scaled
    // (round(x·1e6) as long — the q71 discipline) and summed exactly;
    // mean/std derive from the exact integer sums in one deterministic
    // double expression per dimension. Shuffle carries (dim) partials
    // folded map-side.
    EngineQuery("q89_embedding_dim_stats",
      (s, dir) => Tables.table(s, dir, "embeddings")
        .select(posexplode(transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long"))))
        .groupBy("pos")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("col")).as("sc"),
          sum(col("col") * col("col")).as("ss"))
        .select(col("pos").cast("long").as("dim"), col("n_vecs"),
          round(col("sc").cast("double") / col("n_vecs") / 1e6, 6).as("mean"),
          round(sqrt(greatest(lit(0.0),
            col("ss").cast("double") / col("n_vecs")
              - pow(col("sc").cast("double") / col("n_vecs"), 2))) / 1e6, 6)
            .as("std"))
        .orderBy("dim"),
      Some("""WITH sv AS (
             |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
             |    x -> CAST(round(x * 1000000.0) AS BIGINT)) AS sv
             |  FROM embeddings),
             |u AS (
             |  SELECT unnest(sv) AS c,
             |    unnest(range(1, len(sv) + 1)) AS pos1
             |  FROM sv),
             |d AS (
             |  SELECT pos1 - 1 AS dim, COUNT(*) AS n_vecs,
             |    SUM(c) AS sc, SUM(c * c) AS ss
             |  FROM u GROUP BY 1)
             |SELECT dim, n_vecs,
             |  round(CAST(sc AS DOUBLE) / n_vecs / 1000000.0, 6) AS mean,
             |  round(sqrt(greatest(0.0,
             |    CAST(ss AS DOUBLE) / n_vecs
             |      - pow(CAST(sc AS DOUBLE) / n_vecs, 2))) / 1000000.0, 6) AS std
             |FROM d ORDER BY dim""".stripMargin)),

    // EXT — bigram language-model statistics: per-document token
    // sequences → (tok, next_tok) counts and the conditional
    // probability P(next | tok), reported for the 50 most frequent
    // bigrams (the n-gram LM features a data-quality or domain-mix
    // analysis derives). The lead() window rides the keyed doc spread
    // (no extra exchange before the bigram shuffle); the ordered top-50
    // window sees only aggregate rows.
    EngineQuery("q92_bigram_lm",
      (s, dir) => {
        val seq = TextQueries.docsSpread(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val bi = seq.withColumn("next_tok", lead(col("tok"), 1).over(w))
          .filter(col("next_tok").isNotNull)
          .groupBy("tok", "next_tok").agg(count(lit(1)).as("c"))
        val tot = bi.groupBy("tok").agg(sum(col("c")).as("t"))
        bi.join(tot, Seq("tok"))
          .select(col("tok"), col("next_tok"), col("c").as("n_bigram"),
            round(col("c").cast("double") / col("t").cast("double"), 6)
              .as("p_next"))
          .orderBy(col("n_bigram").desc, col("tok"), col("next_tok"))
          .limit(50)
      },
      Some("""WITH seq AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
             |  FROM documents),
             |bi AS (
             |  SELECT tok, next_tok, COUNT(*) AS n_bigram FROM (
             |    SELECT tok,
             |      lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS next_tok
             |    FROM seq) x
             |  WHERE next_tok IS NOT NULL
             |  GROUP BY 1, 2),
             |tot AS (SELECT tok, SUM(n_bigram) AS t FROM bi GROUP BY 1)
             |SELECT bi.tok, next_tok, n_bigram,
             |  round(CAST(n_bigram AS DOUBLE) / CAST(t AS DOUBLE), 6) AS p_next
             |FROM bi JOIN tot USING (tok)
             |ORDER BY n_bigram DESC, tok, next_tok LIMIT 50""".stripMargin)),

    // EXT — language-model surprisal scoring: each document's mean
    // bigram surprisal −ln P(next | tok) under the corpus's own bigram
    // model (the q92 statistics, unlimited) — the perplexity-proxy
    // quality filter a CCNet-style curation pipeline runs (unusual
    // token sequences score high, templated/duplicated text scores
    // low). Per-bigram surprisal is fixed to 1e-6 granularity as a
    // LONG (ln() agrees across engines at that precision — the q67
    // discipline), so the per-doc mean is an exact integer fold.
    EngineQuery("q99_lm_surprisal",
      (s, dir) => {
        val seq = TextQueries.docsSpread(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val biOcc = seq.withColumn("next_tok", lead(col("tok"), 1).over(w))
          .filter(col("next_tok").isNotNull)
        val bi = biOcc.groupBy("tok", "next_tok").agg(count(lit(1)).as("c"))
        val probs = bi
          .join(bi.groupBy("tok").agg(sum(col("c")).as("t")), Seq("tok"))
          .select(col("tok"), col("next_tok"),
            round(-log(col("c").cast("double") / col("t").cast("double")) * 1e6)
              .cast("long").as("surp_fp"))
        biOcc.join(probs, Seq("tok", "next_tok"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("surp_fp")).as("sfp"))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("sfp").cast("double") / 1e6 /
              col("n_bigrams").cast("double"), 6).as("avg_surprisal"))
          .orderBy("doc_id")
      },
      Some("""WITH seq AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
             |  FROM documents),
             |bo AS (
             |  SELECT doc_id, tok, next_tok FROM (
             |    SELECT doc_id, tok,
             |      lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS next_tok
             |    FROM seq) x
             |  WHERE next_tok IS NOT NULL),
             |bi AS (
             |  SELECT tok, next_tok, COUNT(*) AS c FROM bo GROUP BY 1, 2),
             |tt AS (SELECT tok, SUM(c) AS t FROM bi GROUP BY 1),
             |probs AS (
             |  SELECT bi.tok, next_tok,
             |    CAST(round(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0) AS BIGINT) AS surp_fp
             |  FROM bi JOIN tt USING (tok))
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             |  round(CAST(SUM(surp_fp) AS DOUBLE) / 1000000.0
             |    / CAST(COUNT(*) AS DOUBLE), 6) AS avg_surprisal
             |FROM bo JOIN probs USING (tok, next_tok)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — cross-document boilerplate fraction: the share of a
    // document's word 5-gram occurrences that also appear in at least
    // one OTHER document (headers, footers, templates — the
    // duplicated-n-gram quality signal of Rae et al.'s Gopher filters,
    // complementing q87's WITHIN-document repetition). Two keyed
    // aggregations + one join on the gram; at scale the gram key
    // becomes an xxhash64 long (the q31 shuffle-width discipline —
    // only counts cross the gate).
    EngineQuery("q98_boilerplate_fraction",
      (s, dir) => {
        val g = TextQueries.docsSpread(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          // sequence(1, n) needs n ≥ 1: Spark infers step -1 when
          // start > stop, which would YIELD [1, 0] instead of empty
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"),
            explode(sequence(lit(1), size(col("toks")) - 4)).as("i"),
            col("toks"))
          .select(col("doc_id"),
            concat_ws(" ", slice(col("toks"), col("i"), lit(5))).as("gram"))
        val boiler = g.groupBy("gram")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("gram"), lit(1L).as("is_boiler"))
        g.join(boiler, Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
          .select(col("doc_id"), col("n_grams"), col("n_boiler"),
            round(col("n_boiler").cast("double") / col("n_grams").cast("double"), 6)
              .as("boiler_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |g AS (
             |  SELECT doc_id, array_to_string(toks[i : i + 4], ' ') AS gram
             |  FROM t CROSS JOIN (SELECT unnest(range(1, 1024)) AS i) pos
             |  WHERE i <= len(toks) - 4),
             |db AS (
             |  SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1),
             |boiler AS (SELECT gram FROM db WHERE nd >= 2)
             |SELECT doc_id, COUNT(*) AS n_grams,
             |  CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
             |  round(CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_frac
             |FROM g LEFT JOIN boiler b USING (gram)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — weighted reservoir sampling (Efraimidis–Spirakis A-Res with
    // a deterministic uniform): every document gets key u^(1/w) from the
    // sha256-uniform and its quality weight; the global top-20 keys ARE
    // the weighted sample without replacement. One TakeOrdered top-k —
    // no shuffle of the corpus, reproducible across runs and engines
    // (rand() is neither), and the fixed-k dual of q90's fixed-rate
    // weighted Bernoulli sample.
    EngineQuery("q95_weighted_reservoir",
      // the RANKING key is the 9-rounded r (with doc_id tie-break) in
      // BOTH engines, so a boundary tie cannot select different rows
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          round(pow((sha256PrefixLong(concat(lit("wres:"),
              col("doc_id").cast("string"))) + 1).cast("double") / 4294967296.0,
            lit(1.0) / greatest(lit(1.0), col("n_chars").cast("double"))), 9)
            .as("r"))
        .orderBy(col("r").desc, col("doc_id"))
        .limit(20),
      Some("""WITH k AS (
             |  SELECT doc_id, n_chars,
             |    round(pow((CAST('0x' || substr(sha256('wres:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
             |        / 4294967296.0,
             |      1.0 / greatest(1.0, CAST(n_chars AS DOUBLE))), 9) AS r
             |  FROM documents)
             |SELECT doc_id, n_chars, r
             |FROM k ORDER BY r DESC, doc_id LIMIT 20""".stripMargin)),

    // EXT — quality-weighted deterministic sampling: keep a document
    // with probability proportional to a quality weight (longer docs
    // up-weighted here, capped at 1) using the same sha256-uniform the
    // reference's sampler derives (sampling.js:15-24) — reproducible,
    // re-runnable, and expressible in any engine, unlike rand(). The
    // importance-sampling step a mixture-balancing pipeline runs.
    EngineQuery("q90_quality_weighted_sample",
      (s, dir) => docs(s, dir)
        .withColumn("weight",
          least(lit(1.0), col("n_chars").cast("double") / 800.0))
        .withColumn("u",
          sha256PrefixLong(concat(lit("wsample:"),
            col("doc_id").cast("string"))).cast("double") / 4294967295.0)
        .filter(col("u") < col("weight"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("weight"), 6).as("weight"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars,
             |  round(least(1.0, CAST(n_chars AS DOUBLE) / 800.0), 6) AS weight
             |FROM documents
             |WHERE CAST('0x' || substr(sha256('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
             |    / 4294967295.0
             |  < least(1.0, CAST(n_chars AS DOUBLE) / 800.0)
             |ORDER BY doc_id""".stripMargin)),

    // EXT — BPE first-merge statistics: the 50 most frequent adjacent
    // character pairs inside tokens, weighted by token occurrence — the
    // pair-count pass a BPE tokenizer-training run repeats per merge
    // (this entry is one iteration; training iterates on the merged
    // vocabulary). Aggregate-FIRST discipline: token frequencies are
    // counted before the character-pair explode, so the explode
    // amplifies |distinct tokens| · len — a vocabulary-sized frame —
    // never |token occurrences| · len of the raw corpus.
    EngineQuery("q100_bpe_pair_stats",
      (s, dir) => {
        val tf = TextQueries.tokens(s, dir)
          .groupBy("tok").agg(count(lit(1)).as("w"))
        val pairs = tf.filter(length(col("tok")) >= 2)
          .select(col("w"),
            explode(sequence(lit(1), length(col("tok")) - 1)).as("i"),
            col("tok"))
          .select(concat(expr("substring(tok, i, 1)"),
            expr("substring(tok, i + 1, 1)")).as("pair"), col("w"))
          .groupBy("pair").agg(sum(col("w")).as("n_pairs"))
        val w50 = Window.orderBy(col("n_pairs").desc, col("pair"))
        // ordered window AFTER the aggregate: it only ever sees
        // |distinct pairs| rows (bounded by alphabet², not corpus size)
        pairs.withColumn("rank", row_number().over(w50))
          .filter(col("rank") <= 50)
          .select(col("rank").cast("long").as("rank"), col("pair"),
            col("n_pairs"))
          .orderBy("rank")
      },
      Some("""WITH tk AS (
             |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |tf AS (SELECT tok, COUNT(*) AS w FROM tk GROUP BY 1),
             |pr AS (
             |  SELECT substr(tok, CAST(i AS INT), 1) ||
             |    substr(tok, CAST(i AS INT) + 1, 1) AS pair, w
             |  FROM tf CROSS JOIN (SELECT unnest(range(1, 256)) AS i) pos
             |  WHERE length(tok) >= 2 AND i <= length(tok) - 1),
             |agg AS (
             |  SELECT pair, CAST(SUM(w) AS BIGINT) AS n_pairs
             |  FROM pr GROUP BY 1)
             |SELECT CAST(row_number() OVER (ORDER BY n_pairs DESC, pair) AS BIGINT) AS rank,
             |  pair, n_pairs
             |FROM agg ORDER BY n_pairs DESC, pair LIMIT 50""".stripMargin)),

    // EXT — character-distribution entropy per document: Shannon
    // entropy of the character histogram — the quality signal that
    // flags mojibake/random noise (high) and repeated filler (low).
    // Float discipline (the q99 surprisal precedent): entropy
    // = ln(N) − (Σ c·ln c)/N, where each ln(c) is fixed to 1e-6
    // granularity as a LONG and the Σ is an exact integer fold —
    // cross-row float order can't move the result; the two outer ln/÷
    // are one deterministic double expression per doc.
    EngineQuery("q101_char_entropy",
      (s, dir) => {
        val chars = TextQueries.docsSpread(s, dir)
          .select(col("doc_id"),
            explode(sequence(lit(1), length(col("text")))).as("i"),
            col("text"))
          .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
        chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_chars"),
            count(lit(1)).as("n_distinct_chars"),
            sum(col("c") *
              round(log(col("c").cast("double")) * 1e6).cast("long"))
              .as("clnc_fp"))
          .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
            round(log(col("n_chars").cast("double"))
              - col("clnc_fp").cast("double") / 1e6 /
                col("n_chars").cast("double"), 6).as("char_entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
             |  FROM documents CROSS JOIN (SELECT unnest(range(1, 8192)) AS i) pos
             |  WHERE i <= length(text)),
             |cc AS (
             |  SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
             |d AS (
             |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
             |    COUNT(*) AS n_distinct_chars,
             |    CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS clnc_fp
             |  FROM cc GROUP BY 1)
             |SELECT doc_id, n_chars, n_distinct_chars,
             |  round(ln(CAST(n_chars AS DOUBLE))
             |    - CAST(clnc_fp AS DOUBLE) / 1000000.0 / CAST(n_chars AS DOUBLE), 6)
             |    AS char_entropy
             |FROM d ORDER BY doc_id""".stripMargin)),

    // EXT — training-mix composition report: document, token and
    // character volumes per (source, lang) with each cell's share of
    // the corpus token total — the data-mixing table a pretraining run
    // is configured from. Two keyed aggregations; the 1-row corpus
    // total arrives as a broadcast join (the q67 discipline — never a
    // shuffled cartesian).
    EngineQuery("q102_domain_mix",
      (s, dir) => {
        val per = docs(s, dir)
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"))
        val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"))
        per.join(broadcast(tot), lit(true))
          .select(col("source"), col("lang"), col("n_docs"),
            col("n_tokens"), col("n_chars"),
            round(col("n_tokens").cast("double") /
              col("tot_tokens").cast("double"), 6).as("token_share"))
          .orderBy("source", "lang")
      },
      Some("""WITH per AS (
             |  SELECT source, lang, COUNT(*) AS n_docs,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
             |  FROM documents GROUP BY 1, 2),
             |tot AS (SELECT SUM(n_tokens) AS tot_tokens FROM per)
             |SELECT source, lang, n_docs, n_tokens, n_chars,
             |  round(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6)
             |    AS token_share
             |FROM per CROSS JOIN tot ORDER BY source, lang""".stripMargin)),

    // EXT — Zipf-law fit per language: least-squares slope of
    // ln(frequency) over ln(rank) for the top-200 tokens — the classic
    // corpus-health diagnostic (natural text ≈ −1; machine-generated or
    // boilerplate-heavy corpora drift off it). Float discipline: ranks
    // and counts are integers, ln is fixed to 1e-6 granularity as a
    // LONG (verified bit-identical JVM Math.log vs libm ln over
    // 1..300000), all Σ are exact integer folds, and slope/intercept/r²
    // are one deterministic double expression per language over those
    // exact sums (the ×1e6 scaling cancels in the slope and r² ratios).
    // Scale shape: the rank window runs over the AGGREGATED
    // (lang, token) frame — vocab-scale, never token-scale — and is
    // parallel across languages; everything after the top-200 filter is
    // |langs|·200 rows.
    EngineQuery("q109_zipf_fit",
      (s, dir) => {
        val occ = TextQueries.tokens(s, dir)
          .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("lang")
          .orderBy(col("cnt").desc, col("tok"))
        val ranked = occ.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 200)
          .select(col("lang"),
            round(log(col("rank").cast("double")) * 1e6).cast("long").as("xq"),
            round(log(col("cnt").cast("double")) * 1e6).cast("long").as("yq"))
        val fit = ranked.groupBy("lang").agg(
          count(lit(1)).as("n_ranks"),
          sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
          sum(col("xq") * col("yq")).as("sxy"),
          sum(col("xq") * col("xq")).as("sxx"),
          sum(col("yq") * col("yq")).as("syy"))
        val dn = col("n_ranks").cast("double")
        def d(c: String) = col(c).cast("double")
        val cov = d("sxy") / dn - (d("sx") / dn) * (d("sy") / dn)
        val varx = d("sxx") / dn - (d("sx") / dn) * (d("sx") / dn)
        val vary = d("syy") / dn - (d("sy") / dn) * (d("sy") / dn)
        fit.select(col("lang"), col("n_ranks"),
            round(cov / varx, 6).as("zipf_slope"),
            round((d("sy") / dn - (cov / varx) * (d("sx") / dn)) / 1e6, 6)
              .as("zipf_intercept"),
            round((cov * cov) / (varx * vary), 6).as("r2"))
          .orderBy("lang")
      },
      Some("""WITH tk AS (
             |  SELECT lang, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |occ AS (SELECT lang, tok, COUNT(*) AS cnt FROM tk GROUP BY 1, 2),
             |rk AS (
             |  SELECT lang,
             |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS xq,
             |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS yq
             |  FROM (
             |    SELECT lang, cnt,
             |      row_number() OVER (PARTITION BY lang
             |        ORDER BY cnt DESC, tok) AS rank
             |    FROM occ) t
             |  WHERE rank <= 200),
             |fit AS (
             |  SELECT lang, COUNT(*) AS n_ranks,
             |    CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
             |    CAST(SUM(xq * yq) AS BIGINT) AS sxy,
             |    CAST(SUM(xq * xq) AS BIGINT) AS sxx,
             |    CAST(SUM(yq * yq) AS BIGINT) AS syy
             |  FROM rk GROUP BY 1)
             |SELECT lang, n_ranks,
             |  round((CAST(sxy AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |      - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE)))
             |    / (CAST(sxx AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |      - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |        * (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))), 6)
             |    AS zipf_slope,
             |  round((CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |    - ((CAST(sxy AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |        - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |          * (CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE)))
             |      / (CAST(sxx AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |        - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |          * (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))))
             |      * (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))) / 1000000.0, 6)
             |    AS zipf_intercept,
             |  round(((CAST(sxy AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |      - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE)))
             |    * (CAST(sxy AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |      - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE))))
             |    / ((CAST(sxx AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |      - (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |        * (CAST(sx AS DOUBLE) / CAST(n_ranks AS DOUBLE)))
             |    * (CAST(syy AS DOUBLE) / CAST(n_ranks AS DOUBLE)
             |      - (CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n_ranks AS DOUBLE)))), 6)
             |    AS r2
             |FROM fit ORDER BY lang""".stripMargin)),

    // EXT — document-length histogram per language: equi-width
    // 256-char buckets (last bucket open-ended) with each bucket's
    // share of its language — the length-distribution report every
    // corpus curation pass starts from (truncation budgets, chunking
    // geometry, outlier cut lines all read off it). Pure integer
    // bucketing (floor division — no float in the key), one keyed
    // aggregation; the per-language total arrives via a window over the
    // |langs|·|buckets| aggregate frame.
    EngineQuery("q110_length_histogram",
      (s, dir) => {
        val b = docs(s, dir)
          .select(col("lang"),
            least(floor(col("n_chars") / 256), lit(19L)).cast("long")
              .as("bucket"))
          .groupBy("lang", "bucket").agg(count(lit(1)).as("n_docs"))
        val wl = Window.partitionBy("lang")
        b.withColumn("lang_docs", sum(col("n_docs")).over(wl))
          .select(col("lang"), col("bucket"),
            (col("bucket") * 256).as("lo_chars"), col("n_docs"),
            round(col("n_docs").cast("double") /
              col("lang_docs").cast("double"), 6).as("share"))
          .orderBy("lang", "bucket")
      },
      Some("""WITH b AS (
             |  SELECT lang,
             |    CAST(least(n_chars // 256, 19) AS BIGINT) AS bucket
             |  FROM documents),
             |h AS (
             |  SELECT lang, bucket, COUNT(*) AS n_docs FROM b GROUP BY 1, 2)
             |SELECT lang, bucket, CAST(bucket * 256 AS BIGINT) AS lo_chars,
             |  n_docs,
             |  round(CAST(n_docs AS DOUBLE) /
             |    CAST(CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
             |      AS DOUBLE), 6) AS share
             |FROM h ORDER BY lang, bucket""".stripMargin)),

    // EXT — rule-based quality filtering (the Gopher/C4-style document
    // gate a curation pipeline runs before dedup): per-document boolean
    // rules — word-count bounds, mean word length in [3, 10], ≥ 2
    // distinct stopwords present, distinct-token ratio ≥ 0.4 (the
    // repetition gate) — and the composite keep verdict. Every rule is
    // INTEGER algebra (sum_len BETWEEN 3n AND 10n, 10·distinct ≥ 4·n)
    // so no float comparison can straddle an engine boundary; the two
    // ratio columns are display-only rounds. Pure per-document HOF
    // expressions over the scan (transform/filter/aggregate are
    // codegen'd) — zero shuffles at any SF; thresholds chosen so each
    // rule splits the synthetic corpus (word count passes 277/500,
    // stopword and repetition gates ~40% each at sf0.01).
    EngineQuery("q113_quality_rules",
      (s, dir) => {
        val stop = Seq("the", "a", "of", "to", "and", "in", "is", "that")
        docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            aggregate(transform(col("toks"), t => length(t).cast("long")),
              lit(0L), (acc, x) => acc + x).as("sum_len"),
            size(array_distinct(filter(col("toks"),
              t => t.isin(stop: _*)))).cast("long").as("n_stop_distinct"),
            size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
          .select(col("doc_id"), col("n_words"),
            round(col("sum_len").cast("double") /
              col("n_words").cast("double"), 6).as("mean_word_len"),
            col("n_stop_distinct"),
            round(col("n_distinct").cast("double") /
              col("n_words").cast("double"), 6).as("distinct_ratio"),
            (col("n_words") >= 50 && col("n_words") <= 100000)
              .as("r_word_count"),
            (col("sum_len") >= col("n_words") * 3 &&
              col("sum_len") <= col("n_words") * 10).as("r_mean_len"),
            (col("n_stop_distinct") >= 2).as("r_stopwords"),
            (col("n_distinct") * 10 >= col("n_words") * 4)
              .as("r_repetition"))
          .withColumn("pass",
            col("r_word_count") && col("r_mean_len") &&
              col("r_stopwords") && col("r_repetition"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks
             |  FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_words,
             |    CAST(list_aggregate(list_transform(toks, x -> len(x)),
             |      'sum') AS BIGINT) AS sum_len,
             |    CAST(len(list_distinct(list_filter(toks, x -> x IN
             |      ('the','a','of','to','and','in','is','that'))))
             |      AS BIGINT) AS n_stop_distinct,
             |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
             |  FROM t)
             |SELECT doc_id, n_words,
             |  round(CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
             |    AS mean_word_len,
             |  n_stop_distinct,
             |  round(CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
             |    AS distinct_ratio,
             |  n_words BETWEEN 50 AND 100000 AS r_word_count,
             |  sum_len BETWEEN n_words * 3 AND n_words * 10 AS r_mean_len,
             |  n_stop_distinct >= 2 AS r_stopwords,
             |  n_distinct * 10 >= n_words * 4 AS r_repetition,
             |  (n_words BETWEEN 50 AND 100000)
             |    AND (sum_len BETWEEN n_words * 3 AND n_words * 10)
             |    AND n_stop_distinct >= 2
             |    AND n_distinct * 10 >= n_words * 4 AS pass
             |FROM s ORDER BY doc_id""".stripMargin)),

    // EXT — cross-source overlap matrix: exact Jaccard of the DISTINCT
    // word-5-gram sets of every source pair — the contamination /
    // provenance report a mixture designer reads before weighting
    // sources (q69 checks corpus-vs-benchmark; this checks
    // corpus-vs-itself). Aggregate-first: grams dedupe per source
    // (shuffle on (source, gram), map-side partials), the pair join is
    // keyed on the gram, and everything after it is |sources|² rows.
    // Jaccard denominators are pure integer algebra. The gram key is
    // the 8-byte xxhash64 of the gram string (the q31 width
    // discipline) — the dedupe shuffle and the pair join move longs,
    // not ~18–40-byte strings, which is several× less exchange volume
    // on the biggest shuffle of the query at 100 TB. The DuckDB twin
    // keys on the raw string (no xxhash64 there); a collision would
    // surface as a gate mismatch, and at 2^64 hash width the expected
    // collision count stays ≪1 until ~10^9 distinct grams per source
    // pair.
    EngineQuery("q117_source_overlap",
      (s, dir) => {
        val g = TextQueries.docsSpread(s, dir)
          .select(col("source"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 5)
          .select(col("source"),
            explode(sequence(lit(1), size(col("toks")) - 4)).as("i"),
            col("toks"))
          .select(col("source"),
            xxhash64(concat_ws(" ", slice(col("toks"), col("i"), lit(5))))
              .as("gram"))
          .distinct()
        val counts = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
        val pairs = g.as("a").join(g.as("b"),
            col("a.gram") === col("b.gram") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_common"))
        pairs
          .join(broadcast(counts.withColumnRenamed("source", "source_a")
            .withColumnRenamed("n_grams", "n_a")), Seq("source_a"))
          .join(broadcast(counts.withColumnRenamed("source", "source_b")
            .withColumnRenamed("n_grams", "n_b")), Seq("source_b"))
          .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
            col("n_common"),
            round(col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
              .as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH t AS (
             |  SELECT source, string_split(text, ' ') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT DISTINCT source,
             |    array_to_string(toks[i : i + 4], ' ') AS gram
             |  FROM t CROSS JOIN (SELECT unnest(range(1, 1024)) AS i) pos
             |  WHERE i <= len(toks) - 4),
             |c AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
             |  FROM g GROUP BY 1),
             |p AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |    CAST(COUNT(*) AS BIGINT) AS n_common
             |  FROM g a JOIN g b ON b.gram = a.gram AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT p.source_a, p.source_b,
             |  ca.n_grams AS n_a, cb.n_grams AS n_b, p.n_common,
             |  round(CAST(p.n_common AS DOUBLE) /
             |    CAST(ca.n_grams + cb.n_grams - p.n_common AS DOUBLE), 6)
             |    AS jaccard
             |FROM p JOIN c ca ON ca.source = p.source_a
             |JOIN c cb ON cb.source = p.source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    // EXT — DSIR-style importance weights (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"):
    // hashed n-gram features (unigrams + bigrams → 1024 buckets), a
    // per-bucket log-likelihood ratio between the target distribution
    // (lang = 'en' here) and the raw corpus, and a per-document score =
    // mean bucket log-ratio over its grams. Scale shape: the gram
    // stream is aggregated into a 1024-row bucket table (map-side
    // partial, tiny exchange), the weights join back as a BROADCAST,
    // and the per-doc mean partial-aggregates on the spread key — no
    // all-pairs work anywhere. The smoothed ratio uses +0.5/bucket
    // (so 0.5·K = 512 on the denominators) in both engines.
    EngineQuery("q119_dsir_importance",
      (s, dir) => {
        val K = 1024
        // unigrams ++ bigrams in ONE array before the explode: a
        // union of two explode branches would scan the corpus twice
        // per consumer (this frame has two consumers below — 4 scans
        // instead of these 2)
        val grams = TextQueries.docsSpread(s, dir)
          .select(col("doc_id"), col("lang"),
            split(lower(col("text")), " ").as("t"))
          .select(col("doc_id"), col("lang"),
            explode(concat(col("t"),
              when(size(col("t")) >= 2,
                expr("transform(sequence(1, size(t) - 1), " +
                  "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
                .otherwise(expr("array()")))).as("g"))
          .select(col("doc_id"), col("lang"),
            (sha256PrefixLong(col("g")) % K).as("bucket"))
        val counts = grams.groupBy("bucket")
          .agg(count(lit(1)).as("raw_cnt"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_cnt"))
        // corpus totals via an unpartitioned window over the K-row
        // bucket frame (bounded by construction) — a separate agg
        // branch would re-scan the gram stream a third time
        val wAll = Window.partitionBy()
        val weights = counts
          .withColumn("rt", sum("raw_cnt").over(wAll))
          .withColumn("tt", sum("tgt_cnt").over(wAll))
          .select(col("bucket"),
            (log((col("tgt_cnt") + 0.5) / (col("tt") + K / 2.0))
              - log((col("raw_cnt") + 0.5) / (col("rt") + K / 2.0))).as("w"))
        grams.join(broadcast(weights), "bucket")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"), sum("w").as("sw"))
          .select(col("doc_id"), col("n_grams"),
            round(col("sw") / col("n_grams"), 6).as("dsir_score"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
             |  FROM documents),
             |uni AS (SELECT doc_id, lang, unnest(t) AS g FROM t),
             |bi AS (
             |  SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS g
             |  FROM t CROSS JOIN (SELECT unnest(range(1, 1024)) AS i) pos
             |  WHERE i <= len(t) - 1),
             |grams AS (
             |  SELECT doc_id, lang,
             |    CAST('0x' || substr(sha256(g), 1, 8) AS BIGINT) % 1024
             |      AS bucket
             |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
             |c AS (
             |  SELECT bucket, COUNT(*) AS raw_cnt,
             |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_cnt
             |  FROM grams GROUP BY 1),
             |tot AS (SELECT SUM(raw_cnt) AS rt, SUM(tgt_cnt) AS tt FROM c),
             |w AS (
             |  SELECT bucket,
             |    ln((tgt_cnt + 0.5) / (tt + 512.0))
             |      - ln((raw_cnt + 0.5) / (rt + 512.0)) AS w
             |  FROM c CROSS JOIN tot)
             |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             |  round(SUM(w.w) / COUNT(*), 6) AS dsir_score
             |FROM grams g JOIN w USING (bucket)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — temperature-scaled domain mixing (the multilingual-LM
    // sampling rule, p_s ∝ f_s^α with α = 0.7): per-source token
    // counts, the α-scaled mixture weight, and the expected token
    // allocation out of a 1e9-token epoch. The per-source frame is
    // |sources| rows after one map-side-combined aggregation, so the
    // unpartitioned window over it is bounded and safe at any SF.
    EngineQuery("q120_temperature_mix",
      (s, dir) => {
        val perSrc = docs(s, dir)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("n"))
          .groupBy("source").agg(sum("n").as("n_tokens"))
        val tot = perSrc.agg(sum("n_tokens").as("total"))
        val w = Window.partitionBy()
        perSrc.crossJoin(broadcast(tot))
          .withColumn("pw",
            pow(col("n_tokens").cast("double") / col("total"), 0.7))
          .withColumn("spw", sum("pw").over(w))
          .select(col("source"), col("n_tokens"),
            round(col("n_tokens").cast("double") / col("total"), 6)
              .as("raw_share"),
            round(col("pw") / col("spw"), 6).as("mix_weight"),
            round(col("pw") / col("spw") * 1e9, 0).cast("long")
              .as("expected_tokens"))
          .orderBy("source")
      },
      Some("""WITH c AS (
             |  SELECT source,
             |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
             |      AS n_tokens
             |  FROM documents GROUP BY 1),
             |t AS (SELECT SUM(n_tokens) AS total FROM c),
             |p AS (
             |  SELECT source, n_tokens,
             |    CAST(n_tokens AS DOUBLE) / total AS frac,
             |    pow(CAST(n_tokens AS DOUBLE) / total, 0.7) AS pw
             |  FROM c CROSS JOIN t)
             |SELECT source, n_tokens, round(frac, 6) AS raw_share,
             |  round(pw / SUM(pw) OVER (), 6) AS mix_weight,
             |  CAST(round(pw / SUM(pw) OVER () * 1000000000.0) AS BIGINT)
             |    AS expected_tokens
             |FROM p ORDER BY source""".stripMargin)),

    // EXT — distinct-n-gram diversity (the self-repetition /
    // memorization risk report): per source, the type-token ratio and
    // the distinct-trigram share. COUNT(DISTINCT) over the gram stream
    // is a two-stage exact distinct — partial dedup map-side, one
    // keyed exchange — never a driver-side set.
    EngineQuery("q121_distinct_ngram_ratio",
      (s, dir) => {
        val toks = TextQueries.docsSpread(s, dir)
          .select(col("source"), split(lower(col("text")), " ").as("t"))
        val uni = toks.select(col("source"), explode(col("t")).as("g"))
        val tri = toks.filter(size(col("t")) >= 3)
          .select(col("source"),
            explode(expr("transform(sequence(1, size(t) - 2), " +
              "i -> array_join(slice(t, i, 3), ' '))")).as("g"))
        val uniAgg = uni.groupBy("source")
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct("g").as("n_types"))
        val triAgg = tri.groupBy("source")
          .agg(count(lit(1)).as("n_trigrams"),
            countDistinct("g").as("n_tri_types"))
        uniAgg.join(triAgg, "source")
          .select(col("source"), col("n_tokens"), col("n_types"),
            round(col("n_types").cast("double") / col("n_tokens"), 6)
              .as("ttr"),
            col("n_trigrams"), col("n_tri_types"),
            round(col("n_tri_types").cast("double") / col("n_trigrams"), 6)
              .as("trigram_diversity"))
          .orderBy("source")
      },
      Some("""WITH t AS (
             |  SELECT source, string_split(lower(text), ' ') AS t
             |  FROM documents),
             |uni AS (SELECT source, unnest(t) AS g FROM t),
             |tri AS (
             |  SELECT source, array_to_string(t[i : i + 2], ' ') AS g
             |  FROM t CROSS JOIN (SELECT unnest(range(1, 1024)) AS i) pos
             |  WHERE i <= len(t) - 2),
             |ua AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |    CAST(COUNT(DISTINCT g) AS BIGINT) AS n_types
             |  FROM uni GROUP BY 1),
             |ta AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
             |    CAST(COUNT(DISTINCT g) AS BIGINT) AS n_tri_types
             |  FROM tri GROUP BY 1)
             |SELECT ua.source, n_tokens, n_types,
             |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
             |  n_trigrams, n_tri_types,
             |  round(CAST(n_tri_types AS DOUBLE) / n_trigrams, 6)
             |    AS trigram_diversity
             |FROM ua JOIN ta ON ta.source = ua.source
             |ORDER BY ua.source""".stripMargin)),

    // EXT — tokenizer fertility by language: subword (BPE-ish regex)
    // tokens per whitespace word and characters per subword token —
    // the per-language tokenizer-cost report that drives context-budget
    // planning for multilingual corpora. Counts are exact integer sums
    // (the q34 tokenizers); one keyed aggregation.
    EngineQuery("q130_tokenizer_fertility",
      (s, dir) => docs(s, dir)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("ws"),
          regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
            .cast("long").as("bpe"),
          length(col("text")).cast("long").as("chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("ws").as("n_ws_tokens"),
          sum("bpe").as("n_bpe_tokens"), sum("chars").as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_ws_tokens"),
          col("n_bpe_tokens"),
          round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6)
            .as("fertility"),
          round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)
            .as("chars_per_token"))
        .orderBy("lang"),
      Some("""WITH d AS (
             |  SELECT lang,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
             |    CAST(len(regexp_extract_all(text,
             |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe,
             |    CAST(length(text) AS BIGINT) AS chars
             |  FROM documents)
             |SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
             |  CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
             |  round(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS BIGINT), 6)
             |    AS fertility,
             |  round(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(bpe) AS BIGINT), 6)
             |    AS chars_per_token
             |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — chunk-level exact dedup: after the q85 chunking, how much
    // of the TRAINING-SEQUENCE set is redundant, per source? Document-
    // level dedup (q25) misses chunks duplicated across distinct
    // documents — the overlap seams and shared boilerplate this report
    // counts. The ratio is a single integer division (no rounding: the
    // q123 lesson — identical operand order gives bit-identical
    // doubles).
    EngineQuery("q138_chunk_dedup",
      (s, dir) => {
        val c = chunked(s, dir)
          .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), sha2(col("chunk_text"), 256).as("ch"))
        c.groupBy("source")
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct(col("ch")).as("n_unique"))
          .select(col("source"), col("n_chunks"), col("n_unique"),
            (lit(1.0) - col("n_unique").cast("double") / col("n_chunks"))
              .as("dup_chunk_frac"))
          .orderBy("source")
      },
      Some(s"""WITH $chunkSql,
              |h AS (
              |  SELECT d.source, sha256(c.chunk_text) AS ch
              |  FROM chunks c JOIN documents d ON d.doc_id = c.doc_id)
              |SELECT source, COUNT(*) AS n_chunks,
              |  CAST(COUNT(DISTINCT ch) AS BIGINT) AS n_unique,
              |  1.0 - CAST(COUNT(DISTINCT ch) AS DOUBLE) / COUNT(*)
              |    AS dup_chunk_frac
              |FROM h GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — packing efficiency: the one-row report a packed-pretraining
    // loader build emits — context windows used, fill rate, and how
    // many documents span a window boundary (candidates for re-chunking
    // or attention masking). Derived from the q86 shared frame; the
    // window count is exact integer arithmetic on the final cumulative
    // total.
    EngineQuery("q139_packing_efficiency",
      (s, dir) => packed(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          max(col("cum_before") + col("n_tokens")).as("grand_total"),
          sum(when(col("spans_boundary"), 1L).otherwise(0L))
            .as("n_spanning"))
        // Column./ on longs is DOUBLE division — floor() makes it the
        // integer floor-div the oracle's // computes (exact below 2^53)
        .withColumn("n_windows",
          floor((col("grand_total") + (PackContext - 1)) / PackContext)
            .cast("long"))
        .select(col("n_docs"), col("total_tokens"), col("n_windows"),
          (col("total_tokens").cast("double") /
            (col("n_windows") * PackContext).cast("double"))
            .as("fill_rate"),
          col("n_spanning")),
      Some(s"""WITH $packSql
              |SELECT COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              |  CAST((MAX(cum_before + n_tokens) + ${PackContext - 1})
              |    // $PackContext AS BIGINT) AS n_windows,
              |  CAST(SUM(n_tokens) AS DOUBLE) /
              |    (((MAX(cum_before + n_tokens) + ${PackContext - 1})
              |      // $PackContext) * $PackContext) AS fill_rate,
              |  CAST(SUM(CASE WHEN (cum_before % $PackContext) + n_tokens
              |    > $PackContext THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_spanning
              |FROM packc""".stripMargin)),

    // EXT — Flesch reading-ease readability: the curation-pipeline
    // quality signal next to q33's ratio score and q113's Gopher rules.
    // Words/sentences/syllable-proxies are exact BIGINT regexp counts
    // (syllables ≈ vowel groups — the standard dictionary-free
    // heuristic); the score is one fixed-shape double expression, so
    // both engines round identically. Pure per-row projection — no
    // shuffle at any scale beyond the ordered dump.
    EngineQuery("q155_readability",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), col("lang"),
          greatest(size(split(col("text"), " ")), lit(1)).cast("long")
            .as("n_words"),
          greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"),
            lit(0))), lit(1)).cast("long").as("n_sentences"),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"),
            lit(0))).cast("long").as("n_syllables"))
        .select(col("doc_id"), col("lang"), col("n_words"),
          col("n_sentences"), col("n_syllables"),
          (lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double"))).as("flesch"))
        .orderBy("doc_id"),
      Some("""WITH c AS (
             |  SELECT doc_id, lang,
             |    GREATEST(CAST(len(string_split(text, ' ')) AS BIGINT), 1)
             |      AS n_words,
             |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
             |      AS BIGINT), 1) AS n_sentences,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             |      AS BIGINT) AS n_syllables
             |  FROM documents)
             |SELECT doc_id, lang, n_words, n_sentences, n_syllables,
             |  CAST(206.835 AS DOUBLE)
             |    - CAST(1.015 AS DOUBLE)
             |      * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             |    - CAST(84.6 AS DOUBLE)
             |      * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             |    AS flesch
             |FROM c ORDER BY doc_id""".stripMargin)),

    // EXT — corpus novelty curve: as documents accumulate in doc_id
    // order, what fraction of all shingles seen so far were NEW at
    // first sight — the diminishing-returns report behind "do we keep
    // collecting from this source?". A gram is new for exactly the doc
    // holding its MIN doc_id (one keyed aggregation over the shared
    // shingle stream); the cumulative counters use the q86 shard-
    // decomposed prefix sum (shard-local running windows in parallel +
    // a broadcast |shards|-row prefix join), never a one-partition
    // window over the corpus. The oracle states the same algebra as one
    // plain running window. Grams travel as xxhash64 LONGS through the
    // distinct/agg/join (the q31 width discipline — 8 bytes vs 8-char
    // strings, measured 3.0 s → steady sub-second); only COUNTS reach
    // the output, so results differ from the string oracle only on a
    // 64-bit collision within one corpus (~1e-11).
    EngineQuery("q167_novelty_curve",
      (s, dir) => {
        val gc = TextQueries.gramsDf(s, dir)
          .select(col("doc_id"), xxhash64(col("gram")).as("gram"))
          .distinct()
        val firstDoc = gc.groupBy("gram").agg(min("doc_id").as("first_doc"))
        val perDoc = gc.join(firstDoc, "gram")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L)
              .otherwise(0L)).as("n_new"))
          .withColumn("shard", floor(col("doc_id") / PackShard).cast("long"))
        val wIn = Window.partitionBy("shard").orderBy("doc_id")
        val within = perDoc
          .withColumn("cin_g", sum(col("n_grams")).over(wIn))
          .withColumn("cin_n", sum(col("n_new")).over(wIn))
        val wSh = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val prefix = perDoc.groupBy("shard")
          .agg(sum("n_grams").as("sg"), sum("n_new").as("sn"))
          .withColumn("pg", sum(col("sg")).over(wSh) - col("sg"))
          .withColumn("pn", sum(col("sn")).over(wSh) - col("sn"))
          .select("shard", "pg", "pn")
        within.join(broadcast(prefix), Seq("shard"))
          .select(col("doc_id"), col("n_grams"), col("n_new"),
            (col("pg") + col("cin_g")).as("cum_grams"),
            (col("pn") + col("cin_n")).as("cum_new"),
            ((col("pn") + col("cin_n")).cast("double") /
              (col("pg") + col("cin_g")).cast("double")).as("novelty"))
          .orderBy("doc_id")
      },
      Some(s"""WITH grams AS (${TextQueries.gramsSql}),
              |gc AS (SELECT DISTINCT doc_id, gram FROM grams),
              |fd AS (
              |  SELECT gram, MIN(doc_id) AS first_doc FROM gc GROUP BY 1),
              |pd AS (
              |  SELECT gc.doc_id, COUNT(*) AS n_grams,
              |    CAST(SUM(CASE WHEN fd.first_doc = gc.doc_id
              |      THEN 1 ELSE 0 END) AS BIGINT) AS n_new
              |  FROM gc JOIN fd ON fd.gram = gc.gram GROUP BY 1),
              |c AS (
              |  SELECT doc_id, n_grams, n_new,
              |    CAST(SUM(n_grams) OVER w AS BIGINT) AS cum_grams,
              |    CAST(SUM(n_new) OVER w AS BIGINT) AS cum_new
              |  FROM pd WINDOW w AS (ORDER BY doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT doc_id, n_grams, n_new, cum_grams, cum_new,
              |  CAST(cum_new AS DOUBLE) / CAST(cum_grams AS DOUBLE)
              |    AS novelty
              |FROM c ORDER BY doc_id""".stripMargin)),

    // EXT — PMI token-association pairs: top-50 adjacent-token pairs by
    // pointwise mutual information (count floor 5) — the collocation
    // detector next to q92's conditional-probability LM. The RANKING
    // key is the exact integer rational c_ab·M² / (N·c_a·c_b) cast to
    // double (no libm in the sort — ln() is ±1 ulp across engines and
    // could flip the rank-50 boundary); pmi itself is round(ln(ratio),6)
    // output-only. Top-50 via orderBy+limit (TakeOrdered — map-side
    // partial top-k, never a global sort). At warehouse scale the
    // integer products overflow BIGINT around M ≈ 3e9 tokens — there
    // the ratio drops to the same-shaped double product, which keeps
    // the identical cross-engine ordering property.
    EngineQuery("q172_pmi_pairs",
      (s, dir) => {
        val toks = TextQueries.docsSpread(s, dir)
          .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        val pairs = toks.filter(size(col("t")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(t) - 1), " +
              "i -> struct(element_at(t, i) AS a, " +
              "element_at(t, i + 1) AS b))")).as("p"))
          .select(col("p.a"), col("p.b"))
        val pc = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
        val uni = toks.select(explode(col("t")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c_tok"))
        val totals = pc.agg(sum("c_ab").as("n_tot"))
          .crossJoin(uni.agg(sum("c_tok").as("m_tot")))
        val scored = pc.filter(col("c_ab") >= 5)
          .join(uni.withColumnRenamed("tok", "a")
            .withColumnRenamed("c_tok", "c_a"), "a")
          .join(uni.withColumnRenamed("tok", "b")
            .withColumnRenamed("c_tok", "c_b"), "b")
          .crossJoin(broadcast(totals))
          .withColumn("ratio",
            (col("c_ab") * col("m_tot") * col("m_tot")).cast("double") /
              (col("n_tot") * col("c_a") * col("c_b")).cast("double"))
        scored.orderBy(col("ratio").desc, col("a"), col("b"))
          .limit(50)
          .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
            round(log(col("ratio")), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("a"), col("b"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS t
             |  FROM documents),
             |pairs AS (
             |  SELECT t[i] AS a, t[i + 1] AS b
             |  FROM toks
             |  CROSS JOIN (SELECT unnest(range(1, 1024)) AS i) pos
             |  WHERE i <= len(t) - 1),
             |pc AS (SELECT a, b, COUNT(*) AS c_ab FROM pairs GROUP BY 1, 2),
             |uni AS (
             |  SELECT unnest(t) AS tok FROM toks),
             |uc AS (SELECT tok, COUNT(*) AS c_tok FROM uni GROUP BY 1),
             |tot AS (
             |  SELECT (SELECT CAST(SUM(c_ab) AS BIGINT) FROM pc) AS n_tot,
             |    (SELECT CAST(SUM(c_tok) AS BIGINT) FROM uc) AS m_tot),
             |scored AS (
             |  SELECT pc.a, pc.b, pc.c_ab, ua.c_tok AS c_a,
             |    ub.c_tok AS c_b,
             |    CAST(pc.c_ab * t.m_tot * t.m_tot AS DOUBLE)
             |      / CAST(t.n_tot * ua.c_tok * ub.c_tok AS DOUBLE)
             |      AS ratio
             |  FROM pc
             |  JOIN uc ua ON ua.tok = pc.a
             |  JOIN uc ub ON ub.tok = pc.b
             |  CROSS JOIN tot t
             |  WHERE pc.c_ab >= 5)
             |SELECT a, b, c_ab, c_a, c_b, round(ln(ratio), 6) AS pmi
             |FROM (SELECT * FROM scored
             |      ORDER BY ratio DESC, a, b LIMIT 50)
             |ORDER BY pmi DESC, a, b""".stripMargin)),

    // EXT — language-mix entropy per source: Shannon entropy of each
    // source's language distribution — the "is this source a monoculture
    // or a grab-bag" signal the mixing report (q102) summarizes by
    // share. Counts are exact; each −p·ln p term is rounded to 6
    // decimals BEFORE the per-source accumulation (the q161 libm rule),
    // and the per-source total is the MAX of the monotone running sum
    // over the bounded |langs| frame.
    EngineQuery("q175_lang_mix_entropy",
      (s, dir) => {
        val counts = docs(s, dir).groupBy("source", "lang")
          .agg(count(lit(1)).as("c"))
        val wSrc = Window.partitionBy("source")
        val wRun = Window.partitionBy("source").orderBy("lang")
          .rowsBetween(Window.unboundedPreceding, 0)
        counts
          .withColumn("n", sum(col("c")).over(wSrc))
          .withColumn("k", count(lit(1)).over(wSrc))
          .withColumn("term", round(-(col("c").cast("double") /
            col("n").cast("double")) *
            log(col("c").cast("double") / col("n").cast("double")), 6))
          .withColumn("run", sum(col("term")).over(wRun))
          .groupBy("source")
          .agg(max(col("n")).as("n_docs"), max(col("k")).as("n_langs"),
            max(col("run")).as("lang_entropy"))
          .orderBy("source")
      },
      Some("""WITH counts AS (
             |  SELECT source, lang, COUNT(*) AS c
             |  FROM documents GROUP BY 1, 2),
             |tot AS (
             |  SELECT source, lang, c,
             |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n,
             |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS k
             |  FROM counts),
             |terms AS (
             |  SELECT source, lang, c, n, k,
             |    round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             |      AS term
             |  FROM tot),
             |runs AS (
             |  SELECT source, n, k,
             |    SUM(term) OVER (PARTITION BY source ORDER BY lang
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS run
             |  FROM terms)
             |SELECT source, MAX(n) AS n_docs, MAX(k) AS n_langs,
             |  MAX(run) AS lang_entropy
             |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — quality-gate funnel: for q113's four Gopher/C4-style rules
    // applied in their fixed order, how many documents each rule kills
    // on its own and how many survive the gate so far — the filter-
    // tuning report (is one rule doing all the work?). One pass
    // computes all flags; the funnel rows come from a stack over the
    // 1-row aggregate (the q176 shape). All-integer until the rates.
    EngineQuery("q179_quality_funnel",
      (s, dir) => {
        val stop = Seq("the", "a", "of", "to", "and", "in", "is", "that")
        val flags = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            aggregate(transform(col("toks"), t => length(t).cast("long")),
              lit(0L), (acc, x) => acc + x).as("sum_len"),
            size(array_distinct(filter(col("toks"),
              t => t.isin(stop: _*)))).cast("long").as("n_stop_distinct"),
            size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
          .select(
            (col("n_words") >= 50 && col("n_words") <= 100000).as("r1"),
            (col("sum_len") >= col("n_words") * 3 &&
              col("sum_len") <= col("n_words") * 10).as("r2"),
            (col("n_stop_distinct") >= 2).as("r3"),
            (col("n_distinct") * 10 >= col("n_words") * 4).as("r4"))
        def b(c: String) = when(col(c), 1L).otherwise(0L)
        val one = flags.agg(count(lit(1)).as("n_docs"),
          sum(lit(1L) - b("r1")).as("f1"),
          sum(lit(1L) - b("r2")).as("f2"),
          sum(lit(1L) - b("r3")).as("f3"),
          sum(lit(1L) - b("r4")).as("f4"),
          sum(b("r1")).as("s1"),
          sum(when(col("r1") && col("r2"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("r1") && col("r2") && col("r3"), 1L)
            .otherwise(0L)).as("s3"),
          sum(when(col("r1") && col("r2") && col("r3") && col("r4"), 1L)
            .otherwise(0L)).as("s4"))
        one.select(col("n_docs"), expr(
            "stack(4, 1, 'word_count', f1, s1, 2, 'mean_word_len', f2, s2, " +
              "3, 'stopwords', f3, s3, 4, 'repetition', f4, s4) " +
              "AS (stage, rule, n_fail_alone, n_survive_through)"))
          .select(col("stage"), col("rule"), col("n_docs"),
            col("n_fail_alone"), col("n_survive_through"),
            (col("n_survive_through").cast("double") /
              col("n_docs").cast("double")).as("survive_rate"))
          .orderBy("stage")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks
             |  FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_words,
             |    CAST(list_aggregate(list_transform(toks, x -> len(x)),
             |      'sum') AS BIGINT) AS sum_len,
             |    CAST(len(list_distinct(list_filter(toks, x -> x IN
             |      ('the','a','of','to','and','in','is','that'))))
             |      AS BIGINT) AS n_stop_distinct,
             |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
             |  FROM t),
             |f AS (
             |  SELECT
             |    (n_words >= 50 AND n_words <= 100000) AS r1,
             |    (sum_len >= n_words * 3 AND sum_len <= n_words * 10)
             |      AS r2,
             |    (n_stop_distinct >= 2) AS r3,
             |    (n_distinct * 10 >= n_words * 4) AS r4
             |  FROM s),
             |agg AS (
             |  SELECT COUNT(*) AS n_docs,
             |    CAST(SUM(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS f1,
             |    CAST(SUM(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) AS f2,
             |    CAST(SUM(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) AS f3,
             |    CAST(SUM(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) AS f4,
             |    CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             |    CAST(SUM(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS s2,
             |    CAST(SUM(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS s3,
             |    CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4
             |      THEN 1 ELSE 0 END) AS BIGINT) AS s4
             |  FROM f)
             |SELECT stage, rule, n_docs, n_fail_alone, n_survive_through,
             |  CAST(n_survive_through AS DOUBLE) / CAST(n_docs AS DOUBLE)
             |    AS survive_rate
             |FROM (
             |  SELECT CAST(1 AS INT) AS stage, 'word_count' AS rule,
             |    n_docs, f1 AS n_fail_alone, s1 AS n_survive_through
             |  FROM agg
             |  UNION ALL SELECT CAST(2 AS INT), 'mean_word_len', n_docs,
             |    f2, s2 FROM agg
             |  UNION ALL SELECT CAST(3 AS INT), 'stopwords', n_docs,
             |    f3, s3 FROM agg
             |  UNION ALL SELECT CAST(4 AS INT), 'repetition', n_docs,
             |    f4, s4 FROM agg)
             |ORDER BY stage""".stripMargin)),

    // EXT — text-normalization stage: the canonical corpus-prep
    // transform (lowercase → strip non-alphanumerics → collapse runs
    // of spaces → trim) with the RESULT hash-gated, not just counted:
    // the output carries the sha256 prefix of every normalized text,
    // so the gate proves the byte-exact transform, and the size deltas
    // report what normalization discards. Pure per-row regexp work —
    // no shuffle before the ordered dump. DuckDB's regexp_replace
    // needs the 'g' flag to match Spark's replace-all default.
    EngineQuery("q191_text_normalize",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_raw"),
          size(split(col("text"), " ")).cast("long").as("n_tokens_raw"),
          trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", " "), " +", " ")).as("norm"))
        .select(col("doc_id"), col("n_chars_raw"), col("n_tokens_raw"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          size(split(col("norm"), " ")).cast("long").as("n_tokens_norm"),
          substring(sha2(col("norm"), 256), 1, 16).as("norm_sha_prefix"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_chars_raw,
             |  CAST(len(string_split(text, ' ')) AS BIGINT)
             |    AS n_tokens_raw,
             |  CAST(length(trim(regexp_replace(regexp_replace(
             |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
             |    AS BIGINT) AS n_chars_norm,
             |  CAST(len(string_split(trim(regexp_replace(regexp_replace(
             |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
             |    ' ')) AS BIGINT) AS n_tokens_norm,
             |  substr(sha256(trim(regexp_replace(regexp_replace(
             |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))),
             |    1, 16) AS norm_sha_prefix
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
