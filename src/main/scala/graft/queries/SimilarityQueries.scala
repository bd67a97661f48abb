package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (SURVEY §2C Q27 + EXT):
  * brute-force top-k cosine as the correctness baseline, and a random-
  * hyperplane LSH path (signature band join, no all-pairs) as the 100 TB
  * scale route. Plus the multimodal binary-column feature query (Q38).
  *
  * Float determinism: embeddings are cast to DOUBLE[] in both engines and
  * dot products use each engine's sequential fold, then every surfaced
  * similarity is rounded to 6 decimals before ranking so ordering is
  * identical cross-engine.
  */
object SimilarityQueries {

  /** Sequential-fold dot product of two double arrays. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** 8 deterministic ±1 hyperplanes for 64-dim sign-LSH, derived from
    * SHA-256 so the DuckDB twin can embed the identical literals. */
  private[queries] lazy val planes: Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until 8).map { p =>
      Array.tabulate(64) { i =>
        val h = md.digest(s"$p:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  private def planeLit(p: Array[Double]): Column =
    array(p.map(v => lit(v)).toIndexedSeq: _*)

  private def planeSqlList(p: Array[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  val all: Seq[EngineQuery] = Seq(

    // Q27 — brute-force top-5 cosine neighbours for query vectors
    // (vec_id < 10). Baseline correctness path; ranking on rounded score
    // with vec_id tie-break.
    EngineQuery("q27_topk_cosine",
      (s, dir) => {
        val e = Tables.table(s, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qnrm")).filter(col("q_id") < 10)
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
        q.join(e, col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
              .as("cos_sim"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy("q_id", "rn")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (
             |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
             |SELECT q_id, vec_id, cos_sim, rn FROM (
             |  SELECT q.vec_id AS q_id, t.vec_id AS vec_id,
             |    round(list_dot_product(q.v, t.v) / (q.nrm * t.nrm), 6) AS cos_sim,
             |    row_number() OVER (PARTITION BY q.vec_id
             |      ORDER BY round(list_dot_product(q.v, t.v) / (q.nrm * t.nrm), 6) DESC,
             |        t.vec_id) AS rn
             |  FROM n q JOIN n t ON t.vec_id <> q.vec_id
             |  WHERE q.vec_id < 10) x
             |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin)),

    // Q40 — LSH near-neighbour pairs: 8-bit random-hyperplane signature,
    // exact cosine only on same-signature candidates (banded; the 100 TB
    // path — signature buckets shard the shuffle).
    EngineQuery("q40_embedding_neardup",
      (s, dir) => {
        val e = Tables.table(s, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        val sig = planes.zipWithIndex.foldLeft(e) { case (df, (p, i)) =>
          df.withColumn(s"b$i",
            when(dot(col("v"), planeLit(p)) > 0, lit(1L) * (1L << i))
              .otherwise(lit(0L)))
        }.withColumn("sig",
          (0 until 8).map(i => col(s"b$i")).reduce(_ + _))
          .select("vec_id", "v", "nrm", "sig")
        val a = sig.toDF("vec_a", "va", "na", "sig")
        val b = sig.toDF("vec_b", "vb", "nb", "sig")
        a.join(b, Seq("sig"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
              .as("cos_sim"))
          .filter(col("cos_sim") >= 0.25)
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |n AS (
              |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
              |sig AS (
              |  SELECT vec_id, v, nrm,
              |${planes.zipWithIndex.map { case (p, i) =>
                 s"    (CASE WHEN list_dot_product(v, ${planeSqlList(p)}) > 0 THEN ${1L << i} ELSE 0 END)"
               }.mkString("", " +\n", " AS sig")}
              |  FROM n)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_sim
              |FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id
              |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.25
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // Q38 — multimodal binary-column plumbing: text → opaque bytes →
    // deterministic "feature extraction" (real decode is stubbed; see
    // graft.operators.Multimodal for the typed pipeline).
    EngineQuery("q38_multimodal_features",
      (s, dir) => Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .select(col("doc_id"),
          length(col("blob")).as("n_bytes"),
          sha2(col("blob"), 256).as("content_hash"),
          (length(col("blob")) % 640).as("fake_width"),
          (length(col("blob")) % 480).as("fake_height"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  sha256(text) AS content_hash,
             |  CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
             |  CAST(octet_length(encode(text)) % 480 AS INT) AS fake_height
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
