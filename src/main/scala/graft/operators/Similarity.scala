package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]): brute-force
  * top-k cosine as the exact baseline, random-hyperplane sign-LSH as the
  * scale path (candidates share an 8-bit signature bucket — the join
  * shards on the signature, never all-pairs).
  *
  * Determinism: embeddings are cast to DOUBLE and dot products use
  * Spark's sequential higher-order-function fold; surfaced similarities
  * are rounded to 6 decimals before ranking so ordering is reproducible
  * across engines.
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** Normalize an embeddings table to (idCol, v: double[], nrm). */
  def prepared(embeddings: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol), toDoubleArray(col(embCol)).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Exact top-k cosine neighbours for a query subset. Brute force —
    * correct baseline; at scale restrict `queries` or switch to
    * [[lshNearNeighbours]]. */
  def topKCosine(embeddings: DataFrame, queryPredicate: Column, k: Int)
      : DataFrame = {
    val e = prepared(embeddings)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("qnrm")).filter(queryPredicate)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    q.join(e, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6)
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Deterministic ±1 hyperplanes derived from SHA-256 (so an external
    * oracle can embed identical literals). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    (0 until nPlanes).map { p =>
      Array.tabulate(dim) { i =>
        val h = md.digest(s"$p:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  private def planeLit(p: Array[Double]): Column =
    array(p.map(v => lit(v)).toIndexedSeq: _*)

  /** Sign-LSH near-neighbour pairs: bucket by the n-bit hyperplane
    * signature, exact cosine only within buckets. */
  def lshNearNeighbours(embeddings: DataFrame, planes: Seq[Array[Double]],
      minCosine: Double): DataFrame = {
    val e = prepared(embeddings)
    val sig = planes.zipWithIndex.foldLeft(e) { case (df, (p, i)) =>
      df.withColumn(s"b$i",
        when(dot(col("v"), planeLit(p)) > 0, lit(1L << i)).otherwise(0L))
    }.withColumn("sig", planes.indices.map(i => col(s"b$i")).reduce(_ + _))
      .select("vec_id", "v", "nrm", "sig")
    val a = sig.toDF("vec_a", "va", "na", "sig")
    val b = sig.toDF("vec_b", "vb", "nb", "sig")
    a.join(b, Seq("sig"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }
}
