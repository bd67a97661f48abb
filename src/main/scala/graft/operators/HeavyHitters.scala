package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] —
  * the bounded-memory alternative to a full (token → count) shuffle when
  * only the frequent items matter (top vocabulary over 100 TB of tokens,
  * hot keys ahead of a skew-join salt decision, trending items on a
  * stream).
  *
  * Each partition folds its items into at most `k` counters (classic
  * Misra–Gries); partial summaries MERGE by pointwise addition followed
  * by the (k+1)-th-largest decrement (Agarwal et al., "Mergeable
  * Summaries", PODS'12) — so the map-side combine, the shuffle of
  * |partitions|·k counter rows, and the final merge all carry O(k)
  * state, never |distinct items|.
  *
  * Guarantee (mergeable-summaries theorem): for every item, true_count −
  * n/(k+1) ≤ estimate ≤ true_count, so every item with frequency >
  * n/(k+1) is GUARANTEED present in the summary. WHICH low-frequency
  * items also appear depends on merge order (Spark's is
  * nondeterministic), which is why this operator is unit-gated, not
  * oracle-gated: the guarantee is deterministic, the residue is not —
  * exact top-k reports (q88) remain the oracle-checked path.
  */
object HeavyHitters {

  final case class Hit(item: String, min_count: Long)

  /** Typed aggregator: fold a String column into ≤ `k` (item, lower-
    * bound count) rows, descending by count. Use as
    * `ds.select(HeavyHitters.sketch(k).toColumn)` or over
    * `groupByKey(...).agg(...)` for per-group heavy hitters. */
  def sketch(k: Int): Aggregator[String, Map[String, Long], Seq[Hit]] = {
    require(k >= 1, "need at least one counter")
    new Aggregator[String, Map[String, Long], Seq[Hit]] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(m: Map[String, Long], item: String): Map[String, Long] = {
        val grown = m.updatedWith(item) {
          case Some(c) => Some(c + 1L)
          case None => Some(1L)
        }
        if (grown.size <= k) grown else compress(grown)
      }

      override def merge(a: Map[String, Long],
          b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (acc, (item, c)) =>
          acc.updatedWith(item) {
            case Some(c0) => Some(c0 + c)
            case None => Some(c)
          }
        }
        if (sum.size <= k) sum else compress(sum)
      }

      /** Decrement every counter by the (k+1)-th largest value and drop
        * non-positives — at most k survive, and every survivor's count
        * dropped by exactly the amount the MG error bound accounts
        * for. */
      private def compress(m: Map[String, Long]): Map[String, Long] = {
        val kth = m.values.toSeq.sortBy(-_)(Ordering.Long)(k)
        m.flatMap { case (item, c) =>
          val d = c - kth
          if (d > 0) Some(item -> d) else None
        }
      }

      override def finish(m: Map[String, Long]): Seq[Hit] =
        m.toSeq.sortBy { case (item, c) => (-c, item) }
          .map { case (item, c) => Hit(item, c) }

      override def bufferEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]

      override def outputEncoder: Encoder[Seq[Hit]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
    }
  }
}
