package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Spark [[Aggregator]] — the
  * engine's exemplar of the custom-aggregation extension tier (the scalar
  * tier being the native codegen expressions in this package).
  *
  * The k-counter Misra-Gries sketch answers "which tokens occur more than
  * N/k times" in O(k) space with ONE-SIDED error: every true heavy hitter
  * is present (no false negatives), and every reported count undercounts
  * its true count by at most N/k. The merge is the mergeable-summaries
  * construction (Agarwal et al., PODS 2012): sum counterparts, then
  * subtract the (k+1)-th largest count and drop non-positives. Mergeability
  * is what makes the sketch correct under Spark's execution model — partial
  * aggregates per task, merged in any order/shape on the reduce side, same
  * guarantees regardless of partitioning. Counts (not membership) depend
  * on merge order, so the sketch is spec-verified against exact counts
  * (like the GK quantile sketch) rather than oracle-hashed.
  *
  * At 100 TB: the buffer is k entries per group regardless of input size,
  * the update is map-side, and the shuffle carries only the k-entry
  * summaries — the whole point versus an exact (token, count) aggregation
  * whose distinct-key explosion this sketch exists to avoid.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0, "k must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None =>
        // decrement-all step: one "vote" of every tracked token is spent
        // cancelling this untracked one
        buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }

  def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
