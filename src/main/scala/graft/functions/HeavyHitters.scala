package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters sketch as a mergeable typed Aggregator
  * (SURVEY §2.10).
  *
  * The buffer holds at most `capacity` (item, count) counters, so a
  * full corpus pass costs O(capacity) memory per task no matter how
  * large the vocabulary is — unlike a groupBy, whose shuffle carries
  * every distinct key. The classic guarantee (Misra & Gries 1982;
  * merge step per Agarwal et al., "Mergeable Summaries", PODS'12):
  * after summarizing N items, any item with true frequency
  * > N/(capacity+1) is still in the buffer, and every surviving
  * counter undercounts by at most N/(capacity+1).
  *
  * That makes the sketch a CANDIDATE generator, not a final answer:
  * [[graft.operators.Sketches.heavyHitters]] re-counts the surviving
  * candidates exactly in a second pass, so the emitted top-k is
  * exact whenever the k-th frequency clears the threshold — the
  * standard two-pass heavy-hitters pattern at warehouse scale.
  *
  * Cost: an insert is O(1) map update; the decrement-all path
  * rebuilds the map in O(capacity), but each rebuild removes
  * `capacity` units of counter mass while each row adds one, so
  * rebuilds happen at most N/(capacity+1) times — amortized O(1)
  * per row.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c)                    => buf.updated(item, c + 1L)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // Buffer full and `item` unseen: decrement every counter by
        // one (the new item's single unit cancels against one unit of
        // each survivor) and drop the zeros.
        buf.collect { case (k, c) if c > 1L => k -> (c - 1L) }
    }

  /** Sum counters, then restore the size bound by subtracting the
    * (capacity+1)-th largest count from every counter — the merge
    * rule that keeps the total undercount ≤ N/(capacity+1) across
    * arbitrary partition trees.
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
    if (sum.size <= capacity) sum
    else {
      val threshold = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      sum.collect { case (k, c) if c > threshold => k -> (c - threshold) }
    }
  }

  /** Sorted for a deterministic candidate list regardless of map
    * iteration order.
    */
  override def finish(buf: Map[String, Long]): Seq[String] = buf.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
