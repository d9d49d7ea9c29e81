package graft.functions

import scala.collection.mutable

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
  * standard two-pass heavy-hitters pattern at warehouse scale (the
  * guard in pass 2 makes a threshold violation loud, not silent).
  *
  * The declared buffer type is the generic `scala.collection.Map` so
  * the encoder round-trip (shuffle) stays a plain map; at runtime the
  * hot path mutates ONE `mutable.HashMap` in place (the
  * SimhashVoteAggregator pattern) — a deserialized immutable map is
  * converted once on first touch, then every row is an O(1) in-place
  * update with no per-row allocation. At 10¹² tokens the
  * rebuild-a-HAMT-per-row cost of an immutable buffer is a real
  * constant factor; the decrement path uses `mapValuesInPlace` +
  * `filterInPlace`, amortized O(1) per row as before.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, scala.collection.Map[String, Long], Seq[String]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  private def toMutable(m: scala.collection.Map[String, Long]): mutable.HashMap[String, Long] =
    m match {
      case mm: mutable.HashMap[String, Long] @unchecked => mm
      case other => mutable.HashMap.from(other)
    }

  override def zero: scala.collection.Map[String, Long] = new mutable.HashMap[String, Long]()

  override def reduce(buf: scala.collection.Map[String, Long], item: String): scala.collection.Map[String, Long] = {
    val m = toMutable(buf)
    m.get(item) match {
      case Some(c) => m.update(item, c + 1L)
      case None if m.size < capacity => m.update(item, 1L)
      case None =>
        // Buffer full and `item` unseen: decrement every counter by
        // one (the new item's single unit cancels against one unit of
        // each survivor) and drop the zeros.
        m.mapValuesInPlace((_, c) => c - 1L)
        m.filterInPlace((_, c) => c > 0L)
    }
    m
  }

  /** Sum counters, then restore the size bound by subtracting the
    * (capacity+1)-th largest count from every counter — the merge
    * rule that keeps the total undercount ≤ N/(capacity+1) across
    * arbitrary partition trees.
    */
  override def merge(a: scala.collection.Map[String, Long],
                     b: scala.collection.Map[String, Long]): scala.collection.Map[String, Long] = {
    val m = toMutable(a)
    b.foreach { case (k, c) => m.update(k, m.getOrElse(k, 0L) + c) }
    if (m.size > capacity) {
      val threshold = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      m.mapValuesInPlace((_, c) => c - threshold)
      m.filterInPlace((_, c) => c > 0L)
    }
    m
  }

  /** Sorted for a deterministic candidate list regardless of map
    * iteration order.
    */
  override def finish(buf: scala.collection.Map[String, Long]): Seq[String] =
    buf.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[scala.collection.Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
