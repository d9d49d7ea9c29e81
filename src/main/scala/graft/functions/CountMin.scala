package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005 —
  * public algorithm) as a mergeable typed Aggregator (SURVEY §2.10).
  *
  * A depth×width counter matrix: each row j owns an independent hash
  * h_j; an item increments one cell per row, and its estimate is the
  * MIN over rows of its cells — an overestimate by at most
  * 2N/width with probability 1 − (1/2)^depth. The buffer is
  * O(depth·width) longs regardless of vocabulary, and the merge is a
  * cell-wise SUM, which is EXACT (no merge error accumulates —
  * unlike Misra-Gries whose merge re-trims). That exact-merge
  * property is the 100 TB story: materialize one ~32 KB sketch per
  * bucket/day/source, then answer frequency questions over ANY union
  * of buckets later by adding matrices — no rescan, and frequencies
  * (unlike distincts) sum losslessly across disjoint buckets.
  *
  * Hashing is md5(j + ":" + item), first 48 bits, mod width — fully
  * deterministic, no RNG, and re-computable in ANSI SQL, so the
  * DuckDB oracle can reproduce not just exact counts but the
  * ESTIMATES themselves bit-for-bit (q_count_min is hash-checked,
  * not tolerance-checked — rare for a sketch).
  *
  * Buffer is a primitive Array[Long] mutated in place (the
  * SimhashVoteAggregator pattern): zero per-row allocation on the
  * hot path.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16, s"depth 1..16, got $depth")
  require(width >= 2, s"width >= 2, got $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    var j = 0
    while (j < depth) {
      buf(j * width + CountMin.cell(j, item, width)) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {

  // MessageDigest.getInstance per call costs more than the digest
  // itself at 10⁷ tokens/task × depth calls each — reuse one
  // instance per thread (digest() resets it after each use).
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Row-j cell of `item`: first 48 bits of md5("j:item") mod width —
    * read straight from the first 6 digest bytes (big-endian), which
    * is by definition the value of the first 12 hex chars. Mirrored
    * EXACTLY by the SQL oracle:
    * ('0x' || substr(md5(j || ':' || item), 1, 12))::BIGINT % width.
    */
  def cell(j: Int, item: String, width: Int): Int = {
    val b = digests.get().digest(s"$j:$item".getBytes(StandardCharsets.UTF_8))
    val v = ((b(0) & 0xffL) << 40) | ((b(1) & 0xffL) << 32) |
      ((b(2) & 0xffL) << 24) | ((b(3) & 0xffL) << 16) |
      ((b(4) & 0xffL) << 8) | (b(5) & 0xffL)
    (v % width).toInt
  }

  /** Point estimate from a flattened sketch: min over rows. */
  def estimate(sketch: Array[Long], depth: Int, width: Int, item: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = sketch(j * width + cell(j, item, width))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Cell-wise sum — the exact merge of CMS matrices. */
  def union(sketches: Seq[Array[Long]]): Array[Long] = {
    require(sketches.nonEmpty)
    val out = sketches.head.clone()
    sketches.tail.foreach { s =>
      require(s.length == out.length, "sketch shapes differ")
      var i = 0
      while (i < out.length) { out(i) += s(i); i += 1 }
    }
    out
  }
}
