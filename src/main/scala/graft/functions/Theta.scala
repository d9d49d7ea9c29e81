package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** KMV / theta sketch (Bar-Yossef et al. RANDOM'02; Dasgupta et al.,
  * "Theta sketch framework", public algorithm family): keep the k
  * smallest distinct 48-bit hash values of a key stream. theta = the
  * k-th smallest (2⁴⁸ while under k keys, i.e. the sketch is still
  * EXACT); distinct ≈ (k−1)·2⁴⁸/theta.
  *
  * Why it earns a slot beside HLL (§2.10 row 47): HLL answers
  * distinct-over-UNIONS only. The theta sketch's sample — the hashes
  * below theta — supports INTERSECTION and DIFFERENCE estimates
  * (restrict both samples to h < min(thetaA, thetaB), count, scale
  * by 2⁴⁸/theta), the audience-overlap question a warehouse actually
  * asks of segments it sketched independently.
  *
  * Hashing is md5("th:" ‖ key) first 48 bits — the [[CountMin]]
  * convention: no RNG, reproducible across engines, so the DuckDB
  * oracle rebuilds the sketches AND the integer-division estimates
  * bit-for-bit (q_theta_sketch is hash-checked, like q_count_min).
  * Merging two sketches keeps the k smallest of the union of their
  * values, which IS the sketch of the union of the underlying sets —
  * KMV union is lossless, the algebra spec pins it through parquet.
  *
  * Buffer: a sorted distinct Array[Long], capacity k — bounded
  * memory per (partition, group) with map-side combine, the same
  * mergeable-synopsis contract as [[CountMinAggregator]].
  */
class KmvAggregator(k: Int, salt: String = "th:")
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(k >= 2 && k <= Kmv.MaxK,
    s"k in [2, ${Kmv.MaxK}], got $k (larger k overflows (k-1)*2^48 in Long)")

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], item: String): Array[Long] =
    Kmv.insertHash(buf, Kmv.hash48(salt + item), k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    Kmv.union(a, b, k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Driver-side theta-sketch algebra over collected sketches (each is
  * ≤ k longs — O(k) arithmetic, no cluster work). All estimates are
  * integer floor-division so any ANSI-SQL engine reproduces them.
  */
object Kmv {
  /** 2⁴⁸ — the hash space size; also theta of a still-exact sketch. */
  val Max48: Long = 1L << 48

  /** Largest supported k: the estimates compute (k−1)·2⁴⁸ (and
    * nc·2⁴⁸, nc ≤ k−1) in Long, which silently wraps negative past
    * 2¹⁵ — bounded explicitly rather than returning wrong estimates
    * (the [[graft.operators.Sketches]] cmsJoinSizeEstimate overflow
    * treatment).
    */
  val MaxK: Int = 32768

  private def checkK(k: Int): Unit =
    require(k >= 2 && k <= MaxK, s"k in [2, $MaxK], got $k")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 48 bits of md5(s), big-endian — the value of the first 12
    * hex chars: ('0x' || substr(md5(s), 1, 12))::BIGINT in SQL.
    */
  def hash48(s: String): Long = {
    val b = digests.get().digest(s.getBytes(StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 40) | ((b(1) & 0xffL) << 32) | ((b(2) & 0xffL) << 24) |
      ((b(3) & 0xffL) << 16) | ((b(4) & 0xffL) << 8) | (b(5) & 0xffL)
  }

  /** Insert one 48-bit hash into a sorted distinct KMV buffer,
    * keeping the k smallest (returns the buffer unchanged when the
    * hash is present or too large — the streaming state update and
    * the aggregator reduce share this).
    */
  def insertHash(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    if (buf.length == k && h >= buf(buf.length - 1)) return buf
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // already present
    val ins = -idx - 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  def theta(s: Array[Long], k: Int): Long =
    if (s.length < k) Max48 else s(s.length - 1)

  /** The estimation sample: hashes strictly below theta (the k-th
    * value itself is the threshold, not a sample member).
    */
  def sample(s: Array[Long], k: Int): Array[Long] =
    if (s.length < k) s else s.dropRight(1)

  /** Distinct estimate: exact while under k keys, (k−1)·2⁴⁸/theta
    * after (floor division — the SQL-reproducible form).
    */
  def estimate(s: Array[Long], k: Int): Long = {
    checkK(k)
    if (s.length < k) s.length.toLong else (k - 1).toLong * Max48 / s(s.length - 1)
  }

  /** Lossless KMV union: k smallest of the merged value sets. */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** |A ∩ B| estimate: common sample hashes below min(thetaA, thetaB),
    * scaled by 2⁴⁸/theta. Exact when both sketches are still exact.
    */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Long = {
    checkK(k)
    val t = math.min(theta(a, k), theta(b, k))
    val sa = sample(a, k).iterator.filter(_ < t).toSet
    val nc = sample(b, k).count(h => h < t && sa(h))
    nc * Max48 / t
  }

  /** |A ∖ B| estimate — same restriction, membership negated. */
  def diffEstimate(a: Array[Long], b: Array[Long], k: Int): Long = {
    checkK(k)
    val t = math.min(theta(a, k), theta(b, k))
    val sb = sample(b, k).iterator.filter(_ < t).toSet
    val nd = sample(a, k).count(h => h < t && !sb(h))
    nd * Max48 / t
  }
}
