package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** KLL sketch state: geometric level buffers, items at level i carry
  * weight 2^i. `coins` is the deterministic compaction-coin counter
  * (splitmix64 stream — no RNG object, so state is a plain product
  * and replays identically for identical merge trees).
  */
case class KllSketch(k: Int, n: Long, coins: Long, levels: Seq[Seq[Long]])

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016 — public
  * algorithm; the DataSketches "kll" family) as a mergeable typed
  * Aggregator (SURVEY §2.10).
  *
  * Level i holds items of weight 2^i; a full level sorts, keeps every
  * other item (coin-offset), and promotes the survivors one level up
  * — so total state is O(k·log(n/k)) items for n rows, with rank
  * error ε = O(1/k) w.h.p. The merge is level-wise concatenation plus
  * the same compaction rule, which is what the equi-width histogram
  * sketch ([[graft.operators.Sketches.histogramBySource]]) cannot
  * offer when the value RANGE is unbounded or unknown: the histogram
  * needs a bin width chosen up front and its state grows with
  * range/binWidth, while KLL adapts to any distribution with state
  * independent of both range and row count. The price is
  * reproducibility: compaction decisions depend on the merge tree
  * Spark happens to execute, so estimates are deterministic only up
  * to the (uncontrolled) partial-merge order — the documented
  * rows-only reason for `q_kll_sketch`; the spec gates rank error on
  * planted distributions instead, and the query carries its own
  * exact-rank audit columns.
  *
  * Invariant spec-pinned: compaction conserves total weight exactly
  * (2m items of weight w become m of weight 2w; an odd leftover stays
  * at its level), so Σ weights == n always — estimates never drift
  * from the true stream length no matter how many compactions ran.
  *
  * 100 TB story: one ~KB sketch per source/day/bucket materialized in
  * a single map-side-combined pass, then any-bucket-union quantiles
  * from O(buckets·k·log) driver arithmetic — the
  * [[graft.operators.Sketches.histogramQuantiles]] read path with no
  * up-front range commitment.
  */
class KllAggregator(k: Int)
    extends Aggregator[Long, KllSketch, KllSketch] {
  require(k >= 8 && k <= 65536, s"k in 8..65536, got $k")

  override def zero: KllSketch = Kll.empty(k)
  override def reduce(s: KllSketch, v: Long): KllSketch = Kll.update(s, v)
  override def merge(a: KllSketch, b: KllSketch): KllSketch = Kll.merge(a, b)
  override def finish(s: KllSketch): KllSketch = s

  override def bufferEncoder: Encoder[KllSketch] = ExpressionEncoder()
  override def outputEncoder: Encoder[KllSketch] = ExpressionEncoder()
}

object Kll {

  def empty(k: Int): KllSketch = KllSketch(k, 0L, 0L, Vector(Vector.empty))

  /** splitmix64 — the deterministic coin stream for compaction
    * offsets (Steele et al., "Fast splittable pseudorandom number
    * generators", OOPSLA 2014 — public constants).
    */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Capacity of level l when `top` is the current highest level:
    * k·(2/3)^(top−l) floored at 8 — higher levels (heavier items)
    * keep more, the KLL capacity schedule.
    */
  private def capacity(k: Int, l: Int, top: Int): Int =
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, (top - l).toDouble)).toInt)

  private def totalSize(levels: Seq[Seq[Long]]): Int = levels.map(_.size).sum

  /** Compact until total size fits the capacity budget: lowest
    * over-capacity level sorts, an odd leftover (the minimum) stays,
    * the even-length rest promotes every other item at the coin's
    * offset. Each pass halves ≥4 items, so this terminates.
    */
  private def compress(k: Int, n: Long, coins0: Long,
                       levels0: Vector[Vector[Long]]): KllSketch = {
    var levels = levels0
    var coins = coins0
    var guard = 0
    while ({
      val top = levels.length - 1
      val budget = levels.indices.map(capacity(k, _, top)).sum
      totalSize(levels) > budget
    } && guard < 1000) {
      guard += 1
      val top = levels.length - 1
      val l = levels.indices
        .find(i => levels(i).size >= capacity(k, i, top))
        .getOrElse(levels.indices.maxBy(levels(_).size))
      val buf = levels(l).sorted
      val coin = (splitmix64(coins) & 1L).toInt
      coins += 1
      val (leftover, body) =
        if (buf.length % 2 == 0) (Vector.empty[Long], buf)
        else (Vector(buf.head), buf.tail)
      val promoted = body.indices.collect {
        case j if j % 2 == coin => body(j)
      }.toVector
      if (l + 1 > top) levels = levels :+ Vector.empty[Long]
      levels = levels
        .updated(l, leftover)
        .updated(l + 1, levels(l + 1) ++ promoted)
    }
    require(guard < 1000, "KLL compression failed to converge")
    KllSketch(k, n, coins, levels)
  }

  def update(s: KllSketch, v: Long): KllSketch = {
    // hot path: touch only the outer spine and level 0 (bounded by
    // its capacity); the full deep copy happens only on compaction
    val base = s.levels.toVector
    val withItem = base.updated(0, base(0) :+ v)
    val top = withItem.length - 1
    val budget = withItem.indices.map(capacity(s.k, _, top)).sum
    if (totalSize(withItem) <= budget) KllSketch(s.k, s.n + 1, s.coins, withItem)
    else compress(s.k, s.n + 1, s.coins, withItem.map(_.toVector))
  }

  def merge(a: KllSketch, b: KllSketch): KllSketch = {
    require(a.k == b.k, s"KLL k mismatch: ${a.k} vs ${b.k}")
    if (b.n == 0) return a
    if (a.n == 0) return b
    val depth = math.max(a.levels.length, b.levels.length)
    val combined = Vector.tabulate(depth) { i =>
      (if (i < a.levels.length) a.levels(i).toVector else Vector.empty[Long]) ++
        (if (i < b.levels.length) b.levels(i).toVector else Vector.empty[Long])
    }
    // decorrelate the two coin streams so merged compactions don't
    // replay either side's sequence
    compress(a.k, a.n + b.n, a.coins ^ splitmix64(b.coins), combined)
  }

  /** Total retained weight — must equal n (the conservation
    * invariant the spec pins).
    */
  def totalWeight(s: KllSketch): Long =
    s.levels.zipWithIndex.map { case (lv, i) => lv.size.toLong * (1L << i) }.sum

  /** Permille-rank estimate: smallest retained item whose cumulative
    * weight reaches ⌈q·n/1000⌉.
    */
  def quantile(s: KllSketch, qPermille: Int): Long = {
    require(qPermille >= 1 && qPermille <= 1000, s"permille 1..1000, got $qPermille")
    require(s.n > 0, "quantile of an empty sketch")
    val weighted = (for {
      (lv, i) <- s.levels.zipWithIndex
      v <- lv
    } yield (v, 1L << i)).sortBy(_._1)
    val target = (qPermille.toLong * s.n + 999L) / 1000L
    var acc = 0L
    var idx = 0
    while (idx < weighted.length) {
      acc += weighted(idx)._2
      if (acc >= target) return weighted(idx)._1
      idx += 1
    }
    weighted.last._1
  }

  /** Retained item count — the O(k·log(n/k)) bound the spec checks. */
  def size(s: KllSketch): Int = totalSize(s.levels)
}
