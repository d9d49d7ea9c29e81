package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale rehearsal for SemDeDup (dedup_semantic / stream_semantic) at
  * 2·10⁵ vectors — the PqRehearsal pattern: a deterministic CLUSTERED
  * corpus (md5-derived pseudo-noise around unit centers, so the
  * driver-side oracle sees bit-identical floats) with PLANTED
  * duplicate groups: a hash-selected share of vectors are near-copies
  * of their group's representative (tiny noise, pairwise cos ≈ 1)
  * while ordinary clustermates sit at a noise level that keeps their
  * pairwise cosines BELOW tau. The rehearsal:
  *
  *  1. verifies the KEPT SET exactly against an independent local
  *     implementation (same trained quantizer, same assignment tie
  *     rules, same left-to-right double cosine) — the SimilaritySpec
  *     oracle at 400× the row count;
  *  2. measures the CANDIDATE-VOLUME bound the operator exists for:
  *     Σ cell·(cell−1)/2 within-cell pairs vs the N·(N−1)/2 all-pairs
  *     bound (the paper's tractability claim, printed for §5).
  *
  * The cluster noise level deliberately puts ordinary clustermates'
  * cosines NEAR tau (≈0.96 expected vs the 0.95 threshold), so
  * thousands of candidate pairs land on both sides of the boundary —
  * the exactness gate is exercised exactly where a ulp of cosine
  * drift between the distributed and local implementations would
  * flip a verdict.
  *
  * Usage: runMain graft.SemRehearsal [nVecs] [nClusters] [dupPermille]
  */
object SemRehearsal {

  private val Dim = 16
  private val Tau = 0.95

  /** Deterministic uniform in [-1, 1) from md5(tag:i:j). */
  private def u(tag: String, i: Long, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i:$j".getBytes("UTF-8"))
    val h = d.take(6).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    h.toDouble / 140737488355328.0 - 1.0 // 2^47
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  /** Vector i: cluster = i mod nClusters; duplicates (hash-selected
    * share) = group representative (one per (cluster, i mod 7) slot)
    * plus tiny noise; ordinary members = center plus wide noise. */
  def corpus(n: Long, nClusters: Int, dupPermille: Int): Array[(Long, Array[Float])] = {
    val centers = Array.tabulate(nClusters)(c =>
      normalize(Array.tabulate(Dim)(j => u("c", c.toLong, j).toFloat)))
    def member(tag: String, seed: Long, c: Int, amp: Double): Array[Float] =
      Array.tabulate(Dim)(j => (centers(c)(j) + amp * u(tag, seed, j)).toFloat)
    Array.tabulate(n.toInt) { i0 =>
      val i = i0.toLong
      val c = (i % nClusters).toInt
      val isDup = java.lang.Long.remainderUnsigned(
        scala.util.hashing.MurmurHash3.stringHash(s"dup:$i").toLong & 0xffffffffL, 1000L) < dupPermille
      val v =
        if (isDup) {
          // group representative: deterministic per (cluster, slot)
          val slot = (i % 7).toInt
          val rep = member("rep", c.toLong * 7 + slot, c, 0.25)
          Array.tabulate(Dim)(j => (rep(j) + 0.004 * u("d", i, j)).toFloat)
        } else member("m", i, c, 0.25)
      (i, v)
    }
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val nClusters = if (args.length > 1) args(1).toInt else 64
    val dupPermille = if (args.length > 2) args(2).toInt else 100
    val spark = GraftSession.local()
    try {
      import spark.implicits._
      val local = corpus(n, nClusters, dupPermille)
      val emb = local.map { case (i, v) => (i, v.toSeq) }.toSeq
        .toDF("vec_id", "embedding").localCheckpoint(true)
      val nCells = Similarity.sizeCells(n)
      val trained = Similarity.trainCoarseQuantizer(emb, nCells, iters = 2)
      println(s"[rehearsal] semdedup corpus: $n vecs, $nClusters clusters, " +
        s"$nCells cells, dup $dupPermille permille")
      val t0 = System.nanoTime()
      val got = Similarity.semanticDedup(emb, nCells, Tau, coarse = Some(trained))
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      // local oracle: same assignment, same rank order, same rule
      val cents = trained.map { case (c, e) => (c, e.toArray) }
      val byCell = local.map { case (i, v) =>
        val (cell, ccos) = cents.map { case (c, ce) => (c, cos(v, ce)) }
          .maxBy { case (c, s) => (s, -c) }
        (cell, i, v, ccos)
      }.groupBy(_._1)
      var candidatePairs = 0L
      val expected = byCell.valuesIterator.flatMap { ms =>
        val order = ms.sortBy { case (_, i, _, ccos) => (ccos, i) }
        candidatePairs += order.length.toLong * (order.length - 1) / 2
        order.indices.map { k =>
          val (_, i, v, _) = order(k)
          i -> !(0 until k).exists(p => cos(order(p)._3, v) >= Tau)
        }
      }.toMap
      require(got.size == n.toInt, s"verdict rows ${got.size} != $n")
      val drift = got.keysIterator.count(k => got(k) != expected(k))
      require(drift == 0, s"kept-set drift on $drift of $n verdicts")
      val dropped = got.valuesIterator.count(!_)
      val allPairs = n * (n - 1) / 2
      println(f"[rehearsal] semdedup: $wall%.1f s, kept set EXACT vs the local " +
        f"per-cell oracle ($n%,d verdicts, 0 drift); candidate pairs " +
        f"$candidatePairs%,d = ${candidatePairs * 100.0 / allPairs}%.3f%% of " +
        f"all-pairs $allPairs%,d; $dropped%,d dropped as semantic dups")
      graft.operators.Checkpoints.free(emb)
    } finally spark.stop()
  }
}
