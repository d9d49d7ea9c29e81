package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale rehearsal for the PCA pre-transform ANN (sim_ann_pca) at
  * 2·10⁵ vectors — the SemRehearsal pattern: a deterministic corpus
  * with an ANISOTROPIC SPECTRUM in a ROTATED frame (per-direction
  * amplitude decay^j, directions Gram-Schmidt-rotated), i.e. the
  * realistic embedding shape — semantic variance concentrated in few
  * directions, none of them coordinate-aligned, so every COORDINATE
  * carries a mix of all spectrum levels. This is the adversarial
  * case for naive prefix truncation and the load-bearing case for a
  * learned basis. The rehearsal measures, for §5:
  *
  *  1. the TRAINING cost at scale — one Gram pass over 200k×64 +
  *     the driver Jacobi (the whole train path, timed);
  *  2. recall@10 vs brute force per dOut ∈ {8, 16, 32} at
  *     shortlist=100 — the dial table a deployment reads;
  *  3. captured energy per dOut (the predictor a deployment can
  *     compute BEFORE committing to a dOut);
  *  4. PCA-vs-PREFIX at equal dOut: the same shortlist machinery
  *     over coordinate-sliced vectors (the sim_matryoshka path) —
  *     quantifying what the learned basis buys when structure is
  *     not axis-aligned.
  *
  * Usage: runMain graft.PcaRehearsal [nVecs] [decay]
  */
object PcaRehearsal {

  private val Dim = 64

  /** Deterministic uniform in [-1, 1) from md5(tag:i:j). */
  private def u(tag: String, i: Long, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i:$j".getBytes("UTF-8"))
    val h = d.take(6).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    h.toDouble / 140737488355328.0 - 1.0 // 2^47
  }

  /** Gram-Schmidt a deterministic random set into an orthonormal
    * subDim-frame of R^Dim — the hidden subspace the clusters span. */
  private def frame(subDim: Int): Array[Array[Double]] = {
    val raw = Array.tabulate(subDim)(r => Array.tabulate(Dim)(j => u("fr", r.toLong, j)))
    val out = Array.ofDim[Double](subDim, Dim)
    for (r <- 0 until subDim) {
      val v = raw(r).clone()
      for (p <- 0 until r) {
        val d = (0 until Dim).map(j => v(j) * out(p)(j)).sum
        for (j <- 0 until Dim) v(j) -= d * out(p)(j)
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      for (j <- 0 until Dim) out(r)(j) = v(j) / n
    }
    out
  }

  /** Vector i: anisotropic spectrum in a ROTATED frame — coefficient
    * along frame direction j is decay^j · uniform, so similarity
    * between vectors is dominated by the first few principal
    * directions (the realistic embedding shape: semantic variance
    * concentrated, none of it coordinate-aligned — every COORDINATE
    * carries a mix of all spectrum levels, which is exactly where
    * naive prefix truncation loses and a learned basis wins). */
  def corpus(n: Long, decay: Double): Array[(Long, Array[Float])] = {
    val fr = frame(Dim)
    val amps = Array.tabulate(Dim)(j => math.pow(decay, j))
    Array.tabulate(n.toInt) { i0 =>
      val i = i0.toLong
      val coef = Array.tabulate(Dim)(j => amps(j) * u("m", i, j))
      (i, Array.tabulate(Dim)(k =>
        (0 until Dim).map(j => coef(j) * fr(j)(k)).sum.toFloat))
    }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val decay = if (args.length > 1) args(1).toDouble else 0.8
    val spark = GraftSession.local()
    try {
      import spark.implicits._
      val emb = corpus(n, decay).map { case (i, v) => (i, v.toSeq) }
        .toSeq.toDF("vec_id", "embedding").localCheckpoint(true)
      println(s"[rehearsal] pca corpus: $n vecs, rotated spectrum " +
        s"decay=$decay over R$Dim")
      val t0 = System.nanoTime()
      val (basis, energy) = Similarity.pcaTrain(emb, Dim)
      val trainWall = (System.nanoTime() - t0) / 1e9
      println(f"[rehearsal] pca train (Gram pass + Jacobi) at $n%,d x $Dim: " +
        f"$trainWall%.1f s")
      val exact = Similarity.bruteForceTopK(emb, 8, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(short: org.apache.spark.sql.DataFrame): Double = {
        val shortSel = short.select(col("query_id"), col("corpus_id"))
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        val rescored = emb.join(broadcast(shortSel), col("vec_id") === col("corpus_id"))
          .join(broadcast(q), Seq("query_id"))
          .select(col("query_id"), col("corpus_id"),
            graft.functions.VectorFunctions.vecCosine(col("q_emb"), col("embedding")).as("cosine"))
        val got = graft.functions.TopK.perKeyTopK(
            rescored, "query_id", "corpus_id", "cosine", 10, roundScale = 6)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact intersect got).size.toDouble / exact.size
      }
      for (dOut <- Seq(8, 16, 32)) {
        val cum = energy.take(dOut).sum
        val tq0 = System.nanoTime()
        val proj = Similarity.pcaProject(emb, basis.take(dOut))
        val rPca = recallOf(Similarity.bruteForceTopK(proj, 8, 100))
        val pcaWall = (System.nanoTime() - tq0) / 1e9
        val sliced = emb.withColumn("embedding", slice(col("embedding"), 1, dOut))
        val rPre = recallOf(Similarity.bruteForceTopK(sliced, 8, 100))
        println(f"[rehearsal] dOut=$dOut%2d: energy $cum%.3f, " +
          f"recall@10 PCA $rPca%.3f (query path $pcaWall%.1f s) vs " +
          f"coordinate-prefix $rPre%.3f at shortlist=100")
      }
      graft.operators.Checkpoints.free(emb)
    } finally spark.stop()
  }
}
