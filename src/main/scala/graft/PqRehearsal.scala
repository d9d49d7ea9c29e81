package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale rehearsal for the PQ family on synthetic CLUSTERED corpora
  * (unlike the testdata's random gaussians, clustered data is what
  * real embedding corpora look like and what quantizers exploit).
  * Two questions, both round-6 claims:
  *
  *  1. Sampled training (`sampleFraction`, FAISS practice): does a 5%
  *     content-hash sample train codebooks with the same recall as
  *     the full corpus, at a fraction of the cost? (This is what
  *     makes the persisted-codebook design 100 TB-shaped — training
  *     cost decouples from corpus size.)
  *  2. Residual vs raw-vector codes at scale: with clusters, raw PQ
  *     burns its codebook budget re-encoding cluster offsets, while
  *     IVFPQ-on-residuals quantizes only the within-cluster noise —
  *     the recall gap the 500-row random testdata cannot show.
  *
  * Dials: ksub=64 (the small-corpus default ksub=16 cannot resolve
  * within-cluster noise at 10⁵⁺ rows — measured 0.05 recall at 200k;
  * codebook size is a function of CORPUS scale, not a constant),
  * nCells=64 matching the planted cluster count, shortlist 20·k.
  * The printed table is committed in SURVEY §5.
  *
  * Usage: runMain graft.PqRehearsal [maxRows]
  */
object PqRehearsal {

  /** Deterministic clustered corpus: `nClusters` xxhash64-derived
    * centroids in [-1, 1)^dim, each vector = its cluster centroid +
    * 0.15-scaled per-(id, j) noise. Pure expressions — built
    * distributed, no driver materialization.
    *
    * `sortedByCluster=false` interleaves clusters (id mod nClusters) —
    * the first rows sample every cluster, a LUCKY seed draw.
    * `sortedByCluster=true` stores cluster runs contiguously (id div
    * runLen) — what a corpus sorted by source/shard actually looks
    * like, where the first `nCells` rows all come from ONE cluster and
    * an untrained coarse quantizer degenerates (the round-7 balance
    * spec's adversarial case).
    */
  def syntheticEmbeddings(spark: SparkSession, n: Long, nClusters: Int = 64,
                          dim: Int = 64,
                          sortedByCluster: Boolean = false): DataFrame = {
    val runLen = math.max(1L, (n + nClusters - 1) / nClusters)
    val clusterId =
      if (sortedByCluster) s"least(CAST(id / $runLen AS BIGINT), ${nClusters - 1})"
      else s"pmod(id, $nClusters)"
    spark.range(n).select(col("id").as("vec_id"),
      expr(
        s"""transform(sequence(0, ${dim - 1}), j -> CAST(
           |  (pmod(xxhash64(concat('c:', CAST($clusterId AS STRING), ':', CAST(j AS STRING))), 2000) - 1000) / 1000.0
           |  + 0.15 * (pmod(xxhash64(concat('n:', CAST(id AS STRING), ':', CAST(j AS STRING))), 2000) - 1000) / 1000.0
           |AS FLOAT))""".stripMargin.replaceAll("\n", " ")).as("embedding"))
  }

  /** Deterministic SMOOTH-MANIFOLD corpus: vectors lie (up to small
    * noise) on a half-circle in the first two dims, θ = id·π/n, with
    * ids — and therefore positions on the arc — in sorted order.
    * Real embedding corpora are continuous manifolds, not orthogonal
    * blobs, and this is the geometry where prefix seeding fails
    * catastrophically (the first `nCells` rows span a sliver of arc,
    * so one cell swallows nearly the whole corpus) while hash-seeded
    * Lloyd recovers the uniform quantizer.
    */
  def manifoldEmbeddings(spark: SparkSession, n: Long, dim: Int = 64,
                         noise: Double = 0.01): DataFrame = {
    spark.range(n).select(col("id").as("vec_id"),
      expr(
        s"""transform(sequence(0, ${dim - 1}), j -> CAST(
           |  CASE WHEN j = 0 THEN cos(id * pi() / $n)
           |       WHEN j = 1 THEN sin(id * pi() / $n)
           |       ELSE $noise * (pmod(xxhash64(concat('n:', CAST(id AS STRING), ':', CAST(j AS STRING))), 2000) - 1000) / 1000.0
           |  END AS FLOAT))""".stripMargin.replaceAll("\n", " ")).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.filter(_.forall(_.isDigit)).map(_.toLong).getOrElse(50000L)
    val doCoarse = args.contains("coarse")
    val doCoarse1m = args.contains("coarse1m")
    val spark = GraftSession.local()
    // ---- round-8 trained-TABLE regime rehearsal (`coarse1m` arg):
    // 10⁶-row SORTED clustered corpus, nCells = sizeCells(10⁶) = 1024
    // — deployment granularity, where the quantizer is a TABLE
    // (coarseSave/coarseLoad round-trip) and BOTH assignments run the
    // broadcast-join path (ivfCellsBroadcast, probes-bounded
    // aggregation). Gates (the round-8 VERDICT asks): cell balance
    // max ≤ 4× mean, and recall at the probed fraction. The committed
    // table lives in SURVEY §5.
    if (doCoarse1m) {
      import org.apache.spark.sql.functions.{col, count, lit}
      import spark.implicits._
      val n = 1000000L
      val nc = Similarity.sizeCells(n)
      require(nc == 1024, s"sizeCells(10^6) must land at 1024, got $nc")
      val emb = syntheticEmbeddings(spark, n, nClusters = 64,
        sortedByCluster = true).localCheckpoint(true)
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      // 5%, not 2%: the sample must carry enough rows PER CELL to
      // place 1024 centroids (2% of 10⁶ is ~20 samples/cell — too
      // sparse; 5% is ~49, and the balance gate holds)
      val (trained, trainSec) = time(Similarity.trainCoarseQuantizer(
        emb, nc, iters = 4, sampleFraction = 0.05))
      // persistence at deployment granularity: the TABLE is the artifact
      val qdir = java.nio.file.Files.createTempDirectory("graft-coarse1m-").toString + "/q"
      Similarity.coarseSave(trained, qdir, spark)
      val coarse = Similarity.coarseLoad(qdir, spark)
      require(coarse == trained, "coarseSave/coarseLoad must round-trip bit-exactly")
      val seeds = coarse.toDF("cell", "cell_emb")
      val (pops, assignSec) = time(
        Similarity.ivfCellsBroadcast(emb, "vec_id", "embedding", seeds, probes = 1)
          .groupBy("cell").agg(count(lit(1)).as("n"))
          .collect().map(_.getLong(1)))
      val mean = n.toDouble / nc
      val expCand = pops.map(p => p.toDouble * p).sum / n
      println(f"[coarse1m] n=$n nCells=$nc | cells=${pops.length}%4d " +
        f"max=${pops.max}%7d (${pops.max / mean}%5.1fx mean) | " +
        f"E[cand]=$expCand%9.0f (${100.0 * expCand / n}%5.2f%% of corpus) | " +
        f"train $trainSec%5.1f s | assign $assignSec%5.1f s")
      require(pops.max <= 4 * mean,
        s"balance gate: max cell ${pops.max} > 4x mean $mean")
      // recall at the probed fraction through the SAME broadcast path
      val exact = Similarity.bruteForceTopK(emb, 8, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (probes <- Seq(8, 16)) {
        val (got, qSec) = time(Similarity.annTopKIvf(emb, 8, 10, probes = probes,
          coarse = Some(coarse), viaTable = true).collect())
        val s = got.map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect s).size.toDouble / exact.size
        println(f"[coarse1m] probes=$probes%3d (${100.0 * probes / nc}%4.1f%% of cells) | " +
          f"recall $recall%.3f | query $qSec%5.1f s")
        if (probes == 16) require(recall >= 0.9,
          s"recall gate at 16/1024 probes: $recall < 0.9")
      }
      spark.stop()
      return
    }
    // ---- round-7 large-quantizer balance rehearsal (`coarse` arg):
    // 200k-row SORTED manifold corpus, nCells=512 — past the inline
    // gate, so assignment runs the O(1)-plan matrix path. The
    // CoarseQuantizerSpec story at deployment granularity: prefix
    // seeds span a sliver of the manifold; trained cells bound the
    // probed-cell candidate volume (the committed table in SURVEY §5).
    if (doCoarse) {
      import org.apache.spark.sql.functions.{col, count, lit}
      import spark.implicits._
      val n = 200000L
      val nc = 512
      val emb = manifoldEmbeddings(spark, n).localCheckpoint(true)
      for ((nm, iters, byHash) <- Seq(("trained", 3, true), ("prefix0", 0, false))) {
        val (c, tSec) = {
          val t0 = System.nanoTime()
          val r = Similarity.trainCoarseQuantizer(emb, nc, iters,
            sampleFraction = 0.05, seedByHash = byHash)
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val pops = Similarity.ivfCellsMatrix(emb, "vec_id", "embedding",
            c.toDF("cell", "cell_emb"), probes = 1)
          .groupBy("cell").agg(count(lit(1)).as("n"))
          .collect().map(_.getLong(1))
        val mean = n.toDouble / nc
        val expCand = pops.map(p => p.toDouble * p).sum / n
        println(f"[coarse] n=$n nCells=$nc $nm%8s | cells=${pops.length}%4d " +
          f"max=${pops.max}%7d (${pops.max / mean}%6.1fx mean) | " +
          f"E[cand]=$expCand%9.0f | train $tSec%5.1f s")
      }
      spark.stop()
      return
    }
    val (m, ksub, nCells, slf) = (16, 64, 64, 20)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (n <- Seq(50000L, 200000L).filter(_ <= maxRows)) {
      val emb = syntheticEmbeddings(spark, n).localCheckpoint(true)
      val exact = Similarity.bruteForceTopK(emb, 8, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(got: Array[org.apache.spark.sql.Row]): Double = {
        val s = got.map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact intersect s).size.toDouble / exact.size
      }
      // raw-vector PQ, full vs 5%-sample training
      val (fullBooks, fullSec) = time(Similarity.pqTrain(emb, m, ksub, iters = 3))
      val (sampBooks, sampSec) = time(
        Similarity.pqTrain(emb, m, ksub, iters = 3, sampleFraction = 0.05))
      val rFull = recall(Similarity.annTopKPqRerank(emb, 8, 10, m, ksub,
        shortlistFactor = slf, index = Some(fullBooks)).collect())
      val rSamp = recall(Similarity.annTopKPqRerank(emb, 8, 10, m, ksub,
        shortlistFactor = slf, index = Some(sampBooks)).collect())
      // residual IVFPQ, same budgets, sampled training
      val (resBooks, resSec) = time(Similarity.pqTrainResidual(
        emb, nCells, m, ksub, iters = 3, sampleFraction = 0.05))
      val rRes = recall(Similarity.annTopKIvfPqResidual(emb, 8, 10, nCells,
        probes = 4, m, ksub, shortlistFactor = slf, index = Some(resBooks)).collect())
      println(f"[pq] n=$n%7d | raw PQ full-train $fullSec%6.1f s recall $rFull%.3f | " +
        f"raw PQ 5%%-train $sampSec%5.1f s recall $rSamp%.3f | " +
        f"residual IVFPQ 5%%-train $resSec%5.1f s recall $rRes%.3f")
    }

    // ---- round-7 sweep: nCells × probes under the TRAINED coarse
    // quantizer (sampled Lloyd), residual IVFPQ, 50k clustered corpus.
    // Reports recall AND the cost that actually scales — mean probed-
    // cell candidate volume per query — plus the untrained-prefix
    // baseline at each nCells (what r6 shipped). The committed table
    // lives in SURVEY §5.
    if (maxRows >= 50000L) {
      val n = 50000L
      val emb = syntheticEmbeddings(spark, n).localCheckpoint(true)
      val exact = Similarity.bruteForceTopK(emb, 8, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(got: Array[org.apache.spark.sql.Row]): Double = {
        val s = got.map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact intersect s).size.toDouble / exact.size
      }
      import org.apache.spark.sql.functions.{col, count, lit}
      for (nc <- Seq(16, 64, 256)) {
        val (trained, trainSec) = time(
          Similarity.trainCoarseQuantizer(emb, nc, iters = 2, sampleFraction = 0.05))
        val prefix = Similarity.trainCoarseQuantizer(emb, nc, iters = 0,
          sampleFraction = 0.05, seedByHash = false)
        for ((nm, coarse) <- Seq(("trained", trained), ("prefix0", prefix))) {
          import spark.implicits._
          val pops = Similarity.ivfCells(emb, "vec_id", "embedding",
              coarse.toDF("cell", "cell_emb"), probes = 1)
            .groupBy("cell").agg(count(lit(1)).as("c"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val books = Similarity.pqTrainResidual(emb, nc, m, ksub, iters = 3,
            sampleFraction = 0.05, coarse = Some(coarse))
          for (probes <- Seq(4, 8, 16).filter(_ <= nc)) {
            val (rows, qSec) = time(Similarity.annTopKIvfPqResidual(emb, 8, 10,
              nCells = nc, probes = probes, m = m, ksub = ksub,
              shortlistFactor = slf, index = Some(books),
              coarse = Some(coarse)).collect())
            // candidate volume = probed cells' population, the IVF cost
            // model; recompute the per-query probe set the operator uses
            val qEmbs = emb.filter(col("vec_id") < 8)
              .select(col("vec_id"), col("embedding"))
              .as[(Long, Seq[Float])].collect()
            val sorted = coarse.sortBy(_._1)
            val meanCand = qEmbs.map { case (_, q) =>
              sorted.map { case (cell, ce) =>
                val dot = q.zip(ce).map { case (x, y) => x.toDouble * y.toDouble }.sum
                val nq = math.sqrt(q.map(x => x.toDouble * x).sum)
                val nc2 = math.sqrt(ce.map(x => x.toDouble * x).sum)
                (-dot / math.max(nq * nc2, 1e-12), cell)
              }.sorted.take(probes).map { case (_, c) => pops.getOrElse(c, 0L) }.sum
            }.sum / qEmbs.length
            println(f"[sweep] n=$n nCells=$nc%3d probes=$probes%2d $nm%8s | " +
              f"recall ${recall(rows)}%.3f | mean-cand $meanCand%6d " +
              f"(${100.0 * meanCand / n}%4.1f%% of corpus) | query $qSec%5.1f s" +
              (if (nm == "trained") f" | train $trainSec%4.1f s" else ""))
          }
        }
      }
    }
    spark.stop()
  }
}
