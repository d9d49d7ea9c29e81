package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.VectorStreams

/** Round-8 gate: the streaming IVF maintenance face. The maintained
  * cell table under a fixed trained quantizer must be
  * indistinguishable from batch assignment — same cells, same search
  * results — because cell identity is a pure function of (vector,
  * quantizer); and the refresh path must actually repair the
  * straggler ratio when the corpus drifts.
  */
class VectorStreamsSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  private val sf = SharedSpark.sf
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("streamed ingest + maintained-table search == batch annTopKIvf under the shared quantizer") {
    val emb = Tables.embeddings(spark, sf)
    val coarse = Similarity.trainCoarseQuantizer(emb,
      Similarity.sizeCells(emb.count()), iters = 2)
    val got = asSet(VectorStreams.streamedAnnIvf(spark, sf, coarse))
    val want = asSet(Similarity.annTopKIvf(emb, 8, 10, probes = 13,
      coarse = Some(coarse)))
    assert(got == want,
      s"maintained-table search drifted: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "parity is vacuous on an empty result")
  }

  test("streamedSemanticDedup == batch semanticDedup; cross-batch duplicates surface; replay/retry no-ops") {
    def asVerdicts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val emb = Tables.embeddings(spark, sf)
    val coarse = Similarity.trainCoarseQuantizer(emb, 16)
    val streamed = asVerdicts(VectorStreams.streamedSemanticDedup(spark, sf, coarse))
    val batch = asVerdicts(Similarity.semanticDedup(emb, tau = 0.8,
      coarse = Some(coarse)))
    assert(streamed == batch && streamed.nonEmpty)
    // hand-driven: a duplicate pair SPLIT across batches must be
    // found in the later member's batch, and the paper's keep policy
    // (lowest centroid cos survives) must hold through the store —
    // here the LATER arrival is the survivor, so the earlier
    // arrival's verdict flips at resolve with no state rewrite
    val cents = Seq((0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)))
    val state = java.nio.file.Files.createTempDirectory("graft-sem-replay-").toString + "/state"
    val b0 = Seq((10L, Seq(1.0f, 0.01f, 0f))).toDF("vec_id", "embedding")
    val b1 = Seq((2L, Seq(1.0f, 0.02f, 0.03f)), // dup of 10, lower ccos -> survives
      (3L, Seq(0f, 1f, 0f))).toDF("vec_id", "embedding")
    VectorStreams.semanticIngestBatch(b0, 0L, state, cents, 0.95, 4)
    val after0 = asVerdicts(VectorStreams.semanticResolve(spark, state))
    assert(after0.keySet == Set(10L) && after0(10L)._3, "first arrival starts kept")
    VectorStreams.semanticIngestBatch(b1, 1L, state, cents, 0.95, 4)
    val after1 = asVerdicts(VectorStreams.semanticResolve(spark, state))
    assert(after1(2L)._3 && !after1(10L)._3 && after1(3L)._3,
      s"late lower-ccos arrival must demote the earlier survivor: $after1")
    // full replay: marker short-circuits
    VectorStreams.semanticIngestBatch(b1, 1L, state, cents, 0.95, 4)
    assert(asVerdicts(VectorStreams.semanticResolve(spark, state)) == after1)
    // crash-window retry: overwrite dirs must not duplicate members/pairs
    val marker = new org.apache.hadoop.fs.Path(s"$state/_sem_commits/1")
    val mfs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(mfs.delete(marker, false))
    VectorStreams.semanticIngestBatch(b1, 1L, state, cents, 0.95, 4)
    assert(asVerdicts(VectorStreams.semanticResolve(spark, state)) == after1,
      "crash-window retry drifted the maintained verdicts")
    // pair-log compaction: a third duplicate in the same cluster
    // logs pairs against BOTH existing members (two witnesses for
    // one verdict); compaction keeps one minimal witness per victim,
    // resolve stays bit-identical, and the log is bounded by members
    val b2 = Seq((20L, Seq(1.0f, 0.015f, 0.01f))).toDF("vec_id", "embedding")
    VectorStreams.semanticIngestBatch(b2, 2L, state, cents, 0.95, 4)
    val full = asVerdicts(VectorStreams.semanticResolve(spark, state))
    val (mBefore, pBefore) = VectorStreams.semanticPairStats(spark, state)
    assert(pBefore >= 3, s"fixture must have redundant witnesses: $pBefore pairs")
    VectorStreams.semanticPairCompact(spark, state)
    val (mAfter, pAfter) = VectorStreams.semanticPairStats(spark, state)
    assert(mAfter == mBefore && pAfter <= mAfter && pAfter < pBefore,
      s"compaction must shrink the log: $pBefore -> $pAfter over $mAfter members")
    assert(asVerdicts(VectorStreams.semanticResolve(spark, state)) == full,
      "compaction changed the resolved verdicts")
    // a post-compaction arrival pairing with a compacted-away
    // witness's victim still resolves correctly
    val b3 = Seq((30L, Seq(1.0f, 0.017f, 0.02f))).toDF("vec_id", "embedding")
    VectorStreams.semanticIngestBatch(b3, 3L, state, cents, 0.95, 4)
    val after3 = asVerdicts(VectorStreams.semanticResolve(spark, state))
    assert(!after3(30L)._3, "new arrival above existing minima must be dropped")
    assert(after3.removed(30L) == full,
      "post-compaction ingest disturbed existing verdicts")
    // empty store resolves empty
    val emptyState = java.nio.file.Files.createTempDirectory("graft-sem-empty-").toString + "/state"
    assert(VectorStreams.semanticResolve(spark, emptyState).count() == 0)
  }

  test("replayed ingest batch is a no-op; the cell table is partitioned by cell bucket") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val coarse = Similarity.trainCoarseQuantizer(emb, 16, iters = 2)
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-replay-").toString
    val st = s"$base/state"
    VectorStreams.ivfIngestBatch(emb.filter(col("vec_id") % 2 === 0), 0L, st, coarse, 16)
    VectorStreams.ivfIngestBatch(emb.filter(col("vec_id") % 2 =!= 0), 1L, st, coarse, 16)
    val n = spark.read.parquet(s"$st/cells").count()
    assert(n == emb.count(), "every ingested vector must be in the table once")
    VectorStreams.ivfIngestBatch(emb.filter(col("vec_id") % 2 =!= 0), 1L, st, coarse, 16)
    assert(spark.read.parquet(s"$st/cells").count() == n,
      "replayed batch must not re-append")
    // the partition layout IS the probe-pruning contract
    val parts = new java.io.File(s"$st/cells").listFiles()
      .map(_.getName).filter(_.startsWith("cb="))
    assert(parts.nonEmpty, "cell table must be partitioned by cb")
    // maintained assignment == batch assignment, cell for cell
    val maintained = spark.read.parquet(s"$st/cells")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Similarity.cellAssign(emb, "vec_id", "embedding", coarse, 1)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained == batch, "ingest-time cells must equal batch assignment")
  }

  test("maintained residual-IVFPQ: streamed (cell, codes) table + ADC search == batch annTopKIvfPqResidual") {
    val emb = Tables.embeddings(spark, sf)
    val coarse = Similarity.trainCoarseQuantizer(emb, 16, iters = 2)
    val books = Similarity.pqTrainResidual(emb, nCells = 16, m = 16, ksub = 16,
      iters = 3, coarse = Some(coarse))
    val got = asSet(graft.streaming.VectorStreams.streamedAnnIvfPq(spark, sf,
      coarse, books))
    val want = asSet(Similarity.annTopKIvfPqResidual(emb, 8, 10, probes = 13,
      shortlistFactor = 8, index = Some(books), coarse = Some(coarse)))
    assert(got == want,
      s"maintained ADC search drifted: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "parity is vacuous on an empty result")
  }

  test("drift: a clustered burst spikes the straggler ratio; retrain + ivfCompact repairs it and search re-aligns") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val nc = 16
    val coarse = Similarity.trainCoarseQuantizer(emb, nc, iters = 2)
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-drift-").toString
    val st = s"$base/state"
    VectorStreams.ivfIngestBatch(emb, 0L, st, coarse, 16)
    val (_, _, ratio0) = VectorStreams.cellStats(spark, st, nc)
    // a new source: 500 vectors in one drifted REGION the old
    // quantizer never saw — dominated by a direction (j=0) none of
    // the old cells own, with enough internal spread (0.3 noise,
    // cosine ~0.9 between members) that a retrained quantizer CAN
    // partition it — a point-mass burst is unsplittable by any
    // quantizer and only measures tie-breaking
    val dim = 64
    val burst = spark.range(10000L, 10500L).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j -> CAST(
        CASE WHEN j = 0 THEN 1.0 ELSE
          0.3 * (pmod(xxhash64(concat('b:', CAST(id AS STRING), ':', CAST(j AS STRING))), 2000) - 1000) / 1000.0
        END AS FLOAT))""").as("embedding"))
    VectorStreams.ivfIngestBatch(burst, 1L, st, coarse, 16)
    val (_, _, ratioDrift) = VectorStreams.cellStats(spark, st, nc)
    assert(ratioDrift > 2 * ratio0,
      s"the burst must spike the straggler ratio: $ratio0 -> $ratioDrift")
    // refresh: retrain on the MAINTAINED corpus, re-map in one pass
    val maintained = spark.read.parquet(s"$st/cells")
      .select(col("vec_id"), col("embedding"))
    val fresh = Similarity.trainCoarseQuantizer(maintained, nc, iters = 4)
    VectorStreams.ivfCompact(spark, st, fresh, 16)
    val (_, _, ratioFixed) = VectorStreams.cellStats(spark, st, nc)
    assert(ratioFixed < 0.6 * ratioDrift && ratioFixed < 2 * ratio0,
      s"compaction must repair the balance toward the healthy baseline " +
        s"($ratio0): $ratioDrift -> $ratioFixed")
    // search against the compacted table == batch search over the
    // union under the NEW quantizer
    val union = emb.unionByName(burst)
    val queries = union.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val got = asSet(VectorStreams.ivfSearchMaintained(spark, st, fresh, queries,
      k = 10, probes = 13))
    val want = asSet(Similarity.annTopKIvf(union, 8, 10, probes = 13,
      coarse = Some(fresh)))
    assert(got == want, "post-compaction search drifted from batch")
  }

  private def burstFrame(n: Int = 500, dim: Int = 64, noise: Double = 0.3,
                         sign: Double = 1.0) =
    spark.range(10000L, 10000L + n).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j -> CAST(
        CASE WHEN j = 0 THEN $sign ELSE
          $noise * (pmod(xxhash64(concat('b:', CAST(id AS STRING), ':', CAST(j AS STRING))), 2000) - 1000) / 1000.0
        END AS FLOAT))""").as("embedding"))

  private def fileDigests(dir: String): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        f.getPath -> md.map("%02x".format(_)).mkString
      }.toMap
  }

  test("incremental compaction: only changed-row partitions rewrite, untouched files survive byte-identical, full-compaction parity holds") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val nc = 16
    val nBuckets = 16
    val coarse = Similarity.trainCoarseQuantizer(emb, nc, iters = 2)
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-inc-").toString
    val st = s"$base/state"
    VectorStreams.ivfIngestBatch(emb, 0L, st, coarse, nBuckets)
    // TIGHT burst (0.05 noise) pointed AWAY from the corpus mass
    // (−e0): concentrates in one old cell and its splits attract few
    // outside rows — the localized-drift shape incremental refresh
    // exists for
    val burst = burstFrame(noise = 0.05, sign = -1.0)
    VectorStreams.ivfIngestBatch(burst, 1L, st, coarse, nBuckets)
    val drifted = VectorStreams.driftedCells(spark, st, nc)
    assert(drifted.nonEmpty, "the burst must trip the drift alarm")
    val (_, _, ratioDrift) = VectorStreams.cellStats(spark, st, nc)
    // local retrain: split centroids come from the drifted cells' own
    // members; the rest of the quantizer is passed through untouched
    val newCoarse = VectorStreams.splitDriftedCells(spark, st, coarse, drifted,
      splitInto = 4, nBuckets = nBuckets)
    assert(newCoarse.count { case (c, _) => !coarse.exists(_._1 == c) } ==
      4 * drifted.size, "each drifted cell splits into 4 fresh ids")
    val before = fileDigests(s"$st/cells")
    val rewritten = VectorStreams.ivfCompactIncremental(spark, st, newCoarse, nBuckets)
    val after = fileDigests(s"$st/cells")
    assert(rewritten.nonEmpty && rewritten.size < nBuckets,
      s"a localized burst must rewrite some but not all partitions: $rewritten")
    // files OUTSIDE the rewritten partitions survive byte-identical
    val overwritten = rewritten.map(p => s"cb=$p/").toSet
    val untouchedBefore = before.filterNot { case (p, _) => overwritten.exists(p.contains) }
    untouchedBefore.foreach { case (path, digest) =>
      assert(after.get(path).contains(digest),
        s"untouched file rewritten or deleted by incremental compaction: $path")
    }
    assert(untouchedBefore.nonEmpty, "the claim is vacuous without untouched partitions")
    // the surgically-updated table is row-identical to FULL fresh
    // assignment under the split quantizer — no approximation
    val union = emb.unionByName(burst)
    val maintained = spark.read.parquet(s"$st/cells")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Similarity.cellAssign(union, "vec_id", "embedding", newCoarse, 1)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained == full,
      "partial re-map must agree with full assignment under the split quantizer")
    // the alarm condition is repaired and search parity holds
    val (_, _, ratioFixed) = VectorStreams.cellStats(spark, st, newCoarse.size)
    assert(ratioFixed < ratioDrift,
      s"splitting the hot cells must improve balance: $ratioDrift -> $ratioFixed")
    val queries = union.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val got = asSet(VectorStreams.ivfSearchMaintained(spark, st, newCoarse, queries,
      k = 10, probes = 13))
    val want = asSet(Similarity.annTopKIvf(union, 8, 10, probes = 13,
      coarse = Some(newCoarse)))
    assert(got == want, "post-incremental-compaction search drifted from batch")
    // a second incremental pass under the same quantizer is a no-op
    assert(VectorStreams.ivfCompactIncremental(spark, st, newCoarse, nBuckets).isEmpty,
      "an already-compacted table must not rewrite anything")
  }

  test("full compaction with retrainBooks: codes re-encode against the NEW quantizer+books; ADC search == batch under them") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val coarse = Similarity.trainCoarseQuantizer(emb, 16, iters = 2)
    val books = Similarity.pqTrainResidual(emb, nCells = 16, m = 16, ksub = 16,
      iters = 3, coarse = Some(coarse))
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-rebook-").toString
    val st = s"$base/state"
    VectorStreams.ivfIngestBatch(emb, 0L, st, coarse, 16, Some(books))
    val burst = burstFrame()
    VectorStreams.ivfIngestBatch(burst, 1L, st, coarse, 16, Some(books))
    val union = emb.unionByName(burst)
    // drift alarm → FULL refresh: new quantizer from the maintained
    // corpus, residual books retrained against it in the same pass
    val maintained = spark.read.parquet(s"$st/cells")
      .select(col("vec_id"), col("embedding"))
    val fresh = Similarity.trainCoarseQuantizer(maintained, 16, iters = 4)
    val newBooks = VectorStreams.ivfCompact(spark, st, fresh, 16,
      retrainBooks = Some((16, 16, 3)))
      .getOrElse(fail("retrainBooks must return the new codebooks"))
    val got = asSet(VectorStreams.ivfSearchMaintainedPq(spark, st, fresh, newBooks,
      numQueries = 8, k = 10, probes = 13, shortlistFactor = 8))
    val want = asSet(Similarity.annTopKIvfPqResidual(union, 8, 10, probes = 13,
      shortlistFactor = 8, index = Some(newBooks), coarse = Some(fresh)))
    assert(got == want,
      s"post-refresh ADC search must equal batch under the NEW quantizer+books: " +
        s"extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "parity is vacuous on an empty result")
  }
}
