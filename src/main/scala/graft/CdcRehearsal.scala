package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale rehearsal for content-defined chunking (dedup_cdc_chunks /
  * dedup_cdc / stream_cdc) at ≥10⁷ chunks — the SpansRehearsal
  * pattern. The controlled variable is the duplicated fraction: a
  * hash-selected share of docs carries one SHARED ~512-char block
  * spliced in at a doc-dependent offset (doc_id mod 37 words of
  * unique filler first), so fixed windows would never line up and
  * the collapse is entirely CDC's boundary re-sync doing its job.
  *
  * Claims under test, asserted per run:
  *   - duplicated chunks are EXACTLY the shared block's interior
  *     chunks: every one carries n_copies == the number of planted
  *     carrier docs (boundaries inside the block are a function of
  *     block content only, so every carrier yields identical interior
  *     chunk hashes regardless of splice offset), and nothing else
  *     duplicates (per-doc filler embeds doc_id);
  *   - cost is ONE explode + ONE map-side-combined shuffle on
  *     chunk_md5, linear in corpus characters at any duplication
  *     rate — there is no pair expansion anywhere to go quadratic;
  *   - the streamed chunk store's per-batch delta cost is the
  *     batch's own chunking + one delta write, and the resolve's
  *     min/sum merge over deltas equals batch cdcDedup over the
  *     union exactly.
  *
  * Usage: runMain graft.CdcRehearsal [nDocs]         (batch table)
  *        runMain graft.CdcRehearsal stream [nDocs] [nBatches]
  */
object CdcRehearsal {

  private val BlockWords = 64 // ~512 chars of shared block content

  private def sharedBlock: String =
    (0 until BlockWords).map(i => s"block$i").mkString(" ")

  private def isCarrier(dupPermille: Int) =
    pmod(xxhash64(col("doc_id"), lit(11)), lit(1000)) < dupPermille

  /** `n` docs of ~`lenWords` words: per-doc-unique filler (words
    * embed doc_id, so no cross-doc repeat can exist outside the
    * block), with the shared block spliced after `doc_id mod 37`
    * prefix words for the hash-selected `dupPermille` of docs.
    * Carrier and non-carrier docs have the same length, so wall
    * differences isolate the duplication rate. */
  def corpus(spark: SparkSession, n: Long, dupPermille: Int,
             lenWords: Int = 160): DataFrame = {
    val uniq = (base: String, k: String) => expr(
      s"concat_ws(' ', transform(sequence(1, $k), " +
        s"i -> concat('w', CAST(doc_id AS STRING), 'q', CAST(i + $base AS STRING))))")
    // 1..37 prefix words (never 0: sequence(1, 0) descends in Spark)
    val off = "CAST(1 + pmod(doc_id, 37) AS INT)"
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), when(isCarrier(dupPermille),
          concat_ws(" ",
            uniq("0", off),
            lit(sharedBlock),
            uniq("1000", s"${lenWords - BlockWords} - $off")))
        .otherwise(concat_ws(" ",
          uniq("0", off),
          uniq("2000", s"$lenWords - $off")))
        .as("text"))
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Streamed chunk-store rehearsal: `nBatches` arrival waves over
    * the 50%-carrier corpus, per-batch delta wall, resolve wall, and
    * exact equality of the delta-merged resolve with batch cdcDedup
    * over the union. */
  def streamRehearsal(spark: SparkSession, n: Long, nBatches: Int): Unit = {
    import graft.streaming.{EventStreams, GraphStreams, IngestStreams}
    val docs = corpus(spark, n, 500).localCheckpoint(true)
    val perBatch = n / nBatches
    val state = java.nio.file.Files.createTempDirectory("graft-cdc-rhsl-").toString + "/state"
    println(s"[cdc-stream] n = $n docs, $nBatches batches")
    println("| phase | wall s | detail |")
    println("|---|---|---|")
    for (b <- 0 until nBatches) {
      val batch = docs.filter(col("doc_id") >= b * perBatch &&
        (col("doc_id") < (b + 1) * perBatch || lit(b == nBatches - 1)))
      val (_, sec) = time(IngestStreams.cdcDedupBatch(batch, b.toLong, state))
      println(f"| ingest batch $b | $sec%.1f | ~${perBatch} docs |")
    }
    val (resolved, resolveSec) = time {
      val r = IngestStreams.cdcDedupResolve(spark, state).localCheckpoint(true)
      r.count()
      r
    }
    val twin = Dedup.cdcDedup(docs).localCheckpoint(true)
    val onlyStream = resolved.join(twin,
      Seq("chunk_md5", "keep_doc_id", "n_copies", "chunk_len"), "left_anti").count()
    val onlyBatch = twin.join(resolved,
      Seq("chunk_md5", "keep_doc_id", "n_copies", "chunk_len"), "left_anti").count()
    assert(onlyStream == 0 && onlyBatch == 0,
      s"streamed resolve drifted from batch cdcDedup: +$onlyStream/-$onlyBatch rows")
    println(f"| resolve | $resolveSec%.1f | ${twin.count()} duplicated chunks, == batch twin |")
    // replay idempotence at scale: a re-delivered committed batch is
    // marker-skipped, the resolve is unchanged
    val nBefore = resolved.count()
    val (_, replaySec) = time(IngestStreams.cdcDedupBatch(
      docs.filter(col("doc_id") < perBatch), 0L, state))
    assert(graft.streaming.IngestStreams.cdcDedupResolve(spark, state).count() == nBefore)
    println(f"| replay batch 0 | $replaySec%.1f | marker skip, resolve unchanged |")
    graft.operators.Checkpoints.free(resolved)
    graft.operators.Checkpoints.free(twin)
    graft.operators.Checkpoints.free(docs)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("stream")) {
      val n = args.drop(1).headOption.map(_.toLong).getOrElse(400000L)
      val nBatches = args.drop(2).headOption.map(_.toInt).getOrElse(4)
      val spark = GraftSession.local()
      streamRehearsal(spark, n, nBatches)
      spark.stop()
      return
    }
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    val spark = GraftSession.local()
    // untimed warmup (codegen, JIT)
    Dedup.cdcDedup(corpus(spark, 5000L, 500)).count()
    println(s"[cdc] n = $n docs x ~1400 chars (~${n * 22L} chunks)")
    println("| dup permille | carriers | chunks | dup chunk rows | wall s |")
    println("|---|---|---|---|---|")
    for (p <- Seq(0, 500, 1000)) {
      val docs = corpus(spark, n, p).localCheckpoint(true)
      val nCarriers = docs.filter(isCarrier(p)).count()
      val ((chunks, dups), sec) = time {
        val d = Dedup.cdcDedup(docs).localCheckpoint(true)
        (Dedup.cdcChunks(docs).count(), d)
      }
      val dupRows = dups.count()
      // Sub-25-char chunks CAN duplicate across docs even with
      // doc-unique words (a tiny chunk like "q17 w" carries no
      // doc_id) — real CDC noise, the reason LBFS-family systems
      // impose a minimum chunk size. The STRUCTURAL claims are
      // asserted on chunks long enough to force a complete
      // doc-id-bearing word (>= 25 chars = 2 max-width words - 1):
      // those can only collapse via the planted shared block.
      val longDups = dups.filter(col("chunk_len") >= 25).localCheckpoint(true)
      val longRows = longDups.count()
      if (p == 0) {
        assert(longRows == 0L,
          s"no shared block planted but $longRows long chunks duplicated")
      } else {
        // every long duplicated chunk is a block-interior chunk:
        // exactly nCarriers copies, a handful of distinct hashes
        val offCount = longDups.filter(col("n_copies") =!= nCarriers).count()
        assert(offCount == 0,
          s"$offCount long duplicated chunks with copies != $nCarriers at p=$p")
        assert(longRows >= 1 && longRows <= 16,
          s"expected a handful of block-interior chunks, got $longRows")
      }
      graft.operators.Checkpoints.free(longDups)
      println(f"| $p | $nCarriers | $chunks | $dupRows ($longRows >=25ch) | $sec%.1f |")
      graft.operators.Checkpoints.free(dups)
      graft.operators.Checkpoints.free(docs)
    }
    spark.stop()
  }
}
