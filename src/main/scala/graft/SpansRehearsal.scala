package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale rehearsal for span-level substring dedup: measures wall time
  * on synthetic corpora whose DUPLICATED FRACTION is the controlled
  * variable — including the pathological all-boilerplate corpus where
  * every document carries the same footer. The table this prints is
  * committed in SURVEY §5.
  *
  * The claim under test: span dedup is linear in corpus size at ANY
  * duplication rate, because a window repeated R times costs R rows
  * (count ≥ 2 → semi join back), never R² pairs. At 200k copies of
  * one footer, a pair-based formulation (the ngramJaccard shape)
  * would expand ~2×10¹⁰ candidate pairs from the footer shingles
  * alone — dead — while the span pipeline's duplicated-position table
  * grows by 13 window positions per flagged doc, flat in R.
  *
  * Each flagged doc's footer occupies token positions 41..60, so its
  * maximal span is exactly (41, 60, 20 tokens) — asserted per run,
  * which also pins that windows STRADDLING the unique-prefix/footer
  * boundary never flag (they contain per-doc-unique tokens).
  *
  * Usage: runMain graft.SpansRehearsal [nDocs]
  */
object SpansRehearsal {

  /** `n` docs of 60 tokens each: a 40-token per-doc-unique prefix,
    * then either the shared 20-token footer (content-hash-selected
    * `dupPermille` of docs) or 20 more unique tokens — doc length is
    * constant so wall differences isolate the duplication rate.
    */
  def corpus(spark: SparkSession, n: Long, dupPermille: Int): DataFrame = {
    val uniq = (base: Int, k: Int) => expr(
      s"concat_ws(' ', transform(sequence(1, $k), " +
        s"i -> concat('w', CAST(doc_id AS STRING), 'q', CAST(i + $base AS STRING))))")
    val footer = (0 until 20).map(i => s"footer$i").mkString(" ")
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), concat_ws(" ",
        uniq(0, 40),
        when(pmod(xxhash64(col("doc_id"), lit(7)), lit(1000)) < dupPermille,
          lit(footer)).otherwise(uniq(40, 20))).as("text"))
  }

  /** Streaming-ingest rehearsal at ≥10⁷ maintained windows: drive
    * [[graft.streaming.IngestStreams.spanDedupBatch]] over `nBatches`
    * arrival waves of the 50%-duplicated corpus, then measure what
    * the always-on deployment prices — per-batch ingest wall, the
    * delta-file growth [[graft.streaming.IngestStreams.spanStateCompact]]
    * exists to bound, compaction wall and its file/row collapse, and
    * the [[graft.streaming.IngestStreams.spanRetroAudit]] full-scan
    * wall. One doc (id 7) is planted as batch 0's ONLY footer
    * carrier, so the retro audit has exactly one true positive: its
    * 13 footer windows became duplicated after it shipped — asserted,
    * along with every later footer doc being flagged AT ingest.
    */
  def streamRehearsal(spark: SparkSession, n: Long, nBatches: Int): Unit = {
    import graft.streaming.{EventStreams, GraphStreams, IngestStreams}
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val perBatch = n / nBatches
    val uniq = (base: Int, k: Int) => expr(
      s"concat_ws(' ', transform(sequence(1, $k), " +
        s"i -> concat('w', CAST(doc_id AS STRING), 'q', CAST(i + $base AS STRING))))")
    val footer = (0 until 20).map(i => s"footer$i").mkString(" ")
    // footer docs: hash-selected ~50% of docs OUTSIDE batch 0, plus
    // the planted singleton doc 7 inside batch 0
    val isFooter = (col("doc_id") === 7L) ||
      (col("doc_id") >= perBatch &&
        pmod(xxhash64(col("doc_id"), lit(7)), lit(1000)) < 500)
    val docs = spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), concat_ws(" ",
        uniq(0, 40),
        when(isFooter, lit(footer)).otherwise(uniq(40, 20))).as("text"))
      .localCheckpoint(true)
    val nWindows = n * 53L
    val state = java.nio.file.Files.createTempDirectory("graft-span-rhsl-").toString + "/state"
    println(s"[spans-stream] n = $n docs x 53 windows = $nWindows windows, $nBatches batches")
    println("| phase | wall s | detail |")
    println("|---|---|---|")
    for (b <- 0 until nBatches) {
      val batch = docs.filter(col("doc_id") >= b * perBatch &&
        (col("doc_id") < (b + 1) * perBatch || lit(b == nBatches - 1)))
      val (_, sec) = time(IngestStreams.spanDedupBatch(batch, b.toLong, state, 8, 16))
      println(f"| ingest batch $b | $sec%.1f | ${perBatch * 53L} windows |")
    }
    val winPath = s"$state/windows"
    def winFiles(): Long = {
      val fs = new org.apache.hadoop.fs.Path(winPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(winPath), true)
      var c = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) c += 1 }
      c
    }
    val rowsBefore = spark.read.parquet(winPath).count()
    val filesBefore = winFiles()
    val (_, compactSec) = time(IngestStreams.spanStateCompact(spark, state))
    val rowsAfter = spark.read.parquet(winPath).count()
    val filesAfter = winFiles()
    println(f"| compaction | $compactSec%.1f | rows $rowsBefore -> $rowsAfter, files $filesBefore -> $filesAfter |")
    val ((retroRows, retroWins), retroSec) = time {
      val r = IngestStreams.spanRetroAudit(spark, docs, state, 8)
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      (r.length.toLong, r.map(_._2).sum)
    }
    println(f"| retro audit | $retroSec%.1f | $retroRows docs, $retroWins windows |")
    // correctness pins: the planted singleton is the ONLY retro doc
    // (13 footer windows shipped before its copies arrived); every
    // later footer doc was flagged at ingest
    assert(retroRows == 1L && retroWins == 13L,
      s"retro audit expected (1 doc, 13 windows), got ($retroRows, $retroWins)")
    val flagged = spark.read.parquet(s"$state/spans")
      .select("doc_id").distinct().count()
    val expectFlagged = docs.filter(isFooter && col("doc_id") =!= 7L).count()
    assert(flagged == expectFlagged,
      s"ingest-flagged docs $flagged != expected $expectFlagged")
    // post-compaction ingest still works and finds new dups (the
    // merge-on-read invariance claim, exercised at scale)
    val extra = spark.range(n, n + 1000L).select(col("id").as("doc_id"),
      concat_ws(" ", uniq(0, 40), lit(footer)).as("text"))
    val (_, postSec) = time(IngestStreams.spanDedupBatch(extra, nBatches.toLong, state, 8, 16))
    val flaggedAfter = spark.read.parquet(s"$state/spans")
      .select("doc_id").distinct().count()
    assert(flaggedAfter == expectFlagged + 1000L,
      s"post-compaction batch flagged ${flaggedAfter - expectFlagged} of 1000")
    println(f"| post-compaction batch | $postSec%.1f | 1000 docs, all flagged |")
    graft.operators.Checkpoints.free(docs)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("stream")) {
      val n = args.drop(1).headOption.map(_.toLong).getOrElse(200000L)
      val nBatches = args.drop(2).headOption.map(_.toInt).getOrElse(4)
      val spark = GraftSession.local()
      streamRehearsal(spark, n, nBatches)
      spark.stop()
      return
    }
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.local()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // untimed warmup (codegen, JIT, page cache)
    Dedup.duplicatedSpans(corpus(spark, 20000L, 100), 8).count()
    println(s"[spans] n = $n docs x 60 tokens")
    println("| dup permille | flagged docs | span rows | wall s |")
    println("|---|---|---|---|")
    for (p <- Seq(100, 500, 1000)) {
      val docs = corpus(spark, n, p).localCheckpoint(true)
      val nFlagged = docs.filter(
        pmod(xxhash64(col("doc_id"), lit(7)), lit(1000)) < p).count()
      val (spans, sec) = time {
        val s = Dedup.duplicatedSpans(docs, 8).localCheckpoint(true)
        s.count()
        s
      }
      val rows = spans.count()
      // every flagged doc yields exactly the footer span; nothing else
      val bad = spans.filter(col("span_start") =!= 41 || col("span_end") =!= 60 ||
        col("span_tokens") =!= 20).count()
      assert(bad == 0, s"unexpected spans at p=$p")
      assert(rows == nFlagged, s"span rows $rows != flagged docs $nFlagged at p=$p")
      println(f"| $p | $nFlagged | $rows | $sec%.1f |")
      graft.operators.Checkpoints.free(spans)
      graft.operators.Checkpoints.free(docs)
    }
    spark.stop()
  }
}
