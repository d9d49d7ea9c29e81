package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for C4-style line dedup (dedup_lines /
  * stream_line_dedup) at ≥10⁷ segments — the CdcRehearsal pattern.
  * A hash-selected share of docs carries one shared BLOCK of
  * `BlockSegs` segment-ALIGNED boilerplate segments (inserted after
  * a doc-dependent multiple-of-`SegWords` prefix, so the block's
  * segments are bit-identical across carriers); all filler words
  * embed the doc_id, so a non-block segment contains only
  * per-doc-unique words and can never repeat anywhere — even inside
  * its own doc, since filler indices never repeat.
  *
  * That makes the EXACT survivor table computable in closed form:
  * precisely the `BlockSegs` block segments are duplicated, each
  * with n_copies == the carrier count and the keeper being the
  * minimum carrier doc_id at its own block offset. The rehearsal
  * asserts the survivor table equals that closed form row for row,
  * that per-doc reassembly stats conserve (first-by-doc-order
  * carrier keeps everything, every other carrier loses exactly
  * BlockSegs segments, non-carriers lose nothing), and — in stream
  * mode — that the per-batch delta store resolves to the identical
  * survivor table with per-batch cost bounded by the batch's own
  * segment aggregate. Wall times are printed for the §5 table.
  *
  * Usage: runMain graft.LinesRehearsal [nDocs] [dupPermille]
  *        runMain graft.LinesRehearsal stream [nDocs] [waves]
  */
object LinesRehearsal {

  private val SegWords = 8
  private val BlockSegs = 8 // shared block = 64 words = 8 aligned segments

  private def blockWords: Seq[String] =
    (0 until BlockSegs * SegWords).map(i => s"block$i")

  /** `n` docs of `lenWords` words: unique filler, with the shared
    * 64-word block spliced at word offset 8·(doc_id mod 5) for the
    * hash-selected carrier share. lenWords is a multiple of 8 so
    * every doc has exactly lenWords/8 full segments. */
  def corpus(spark: SparkSession, n: Long, dupPermille: Int,
             lenWords: Int = 400): DataFrame = {
    require(lenWords % SegWords == 0)
    val uniq = (base: String, k: String) => expr(
      s"concat_ws(' ', transform(sequence(1, $k), " +
        s"i -> concat('w', CAST(doc_id AS STRING), 'q', CAST(i + $base AS STRING))))")
    // 1 + mod keeps the prefix non-empty: sequence(1, 0) DESCENDS in
    // Spark, so a zero-word prefix would emit two stray words
    val off = s"CAST($SegWords * (1 + pmod(doc_id, 5)) AS INT)"
    val isCarrier = pmod(xxhash64(col("doc_id"), lit(17)), lit(1000)) < dupPermille
    val block = blockWords.mkString(" ")
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), when(isCarrier,
          concat_ws(" ",
            uniq("0", off),
            lit(block),
            uniq("1000", s"$lenWords - ${BlockSegs * SegWords} - $off")))
        .otherwise(uniq("2000", s"$lenWords"))
        .as("text"))
  }

  private def md5Local(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val stream = args.headOption.contains("stream")
    val rest = if (stream) args.drop(1) else args
    val n = if (rest.nonEmpty) rest(0).toLong else 200000L
    val spark = GraftSession.local()
    try {
      if (stream) runStream(spark, n, if (rest.length > 1) rest(1).toInt else 4)
      else runBatch(spark, n, if (rest.length > 1) rest(1).toInt else 200)
    } finally spark.stop()
  }

  /** Closed-form expected survivor table: block segment j's content,
    * its keeper (min carrier, prefix(doc)/8 + j) and the carrier
    * count. */
  private def expectedSurvivors(carrierIds: Array[Long]): Map[String, (Long, Long, Long)] = {
    val keeper = carrierIds.min
    val keepOff = 1 + keeper % 5 // prefix segments of the keeper
    (0 until BlockSegs).map { j =>
      val seg = blockWords.slice(j * SegWords, (j + 1) * SegWords).mkString(" ")
      md5Local(seg) -> ((keeper, keepOff + j, carrierIds.length.toLong))
    }.toMap
  }

  private def runBatch(spark: SparkSession, n: Long, dupPermille: Int): Unit = {
    val docs = corpus(spark, n, dupPermille).localCheckpoint(true)
    val carriers = docs.filter(col("text").contains("block0 "))
      .select(col("doc_id")).collect().map(_.getLong(0))
    val totalSegs = n * (400 / SegWords)
    println(s"[rehearsal] lines corpus: $n docs, $totalSegs segments, " +
      s"${carriers.length} carriers, block $BlockSegs segments")
    val t0 = System.nanoTime()
    val surv = graft.operators.Dedup.lineSurvivors(docs, SegWords).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val tSurv = (System.nanoTime() - t0) / 1e9
    val expect = expectedSurvivors(carriers)
    require(surv == expect,
      s"survivor table mismatch: ${surv.size} rows vs ${expect.size} expected; " +
        s"sample diff ${(surv.keySet ++ expect.keySet).filter(k => surv.get(k) != expect.get(k)).take(3)}")
    val t1 = System.nanoTime()
    val stats = graft.operators.Dedup.lineDedup(docs, SegWords)
      .agg(sum(col("n_segs")), sum(col("n_kept")),
        count(when(col("n_kept") < col("n_segs"), lit(1)))).head()
    val tApply = (System.nanoTime() - t1) / 1e9
    val lostDocs = stats.getLong(2)
    require(stats.getLong(0) == totalSegs, s"segment total ${stats.getLong(0)} != $totalSegs")
    val expectedLost = math.max(carriers.length - 1, 0)
    require(lostDocs == expectedLost,
      s"docs losing segments: $lostDocs != carriers-1 $expectedLost")
    require(stats.getLong(0) - stats.getLong(1) == expectedLost.toLong * BlockSegs,
      s"cut segments ${stats.getLong(0) - stats.getLong(1)} != (carriers-1)*$BlockSegs")
    println(f"[rehearsal] lines: survivors $tSurv%.1f s, apply+reassemble $tApply%.1f s " +
      f"over $totalSegs%,d segments — survivor table == closed form (${expect.size} rows), " +
      f"cut mass == (carriers−1)×$BlockSegs exactly")
    graft.operators.Checkpoints.free(docs)
  }

  private def runStream(spark: SparkSession, n: Long, waves: Int): Unit = {
    import graft.streaming.IngestStreams
    val docs = corpus(spark, n, 200).localCheckpoint(true)
    val carriers = docs.filter(col("text").contains("block0 "))
      .select(col("doc_id")).collect().map(_.getLong(0))
    val state = java.nio.file.Files.createTempDirectory("graft-lines-reh-").toString + "/state"
    (0 until waves).foreach { w =>
      val t0 = System.nanoTime()
      IngestStreams.lineDedupBatch(
        docs.filter(pmod(col("doc_id"), lit(waves.toLong)) === w.toLong), w.toLong,
        state, SegWords)
      println(f"[rehearsal] lines wave $w: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val t1 = System.nanoTime()
    val resolved = IngestStreams.lineDedupResolve(spark, state).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val tRes = (System.nanoTime() - t1) / 1e9
    require(resolved == expectedSurvivors(carriers),
      s"streamed resolve drifted from the closed form (${resolved.size} rows)")
    val t2 = System.nanoTime()
    IngestStreams.lineDedupBatch(
      docs.filter(pmod(col("doc_id"), lit(waves.toLong)) === 0L), 0L, state, SegWords)
    println(f"[rehearsal] lines stream: resolve $tRes%.1f s == closed form; " +
      f"replayed wave 0 a ${(System.nanoTime() - t2) / 1e9}%.1f s marker skip")
    graft.operators.Checkpoints.free(docs)
  }
}
