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

  def main(args: Array[String]): Unit = {
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
