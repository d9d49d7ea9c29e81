package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the prefix-doubling duplication profile
  * (dedup_suffix_profile) at ≥10⁷ character positions — the
  * CdcRehearsal pattern. The controlled variable is again the
  * duplicated fraction: a hash-selected share of docs carries one
  * SHARED ~500-char block spliced after a doc-dependent number of
  * per-doc-unique filler words, so every window fully inside the
  * block duplicates across all carriers while every window fully in
  * filler embeds a complete `w{doc_id}q{i}` word (window length ≥
  * 2·maxWordLen + 1) and cannot repeat anywhere.
  *
  * The profile is checked EXACTLY against a driver-side local
  * oracle over just the carriers' block-overlapping regions, which
  * is sound because every globally-duplicated window must overlap
  * the block: filler-only windows are position-unique by the
  * full-word argument, and no content can have one occurrence
  * overlapping the block and another in pure filler — block windows
  * contain at least one of the letters b/l/o/c/k, which the filler
  * alphabet `[wq0-9 ]` never produces. So enumerating each
  * carrier's `block ± (L−1)` region reproduces every duplicated
  * content with its exact global multiplicity — including the
  * boundary-straddling windows that share flank-digit prefixes
  * across carriers (the space + digit-tree effect that makes any
  * closed-form envelope wrong). n_windows is re-derived from doc
  * lengths independently. Wall time is printed for the §5 table.
  *
  * Usage: runMain graft.SuffixRehearsal [nDocs] [dupPermille]
  */
object SuffixRehearsal {

  private val BlockWords = 64

  private def sharedBlock: String =
    (0 until BlockWords).map(i => s"block$i").mkString(" ")

  /** `n` docs of ~`lenWords` words of per-doc-unique filler (words
    * embed doc_id and index, so no cross-doc or in-doc repeat exists
    * outside the block), with the shared block spliced after
    * `1 + doc_id mod 37` prefix words for the hash-selected share. */
  def corpus(spark: SparkSession, n: Long, dupPermille: Int,
             lenWords: Int = 96): DataFrame = {
    val uniq = (base: String, k: String) => expr(
      s"concat_ws(' ', transform(sequence(1, $k), " +
        s"i -> concat('w', CAST(doc_id AS STRING), 'q', CAST(i + $base AS STRING))))")
    val off = "CAST(1 + pmod(doc_id, 37) AS INT)"
    val isCarrier = pmod(xxhash64(col("doc_id"), lit(13)), lit(1000)) < dupPermille
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), when(isCarrier,
          concat_ws(" ",
            uniq("0", off),
            lit(sharedBlock),
            uniq("100", s"$lenWords - $off")))
        .otherwise(uniq("200", s"$lenWords"))
        .as("text"))
  }

  /** Exact local profile of the block-overlapping windows: every
    * length-L window starting in `[blockStart−L+1, blockEnd−1]` of
    * every carrier, counted by content. Returns
    * (dup_positions, dup_windows, docs_touched) per length. */
  private def localOracle(carrierTexts: Array[String], block: String,
                          lengths: Seq[Int]): Map[Int, (Long, Long, Long)] =
    lengths.map { l =>
      val counts = new scala.collection.mutable.HashMap[String, Long]
      val docsOf = new scala.collection.mutable.HashMap[String, scala.collection.mutable.Set[Int]]
      carrierTexts.zipWithIndex.foreach { case (t, d) =>
        val bs = t.indexOf(block)
        require(bs >= 0, "carrier without block")
        val lo = math.max(0, bs - l + 1)
        val hi = math.min(t.length - l, bs + block.length - 1)
        (lo to hi).foreach { p =>
          val w = t.substring(p, p + l)
          counts.update(w, counts.getOrElse(w, 0L) + 1L)
          docsOf.getOrElseUpdate(w, scala.collection.mutable.Set.empty) += d
        }
      }
      val dup = counts.filter(_._2 > 1L)
      val dupPos = dup.valuesIterator.sum
      val docs = dup.keysIterator.flatMap(docsOf(_)).toSet.size.toLong
      l -> ((dupPos, dup.size.toLong, docs))
    }.toMap

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val dupPermille = if (args.length > 1) args(1).toInt else 200
    val spark = GraftSession.local()
    try {
      val docs = corpus(spark, n, dupPermille).localCheckpoint(true)
      val carrierTexts = docs.filter(col("text").contains(sharedBlock))
        .select(col("text")).collect().map(_.getString(0))
      val carriers = carrierTexts.length.toLong
      val totalChars = docs.agg(sum(length(col("text")))).head().getLong(0)
      val blockChars = sharedBlock.length
      println(s"[rehearsal] suffix corpus: $n docs, $totalChars chars, " +
        s"$carriers carriers, block $blockChars chars")
      val lengths = Seq(32, 64, 128)
      val t0 = System.nanoTime()
      val profile = graft.operators.Suffix.dupMassProfile(docs, lengths)
        .collect().map(r => r.getLong(0).toInt ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      val expected = localOracle(carrierTexts, sharedBlock, lengths)
      val expWindowCols = lengths.map(l =>
        sum(greatest(length(col("text")).cast("long") - lit(l.toLong) + 1L, lit(0L)))
          .as(s"w$l"))
      val expWindows = docs.agg(expWindowCols.head, expWindowCols.tail: _*).head()
      lengths.zipWithIndex.foreach { case (l, i) =>
        val (nw, dupPos, dupWin, nDocs) = profile(l)
        val (expPos, expWin, expDocs) = expected(l)
        println(f"[rehearsal] L=$l%-4d n_windows=$nw%,d dup_pos=$dupPos%,d " +
          f"dup_win=$dupWin%,d docs=$nDocs%,d frontier=${dupPos * 100.0 / nw}%.2f%%")
        require(nw == expWindows.getLong(i), s"L=$l: n_windows $nw != ${expWindows.getLong(i)}")
        require(dupPos == expPos, s"L=$l: dup positions $dupPos != local-oracle $expPos")
        require(dupWin == expWin, s"L=$l: dup contents $dupWin != local-oracle $expWin")
        require(nDocs == expDocs && nDocs == carriers,
          s"L=$l: docs touched $nDocs != local-oracle $expDocs (carriers $carriers)")
      }
      println(f"[rehearsal] suffix profile over $totalChars%,d chars: $wall%.1f s — exact match with the local block-region oracle at every length")
      // STREAMED leg: the same corpus through the maintained window
      // store in 4 shards (suffixBatch driven directly — the
      // IndexRehearsal convention), LSM fold halfway and at the end,
      // resolve from state with NO corpus re-scan. The resolve must
      // reproduce the (already locally-oracled) batch profile bit for
      // bit; wall splits price ingest vs fold vs resolve for §5.
      // minLen must be the smallest probed length (32 here).
      val state = java.nio.file.Files.createTempDirectory("graft-sfx-reh-")
        .toString + "/state"
      val tIng0 = System.nanoTime()
      (0 until 4).foreach { i =>
        graft.streaming.IngestStreams.suffixBatch(
          docs.filter(pmod(col("doc_id"), lit(4L)) === i), i.toLong, state,
          minLen = lengths.min)
        if (i == 1) graft.streaming.IngestStreams.suffixCompact(spark, state)
      }
      val tIng = (System.nanoTime() - tIng0) / 1e9
      val tC0 = System.nanoTime()
      graft.streaming.IngestStreams.suffixCompact(spark, state)
      val tCompact = (System.nanoTime() - tC0) / 1e9
      val tR0 = System.nanoTime()
      val resolved = graft.streaming.IngestStreams
        .suffixProfileResolve(spark, state, lengths, minLen = lengths.min)
        .collect().map(r => r.getLong(0).toInt ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val tResolve = (System.nanoTime() - tR0) / 1e9
      lengths.foreach { l =>
        require(resolved(l) == profile(l),
          s"L=$l: streamed resolve ${resolved(l)} != batch profile ${profile(l)}")
      }
      println(f"[rehearsal] streamed face: ingest(4 shards) $tIng%.1f s, " +
        f"final fold $tCompact%.1f s, resolve $tResolve%.1f s — " +
        f"resolve == batch profile at every length")
    } finally spark.stop()
  }
}
