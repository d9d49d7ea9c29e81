package graft

import org.apache.spark.sql.functions._

/** Scale rehearsal for the streamed contamination audit
  * (stream_contamination) at 10⁵ docs / ~4.6M stored shingle rows —
  * the SccRehearsal pattern: drive the REAL state machine
  * ([[graft.streaming.IngestStreams.contaminationBatch]]) through
  * hand batches in the worst retro shape (the entire eval set lands
  * in the FINAL batch, after every train doc is already ingested),
  * then measure the two things the design claims:
  *
  *  1. EXACTNESS at scale: the resolved audit equals the batch
  *     operator on the union corpus row-for-row (the exact-once hit
  *     algebra under maximal retro-attribution);
  *  2. the PRUNED-READ bound: the retro term scans only the new
  *     eval shingles' buckets — measured as touched-bucket rows /
  *     total stored rows at the rehearsal's bucket count (the knob a
  *     deployment sizes so |eval-delta buckets| ≪ nBuckets).
  *
  * Corpus: train docs are 50-word windows over a rolling synthetic
  * vocabulary (adjacent docs share no 5-gram by construction); every
  * 97th train doc gets an eval doc's middle 5-gram planted into it,
  * so the audit has real cross-batch hits to find. Eval docs use a
  * disjoint vocabulary range — every hit is a planted one.
  *
  * Usage: runMain graft.ContaminationRehearsal [nTrain] [nEval] [nBuckets]
  */
object ContaminationRehearsal {

  private def trainText(i: Long): String =
    (0 until 50).map(j => s"w${i * 37 + j}").mkString(" ")

  private def evalText(e: Long): String =
    (0 until 50).map(j => s"e${e * 50 + j}").mkString(" ")

  /** Plant eval doc e's words 10..14 as the train doc's middle. */
  private def plantedText(i: Long, e: Long): String = {
    val w = trainText(i).split(" ")
    val ev = evalText(e).split(" ")
    (w.take(20) ++ ev.slice(10, 15) ++ w.drop(25)).mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val nTrain = if (args.nonEmpty) args(0).toInt else 100000
    val nEval = if (args.length > 1) args(1).toInt else 2
    val nBuckets = if (args.length > 2) args(2).toInt else 1024
    val spark = GraftSession.local()
    try {
      import spark.implicits._
      import graft.streaming.IngestStreams
      // train ids avoid multiples of 50 (the eval residue); eval ids
      // are multiples of 50 past the train range
      val trainIds = (1L to (nTrain * 1.03).toLong).filter(_ % 50 != 0).take(nTrain)
      val evalIds = (0 until nEval).map(e => (trainIds.last / 50 + 1 + e) * 50)
      def rowsOf(ids: Seq[Long]) = ids.map { i =>
        if (i % 97 == 0) (i, plantedText(i, (i / 97) % nEval))
        else (i, trainText(i))
      }
      val planted = trainIds.count(_ % 97 == 0)
      println(s"[rehearsal] contamination corpus: $nTrain train docs " +
        s"($planted planted), $nEval eval docs arriving LAST, $nBuckets buckets")
      val state = java.nio.file.Files.createTempDirectory("graft-cont-rehearsal-")
        .toString + "/state"
      val nBatches = 4
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (b <- 0 until nBatches) {
        val slice = trainIds.zipWithIndex.filter(_._2 % nBatches == b).map(_._1)
        val df = rowsOf(slice).toDF("doc_id", "text").repartition(32)
        val t0 = System.nanoTime()
        IngestStreams.contaminationBatch(df, b.toLong, state, nBuckets = nBuckets)
        walls += (System.nanoTime() - t0) / 1e9
      }
      val evalDf = evalIds.map(e => (e, evalText((e / 50 - trainIds.last / 50 - 1))))
        .toDF("doc_id", "text")
      val tEval0 = System.nanoTime()
      IngestStreams.contaminationBatch(evalDf, nBatches.toLong, state,
        nBuckets = nBuckets)
      val evalWall = (System.nanoTime() - tEval0) / 1e9
      // pruned-read bound: rows in the eval shingles' buckets vs all
      val evalBkts = spark.read.parquet(s"$state/eval_sh")
        .filter(col("batch") === nBatches.toLong)
        .select("bkt").distinct().collect().map(_.getInt(0)).toSeq
      val stored = spark.read.parquet(s"$state/train_sh")
        .filter(col("batch") < nBatches.toLong)
      val total = stored.count()
      val touched = stored.filter(col("bkt").isin(evalBkts: _*)).count()
      println(f"[rehearsal] train batches ${walls.map(w => f"$w%.1f").mkString("/")} s, " +
        f"eval(retro) batch $evalWall%.1f s; stored shingle rows $total%,d, " +
        f"retro term scanned $touched%,d rows in ${evalBkts.length} of $nBuckets " +
        f"buckets = ${touched * 100.0 / total}%.1f%%")
      // exactness at scale: resolve == batch operator on the union
      val t2 = System.nanoTime()
      val resolved = IngestStreams.contaminationResolve(spark, state)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val union = (rowsOf(trainIds) ++ evalIds.map(e =>
          (e, evalText(e / 50 - trainIds.last / 50 - 1))))
        .toDF("doc_id", "text").repartition(32)
      val batch = graft.operators.TextAnalysis.contamination(union)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val gateWall = (System.nanoTime() - t2) / 1e9
      require(resolved == batch,
        s"streamed != batch: ${(resolved diff batch).take(3)} vs ${(batch diff resolved).take(3)}")
      val hits = resolved.count(_._3 > 0)
      require(hits >= planted,
        s"planted contamination missed: $hits flagged < $planted planted")
      println(f"[rehearsal] resolve == batch contamination on ${resolved.size}%,d " +
        f"audit rows EXACT ($hits%,d contaminated, $planted%,d planted; " +
        f"gate pass $gateWall%.1f s)")
    } finally spark.stop()
  }
}
