package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ReplayLog, ReplayStream}

/** The replayable-offset source contract (SURVEY §2.8, the
  * "Kafka-shaped" production semantics): explicit integer offsets,
  * bounded admission, and — the part that matters — restart from the
  * committed offset N replays exactly the records with seq > N, so a
  * drive killed mid-stream and resumed equals the uninterrupted run.
  */
class ReplaySourceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("offsets: bounded admission covers the log exactly once, in order; a restarted query resumes from the committed offset") {
    val log = tmp("graft-replay-log-")
    ReplayLog.append(log, (0 until 5).map(i => (i.toLong, s"v$i")))
    ReplayLog.append(log, (5 until 10).map(i => (i.toLong, s"v$i")))
    val ckpt = tmp("graft-replay-ckpt-")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()
    def drain(): Unit = {
      val q = ReplayStream.read(spark, log, maxSeqPerTrigger = Some(3L))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.add((id, b.select("seq").collect().map(_.getLong(0)).toSeq.sorted))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val batches1 = seen.toArray(Array.empty[(Long, Seq[Long])]).toSeq
    assert(batches1.flatMap(_._2) == (0L until 10L),
      s"first drain must deliver 0..9 exactly once in order: $batches1")
    assert(batches1.forall(_._2.size <= 3), s"admission bound violated: $batches1")
    // restart against the SAME checkpoint: nothing new → nothing delivered
    seen.clear()
    drain()
    assert(seen.isEmpty, "restart with no new records re-delivered data")
    // append after the restart: only seq > committed N arrive
    ReplayLog.append(log, (10 until 12).map(i => (i.toLong, s"v$i")))
    drain()
    val batches3 = seen.toArray(Array.empty[(Long, Seq[Long])]).toSeq
    assert(batches3.flatMap(_._2) == (10L until 12L),
      s"resume must deliver exactly the post-offset records: $batches3")
  }

  test("kill at batch k, resume: the replay-fed bm25 drive equals the uninterrupted run (offsets + idempotent state writes compose)") {
    import graft.operators.TextAnalysis
    import graft.streaming.IngestStreams
    val docs = Seq(
      (1L, "spark shuffle plan"), (2L, "spark window join"),
      (3L, "window frame"), (4L, "alpha beta gamma"),
      (5L, "vector spark window"), (6L, "delta lake table"))
    val terms = Seq("spark", "window", "vector")

    def runDrive(crashOnBatch: Option[Long]): String = {
      val log = tmp("graft-replay-bm25-")
      // two segments → multiple micro-batches under the seq bound
      ReplayLog.append(log, docs.take(3).map { case (id, t) => (id, t) })
      ReplayLog.append(log, docs.drop(3).map { case (id, t) => (id, t) })
      val base = tmp("graft-replay-state-")
      val state = s"$base/state"
      val ckpt = s"$base/ckpt"
      var crashed = false
      def drive(crash: Boolean): Unit = {
        val q = ReplayStream.read(spark, log, maxSeqPerTrigger = Some(2L))
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val parsed = b.select(col("key").as("doc_id"), col("value").as("text"))
            // state write FIRST, then the crash: the batch's work is on
            // disk but its offset never commits — the worst-case window.
            // On resume the batch replays with the same id and the
            // commit-marker makes the state write a no-op.
            IngestStreams.bm25IndexBatch(parsed, id, state)
            if (crash && crashOnBatch.contains(id)) {
              crashed = true
              throw new RuntimeException(s"planted crash at batch $id")
            }
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      }
      drive(crash = true)
      crashOnBatch.foreach(_ => assert(crashed, "planted crash did not fire"))
      drive(crash = false) // resume from the committed offset
      state
    }

    def resolve(state: String) = IngestStreams.bm25Resolve(spark, state, terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(_._4)

    val killed = resolve(runDrive(crashOnBatch = Some(1L)))
    val clean = resolve(runDrive(crashOnBatch = None))
    val batch = {
      import spark.implicits._
      TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"), terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq.sortBy(_._4)
    }
    assert(killed == clean, "killed-and-resumed drive diverged from the clean drive")
    assert(killed == batch, "replay-fed maintained index diverged from the batch operator")
    assert(batch.nonEmpty)
  }
}
