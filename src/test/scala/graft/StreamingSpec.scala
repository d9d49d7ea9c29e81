package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.streaming.EventStreams

/** §2.7: streaming results must agree with their batch twins on a
  * finite source.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  lazy val sf = SharedSpark.sf

  private def rowKey(r: org.apache.spark.sql.Row): Seq[Any] =
    r.toSeq

  test("streaming window counts == batch eventsWindow") {
    val streamed = EventStreams.windowCounts(spark, sf).collect().map(rowKey).toSet
    val batch = Relational.eventsWindow(Tables.events(spark, sf)).collect().map(rowKey).toSet
    assert(streamed == batch)
  }

  test("streaming dedup drops planted duplicate events") {
    import org.apache.spark.sql.functions._
    // plant duplicates: write events twice into one stream directory
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dup-").toString
    val raw = spark.read
      .parquet(s"$sf/events.parquet")
    raw.write.parquet(s"$dir/events.parque[t]".replace("[t]", "t")) // dir/events.parquet part files
    raw.limit(100).write.mode("append").parquet(s"$dir/events.parquet")
    val got = EventStreams.dedupCounts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("event_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "duplicated first 100 events must be deduped")
  }

  test("stateful sessionization == batch sessionize") {
    val streamed = EventStreams.sessionizeStateful(spark, sf, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Relational.sessionize(Tables.events(spark, sf), 30).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("session_id")),
        r.getLong(r.fieldIndex("n_events")), r.getDouble(r.fieldIndex("session_value")))).toSet
    assert(streamed == batch)
  }
}
