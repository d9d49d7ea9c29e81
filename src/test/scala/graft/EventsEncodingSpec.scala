package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType, TimestampType}

import graft.operators.Relational
import graft.streaming.EventStreams

/** Regression pin for the round-8 events-fixture drift: the driver has
  * shipped `ts` as int64 TIMESTAMP(NANOS) (rounds 1–7) and as Arrow
  * `timestamp[us]` / TIMESTAMP_NTZ (round 8+). The loaders must
  * produce IDENTICAL query output over both encodings, and must throw
  * — never silently reinterpret — on an encoding they don't know.
  *
  * The µs-as-ns failure class this pins against: a forced LongType
  * stream schema over µs data shrinks every interval 1000×, collapsing
  * 720 hours into ~1 and producing plausible-but-wrong (not erroring)
  * streaming answers.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  /** Same logical rows in every encoding: 600 events over ~6 hours,
    * 3 event types, 20 users. µs-aligned nanos so every encoding can
    * represent the identical instants.
    */
  private lazy val encodedDirs: Map[String, String] = {
    val s = spark
    import s.implicits._
    val hourNs = 3600000000000L
    val rows = (0 until 600).map { i =>
      val h = i % 6
      (i.toLong, h * hourNs + (i * 7919L % 3600000L) * 1000000L, (i % 20).toLong,
        Seq("click", "view", "buy")(i % 3), (i % 100) / 10.0, s"""{"k":$i}""")
    }
    val base = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def write(tag: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): (String, String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-enc-$tag-").toString
      f(base).write.parquet(s"$dir/events.parquet")
      tag -> dir
    }
    Map(
      // legacy shape: raw int64 nanos (TIMESTAMP(NANOS) surfaces as
      // LongType under nanosAsLong — a plain int64 column probes the
      // same branch)
      write("ns") { df => df },
      // round-8 shape: timestamp[us] isAdjustedToUTC=false
      write("ntz") { df =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType)) },
      // timestamp[us] isAdjustedToUTC=true, for completeness
      write("tz") { df =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) })
  }

  test("probe discriminates the three supported encodings") {
    val probed = encodedDirs.view.mapValues(d => Tables.eventsTsType(spark, d)).toMap
    assert(probed("ns") === LongType)
    assert(probed("ntz") === TimestampNTZType)
    assert(probed("tz") === TimestampType)
  }

  test("batch loader: identical (ts_ns, ts) and schema over all encodings") {
    val frames = encodedDirs.view.mapValues(d => Tables.events(spark, d)).toMap
    val want = frames("ns")
    // output schema is pinned — ts is TimestampType on EVERY branch
    // (the round-8 ADVICE hazard: an NTZ passthrough would flip
    // schema_match even with equal rows)
    frames.foreach { case (tag, df) =>
      assert(df.schema("ts").dataType === TimestampType, s"encoding $tag")
      assert(df.schema("ts_ns").dataType === LongType, s"encoding $tag")
      assert(df.schema.fieldNames.toSeq === want.schema.fieldNames.toSeq, s"encoding $tag")
    }
    val collected = frames.view.mapValues(
      _.orderBy("event_id").collect().map(_.toSeq).toSeq).toMap
    assert(collected("ntz") === collected("ns"), "NTZ µs rows must equal legacy nanos rows")
    assert(collected("tz") === collected("ns"), "TZ µs rows must equal legacy nanos rows")
  }

  test("batch query parity: eventsWindow identical over all encodings") {
    val out = encodedDirs.view.mapValues { d =>
      Relational.eventsWindow(Tables.events(spark, d)).collect().map(_.toSeq).toSet
    }.toMap
    assert(out("ns").nonEmpty && out("ns").size > 1, "fixture must span multiple buckets")
    assert(out("ntz") === out("ns"))
    assert(out("tz") === out("ns"))
  }

  test("streaming query parity: windowCounts identical over all encodings, hour count real") {
    val out = encodedDirs.view.mapValues { d =>
      EventStreams.windowCounts(spark, d).collect().map(_.toSeq).toSet
    }.toMap
    // the collapse signature is a near-singleton bucket count: assert
    // the real hour spread survived, not just that totals agree
    val hours = out("ntz").map(_.head).size
    assert(hours >= 6, s"µs encoding must keep the 6-hour timeline, got $hours buckets")
    assert(out("ntz") === out("ns"))
    assert(out("tz") === out("ns"))
  }

  test("unsupported ts encoding fails loud, naming the file and type") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-enc-bad-").toString
    Seq((1L, "2024-01-01T00:00:00", 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val exB = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(exB.getMessage.contains(dir) && exB.getMessage.contains("StringType"))
    val exS = intercept[IllegalStateException] { EventStreams.readEventStream(spark, dir) }
    assert(exS.getMessage.contains(dir) && exS.getMessage.contains("StringType"))
  }
}
