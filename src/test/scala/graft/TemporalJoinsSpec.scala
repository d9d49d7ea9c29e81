package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("asofJoin picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("uid", "t", "id")
    val right = Seq((1L, 90L, 20L, "a"), (1L, 150L, 21L, "b"), (1L, 201L, 22L, "c"),
      (2L, 60L, 23L, "d"))
      .toDF("uid", "t", "id", "v")
    val got = TemporalJoins.asofJoin(left, right, "uid", "t", "id", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, 100L, Some("a")), // 90 <= 100, latest
      (1L, 200L, Some("b")), // 150 <= 200; 201 is in the future
      (2L, 50L, None)        // no right row at or before 50
    ))
  }

  test("asofJoinForward picks the earliest right row at or after each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("uid", "t", "id")
    val right = Seq(
      (1L, 95L, 20L, "past"),   // before 100: must not match forward
      (1L, 150L, 21L, "next"),  // earliest >= 100
      (1L, 300L, 22L, "later"), // earliest >= 200
      (2L, 40L, 23L, "old"))    // nothing at or after 50
      .toDF("uid", "t", "id", "v")
    val got = TemporalJoins.asofJoinForward(left, right, "uid", "t", "id", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, 100L, Some("next")),
      (1L, 200L, Some("later")),
      (2L, 50L, None)))
    // a right row at exactly the left time matches (>= semantics)
    val edge = TemporalJoins.asofJoinForward(
      Seq((1L, 100L, 1L)).toDF("uid", "t", "id"),
      Seq((1L, 100L, 2L, "exact")).toDF("uid", "t", "id", "v"),
      "uid", "t", "id", Seq("v")).head
    assert(edge.getString(3) == "exact")
  }

  test("asofJoinTolerance masks out-of-horizon matches without falling back to older rows") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("uid", "t", "id")
    val right = Seq(
      (1L, 95L, 20L, "fresh"),   // within 10 of t=100
      (1L, 120L, 21L, "stale"),  // latest <= 200, but 80 > tolerance —
                                 // and 95 must NOT be used as fallback
      (2L, 10L, 22L, "old"))     // 40 > tolerance
      .toDF("uid", "t", "id", "v")
    val got = TemporalJoins.asofJoinTolerance(left, right, "uid", "t", "id",
      Seq("v"), tolerance = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, 100L, Some("fresh")),
      (1L, 200L, None),
      (2L, 50L, None)))
    // boundary: a match exactly `tolerance` old survives (<=)
    val edge = TemporalJoins.asofJoinTolerance(
      Seq((1L, 100L, 1L)).toDF("uid", "t", "id"),
      Seq((1L, 90L, 2L, "edge")).toDF("uid", "t", "id", "v"),
      "uid", "t", "id", Seq("v"), tolerance = 10L).head
    assert(edge.getString(3) == "edge")
  }

  test("asofJoin: right row at exactly the left time matches (<= semantics)") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1L)).toDF("uid", "t", "id")
    val right = Seq((1L, 100L, 2L, "exact")).toDF("uid", "t", "id", "v")
    val got = TemporalJoins.asofJoin(left, right, "uid", "t", "id", Seq("v")).head
    assert(got.getString(3) == "exact")
  }

  test("asofJoin with a null payload field keeps the matched row's other fields (no column mixing)") {
    import spark.implicits._
    val left = Seq((1L, 30L, 1L)).toDF("uid", "t", "id")
    val right = Seq(
      (1L, 10L, 10L, Some("a"), Some(1.5)),
      (1L, 20L, 11L, Some("b"), None) // latest match: v2 is NULL
    ).toDF("uid", "t", "id", "v1", "v2")
    val r = TemporalJoins.asofJoin(left, right, "uid", "t", "id", Seq("v1", "v2")).head
    assert(r.getString(3) == "b", "v1 must come from the t=20 row")
    assert(r.isNullAt(4), "v2 must be the matched row's NULL, not carried from t=10")
  }

  test("rangeJoin finds exactly the rows inside the window, across bin edges") {
    import spark.implicits._
    val left = Seq((1L, 1000L, 1L)).toDF("uid", "t", "id")
    val right = Seq(
      (1L, 899L), (1L, 900L), (1L, 1100L), (1L, 1101L), // edges of [900,1100]
      (2L, 1000L) // other key
    ).toDF("uid", "t")
    val got = TemporalJoins.rangeJoin(left, right, "uid", "t",
      before = 100L, after = 100L, binWidth = 64L,
      leftProject = Seq("id"), rightProject = Seq("t"))
      .collect().map(r => r.getLong(1)).sorted
    assert(got.toSeq == Seq(900L, 1100L))
  }

  test("rangeJoin equals the naive inequality join on real events") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, SharedSpark.sf)
    val halfHourNs = 1800000000000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ns"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts_ns").as("c_ts"))
    val binned = TemporalJoins.rangeJoin(errors, clicks.select(col("c_uid").as("user_id"),
        col("c_ts").as("ts_ns")), "user_id", "ts_ns",
        halfHourNs, halfHourNs, halfHourNs, Seq("event_id"), Seq("ts_ns"))
      .groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = errors
      .join(clicks, errors("user_id") === col("c_uid") &&
        col("c_ts") >= col("ts_ns") - halfHourNs && col("c_ts") <= col("ts_ns") + halfHourNs)
      .groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned == naive)
  }

  test("intervalOverlapJoin: closed-interval semantics across bin edges") {
    import spark.implicits._
    val left = Seq(
      (0L, 25L, 1L),   // spans bins 0-2 at width 10
      (40L, 40L, 2L),  // point interval
      (100L, 110L, 3L) // overlaps nothing
    ).toDF("ivl_start", "ivl_end", "lid")
    val right = Seq(
      (25L, 30L, 10L), // touches lid=1 at exactly 25 (closed: overlap)
      (26L, 30L, 11L), // just past lid=1's end: NO overlap
      (35L, 45L, 12L), // contains the point interval
      (0L, 300L, 13L)  // covers everything
    ).toDF("ivl_start", "ivl_end", "rid")
    val got = TemporalJoins.intervalOverlapJoin(left, right,
      "ivl_start", "ivl_end", 10L, Seq("lid"), Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == Set(
      (1L, 10L), (1L, 13L), (2L, 12L), (2L, 13L), (3L, 13L)))
  }

  test("intervalOverlapJoin on empty inputs returns empty") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long, Long)].toDF("ivl_start", "ivl_end", "lid")
    val r = Seq((0L, 10L, 1L)).toDF("ivl_start", "ivl_end", "rid")
    assert(TemporalJoins.intervalOverlapJoin(e, r, "ivl_start", "ivl_end", 10L,
      Seq("lid"), Seq("rid")).isEmpty)
    assert(TemporalJoins.intervalOverlapJoin(r, e, "ivl_start", "ivl_end", 10L,
      Seq("rid"), Seq("lid")).isEmpty)
  }
}
