package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  lazy val sf = SharedSpark.sf

  test("q1 groups to the flag pairs with positive sums") {
    val rows = Relational.q1PricingSummary(Tables.lineitem(spark, sf)).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("semi and anti join partition the customers") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    import org.apache.spark.sql.functions._
    val semi = c.join(o.filter(col("o_totalprice") > 300000.0).select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.antiJoin(c, o).count()
    assert(semi + anti == c.count())
    assert(anti > 0)
  }

  test("topKPerKey returns at most k rows per key, ranked") {
    val got = Relational.topKPerKey(Tables.orders(spark, sf), 3)
    import org.apache.spark.sql.functions._
    val maxPerKey = got.groupBy("o_custkey").count().agg(max("count")).head.getLong(0)
    assert(maxPerKey <= 3)
    assert(got.filter(col("rk") > 3).count() == 0)
  }

  test("sessionize: session count bounded by event count; gaps respected") {
    val ev = Tables.events(spark, sf)
    val sess = Relational.sessionize(ev, 30)
    import org.apache.spark.sql.functions._
    val totalEvents = sess.agg(sum("n_events")).head.getLong(0)
    assert(totalEvents == ev.count())
  }

  test("rollup has grand total row equal to full count") {
    val r = Relational.rollupAgg(Tables.lineitem(spark, sf))
    import org.apache.spark.sql.functions._
    val grand = r.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .head.getLong(3)
    assert(grand == Tables.lineitem(spark, sf).count())
  }

  test("salted aggregation equals direct aggregation") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val salted = Relational.saltedAgg(ev, 16).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val direct = ev.groupBy(col("event_type"))
      .agg(round(sum(col("value").cast("decimal(18,6)")), 2).cast("double"), count(lit(1)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("jsonPropsAgg: typed extraction; malformed json yields nulls, not failures") {
    import spark.implicits._
    val ev = Seq(
      ("click", """{"k": 5}"""),
      ("click", """{"k": 7}"""),
      ("view", "not json"),
      ("view", """{"other": 1}""")).toDF("event_type", "props")
    val got = Relational.jsonPropsAgg(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("click") == ((2L, 12L)))
    assert(got("view") == ((0L, 0L)), "malformed/missing k counts as absent, job survives")
  }

  test("salted join equals plain join, including under a planted hot key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10k rows on ONE key (the skew) + a spread of normal keys
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "tag")
    val salted = Relational.saltedJoin(big, small, "k", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = big.join(small, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    // the hot key really is spread: >1 distinct salt among its rows
    val salts = big.filter(col("k") === 1L)
      .withColumn("_salt", pmod(xxhash64(big.columns.map(col): _*), lit(8L)))
      .select("_salt").distinct().count()
    assert(salts > 1, "deterministic row-hash salt must spread the hot key")
  }

  test("per-key topk via aggregator equals window row_number plan") {
    val viaAgg = graft.functions.TopK.perKeyTopK(
      Tables.orders(spark, sf), "o_custkey", "o_orderkey", "o_totalprice", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val viaWindow = Relational.topKPerKey(Tables.orders(spark, sf), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("cube contains rollup's grouping sets plus the linestatus-only sets") {
    import org.apache.spark.sql.functions._
    val cube = Relational.cubeAgg(Tables.lineitem(spark, sf))
    val rollupN = Relational.rollupAgg(Tables.lineitem(spark, sf)).count()
    val statusOnly = cube.filter(col("l_returnflag").isNull && col("l_linestatus").isNotNull).count()
    assert(cube.count() == rollupN + statusOnly)
  }

  test("percentile_approx (the 100 TB sketch path) lands near exact percentiles") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf)
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("percentile_approx(o_totalprice, 0.5, 1000)").as("approx")).head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
  }

  test("q1 count_order sums to the filtered row count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val total = Relational.q1PricingSummary(li)
      .agg(sum("count_order")).head.getLong(0)
    val expected = li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00"))).count()
    assert(total == expected)
  }

  test("groupingSetsAgg emits exactly the requested sets, gid-labeled") {
    import spark.implicits._
    val df = Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val got = Relational.groupingSetsAgg(df).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(r.fieldIndex("gid")), r.getLong(r.fieldIndex("n")))).toSet
    // one row per returnflag (gid 1: linestatus aggregated), one per
    // linestatus (gid 2), one grand total (gid 3) — no cross product
    assert(got == Set(
      (Some("A"), None, 1L, 2L), (Some("B"), None, 1L, 1L),
      (None, Some("x"), 2L, 2L), (None, Some("y"), 2L, 1L),
      (None, None, 3L, 3L)))
  }

  test("funnel enforces strict view→click→purchase ordering per user") {
    import spark.implicits._
    val H = 3600000000000L
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 1 * H), (1L, "click", 2 * H), (1L, "purchase", 3 * H),
      // user 2: click BEFORE the first view — stage stops at view
      (2L, "click", 1 * H), (2L, "view", 2 * H),
      // user 3: purchase before the qualifying click — stage 2
      (3L, "view", 1 * H), (3L, "purchase", 2 * H), (3L, "click", 3 * H),
      // user 4: never viewed
      (4L, "signup", 1 * H)
    ).toDF("user_id", "event_type", "ts_ns")
    val got = Relational.funnel(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("retention: cohort = first active hour, offsets count returning users") {
    import spark.implicits._
    val H = 3600000000000L
    val ev = Seq(
      (1L, 0 * H), (1L, 1 * H), (1L, 1 * H + 7), // user 1: hours 0,1 (dup in 1)
      (2L, 0 * H), (2L, 2 * H),                  // user 2: hours 0,2
      (3L, 1 * H)                                // user 3: hour 1 only
    ).toDF("user_id", "ts_ns")
    val got = Relational.retention(ev, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, // cohort 0: both day-0; u1 at +1, u2 at +2
      (1L, 0L) -> 1L))                                 // cohort 1: user 3
  }

  test("tableProfile counts rows, non-nulls, and exact distincts per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a"))
    ).toDF("k", "s")
    val got = Relational.tableProfile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("k") == ((4L, 3L, 2L)))
    assert(got("s") == ((4L, 3L, 2L)))
  }

  test("setOpsExceptAll keeps multiplicity where an anti join would drop the key") {
    import spark.implicits._
    // customer 1: 5 orders, 2 high-value -> 3 regular rows survive;
    // customer 2: 2 orders, both high-value -> absent entirely
    val orders = Seq(
      (1L, 100.0), (1L, 100.0), (1L, 100.0), (1L, 300000.0), (1L, 300000.0),
      (2L, 300000.0), (2L, 300000.0), (3L, 50.0)
    ).toDF("o_custkey", "o_totalprice")
    val got = Relational.setOpsExceptAll(orders).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 3L -> 1L))
  }

  test("native session windows: events exactly gap apart MERGE, one microsecond more splits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gapUs = 1800000000L // 30 min
    val df = Seq(
      (1L, 0L, 1.0), (1L, gapUs, 1.0),          // exactly gap -> inclusive merge
      (2L, 0L, 1.0), (2L, gapUs + 1L, 1.0),     // gap + 1us -> two sessions
      (3L, 0L, 1.0), (3L, 10L, 1.0), (3L, 20L, 1.0)) // trivially one
      .toDF("user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us") + 1000000000000000L))
    val got = Relational.sessionWindowAgg(df, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byUser === Map(1L -> 1, 2L -> 2, 3L -> 1),
      s"boundary semantics drifted: $got")
    // session_end = last event + gap; start = first event
    val u3 = got.filter(_._1 == 3L).head
    assert(u3._2 == 1000000000000000L && u3._3 == 1000000000000020L + gapUs)
    assert(u3._4 == 3L)
  }

  test("scd2 intervals: runs collapse, intervals abut exactly, last run open") {
    import spark.implicits._
    val df = Seq(
      (1L, 10000L, 1L, "a"), (2L, 20000L, 1L, "a"), (3L, 50000L, 1L, "b"),
      (4L, 90000L, 1L, "a"),
      (5L, 10000L, 2L, "x"))
      .toDF("event_id", "ts_ns", "user_id", "event_type")
    val got = Relational.scd2Intervals(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === Set(
      (1L, 1L, "a", 10L, 50L, 2L),
      (1L, 2L, "b", 50L, 90L, 1L),
      (1L, 3L, "a", 90L, Long.MaxValue, 1L),
      (2L, 1L, "x", 10L, Long.MaxValue, 1L)))
  }

  test("scd2 on real events: intervals tile each user's timeline with no gaps or overlaps") {
    val iv = Relational.scd2Intervals(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(iv.nonEmpty)
    iv.groupBy(_._1).foreach { case (_, runs) =>
      val sorted = runs.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 == b._3, "consecutive intervals must abut exactly")
      }
      assert(sorted.last._4 == Long.MaxValue, "last run open")
      sorted.foreach(r => assert(r._3 < r._4))
    }
  }

  test("snapshotDiff classifies planted added/removed/changed/unchanged exactly; fkAudit counts planted orphans") {
    import spark.implicits._
    val vOld = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val vNew = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val diff = Relational.snapshotDiff(vOld, vNew, "doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff === Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L, "unchanged" -> 1L))
    val li = Seq((10L, 1.0), (10L, 2.0), (99L, 3.0)).toDF("l_orderkey", "x")
    val ord = Seq((10L, 5L), (11L, 77L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((5L, "s")).toDF("c_custkey", "c_name")
    val audit = Relational.fkAudit(li, ord, cust).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit("lineitem.l_orderkey->orders") === ((3L, 1L)), "orphan lineitem row")
    assert(audit("orders.o_custkey->customer") === ((2L, 1L)), "orphan order row")
  }

  test("null-safe vs plain equality join: <=> matches the NULL member, = drops it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = Seq(Some(1.0), Some(2.0), None).toDF("k")
    val a = keys.as("a"); val b = keys.as("b")
    assert(a.join(b, col("a.k") === col("b.k")).count() === 2L)
    assert(a.join(b, col("a.k") <=> col("b.k")).count() === 3L)
  }

  test("stack melt: 3 rows per input row, measures labeled, values preserved") {
    import spark.implicits._
    val df = Seq((1L, 1, 10.0, 100.0, 0.05)).toDF(
      "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    val melted = df.selectExpr("l_orderkey",
      "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, " +
        "'discount', l_discount) AS (measure, value)")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(melted === Map("quantity" -> 10.0, "price" -> 100.0, "discount" -> 0.05))
  }

  test("eventTransitions: per-user consecutive steps only; same-timestamp order resolved by event_id") {
    import spark.implicits._
    // user 1: view -> click -> buy ; user 2: view -> view.
    // The two user-1 events at t=100 order by event_id (2 then 3),
    // so the steps are view->click and click->buy, NOT view->buy.
    val ev = Seq(
      (1L, 50L, 1L, "view"),
      (2L, 100L, 1L, "click"),
      (3L, 100L, 1L, "buy"),
      (4L, 10L, 2L, "view"),
      (5L, 20L, 2L, "view")).toDF("event_id", "ts_ns", "user_id", "event_type")
    val got = Relational.eventTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("view", "click", 1L), ("click", "buy", 1L), ("view", "view", 1L)))
    // partitioning cannot change counts (window is per-user)
    val got13 = Relational.eventTransitions(ev.repartition(13)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got13 === got)
  }

  test("intervalCoverage: overlaps merge, adjacency merges, gaps split islands; exact covered/span/ppm; partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // part 1: [1,4] ∪ [3,7] ∪ [2,3] merge to island [1,7]; [9,10]
    // starts a new island (gap: 9 > 7 + 1)
    // part 2: single [0,1]
    // part 3: [1,3] then [4,5] — ADJACENT (4 = 3 + 1) merges
    val li = Seq(
      (1L, "1992-01-02", 2.0),
      (1L, "1992-01-04", 3.0),
      (1L, "1992-01-03", 0.0),
      (1L, "1992-01-10", 0.0),
      (2L, "1992-01-01", 14.0),
      (3L, "1992-01-02", 1.0),
      (3L, "1992-01-05", 0.0)
    ).toDF("l_partkey", "ship", "l_quantity")
      .withColumn("l_shipdate", to_timestamp(col("ship")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Relational.intervalCoverage(df).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
    val got = run(li)
    assert(got(1L) == ((4L, 2L, 9L, 10L, 900000L)), s"part 1: ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 2L, 2L, 1000000L)), s"part 2: ${got(2L)}")
    assert(got(3L) == ((2L, 1L, 5L, 5L, 1000000L)), s"part 3: ${got(3L)}")
    // window ties are identical rows -> partitioning-invariant
    assert(run(li.repartition(13)) == got)
    // a duplicated identical interval changes the count, nothing else
    val dup = li.unionAll(li.filter(col("l_partkey") === 2L))
    val got2 = run(dup)
    assert(got2(2L) == ((2L, 1L, 2L, 2L, 1000000L)))
  }

  test("skewProfile surfaces a planted hot key with exact ppm share") {
    import spark.implicits._
    // 900 rows of key 7, 10 each of keys 1..10 => total 1000
    val df = (Seq.fill(900)(7L) ++ (1L to 10L).flatMap(k => Seq.fill(10)(k)))
      .toDF("k").repartition(13)
    val got = Relational.skewProfile(df, "k", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    // key 7: 910 rows = 910_000 ppm; ties among the 10-row keys break by key asc
    assert(got === List((1L, 7L, 910L, 910000L), (2L, 1L, 10L, 10000L),
      (3L, 2L, 10L, 10000L)))
  }
}
