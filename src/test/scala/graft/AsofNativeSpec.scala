package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftplan.AsofJoinNative
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TemporalJoins

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan)
  * must agree with the compositional window implementation and show
  * the declared physical shape.
  */
class AsofNativeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("native as-of join on planted data: latest right row at or before") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("uid", "t")
    val right = Seq((1L, 90L, 7L), (1L, 150L, 8L), (1L, 201L, 9L), (3L, 1L, 10L))
      .toDF("uid", "t", "rid")
    val got = AsofJoinNative.asofJoin(left, right, "uid", "t", "rid", Seq("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 100L, 7L), (1L, 200L, 8L), (2L, 50L, -1L)))
  }

  test("native as-of join equals the compositional window implementation on events") {
    val ev = Tables.events(spark, SharedSpark.sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_ns"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_id").as("click_event_id"))
    val native = AsofJoinNative.asofJoin(purchases, clicks, "user_id", "ts_ns",
      "click_event_id", Seq("click_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val composed = TemporalJoins.asofJoin(purchases, clicks,
      "user_id", "ts_ns", "event_id", Seq("click_event_id"))
      .select(col("user_id"), col("event_id"), col("click_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("(key, time) ties on the right resolve to the max tie row under any partitioning") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 100L)).toDF("uid", "t")
    // three right rows at the SAME (key, time): only the tie column
    // distinguishes them — the max-tie payload must win regardless of
    // how the right side was partitioned before the exchange
    val rightRows = Seq((1L, 100L, 1L, 10L), (1L, 100L, 3L, 30L), (1L, 100L, 2L, 20L),
      (2L, 90L, 5L, 50L), (2L, 90L, 4L, 40L))
    for (parts <- Seq(1, 3, 7)) {
      val right = rightRows.toDF("uid", "t", "rid", "v").repartition(parts)
      val got = AsofJoinNative.asofJoin(left, right, "uid", "t", "rid", Seq("v"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == Set((1L, 30L), (2L, 50L)), s"parts=$parts")
    }
  }

  test("physical plan: AsofJoin node with one exchange + sort per side") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("uid", "t")
    val right = Seq((1L, 90L, 1L)).toDF("uid", "t", "rid")
    val df = AsofJoinNative.asofJoin(left, right, "uid", "t", "rid", Seq("rid"))
    // inspect BEFORE execution: after AQE finalizes, the explain
    // string repeats the initial plan section and double-counts
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("AsofJoin"))
    assert(plan.split("\n").count(_.contains("Exchange hashpartitioning")) == 2)
    assert(plan.split("\n").count(_.contains("Sort ")) == 2)
    df.collect() // and it executes fine
  }
}
