package org.apache.spark.sql.grafttopk

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The injectOptimizerRule tier: `row_number() <= k` rank filters must
  * rewrite into the bounded top-k aggregate — same rows, no Window, no
  * per-partition sort — and must NOT fire when the rewrite would be
  * lossy (columns not reconstructible from the buffer).
  */
class TopKRewriteSpec extends AnyFunSuite {
  lazy val spark = graft.SharedSpark.spark
  lazy val sf = graft.SharedSpark.sf

  private def topkQuery(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    graft.Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rk").cast("long").as("rk"))
  }

  private def collectSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      // NaN != NaN under ==; compare via a stable token instead
      case d: Double if d.isNaN => "NaN"
      case v => v
    }.toSeq).toSet

  /** Apply the rule to the already-optimized plan and re-execute —
    * exercises the rewrite without mutating shared session state.
    */
  private def rewritten(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val plan = RewriteRowNumberTopK(spark)(df.queryExecution.optimizedPlan)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }

  test("rewrite fires on the rank-filter shape: no Window, no Sort, bounded agg in the plan") {
    val df = topkQuery(3)
    val rw = rewritten(df)
    val phys = rw.queryExecution.executedPlan.toString
    assert(phys.contains("graft_bounded_topk"), s"bounded agg missing from plan:\n$phys")
    assert(!phys.contains("Window"), s"Window survived the rewrite:\n$phys")
    assert(!phys.contains("Sort"), s"rewritten plan must not sort partitions:\n$phys")
    assert(collectSet(rw) == collectSet(df), "rewritten rows differ from window plan")
    assert(rw.schema == df.schema, "rewritten schema differs")
    assert(rw.count() > 0)
  }

  test("rewrite preserves results under null scores and ids (NULLS LAST / NULLS FIRST)") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 5.0), (1L, 11L, null), (1L, null, 5.0), (1L, 12L, 5.0), (1L, 13L, null),
      (2L, null, null), (2L, 20L, 1.0), (2L, 21L, Double.NaN),
      (3L, 30L, 2.0))
      .toDF("k", "id", "score")
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc, col("id").asc)
    val q = rows.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
    val rw = rewritten(q)
    assert(rw.queryExecution.executedPlan.toString.contains("graft_bounded_topk"),
      "rule must fire on the null-bearing frame")
    assert(collectSet(rw) == collectSet(q),
      s"null ordering diverged: ${collectSet(rw)} vs ${collectSet(q)}")
  }

  test("rewrite does NOT fire when a non-reconstructible column is consumed downstream") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // o_orderdate is neither partition key nor ordering column: the
    // buffer cannot reconstruct it, so the window plan must survive
    val q = graft.Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("rk"))
    val rw = rewritten(q)
    val phys = rw.queryExecution.executedPlan.toString
    assert(!phys.contains("graft_bounded_topk"), "rule fired on a lossy shape")
    assert(phys.contains("Window"), "window plan must survive")
    assert(collectSet(rw) == collectSet(q))
  }

  test("end-to-end via experimental.extraOptimizations: q_topk_per_key rows unchanged") {
    val before = collectSet(topkQuery(3))
    RewriteRowNumberTopK.register(spark)
    try {
      val df = topkQuery(3)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("graft_bounded_topk"), s"rule did not fire end-to-end:\n$phys")
      assert(!phys.contains("Window"), "Window survived end-to-end rewrite")
      assert(collectSet(df) == before, "registered rule changed query results")
    } finally {
      RewriteRowNumberTopK.unregister(spark)
    }
    // cleanup verified: the window plan is back
    assert(topkQuery(3).queryExecution.executedPlan.toString.contains("Window"))
  }

  test("GraftExtensions injects the optimizer rule (deployment path)") {
    val ext = new SparkSessionExtensions
    new org.apache.spark.sql.graftvec.GraftExtensions().apply(ext)
    val rules = ext.buildOptimizerRules(spark)
    assert(rules.exists(_.isInstanceOf[RewriteRowNumberTopK]),
      "spark.sql.extensions deployment must carry the top-k rewrite")
  }

  test("shuffle carries k-bounded serialized buffers (serialize trims to k)") {
    val agg = BoundedRowNumberTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 2)
    val buf = agg.createAggregationBuffer()
    (1 to 100).foreach { i =>
      buf += TopKEntry(java.lang.Double.valueOf(i.toDouble), java.lang.Long.valueOf(i.toLong))
    }
    val ser = agg.serialize(buf)
    val back = agg.deserialize(ser)
    assert(back.length == 2, s"serialized buffer not k-bounded: ${back.length}")
    assert(back.toSet == Set(TopKEntry(100.0, 100L), TopKEntry(99.0, 99L)))
  }
}
