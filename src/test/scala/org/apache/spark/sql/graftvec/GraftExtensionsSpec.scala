package org.apache.spark.sql.graftvec

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftplan.AsofJoinStrategy

/** The `spark.sql.extensions` deployment path must carry BOTH the SQL
  * functions and the native as-of-join planner strategy. This spec
  * lives in the org.apache.spark.sql namespace so it can probe the
  * (private[sql]) build methods of SparkSessionExtensions directly
  * instead of standing up a second SparkContext.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects vec functions AND the as-of planner strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val spark = graft.SharedSpark.spark
    val strategies = ext.buildPlannerStrategies(spark)
    assert(strategies.contains(AsofJoinStrategy),
      "extensions deployment must plan the native as-of join")
    // resolve an injected function through a fresh registry clone
    val registry = spark.sessionState.functionRegistry.clone()
    val withFns = ext.registerFunctions(registry)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(withFns.functionExists(FunctionIdentifier("vec_dot")))
    assert(withFns.functionExists(FunctionIdentifier("vec_cosine")))
  }
}
