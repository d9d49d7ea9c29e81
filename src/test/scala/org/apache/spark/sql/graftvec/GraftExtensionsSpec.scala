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
    // resolve the injected functions through an EMPTY registry — a
    // clone of the shared session's registry would already contain
    // them (registerAll runs elsewhere in this JVM), making the
    // assertion vacuous
    val registry = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(!registry.functionExists(FunctionIdentifier("vec_dot")))
    val withFns = ext.registerFunctions(registry)
    assert(withFns.functionExists(FunctionIdentifier("vec_dot")))
    assert(withFns.functionExists(FunctionIdentifier("vec_cosine")))
  }
}
