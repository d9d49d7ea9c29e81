package org.apache.spark.sql.graftvec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the graft native expressions with the SQL function
  * registry, so `spark.sql("SELECT vec_cosine(a, b) ...")` works.
  *
  * Two entry points:
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=org.apache.spark.sql.graftvec.GraftExtensions`
  *    (the deployment path — survives session cloning);
  *  - [[GraftFunctionRegistration.registerAll]]: imperative
  *    registration on an existing session (the embedded/test path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctionRegistration.injectables.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the native as-of join plans through this strategy; without it a
    // spark.sql.extensions deployment would silently lack the operator
    // (the imperative path registers it via experimental.extraStrategies)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftplan.AsofJoinStrategy)
    // rank-filter → bounded top-k aggregate rewrite (the
    // injectOptimizerRule tier; imperative twin:
    // RewriteRowNumberTopK.register via experimental.extraOptimizations)
    ext.injectOptimizerRule(session =>
      org.apache.spark.sql.grafttopk.RewriteRowNumberTopK(session))
  }
}

object GraftFunctionRegistration {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  val injectables: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("vec_cosine",
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))

  /** Register on a live session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    injectables.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
