package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst vector primitives (SURVEY §2.4 row 29).
  *
  * Why a custom Expression instead of `zip_with` + `aggregate`: the
  * higher-order-function composition builds an intermediate array and
  * evaluates a lambda per element per row; at 100 TB of 64-float
  * embeddings that is the hot path. These expressions generate a
  * tight primitive loop inside whole-stage codegen — no lambda
  * dispatch, no intermediate ArrayData allocation.
  *
  * Math is fixed left-to-right double accumulation, so results are
  * bit-deterministic and engine-comparable.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Mismatched lengths compute over the common prefix — total and
    * identical in interpreted and codegen paths (dimension mismatch
    * is a data bug upstream; a silent null would hide it no better).
    */
  protected def compute(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Java loop body: given array vars `a`, `b` and length var `n`,
    * assign the result to `ev.value`.
    */
  protected def genLoop(a: String, b: String, n: String, result: String): String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |${genLoop(a, b, n, ev.value)}
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ in left-to-right double accumulation. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def genLoop(a: String, b: String, n: String, result: String): String =
    s"""
       |double acc = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  acc += ((double) $a.getFloat(i)) * ((double) $b.getFloat(i));
       |}
       |$result = acc;
     """.stripMargin

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖); 0.0 when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def genLoop(a: String, b: String, n: String, result: String): String =
    s"""
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < $n; i++) {
       |  double x = (double) $a.getFloat(i);
       |  double y = (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$result = (na == 0.0 || nb == 0.0) ? 0.0 : dot / (Math.sqrt(na) * Math.sqrt(nb));
     """.stripMargin

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Euclidean norm via the dot-product kernel. */
  def vecNorm(a: Column): Column = org.apache.spark.sql.functions.sqrt(vecDot(a, a))
}
