package org.apache.spark.sql.grafttopk

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One buffered (score, id) candidate; null fields mirror SQL NULLs. */
private[grafttopk] final case class TopKEntry(score: java.lang.Double, id: java.lang.Long)

/** Exact mirror of the window ordering the rewrite replaces:
  * (score DESC NULLS LAST, id ASC NULLS FIRST), NaN greatest as in
  * Spark's double ordering.
  */
private[grafttopk] object TopKOrdering extends Ordering[TopKEntry] {
  override def compare(a: TopKEntry, b: TopKEntry): Int = {
    val s =
      if (a.score == null && b.score == null) 0
      else if (a.score == null) 1
      else if (b.score == null) -1
      else java.lang.Double.compare(b.score, a.score)
    if (s != 0) s
    else {
      if (a.id == null && b.id == null) 0
      else if (a.id == null) -1
      else if (b.id == null) 1
      else java.lang.Long.compare(a.id, b.id)
    }
  }
}

/** k-bounded top-k aggregate over (score: double, id: long) with the
  * ordering (score DESC NULLS LAST, id ASC NULLS FIRST) — the
  * aggregation-shaped replacement for
  * `row_number().over(partitionBy k orderBy score desc, id) <= k`.
  *
  * Buffer is loosely bounded (trim at 4k) so update is amortized O(1);
  * serialize trims to exactly k, so the shuffle carries k-bounded
  * byte buffers per (partition, key) — never a group's full row set,
  * and no per-partition sort. Result is the sorted top-k as an array
  * of (score, id) structs; [[RewriteRowNumberTopK]] reconstructs the
  * original output columns (and the rank, as explode position + 1)
  * from it.
  */
case class BoundedRowNumberTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[TopKEntry]] with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): ArrayBuffer[TopKEntry] = ArrayBuffer.empty

  private def trim(buf: ArrayBuffer[TopKEntry]): ArrayBuffer[TopKEntry] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(TopKOrdering).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[TopKEntry], input: InternalRow): ArrayBuffer[TopKEntry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    buf += TopKEntry(
      if (s == null) null else java.lang.Double.valueOf(s.asInstanceOf[Double]),
      if (i == null) null else java.lang.Long.valueOf(i.asInstanceOf[Long]))
    if (buf.length > 4 * k) trim(buf) else buf
  }

  override def merge(a: ArrayBuffer[TopKEntry], b: ArrayBuffer[TopKEntry]): ArrayBuffer[TopKEntry] =
    trim(a ++= b)

  override def eval(buf: ArrayBuffer[TopKEntry]): Any = {
    val top = buf.sorted(TopKOrdering).take(k)
    new GenericArrayData(top.map(e => InternalRow(e.score, e.id): Any).toArray)
  }

  override def serialize(buf: ArrayBuffer[TopKEntry]): Array[Byte] = {
    val kept = trim(buf)
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(kept.length)
    kept.foreach { e =>
      out.writeBoolean(e.score != null)
      if (e.score != null) out.writeDouble(e.score)
      out.writeBoolean(e.id != null)
      if (e.id != null) out.writeLong(e.id)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[TopKEntry] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[TopKEntry](n)
    var i = 0
    while (i < n) {
      val s: java.lang.Double = if (in.readBoolean()) java.lang.Double.valueOf(in.readDouble()) else null
      val d: java.lang.Long = if (in.readBoolean()) java.lang.Long.valueOf(in.readLong()) else null
      buf += TopKEntry(s, d)
      i += 1
    }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_bounded_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedRowNumberTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedRowNumberTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedRowNumberTopK =
    copy(score = newLeft, id = newRight)
}

/** Optimizer rule (extension tier: `injectOptimizerRule`) rewriting
  *
  * {{{ Filter(row_number().over(partitionBy p… orderBy s DESC, i ASC) <= k, Window(…, child)) }}}
  *
  * into `Aggregate(p…, bounded_topk(s, i, k)) → PosExplode → Project`.
  *
  * Why: the window plan shuffles EVERY row of every group and sorts
  * each partition before the group limit drops rows (Spark's
  * InferWindowGroupLimit bounds the shuffle to k per partition-key
  * but still sorts); the aggregate form shuffles k-bounded buffers
  * and never sorts a partition — the difference between O(n log n)
  * per partition and O(n) at a 10⁹-row group.
  *
  * Fires only when the rewrite is provably equivalent:
  *  - single window expression = row_number() over the default frame;
  *  - ordering is exactly (double DESC NULLS LAST, long ASC NULLS
  *    FIRST) on bare columns — the deterministic-tiebreak shape every
  *    graft top-k query uses (null ordering mirrored exactly by
  *    [[TopKOrdering]]);
  *  - partition keys are bare columns;
  *  - every child output column is a partition key, the score, or the
  *    id — i.e. the full row is reconstructible from the buffer (true
  *    after column pruning whenever downstream only consumes those);
  *  - the filter is a simple rank bound `rn <= k` (or `<`, reversed,
  *    or `rn == 1`) with k ≤ spark.graft.topk.rewrite.maxK (default
  *    1024; beyond that buffer trims cost more than the sort saves).
  */
case class RewriteRowNumberTopK(spark: SparkSession) extends Rule[LogicalPlan] {

  private def maxK: Int =
    spark.conf.getOption("spark.graft.topk.rewrite.maxK").map(_.toInt).getOrElse(1024)

  private def limitFromCond(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (w.windowExpressions, w.orderSpec) match {
        case (Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            Seq(SortOrder(scoreAttr: AttributeReference, Descending, NullsLast, _),
                SortOrder(idAttr: AttributeReference, Ascending, NullsFirst, _)))
            if scoreAttr.dataType == DoubleType && idAttr.dataType == LongType &&
              w.partitionSpec.forall(_.isInstanceOf[AttributeReference]) =>
          val rnAttr = alias.toAttribute
          val partAttrs = w.partitionSpec.map(_.asInstanceOf[AttributeReference])
          // InferWindowGroupLimit (an earlier batch) may have inserted a
          // sort-based group limit below this window; the aggregate
          // subsumes it, so strip it — keeping it would re-introduce the
          // per-partition sort the rewrite exists to remove.
          val aggChild = w.child match {
            case wgl: WindowGroupLimit if wgl.rankLikeFunction.isInstanceOf[RowNumber] =>
              wgl.child
            case c => c
          }
          val reconstructible = aggChild.output.forall(a =>
            partAttrs.exists(_.semanticEquals(a)) ||
              a.semanticEquals(scoreAttr) || a.semanticEquals(idAttr))
          limitFromCond(cond, rnAttr) match {
            case Some(k) if k >= 1 && k <= maxK && reconstructible =>
              rewrite(aggChild, partAttrs, scoreAttr, idAttr, rnAttr, k)
            case _ => f
          }
        case _ => f
      }
  }

  private def rewrite(child: LogicalPlan, partAttrs: Seq[AttributeReference],
                      scoreAttr: AttributeReference, idAttr: AttributeReference,
                      rnAttr: Attribute, k: Int): LogicalPlan = {
    val topkAlias = Alias(
      BoundedRowNumberTopK(scoreAttr, idAttr, k).toAggregateExpression(), "graft_topk_buf")()
    val agg = Aggregate(partAttrs, (partAttrs: Seq[NamedExpression]) :+ topkAlias, child)
    val topkAttr = topkAlias.toAttribute
    val entryType = StructType(Seq(StructField("score", DoubleType), StructField("id", LongType)))
    val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val entryAttr = AttributeReference("graft_entry", entryType, nullable = false)()
    val gen = Generate(PosExplode(topkAttr),
      unrequiredChildIndex = Seq(partAttrs.length), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, entryAttr), agg)
    // Output must carry the SAME attributes (name, type, exprId) as the
    // replaced Filter: child.output ++ [rn].
    val projList: Seq[NamedExpression] = (child.output :+ rnAttr).map { a =>
      if (a.semanticEquals(rnAttr))
        Alias(Add(posAttr, Literal(1)), a.name)(exprId = a.exprId)
      else if (partAttrs.exists(_.semanticEquals(a)))
        a
      else if (a.semanticEquals(scoreAttr))
        Alias(GetStructField(entryAttr, 0, Some("score")), a.name)(exprId = a.exprId)
      else
        Alias(GetStructField(entryAttr, 1, Some("id")), a.name)(exprId = a.exprId)
    }
    Project(projList, gen)
  }
}

object RewriteRowNumberTopK {
  /** Imperative twin of the `injectOptimizerRule` deployment for live
    * sessions (idempotent), mirroring AsofJoinNative.register.
    */
  def register(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations.exists {
      case RewriteRowNumberTopK(_) => true
      case _ => false
    }
    if (!already) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRowNumberTopK(spark)
    }
  }

  def unregister(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot {
        case RewriteRowNumberTopK(_) => true
        case _ => false
      }
}
