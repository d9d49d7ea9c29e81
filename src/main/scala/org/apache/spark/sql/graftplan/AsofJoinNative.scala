package org.apache.spark.sql.graftplan

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native as-of join: custom LogicalPlan + Strategy + SparkPlan (the
  * survey's extension tier (c)), the whole-operator alternative to
  * the compositional `graft.plans.TemporalJoins.asofJoin`.
  *
  * Physical contract: both children hash-cluster on the key and sort
  * by (key, time) — declared via requiredChildDistribution/Ordering,
  * so EnsureRequirements inserts exactly one exchange + sort per
  * side and AQE still manages them. Each co-partition pair then
  * merges in one streaming pass: for every left row, the latest
  * right row of the same key with time ≤ left time (`<=` semantics,
  * matching DuckDB ASOF LEFT JOIN; (key, time) ties resolved to the
  * max `tieCol` row, matching the compositional asofJoin). State is
  * ONE buffered right row —
  * against the window-based composition this trades a second
  * sort-of-union for never materializing both sides in one frame.
  *
  * Keys and times are LongType (the engine's epoch-nanos
  * convention); payload columns must be attributes of the right side.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {
  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join keys/times must be LongType")
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, payload) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTie: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // The tie column in the right-side ordering makes the merge
  // deterministic under (key, time) duplicates: "keep the last row
  // consumed" then always lands on the max-tie row, independent of
  // partitioning — same contract as the compositional asofJoin's
  // tieCol. Without it the surviving payload depends on shuffle order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyOrd >= 0 && lTimeOrd >= 0 && rKeyOrd >= 0 && rTimeOrd >= 0)
    // right side must bind as nullable: unmatched left rows project a
    // null row, and a non-nullable binding would read raw zeros
    val joinedSchema = left.output ++ right.output.map(_.withNullability(true))
    val projectExprs: Seq[Attribute] = output
    val rightWidth = right.output.length
    // bind once on the driver; UnsafeProjection.create re-binds per
    // partition below (closures must be serializable-cheap)
    val leftOutput = left.output
    val rightOutput = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(projectExprs, joinedSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey: Long = 0L
      var haveMatchForKey = false

      lIter.map { lRow =>
        val k = lRow.getLong(lKeyOrd)
        val t = lRow.getLong(lTimeOrd)
        if (!haveMatchForKey || lastMatchKey != k) {
          lastMatch = null
          lastMatchKey = k
          haveMatchForKey = true
        }
        // drop right rows for keys already passed
        while (rBuf.hasNext && rBuf.head.getLong(rKeyOrd) < k) rBuf.next()
        // consume right rows of this key up to time t; keep the last
        while (rBuf.hasNext && rBuf.head.getLong(rKeyOrd) == k &&
          rBuf.head.getLong(rTimeOrd) <= t) {
          lastMatch = rBuf.next().copy()
        }
        val r = if (lastMatch != null && lastMatch.getLong(rKeyOrd) == k) lastMatch else nullRight
        proj(joined(lRow, r))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Builder API: constructs the logical node from analyzed child
  * plans, re-aliasing the right side so self-joins (both sides from
  * the same source) never share expression ids.
  */
object AsofJoinNative {

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right so self-joins stay unambiguous
    val rAliased = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    val rOutput = rAliased.projectList.map(_.toAttribute)
    def lAttr(n: String): Attribute = lPlan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"left column $n not found"))
    def rAttr(n: String): Attribute = rOutput.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"right column $n not found"))
    val node = AsofJoinPlan(lPlan, rAliased,
      lAttr(keyCol), rAttr(keyCol), lAttr(timeCol), rAttr(timeCol), rAttr(tieCol),
      payloadCols.map(rAttr))
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
