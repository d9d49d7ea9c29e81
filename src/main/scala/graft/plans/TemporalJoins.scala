package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-operator temporal joins Spark lacks natively (SURVEY §2.9).
  *
  * Both are built by COMPOSING existing operators (the survey's
  * preference (a)): Spark would execute a naive `a.ts >= b.ts`
  * inequality join as a broadcast-nested-loop — O(|A|·|B|) — so the
  * composition below is not a convenience, it IS the scale design:
  *
  *  - as-of join: union both sides, one sort-within-partition per
  *    user, carry the latest right-side row forward with
  *    `last(ignoreNulls)` — one shuffle on the key, zero row
  *    multiplication, any skew handled like any window;
  *  - range join: bin time into fixed buckets, equi-join on
  *    (key, bin) with each left interval exploded to the bins it
  *    covers, then exact filter — the inequality never reaches the
  *    join operator.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single latest right row of
    * the same `keyCol` with `right.timeCol <= left.timeCol` (DuckDB
    * `ASOF LEFT JOIN` semantics; ties on time resolved to the
    * larger `tieCol` — the last row in (time, tie) order).
    *
    * Columns `rightCols` from the matched right row are appended
    * (null when no match).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               tieCol: String, rightCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", col(tieCol))
    // Right carries its payload as ONE struct (non-null whenever a
    // right row exists, even if every field is null), so the carry
    // below can never mix fields from different right rows the way a
    // per-column last(ignoreNulls) would when a payload value is null.
    // Selecting only key/time/tie+struct also keeps unionByName from
    // aliasing an unrelated same-named column.
    val rightTagged = right
      .select(col(keyCol), col(timeCol), lit(0).as("_side"), col(tieCol).as("_tie"),
        struct(rightCols.map(col): _*).as("_r_payload"))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // Right rows sort BEFORE left rows at the same timestamp, so a
    // right row with ts == left ts is visible to it (<= semantics).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_r_payload"), ignoreNulls = true).over(w))
    val out = carried.filter(col("_side") === 1)
    rightCols.foldLeft(out) { (df, c) =>
      df.withColumn(c, col(s"_asof.$c"))
    }.select(left.columns.map(col) ++ rightCols.map(col): _*)
  }

  /** FORWARD as-of join (pandas `merge_asof(direction='forward')`):
    * the EARLIEST right row at-or-after each left time, per key.
    * Pure delegation — negating the time column turns "latest ≤ t"
    * into "earliest ≥ t" while reusing [[asofJoin]]'s one-shuffle
    * window-carry plan and its inclusive-at-equality convention
    * unchanged; the output time is negated back. Same plan shape,
    * same determinism rule, zero new machinery to verify.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      timeCol: String, tieCol: String,
                      rightCols: Seq[String]): DataFrame =
    asofJoin(
      left.withColumn(timeCol, -col(timeCol)),
      right.withColumn(timeCol, -col(timeCol)),
      keyCol, timeCol, tieCol, rightCols)
      .withColumn(timeCol, -col(timeCol))

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`):
    * for every left row, the right row of the same key MINIMIZING
    * |right.time − left.time|, equal distances resolved BACKWARD
    * (pandas' rule), and ties at the chosen timestamp resolved to the
    * larger `tieCol` exactly like [[asofJoin]]. Null payload only
    * when the key has no right rows at all — nearest always matches
    * otherwise.
    *
    * Compositional: one backward carry + one forward carry (each the
    * [[asofJoin]] one-shuffle window plan) with the right time
    * carried alongside each payload, then a pure per-row arbitration
    * projection — two shuffles total, both on `keyCol`, no
    * inequality join anywhere.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
                      timeCol: String, tieCol: String,
                      rightCols: Seq[String]): DataFrame = {
    require(!rightCols.contains(timeCol) && !rightCols.contains(tieCol),
      "rightCols must not shadow the time/tie columns")
    val bSuf = "_nb"
    val fSuf = "_nf"
    def renamed(suf: String) = rightCols.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, c + suf)
    }
    val bt = "_asof_bt"
    val ft = "_asof_ft"
    val back = asofJoin(left, renamed(bSuf).withColumn(bt, col(timeCol)),
      keyCol, timeCol, tieCol, rightCols.map(_ + bSuf) :+ bt)
    val both = asofJoinForward(back, renamed(fSuf).withColumn(ft, col(timeCol)),
      keyCol, timeCol, tieCol, rightCols.map(_ + fSuf) :+ ft)
    val backWins = col(bt).isNotNull &&
      (col(ft).isNull ||
        (col(timeCol) - col(bt)) <= (col(ft) - col(timeCol)))
    rightCols.foldLeft(both) { (df, c) =>
      df.withColumn(c, when(backWins, col(c + bSuf)).otherwise(col(c + fSuf)))
    }.select(left.columns.map(col) ++ rightCols.map(col): _*)
  }

  /** As-of join with a TOLERANCE (pandas `merge_asof(tolerance=...)`
    * semantics): the carried match survives only when it lies within
    * `tolerance` of the left row's time; an out-of-tolerance match
    * nulls the payload rather than falling back to an older right row
    * — correctly so, because as-of carries the LATEST right row ≤ t,
    * and if that one is already too old every earlier one is older
    * still. Implemented as [[asofJoin]] carrying the right time
    * alongside the payload, then one mask projection — the tolerance
    * adds zero shuffles to the compositional plan.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, keyCol: String,
                        timeCol: String, tieCol: String,
                        rightCols: Seq[String], tolerance: Long): DataFrame = {
    val rtCol = "_asof_rt"
    val joined = asofJoin(left, right.withColumn(rtCol, col(timeCol)),
      keyCol, timeCol, tieCol, rightCols :+ rtCol)
    val inTol = col(rtCol).isNotNull &&
      (col(timeCol) - col(rtCol)) <= lit(tolerance)
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(inTol, col(c)))
    }.drop(rtCol)
  }

  /** Range join: all (left, right) pairs of the same `keyCol` with
    * `right.timeCol` in `[left.timeCol - before, left.timeCol +
    * after]`. Implemented as a binned equi-join: left intervals
    * explode to the bins they span (bounded by interval/binWidth),
    * right rows land in one bin, the exact predicate filters after
    * the hash join.
    */
  /** Interval×interval overlap join over CLOSED integer intervals:
    * every (left, right) pair with `l.start <= r.end AND
    * r.start <= l.end`. Spark would plan the raw inequality as a
    * BroadcastNestedLoopJoin — O(|L|·|R|) — so, like [[rangeJoin]],
    * the intervals are binned and the join is an equi-join on the
    * bin: BOTH sides explode to every fixed-width bin they cover
    * (bounded by interval_length/binWidth + 1 replicas per row).
    *
    * An overlapping pair shares every bin their intersection covers,
    * so a plain binned join would emit it once PER shared bin. The
    * dedup is free, not a `distinct`: the pair is emitted only in the
    * bin containing `max(l.start, r.start)` — a bin both intervals
    * cover whenever they overlap (it lies inside the intersection),
    * and exactly one bin — so each overlapping pair survives the
    * filter exactly once.
    *
    * All bin arithmetic is 64-bit integer `div`, never
    * `floor(x / w)`: epoch-nanos exceed 2^53, and a double division
    * could assign the two sides of a pair to different bins, silently
    * dropping or double-emitting it. Starts/ends must therefore be
    * non-negative (integer `div` truncates toward zero; the operators
    * feeding this pass epoch nanos, which are positive).
    *
    * Both inputs must expose `startCol`/`endCol` under those names;
    * `rightProject` columns come back prefixed `r_`.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          startCol: String, endCol: String, binWidth: Long,
                          leftProject: Seq[String],
                          rightProject: Seq[String]): DataFrame = {
    require(binWidth > 0)
    def binned(df: DataFrame): DataFrame =
      df.withColumn("_bin", explode(sequence(
        expr(s"$startCol div ${binWidth}L"), expr(s"$endCol div ${binWidth}L"))))
    val l = binned(left).alias("l")
    val r = binned(right).alias("r")
    val ls = col(s"l.$startCol"); val le = col(s"l.$endCol")
    val rs = col(s"r.$startCol"); val re = col(s"r.$endCol")
    l.join(r,
        col("l._bin") === col("r._bin") &&
          ls <= re && rs <= le &&
          col("l._bin") === expr(s"greatest(l.$startCol, r.$startCol) div ${binWidth}L"))
      .select(leftProject.map(c => col(s"l.$c")) ++
        rightProject.map(c => col(s"r.$c").as(s"r_$c")): _*)
  }

  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
                before: Long, after: Long, binWidth: Long,
                leftProject: Seq[String], rightProject: Seq[String]): DataFrame = {
    require(binWidth > 0)
    val lo = col(s"l.$timeCol") - before
    val hi = col(s"l.$timeCol") + after
    val binned = left.alias("l")
      .withColumn("_bin", explode(sequence(
        floor((col(s"l.$timeCol") - before) / binWidth),
        floor((col(s"l.$timeCol") + after) / binWidth))))
    val rightBinned = right.alias("r")
      .withColumn("_bin", floor(col(s"r.$timeCol") / binWidth))
    binned
      .join(rightBinned,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          binned("_bin") === rightBinned("_bin") &&
          col(s"r.$timeCol") >= lo && col(s"r.$timeCol") <= hi)
      .select(leftProject.map(c => col(s"l.$c")) ++
        rightProject.map(c => col(s"r.$c").as(s"r_$c")): _*)
  }
}
