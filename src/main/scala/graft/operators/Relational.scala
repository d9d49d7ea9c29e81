package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytical operators over the star schema (SURVEY §2.2).
  *
  * Design rules (100 TB):
  *  - dimension tables are broadcast (explicit `broadcast()` hint so
  *    the plan never degrades to a shuffled join on a small side);
  *  - every aggregate is a single shuffle on its group key with
  *    map-side partial aggregation (free with DataFrame groupBy);
  *  - floating outputs are round(x, 2) so the DuckDB oracle hashes
  *    identically (both engines round to the nearest double of the
  *    same decimal);
  *  - no LIMIT without a total order that includes a unique key.
  */
object Relational {
  import org.apache.spark.sql.types.DecimalType

  /** Money/measure columns are physically doubles holding exact
    * 2-decimal values. Summing them as doubles is order-dependent
    * (parallel partial aggregation), so a rounded result can straddle
    * a rounding boundary differently between runs/engines. Casting to
    * decimal first makes every sum EXACT and therefore identical to
    * the DuckDB oracle bit-for-bit; the final cast back to double is
    * deterministic.
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec6(c: Column): Column = c.cast(DecimalType(18, 6))
  private def sumMoney(c: Column): Column = round(sum(dec2(c)), 2).cast("double")

  /** TPC-H Q1 shape: pricing summary. Filter + pruning push into the
    * parquet scan; one shuffle on the 6-ish distinct flag pairs.
    */
  def q1PricingSummary(lineitem: DataFrame): DataFrame = {
    val revenue = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        round(sum(revenue), 2).cast("double").as("sum_disc_price"),
        round(sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)), 2).as("avg_qty"),
        round(sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  /** Q3 shape: revenue of orders in a market segment. customer is
    * broadcast; orders⋈lineitem shuffles once on the order key; the
    * aggregate reuses that partitioning (no extra exchange).
    */
  def q3JoinAgg(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    orders
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"),
        col("o_orderpriority"))
      .agg(round(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))), 2)
        .cast("double").as("revenue"))
  }

  /** Q5 shape: revenue by nation through a fully-broadcast dimension
    * chain region→nation→customer; only the orders⋈lineitem edge
    * shuffles.
    */
  def q5StarJoin(region: DataFrame, nation: DataFrame, customer: DataFrame,
                 orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    orders
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))), 2)
        .cast("double").as("revenue"))
  }

  /** EXISTS: customers having at least one high-value order.
    * left_semi never multiplies rows and broadcasts the probe side
    * when small.
    */
  def semiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > 100000.0).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** NOT EXISTS: customers with no urgent high-value order (a
    * non-empty anti-join on this data, unlike "no orders at all").
    */
  def antiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > 300000.0).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Top-k orders per customer by price; row_number with a unique-key
    * tiebreak (o_orderkey) keeps the result deterministic for the
    * oracle. One shuffle on o_custkey.
    */
  def topKPerKey(orders: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rk").cast("long").as("rk"))
  }

  /** Running revenue per supplier ordered by ship date. The synthetic
    * data does NOT keep (l_orderkey, l_linenumber) unique, so
    * l_extendedprice joins the sort key: rows that still tie are
    * fully identical and order-insensitive for a prefix sum.
    */
  def runningSum(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_extendedprice").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(dec2(col("l_extendedprice"))).over(w), 2).cast("double").as("running_rev"))
  }

  /** ROLLUP over (returnflag, linestatus): hierarchical totals in one
    * pass (Spark expands grouping sets; still one shuffle).
    */
  def rollupAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** Explicit GROUPING SETS — the shape cube/rollup can't express:
    * exactly the requested groupings (here each single dimension plus
    * the grand total, NOT the cross product). `grouping_id` labels
    * which set each row came from, disambiguating a genuine NULL
    * dimension value from "aggregated over this dimension". Same
    * Expand-based single-pass plan as cube/rollup.
    */
  def groupingSetsAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty[Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  /** Hourly active users (the DAU/WAU shape at hour grain): exact
    * distinct users + event volume per event-time hour. One
    * Expand-based multi-distinct pass, one shuffle on the bucket.
    */
  def hourlyActive(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** Exact distinct count per group. The output stays exact-only so
    * the oracle can hash it; the HLL path you'd run at 100 TB
    * (approx_count_distinct — engine-specific sketch, not
    * oracle-comparable) is accuracy-spec'd in SimilaritySpec.
    */
  def distinctAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))

  /** Time-bucketed event aggregation (batch twin of the streaming
    * window in graft.streaming).
    */
  def eventsWindow(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec6(col("value"))), 2).cast("double").as("total_value"))

  /** Event-time RANGE frame: per user, total value of events in the
    * trailing hour (peers at the same timestamp included — RANGE, not
    * ROWS). One shuffle on user_id.
    */
  def movingHourlyValue(events: DataFrame): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
      .rangeBetween(-hourNs, Window.currentRow)
    events.select(col("user_id"), col("event_id"),
      round(sum(dec6(col("value"))).over(w), 2).cast("double").as("hour_value"))
  }

  /** ROWS-frame moving average (last 4 line items per supplier). */
  def movingAvg(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_extendedprice").asc)
      .rowsBetween(-3, Window.currentRow)
    // No rounding: the decimal sum is exact and decimal→double cast +
    // IEEE division are bit-identical across engines, while rounding a
    // double is NOT (Spark rounds the shortest decimal representation,
    // DuckDB the scaled binary value — they disagree near boundaries).
    lineitem.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      (sum(dec2(col("l_extendedprice"))).over(w).cast("double") /
        count(lit(1)).over(w)).as("avg4"))
  }

  /** Decile + percent_rank of order value within status (unique
    * orderkey tiebreak keeps tied prices deterministic).
    */
  def ntileRank(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.select(col("o_orderstatus"), col("o_orderkey"),
      ntile(10).over(w).cast("long").as("decile"),
      round(percent_rank().over(w), 6).as("pct_rank"))
  }

  /** Deterministic arg-max: the smallest orderkey among the rows
    * achieving the per-status maximum price (a bare max_by/arg_max is
    * nondeterministic under price ties — this formulation is not).
    */
  def argMaxOrder(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
    orders
      .withColumn("max_price", max(col("o_totalprice")).over(w))
      .filter(col("o_totalprice") === col("max_price"))
      .groupBy(col("o_orderstatus"))
      .agg(round(max(col("max_price")), 2).as("max_price"),
        min(col("o_orderkey")).as("argmax_orderkey"))
  }

  /** Latest record per key (SCD "current version wins"): one shuffle
    * on the key, deterministic via unique-id tiebreak. The mutable-
    * table compaction primitive of every incremental pipeline.
    */
  def latestPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    events
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(dec6(col("value")), 2).cast("double").as("value"))
  }

  /** Fixed-width histogram of order totals: bucket index from explicit
    * floor arithmetic (identical IEEE ops in any engine — DuckDB 1.0
    * lacks width_bucket), values clamped into [0, nBuckets-1].
    */
  def histogram(orders: DataFrame, lo: Double = 0.0, hi: Double = 600000.0,
                nBuckets: Int = 20): DataFrame = {
    val width = (hi - lo) / nBuckets
    val bucket = least(greatest(floor((col("o_totalprice") - lo) / width), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("long")
    orders
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
  }

  /** CUBE over (returnflag, linestatus): all 4 grouping sets in one
    * pass/shuffle (Spark expands grouping sets map-side).
    */
  def cubeAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sumMoney(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))

  /** Pivot event counts per user: one shuffle on user_id; the pivot
    * values are declared (never inferred — inference is an extra
    * pass at scale).
    */
  val EventTypes = Seq("click", "view", "purchase", "signup", "error")
  def pivotEvents(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  /** Exact interpolated percentiles of order totals per order status.
    * At 100 TB you'd flip `percentile` to `percentile_approx` (fixed
    *-size sketch, mergeable); the oracle pins the exact variant.
    */
  def percentiles(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
        count(lit(1)).as("n"))

  /** Set operation: BUILDING-segment customers ∩ customers with a
    * high-value order. INTERSECT is a distinct-respecting equality
    * op — Spark plans it as a semi join after aggregation, no row
    * multiplication.
    */
  def setOpsIntersect(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .intersect(orders.filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey").as("c_custkey")))

  /** EXCEPT ALL: per-customer order-event multiset difference — all
    * orders minus the high-value ones, with MULTIPLICITY (a customer
    * with 5 orders of which 2 are high-value keeps 3 rows). The
    * bag semantics a LEFT ANTI join cannot express (anti join drops a
    * key entirely on one match); Spark plans it as a counted
    * aggregate + generate — one shuffle, no row explosion.
    */
  def setOpsExceptAll(orders: DataFrame): DataFrame =
    orders.select(col("o_custkey"))
      .exceptAll(orders.filter(col("o_totalprice") > 200000.0)
        .select(col("o_custkey")))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_regular"))

  /** Two-stage salted aggregation: stage 1 groups on (key, salt) so a
    * hot key's rows spread over `saltBuckets` reducers; stage 2
    * combines the partials. Result is identical to a direct groupBy —
    * the oracle runs the plain GROUP BY. This is the pattern for keys
    * whose row count exceeds one executor's memory/CPU (AQE skew-join
    * handling covers joins; this covers aggregations with huge
    * per-key state, e.g. exact distinct counts).
    */
  def saltedAgg(events: DataFrame, saltBuckets: Int = 16): DataFrame =
    events
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(saltBuckets)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(dec6(col("value"))).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("partial_sum")), 2).cast("double").as("total_value"),
        sum(col("partial_n")).as("n"))

  /** TPC-H Q9-shaped profit rollup over the part/supplier side of the
    * star (the tables the Q3/Q5 shapes don't touch): lineitem ⋈ part
    * ⋈ supplier ⋈ nation, revenue by (nation, brand). The part filter
    * pushes into its scan; supplier→nation broadcast explicitly; the
    * part join is left to the planner — at warehouse scale `part`
    * grows with the fact table (it may exceed any broadcast budget),
    * and AQE picks broadcast vs shuffle from actual runtime sizes.
    */
  def q9ProfitShape(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                    lineitem: DataFrame): DataFrame =
    lineitem
      .join(part.filter(col("p_size") <= 20), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** Typed JSON property extraction + aggregate over the events
    * `props` column. `from_json` with an EXPLICIT schema parses each
    * row exactly once into a typed struct inside codegen — the
    * Spark-first shape for semi-structured columns at scale, vs
    * `get_json_object` which re-parses the string once per extracted
    * field, or schema inference which needs an extra corpus pass.
    * Malformed rows yield nulls (counted separately) instead of
    * failing the job.
    */
  def jsonPropsAgg(events: DataFrame): DataFrame = {
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
      .getField("k")
    events
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        coalesce(sum(col("k")), lit(0L)).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
  }

  /** Time-series gap filling (resample to an hourly grid): per-user
    * hourly counts/totals with every missing hour between the user's
    * first and last activity emitted as an explicit zero row — the
    * densification step rate/trend models need (a silent gap reads as
    * "no data", a zero row as "measured zero").
    *
    * Shape: one (user, hour) aggregate, a per-user span aggregate,
    * then `sequence + explode` builds each user's hour grid and a
    * co-partitioned left join fills it. Output volume is bounded by
    * users × time-horizon hours — independent of event volume, so the
    * explode cannot amplify a 100 TB event table; both joins key on
    * user_id and reuse the same hash partitioning. Exact integer
    * epoch-hour arithmetic (ts ≥ epoch in this schema — see the
    * division-semantics note at the q_retention oracle).
    */
  def gapFillHourly(events: DataFrame, maxUsers: Long = 100L): DataFrame = {
    val hourly = events.filter(col("user_id") < maxUsers)
      .select(col("user_id"), expr("ts_ns div 3600000000000").as("h"), col("value"))
      .groupBy("user_id", "h")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2).cast("double").as("total_value"))
    val grid = hourly.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
  }

  /** Manually salted equi-join — the skew-join pattern for when one
    * key's rows exceed a single reduce task (AQE's skew-join split is
    * the automatic version; this is the explicit one you reach for
    * when the skew is in the JOIN KEY itself and the small side fits
    * a bounded replication factor, or when AQE is off in a stateful
    * job). The big side scatters each row to one of `saltBuckets`
    * sub-keys by a deterministic hash of the whole row; the small
    * side replicates into every bucket; the join runs on (key, salt),
    * so the hot key occupies `saltBuckets` reduce tasks instead of
    * one. Result is row-identical to the plain join — the oracle runs
    * the plain SQL join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltBuckets.toLong)))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    bigSalted.join(smallSalted, Seq(key, "_salt")).drop("_salt")
  }

  /** [[saltedJoin]] driven end-to-end: orders (big, potentially
    * key-skewed) joined to customer segments (small, replicated) and
    * aggregated — row-identical to the plain join+group, which is
    * exactly what the SQL oracle runs.
    */
  def saltedJoinAgg(orders: DataFrame, customer: DataFrame,
                    saltBuckets: Int = 16): DataFrame = {
    val segments = customer.select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    saltedJoin(orders, segments, "o_custkey", saltBuckets)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double")
          .as("total_price"))
  }

  /** Correlated-scalar-subquery shape (order count per customer,
    * including zero) — decorrelated into a left join + aggregate, the
    * plan Catalyst itself rewrites correlated subqueries into.
    */
  def orderCountPerCustomer(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.as("c")
      .join(orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt")).as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"))

  /** Gap-based sessionization via windows: a new session starts when
    * the gap to the previous event of the same user exceeds
    * `gapMinutes`. Pure window plan — DuckDB runs the identical
    * algorithm, and at scale it is one shuffle on user_id (no
    * per-session state held anywhere).
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    // Order and gap on exact epoch-nanos (ts_ns from Tables.events):
    // the µs-truncated timestamp would be lossy and engine-dependent.
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val gapNs = gapMinutes * 60000L * 1000000L
    val prevTs = lag(col("ts_ns"), 1).over(byUser)
    val newSession = when(prevTs.isNull.or(
      col("ts_ns") - prevTs > gapNs), 1).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(dec6(col("value"))), 2).cast("double").as("session_value"))
  }

  /** [[sessionize]]'s interval face: the same gap-split window plan,
    * aggregated to one CLOSED interval [s_start, s_end] (exact epoch
    * nanos of the first/last event) per session — the input shape
    * interval analytics (overlap joins, coverage, utilization) wants.
    * Same single user_id shuffle; nothing new to get wrong.
    */
  def sessionIntervals(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val gapNs = gapMinutes * 60000L * 1000000L
    val prevTs = lag(col("ts_ns"), 1).over(byUser)
    val newSession = when(prevTs.isNull.or(
      col("ts_ns") - prevTs > gapNs), 1).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_id", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ns")).as("s_start"), max(col("ts_ns")).as("s_end"))
  }

  /** Snapshot reconciliation: diff two versions of a keyed table into
    * added / removed / changed / unchanged counts — the audit every
    * daily-rebuild pipeline runs before promoting a snapshot. ONE
    * full outer join on the key comparing md5 content hashes; counts
    * aggregate map-side. At 100 TB both sides shuffle once on the
    * key — there is no cheaper exact diff — and the md5 compare means
    * "changed" needs no column-by-column logic.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   payloadCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol).as("k"), md5(col(payloadCol)).as("oh"))
    val n = newDf.select(col(keyCol).as("k"), md5(col(payloadCol)).as("nh"))
    o.join(n, Seq("k"), "full_outer")
      .select(
        when(col("oh").isNull, "added")
          .when(col("nh").isNull, "removed")
          .when(col("oh") =!= col("nh"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
  }

  /** Referential-integrity audit over the star schema: orphan counts
    * per declared foreign key (fact rows whose dimension key has no
    * parent). Each relation is one LEFT ANTI join — broadcastable
    * when the parent key set fits, shuffled otherwise — plus a total;
    * the number a warehouse checks before trusting any join result.
    */
  def fkAudit(lineitem: DataFrame, orders: DataFrame,
              customer: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    def audit(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"))
    }
    audit("lineitem.l_orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey")
      .unionByName(
        audit("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"))
  }

  /** Hopping (sliding) window aggregation — overlapping 2-hour
    * windows every hour via `window(ts, duration, slide)`: Catalyst
    * plans the window-assignment Expand (each event lands in
    * duration/slide = 2 windows), then ONE shuffle on
    * (window, event_type) with map-side partials — never a self-join
    * of shifted copies. The overlap factor bounds the blowup (2×
    * rows into the aggregate), which is the knob a 100 TB deployment
    * sizes. Epoch-aligned window starts emitted as µs.
    */
  def hoppingWindow(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(dec6(col("value"))), 2).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap sessionization via Spark's NATIVE session windows — the
    * declarative twin of [[sessionize]]'s window-flag form: one
    * `session_window` grouping, and Catalyst plans the whole
    * merge-sessions pass (MergingSessionsExec — one shuffle on
    * user_id, sessions merged in a single sorted sweep, no window
    * function over each user's full event list). The same construct
    * is the streaming session aggregation (watermark + append mode),
    * which the spec drives separately; batch keeps the oracle
    * hash-exact.
    *
    * Boundary semantics (spec-pinned at the µs knife edge and
    * mirrored in the oracle): windows [ts, ts+gap] merge
    * INCLUSIVELY, so two events exactly `gap` apart share a session
    * — the same convention as [[sessionize]]'s `diff > gap` split
    * test, just on µs values (TimestampType's resolution) instead of
    * nanos. session_end = last event + gap.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(dec6(col("value"))), 2).cast("double").as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("session_value"))

  /** Type-2 slowly-changing dimension build from a change log — the
    * warehouse dimension-maintenance operator: per user, consecutive
    * runs of the same observed state (event_type here) collapse into
    * [valid_from, valid_to) intervals; the current (last) run's
    * valid_to is encoded as Long.MaxValue (NULL-free for the hash
    * gate). Two windows over ONE shuffle on user_id (lag → run flag →
    * prefix-sum run id; AQE reuses the partitioning for the lead),
    * then a co-partitioned group-by — never a per-user collect.
    * All-integer micros → hash-exact (µs, not ns: DuckDB truncates a
    * TIMESTAMP(NANOS) parquet column to its native µs on read, so an
    * ns-valued oracle column cannot reproduce; ordering ties at equal
    * µs break by event_id in BOTH engines).
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val tus = expr("ts_ns div 1000")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(tus.asc, col("event_id").asc)
    val prev = lag(col("event_type"), 1).over(byUser)
    val runs = events
      .withColumn("new_run",
        when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
      .withColumn("run_id", sum(col("new_run")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id").asc)
    runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("state"), // constant within a run
        min(tus).as("valid_from_us"),
        count(lit(1)).as("n_obs"))
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(byRun), lit(Long.MaxValue)))
      .select(col("user_id"), col("run_id"), col("state"),
        col("valid_from_us"), col("valid_to_us"), col("n_obs"))
  }

  /** Ordered funnel (view → click → purchase): per user, the stage
    * reached with strict event-time ordering — a click only counts
    * AFTER the first view, a purchase only after that first qualifying
    * click. Three conditional-min aggregates chained by joins, ALL
    * keyed on user_id: after the first shuffle every later join/agg is
    * co-partitioned, so at 100 TB this is one wide shuffle plus
    * narrow stages (AQE reuses the partitioning), never a window over
    * each user's full event list. Exact epoch-nanos comparisons keep
    * the oracle bit-exact.
    */
  def funnel(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"), col("ts_ns"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t_view"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_ns") > col("t_view"))
      .groupBy("user_id").agg(min("ts_ns").as("t_click"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_ns") > col("t_click"))
      .groupBy("user_id").agg(min("ts_ns").as("t_purchase"))
    e.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0).cast("long").as("stage"))
  }

  /** Cohort retention at hour grain: cohort = a user's first active
    * hour; for offsets 0..maxOffsetHours, how many of that cohort were
    * active again offset hours later. The (user, hour) activity set is
    * deduplicated FIRST (bounding everything downstream by active
    * user-hours, not raw event volume), then one agg + one
    * co-partitioned join on user_id. Hours are exact integer
    * epoch-hour divisions — no timezone or float hazards.
    */
  def retention(events: DataFrame, maxOffsetHours: Int = 3): DataFrame = {
    val uh = events
      .select(col("user_id"), expr("ts_ns div 3600000000000").as("h"))
      .distinct()
    val f = uh.groupBy("user_id").agg(min("h").as("h0"))
    uh.join(f, "user_id")
      .filter(col("h") - col("h0") <= maxOffsetHours)
      .groupBy(col("h0").as("cohort_hour"), (col("h") - col("h0")).as("offset_h"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Table profiling (the ANALYZE-stats shape that feeds a cost-based
    * optimizer and any data-quality dashboard): per column, row count,
    * non-null count, and EXACT distinct count, in ONE aggregation
    * pass — Spark plans multi-distinct aggregates via Expand (each
    * input row fans out once per distinct column, partial-aggregated
    * map-side), so the table is scanned once regardless of how many
    * columns are profiled, not once per column. The wide stats row is
    * unpivoted with a LAZY explode-of-structs (O(columns) rows), so
    * the whole profile stays one deferred plan — nothing executes at
    * construction time.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col("n_rows"),
          col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.column_name"), col("p.n_rows"),
        col("p.n_nonnull"), col("p.n_distinct"))
  }

  /** Join-key skew profile: the pre-flight diagnostic you run BEFORE
    * pointing a 100 TB join/aggregation at a key — the heaviest keys
    * and their parts-per-million share decide whether the plain
    * shuffle is safe, or [[saltedJoin]]/[[saltedAgg]]/AQE skew
    * handling is required (a key at 50000+ ppm of a 100 TB table is a
    * 5 TB reduce task — a guaranteed straggler or OOM).
    *
    * One map-side-combined count per key + TakeOrderedAndProject
    * top-k: the profile costs one bounded shuffle, never a sort of
    * the key space. All-integer output (ppm = n·10⁶ div total; ranks
    * tie-broken by key) so the oracle hash-matches. Positive counts
    * only, so Spark `div` ≡ DuckDB `//` here (both truncate toward
    * zero on non-negatives — same caveat note as q_retention).
    */
  /** Event-type transition matrix (first-order Markov counts): for
    * every user, order events by (event time, id) and count each
    * consecutive (from_type → to_type) step. The sequence-analytics
    * primitive behind "what do users do after X" — output is
    * |types|² rows however large the event log.
    *
    * One window shuffle on user_id (each partition sorts its own
    * users' events — never a global sort) + one map-side-combined
    * aggregate on the tiny type-pair key. The unique (ts_ns,
    * event_id) order key makes every lag deterministic, so the
    * counts are oracle-exact.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
    events.select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  def skewProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("total"))
    val top = counts.orderBy(col("n").desc, col("key").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key").asc)
    top.crossJoin(total)
      .withColumn("ppm", expr("n * 1000000 div total"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("key"), col("n"), col("ppm"))
  }

  /** Interval-union coverage per key (the `q_interval_coverage`
    * entry) — the sweep-line / gaps-and-islands primitive behind
    * utilization, SLA-coverage, and on-call-overlap reads: merge
    * each key's (possibly overlapping) closed integer intervals
    * into maximal islands (adjacent intervals — gap 0 — merge too)
    * and report interval/island counts, total covered length, the
    * key's span, and utilization in integer ppm.
    *
    * Intervals derive deterministically from the fixture: per
    * lineitem, [shipdate, shipdate + 1 + (quantity mod 14)] in days
    * since 1992-01-01 — a part's "shipping activity windows".
    *
    * Shape: two windows over ONE (key, start, end) sort — running
    * max-end (excluding current) flags island starts, a running sum
    * numbers them — then two grouped aggregates. One shuffle on the
    * key; ties in the sort are fully identical rows, so every window
    * value is order-insensitive (the §3 determinism rule).
    */
  def intervalCoverage(lineitem: DataFrame): DataFrame =
    coverageSummary(sweepIslands(
      intervalFixture(lineitem).withColumn("wt", lit(1L))))

  /** The deterministic per-lineitem interval fixture (see
    * [[intervalCoverage]]): (k, s, e) in days since 1992-01-01. */
  def intervalFixture(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_partkey").as("k"),
      datediff(col("l_shipdate"), to_date(lit("1992-01-01"))).cast("long").as("s"),
      (datediff(col("l_shipdate"), to_date(lit("1992-01-01"))).cast("long")
        + 1L + pmod(col("l_quantity").cast("long"), lit(14L))).as("e"))

  /** The weighted sweep: merge (k, s, e, wt) intervals into maximal
    * islands (k, i_s, i_e, n) where n sums the weights. With wt = 1
    * this is exactly the batch coverage sweep; the streamed face
    * feeds it stored islands carrying their interval counts as
    * weights — islands(A ∪ B) = islands(islands(A) ∪ B) because
    * interval union is associative, and the weight sums keep
    * n_intervals exact across re-sweeps.
    */
  def sweepIslands(iv: DataFrame): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(
      ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val flagged = iv
      .withColumn("prev_max", prevMax)
      .withColumn("ni",
        when(col("prev_max").isNull || col("s") > col("prev_max") + 1L, 1L)
          .otherwise(0L))
    val islands = flagged.withColumn("island", sum(col("ni")).over(
      ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    islands.groupBy("k", "island")
      .agg(min(col("s")).as("i_s"), max(col("e")).as("i_e"),
        sum(col("wt")).as("n"))
      .select("k", "i_s", "i_e", "n")
  }

  /** Roll merged islands up to the per-key coverage summary — the
    * `q_interval_coverage` output shape, shared by the streamed
    * resolve face. */
  def coverageSummary(perIsland: DataFrame): DataFrame =
    perIsland.groupBy("k").agg(
        sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_e") - col("i_s") + 1L).as("covered_days"),
        (max(col("i_e")) - min(col("i_s")) + 1L).as("span_days"))
      .withColumn("utilization_ppm",
        expr("covered_days * 1000000 div span_days"))
      .select(col("k").as("part_id"), col("n_intervals"), col("n_islands"),
        col("covered_days"), col("span_days"), col("utilization_ppm"))
}
