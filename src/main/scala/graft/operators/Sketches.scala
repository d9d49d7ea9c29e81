package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch / synopsis operators (SURVEY §2.10): bounded-memory
  * summaries that replace a full shuffle with a small mergeable
  * state — the difference between "works at sf0.1" and "works at
  * 100 TB" for frequency, membership, and cardinality questions.
  *
  * Reference scope note: the reference's wordcount/top-k plugins
  * (plugin/word_count/wc.go) answer these questions by full
  * aggregation; these operators answer the same questions with
  * bounded state, which is the form a 1000-executor deployment needs.
  */
object Sketches {

  /** Exact top-k most frequent words via the two-pass heavy-hitters
    * pattern:
    *
    * Pass 1 — [[graft.functions.MisraGriesAggregator]] summarizes the
    * token stream into ≤ `capacity` candidate words with O(capacity)
    * memory per task and a single tiny combine (no shuffle of the
    * vocabulary). Any word with frequency > N/(capacity+1) is
    * guaranteed to survive.
    *
    * Pass 2 — only rows matching a candidate (an `InSet` evaluated in
    * the scan stage) reach an exact count; the top-k under the total
    * order (cnt DESC, word ASC) is then exact whenever the k-th
    * frequency clears the MG threshold — true for any Zipf-shaped
    * corpus with sane capacity (spec-verified superset property, and
    * the oracle pins exactness on the test corpora).
    *
    * vs `wordCount().orderBy().limit(k)`: that plan shuffles every
    * distinct token; at a 10M-term vocabulary the two-pass form
    * shuffles `capacity` strings and then counts ~k hot terms.
    * Tokenization matches [[TextOps.tokens]] so the oracle shares
    * `mr_wordcount`'s CTE.
    */
  def heavyHitters(documents: DataFrame, k: Int, capacity: Int = 512,
                   strict: Boolean = true): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val words = TextOps.tokens(documents).select(col("word")).as[String]
    // one pass-1 job yields the MG candidates AND the stream length N
    // (needed by the exactness guard below)
    val mgUdaf = udaf(new graft.functions.MisraGriesAggregator(capacity),
      org.apache.spark.sql.Encoders.STRING)
    val pass1 = words.toDF("word")
      .agg(mgUdaf(col("word")).as("cands"), count(lit(1)).as("n")).head()
    val candidates: Seq[String] = pass1.getSeq[String](0)
    val n: Long = pass1.getLong(1)
    // pass 2: exact counts for the ≤capacity candidates (bounded
    // driver round-trip, like the candidate list itself)
    val counts = words.toDF("word")
      .filter(col("word").isin(candidates: _*))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val top = counts.sortBy(r => (-r.getLong(1), r.getString(0))).take(k)
    // Exactness guard: the MG survival bound only promises the sketch
    // kept every item with frequency > N/(capacity+1). The top-k is
    // provably exact iff (a) the candidates cover every token (the
    // sketch never evicted, so these ARE the full exact counts), or
    // (b) k candidates exist and the k-th count clears the bound (no
    // evicted item can out-rank it). Otherwise a true top-k item may
    // be missing — say so loudly instead of answering quietly (a
    // flatter-than-Zipf distribution at another scale would otherwise
    // pass unnoticed).
    val bound = n / (capacity + 1L)
    val fullCoverage = counts.iterator.map(_.getLong(1)).sum == n
    val kthClears = top.length == k && top.last.getLong(1) > bound
    if (!fullCoverage && !kthClears) {
      val kth = if (top.isEmpty) 0L else top.last.getLong(1)
      val msg = s"heavyHitters(k=$k, capacity=$capacity) is not provably exact: " +
        s"k-th count $kth <= N/(capacity+1) = $bound over N=$n tokens and candidates " +
        "do not cover the stream; raise capacity or treat the result as approximate"
      if (strict) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Bloom-pruned semi join + aggregate: lineitem rows of high-value
    * orders, with non-matching fact rows killed in the scan stage by
    * a bloom filter built over the filtered dim keys
    * ([[org.apache.spark.sql.graftfilter.BloomPrune]]).
    *
    * The exact left-semi join after the probe removes bloom false
    * positives, so the result is IDENTICAL to the plain semi join —
    * the bloom only changes how many fact rows pay the shuffle
    * (~4% of lineitem at the default cut on this data, fpp-bounded
    * false positives on top). `expectedDimKeys` sizes the filter for
    * the dim cardinality you'd see at target scale: 1M keys at 1%
    * fpp is ~1.2 MB shipped once per executor.
    */
  def bloomPrunedOrderItems(lineitem: DataFrame, orders: DataFrame,
      minTotalPrice: Double = 480000.0,
      expectedDimKeys: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val hot = orders.filter(col("o_totalprice") >= minTotalPrice).select("o_orderkey")
    val bloom = org.apache.spark.sql.graftfilter.BloomPrune.buildOver(
      hot, "o_orderkey", expectedDimKeys, fpp)
    lineitem
      .filter(org.apache.spark.sql.graftfilter.BloomPrune.mightContain(bloom, col("l_orderkey")))
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
  }

  /** Approximate distinct users per event type via a DataSketches
    * HLL sketch (`hll_sketch_agg`). The 100 TB story is the sketch's
    * mergeability — see [[hllSketchByHour]] / [[hllUnionEstimate]]:
    * materialize one ~KB sketch per (bucket) and answer any coarser
    * distinct question later WITHOUT rescanning, which exact
    * count-distinct fundamentally cannot do (distinct doesn't sum).
    *
    * No SQL oracle by design: the estimate is DataSketches-specific
    * (DuckDB's approx_distinct is a different sketch); the spec pins
    * a ±2% envelope vs exact and estimator determinism.
    */
  def hllDistinctUsers(events: DataFrame, lgK: Int = 14): DataFrame =
    events.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lgK)).as("approx_users"))

  /** One mergeable HLL sketch per event-hour — the materialized
    * rollup-building-block layout (a few KB per bucket, unionable
    * across any bucket subset).
    */
  def hllSketchByHour(events: DataFrame, lgK: Int = 14): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sketch"))

  /** Union previously materialized sketches to a single estimate —
    * the "incremental distinct" read path: daily sketches in,
    * monthly distinct out, no rescan of the raw events.
    */
  def hllUnionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col("sketch"), allowDifferentLgConfigK = false))
      .as("approx_users"))

  /** Count-min frequency estimates for a probe word set, beside the
    * exact counts ([[graft.functions.CountMinAggregator]]).
    *
    * One pass builds the O(depth·width) matrix (32 KB at 4×1024 —
    * driver round-trip bounded like the MG candidate list); exact
    * counts for the probes come from a scan-stage `IN` filter, so
    * the vocabulary never shuffles in either pass. Estimates
    * overestimate by ≤ 2N/width w.p. 1−2^-depth; with deterministic
    * md5 hashing the DuckDB oracle recomputes the estimates
    * EXACTLY — the sketch is hash-checked, not tolerance-checked.
    */
  def countMinWordFreq(documents: DataFrame, probes: Seq[String],
                       depth: Int = 4, width: Int = 1024): DataFrame = {
    require(probes.nonEmpty, "need at least one probe word")
    val spark = documents.sparkSession
    import spark.implicits._
    val words = TextOps.tokens(documents).select(col("word"))
    val cmUdaf = udaf(new graft.functions.CountMinAggregator(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    val sketch: Array[Long] =
      words.agg(cmUdaf(col("word")).as("s")).head().getSeq[Long](0).toArray
    val exact = words.filter(col("word").isin(probes: _*))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.distinct.sorted.map { w =>
      (w, graft.functions.CountMin.estimate(sketch, depth, width, w),
        exact.getOrElse(w, 0L))
    }.toDF("word", "est", "exact")
  }

  /** One CMS matrix per source — the materialized bucket layout
    * ([[hllSketchByHour]]'s frequency twin). Unlike HLL, the CMS
    * union is EXACT (cell-wise sum), so bucket sketches lose nothing
    * vs a whole-corpus pass — spec-pinned cell-for-cell.
    */
  def countMinBySource(documents: DataFrame,
                       depth: Int = 4, width: Int = 1024): DataFrame = {
    val cmUdaf = udaf(new graft.functions.CountMinAggregator(depth, width),
      org.apache.spark.sql.Encoders.STRING)
    documents
      .select(col("source"),
        explode(split(col("text"), TextOps.TokenPattern)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("source").agg(cmUdaf(col("word")).as("sketch"))
      // the shape travels WITH the sketch: cell hashing depends on
      // width and row offsets on depth, so a reader guessing the
      // shape from array length alone (8×512 vs 4×1024 share a
      // product) would silently mis-decode every cell
      .withColumn("depth", lit(depth))
      .withColumn("width", lit(width))
  }

  /** Equi-width histogram sketch per source over an integer column —
    * [[countMinBySource]]'s quantile twin: bin = value div binWidth,
    * one count per non-empty bin, state O(range/binWidth) regardless
    * of row count, and the merge is a cell-wise SUM — exact, so
    * per-bucket histograms answer quantile questions over ANY bucket
    * union later (error ≤ binWidth, no rescan). Exact quantiles
    * fundamentally don't merge (a median of medians is not the
    * median); a bounded-bin histogram is the deterministic mergeable
    * form — and being all-integer, its estimates reproduce in SQL, so
    * the query is hash-checked like the CMS (t-digest/KLL would give
    * tighter tails but float, RNG-dependent estimates).
    */
  def histogramBySource(documents: DataFrame, valueCol: String = "n_chars",
                        binWidth: Long = 20L): DataFrame = {
    require(binWidth >= 1, s"binWidth >= 1, got $binWidth")
    documents
      .groupBy(col("source"),
        expr(s"CAST($valueCol AS BIGINT) div $binWidth").as("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bin_width", lit(binWidth))
  }

  /** Merge per-source histograms and answer permille quantiles from
    * the merged bins: est(q) = upper edge of the first bin whose
    * cumulative count reaches ⌈q·N/1000⌉ — an overestimate by less
    * than binWidth. O(bins) driver round-trip, like the CMS matrix;
    * every sketch's persisted bin_width must match (the CMS shape
    * lesson).
    */
  def histogramQuantiles(histograms: DataFrame, qPermille: Seq[Int] = Seq(500, 900, 990),
                         binWidth: Long = 20L): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      "quantiles in 1..1000 permille")
    val spark = histograms.sparkSession
    import spark.implicits._
    val rows = histograms.select(col("bin"), col("c"), col("bin_width")).collect()
    rows.foreach(r => require(r.getLong(2) == binWidth,
      s"sketch bin_width ${r.getLong(2)} does not match requested $binWidth"))
    val bins = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sum)
      .toSeq.sortBy(_._1)
    val n = bins.map(_._2).sum
    val cum = bins.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (bin, c)) => (bin, acc + c)
    }.tail
    qPermille.distinct.sorted.map { q =>
      val rank = (q.toLong * n + 999L) / 1000L
      val est = cum.find(_._2 >= rank).map { case (bin, _) => (bin + 1) * binWidth }
        .getOrElse(0L)
      (q, est, n)
    }.toDF("q_permille", "est", "n_total")
  }

  /** End-to-end quantile-sketch query (the `q_quantile_sketch`
    * entry): per-source histograms → exact union → permille
    * estimates.
    */
  def quantileSketch(documents: DataFrame, valueCol: String = "n_chars",
                     binWidth: Long = 20L,
                     qPermille: Seq[Int] = Seq(500, 900, 990)): DataFrame =
    histogramQuantiles(histogramBySource(documents, valueCol, binWidth),
      qPermille, binWidth)

  /** End-to-end KLL quantile query (the `q_kll_sketch` entry): one
    * KLL sketch per source in a single map-side-combined pass
    * ([[graft.functions.KllAggregator]]), driver merge (O(sources·k)
    * arithmetic — the [[histogramQuantiles]] read path), then each
    * permille probe's estimate WITH its own exact-rank audit: a
    * second one-pass aggregate computes rank(est) = #{v ≤ est} for
    * all probes at once (one conditional sum per probe, no sort), so
    * the emitted `rank_err_ppm` IS the measured KLL rank error —
    * the artifact carries its own accuracy evidence.
    *
    * vs [[quantileSketch]]'s equi-width histogram: the histogram is
    * deterministic and hash-checkable but needs a bin width chosen
    * up front and carries O(range/binWidth) state; KLL adapts to any
    * distribution with O(k·log(n/k)) state and ~1/k rank error —
    * the sketch you reach for when the value range is unknown
    * (latencies, token counts, arbitrary user metrics). Rows-only by
    * design: compaction depends on Spark's partial-merge order
    * (EntrySpec pins the reason; SketchesSpec gates the error).
    */
  def kllQuantiles(documents: DataFrame, valueCol: String = "n_chars",
                   k: Int = 256,
                   qPermille: Seq[Int] = Seq(10, 250, 500, 750, 900, 990)): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    import graft.functions.{Kll, KllAggregator, KllSketch}
    val kllUdaf = udaf(new KllAggregator(k), org.apache.spark.sql.Encoders.scalaLong)
    val sketches = documents
      .select(col("source"), col(valueCol).cast("long").as("v"))
      .groupBy("source").agg(kllUdaf(col("v")).as("sk"))
      .as[(String, KllSketch)].collect()
    val merged =
      if (sketches.isEmpty) None else Some(sketches.map(_._2).reduce(Kll.merge))
    kllProbeAudit(documents, valueCol, merged, qPermille)
  }

  /** Hash-exact companion gate for the rows-only KLL entries (the
    * q_mst_summary precedent: the estimates themselves depend on
    * partial-merge order, but an INTEGER summary of the audit does
    * not have to). Projects the [[kllProbeAudit]] frame down to the
    * columns the DuckDB oracle reproduces exactly — the probe set,
    * the exact target rank ⌈q·n/1000⌉, the corpus count — plus a
    * 0/1 `within_bound` indicator of the measured rank error against
    * the suite's 2 % bound ([[KllBoundPpm]] — SketchesSpec's bound
    * for k=256). The bound is an EMPIRICAL margin, spec-gated: KLL's
    * ~1/k rank-error guarantee is probabilistic over compaction
    * coins, and with the suite's deterministic splitmix64 coins the
    * 2 % line sits ~8× above typical measured error rather than
    * being a worst-case invariant over every merge order. The
    * oracle pins the CLAIM (`1 AS within_bound`): any run whose
    * sketch drifts past the bound hash-mismatches in the driver's
    * gate instead of hiding behind a rows-only check — and per
    * SURVEY §6, a `within_bound` mismatch means SKETCH-ACCURACY
    * DRIFT at the new data/merge schedule, not an engine bug. */
  def kllBoundAudit(audit: DataFrame): DataFrame =
    audit.select(col("q_permille"), col("target_rank"), col("n_total"),
      when(col("rank_err_ppm") <= KllBoundPpm, 1L).otherwise(0L).as("within_bound"))

  /** The KLL-family rank-error bound (ppm of n) that [[kllBoundAudit]]
    * gates against and the DuckDB oracle's `1 AS within_bound` claim
    * encodes. One shared constant: the oracle hard-pins the claim, so
    * a per-call bound parameter would silently diverge from it. */
  val KllBoundPpm: Long = 20000L

  /** Probe + exact-rank-audit tail of [[kllQuantiles]], shared with
    * the streamed sketch-store face so the output contract cannot
    * drift: each permille estimate from the merged sketch beside the
    * measured rank-interval distance from one conditional-sum pass
    * over the corpus. */
  private[graft] def kllProbeAudit(documents: DataFrame, valueCol: String,
                                   merged: Option[graft.functions.KllSketch],
                                   qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      "quantiles in 1..1000 permille")
    val spark = documents.sparkSession
    import graft.functions.Kll
    val probes = qPermille.distinct.sorted
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q_permille", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("est", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank_lo", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank_hi", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("target_rank", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank_err_ppm", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_total", org.apache.spark.sql.types.LongType, nullable = false)))
    if (merged.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val ests = probes.map(q => q -> Kll.quantile(merged.get, q)).toMap
    // one-pass exact-rank audit, all conditional sums in a single
    // aggregate (never a sort). A duplicated value occupies the rank
    // INTERVAL (#{v < est}, #{v ≤ est}]; the estimate is wrong only
    // by its distance from that interval to the target — measuring
    // #{v ≤ est} alone would call the exact quantile of a two-point
    // distribution 90% wrong.
    val audit = documents.agg(
      count(lit(1)).as("n"),
      probes.flatMap(q => Seq(
        sum(when(col(valueCol).cast("long") < ests(q), 1L).otherwise(0L))
          .as(s"lo$q"),
        sum(when(col(valueCol).cast("long") <= ests(q), 1L).otherwise(0L))
          .as(s"hi$q"))): _*).head()
    val n = audit.getLong(0)
    val rows = probes.zipWithIndex.map { case (q, i) =>
      val (lo, hi) = (audit.getLong(1 + 2 * i), audit.getLong(2 + 2 * i))
      val target = (q.toLong * n + 999L) / 1000L
      val err = math.max(0L, math.max(lo + 1L - target, target - hi))
      val errPpm = err * 1000000L / math.max(n, 1L)
      org.apache.spark.sql.Row(q, ests(q), lo, hi, target, errPpm, n)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Pre-flight join-size estimation from two count-min sketches:
    * |A ⋈_k B| = Σ_k cntA(k)·cntB(k), estimated as the MIN over
    * sketch rows of the cell-wise inner product — collisions only
    * ADD, so est ≥ exact always (the AGMS-style sketch application;
    * Cormode & Muthukrishnan §4.2, public algorithm). The number a
    * planner wants BEFORE committing a 100 TB shuffle: each side is
    * one sketch pass (mergeable, so per-partition/per-day sketches
    * already materialized for frequency answers are reused), and the
    * estimate itself is O(depth·width) driver arithmetic — no join
    * runs. The md5 cell hash has no RNG, so the DuckDB oracle
    * reproduces the ESTIMATE bit-for-bit (q_count_min's property);
    * the query emits the exact count and the integer-ppm
    * overestimate beside it as the audit.
    *
    * Sizing: the expected overestimate is ‖A‖₁·‖B‖₁/width, so width
    * must be sized to the KEY CARDINALITY, not the frequency-probe
    * default (1024 cells against 15k distinct orderkeys measured a
    * 15× overestimate; 65536 lands within ~20% — and at 100 TB the
    * 2 MB row is still one executor message).
    *
    * The cell inner product accumulates in BigInt: per-cell counts of
    * ~1e7 at warehouse scale push Σ a·b past 2⁶³, and the DuckDB
    * oracle widens to HUGEINT — Long would wrap silently exactly when
    * the estimate matters most. The final min must still fit BIGINT
    * (the oracle CASTs and would error too), so that's a require, not
    * a wrap.
    *
    * `computeExact=false` skips the audit join entirely — the planner
    * use-case ("how big is this join BEFORE I commit the shuffle")
    * must not cost the shuffle it is pre-empting. The oracle-checked
    * query keeps the audit on.
    */
  def cmsJoinSizeEstimate(left: DataFrame, leftKey: String,
                          right: DataFrame, rightKey: String,
                          depth: Int = 4, width: Int = 65536,
                          computeExact: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    def sketchOf(df: DataFrame, key: String): Array[Long] = {
      val cmUdaf = udaf(new graft.functions.CountMinAggregator(depth, width),
        org.apache.spark.sql.Encoders.STRING)
      df.select(col(key).cast("string").as("k"))
        .agg(cmUdaf(col("k")).as("s")).head().getSeq[Long](0).toArray
    }
    val a = sketchOf(left, leftKey)
    val b = sketchOf(right, rightKey)
    val estBig = (0 until depth).map { j =>
      var s = BigInt(0)
      var c = 0
      while (c < width) {
        s += BigInt(a(j * width + c)) * BigInt(b(j * width + c)); c += 1
      }
      s
    }.min
    require(estBig.isValidLong,
      s"join-size estimate $estBig exceeds BIGINT — widen the output type")
    val est = estBig.toLong
    if (!computeExact) return Seq(est).toDF("est")
    val exact = left.select(col(leftKey).as("k"))
      .join(right.select(col(rightKey).as("k")), Seq("k")).count()
    val errPpm = if (exact == 0) 0L else (est - exact) * 1000000L / exact
    Seq((est, exact, errPpm)).toDF("est", "exact", "err_ppm")
  }

  /** Theta-sketch audience overlap (the `q_theta_sketch` entry):
    * one KMV sketch per event_type over user ids — built in ONE
    * map-side-combined pass, O(k) state per (partition, type) — then
    * every pairwise union / INTERSECTION / DIFFERENCE distinct
    * estimate from the collected sketches (driver arithmetic over
    * ≤ types·k longs). The question HLL cannot answer: "how many
    * users did both X and Y" from independently-materialized
    * per-segment sketches, no rescan, no exact join.
    *
    * At 100 TB the per-segment sketches are the materialized
    * artifact (like the per-source CMS rows): overlap questions over
    * ANY pair — or any union, KMV union is lossless — are then O(k)
    * driver work. md5 hashing + floor-division estimates make every
    * output integer reproduce in DuckDB (hash-checked, not
    * tolerance-checked; the tolerance claims live in the spec).
    */
  def thetaUserOverlap(events: DataFrame, k: Int = 256): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.Kmv
    val kmv = udaf(new graft.functions.KmvAggregator(k),
      org.apache.spark.sql.Encoders.STRING)
    val sketches = events
      .select(col("event_type"), col("user_id").cast("string").as("u"))
      .groupBy("event_type").agg(kmv(col("u")).as("sk"))
      .as[(String, Array[Long])].collect().sortBy(_._1)
    val out = for {
      (ta, sa) <- sketches.toSeq
      (tb, sb) <- sketches.toSeq if ta < tb
    } yield (ta, tb,
      Kmv.estimate(sa, k), Kmv.estimate(sb, k),
      Kmv.estimate(Kmv.union(sa, sb, k), k),
      Kmv.intersectEstimate(sa, sb, k),
      Kmv.diffEstimate(sa, sb, k))
    out.toDF("type_a", "type_b", "est_a", "est_b", "est_union",
      "est_intersect", "est_diff")
  }

  /** Union previously materialized CMS matrices and answer probes
    * from the merged matrix — daily sketches in, any-range frequency
    * out, no rescan. O(buckets·depth·width) driver round-trip.
    * Every sketch's persisted (depth, width) must equal the requested
    * shape — a same-length different-shape matrix decodes to garbage,
    * so it is rejected, not reinterpreted.
    */
  def countMinUnionEstimate(sketches: DataFrame, probes: Seq[String],
                            depth: Int = 4, width: Int = 1024): DataFrame = {
    require(probes.nonEmpty, "need at least one probe word")
    val spark = sketches.sparkSession
    import spark.implicits._
    val rows = sketches.select(col("sketch"), col("depth"), col("width")).collect()
    val mats = rows.map { r =>
      val (d, w) = (r.getInt(1), r.getInt(2))
      require(d == depth && w == width,
        s"sketch shape ${d}x$w does not match requested ${depth}x$width")
      r.getSeq[Long](0).toArray
    }.toSeq
    val merged = graft.functions.CountMin.union(mats)
    probes.distinct.sorted
      .map(w => (w, graft.functions.CountMin.estimate(merged, depth, width, w)))
      .toDF("word", "est")
  }
}
