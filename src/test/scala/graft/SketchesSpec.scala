package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, TextOps}

/** Sketch/synopsis operators (SURVEY §2.10): Misra-Gries heavy
  * hitters, bloom-pruned semi join, HLL distinct sketches.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private def docs = Tables.documents(spark, SharedSpark.sf)

  // ---- Misra-Gries candidate sketch ----

  test("MG candidates form a ≤capacity superset of all items above N/(cap+1)") {
    import spark.implicits._
    // 2000 singleton tails force constant eviction at capacity 64;
    // 20 hot items sit far above the guarantee threshold.
    val items: Seq[String] =
      (1 to 2000).map(i => s"tail$i") ++
        (1 to 20).flatMap(i => Seq.fill(400 + i)(s"hot$i"))
    val cap = 64
    val cands = items.toDS().repartition(7)
      .select(new graft.functions.MisraGriesAggregator(cap).toColumn).head()
    assert(cands.size <= cap)
    val n = items.size
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size }
    val mustSurvive = exact.collect { case (k, c) if c > n / (cap + 1) => k }.toSet
    assert(mustSurvive.subsetOf(cands.toSet),
      s"evicted guaranteed heavy hitters: ${mustSurvive -- cands.toSet}")
  }

  test("heavyHitters equals the exact frequency top-k on the corpus") {
    val expect = TextOps.wordCount(docs)
      .orderBy(desc("cnt"), asc("word")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Sketches.heavyHitters(docs, 10, 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("heavyHitters stays exact under eviction pressure and any input partitioning") {
    import spark.implicits._
    // vocabulary (520) ≫ capacity (32): the sketch must evict tails
    // and trim on merge, yet the two-pass result stays exact because
    // the hot frequencies clear N/(cap+1) ≈ 640.
    val corpus = ((1 to 20).map(i => (i.toLong, List.fill(1000 + i)(s"hot$i").mkString(" "))) ++
      (1 to 500).map(i => (1000L + i, s"tail$i"))).toDF("doc_id", "text")
    val expect = TextOps.wordCount(corpus)
      .orderBy(desc("cnt"), asc("word")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (parts <- Seq(1, 13)) {
      val got = Sketches.heavyHitters(corpus.repartition(parts), 10, 32)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"divergence at $parts partitions")
    }
  }

  test("heavyHitters guard trips when the k-th count cannot clear the MG bound") {
    import spark.implicits._
    // 600 distinct words, each exactly twice: N=1200, bound at cap 32
    // is 1200/33 = 36 >> 2 — the sketch may have evicted true top-k
    // items, so the operator must say so instead of answering quietly
    def word(i: Int): String = {
      var n = i; val sb = new StringBuilder
      (0 until 4).foreach { _ => sb.append(('a' + n % 26).toChar); n /= 26 }
      sb.toString
    }
    val flat = (1 to 600).map(i => (i.toLong, s"${word(i)} ${word(i)}")).toDF("doc_id", "text")
    val ex = intercept[IllegalStateException] { Sketches.heavyHitters(flat, 10, 32) }
    assert(ex.getMessage.contains("not provably exact"))
    // non-strict mode degrades to a logged warning and returns the
    // (approximate) survivor top-k — possibly empty on fully flat
    // data, where constant decrement cycles can wipe the sketch
    assert(Sketches.heavyHitters(flat, 10, 32, strict = false).count() <= 10)
  }

  // ---- Bloom-pruned semi join ----

  test("bloom probe has no false negatives and prunes the fact side hard") {
    val li = Tables.lineitem(spark, SharedSpark.sf)
    val hot = Tables.orders(spark, SharedSpark.sf)
      .filter(col("o_totalprice") >= 480000.0).select("o_orderkey")
    val bloom = org.apache.spark.sql.graftfilter.BloomPrune.buildOver(
      hot, "o_orderkey", 1L << 20, 0.01)
    val pruned = li.filter(
      org.apache.spark.sql.graftfilter.BloomPrune.mightContain(bloom, col("l_orderkey")))
    val trueMatches = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
    // every true match survives the probe (bloom can't false-negative)
    assert(trueMatches.select("l_orderkey").distinct()
      .except(pruned.select("l_orderkey").distinct()).isEmpty)
    // and the probe kills the overwhelming majority of fact rows
    // before any shuffle (~4% dim selectivity + ≤1% fp)
    assert(pruned.count() < li.count() / 5)
  }

  test("bloomPrunedOrderItems is identical to the plain semi-join aggregate") {
    val li = Tables.lineitem(spark, SharedSpark.sf)
    val ord = Tables.orders(spark, SharedSpark.sf)
    val plain = li
      .join(ord.filter(col("o_totalprice") >= 480000.0).select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).cast("long").as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Sketches.bloomPrunedOrderItems(li, ord)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == plain)
  }

  // ---- HLL distinct sketches ----

  test("hllDistinctUsers lands within 2% of exact distinct per event type") {
    val ev = Tables.events(spark, SharedSpark.sf)
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.hllDistinctUsers(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((t, n) <- exact) {
      assert(math.abs(approx(t) - n) <= math.max(1L, (n * 0.02).toLong),
        s"$t: approx ${approx(t)} vs exact $n")
    }
  }

  test("per-hour sketches survive parquet and union to the whole-corpus estimate") {
    val ev = Tables.events(spark, SharedSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-").toString
    Sketches.hllSketchByHour(ev).write.mode("overwrite").parquet(dir)
    val merged = Sketches.hllUnionEstimate(spark.read.parquet(dir))
      .head().getLong(0)
    val whole = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("approx_users"))
      .head().getLong(0)
    // same value set, same lgK ⇒ identical register state ⇒ identical
    // estimate: mergeability is lossless, not merely approximate
    assert(merged == whole)
  }

  // ---- count-min sketch ----

  test("countMin estimates always dominate the exact count; exact on a tiny vocabulary") {
    val probes = Seq("the", "hash", "row", "graftneverseen")
    val got = Sketches.countMinWordFreq(docs, probes)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toList === probes.distinct.sorted)
    got.foreach { case (w, est, exact) =>
      assert(est >= exact, s"$w: CMS must never underestimate ($est < $exact)")
    }
    // vocabulary ≪ width ⇒ collisions possible but min-over-4-rows
    // resolves them on 3 distinct words: estimates are exact
    import spark.implicits._
    val tiny = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val t = Sketches.countMinWordFreq(tiny, Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(t.toList === List(("a", 3L, 3L), ("b", 2L, 2L), ("c", 1L, 1L), ("d", 0L, 0L)))
  }

  test("countMin bucket sketches union EXACTLY to the whole-corpus matrix, via parquet") {
    val probes = Seq("the", "hash", "join", "scan", "row")
    val whole = Sketches.countMinWordFreq(docs, probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-").toString
    Sketches.countMinBySource(docs).write.mode("overwrite").parquet(dir)
    val merged = Sketches.countMinUnionEstimate(spark.read.parquet(dir), probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // cell-wise sum is the EXACT merge: per-source matrices lose
    // nothing vs the single-pass matrix (unlike MG, whose merge
    // re-trims) — estimates agree integer-for-integer
    assert(merged === whole)
  }

  test("countMin union rejects a same-length different-shape sketch instead of mis-decoding it") {
    // 8x512 and 4x1024 share array length 4096 — reading one as the
    // other scrambles every cell lookup, so the persisted (depth,
    // width) must match the requested shape
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-shape-").toString
    Sketches.countMinBySource(docs, depth = 8, width = 512).write.mode("overwrite").parquet(dir)
    val saved = spark.read.parquet(dir)
    val err = intercept[Exception] {
      Sketches.countMinUnionEstimate(saved, Seq("the"), depth = 4, width = 1024).collect()
    }
    assert(err.getMessage.contains("8x512"), s"unexpected error: ${err.getMessage}")
    // and the matching shape still works
    assert(Sketches.countMinUnionEstimate(saved, Seq("the"), depth = 8, width = 512)
      .collect().nonEmpty)
  }

  test("histogram quantile sketch: per-source bins union exactly; estimates bound the true quantile by one bin") {
    val docs2 = docs
    val whole = Sketches.quantileSketch(docs2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    // union path: persist per-source sketches, merge from parquet
    val dir = java.nio.file.Files.createTempDirectory("graft-hist-").toString
    Sketches.histogramBySource(docs2).write.mode("overwrite").parquet(dir)
    val merged = Sketches.histogramQuantiles(spark.read.parquet(dir)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(merged === whole, "bucket histograms must merge losslessly")
    // true-quantile bound: v(q) < est <= v(q) + binWidth
    val values = docs2.select(org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(_.getLong(0)).sorted
    whole.foreach { case (q, est, n) =>
      assert(n == values.length.toLong)
      val rank = ((q.toLong * n + 999L) / 1000L).toInt
      val v = values(rank - 1)
      assert(v < est && est - v <= 20L, s"q=$q est=$est true=$v")
    }
    // shape guard: mismatched bin width is rejected, not reinterpreted
    val err = intercept[Exception] {
      Sketches.histogramQuantiles(spark.read.parquet(dir), binWidth = 50L).collect()
    }
    assert(err.getMessage.contains("bin_width"))
  }

  test("cmsJoinSizeEstimate: exact when collision-free, always dominates, width shrinks the overestimate") {
    import spark.implicits._
    // planted: sum over shared keys of cntA*cntB = 2*1 + 1*2 = 4
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 4L).toDF("k")
    val tiny = Sketches.cmsJoinSizeEstimate(a, "k", b, "k", depth = 4, width = 8192).head()
    assert(tiny.getLong(0) === 4L && tiny.getLong(1) === 4L && tiny.getLong(2) === 0L,
      "collision-free sketch must estimate exactly")
    // real join: estimate dominates; widening the sketch tightens it
    val li = Tables.lineitem(spark, SharedSpark.sf)
    val ord = Tables.orders(spark, SharedSpark.sf)
    val narrow = Sketches.cmsJoinSizeEstimate(li, "l_orderkey", ord, "o_orderkey",
      depth = 4, width = 1024).head()
    val wide = Sketches.cmsJoinSizeEstimate(li, "l_orderkey", ord, "o_orderkey",
      depth = 4, width = 65536).head()
    assert(narrow.getLong(1) === wide.getLong(1), "exact count is exact")
    assert(narrow.getLong(0) >= narrow.getLong(1) && wide.getLong(0) >= wide.getLong(1),
      "collisions only add: est >= exact")
    assert(wide.getLong(0) <= narrow.getLong(0),
      s"wider sketch must not estimate worse: ${wide.getLong(0)} vs ${narrow.getLong(0)}")
    info(s"join-size est: exact=${wide.getLong(1)} width=1024 -> ${narrow.getLong(0)}, " +
      s"width=65536 -> ${wide.getLong(0)} (${wide.getLong(2)} ppm over)")
  }

  test("cmsJoinSizeEstimate: estimate-only path skips the audit join and agrees with the audited estimate") {
    val li = Tables.lineitem(spark, SharedSpark.sf)
    val ord = Tables.orders(spark, SharedSpark.sf)
    val estOnly = Sketches.cmsJoinSizeEstimate(li, "l_orderkey", ord, "o_orderkey",
      depth = 4, width = 1024, computeExact = false)
    // the planner path must not emit (or cost) the exact-join audit
    assert(estOnly.columns.toSeq == Seq("est"))
    val audited = Sketches.cmsJoinSizeEstimate(li, "l_orderkey", ord, "o_orderkey",
      depth = 4, width = 1024).head().getLong(0)
    assert(estOnly.head().getLong(0) === audited,
      "estimate must be identical with and without the audit join")
  }

  test("theta sketch: exact under k; union lossless through parquet; overlap estimates within tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udaf}
    import graft.functions.{Kmv, KmvAggregator}
    val k = 256
    val kmv = udaf(new KmvAggregator(k), org.apache.spark.sql.Encoders.STRING)
    def sketchOf(xs: Seq[Long]): Array[Long] =
      xs.map(_.toString).toDF("u").agg(kmv(col("u"))).head().getSeq[Long](0).toArray

    // under k keys the sketch IS the set: every estimate exact
    val sa = sketchOf(0L until 100L)
    val sb = sketchOf(50L until 150L)
    assert(Kmv.estimate(sa, k) == 100L)
    assert(Kmv.intersectEstimate(sa, sb, k) == 50L)
    assert(Kmv.diffEstimate(sa, sb, k) == 50L)
    assert(Kmv.estimate(Kmv.union(sa, sb, k), k) == 150L)

    // planted overlap far past k: |A|=|B|=30k, |A∩B|=10k, |A∪B|=50k
    val a = sketchOf(0L until 30000L)
    val b = sketchOf(20000L until 50000L)
    def rel(est: Long, truth: Long) = math.abs(est - truth).toDouble / truth
    // k=256 → σ ≈ 1/√254 ≈ 6.3%; bounds are ~3σ (the hash draw is
    // deterministic — union measures 19.2% here, a fixed 3σ point)
    assert(rel(Kmv.estimate(a, k), 30000) <= 0.20, s"distinct est ${Kmv.estimate(a, k)}")
    assert(rel(Kmv.estimate(Kmv.union(a, b, k), k), 50000) <= 0.25,
      s"union est ${Kmv.estimate(Kmv.union(a, b, k), k)}")
    assert(rel(Kmv.intersectEstimate(a, b, k), 10000) <= 0.30,
      s"intersect est ${Kmv.intersectEstimate(a, b, k)}")
    assert(rel(Kmv.diffEstimate(a, b, k), 20000) <= 0.30,
      s"diff est ${Kmv.diffEstimate(a, b, k)}")
    info(s"theta k=$k: |A| ${Kmv.estimate(a, k)}/30000, " +
      s"∪ ${Kmv.estimate(Kmv.union(a, b, k), k)}/50000, " +
      s"∩ ${Kmv.intersectEstimate(a, b, k)}/10000, ∖ ${Kmv.diffEstimate(a, b, k)}/20000")

    // KMV union is LOSSLESS: merging the two bucket sketches equals
    // sketching the union of the underlying sets, bit for bit
    val whole = sketchOf(0L until 50000L)
    assert(Kmv.union(a, b, k).toSeq == whole.toSeq, "KMV union must be lossless")

    // the algebra survives parquet: per-bucket sketches materialized
    // and read back answer the same questions identically
    val dir = java.nio.file.Files.createTempDirectory("graft-theta-").toString + "/sk"
    Seq(("a", a.toSeq), ("b", b.toSeq)).toDF("bucket", "sk").write.parquet(dir)
    val back = spark.read.parquet(dir).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    assert(Kmv.union(back("a"), back("b"), k).toSeq == whole.toSeq)
    assert(Kmv.intersectEstimate(back("a"), back("b"), k) == Kmv.intersectEstimate(a, b, k))
    assert(Kmv.diffEstimate(back("a"), back("b"), k) == Kmv.diffEstimate(a, b, k))

    // md5 hashing + exact merge: partitioning-invariant
    val rep = (0L until 30000L).map(_.toString).toDF("u").repartition(13)
      .agg(kmv(col("u"))).head().getSeq[Long](0)
    assert(rep == a.toSeq, "sketch must not depend on partitioning")

    // k past 2^15 would overflow (k-1)*2^48 in Long and silently
    // return wrong estimates — bounded explicitly instead
    assert(Kmv.MaxK == 32768)
    intercept[IllegalArgumentException](new KmvAggregator(Kmv.MaxK + 1))
    intercept[IllegalArgumentException](Kmv.estimate(a, Kmv.MaxK + 1))
    intercept[IllegalArgumentException](Kmv.intersectEstimate(a, b, 100000))
    intercept[IllegalArgumentException](Kmv.diffEstimate(a, b, 100000))
    // and the bound itself is safe: (MaxK-1)*2^48 stays positive
    assert((Kmv.MaxK - 1).toLong * Kmv.Max48 > 0L)
  }

  test("countMin matrix is partitioning-invariant") {
    val probes = Seq("the", "batch")
    val a = Sketches.countMinWordFreq(docs, probes).collect().toList
    val b = Sketches.countMinWordFreq(docs.repartition(13), probes).collect().toList
    assert(a === b)
  }

  // ---- KLL quantile sketch ----

  import graft.functions.{Kll, KllAggregator, KllSketch}

  /** Deterministic value scrambler for planted streams (no RNG
    * object — same constants as Kll's coin stream).
    */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def sketchOf(values: Seq[Long], k: Int, parts: Int = 8): KllSketch = {
    import spark.implicits._
    values.toDS().repartition(parts)
      .select(new KllAggregator(k).toColumn).head()
  }

  /** Rank-interval distance: a duplicated value occupies ranks
    * (#{v < est}, #{v ≤ est}]; the estimate's error is its distance
    * from the target to that interval (0 when the target falls
    * inside — the exact quantile of a two-point distribution must
    * measure as exact).
    */
  private def rankErr(sorted: IndexedSeq[Long], est: Long, target: Long): Long = {
    def search(strict: Boolean): Long = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val in = if (strict) sorted(mid) < est else sorted(mid) <= est
        if (in) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
    val (lo, hi) = (search(strict = true), search(strict = false))
    math.max(0L, math.max(lo + 1L - target, target - hi))
  }

  private def maxRankErr(values: Seq[Long], s: KllSketch,
                         probes: Seq[Int] = Seq(10, 100, 250, 500, 750, 900, 990)): Long = {
    val sorted = values.sorted.toIndexedSeq
    probes.map { q =>
      val target = (q.toLong * s.n + 999L) / 1000L
      rankErr(sorted, Kll.quantile(s, q), target)
    }.max
  }

  test("KLL: weight conservation, bounded state, and ≤2% rank error across distributions") {
    val n = 200000
    val k = 256
    // uniform permutation / heavy-skew / pre-sorted / two-point mass —
    // the shapes that break naive samplers differently
    val streams: Seq[(String, Seq[Long])] = Seq(
      "uniform" -> (1 to n).map(i => mix(i.toLong) & 0xFFFFFFFL),
      "skewed" -> (1 to n).map { i =>
        val h = mix(i.toLong * 31L); (h & 0xFFFL) * (h & 0xFFFL) },
      "sorted" -> (1 to n).map(_.toLong),
      "twopoint" -> (1 to n).map(i => if (i % 10 == 0) 1000000L else 7L))
    streams.foreach { case (name, values) =>
      val s = sketchOf(values, k)
      assert(s.n == n.toLong, s"$name: n")
      assert(Kll.totalWeight(s) == n.toLong,
        s"$name: compaction must conserve total weight exactly")
      assert(Kll.size(s) < n / 10,
        s"$name: sketch must actually compact (size ${Kll.size(s)})")
      assert(Kll.size(s) <= 4 * k,
        s"$name: state must stay O(k·log), got ${Kll.size(s)}")
      val err = maxRankErr(values, s)
      assert(err <= n / 50, s"$name: rank error $err over n=$n exceeds 2%")
    }
  }

  test("KLL: small streams stay exact (no compaction below the capacity budget)") {
    val values = (1 to 200).map(i => mix(i.toLong) & 0xFFFFL)
    val s = sketchOf(values, 256, parts = 3)
    assert(Kll.size(s) == values.length, "no compaction expected")
    val sorted = values.sorted
    Seq(1, 250, 500, 750, 1000).foreach { q =>
      val target = ((q.toLong * values.length + 999L) / 1000L).toInt
      assert(Kll.quantile(s, q) == sorted(target - 1), s"q=$q must be the exact order statistic")
    }
  }

  test("KLL: merge of per-bucket sketches keeps the error bound; empty merges are identity") {
    val n = 120000
    val values = (1 to n).map(i => mix(i.toLong * 7L) & 0xFFFFFFL)
    val (a, b, c) = (values.take(n / 3), values.slice(n / 3, 2 * n / 3), values.drop(2 * n / 3))
    val merged = Seq(a, b, c).map(sketchOf(_, 256)).reduce(Kll.merge)
    assert(merged.n == n.toLong && Kll.totalWeight(merged) == n.toLong)
    assert(maxRankErr(values, merged) <= n / 50,
      "bucket-merged sketch must keep the rank-error bound")
    val e = Kll.empty(256)
    assert(Kll.merge(e, merged) eq merged)
    assert(Kll.merge(merged, e) eq merged)
    intercept[IllegalArgumentException](Kll.merge(merged, Kll.empty(128)))
  }

  test("KLL: error bound holds at any input partitioning") {
    val n = 100000
    val values = (1 to n).map(i => mix(i.toLong * 13L) & 0x3FFFFFL)
    for (parts <- Seq(1, 13, 32)) {
      val s = sketchOf(values, 256, parts)
      assert(s.n == n.toLong)
      assert(maxRankErr(values, s) <= n / 50, s"error blown at $parts partitions")
    }
  }

  test("kllQuantiles: end-to-end audit rows on the corpus, monotone and within 2%") {
    val out = Sketches.kllQuantiles(docs).collect()
    assert(out.length == 6)
    val nDocs = docs.count()
    val ests = out.map(_.getLong(1))
    assert(ests.zip(ests.tail).forall { case (x, y) => x <= y },
      "estimates must be monotone in q")
    out.foreach { r =>
      assert(r.getLong(6) == nDocs)
      assert(r.getLong(5) <= 20000L,
        s"q=${r.getInt(0)}: measured rank error ${r.getLong(5)} ppm exceeds 2%")
      // audit self-consistency: err = distance from target to the
      // occupied rank interval (rank_lo, rank_hi]
      val (lo, hi, target) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val expectErr = math.max(0L, math.max(lo + 1L - target, target - hi)) * 1000000L / nDocs
      assert(r.getLong(5) == expectErr)
      assert(lo <= hi && hi <= nDocs)
    }
    // empty input: zero rows, not a throw
    val empty = docs.filter(org.apache.spark.sql.functions.lit(false))
    assert(Sketches.kllQuantiles(empty).count() == 0)
  }

  test("kllBoundAudit: oracle-shape projection, indicator semantics, empty totality") {
    import spark.implicits._
    // indicator semantics on a hand-built audit frame: exactly the
    // rows at err <= bound flag 1, everything else 0
    val audit = Seq(
      (500, 0L, 3L, 2L),      // err 0  -> within at any bound
      (900, 19999L, 9L, 2L),  // just under the default 2% bound
      (990, 20001L, 10L, 2L)  // just over
    ).toDF("q_permille", "rank_err_ppm", "target_rank", "n_total")
    val flags = Sketches.kllBoundAudit(audit).orderBy("q_permille")
      .select("q_permille", "within_bound").as[(Int, Long)].collect()
    assert(flags.toSeq == Seq((500, 1L), (900, 1L), (990, 0L)))
    // end-to-end on the corpus: one row per probe, the
    // oracle-checkable columns match exact arithmetic, every
    // indicator is 1 (SketchesSpec's own 2% bound, any merge order)
    val n = docs.count()
    val out = Sketches.kllBoundAudit(Sketches.kllQuantiles(docs)).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val q = r.getInt(0)
      assert(r.getLong(1) == (q.toLong * n + 999L) / 1000L)
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == 1L, s"q=$q drifted past the 2% bound")
    }
    // empty corpus: zero rows (the oracle's WHERE n_total > 0 guard
    // pins the same shape), not a degenerate summary
    val empty = docs.filter(org.apache.spark.sql.functions.lit(false))
    assert(Sketches.kllBoundAudit(Sketches.kllQuantiles(empty)).count() == 0)
  }
}
