package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over relationship tables (SURVEY §2.3 companion:
  * the connected-components family in [[Dedup]] covers reachability;
  * this module covers local structure).
  *
  * Reference scope note: the reference framework's join-shaped
  * plugins compute pairwise structure only; triangle counting is the
  * canonical "hard" MapReduce graph benchmark (Suri & Vassilvitskii,
  * WWW'11 — public literature) and exercises exactly the fan-out
  * control a 100 TB deployment needs.
  */
object Graph {

  /** Co-purchase edge list: an undirected edge (u, v), u < v, between
    * two parts that appear in the same order.
    *
    * Scale design: the self-join is on `l_orderkey`, so fan-out per
    * join key is C(linesPerOrder, 2) — bounded by the schema (orders
    * have ≤ 7 lines), never by table size. The join co-partitions
    * both sides on the same key (one shuffle each), and the final
    * `distinct` is one more bounded shuffle on the edge itself. No
    * step is quadratic in parts, orders, or lineitems.
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val items = lineitem.select(
      col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val a = items.as("a")
    val b = items.as("b")
    a.join(b, col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
  }

  /** Exact triangle count via degree-ordered wedge closure.
    *
    * Naive triangle counting closes wedges at EVERY vertex — a hub of
    * degree d contributes C(d, 2) wedges, so one celebrity node in a
    * power-law graph produces 10¹⁰ candidates. The fix (public:
    * Suri & Vassilvitskii WWW'11; also how GraphFrames/Trino do it)
    * is to orient each undirected edge from the endpoint that is
    * SMALLER under the total order (degree, id) to the larger one:
    * every vertex then has out-degree O(√m), wedge generation is
    * O(m^1.5) worst-case TOTAL — independent of hub skew — and each
    * triangle is generated exactly once, at its minimum vertex.
    *
    * Plan shape: degree is one shuffle on node; orientation is two
    * equality joins edge⋈degree; wedge generation is a self-join of
    * the oriented DAG on `src` (co-partitioned, one shuffle); closure
    * is an equality join of wedges against oriented edges on the full
    * (src, dst) pair. Every join is an equality join — PlanSpec
    * asserts no CartesianProduct/BNLJ — and the three 1-row summary
    * aggregates join by crossJoin-of-scalars (driver cost O(1)).
    *
    * Output: one row (nodes, n_edges, triangles) — all integers, so
    * the DuckDB oracle (which uses the orientation-free a<b<c
    * three-way join) must agree bit-for-bit.
    */
  def triangleCount(edges0: DataFrame): DataFrame = {
    // The edge list feeds four consumers (degree, orientation, both
    // wedge sides) — materialize the candidate generator ONCE.
    // localCheckpoint (the CC-family pattern) rather than cache: the
    // count below is needed anyway for the summary row and to pick
    // the closure strategy, and checkpointing keeps every downstream
    // plan constant-size. Cluster deployments with executor churn
    // would use a reliable checkpoint dir instead.
    val edges = edges0.localCheckpoint(true)
    val mEdges = edges.count()

    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))

    // Orient by (degree, id): lower endpoint -> higher endpoint.
    val du = deg.as("du")
    val dv = deg.as("dv")
    val uFirst = (col("du.d") < col("dv.d")) ||
      (col("du.d") === col("dv.d") && col("u") < col("v"))
    val oriented = edges
      .join(du, col("u") === col("du.n"))
      .join(dv, col("v") === col("dv.n"))
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv.d")).otherwise(col("du.d")).as("dstDeg"))
      .localCheckpoint(true)

    // Wedges at the minimum vertex: pair the out-neighbours of each
    // src, ordered by the SAME (degree, id) total order so the closing
    // edge is guaranteed to be oriented b -> c.
    // The wedge self-join stays a shuffled join co-partitioned on
    // src (measured: broadcasting the probe side here is a loss —
    // the high-duplication src multimap builds slower than one
    // 1-column exchange + merge).
    val small = mEdges <= 20L * 1000 * 1000
    val e1 = oriented.as("e1")
    val e2 = oriented.as("e2")
    val wedges = e1.join(e2,
        col("e1.src") === col("e2.src") &&
          ((col("e1.dstDeg") < col("e2.dstDeg")) ||
           (col("e1.dstDeg") === col("e2.dstDeg") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))

    // Closure: the O(m^1.5) wedge stream is the dominant volume —
    // never let it hit an exchange when the EDGE list (only O(m))
    // fits in a broadcast. With the hint, wedge generation and the
    // closure probe fuse into one stage: wedges are produced and
    // filtered in-flight, materialized nowhere. Past the broadcast
    // threshold, fall back to the shuffled equality join — at 10⁹+
    // edges exchanging the wedge stream is the irreducible cost of
    // exact counting (the approximate path is DOULION-style edge
    // sampling ahead of this operator).
    val closureRight = if (small) broadcast(oriented) else oriented
    val closed = wedges.join(closureRight,
      col("b") === col("src") && col("c") === col("dst"))

    val tri = closed.agg(count(lit(1)).as("triangles"))
    val nNodes = deg.agg(count(lit(1)).as("nodes"))
    nNodes.crossJoin(tri)
      .select(col("nodes"), lit(mEdges).as("n_edges"), col("triangles"))
  }

  /** Co-purchase triangles end-to-end (the `q_triangles` entry). */
  def coPurchaseTriangles(lineitem: DataFrame): DataFrame =
    triangleCount(coPurchaseEdges(lineitem))

  /** DOULION-style approximate triangle count (Tsourakakis, Kang &
    * Faloutsos, KDD 2009 — public algorithm): keep each edge
    * independently with probability p BEFORE wedge generation, count
    * exactly on the sparsified graph, scale by 1/p³ (a triangle
    * survives iff all three edges do). The path for graphs past the
    * exact-count budget: the wedge self-join's input shrinks by p and
    * its output by ~p², which is where the O(m^1.5) cost actually
    * lives, and the sampling predicate is evaluated in the edge scan
    * stage — nothing about the sparsified run shuffles more than the
    * exact one.
    *
    * Sampling is the repo's seeded content-hash predicate (first 16
    * bits of md5(salt ‖ u ‖ ":" ‖ v) under a threshold), so the
    * sample — and therefore the estimate — is deterministic across
    * runs, partitionings, and engines; `keepPermille` dials p in
    * 1/1000 steps and the estimator uses the EXACT realized threshold
    * probability ⌊keepPermille·2¹⁶/1000⌋/2¹⁶, not the nominal one.
    * The estimator is unbiased; its relative variance shrinks as the
    * true count grows (Tsourakakis' concentration argument), which is
    * precisely the regime where sampling is wanted. The spec pins a
    * planted-clique graph's estimate within 15% and the estimate's
    * determinism.
    *
    * Output: (n_edges_sampled, triangles_sampled, triangles_est).
    */
  def triangleCountApprox(edges0: DataFrame, keepPermille: Int = 500,
                          salt: String = "tri:"): DataFrame = {
    require(keepPermille >= 1 && keepPermille <= 1000,
      s"keepPermille in 1..1000, got $keepPermille")
    val thresh = keepPermille * 65536 / 1000
    val hex4 = substring(md5(concat(lit(salt), col("u").cast("string"),
      lit(":"), col("v").cast("string"))), 1, 4)
    val sampled =
      if (keepPermille == 1000) edges0
      else edges0.filter(hex4 < lit(f"$thresh%04x"))
    val p = if (keepPermille == 1000) 1.0 else thresh.toDouble / 65536.0
    val inv = 1.0 / (p * p * p)
    triangleCount(sampled).select(
      col("n_edges").as("n_edges_sampled"),
      col("triangles").as("triangles_sampled"),
      floor(col("triangles") * lit(inv) + lit(0.5)).cast("long").as("triangles_est"))
  }

  /** k-core subgraph via iterative peeling (Seidman 1983; the
    * Batagelj-Zaveršnik distributed form — public algorithms): each
    * round drops every node whose degree in the CURRENT subgraph is
    * < k, until fixpoint — the standard community-mining /
    * graph-cleaning primitive (the k-core is the maximal subgraph
    * where everyone keeps ≥ k neighbors; peeling cascades: losing a
    * low-degree neighbor can drag a node below k next round).
    *
    * Runs a FIXED `rounds` budget with an early fixpoint exit: once
    * converged, further peels are no-ops, so fixed-round execution ≡
    * fixpoint whenever convergence lands inside the budget — and the
    * SQL oracle unrolls the SAME rounds, so the hash gate holds even
    * mid-cascade (both engines truncate identically). The spec pins
    * round-budget invariance on planted graphs.
    *
    * Round cost: one degree aggregate + two LEFT SEMI joins, all
    * keyed on node id — the CC-round shape; `localCheckpoint` per
    * round truncates the iterative lineage (the §2.3 row 26b
    * lesson), and the eager checkpoint's count doubles as the free
    * fixpoint probe. Output: (node, deg) over the surviving
    * subgraph.
    */
  def kCore(edges0: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1")
    var edges = edges0.localCheckpoint(true)
    var prev = edges.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val deg = edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val superseded = edges
      edges = edges
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .localCheckpoint(true)
      val c = edges.count()
      // the new round is materialized (eager + count) — the peeled
      // round's blocks must not outlive it (20 rounds of a 10⁹-edge
      // graph would otherwise hold 20 edge copies in the block manager)
      graft.operators.Checkpoints.free(superseded)
      converged = c == prev
      prev = c
      r += 1
    }
    edges.select(col("u").as("node")).unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** BFS hop distances from a deterministic seed (the minimum node
    * id): (node, dist) for every node in the seed's component within
    * `maxRounds` hops — the reachability/radius primitive the
    * CC/k-core/triangle family lacks (how FAR apart things are, not
    * just whether they connect).
    *
    * Frontier BFS, the scalable shape: round r joins ONLY the nodes
    * first reached at round r−1 against the adjacency list — per-round
    * work is O(edges incident to the frontier), never a rescan of the
    * settled set, and the whole traversal is O(diameter) rounds like
    * propagation CC. Each round is one equality join + distinct + one
    * LEFT ANTI against the settled table (all hash-partitioned on the
    * node — no broadcast of anything corpus-sized), with per-round
    * eager `localCheckpoint` + [[Checkpoints.free]] so the logical
    * plan and the block manager stay constant-size at any depth (the
    * 26b lesson). Early exit on an empty frontier; `maxRounds` caps a
    * pathological-diameter graph, and the SQL oracle carries the same
    * cap so the semantics stay oracle-exact even when it binds.
    *
    * All-integer output: the DuckDB oracle walks the same graph with
    * a recursive CTE and takes min(dist) per node — a genuinely
    * different algorithm (path enumeration + aggregation vs frontier
    * expansion) agreeing on every integer, the q_triangles oracle
    * philosophy.
    */
  def bfsHops(edges0: DataFrame, maxRounds: Int = 30): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges0.sparkSession
    // Undirected adjacency: each (u < v) edge in both directions. The
    // traversal reads it every round — checkpoint once.
    val und = edges0.select(col("u").as("a"), col("v").as("b"))
      .unionAll(edges0.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(true)
    val seedRow = und.agg(min(col("a"))).head()
    if (seedRow.isNullAt(0)) {
      Checkpoints.free(und)
      import spark.implicits._
      return spark.emptyDataset[(Long, Long)].toDF("node", "dist")
    }
    val seed = seedRow.getLong(0)
    import spark.implicits._
    var dist = Seq((seed, 0L)).toDF("node", "dist").localCheckpoint(true)
    var frontier = dist.select("node")
    var frontierCp: DataFrame = null
    var round = 1L
    var continue = true
    while (continue && round <= maxRounds) {
      val next = frontier.join(und, frontier("node") === und("a"))
        .select(col("b").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(round).as("dist"))
        .localCheckpoint(true)
      if (next.isEmpty) {
        Checkpoints.free(next)
        continue = false
      } else {
        val superseded = dist
        dist = dist.unionAll(next).localCheckpoint(true)
        Checkpoints.free(superseded)
        if (frontierCp != null) Checkpoints.free(frontierCp)
        frontierCp = next
        frontier = next.select("node")
      }
      round += 1
    }
    if (frontierCp != null) Checkpoints.free(frontierCp)
    Checkpoints.free(und)
    dist
  }

  /** Per-row count-min degree estimate from a COLLECTED sketch: the
    * depth row vectors ride the plan as typedlit literals and the
    * estimate is the min over rows of the md5-cell lookup — the exact
    * [[graft.functions.CountMin.cell]] hash (first 48 bits of
    * md5("j:item") mod width), so the DuckDB oracle reproduces every
    * estimate bit-for-bit. A pure projection: scoring a node costs
    * depth md5s and ZERO joins or shuffles.
    */
  private def cmsEstimate(n: Column, sketch: Seq[Seq[Long]], width: Int): Column =
    sketch.zipWithIndex.map { case (rowVals, j) =>
      val cell = pmod(
        conv(substring(md5(concat(lit(s"$j:"), n.cast("string"))), 1, 12), 16, 10)
          .cast("long"),
        lit(width.toLong))
      element_at(typedlit(rowVals), (cell + 1).cast("int"))
    }.reduce(least(_, _))

  /** Per-round width schedule for [[kCoreApprox]]: the smallest power
    * of two ≥ loadFactor × the distinct-endpoint bound (2 · edges),
    * clamped to [minWidth, width0]. Deterministic in the surviving
    * edge count alone, so the SQL oracle re-derives the SAME width
    * per round from its own CTE's count — the adaptation never costs
    * the hash gate. A full-size graph keeps width0; late rounds of a
    * shrinking peel stop paying full-width plan literals and
    * sketch-aggregation state for a survivor set a fraction of the
    * size (the r7 disclosure: ~2·depth·width·8 B of literals per
    * round — 512 KB at 4×8192 — whether or not the graph still
    * needs it).
    */
  private[graft] def adaptiveWidth(edgeCount: Long, width0: Int,
                                   minWidth: Int, loadFactor: Int): Int = {
    val need = 2L * edgeCount * loadFactor
    var w = minWidth
    while (w < width0 && w < need) w *= 2
    w
  }

  /** Approximate k-core via count-min DEGREE SKETCHES — the peel for
    * graphs whose per-round exact degree table is itself a cost
    * problem. Each round: ONE mergeable sketch pass over edge
    * endpoints (O(depth·width) state, map-side combined — 256 KB at
    * 4×8192 regardless of node count), then a pure FILTER keeps edges
    * whose endpoints both estimate ≥ k. Compare [[kCore]]'s round
    * cost: a degree aggregation shuffle plus TWO left-semi join
    * shuffles; here the corpus-side work is a scan-stage projection —
    * at 10⁹ nodes the degree table never materializes at all.
    *
    * CMS error is ONE-SIDED (collisions only add), so a node is never
    * wrongly peeled: every round keeps a superset of what the exact
    * round keeps, and the result is a SUPERSET of the exact k-core —
    * the safe direction for a pre-filter (run exact peeling, or exact
    * degree audit, on the shrunken survivor graph when exactness
    * matters). Estimates are md5-deterministic and merges exact, so
    * the whole peel reproduces in DuckDB — the entry is hash-checked
    * at width=8192 where collisions are REAL, not vacuous.
    *
    * Width ADAPTS per round ([[adaptiveWidth]], round 8): as the peel
    * shrinks the survivor graph, the sketch re-sizes to the smallest
    * power of two holding loadFactor × the endpoint bound, floored at
    * minWidth — late rounds of a cascading peel carry KB-scale plan
    * literals instead of the full 512 KB, and the one-sided-error
    * contract is width-independent (smaller width only ever ADDS
    * collisions, which only ever KEEP nodes). Depth stays fixed: the
    * estimate is a min over depth rows, and holding it constant keeps
    * the estimate shape identical across rounds. `minWidth = width`
    * disables adaptation.
    *
    * Output: (node, deg) with EXACT degrees over the surviving
    * subgraph — one degree pass at the end (amortized once, unlike
    * the per-round tables the sketch replaced).
    */
  def kCoreApprox(edges0: DataFrame, k: Int, rounds: Int = 8,
                  depth: Int = 4, width: Int = 8192,
                  minWidth: Int = 512, loadFactor: Int = 4,
                  roundStats: Option[scala.collection.mutable.Buffer[(Long, Int)]] = None): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1")
    require(Integer.bitCount(minWidth) == 1 && Integer.bitCount(width) == 1,
      s"widths must be powers of two, got $minWidth/$width")
    val minW = math.min(minWidth, width) // a sub-minWidth width disables adaptation
    val spark = edges0.sparkSession
    var edges = edges0.localCheckpoint(true)
    var prev = edges.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val w = adaptiveWidth(prev, width, minW, loadFactor)
      roundStats.foreach(_ += ((prev, w)))
      val cmUdaf = udaf(new graft.functions.CountMinAggregator(depth, w),
        org.apache.spark.sql.Encoders.STRING)
      val sk = edges
        .select(explode(array(col("u").cast("string"), col("v").cast("string"))).as("n"))
        .agg(cmUdaf(col("n")).as("s")).head().getSeq[Long](0)
      val sketch = (0 until depth).map(j => sk.slice(j * w, (j + 1) * w))
      val superseded = edges
      edges = edges
        .filter(cmsEstimate(col("u"), sketch, w) >= k &&
          cmsEstimate(col("v"), sketch, w) >= k)
        .localCheckpoint(true)
      val c = edges.count()
      Checkpoints.free(superseded)
      converged = c == prev
      prev = c
      r += 1
    }
    edges.select(col("u").as("node")).unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** Wedge-volume diagnostic: how many candidate wedges a NAIVE
    * closure would generate (Σ C(deg, 2) — what a hub makes explode)
    * vs what the degree-ordered orientation generates
    * (Σ C(outdeg, 2), provably O(m^1.5) total). The pair to check
    * before running [[triangleCount]] on a new graph, and the number
    * [[graft.GraphRehearsal]] records at scale.
    */
  def wedgeStats(edges: DataFrame): (Long, Long) = {
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val naive = deg.agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L)))
      .head().getLong(0) / 2
    val du = deg.as("du")
    val dv = deg.as("dv")
    val uFirst = (col("du.d") < col("dv.d")) ||
      (col("du.d") === col("dv.d") && col("u") < col("v"))
    val outDeg = edges
      .join(du, col("u") === col("du.n"))
      .join(dv, col("v") === col("dv.n"))
      .select(when(uFirst, col("u")).otherwise(col("v")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("od"))
    val ordered = outDeg.agg(coalesce(sum(col("od") * (col("od") - 1)), lit(0L)))
      .head().getLong(0) / 2
    (naive, ordered)
  }
}
