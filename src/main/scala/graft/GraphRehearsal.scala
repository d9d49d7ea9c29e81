package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Scale rehearsal for degree-ordered triangle counting: measures the
  * wedge volumes and wall time on synthetic million-edge graphs whose
  * hub skew is the controlled variable — the regime where a naive
  * wedge join is infeasible and the degree orientation is the whole
  * algorithm. The table this prints is committed in SURVEY §5.
  *
  * Shapes:
  *  - celebrity: one hub adjacent to every leaf, leaves in a ring —
  *    naive wedge volume at the hub is C(n, 2) (10¹¹+ at n=10⁶, dead
  *    on arrival), ordered volume is O(n) because every hub edge
  *    orients INTO the hub and leaf out-degree is ≤ 3. Triangles = n
  *    (each ring edge closes with the hub), an exact expectation the
  *    rehearsal asserts.
  *  - uniform: Erdős–Rényi-ish random graph (hash-derived endpoints),
  *    where ordered wedges track the m^1.5 bound.
  *
  * Usage: runMain graft.GraphRehearsal [leaves] [uniformEdges]
  */
object GraphRehearsal {

  /** Hub 0 adjacent to leaves 1..n; leaves form a ring. */
  def celebrityGraph(spark: SparkSession, n: Long): DataFrame = {
    val hubEdges = spark.range(1, n + 1)
      .select(lit(0L).as("u"), col("id").as("v"))
    val ringEdges = spark.range(1, n)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
      .unionByName(spark.range(1, 2)
        .select(lit(1L).as("u"), lit(n).as("v")))
    hubEdges.unionByName(ringEdges)
  }

  /** ~m hash-random edges over n nodes (canonicalized u < v,
    * deduplicated, self-loops dropped).
    */
  def uniformGraph(spark: SparkSession, n: Long, m: Long): DataFrame =
    spark.range(m)
      .select((abs(xxhash64(col("id"), lit(1))) % n).as("a"),
        (abs(xxhash64(col("id"), lit(2))) % n).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()

  def main(args: Array[String]): Unit = {
    val leaves = args.filter(_.forall(_.isDigit)).headOption.map(_.toLong).getOrElse(1000000L)
    val uniEdges = args.filter(_.forall(_.isDigit)).drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.local()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // ---- round-8 adaptive-width k-core rehearsal (`kcore` arg): a
    // 24-clique embedded in a 30k-node ring — at k=10 the degree-2
    // ring peels in the first rounds (its estimates are ~2 + modest
    // collision noise at 8192 cells) and the surviving subgraph is
    // two orders of magnitude smaller, exactly the regime the width
    // ladder exists for. A low-degree sea is the honest fixture: a
    // dense random sea at 10⁵ nodes saturates every cell past k and
    // nothing peels — the documented CMS regime where width must
    // track node count. Prints the per-round (edges, width) schedule
    // plus wall adaptive vs fixed; the structural win is
    // deterministic (late rounds carry KB-scale literals and sketch
    // state instead of 512 KB), wall parity is the check that
    // adaptation doesn't COST anything at this scale.
    if (args.contains("kcore")) {
      import spark.implicits._
      val cliqueIds = (1000000L until 1000024L)
      val clique = (for (i <- cliqueIds; j <- cliqueIds if i < j) yield (i, j))
        .toDF("u", "v")
      val ring = spark.range(30000L)
        .select(col("id").as("u"), ((col("id") + 1) % 30000L).as("v"))
      val g = ring.unionByName(clique).localCheckpoint(true)
      Graph.kCoreApprox(g, 10, 8).count() // untimed codegen/JIT warmup
      val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      val (coreA, secA) = time(Graph.kCoreApprox(g, 10, 8,
        roundStats = Some(stats)).count())
      val (coreF, secF) = time(Graph.kCoreApprox(g, 10, 8, minWidth = 8192).count())
      println(s"[kcore] schedule (edges -> width): " +
        stats.map { case (e, w) => s"$e->$w" }.mkString(", "))
      println(f"[kcore] adaptive: $coreA nodes in $secA%.1f s | " +
        f"fixed 8192: $coreF nodes in $secF%.1f s")
      assert(stats.last._2 < stats.head._2,
        s"peel must shrink the width ladder: $stats")
      assert(coreA == 24L, s"the 24-clique is the 10-core, got $coreA nodes")
      spark.stop()
      return
    }
    // ---- round-9 traversal-family rehearsal (`paths` arg): the
    // SSSP/LPA/MST/k-truss/BFS/diameter wave at million-edge scale
    // with hub skew as the controlled variable. celebrity(10⁶):
    // round-1 BFS frontier is the ENTIRE leaf set at once (the
    // hub-skew case a per-node traversal dies on), and the double
    // sweep must report diameter_lb = 2 exactly. uniform(2M):
    // wall times for the weighted/relabel/contract iteratives,
    // plus the MSF SIZE IDENTITY |forest| = nodes − components
    // checked against an independent CC — the structural assert
    // that the contraction loop neither drops nor double-picks.
    if (args.contains("paths")) {
      println("| op | graph | result | sec |")
      println("|---|---|---|---|")
      val celeb = celebrityGraph(spark, leaves).localCheckpoint(true)
      val (nB, secB) = time(Graph.bfsHops(celeb).count())
      assert(nB == leaves + 1, s"hub BFS must reach all ${leaves + 1} nodes, got $nB")
      println(s"| bfsHops | celebrity(n=$leaves) | $nB nodes | ${f"$secB%.1f"} |")
      val (rowD, secD) = time(Graph.diameterDoubleSweep(celeb).head())
      assert(rowD.getLong(3) == 2L, s"hub+ring diameter_lb must be 2, got $rowD")
      println(s"| diameterDoubleSweep | celebrity | lb=${rowD.getLong(3)} | ${f"$secD%.1f"} |")
      val uni = uniformGraph(spark, leaves / 10, uniEdges).localCheckpoint(true)
      val wuni = uni.withColumn("w",
        (abs(xxhash64(col("u"), col("v"))) % 9 + 1)).localCheckpoint(true)
      val (nS, secS) = time(Graph.sssp(wuni).count())
      println(s"| sssp | uniform(m=$uniEdges) | $nS reached | ${f"$secS%.1f"} |")
      val (nL, secL) = time(Graph.labelPropagation(uni).count())
      println(s"| labelPropagation(5) | uniform | $nL labeled | ${f"$secL%.1f"} |")
      val (nM, secM) = time(Graph.mstBoruvka(wuni).count())
      val nNodes = uni.select(explode(array(col("u"), col("v"))).as("n"))
        .distinct().count()
      val nComp = graft.operators.Dedup.connectedComponentsAlternating(
          uni.select(col("u").as("doc_a"), col("v").as("doc_b")))
        .select("component_id").distinct().count()
      assert(nM == nNodes - nComp,
        s"MSF size identity violated: $nM edges, $nNodes nodes, $nComp components")
      println(s"| mstBoruvka | uniform | $nM edges = $nNodes−$nComp | ${f"$secM%.1f"} |")
      val (nT, secT) = time(Graph.kTruss(Graph.sampleEdges(uni, 250), 4, 4).count())
      println(s"| kTruss(4, p=¼) | uniform | $nT edges survive | ${f"$secT%.1f"} |")
      spark.stop()
      return
    }
    // ---- round-9 incremental-maintenance rehearsal (`incremental`
    // arg): THE number that justifies `stream_bfs` — on a 2M-edge
    // graph with distances already maintained, how much does a 1%
    // edge delta cost versus recomputing BFS from scratch? The delta
    // batch relaxes only from the new edges' reached endpoints, so
    // its wave usually dies in a round or two; the full recompute
    // pays O(diameter) frontier rounds over everything. Asserts the
    // maintained result still equals the recompute bit-for-bit.
    if (args.contains("incremental")) {
      import graft.streaming.{EventStreams, GraphStreams, IngestStreams}
      val uni = uniformGraph(spark, 100000L, 2000000L).localCheckpoint(true)
      val seed = uni.agg(least(min(col("u")), min(col("v")))).head().getLong(0)
      val nAll = uni.count()
      val head = uni.limit((nAll - nAll / 100).toInt).localCheckpoint(true)
      val delta = uni.exceptAll(head).localCheckpoint(true)
      val tiny = delta.limit(200).localCheckpoint(true)
      val deltaRest = delta.exceptAll(tiny).localCheckpoint(true)
      val state = java.nio.file.Files.createTempDirectory("graft-inc-").toString + "/s"
      val (_, secBase) = time(GraphStreams.bfsBatch(head, 0L, state, seed, 40))
      val (_, secDelta) = time(GraphStreams.bfsBatch(deltaRest, 1L, state, seed, 40))
      val (_, secTiny) = time(GraphStreams.bfsBatch(tiny, 2L, state, seed, 40))
      val (_, secFull) = time(Graph.bfsHopsFrom(uni, seed, 40).count())
      val maintained = GraphStreams.bfsResolve(spark, state).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val recomputed = Graph.bfsHopsFrom(uni, seed, 40).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(maintained == recomputed, "maintained distances drifted from recompute")
      println(f"[incremental] initial build (99%% of 2M edges): $secBase%.1f s")
      println(f"[incremental] ~1%% delta batch (${deltaRest.count()} edges): $secDelta%.1f s")
      println(f"[incremental] tiny delta batch (200 edges):     $secTiny%.1f s")
      println(f"[incremental] full BFS recompute:                $secFull%.1f s")
      spark.stop()
      return
    }
    // ---- round-8 DOULION multi-p table (`doulion` arg): one graph
    // (planted 30-clique + uniform sea, exact count known by running
    // the exact counter), estimates at p ∈ {125..1000}‰ — the
    // variance/cost dial committed as a table in SURVEY §5 the way
    // the ANN recall sweep is. Sampled edge volume tracks p, wedge
    // work ~p², relative error grows as p shrinks — the table shows
    // where the dial stops being useful for THIS triangle density.
    if (args.contains("doulion")) {
      import spark.implicits._
      val cliqueIds = (2000000L until 2000030L)
      val clique = (for (i <- cliqueIds; j <- cliqueIds if i < j) yield (i, j))
        .toDF("u", "v")
      val g = uniformGraph(spark, 20000L, 400000L)
        .unionByName(clique).distinct().localCheckpoint(true)
      val exact = Graph.triangleCount(g).head().getLong(2)
      println(s"[doulion] exact triangles = $exact")
      println("| p (permille) | edges kept | sampled triangles | estimate | rel err | sec |")
      println("|---|---|---|---|---|---|")
      for (p <- Seq(125, 250, 375, 500, 750, 1000)) {
        val (row, sec) = time(Graph.triangleCountApprox(g, keepPermille = p).head())
        val (ne, ts, est) = (row.getLong(0), row.getLong(1), row.getLong(2))
        val rel = math.abs(est - exact).toDouble / exact
        println(f"| $p | $ne | $ts | $est | $rel%.3f | $sec%.1f |")
      }
      spark.stop()
      return
    }
    println("| graph | nodes | edges | naive wedges | ordered wedges | triangles | sec |")
    println("|---|---|---|---|---|---|---|")

    val celeb = celebrityGraph(spark, leaves).localCheckpoint(true)
    val (naiveC, orderedC) = Graph.wedgeStats(celeb)
    val (rowC, secC) = time(Graph.triangleCount(celeb).head())
    assert(rowC.getLong(2) == leaves,
      s"celebrity graph must close exactly $leaves triangles, got ${rowC.getLong(2)}")
    println(s"| celebrity(n=$leaves) | ${rowC.getLong(0)} | ${rowC.getLong(1)} " +
      s"| $naiveC | $orderedC | ${rowC.getLong(2)} | ${f"$secC%.1f"} |")

    val uni = uniformGraph(spark, leaves / 10, uniEdges).localCheckpoint(true)
    val (naiveU, orderedU) = Graph.wedgeStats(uni)
    val (rowU, secU) = time(Graph.triangleCount(uni).head())
    println(s"| uniform(n=${leaves / 10}) | ${rowU.getLong(0)} | ${rowU.getLong(1)} " +
      s"| $naiveU | $orderedU | ${rowU.getLong(2)} | ${f"$secU%.1f"} |")

    spark.stop()
  }
}
