package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for sampled betweenness centrality (the
  * SccRehearsal discipline): a planted ≥1M-edge graph whose
  * top-betweenness nodes are KNOWN by construction, the k-source
  * dial measured at k ∈ {4, 16, 64}, and rank stability checked
  * against an EXACT all-sources Brandes (driver-local) on a subset
  * small enough to afford it. The table this prints is committed in
  * SURVEY §5.
  *
  * The planted structure: two random halves (avg degree ~8) joined
  * ONLY through `nBridges` bridge nodes — every cross-half shortest
  * path routes through a bridge, so the bridges must dominate any
  * betweenness ranking that deserves the name. Bridge ids sit at the
  * TOP of the id range because [[graft.operators.Graph
  * .betweennessApprox]] samples its k sources from the smallest ids:
  * the sources are ordinary half-A nodes and the bridges must earn
  * their rank through accumulated dependency, not by being sources.
  *
  * Usage: runMain graft.BetweennessRehearsal [nPerHalf] [edgesPerHalf]
  */
object BetweennessRehearsal {

  def plantedBridgeGraph(spark: SparkSession, nPerHalf: Long,
                         edgesPerHalf: Long, nBridges: Int,
                         fanout: Int, seed: Int): DataFrame = {
    def half(base: Long, saltA: Int, saltB: Int): DataFrame =
      spark.range(edgesPerHalf)
        .select((abs(xxhash64(col("id"), lit(saltA))) % nPerHalf + base).as("u"),
          (abs(xxhash64(col("id"), lit(saltB))) % nPerHalf + base).as("v"))
        .filter(col("u") =!= col("v"))
    val a = half(0L, seed, seed + 1)
    val b = half(nPerHalf, seed + 2, seed + 3)
    val bridgeBase = 2L * nPerHalf
    // each bridge: `fanout` deterministic anchors per half
    val bridges = spark.range(nBridges.toLong * fanout).select(
        ((col("id") / fanout).cast("long") + bridgeBase).as("bridge"),
        (abs(xxhash64(col("id"), lit(seed + 4))) % nPerHalf).as("ia"),
        (abs(xxhash64(col("id"), lit(seed + 5))) % nPerHalf + nPerHalf).as("ib"))
    bridges.select(col("bridge").as("u"), col("ia").as("v"))
      .unionByName(bridges.select(col("bridge").as("u"), col("ib").as("v")))
      .unionByName(a.select(col("u"), col("v")))
      .unionByName(b.select(col("u"), col("v")))
      .distinct()
  }

  /** Exact all-sources Brandes (undirected, unweighted) on the
    * driver — the oracle for the rank-stability check; only ever run
    * on the small subset. */
  def exactBrandes(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (u, v) =>
      adj(u) = v :: adj.getOrElse(u, Nil)
      adj(v) = u :: adj.getOrElse(v, Nil)
    }
    val nodes = adj.keys.toArray
    val bc = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    for (s <- nodes) {
      val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
      val pred = scala.collection.mutable.Map.empty[Long, List[Long]]
        .withDefaultValue(Nil)
      val sigma = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      val dist = scala.collection.mutable.Map.empty[Long, Long]
      sigma(s) = 1.0
      dist(s) = 0L
      val queue = scala.collection.mutable.Queue(s)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        stack += v
        for (w <- adj.getOrElse(v, Nil)) {
          if (!dist.contains(w)) {
            dist(w) = dist(v) + 1
            queue.enqueue(w)
          }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v)
            pred(w) = v :: pred(w)
          }
        }
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for (w <- stack.reverseIterator) {
        for (v <- pred(w)) {
          delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        if (w != s) bc(w) += delta(w)
      }
    }
    bc.toMap
  }

  def main(args: Array[String]): Unit = {
    val a = args.filter(_.forall(_.isDigit)).map(_.toLong)
    val nPerHalf = a.headOption.getOrElse(125000L)
    val edgesPerHalf = a.drop(1).headOption.getOrElse(500000L)
    val nBridges = 3
    val spark = GraftSession.local()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- rank stability vs EXACT Brandes on the affordable subset
    val smallN = 1500L
    val smallEdges = plantedBridgeGraph(spark, smallN, 6000L, nBridges, 8, 101)
      .localCheckpoint(true)
    val smallPairs = smallEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    println(s"[bc-rehearsal] small subset: ${smallPairs.size} edges, " +
      s"${2 * smallN + nBridges} nodes — exact all-sources Brandes on the driver")
    val (exact, tExact) = time(exactBrandes(smallPairs))
    val exactTop20 = exact.toSeq.sortBy { case (n, b) => (-b, n) }
      .take(20).map(_._1).toSet
    val smallBridges = (2 * smallN until 2 * smallN + nBridges).toSet
    println(f"[bc-rehearsal] exact Brandes: $tExact%.1f s; " +
      s"bridges in exact top-3: ${
        exact.toSeq.sortBy { case (n, b) => (-b, n) }.take(nBridges)
          .map(_._1).toSet == smallBridges}")
    for (k <- Seq(4, 16, 64)) {
      val (approx, t) = time(graft.operators.Graph
        .betweennessApprox(smallEdges, k, 20).collect())
      val approxTop = approx.map(_.getLong(0)).toSet
      val overlap = (approxTop & exactTop20).size
      val bridgesFound = (approxTop & smallBridges).size
      println(f"[bc-rehearsal] small k=$k%-3d wall=$t%6.1f s  " +
        s"top20-overlap-vs-exact=$overlap/20  bridges-in-top20=$bridgesFound/$nBridges")
    }
    graft.operators.Checkpoints.free(smallEdges)

    // ---- the k dial at planted-bridge 1M-edge scale
    val edges = plantedBridgeGraph(spark, nPerHalf, edgesPerHalf, nBridges, 8, 7)
      .localCheckpoint(true)
    val nEdges = edges.count()
    val bridgeIds = (2 * nPerHalf until 2 * nPerHalf + nBridges).toSet
    println(s"[bc-rehearsal] planted graph: $nEdges edges, " +
      s"${2 * nPerHalf + nBridges} nodes, $nBridges bridge nodes")
    var prevTop: Set[Long] = Set.empty
    for (k <- Seq(4, 16, 64)) {
      val (rows, t) = time(graft.operators.Graph
        .betweennessApprox(edges, k, 20).collect())
      val top = rows.map(_.getLong(0)).toSet
      val stability = if (prevTop.isEmpty) "-" else s"${(top & prevTop).size}/20"
      val bridgesFound = (top & bridgeIds).size
      println(f"[bc-rehearsal] big   k=$k%-3d wall=$t%6.1f s  " +
        s"bridges-in-top20=$bridgesFound/$nBridges  overlap-vs-prev-k=$stability")
      require(bridgesFound == nBridges,
        s"planted bridges missing from k=$k top-20: $top")
      prevTop = top
    }
    spark.stop()
  }
}
