package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{GraphStreams, MaintIO}

/** Scale rehearsal for the SCC family (batch + incremental
  * maintenance) on a planted ≥1M-edge multi-SCC digraph — the
  * CdcRehearsal discipline: measure the real trajectories, assert
  * the planted structure exactly, and let the numbers force design
  * changes. The table this prints is committed in SURVEY §5.
  *
  * The planted mixture:
  *  - GIANT cycle over [0, g): one SCC of size g with diameter g —
  *    the adversary for every label-propagation SCC (coloring rounds
  *    scale with SCC diameter). Under the 1M-edge gate the driver
  *    Tarjan absorbs it in milliseconds; past the gate a
  *    long-diameter SCC is honestly expensive for FW-BW — which the
  *    rehearsal documents rather than hides (real web/social graphs
  *    have low-diameter SCCs; a 10⁶-diameter cycle does not survive
  *    contact with any frontier algorithm).
  *  - m MEDIUM cycles of size s over [g, g + m·s): the multi-SCC
  *    bulk; each collapses the moment its last edge arrives.
  *  - a DAG tail over [g + m·s, …): hash edges oriented low → high
  *    (acyclic by construction) — trim food, all singletons.
  *  - one-way bridges from the giant cycle into every medium cycle
  *    and the DAG base (connect without creating cycles).
  *
  * Streamed face: the same edges hash-sharded into nBatches
  * micro-batches through [[GraphStreams.sccMergeBatch]], recording
  * per-batch wall time, the (labels, merge-log, condensation) state
  * trajectory, and the pruned merge-bucket read counter; then
  * [[GraphStreams.sccCompact]] and a bit-identical resolution check
  * against the batch decomposition.
  *
  * Usage: runMain graft.SccRehearsal [g] [m] [s] [dagEdges] [nBatches]
  */
object SccRehearsal {

  def plantedDigraph(spark: SparkSession, g: Long, m: Long, s: Long,
                     dagEdges: Long): DataFrame = {
    val giant = spark.range(g)
      .select(col("id").as("u"), pmod(col("id") + 1L, lit(g)).as("v"))
    val med = spark.range(m * s).select(
      (col("id") + g).as("u"),
      (when(pmod(col("id"), lit(s)) === (s - 1), col("id") - (s - 1))
        .otherwise(col("id") + 1) + g).as("v"))
    val dagBase = g + m * s
    val dag = spark.range(dagEdges)
      .select((abs(xxhash64(col("id"), lit(7))) % dagEdges).as("a"),
        (abs(xxhash64(col("id"), lit(8))) % dagEdges).as("b"))
      .filter(col("a") =!= col("b"))
      .select((least(col("a"), col("b")) + dagBase).as("u"),
        (greatest(col("a"), col("b")) + dagBase).as("v"))
      .distinct()
    val bridges = spark.range(m)
      .select(lit(0L).as("u"), (col("id") * s + g).as("v"))
      .unionByName(spark.range(1).select(lit(0L).as("u"), lit(dagBase).as("v")))
    giant.unionByName(med).unionByName(dag).unionByName(bridges)
  }

  def main(args: Array[String]): Unit = {
    val a = args.filter(_.forall(_.isDigit)).map(_.toLong)
    val g = a.headOption.getOrElse(500000L)
    val m = a.drop(1).headOption.getOrElse(2000L)
    val s = a.drop(2).headOption.getOrElse(100L)
    val dagEdges = a.drop(3).headOption.getOrElse(280000L)
    val nBatches = a.drop(4).headOption.getOrElse(4L).toInt
    val spark = GraftSession.local()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val edges = plantedDigraph(spark, g, m, s, dagEdges).localCheckpoint(true)
    val nEdges = edges.count()
    println(s"[scc-rehearsal] planted digraph: $nEdges edges " +
      s"(giant=$g, medium=$m x $s, dag<=$dagEdges)")

    // ---- batch decomposition (driver-Tarjan gate) ----
    val (scc, tBatch) = time {
      graft.operators.Graph.stronglyConnectedComponents(edges).localCheckpoint(true)
    }
    val sizes = scc.groupBy("scc_label").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"[scc-rehearsal] batch SCC (gate path): $tBatch%.1f s; " +
      s"size histogram ${sizes.toSeq.sortBy(-_._1).mkString(", ")}")
    assert(sizes(g) == 1L, s"expected one giant SCC of $g, got $sizes")
    assert(sizes(s) == m, s"expected $m medium SCCs of $s, got $sizes")
    assert(sizes.keySet == Set(g, s, 1L), s"unexpected SCC sizes: $sizes")

    // ---- distributed FW-BW probe on a LOW-DIAMETER mixture ----
    // Coloring rounds scale with SCC diameter, so the distributed
    // path is probed on a shape it can honestly own (many small
    // cycles + DAG bulk): rounds ≈ cycle size + trim passes. The
    // giant-cycle adversary above is deliberately NOT fed to it —
    // first measured attempt blew the 60-round budget at diameter
    // 500k, which is precisely why the gate prefers the collected
    // Tarjan whenever the (condensed) graph fits one machine.
    val probe = plantedDigraph(spark, 0L, 500L, 8L, 30000L).localCheckpoint(true)
    val nProbe = probe.count()
    val (sccDist, tDist) = time {
      graft.operators.Graph.stronglyConnectedComponents(probe, driverGate = 0L)
        .localCheckpoint(true)
    }
    val (sccGate, tGate) = time {
      graft.operators.Graph.stronglyConnectedComponents(probe).localCheckpoint(true)
    }
    val probeDiff = sccDist.withColumnRenamed("scc_label", "sl")
      .join(sccGate, Seq("node"))
      .filter(col("sl") =!= col("scc_label")).count()
    println(f"[scc-rehearsal] distributed probe ($nProbe edges, diameter<=8): " +
      f"FW-BW $tDist%.1f s vs gate $tGate%.1f s; label diffs = $probeDiff")
    assert(probeDiff == 0L, "distributed path drifted from the driver Tarjan")

    // ---- streamed maintenance trajectory ----
    val base = java.nio.file.Files.createTempDirectory("graft-scc-rehearsal-").toString
    val (lbls, mrg, qe) = (s"$base/labels", s"$base/merges", s"$base/qedges")
    val sharded = edges
      .withColumn("h", pmod(xxhash64(col("u"), col("v")), lit(nBatches.toLong)))
      .localCheckpoint(true)
    (0 until nBatches).foreach { b =>
      val mr0 = MaintIO.mergeBucketReads.get()
      val (_, tB) = time {
        GraphStreams.sccMergeBatch(
          sharded.filter(col("h") === b.toLong).select(col("u"), col("v")),
          b.toLong, lbls, mrg, qe, 16)
      }
      val (nl, nm, nq) = GraphStreams.sccStateStats(spark, lbls, mrg, qe)
      println(f"[scc-rehearsal] batch $b: $tB%.1f s; state labels=$nl " +
        s"merges=$nm condensation=$nq " +
        s"mergeBucketReads=+${MaintIO.mergeBucketReads.get() - mr0}")
    }
    val (streamed, tResolve) = time {
      GraphStreams.sccResolve(spark, lbls, mrg).localCheckpoint(true)
    }
    val diff = streamed.withColumnRenamed("scc_label", "sl").as("a")
      .join(scc.as("b"), Seq("node"), "full_outer")
      .filter(col("sl").isNull || col("scc_label").isNull ||
        col("sl") =!= col("scc_label"))
      .count()
    println(f"[scc-rehearsal] streamed resolve: $tResolve%.1f s; " +
      s"label diffs vs batch = $diff")
    assert(diff == 0L, "streamed SCC drifted from the batch decomposition")

    // ---- compaction: log truncates, resolution unchanged ----
    val (_, tCompact) = time { GraphStreams.sccCompact(spark, lbls, mrg, 16) }
    val (nl2, nm2, nq2) = GraphStreams.sccStateStats(spark, lbls, mrg, qe)
    val diff2 = GraphStreams.sccResolve(spark, lbls, mrg)
      .withColumnRenamed("scc_label", "sl")
      .join(scc, Seq("node"))
      .filter(col("sl") =!= col("scc_label")).count()
    println(f"[scc-rehearsal] sccCompact: $tCompact%.1f s; " +
      s"state labels=$nl2 merges=$nm2 condensation=$nq2; drift=$diff2")
    assert(diff2 == 0L && nm2 == 0L)
    spark.stop()
  }
}
