package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale rehearsal for the iterative connected-components family:
  * measures rounds and wall time of O(diameter) min-label propagation
  * vs the O(log² n) alternating large/small-star variant on synthetic
  * edge sets whose diameter is the controlled variable — many parallel
  * chains of length L (the "successive near-dup edits" shape) plus a
  * clique mix (the "identical re-uploads" shape). The table this
  * prints is committed in SURVEY §5 as the empirical crossover record.
  *
  * Usage: runMain graft.CcRehearsal [maxChainLen]
  */
object CcRehearsal {

  /** `chains` disjoint paths of `len` nodes + `cliques` disjoint
    * 8-cliques, as a (doc_a, doc_b) pair frame.
    */
  def syntheticPairs(spark: SparkSession, chains: Long, len: Long,
                     cliques: Long): DataFrame = {
    val chainEdges = spark.range(chains * len)
      .select(col("id"), (col("id") % len).as("pos"))
      .filter(col("pos") < len - 1)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val base = chains * len
    val cliqueEdges = spark.range(cliques * 64)
      .select((col("id") / 64).cast("long").as("c"),
        ((col("id") % 64) / 8).cast("long").as("i"),
        (col("id") % 8).as("j"))
      .filter(col("i") < col("j"))
      .select((lit(base) + col("c") * 8 + col("i")).as("doc_a"),
        (lit(base) + col("c") * 8 + col("j")).as("doc_b"))
    chainEdges.unionByName(cliqueEdges)
  }

  def main(args: Array[String]): Unit = {
    val maxLen = args.headOption.map(_.toLong).getOrElse(64L)
    val spark = GraftSession.local()
    for (len <- Seq(4L, 16L, 64L, 256L).filter(_ <= maxLen)) {
      // hold total node count roughly constant (~1.3M) so the variable
      // is diameter, not volume
      val chains = (1L << 20) / len
      val pairs = syntheticPairs(spark, chains, len, cliques = 2000L)
        .localCheckpoint(true)
      val nEdges = pairs.count()
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val ((propLabels, propRounds), propSec) =
        time(Dedup.connectedComponentsCounted(pairs))
      val nProp = propLabels.count()
      val ((altLabels, altRounds), altSec) =
        time(Dedup.connectedComponentsAlternatingCounted(pairs))
      val nAlt = altLabels.count()
      require(nProp == nAlt, s"label row counts diverged: $nProp vs $nAlt")
      println(f"[cc] chainLen=$len%4d edges=$nEdges%8d " +
        f"propagation: rounds=$propRounds%3d ${propSec}%7.1f s | " +
        f"alternating: rounds=$altRounds%3d ${altSec}%7.1f s")
    }
    spark.stop()
  }
}
