package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

/** Dev tuning aid: recall@k of the ANN paths vs the exact brute-force
  * baseline, over the (planes × bands) LSH grid and the
  * (nCells × probes) IVF grid. The table this prints at sf0.1 is
  * committed in SURVEY §5; the spec gate asserts the shipped defaults'
  * row stays ≥ 0.9.
  *
  * Usage: runMain graft.RecallSweep <sfDir>
  */
object RecallSweep {
  def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val emb = Tables.embeddings(spark, sfDir)
    val k = 10
    val nq = 8
    val exact = pairs(Similarity.bruteForceTopK(emb, nq, k))
    def recall(df: DataFrame): Double =
      (exact intersect pairs(df)).size.toDouble / exact.size
    println(f"[sweep] corpus=${emb.count()} queries=$nq k=$k exact_pairs=${exact.size}")
    for {
      planes <- Seq(16, 24, 32, 48)
      bands <- Seq(4, 8, 16)
      if planes % bands == 0 && planes / bands >= 2
    } {
      val r = recall(Similarity.annTopK(emb, nq, k, numPlanes = planes, bands = bands))
      println(f"[sweep] lsh planes=$planes%2d bands=$bands%2d recall=$r%.3f")
    }
    for {
      nCells <- Seq(8, 16, 32)
      probes <- Seq(1, 2, 4, 8) :+ nCells
      if probes <= nCells
    } {
      val r = recall(Similarity.annTopKIvf(emb, nq, k, nCells = nCells, probes = probes))
      println(f"[sweep] ivf cells=$nCells%2d probes=$probes%2d recall=$r%.3f")
    }
    spark.stop()
  }
}
