package graft
import org.apache.spark.sql.SparkSession

/** Dev profiling aid: time named queries in the given order within one
  * session, after an optional warmup, printing per-run times (not just
  * min-of-2) so cold-start vs steady-state is visible.
  *
  * Usage: runMain graft.BenchOne <sfDir> [--warmup] name1 name2 ...
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val warmup = args.contains("--warmup")
    val names = args.drop(1).filterNot(_ == "--warmup")
    val spark = GraftSession.local()
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink, not count(): the full-materialization forcing the
      // main bench uses (count() lets the optimizer drop branches)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      // Bench's isolation rule, which this harness was missing: drop
      // blocks leaked by iterative operators' localCheckpoint(true)
      // so pass N+1 starts from a clean block manager — at sf1 the
      // accumulation measured as q_triangles 55 s → 83 s → 128 s
      // across three passes of identical code
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      t
    }
    // host-speed index first (Bench's probe): every BenchOne log line
    // set is interpretable against another host/run without guessing
    val cal = Bench.calibrationProbe(spark)
    println(f"[benchone] calibration: $cal%.2f s")
    if (warmup) {
      val t = timeOnce(SparkEntry.queries("q1_agg"))
      println(f"[benchone] warmup q1_agg: $t%.2f s")
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val a = timeOnce(fn); val b = timeOnce(fn); val c = timeOnce(fn)
      println(f"[benchone] $n%-28s run1=$a%6.2f run2=$b%6.2f run3=$c%6.2f min=${math.min(a, math.min(b, c))}%6.2f s")
    }
    spark.stop()
  }
}
