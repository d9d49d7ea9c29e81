package graft
// dev aid: run one query once and print a per-Spark-job breakdown
// (duration, stage/task counts, callsite) so the fixed-overhead
// structure of iterative/streamed operators is visible — the local
// stand-in for the Spark UI's Jobs page (guide §1.1/§7.1; the UI is
// disabled in the deployment session). Not part of the library.
import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap

object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val noAqe = args.contains("--noaqe")
    val timeline = args.contains("--timeline")
    val names = args.drop(1).filterNot(a => a == "--noaqe" || a == "--timeline")
    val spark = GraftSession.local()
    // measurement-only A/B flag: how much of a fixpoint loop's cost is
    // AQE stage-materialization job overhead (never used by the
    // deployed mains — AQE stays on in GraftSession)
    if (noAqe) spark.conf.set("spark.sql.adaptive.enabled", "false")
    case class J(start: Long, var end: Long = -1L, var stages: Int = 0,
                 var tasks: Int = 0, site: String)
    // per-job "what action was this" label: the name of the job's
    // final stage (Spark stage names carry the action's callsite)
    val jobs = new ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val last = e.stageInfos.maxByOption(_.stageId).map(_.name).getOrElse("?")
        jobs.put(e.jobId, J(e.time, site = last.takeWhile(_ != '+').trim,
          stages = e.stageInfos.size, tasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    })
    names.foreach { n =>
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.flatMap(id => Option(jobs.get(id)).map(id -> _))
      val totalJob = js.map { case (_, j) => math.max(0L, j.end - j.start) }.sum / 1e3
      println(f"[jobprofile] ===== $n wall=$wall%.2f s, jobs=${js.size}, sum(job)=$totalJob%.2f s =====")
      if (timeline) js.foreach { case (id, j) =>
        println(f"[jobprofile]   #$id%-4d ${math.max(0L, j.end - j.start) / 1e3}%7.2f s tasks=${j.tasks}%-5d ${j.site}")
      }
      // aggregate by callsite
      js.groupBy(_._2.site).toSeq
        .map { case (s, g) => (s, g.size, g.map(x => math.max(0L, x._2.end - x._2.start)).sum / 1e3,
          g.map(_._2.tasks).sum) }
        .sortBy(-_._3)
        .take(30)
        .foreach { case (s, n1, secs, tasks) =>
          println(f"[jobprofile]   $secs%8.2f s  n=$n1%-4d tasks=$tasks%-6d $s")
        }
    }
    spark.stop()
  }
}
