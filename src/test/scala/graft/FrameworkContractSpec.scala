package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** §2.1 rows 6-9: the reference framework's execution contract,
  * expressed as Spark-native guarantees.
  *
  * Reference probes (cited, not copied): plugin/mtiming.go /
  * rtiming.go (parallel workers), jobcount.go (task accounting),
  * crash.go / nocrash.go (idempotent re-execution after worker
  * death), early_exit.go (output invisible until job completion).
  */
object FrameworkContractSpec {
  // Static so executor threads (same JVM at local[*]) and the driver
  // observe the same counters.
  val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  val attempts = new AtomicInteger(0)
}

class FrameworkContractSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("jobcount: one task per partition, counted via SparkListener") {
    val taskCount = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = taskCount.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = 8
      spark.sparkContext.parallelize(1 to 1000, n).map(_ * 2).sum()
      // listener events are async; poll until they drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while (taskCount.get() < n && System.nanoTime() < deadline) Thread.sleep(50)
      assert(taskCount.get() == n)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("parallelism: map tasks actually overlap (mtiming contract)") {
    import FrameworkContractSpec._
    inFlight.set(0); maxInFlight.set(0)
    spark.sparkContext.parallelize(1 to 4, 4).foreach { _ =>
      val now = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, now))
      Thread.sleep(300)
      inFlight.decrementAndGet()
    }
    assert(maxInFlight.get() >= 2, s"tasks never overlapped (max=${maxInFlight.get()})")
  }

  test("crash recovery: first attempt of a task dies, job still correct") {
    import FrameworkContractSpec._
    attempts.set(0)
    val result = spark.sparkContext.parallelize(1 to 100, 4).mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        attempts.incrementAndGet()
        throw new RuntimeException("simulated worker crash (crash.go contract)")
      }
      it
    }.sum()
    assert(attempts.get() == 1, "the crash branch ran")
    assert(result == (1 to 100).sum, "retried task re-executed idempotently")
  }

  test("atomic output: committed parquet has _SUCCESS and no temp files") {
    val out = java.nio.file.Files.createTempDirectory("graft-commit-").toString + "/t"
    Tables.nation(spark, SharedSpark.sf).write.parquet(out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.contains("_SUCCESS"), "commit marker missing")
    assert(!files.exists(_.startsWith("_temporary")), "uncommitted temp dir visible")
    assert(files.count(_.endsWith(".parquet")) > 0)
  }
}
