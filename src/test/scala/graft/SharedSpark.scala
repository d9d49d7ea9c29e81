package graft

import org.apache.spark.sql.SparkSession

/** One session for the whole test JVM (suites share it; Spark sessions
  * are expensive and local[4] is plenty for sf0.001).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    // local[4,4]: 4 threads AND maxFailures=4, so the crash-recovery
    // contract spec can observe a task retry succeed (default local
    // mode fails the job on first task failure).
    val s = SparkSession.builder()
      .master("local[4,4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
