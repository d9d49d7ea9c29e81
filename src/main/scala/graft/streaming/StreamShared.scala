package graft.streaming

import org.apache.spark.sql.SparkSession

/** Spec-visible I/O counters for the graph-maintenance batch path:
  * the scale contract ("a no-improvement batch never scans the
  * maintained edge store; dist reads are bucket-pruned") is asserted
  * by diffing these across a batch, not taken on faith. */
private[graft] object MaintIO {
  /** Full edge-store materializations (the lazy `adj()` firing). */
  val edgeStoreReads = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Claim-store bucket partitions read (pruned dist loads). */
  val distBucketReads = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Merge-log bucket partitions read (the pruned closure walker). */
  val mergeBucketReads = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** Shared state-store probes for the streaming maintenance modules. */
private[streaming] object StreamState {
  /** True iff `path` holds at least one visible (non-underscore,
    * non-dot) entry — a dir containing only commit markers reads as
    * absent.
    */
  private[streaming] def hasVisibleData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }}
