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
  }

  /** True iff `path` holds at least one actual data FILE (recursing
    * through partition dirs). A zero-row `partitionBy` write leaves a
    * `batch=N` dir containing only `_SUCCESS` — [[hasVisibleData]]
    * counts that dir as visible, but `spark.read.parquet` on a tree
    * with no data files fails schema inference ("Unable to infer
    * schema"). Guard every read of a delta tree whose batches can
    * legitimately be empty with THIS probe instead.
    */
  private[streaming] def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    def visible(p: org.apache.hadoop.fs.Path): Boolean = {
      val n = p.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def walk(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { s =>
        visible(s.getPath) && (if (s.isDirectory) walk(s.getPath) else true)
      }
    walk(root)
  }

  /** Crash recovery for a [[swapInstall]] that died between retiring
    * the live table and installing the staged one: the retired copy
    * IS the table — put it back. No-op in every other state. Call on
    * entry at every site that reads or rewrites the table (the
    * VectorStreams `healPairs` contract, shared).
    */
  private[streaming] def healSwap(spark: SparkSession, livePath: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(livePath)
    val retired = new org.apache.hadoop.fs.Path(livePath + "_swap_retired")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live) && fs.exists(retired)) {
      require(fs.rename(retired, live),
        s"swap recovery: could not restore $retired to $live")
    }
  }

  /** Install an already-written `<livePath>_swap_staging` over the
    * live table via rename-aside, never delete-then-write: a crash
    * between a delete and the new write would silently EMPTY the
    * maintained table (the retry then computes from nothing, no
    * error anywhere). With the aside, every crash point leaves
    * either the old table or the new one on disk; a crash in the one
    * retire→install gap is healed by [[healSwap]] on next entry.
    */
  private[streaming] def swapInstall(spark: SparkSession, livePath: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(livePath)
    val staging = new org.apache.hadoop.fs.Path(livePath + "_swap_staging")
    val retired = new org.apache.hadoop.fs.Path(livePath + "_swap_retired")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(retired, true) // leftover from a healed earlier crash
    if (fs.exists(live)) {
      require(fs.rename(live, retired), s"swap: could not retire $live")
    }
    if (!fs.rename(staging, live)) {
      // put the old table back rather than leave none at all
      if (fs.exists(retired)) fs.rename(retired, live)
      throw new IllegalStateException(s"swap: could not install $staging")
    }
    fs.delete(retired, true)
  }
}
