package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for iterative operators.
  *
  * Every round of CC / k-core / PageRank materializes an EAGER
  * `localCheckpoint` to keep the logical plan constant-size, but
  * `Dataset.unpersist` only drops the CacheManager entry — the
  * checkpoint RDD's MEMORY_AND_DISK blocks stay resident until driver
  * GC happens to collect the reference. Per query that is harmless;
  * in an always-on session (or the ~345-execution bench loop) the
  * superseded rounds accumulate into real block-manager pressure.
  * [[free]] reaches the RDD behind the frame and unpersists it NOW.
  */
private[graft] object Checkpoints {

  /** Unpersist the storage behind an eager localCheckpoint-ed frame
    * once it is SUPERSEDED. The checkpoint is the frame's only
    * storage (its lineage is truncated), so callers must free a round
    * only after its successor — or the operator's final output — has
    * materialized.
    */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Raise a frame's partition count to the session's parallelism
    * before CPU-heavy per-row work (window explodes, md5 probe
    * filters). Byte-based split sizing (`maxPartitionBytes`, AQE
    * advisory bytes) under-parallelizes operators whose per-row cost
    * dwarfs their per-row bytes — a single small parquet file scans
    * as ONE task, and a 35×-row explode or a per-row digest then
    * serializes on it (measured: the suffix bootstrap explode ran
    * 2.2 s single-task at sf0.1). No-op when the frame already has
    * at least the session's parallelism (a real at-scale scan), so
    * this never repartitions DOWN and never adds a shuffle where
    * parallelism already exists. Results are partitioning-invariant
    * at every call site (explode → groupBy, filter).
    *
    * PRECONDITION (r15 ADVICE): batch frames whose plan is scan/
    * filter/project-only up to this point. The partition probe goes
    * through `df.rdd`, which (a) throws on a streaming frame and
    * (b) under AQE would eagerly materialize any upstream exchange
    * in a SEPARATE QueryExecution and then re-execute it in the
    * returned frame. Every current call site is a parquet scan +
    * row-local work (no exchange above it), where `.rdd` is a pure
    * metadata read; the require below fails loud rather than let a
    * future streaming caller hit the opaque `.rdd` error.
    */
  def cpuSplit(df: DataFrame): DataFrame = {
    require(!df.isStreaming,
      "cpuSplit probes df.rdd and is batch-only; wrap the batch side")
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
