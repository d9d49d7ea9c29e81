package org.apache.spark.sql.graftfilter

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._

/** Semi-join reduction via a bloom filter (SURVEY §2.10).
  *
  * The same mechanism as Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`: a `BloomFilterAggregate` scalar subquery
  * feeding `BloomFilterMightContain` on the probe side), exposed as a
  * library step so it can be applied where the optimizer's
  * injection heuristics don't reach — a pre-filter feeding an
  * aggregation, an incremental-dedup membership probe, or a join the
  * planner sized wrong. Lives under `org.apache.spark.sql` because
  * `BloomFilterMightContain` / `ExpressionUtils` are `private[sql]`-
  * adjacent internals, same placement as the graftvec expressions.
  *
  * Scale contract: the filter itself is KBs–MBs (for 1M dim keys at
  * 1% fpp, ~1.2 MB) and ships to executors as a literal — the fact
  * side never shuffles to discover non-matching rows; they die in
  * the scan stage. False positives are removed by the exact join
  * that follows, so composed results are IDENTICAL to the plain
  * join at any fpp.
  *
  * Hashing contract: keys are hashed with `xxhash64` (seed 42) on
  * BOTH the build side (`buildOver`) and the probe side
  * (`mightContain`), and the bloom is built over those longs via the
  * driver-side `stat.bloomFilter` (`putLong`), which
  * `BloomFilterMightContain.mightContainLong` then tests — the same
  * long-in/long-out pairing Spark's injected runtime filter uses.
  */
object BloomPrune {

  /** Build a bloom filter over `xxhash64(dim(keyCol))`, serialized to
    * the byte format `BloomFilterMightContain` deserializes. The
    * build is one aggregate over the (already filtered, small) dim
    * side; the driver round-trip is the library-level equivalent of
    * the subquery-result broadcast in Spark's injected filter.
    */
  def buildOver(dim: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): Array[Byte] = {
    val hashed = dim.select(xxhash64(col(keyCol)).as("h"))
    // stat.bloomFilter NPEs on an empty frame (null aggregation
    // buffer); an empty build side is a valid filter that rejects
    // every probe — stay total
    val bf =
      if (hashed.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      else hashed.stat.bloomFilter("h", expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen-capable probe predicate: `might_contain(bloom, xxhash64(key))`. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(lit(bloomBytes)),
      ExpressionUtils.expression(xxhash64(key))))
}
