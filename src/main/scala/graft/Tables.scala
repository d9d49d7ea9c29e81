package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver-generated star schema
  * (see TESTDATA.md). Every loader takes the scale-factor directory
  * explicitly because the driver passes it per query.
  *
  * Scans stay lazy DataFrames so Catalyst can push filters and prune
  * columns into the parquet reader — callers should never cache or
  * collect here.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** The physical type the events fixture encodes `ts` as. The driver
    * has shipped two encodings across rounds — int64 TIMESTAMP(NANOS)
    * (rounds 1–7) and Arrow `timestamp[us]` / TIMESTAMP_NTZ (round 8+)
    * — so the loader probes the footer instead of assuming either.
    * One footer read; no data scan.
    *
    * `nanosAsLong` is set BEFORE the probe: under it the nanos
    * encoding surfaces as LongType (Spark's vectorized reader rejects
    * TIMESTAMP(NANOS) otherwise) while the µs encodings surface as
    * their timestamp types, so the probed type is exactly the branch
    * discriminator.
    */
  private[graft] def eventsTsType(spark: SparkSession, dir: String): org.apache.spark.sql.types.DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
  }

  /** Normalize a raw events frame (whose `ts` has the probed physical
    * type) to the engine's convention: `ts_ns` = exact epoch nanos
    * (Long, for ordering/gap math) and `ts` = microsecond
    * TimestampType (for windows/buckets). Shared by the batch loader
    * and the streaming reader so both branches are pinned to the SAME
    * output schema — a format drift can flip the input branch but
    * never the downstream types.
    *
    * Fail-loud contract: an `ts` encoding that is neither int64-nanos
    * nor a µs timestamp type throws here, naming the file and type.
    * The streaming path in particular must never silently reinterpret
    * (a forced LongType schema over µs data shrinks every interval
    * 1000× and yields plausible-but-wrong answers, not errors — the
    * round-8 failure class this guard makes impossible).
    */
  private[graft] def normalizeEventTs(raw: DataFrame, tsType: org.apache.spark.sql.types.DataType,
                                      file: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    tsType match {
      case LongType =>
        // legacy int64 TIMESTAMP(NANOS), surfaced as raw nano longs.
        // Integer `div` — not `/` — because epoch-nanos exceed 2^53
        // and a double round-trip would corrupt them.
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType | TimestampType =>
        // timestamp[us]. For NTZ (isAdjustedToUTC=false) the session
        // is pinned to UTC (GraftSession), so the NTZ→TZ cast is an
        // exact reinterpretation of the same micros. ts is re-derived
        // from ts_ns so both branches emit the identical plan shape
        // and TimestampType output the legacy path always produced.
        raw.withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .select("event_id", "ts_ns", "user_id", "event_type", "value", "props")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case other =>
        throw new IllegalStateException(
          s"Unsupported physical type for events.ts in $file: $other. " +
            "Supported encodings: int64 TIMESTAMP(NANOS) (read as long) " +
            "and timestamp[us] (TIMESTAMP / TIMESTAMP_NTZ). Refusing to " +
            "guess — a silent reinterpretation would corrupt every " +
            "event-time interval.")
    }
  }

  /** events loader: schema-adaptive over the fixture's two historical
    * `ts` encodings (see [[eventsTsType]]); always exposes `ts_ns`
    * (exact epoch nanos, Long) and `ts` (microsecond TimestampType).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val tsType = eventsTsType(spark, dir)
    normalizeEventTs(load(spark, dir, "events"), tsType, s"$dir/events.parquet")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
