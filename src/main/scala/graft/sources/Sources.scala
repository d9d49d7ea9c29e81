package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Input/output surface (SURVEY §2 sources/sinks).
  *
  * The reference consumes whole text files (data/pg-*.txt, one map
  * task per file — core/coordinator.go hands out one file per task);
  * [[readTextCorpus]] reproduces that contract distributed. The rest
  * is the source/sink set a pipeline needs around the parquet star
  * schema.
  *
  * 100 TB rules encoded here:
  *  - NEVER infer schemas: inference is a full extra pass over the
  *    data. Every reader takes an explicit StructType and FAILFAST
  *    so bad rows stop the job instead of silently nulling.
  *  - Writes go through the committing parquet writer (atomic
  *    visibility, spec'd in FrameworkContractSpec) with explicit
  *    partitioning; bucketed tables pre-materialize the join/agg
  *    hash partitioning so downstream joins on the bucket key skip
  *    their shuffle entirely.
  */
object Sources {

  /** (file name, whole contents) — the reference's input shape, one
    * row per file, read in parallel (one task per file).
    */
  def readTextCorpus(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(pathGlob)
      .select(input_file_name().as("doc_name"), col("value").as("text"))

  /** Line-oriented text (one row per line, with source file). */
  def readTextLines(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.text(pathGlob)
      .select(input_file_name().as("doc_name"), col("value").as("line"))

  /** Raw media ingest: one row per file as an opaque binary payload —
    * the on-ramp into the §2.6 multimodal pipeline (whose operators
    * all take a `binary` column; this is where that column comes
    * from when media arrives as files rather than parquet).
    * Spark's `binaryFile` source reads (path, modificationTime,
    * length, content) with the file list — not the bytes — driving
    * task planning, and `pathGlobFilter` prunes non-matching files
    * BEFORE any are opened. `maxBytes` guards the executor: the
    * length predicate PUSHES into the binaryFile scan (length is a
    * metadata column — Spark skips oversized files without ever
    * reading their bytes), so one rogue artifact in a 100 TB media
    * drop can't OOM a task mid-decode (`binaryFile` cannot split a
    * file across tasks, so payloads must fit task memory by
    * contract); the spec pins the skip.
    */
  def readBinaryCorpus(spark: SparkSession, dir: String,
                       glob: String = "*", maxBytes: Long = 512L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes)
      .select(element_at(split(col("path"), "/"), -1).as("media_name"),
        col("length"), col("content"))

  /** STREAMING twin of [[readBinaryCorpus]] — continuous media ingest
    * (the `binaryFile` FileFormat works under FileStreamSource, so a
    * landing directory becomes an unbounded source; files process in
    * modification-time order). Same projection, same pushed length
    * guard, same glob prune — a batch pipeline over a media drop and
    * an always-on ingest share one row shape, which is what lets the
    * phash maintenance face ([[graft.streaming.EventStreams
    * .mediaPhashIngest]]) consume either.
    */
  def readBinaryCorpusStream(spark: SparkSession, dir: String,
                             glob: String = "*",
                             maxBytes: Long = 512L << 20): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", org.apache.spark.sql.types.StringType),
        StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        StructField("length", org.apache.spark.sql.types.LongType),
        StructField("content", org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", "16")
      .load(dir)
      .filter(col("length") <= maxBytes)
      .select(element_at(split(col("path"), "/"), -1).as("media_name"),
        col("length"), col("content"))

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON Lines with explicit schema (jsonl is the interchange format
    * of most LLM-data tooling).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Quarantining CSV ingest — the production complement of
    * [[readCsv]]'s FAILFAST: a crawled/vendor feed at 100 TB WILL
    * contain malformed rows, and failing the whole job on row
    * 3-billion-and-one is not a strategy. PERMISSIVE mode with a
    * corrupt-record column splits the read into (clean rows, raw
    * quarantined lines) in ONE scan pass; clean rows flow on with the
    * declared schema, the quarantine frame carries the ORIGINAL line
    * text for repair/audit. Row counts are conserved (clean +
    * quarantined = input lines — spec-pinned), so a silent drop is
    * structurally impossible; FAILFAST remains the right mode when
    * the contract is "this feed must be perfect".
    */
  def readCsvQuarantine(spark: SparkSession, path: String, schema: StructType,
                        header: Boolean = true): (DataFrame, DataFrame) =
    quarantineSplit(schema, withCorrupt => spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path))

  /** [[readCsvQuarantine]] for JSON Lines — same split, same count
    * conservation; a malformed line (bad JSON, type mismatch against
    * the declared schema) quarantines with its original text.
    */
  def readJsonlQuarantine(spark: SparkSession, path: String,
                          schema: StructType): (DataFrame, DataFrame) =
    quarantineSplit(schema, withCorrupt => spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path))

  private val CorruptCol = "_corrupt_record"

  private def quarantineSplit(schema: StructType,
                              read: StructType => DataFrame): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(CorruptCol,
        org.apache.spark.sql.types.StringType))
    // Spark requires the corrupt-record query to materialize from a
    // stable frame (SPARK-21610: filtering the lazily-parsed column
    // directly is disallowed) — cache the parsed form once
    val raw = read(withCorrupt).cache()
    val clean = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col): _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine)
  }

  def readParquetTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Backpressure knobs for [[rateLimitedStream]] — the file-source
    * analogue of a Kafka consumer's `maxOffsetsPerTrigger`: bound how
    * much of a (possibly huge) backlog each micro-batch admits, so a
    * restart after downtime drains at a stable, state-store-sized pace
    * instead of one giant catch-up batch that OOMs the stateful
    * operators downstream. At least one bound must be set; both
    * together mean "whichever limit hits first" (Spark semantics).
    */
  final case class RateLimit(maxFilesPerTrigger: Option[Int] = Some(1),
                             maxBytesPerTrigger: Option[Long] = None) {
    require(maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty,
      "a rate limit needs at least one bound")
  }

  /** Rate-limited streaming read over a file directory — the named
    * source abstraction for "Kafka-shaped" ingestion without a broker:
    * files arrive in a landing directory (the offset log is the file
    * listing), each trigger admits a bounded slice, and exactly-once
    * accounting comes from the checkpoint's committed offsets exactly
    * as with a broker source. Stateful aggregates downstream stay
    * EXACT across the induced micro-batch boundaries (spec-pinned:
    * state merges across triggers; the throttled run equals the
    * single-batch run row for row).
    */
  def rateLimitedStream(spark: SparkSession, path: String, schema: StructType,
                        limit: RateLimit = RateLimit()): DataFrame = {
    val base = spark.readStream.schema(schema)
    val withFiles = limit.maxFilesPerTrigger.fold(base)(n =>
      base.option("maxFilesPerTrigger", n.toString))
    val withBytes = limit.maxBytesPerTrigger.fold(withFiles)(b =>
      withFiles.option("maxBytesPerTrigger", b.toString))
    withBytes.parquet(path)
  }

  /** Hive-style partitioned parquet: the layout that makes partition
    * pruning work (WHERE on a partition column never touches other
    * directories).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table: pre-hashes rows into `numBuckets` by
    * `bucketCol` so equi-joins/aggregations on that key read
    * co-located buckets instead of shuffling — the standard answer to
    * "this fact-fact join shuffles 100 TB every run".
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(tableName)
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC round-trip — the other columnar format large warehouses
    * standardize on; same pushdown/pruning contract as parquet
    * (predicate pushdown via ORC stripe stats, column projection via
    * ReadSchema), verified in the source spec.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrcTable(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Idempotent partition overwrite — the re-run contract a daily
    * pipeline needs: INSERT OVERWRITE semantics scoped to only the
    * partitions present in `df` (dynamic mode), so re-running one
    * day's job replaces exactly that day's directory and never
    * touches — or worse, deletes — the other 364. Static mode (the
    * default) would truncate EVERY partition first; at 100 TB that
    * is the difference between an idempotent retry and a data-loss
    * incident.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      // writer-level option, NOT a session-conf mutation: scoped to
      // exactly this write, so concurrent writes on the session can
      // never observe (or race the restore of) the dynamic mode
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Compacting writer — the answer to the small-files problem (a
    * 100 TB pipeline that writes one file per post-shuffle partition
    * per run drowns its metastore and its next scan in tiny files).
    * Range-repartition on `sortCol` to `numFiles` output partitions:
    * each file holds one contiguous, internally-sorted key range, so
    * downstream range predicates on `sortCol` prune whole files via
    * parquet min/max stats, and file count is an explicit knob
    * instead of an accident of the previous shuffle.
    */
  def writeCompacted(df: DataFrame, path: String, sortCol: String,
                     numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Morton (Z-order) value: the low `bits` bits of two non-negative
    * integer columns interleaved (x in even positions, y in odd), so
    * points close in BOTH dimensions are close in the 1-D sort key.
    * Built purely from shiftright/and/shiftleft/or — whole-stage
    * codegen folds the 2·bits-term chain into straight-line JVM
    * bytecode; no UDF.
    *
    * `bits` must cover the value range (values ≥ 2^bits alias onto
    * the same key prefix — clustering degrades, correctness of the
    * WRITE is unaffected since the key is dropped).
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int = 21): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "1..31 interleave bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-order clustered write — [[writeCompacted]] generalized to TWO
    * filter dimensions. A 1-D sort prunes files only for predicates
    * on the sort column; range-partitioning + sorting on the Morton
    * key gives every file a small min/max box in BOTH dimensions, so
    * a 2-D box predicate (or a predicate on just the second column)
    * skips most files via parquet min/max stats. This is the same
    * layout trick Delta/Iceberg expose as OPTIMIZE ZORDER BY — here
    * as a plain parquet write, no table format required
    * (SourcesSpec pins the skipping effect file-by-file).
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
                  numFiles: Int, bits: Int = 21): Unit =
    df.withColumn("__zorder_key", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__zorder_key"))
      .sortWithinPartitions(col("__zorder_key"))
      .drop("__zorder_key")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Grouped secondary-sort export — the MapReduce "secondary sort"
    * contract (partition by key, iterate each key's values in value
    * order) as a declarative write: hash-repartition on the group
    * key, sort within partitions by (group, order), write. Every
    * group then lives WHOLE in exactly one file, internally ordered —
    * the layout a per-key sequential consumer (timeline export,
    * per-user training episodes, log replay) streams without any
    * further shuffle or sort, and the within-file contract a
    * [[writeBucketed]] table gives readers, available on a plain
    * directory.
    *
    * The sort is per-partition only (tasks sort their own slice —
    * no range exchange, no global order), so the write costs ONE
    * shuffle; at 100 TB the per-task sort spills gracefully rather
    * than concentrating any key range on one node. Skewed groups
    * land whole by construction; a group too large for one task's
    * disk is the signal to range-split THAT key explicitly
    * (the [[graft.operators.Relational.skewProfile]] pre-flight).
    */
  def writeGroupedSorted(df: DataFrame, groupCol: String, orderCol: String,
                         path: String, numFiles: Int): Unit =
    df.repartition(numFiles, col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
}
