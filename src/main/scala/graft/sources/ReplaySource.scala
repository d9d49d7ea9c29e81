package graft.sources

import java.util
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A replayable-offset streaming source — the "Kafka-shaped"
  * production contract row 41g's rate-limited file source only
  * approximates (SURVEY §2.8): records live in a seq-numbered log,
  * offsets are explicit integers, each micro-batch is the half-open
  * range (start, end], and restarting from a committed offset N
  * re-delivers EXACTLY the records with seq > N — bit-identical
  * replay, because log segments are immutable and keyed by seq, not
  * by file arrival time.
  *
  * Like Kafka's source the schema is FIXED — (seq, key, value) —
  * and payloads are opaque strings the pipeline parses downstream;
  * the log directory stands in for a topic-partition, segments for
  * the broker's segment files (names carry their seq range, so
  * offset arithmetic never opens a file). Admission control
  * (`maxSeqPerTrigger`) is the `maxOffsetsPerTrigger` analogue: a
  * restart after downtime drains the backlog at a bounded per-batch
  * pace instead of one giant catch-up batch.
  *
  * Single-writer contract per log dir (a Kafka partition is also a
  * single total order); [[ReplayLog.append]] assigns the contiguous
  * seq range and writes the segment ATOMICALLY (temp-file rename),
  * so a reader never observes a half-written segment.
  *
  * Usage:
  * {{{
  *   spark.readStream.format(ReplayLog.FORMAT)
  *     .option("path", logDir).option("maxSeqPerTrigger", "100").load()
  * }}}
  */
object ReplayLog {
  val FORMAT = "graft.sources.ReplaySourceProvider"

  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  private def fs(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(new org.apache.hadoop.conf.Configuration())

  /** Segment files are `<firstSeq>_<lastSeq>.seg`; the highest
    * committed seq is readable from the LISTING alone. −1 = empty. */
  def latestSeq(logDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val f = fs(logDir)
    if (!f.exists(p)) return -1L
    f.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".seg"))
      .map(_.stripSuffix(".seg").split("_")(1).toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Append records as one immutable segment with the next contiguous
    * seq range. Values are base64ed so arbitrary payloads (newlines,
    * tabs) survive the line format. Returns the (first, last) seqs. */
  def append(logDir: String, records: Seq[(Long, String)]): (Long, Long) = {
    require(records.nonEmpty, "empty append")
    val f = fs(logDir)
    val dir = new org.apache.hadoop.fs.Path(logDir)
    f.mkdirs(dir)
    val first = latestSeq(logDir) + 1
    val last = first + records.size - 1
    val tmp = new org.apache.hadoop.fs.Path(dir, s".${first}_$last.seg.tmp")
    val out = f.create(tmp, true)
    try {
      records.zipWithIndex.foreach { case ((k, v), i) =>
        val line = s"${first + i}\t$k\t${Base64.getEncoder.encodeToString(
          v.getBytes(StandardCharsets.UTF_8))}\n"
        out.write(line.getBytes(StandardCharsets.UTF_8))
      }
    } finally out.close()
    require(f.rename(tmp, new org.apache.hadoop.fs.Path(dir, s"${first}_$last.seg")),
      s"could not commit segment ${first}_$last")
    (first, last)
  }

  /** All segments overlapping the half-open range (start, end]. */
  private[sources] def segmentsIn(logDir: String, start: Long,
                                  end: Long): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(logDir)
    val f = fs(logDir)
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".seg"))
      .flatMap { sp =>
        val Array(a, b) = sp.getName.stripSuffix(".seg").split("_").map(_.toLong)
        if (b > start && a <= end) Some((sp.toString, a, b)) else None
      }.sortBy(_._2).toSeq
  }
}

class ReplaySourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ReplayTable(properties.get("path"),
      Option(properties.get("maxSeqPerTrigger")).map(_.toLong))
}

class ReplayTable(path: String, maxSeqPerTrigger: Option[Long])
    extends Table with SupportsRead {
  require(path != null, "graft-replay needs .option(\"path\", <logDir>)")
  override def name(): String = s"graft-replay:$path"
  override def schema(): StructType = ReplayLog.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplayLog.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, maxSeqPerTrigger)
      }
    }
}

/** An offset is just the highest seq delivered so far. */
case class ReplayOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class ReplayMicroBatchStream(logDir: String, maxSeqPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: snapshot the log end at query
  // start; admission then drains UP TO that seq in bounded batches
  // and stops, even if appends keep landing
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = Some(ReplayLog.latestSeq(logDir))
  }

  override def initialOffset(): Offset = ReplayOffset(-1L)

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxSeqPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[ReplayOffset].seq
    val logEnd = availableNowEnd.getOrElse(ReplayLog.latestSeq(logDir))
    val capped = limit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(logEnd, start + rl.maxRows())
      case _ => logEnd
    }
    ReplayOffset(math.max(start, capped))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(ReplayLog.latestSeq(logDir))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].seq
    val e = end.asInstanceOf[ReplayOffset].seq
    ReplayLog.segmentsIn(logDir, s, e)
      .map { case (file, a, b) =>
        ReplayInputPartition(file, math.max(s, a - 1), math.min(e, b))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new ReplayPartitionReader(partition.asInstanceOf[ReplayInputPartition])
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One segment file, delivering seqs in (start, end]. */
case class ReplayInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

class ReplayPartitionReader(p: ReplayInputPartition)
    extends PartitionReader[InternalRow] {
  private val in = {
    val path = new org.apache.hadoop.fs.Path(p.file)
    val f = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    new java.io.BufferedReader(new java.io.InputStreamReader(
      f.open(path), StandardCharsets.UTF_8))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val Array(seq, key, v64) = line.split("\t", 3)
      val s = seq.toLong
      if (s > p.start && s <= p.end) {
        row = InternalRow(s, key.toLong, UTF8String.fromBytes(
          Base64.getDecoder.decode(v64)))
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Driver-side helpers for wiring the replay log into a drive. */
object ReplayStream {
  /** The streaming frame over a replay log. */
  def read(spark: SparkSession, logDir: String,
           maxSeqPerTrigger: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val r = spark.readStream.format(ReplayLog.FORMAT).option("path", logDir)
    maxSeqPerTrigger.fold(r)(n => r.option("maxSeqPerTrigger", n.toString)).load()
  }
}
