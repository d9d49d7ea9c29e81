package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal (binary-payload) columns for a training-data pipeline
  * (SURVEY §2.6).
  *
  * Model: media lives as an opaque `binary` column plus a typed
  * metadata struct; heavy per-item work (decode, resize,
  * feature-extract, frame-sample) runs BATCHED per partition via
  * `mapPartitions` — the genuinely imperative hot loop where a
  * declarative plan adds nothing. The decode itself is STUBBED with a
  * deterministic byte-level transform because no image/audio codecs
  * ship in this environment; the Spark-side plumbing (schema,
  * batching, partition balance) is real and is what the 100 TB design
  * stands on. Real deployments swap `decodeStub` for a codec and keep
  * every plan shape.
  */
object Multimodal {

  /** Attach the opaque payload + typed metadata. The payload here is
    * the utf-8 text bytes (the container has no media files); schema
    * and plumbing are what matter.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        col("source").as("kind")))

  /** Per-item metadata extraction — runs entirely in codegen, no
    * decode. This is the cheap pre-filter pass a real pipeline runs
    * before paying for decode.
    */
  def metadata(documents: DataFrame): DataFrame =
    withPayload(documents).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.payload_md5").as("payload_md5"),
      col("meta.kind").as("kind"))

  /** The exact integer byte-histogram behind [[decodeStub]] — kept as
    * longs so counts stay exact at any payload size (a float32
    * histogram is only exact below 2^24 per bucket; a multi-GB
    * payload concentrated in one bucket would round).
    */
  def histStub(payload: Array[Byte], dim: Int): Array[Long] = {
    val hist = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      hist(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1L
      i += 1
    }
    hist
  }

  /** STUB decode: deterministic fixed-size feature vector from raw
    * bytes (a folded byte histogram, L1-normalized). Stands in for
    * image decode + embed; same signature: bytes -> float[dim].
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val total = math.max(payload.length, 1).toFloat
    histStub(payload, dim).map(_ / total)
  }

  /** Payloads repartitioned so each partition carries roughly
    * `targetPartitionBytes` of payload — batches stay balanced even
    * when item sizes skew. Shared by every decode-shaped pass.
    */
  private def balancedPayloads(documents: DataFrame,
                               targetPartitionBytes: Long): Dataset[(Long, Array[Byte])] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val payloads = withPayload(documents)
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
    // balance: total bytes / target -> partition count (min 1);
    // coalesce(0) because sum over zero rows is null
    val totalBytes = payloads.agg(coalesce(sum("n_bytes"), lit(0L))).head.getLong(0)
    val nParts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    payloads
      .repartition(nParts, col("doc_id"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
  }

  /** Batched feature extraction: one `mapPartitions` pass, items
    * processed in fixed-size batches (the shape a GPU/codec library
    * wants). Partition count is sized by total payload bytes so
    * batches stay balanced even when item sizes skew.
    */
  def features(documents: DataFrame, dim: Int = 16, batchSize: Int = 64,
               targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    balancedPayloads(documents, targetPartitionBytes)
      .mapPartitions { it =>
        // batch the iterator: a real decoder amortizes setup per batch
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => (id, decodeStub(bytes, dim)) }
        }
      }
      .toDF("doc_id", "features")
  }

  /** The decode pass projected to driver-comparable scalars: exact
    * integer byte-histogram counts (f0..f{dim-1} columns), computed
    * directly in the same balanced/batched mapPartitions shape as
    * [[features]] via [[histStub]] — no float round-trip, so counts
    * are exact at ANY payload size, and the schema is one a SQL
    * oracle can verify bit-for-bit (the rows-only comparator cannot
    * hash raw arrays).
    */
  def featureCounts(documents: DataFrame, dim: Int = 16, batchSize: Int = 64,
                    targetPartitionBytes: Long = 64L << 20): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    balancedPayloads(documents, targetPartitionBytes)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => (id, histStub(bytes, dim)) }
        }
      }
      .toDF("doc_id", "counts")
      .select(col("doc_id") +: (0 until dim).map(i =>
        element_at(col("counts"), i + 1).as(s"f$i")): _*)
  }

  /** Frame-sample shape: emit every `stride`-th fixed-width slice of
    * the payload (video frame-sampling plumbing; slices are "frames").
    */
  def frameSample(documents: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).map { f =>
          (id, f.toLong, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }
}
