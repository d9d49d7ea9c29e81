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

  /** Tiling plan for patch-based vision preprocessing (ViT-style):
    * one row per tile with its pixel extents, edge tiles clipped —
    * the schedule a patch-embedding pass maps over. Image dimensions
    * come from the STUBBED decode (deterministic fake dims derived
    * from payload length — the container has no real media; a
    * deployment swaps in the decoder's width/height and keeps every
    * downstream shape). All-integer arithmetic (`(w+7) div tile`
    * grid, `least(tile, w − x0)` clipping), so the SQL oracle
    * reproduces every tile row.
    *
    * Scale shape: a pure projection + two bounded explodes — tiles
    * per image is O((w/tile)·(h/tile)), bounded by the image, never
    * the corpus; no shuffle at all.
    */
  def tilePlan(documents: DataFrame, tile: Int = 8): DataFrame = {
    val t = tile.toLong
    withPayload(documents)
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("w", lit(16L) + col("n_bytes") % 48L)
      .withColumn("h", lit(16L) + expr("n_bytes div 48") % 48L)
      .withColumn("nx", expr(s"(w + ${t - 1}) div $t"))
      .withColumn("ny", expr(s"(h + ${t - 1}) div $t"))
      .select(col("doc_id"), col("w"), col("h"),
        explode(sequence(lit(0L), col("nx") - 1)).as("tx"),
        col("ny"))
      .select(col("doc_id"), col("w"), col("h"), col("tx"),
        explode(sequence(lit(0L), col("ny") - 1)).as("ty"))
      .select(col("doc_id"), col("tx"), col("ty"),
        (col("tx") * t).as("x0"), (col("ty") * t).as("y0"),
        least(lit(t), col("w") - col("tx") * t).as("tw"),
        least(lit(t), col("h") - col("ty") * t).as("th"))
  }

  /** Perceptual hash (average-hash family) of the payload, split into
    * `nBands` band values for the banded hamming join: bit i is set
    * iff histogram bucket i sits strictly above the payload mean
    * (`hist[i]·dim > totalBytes` — integer-exact, no float mean).
    * Runs over the same stubbed byte-histogram "decode" as
    * [[features]]; a real deployment swaps in a DCT/aHash over
    * decoded pixels and keeps every downstream shape.
    */
  def phashBands(documents: DataFrame, dim: Int = 64, nBands: Int = 4): DataFrame =
    phashBandsFromPayload(
      withPayload(documents).select(col("doc_id"), col("payload")), dim, nBands)

  /** [[phashBands]] over RAW payload rows (doc_id, payload) — the
    * genuinely-binary face: media bytes arriving from a `binaryFile`
    * source never round-trip through a string column (which would
    * corrupt non-UTF-8 payloads). */
  def phashBandsFromPayload(payloads: DataFrame, dim: Int = 64,
                            nBands: Int = 4): DataFrame = {
    require(dim % nBands == 0, "dim must split evenly into bands")
    val bandWidth = dim / nBands
    require(bandWidth <= 62, "band values must fit a long")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, stubBands(bytes, dim, nBands)) }
      .toDF("doc_id", "phash_bands")
  }

  /** The histogram-stub band computation for one payload — the
    * fallback [[phashBandsDecoded]] drops to when a payload isn't a
    * decodable image. */
  private[graft] def stubBands(bytes: Array[Byte], dim: Int,
                               nBands: Int): Seq[Long] = {
    val bandWidth = dim / nBands
    val h = histStub(bytes, dim)
    val total = bytes.length.toLong
    (0 until nBands).map { b =>
      var acc = 0L
      var j = 0
      while (j < bandWidth) {
        if (h(b * bandWidth + j) * dim > total) acc |= (1L << j)
        j += 1
      }
      acc
    }
  }

  /** Perceptual-hash near-duplicates: pairs within `maxHamming` bits.
    * The simhash shape (§2.3 row 24) applied to media payloads:
    * candidates ONLY from band-equality collisions (pigeonhole — with
    * `nBands > maxHamming`, any pair within the threshold agrees on
    * ≥1 whole band, so banding loses nothing), then the exact hamming
    * filter via codegen `bit_count(xor)` over the band arrays. Every
    * join is an equality join on a scalar (band, value) key; the
    * phash frame is checkpointed once for its three consumers so the
    * decode pass never re-runs.
    *
    * `maxBandDf` caps candidate fan-out exactly like the
    * `maxShingleDf` cap on [[Dedup.ngramJaccard]]'s posting lists:
    * a (band, value) bucket holding more than the cap is dropped
    * whole before pair expansion. Without it the self-join costs
    * Σ bucket² — and the histogram stub concentrates homogeneous
    * corpora into a handful of buckets (measured at sf0.1: ONE
    * bucket holds all 5 000 docs, 12.5 M candidate pairs; capped at
    * 100 the same corpus emits 51 k). The cap affects RECALL only,
    * conservatively: a pair is missed only when EVERY band it
    * collides in is hotter than the cap — buckets so hot they carry
    * no near-dup signal. Worst case is cap²/2 candidates per kept
    * bucket regardless of corpus size. The SQL oracles mirror the
    * cap, so the gate pins the capped semantics.
    */
  def phashNearDup(documents: DataFrame, dim: Int = 64, nBands: Int = 4,
                   maxHamming: Int = 3, maxBandDf: Int = 100): DataFrame =
    phashNearDupFromBands(
      phashBands(documents, dim, nBands).localCheckpoint(true), nBands, maxHamming,
      maxBandDf)

  /** Near-dup pairs from an ALREADY-materialized band frame — so a
    * caller that needs both the bands and the pairs ([[phashSummary]])
    * pays the (stubbed-decode) band computation exactly once.
    */
  private def phashNearDupFromBands(ph: DataFrame, nBands: Int,
                                    maxHamming: Int, maxBandDf: Int): DataFrame = {
    require(nBands > maxHamming,
      s"pigeonhole guarantee needs nBands > maxHamming ($nBands <= $maxHamming)")
    val exploded = ph.select(col("doc_id"),
      posexplode(col("phash_bands")).as(Seq("band", "bv")))
    // Bucket df first as a map-side-combinable COUNT — never a
    // materialized posting list, so a corpus-scale hot bucket costs
    // one counter, not an array — then prune both self-join sides to
    // under-cap buckets. Both the count and the join shuffle on the
    // same (band, bv) key, so the exchange is reused.
    val kept = exploded.groupBy("band", "bv")
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxBandDf))
      .select("band", "bv")
    val pruned = exploded.join(kept, Seq("band", "bv"))
    val cand = pruned.as("a").join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(ph.select(col("doc_id").as("doc_a"), col("phash_bands").as("pha")), "doc_a")
      .join(ph.select(col("doc_id").as("doc_b"), col("phash_bands").as("phb")), "doc_b")
      .withColumn("hamming",
        expr("aggregate(zip_with(pha, phb, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
          .cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Per-doc phash summary (the `mm_phash_dedup` entry): band values
    * plus the doc's near-dup degree under [[phashNearDup]] — compact
    * (one row per doc) and all-integer, so the oracle recomputes the
    * whole hash+band+hamming pipeline from character codes and must
    * agree exactly.
    */
  /** Deterministic caption↔media PAIR fixture over the documents
    * table — the shape of a scraped captioned-media corpus where the
    * caption row carries a reference to its media item. Most
    * captions point at their own payload; two fixed residue rules
    * plant the failure modes a real crawl produces: `% 23 == 5`
    * points far out of range (dead media link), `% 17 == 3` points
    * one item over (off-by-one misalignment — the classic shifted
    * scrape). The rules are pure column arithmetic so the DuckDB
    * oracle reproduces the fixture exactly.
    */
  def pairFixture(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("caption_id"),
      when(pmod(col("doc_id"), lit(23L)) === 5L, col("doc_id") + 1000000L)
        .when(pmod(col("doc_id"), lit(17L)) === 3L, col("doc_id") + 1L)
        .otherwise(col("doc_id")).as("media_id"))

  /** Image↔text pair audit (the `mm_pair_audit` entry) — the
    * CLIP-data cleaning step: every caption→media pair is checked in
    * fingerprint space and each source gets matched / conflict /
    * orphan counts. Caption-side fingerprint = the text fingerprint;
    * media-side = the payload phash — with the deterministic stub the
    * two are the SAME function of the same bytes, which is exactly
    * what keeps the whole audit hash-checkable (the mm_phash_dedup
    * precedent); a real deployment swaps in a text encoder and an
    * image encoder and keeps every join shape.
    *
    * Scale shape: fingerprints are computed ONCE PER DOC (never per
    * pair), both pair sides resolve by equality join on the id, the
    * hamming compare runs in codegen over the band arrays, and the
    * final per-source rollup is a low-cardinality map-side-combined
    * aggregate. No candidate generation exists to blow up — the pair
    * table IS the work list.
    */
  /** Per-caption pair verdicts — the row-level face [[pairAudit]]
    * aggregates and the mm-clean pipeline filters on: one row per
    * caption with its match / conflict / orphan verdict. */
  def pairVerdicts(documents: DataFrame, dim: Int = 64, nBands: Int = 4,
                   maxHamming: Int = 3): DataFrame = {
    val ph = phashBands(documents, dim, nBands).localCheckpoint(true)
    val pairs = pairFixture(documents)
    val withCap = pairs
      .join(documents.select(col("doc_id").as("caption_id"), col("source")),
        Seq("caption_id"))
      .join(ph.select(col("doc_id").as("caption_id"), col("phash_bands").as("cap_ph")),
        Seq("caption_id"))
    val joined = withCap.join(
      ph.select(col("doc_id").as("media_id"), col("phash_bands").as("med_ph")),
      Seq("media_id"), "left")
    joined
      .withColumn("hamming",
        expr("aggregate(zip_with(cap_ph, med_ph, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
          .cast("long"))
      .withColumn("v",
        when(col("med_ph").isNull, lit("orphan"))
          .when(col("hamming") <= maxHamming, lit("match"))
          .otherwise(lit("conflict")))
      .select(col("caption_id"), col("source"), col("v"))
  }

  def pairAudit(documents: DataFrame, dim: Int = 64, nBands: Int = 4,
                maxHamming: Int = 3): DataFrame = {
    pairVerdicts(documents, dim, nBands, maxHamming).groupBy("source").agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("v") === "match", 1L).otherwise(0L)).as("n_match"),
      sum(when(col("v") === "conflict", 1L).otherwise(0L)).as("n_conflict"),
      sum(when(col("v") === "orphan", 1L).otherwise(0L)).as("n_orphan"))
  }

  def phashSummary(documents: DataFrame, dim: Int = 64, nBands: Int = 4,
                   maxHamming: Int = 3, maxBandDf: Int = 100): DataFrame =
    // one checkpointed band frame feeds BOTH the pair generation and
    // the final projection — the decode pass runs once per invocation
    summaryFromBands(phashBands(documents, dim, nBands).localCheckpoint(true),
      nBands, maxHamming, maxBandDf)

  /** The per-doc summary tail shared by the stub and decoded paths:
    * band values + near-dup degree from one materialized band frame. */
  private def summaryFromBands(ph: DataFrame, nBands: Int, maxHamming: Int,
                               maxBandDf: Int): DataFrame = {
    val pairs = phashNearDupFromBands(ph, nBands, maxHamming, maxBandDf)
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    ph
      .join(deg, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        (0 until nBands).map(b => element_at(col("phash_bands"), b + 1).as(s"b$b")) :+
        coalesce(col("n_near"), lit(0L)).as("n_near"): _*)
  }

  // ------------------------------------------------------------------
  // REAL image decode (r13): javax.imageio ships with the JDK, so the
  // decode stub boundary can be retired for genuinely-image payloads.
  // The pipeline below is the standard DCT perceptual hash: decode →
  // grayscale → 32×32 area-average resize → 2D DCT-II → 8×8
  // low-frequency block → median threshold → 64-bit hash, split into
  // the SAME 4×16-bit band schema as the stub path, so every
  // downstream join/cap/summary shape is unchanged — exactly the swap
  // the stub docs promised. Payloads that aren't decodable images
  // fall back to the histogram stub (documented fallback), which
  // keeps mixed corpora total.
  // ------------------------------------------------------------------

  /** Deterministic 16×16 grayscale PNG rendering a payload's byte
    * histogram — a REAL ImageIO encode (pure function of bytes), the
    * media fixture for the decoded-path entry: the container ships no
    * image corpus, so the documents table is rendered into one. */
  def pngFromPayload(payload: Array[Byte]): Array[Byte] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < payload.length) {
      hist(java.lang.Byte.toUnsignedInt(payload(i))) += 1L
      i += 1
    }
    val mx = math.max(1L, hist.max)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var p = 0
    while (p < 256) {
      raster.setSample(p % 16, p / 16, 0, ((hist(p) * 255L) / mx).toInt)
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real JDK decode: (width, height, row-major gray pixels 0..255),
    * or None when the payload isn't a decodable image (the fallback
    * trigger). RGB sources reduce by integer ITU-R 601 luminance. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0) return None
    val px = new Array[Int](w * h)
    val raster = img.getRaster
    // single-band (grayscale) sources read RAW samples — getRGB would
    // push them through a gray→sRGB color-space conversion and the
    // round-trip would no longer be lossless
    val gray = raster.getNumBands == 1 &&
      img.getColorModel.getComponentSize(0) <= 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          if (gray) raster.getSample(x, y, 0)
          else {
            val rgb = img.getRGB(x, y)
            val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            (299 * r + 587 * g + 114 * b) / 1000
          }
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** 32×32 DCT-II cosine table via StrictMath (bit-identical on every
    * platform — Math.cos is allowed 1 ulp of wobble, which could flip
    * a threshold bit on some JVM and break determinism). */
  private lazy val DctCos: Array[Array[Double]] = {
    val n = 32
    Array.tabulate(n, n)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n)))
  }

  /** The standard DCT perceptual hash over decoded pixels: area-
    * average resize to 32×32, 2D DCT-II, 8×8 low-frequency block,
    * bit = coefficient > median of the block. 64 bits. */
  def dctPhash64(w: Int, h: Int, px: Array[Int]): Long = {
    val n = 32
    // area-average resize: each target cell averages its source box
    val small = new Array[Double](n * n)
    var ty = 0
    while (ty < n) {
      val y0 = ty * h / n
      val y1 = math.max(y0 + 1, (ty + 1) * h / n)
      var tx = 0
      while (tx < n) {
        val x0 = tx * w / n
        val x1 = math.max(x0 + 1, (tx + 1) * w / n)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); x += 1 }
          y += 1
        }
        small(ty * n + tx) = s.toDouble / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    // 2D DCT-II, low 8×8 block only (64 of the 1024 coefficients)
    val block = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < n) {
          val cu = DctCos(u)(y)
          var x = 0
          while (x < n) { acc += small(y * n + x) * cu * DctCos(v)(x); x += 1 }
          y += 1
        }
        block(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val sorted = block.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (block(k) > median) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** Band frame via the REAL decoder — same (doc_id, phash_bands)
    * schema as [[phashBandsFromPayload]], so candidate generation,
    * the band-df cap, and the summary all apply unchanged. The
    * 64-bit DCT hash splits into 4×16-bit bands; undecodable
    * payloads fall back to the histogram stub. */
  def phashBandsDecoded(payloads: DataFrame, nBands: Int = 4): DataFrame = {
    require(64 % nBands == 0, "64 bits must split evenly into bands")
    val bandWidth = 64 / nBands
    val spark = payloads.sparkSession
    import spark.implicits._
    graft.operators.Checkpoints.cpuSplit(payloads
        .select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val bs = decodeImage(bytes) match {
          case Some((w, h, px)) =>
            val hash = dctPhash64(w, h, px)
            (0 until nBands).map(b =>
              (hash >>> (b * bandWidth)) & ((1L << bandWidth) - 1L))
          case None => stubBands(bytes, 64, nBands)
        }
        (id, bs)
      }
      .toDF("doc_id", "phash_bands")
  }

  /** Decoded-path near-dup summary (the `mm_phash_decoded` entry):
    * render each doc into a real PNG ([[pngFromPayload]]), decode it
    * back with ImageIO, DCT-phash the pixels, and run the SAME
    * banded near-dup + cap + summary as the stub path. maxHamming
    * stays at 3 — the re-widening the stub path couldn't afford
    * (Pipeline.mmCleanCorpus docs): the DCT hash separates content,
    * so ≤3 is a genuine near-dup band, not a degenerate one.
    * Rows-only gate: the DCT coefficients are doubles, so the DuckDB
    * oracle can't replay the threshold bits; the spec pins encode→
    * decode losslessness, hash determinism, and the planted-twin /
    * far-pair separations, and the row count is pinned for the
    * driver's rows-gate. */
  /** Fixed planted corpus for the decoded-path HASH GATE (the
    * clfPlantedCorpus pattern): a reversal pair (identical byte
    * histogram → identical PNG → hamming 0, a guaranteed near-dup),
    * a near-miss (one appended character), and distinct fillers with
    * deliberately different byte distributions. Data-dir-independent
    * so the local twin's summary can live INSIDE the oracle SQL. */
  val phashPlantedCorpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog 0123456789 " * 4
    Seq(
      1L -> base,
      2L -> base.reverse,
      3L -> (base + "!"),
      4L -> ("aaaabbbbccccdddd" * 12),
      5L -> ("zyxw" * 40),
      6L -> ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 3),
      7L -> ("0101010101010101" * 10),
      8L -> ("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG " * 4),
      9L -> ("mixed Case With Punctuation!!! ??? ;;; " * 5),
      10L -> ("short"),
      11L -> ("a slightly longer document with ordinary english words spread about " * 2),
      12L -> ("9876543210" * 20)
    )
  }

  /** Driver-side INDEPENDENT twin of [[phashSummaryDecoded]] over a
    * small corpus: the per-doc hash is the same pure function chain
    * (render → ImageIO decode → DCT — that chain IS what the gate
    * verifies the cluster computes), but the banding, df cap,
    * candidate generation, hamming filter, and degree count are
    * re-implemented in plain Scala collections — a genuinely
    * different execution of the near-dup semantics, the
    * qualityClfFullArtifact local/distributed bit-equality pattern.
    * Returns (doc_id, bands, n_near) rows for embedding as SQL
    * VALUES. */
  def phashDecodedLocalTwin(corpus: Seq[(Long, String)], nBands: Int = 4,
                            maxHamming: Int = 3,
                            maxBandDf: Int = 100): Seq[(Long, Seq[Long], Long)] = {
    val bandWidth = 64 / nBands
    val bands: Map[Long, Seq[Long]] = corpus.map { case (id, t) =>
      val png = pngFromPayload(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hash = decodeImage(png) match {
        case Some((w, h, px)) => dctPhash64(w, h, px)
        case None => sys.error(s"planted doc $id must decode")
      }
      id -> (0 until nBands).map(b =>
        (hash >>> (b * bandWidth)) & ((1L << bandWidth) - 1L))
    }.toMap
    val buckets = corpus.flatMap { case (id, _) =>
      bands(id).zipWithIndex.map { case (v, b) => ((b, v), id) }
    }.groupBy(_._1).values
      .filter(g => g.size >= 2 && g.size <= maxBandDf)
    val cand = buckets.flatMap { g =>
      val ids = g.map(_._2).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }.toSet
    val near = cand.filter { case (a, b) =>
      bands(a).zip(bands(b)).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum <= maxHamming
    }
    val deg = near.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    corpus.map { case (id, _) => (id, bands(id), deg.getOrElse(id, 0L)) }
  }

  def phashSummaryDecoded(documents: DataFrame, nBands: Int = 4,
                          maxHamming: Int = 3, maxBandDf: Int = 100): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val pngs = documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, pngFromPayload(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      .toDF("doc_id", "payload")
    summaryFromBands(phashBandsDecoded(pngs, nBands).localCheckpoint(true),
      nBands, maxHamming, maxBandDf)
  }
}
