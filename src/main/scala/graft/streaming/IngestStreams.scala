package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.StreamState.{hasVisibleData, healSwap, swapInstall}

/** Streaming INGEST-DEDUP / table-maintenance faces (SURVEY §2.7
  * rows 37b\'… 37t and §2.8 sinks): URL/CDC/quality/near-dup/span/
  * phash ingest state machines, snapshot & SCD2 table maintenance,
  * and the partitioned idempotent ingest sink. Split out of
  * EventStreams in r11 (pure move, no behavior change).
  */
object IngestStreams {
  /** Streamed URL-level dedup — the ingest face of
    * [[graft.operators.Dedup.urlDedup]], and the simplest member of
    * the maintenance family because its state is PURE DELTAS: per
    * batch, one aggregate produces (canonical_url, batch-min doc_id,
    * batch count), written to a per-batch directory with overwrite
    * semantics (replay-safe in the crash window by construction, the
    * r10 quality-audit pattern) — and resolve's merge-on-read
    * (global min, global sum) is ORDER-INDEPENDENT: the survivor is
    * the min of per-batch minima whatever order shards land in, so
    * unlike the quality audit there is no arrival-order contract at
    * all, and the entry shares `dedup_url`'s SQL oracle verbatim.
    * Nothing is ever rewritten or rescanned; per-batch cost is the
    * batch's own canonical aggregate.
    */
  def streamedUrlDedup(spark: SparkSession, dir: String,
                       nBuckets: Int = 16): DataFrame = {
    val urls = graft.operators.Dedup.syntheticUrls(
      graft.Tables.documents(spark, dir)).localCheckpoint(true)
    if (urls.isEmpty) {
      graft.operators.Checkpoints.free(urls)
      import spark.implicits._
      return Seq.empty[(String, Long, Long)]
        .toDF("canonical_url", "keep_doc_id", "n_copies")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-url-ing-").toString
    val incoming = s"$base/incoming"
    urls.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    urls.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(urls)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("url", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    urlDedupIngest(stream, s"$base/state", s"$base/ckpt", nBuckets)
    urlDedupResolve(spark, s"$base/state")
  }

  /** Streamed DSIR scoring — the deployment face of
    * [[graft.operators.TextAnalysis.dsirWeights]]: the lambda
    * artifact (integer-micros log ratios, complete over all buckets)
    * is trained ONCE on the static corpus and frozen; pool shards
    * then score STATELESSLY per micro-batch against the broadcast
    * artifact (one explode + one broadcast join + one per-doc
    * aggregate — scan speed, no corpus statistics consulted), so the
    * drained table equals the batch weights exactly and the entry
    * shares `ta_dsir_weights`' SQL oracle verbatim. Per-batch
    * results land in per-batch overwrite dirs with commit markers
    * (the stream_quality_clf pattern — replay-safe in the crash
    * window). This is how DSIR runs ahead of a 100 TB mix: train the
    * tiny LM artifact once, then weigh every arriving shard without
    * ever rescanning history.
    */
  def streamedDsirScore(spark: SparkSession, dir: String,
                        targetSource: String = "src0", dim: Int = 4096): DataFrame = {
    import spark.implicits._
    val all = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source")).localCheckpoint(true)
    if (all.isEmpty) {
      graft.operators.Checkpoints.free(all)
      return Seq.empty[(Long, Long, Long)].toDF("doc_id", "n_feats", "w_micros")
    }
    val lambdas = graft.operators.TextAnalysis
      .dsirLambdas(all, targetSource, dim)
      .as[(Long, Long)].collect().toSeq
    val pool = all.filter(col("source") =!= targetSource)
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-dsir-ing-").toString
    val incoming = s"$base/incoming"
    pool.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    pool.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(all)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        dsirScoreBatch(b, id, state, lambdas, dim)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$state/scored")
      .select("doc_id", "n_feats", "w_micros")
  }

  /** One [[streamedDsirScore]] micro-batch, exposed for the replay
    * spec: stateless scoring under the frozen artifact, overwrite +
    * marker. */
  private[graft] def dsirScoreBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String,
                                    lambdas: Seq[(Long, Long)], dim: Int): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_dsir_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis.dsirScoreFrozen(
        batch0.select(col("doc_id"), col("text")).dropDuplicates("doc_id"),
        lambdas, dim)
      .write.mode("overwrite").parquet(s"$statePath/scored/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Streamed C4-style line dedup — the ingest face of
    * [[graft.operators.Dedup.lineSurvivors]] and a
    * [[streamedUrlDedup]]-family PURE-DELTA member: each micro-batch
    * segments its OWN docs (zero-shuffle explode), aggregates one
    * (seg_md5, batch-first (doc_id, seg_idx), batch count) row per
    * distinct segment, and writes it to a per-batch overwrite
    * directory with a commit marker. Resolve's merge-on-read is
    * ORDER-INDEPENDENT (min of per-batch first-occurrence structs,
    * sum of counts — the survivor is the global (doc_id, seg_idx)
    * minimum whatever order shards land in), so the entry shares the
    * batch survivor SQL oracle verbatim. The ≥2-copies filter runs
    * ONLY at resolve: a segment unique within every batch but shared
    * across two IS duplicated. Per-batch cost = the batch's own
    * segment aggregate; nothing is rescanned or rewritten.
    */
  def streamedLineDedup(spark: SparkSession, dir: String,
                        wordsPerSeg: Int = 8): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("seg_md5", "keep_doc_id", "keep_seg_idx", "n_copies")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-line-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        lineDedupBatch(b, id, s"$base/state", wordsPerSeg)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    lineDedupResolve(spark, s"$base/state")
  }

  /** One [[streamedLineDedup]] micro-batch, exposed for the replay
    * spec: the batch's own segment first-occurrence aggregate,
    * overwrite + marker (retries replace, never re-append). */
  private[graft] def lineDedupBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String,
                                    wordsPerSeg: Int): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_line_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.Dedup.lineSegments(
        batch0.dropDuplicates("doc_id").select(col("doc_id"), col("text")),
        wordsPerSeg)
      .select(md5(col("seg")).as("seg_md5"), col("doc_id"), col("seg_idx"))
      .groupBy("seg_md5")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"),
        count(lit(1)).as("n_copies"))
      .select(col("seg_md5"), col("first.doc_id").as("keep_doc_id"),
        col("first.seg_idx").as("keep_seg_idx"), col("n_copies"))
      .write.mode("overwrite").parquet(s"$statePath/deltas/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Resolve the maintained line-dedup deltas: global first
    * occurrence (min of per-batch minima), global copy count,
    * duplicated segments only — [[graft.operators.Dedup
    * .lineSurvivors]]'s exact contract. */
  def lineDedupResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/deltas")) {
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("seg_md5", "keep_doc_id", "keep_seg_idx", "n_copies")
    }
    spark.read.parquet(s"$statePath/deltas")
      .groupBy("seg_md5")
      .agg(min(struct(col("keep_doc_id"), col("keep_seg_idx"))).as("first"),
        sum(col("n_copies")).as("n_copies"))
      .filter(col("n_copies") >= 2)
      .select(col("seg_md5"), col("first.keep_doc_id").as("keep_doc_id"),
        col("first.keep_seg_idx").as("keep_seg_idx"), col("n_copies"))
  }

  /** One streamed-novelty micro-batch: per-batch delta dirs (the
    * lineDedupBatch pattern — overwrite + commit markers) holding
    * (shingle → min doc_id in batch) and (doc_id → distinct-shingle
    * count). Novelty is a pure MIN-fold over deltas, so arrival
    * order cannot matter — no range-sharding requirement. */
  private[graft] def noveltyBatch(batch0: org.apache.spark.sql.DataFrame,
                                  batchId: Long, statePath: String,
                                  n: Int = 3): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_nov_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val sh = graft.operators.Dedup.wordShingles(
        batch0.dropDuplicates("doc_id").select(col("doc_id"), col("text")), n)
      .persist()
    try {
      sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
        .write.mode("overwrite").parquet(s"$statePath/sh_deltas/batch=$batchId")
      sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        .write.mode("overwrite").parquet(s"$statePath/doc_deltas/batch=$batchId")
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { sh.unpersist(); () }
  }

  /** Resolve the maintained novelty deltas to the batch
    * [[graft.operators.TextAnalysis.noveltyProfile]] shape: global
    * first occurrence = min of per-batch minima (order-free), novel
    * count per doc = shingles whose global first occurrence is that
    * doc. */
  def noveltyResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/doc_deltas")) {
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("doc_id", "n_sh", "n_novel", "novelty")
    }
    val novel = spark.read.parquet(s"$statePath/sh_deltas")
      .groupBy("shingle").agg(min(col("first_doc")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    spark.read.parquet(s"$statePath/doc_deltas")
      .groupBy("doc_id").agg(sum(col("n_sh")).as("n_sh"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_sh"), 4)
          .as("novelty"))
  }

  /** Streamed novelty maintenance (the `stream_novelty` entry): the
    * always-on face of `ta_novelty` — corpus shards land, each batch
    * contributes its shingle first-occurrence minima and per-doc
    * set sizes as deltas, and the profile resolves by a min-fold.
    * Shares `ta_novelty`'s oracle verbatim after the drain. */
  def streamedNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-nov-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        noveltyBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    noveltyResolve(spark, state)
  }

  /** One maintained-inverted-index micro-batch (the `stream_bm25`
    * state machine): tokenize the batch's docs and write their FULL
    * postings — (doc_id, word, tf) with the doc's length dl
    * denormalized onto every row, since docs are immutable so dl is
    * known at ingest — to a per-batch overwrite delta dir,
    * partitioned by `bkt = pmod(xxhash64(word), nBuckets)` so a
    * query later reads ONLY its terms' buckets. A one-row
    * (n_docs, tot_dl) delta per batch keeps the corpus stats exact
    * as integer counts (avgdl derives at resolve — never a stored
    * float).
    *
    * Contract: corpus shards are append-only and DISJOINT across
    * batches (the ingest contract every maintained face here
    * shares); within a batch, doc_id duplicates are dropped.
    * Overwrite + commit marker make replay in the crash window a
    * no-op (the lineDedupBatch pattern). */
  private[graft] def bm25IndexBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String,
                                    nBuckets: Int = 64): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_bm25_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    // positional tokens (the ta_phrase_search convention): tf falls
    // out as the position count, and storing the sorted position
    // array makes the maintained index serve PHRASE queries too
    val toks = graft.operators.TextAnalysis.tokenPositions(
        batch0.dropDuplicates("doc_id").select(col("doc_id"), col("text")))
      .persist()
    try {
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      // cluster by bucket before the partitioned write: one file per
      // (batch, bucket), not one per (task, bucket) — the fan-out
      // otherwise explodes to tasks×buckets tiny files per batch
      toks.groupBy("doc_id", "word")
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"))
        .join(dl, "doc_id")
        .withColumn("bkt",
          pmod(xxhash64(col("word")), lit(nBuckets.toLong)).cast("int"))
        .repartition(col("bkt"))
        .write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$statePath/postings/batch=$batchId")
      dl.agg(count(lit(1)).as("n_docs"),
          coalesce(sum("dl"), lit(0L)).as("tot_dl"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$statePath/stats/batch=$batchId")
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { toks.unpersist(); () }
  }

  private val Bm25PostingCols = Seq("doc_id", "word", "tf", "positions", "dl", "bkt")

  /** The maintained index's postings as ONE frame — the
    * [[StreamState.lsmRead]] base ∪ unfolded-deltas contract. */
  private def bm25IndexPostings(spark: SparkSession,
                                statePath: String): Option[DataFrame] =
    StreamState.lsmRead(spark, s"$statePath/postings",
      s"$statePath/postings_base", Bm25PostingCols)

  /** Fold committed posting deltas into the consolidated base — the
    * [[StreamState.lsmFold]] contiguous-marker-run fold (crash-window
    * batches never fold; a gapped late marker is never hidden). Stats
    * deltas stay unfolded (one row per batch — never the heavy
    * state). */
  def bm25Compact(spark: SparkSession, statePath: String): Unit =
    StreamState.lsmFold(spark, s"$statePath/postings",
      s"$statePath/postings_base", s"$statePath/_bm25_commits",
      Bm25PostingCols, "bkt")

  /** Query the maintained inverted index: BM25 top-k for a literal
    * term set WITHOUT touching document text — the scatter-gather a
    * search engine does over a sharded index. Reads exactly the
    * query terms' `bkt` partitions (partition-pruned — at 100 TB the
    * posting store is petabyte-shaped but a query reads |terms|
    * buckets of it) plus the |batches|-row stats table; scoring is
    * [[graft.operators.TextAnalysis.bm25ScorePostings]] — the SAME
    * core `ta_bm25` runs, so the drained index hash-checks against
    * `ta_bm25`'s oracle verbatim. df/avgdl/N are corpus-exact (df
    * counted from the global postings, stats summed over batch
    * deltas), not per-shard approximations. */
  def bm25Resolve(spark: SparkSession, statePath: String,
                  queryTerms: Seq[String], k: Int = 20,
                  nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    require(queryTerms.nonEmpty)
    if (!hasVisibleData(spark, s"$statePath/stats")) {
      return Seq.empty[(Long, Long, Double, Long)]
        .toDF("doc_id", "n_terms", "score", "rk")
    }
    val stats = spark.read.parquet(s"$statePath/stats")
      .agg(coalesce(sum("n_docs"), lit(0L)).as("n"),
        coalesce(sum("tot_dl"), lit(0L)).as("tot")).head()
    // the terms' buckets, via the SAME engine hash the writer used
    val qBkts = queryTerms.toDF("word")
      .select(pmod(xxhash64(col("word")), lit(nBuckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val postings = bm25IndexPostings(spark, statePath) match {
      case Some(p) => p
        .filter(col("bkt").isin(qBkts: _*) && col("word").isin(queryTerms: _*))
        .select(col("doc_id"), col("word"), col("tf"), col("dl"))
      case None => return Seq.empty[(Long, Long, Double, Long)]
        .toDF("doc_id", "n_terms", "score", "rk")
    }
    graft.operators.TextAnalysis.bm25ScorePostings(
      postings, stats.getLong(0), stats.getLong(1), k)
  }

  /** Streamed BM25 over a maintained inverted index (the
    * `stream_bm25` entry): the always-on face of `ta_bm25` — corpus
    * shards land and each batch appends its bucket-partitioned
    * postings + a stats delta; a query at any moment is a pruned
    * read of its terms' buckets. The batch face re-tokenizes the
    * corpus per query; this face pays tokenization ONCE at ingest
    * and amortizes it across every subsequent query. */
  def streamedBm25(spark: SparkSession, dir: String,
                   queryTerms: Seq[String], k: Int = 20): DataFrame =
    bm25Resolve(spark, driveBm25Index(spark, dir), queryTerms, k)

  private def driveBm25Index(spark: SparkSession, dir: String): String = {
    import graft.sources.{ReplayLog, ReplayStream}
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-bm25-ing-").toString
    // Ingest via the REPLAYABLE-OFFSET source (§2.8 row 41g'), not the
    // file source: docs land in the log as two immutable segments (the
    // same even/odd split the file drive sharded by) and the drive
    // reads format(ReplayLog.FORMAT) under a seq bound sized to one
    // segment per micro-batch — so the deployed entry exercises the
    // replay contract (offset ranges, segment pruning, kill-and-resume
    // semantics proven in ReplaySourceSpec) on every driver-gate run,
    // while the maintained-index state machinery and the oracle stay
    // byte-identical to the file-source drive it replaces.
    // the collect is the simulated PRODUCER (in a deployment the log
    // is written by the upstream system; the engine only reads it) —
    // the engine-side path below stays fully distributed
    val log = s"$base/log"
    val even = docs.filter(col("doc_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    graft.operators.Checkpoints.free(docs)
    if (even.nonEmpty) ReplayLog.append(log, even)
    if (odd.nonEmpty) ReplayLog.append(log, odd)
    val perTrigger = math.max(1L, math.max(even.size, odd.size).toLong)
    val state = s"$base/state"
    if (even.nonEmpty || odd.nonEmpty) {
      val q = ReplayStream.read(spark, log, Some(perTrigger))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          bm25IndexBatch(
            b.select(col("key").as("doc_id"), col("value").as("text")), id, state)
        }
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // fold the drained deltas so the entry's resolve exercises the
    // compacted path (the IndexRehearsal finding: un-folded per-shard
    // dirs cost more than they save — the deployed cadence is
    // ingest → compact → query)
    bm25Compact(spark, state)
    state
  }

  /** Phrase query against the maintained positional index: read ONLY
    * the phrase terms' buckets (the bm25Resolve pruning), explode the
    * stored position arrays, and run the SAME adjacency core the
    * batch operator runs — docs are ingested whole, so stored
    * positions are complete and the answer equals
    * [[graft.operators.TextAnalysis.phraseSearch]] exactly. */
  def phraseResolve(spark: SparkSession, statePath: String,
                    phrase: Seq[String], nBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    require(phrase.nonEmpty)
    val terms = phrase.map(_.toLowerCase).distinct
    val all = bm25IndexPostings(spark, statePath) match {
      case Some(p) => p
      case None => return Seq.empty[(Long, Long, Long)]
        .toDF("doc_id", "n_matches", "first_pos")
    }
    val qBkts = terms.toDF("word")
      .select(pmod(xxhash64(col("word")), lit(nBuckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).distinct.toSeq
    val tokPos = all
      .filter(col("bkt").isin(qBkts: _*) && col("word").isin(terms: _*))
      .select(col("doc_id"), explode(col("positions")).as("pos"), col("word"))
    graft.operators.TextAnalysis.phraseMatches(tokPos, phrase)
  }

  /** Streamed phrase search (the `stream_phrase_search` entry): the
    * positional face of the 33m' maintained inverted index — the
    * SAME ingested state serves BM25 ranking and exact phrase
    * queries, which is what makes it an index rather than a cache.
    * Shares `ta_phrase_search`'s oracle verbatim after the drain. */
  def streamedPhraseSearch(spark: SparkSession, dir: String,
                           phrase: Seq[String]): DataFrame =
    phraseResolve(spark, driveBm25Index(spark, dir), phrase)

  /** One streamed weighted-reservoir micro-batch: the batch's OWN
    * top-k Efraimidis-Spirakis keys as a k-bounded overwrite delta
    * (the global top-k is a subset of the union of per-batch
    * top-ks — an order-free min-k fold, so deltas never exceed k
    * rows whatever the corpus size). */
  private[graft] def wsampleBatch(batch0: org.apache.spark.sql.DataFrame,
                                  batchId: Long, statePath: String,
                                  k: Int = 50, seed: String = "wsamp"): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_wsamp_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis
      .weightedSampleKeys(batch0.dropDuplicates("doc_id"), seed)
      .orderBy(col("key_nanos").desc, col("doc_id").asc).limit(k)
      .write.mode("overwrite").parquet(s"$statePath/wsamp/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Streamed weighted sample without replacement (the
    * `stream_weighted_sample` entry): the distributed weighted
    * reservoir, maintained — because the E-S sort key is a pure
    * content-hash function of each row, the reservoir algebra is an
    * order-free top-k fold over per-batch top-ks, and the drained
    * state equals `ta_weighted_sample` BIT-FOR-BIT (oracle shared
    * verbatim). State is ≤ k rows per batch — at 100 TB the
    * maintained sample costs |batches|·k rows, and resolve is a
    * top-k over that, never a corpus pass. */
  def streamedWeightedSample(spark: SparkSession, dir: String,
                             k: Int = 50): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-wsamp-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("n_chars", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        wsampleBatch(b, id, state, k)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (!hasVisibleData(spark, s"$state/wsamp")) {
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("doc_id", "weight", "key_nanos", "rk")
    }
    graft.operators.TextAnalysis.weightedSampleTop(
      spark.read.parquet(s"$state/wsamp")
        .select("doc_id", "weight", "key_nanos"), k)
  }

  /** One embedding-store micro-batch for the streamed hybrid: plain
    * per-batch overwrite delta dirs of (vec_id, embedding) — the
    * simplest member of the maintenance family (pure append of
    * immutable rows, no algebra at all), kept separate from the IVF
    * cell store so the hybrid face carries no quantizer dependency. */
  private[graft] def vecStoreBatch(batch0: org.apache.spark.sql.DataFrame,
                                   batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_vec_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    batch0.dropDuplicates("vec_id").select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$statePath/vecs/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Streamed hybrid retrieval (the `stream_hybrid_rrf` entry): the
    * always-on face of `ta_hybrid_rrf` — BOTH arms' stores are
    * maintained (document shards feed the [[bm25IndexBatch]]
    * inverted index, embedding shards feed the [[vecStoreBatch]]
    * vector store, in independent streams), and the hybrid query
    * fuses a pruned-bucket BM25 resolve with a brute-force cosine
    * pass over the maintained vectors through the SAME
    * [[graft.operators.TextAnalysis.rrfFuse]] core. Shares
    * `ta_hybrid_rrf`'s oracle verbatim after the drain: disjoint
    * shards drain to the same postings/stats/vectors, and fusion is
    * exact integer arithmetic over the two gate-proven rankings. */
  def streamedHybridRrf(spark: SparkSession, dir: String,
                        queryTerms: Seq[String], k: Int = 20,
                        kArm: Int = 50): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-hyb-ing-").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(s"$base/in_docs")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(s"$base/in_docs")
    vecs.filter(col("vec_id") % 2 === 0).coalesce(1).write.mode("append").parquet(s"$base/in_vecs")
    vecs.filter(col("vec_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(s"$base/in_vecs")
    graft.operators.Checkpoints.free(docs)
    graft.operators.Checkpoints.free(vecs)
    val state = s"$base/state"
    val qDocs = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in_docs")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        bm25IndexBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt_docs")
      .trigger(Trigger.AvailableNow()).start()
    val qVecs = spark.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in_vecs")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        vecStoreBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt_vecs")
      .trigger(Trigger.AvailableNow()).start()
    qDocs.awaitTermination()
    qVecs.awaitTermination()
    val lex = bm25Resolve(spark, state, queryTerms, kArm)
      .select(col("doc_id"), col("rk").as("rk_lex"))
    val dense = graft.operators.Similarity.bruteForceTopK(
        spark.read.parquet(s"$state/vecs").select("vec_id", "embedding"),
        numQueries = 1, k = kArm)
      .select(col("corpus_id").as("doc_id"), col("rk").as("rk_dense"))
    graft.operators.TextAnalysis.rrfFuse(lex, dense, k, 60)
  }

  /** One labeled-embedding-store + Gram-delta micro-batch (shared by
    * `stream_outliers` and `stream_ann_pca`): appends the batch's
    * (vec_id, embedding, label) rows as an overwrite delta AND one
    * dim²-double Gram row — the PCA training sufficient statistic is
    * a pure SUM, so index training becomes maintained state: per
    * batch O(dim²) delta bytes, resolve folds |batches| Gram rows
    * and never re-scans the corpus. */
  private[graft] def vecGramBatch(batch0: org.apache.spark.sql.DataFrame,
                                  batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_vecg_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val rows = batch0.dropDuplicates("vec_id")
      .select(col("vec_id"), col("embedding"), col("label"))
      .localCheckpoint(true)
    try {
      rows.write.mode("overwrite").parquet(s"$statePath/vecs/batch=$batchId")
      val dim = rows.select(size(col("embedding"))).head(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
      // upper-triangle Gram block per partition, folded in partition
      // order (the pcaTrain determinism discipline), one row per batch
      val parts = rows.select("embedding").as[Seq[Float]].rdd
        .mapPartitionsWithIndex { (idx, it0) =>
          val acc = Array.ofDim[Double](dim, dim)
          it0.foreach { x =>
            var i = 0
            while (i < dim) {
              val xi = x(i).toDouble
              if (xi != 0.0) {
                var j = i
                while (j < dim) { acc(i)(j) += xi * x(j).toDouble; j += 1 }
              }
              i += 1
            }
          }
          Iterator.single((idx, acc))
        }.collect().sortBy(_._1).map(_._2)
      val flat = Array.ofDim[Double](dim * dim)
      parts.foreach { b =>
        var i = 0
        while (i < dim) {
          var j = i
          while (j < dim) { flat(i * dim + j) += b(i)(j); j += 1 }
          i += 1
        }
      }
      Seq((dim, flat.toSeq)).toDF("dim", "gram")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$statePath/gram/batch=$batchId")
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { graft.operators.Checkpoints.free(rows); () }
  }

  private def driveVecGram(spark: SparkSession, dir: String): String = {
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-vecg-ing-").toString
    val incoming = s"$base/incoming"
    vecs.filter(col("vec_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    vecs.filter(col("vec_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(vecs)
    val state = s"$base/state"
    val q = spark.readStream
      .schema(StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .option("maxFilesPerTrigger", "1").parquet(incoming)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        vecGramBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    state
  }

  /** Streamed robust outlier audit (the `stream_outliers` entry):
    * the always-on face of `sim_outliers` — embedding shards land in
    * the maintained labeled store, and the audit runs the SAME
    * [[graft.operators.Similarity.robustOutliers]] over the drained
    * state, so the result is bit-identical to the batch audit
    * (centroids, medians, and MADs are corpus statistics computed at
    * resolve; ingest itself is a pure append). Shares
    * `sim_outliers`' oracle verbatim. */
  def streamedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val state = driveVecGram(spark, dir)
    graft.operators.Similarity.robustOutliers(
      spark.read.parquet(s"$state/vecs").select("vec_id", "embedding", "label"))
  }

  /** Streamed PCA ANN (the `stream_ann_pca` entry): index TRAINING
    * as maintained state — each embedding shard contributes one
    * dim²-double Gram delta (the sufficient statistic is a pure
    * sum), and at query time the basis comes from folding the
    * |batches| Gram rows + one driver Jacobi, with NO corpus
    * re-scan. Query = project the maintained store, shortlist,
    * exact-rerank (the batch `sim_ann_pca` path under the
    * maintained-trained basis). */
  def streamedAnnPca(spark: SparkSession, dir: String, numQueries: Int = 8,
                     k: Int = 10, dOut: Int = 32,
                     shortlist: Int = 100): DataFrame = {
    import spark.implicits._
    val state = driveVecGram(spark, dir)
    // an empty micro-batch writes a (dim=0, empty) Gram row — skip
    // those rather than letting a first-empty batch zero the basis or
    // a later one index past an empty flat; all real dims must agree
    val grams = spark.read.parquet(s"$state/gram")
      .orderBy(col("batch"))
      .select("dim", "gram").as[(Int, Seq[Double])].collect()
      .filter { case (d, flat) => d > 0 && flat.nonEmpty }
    val dim = if (grams.isEmpty) 0 else grams.map(_._1).max
    require(grams.forall(_._1 == dim),
      s"gram dimension mismatch across batches: ${grams.map(_._1).distinct.toSeq}")
    val gram = Array.ofDim[Double](dim, dim)
    grams.foreach { case (_, flat) =>
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { gram(i)(j) += flat(i * dim + j); j += 1 }
        i += 1
      }
    }
    val (basis, _) = graft.operators.Similarity.pcaBasisFromGram(gram, dOut)
    graft.operators.Similarity.annTopKPcaRerank(
      spark.read.parquet(s"$state/vecs").select("vec_id", "embedding"),
      numQueries, k, dOut, shortlist, basisOpt = Some(basis))
  }

  /** One streamed-contamination micro-batch (the
    * `stream_contamination` state machine). Exact-once hit
    * attribution: a (train doc, shingle ∈ eval vocab) hit is counted
    * in the batch where the LATER of the two sides arrived —
    *   term1 = this batch's train shingles ⋉ eval vocab through this
    *           batch (old ∪ new — covers train arriving last),
    *   term2 = STORED train shingles ⋉ this batch's genuinely-new
    *           eval shingles (covers eval arriving last — the
    *           retro-flag the batch audit never needs),
    * so per-batch hit deltas sum-fold exactly whatever the arrival
    * order. Stored train shingles are bucket-partitioned by
    * `pmod(xxhash64(shingle), nBuckets)` and the retro read touches
    * ONLY the new eval shingles' buckets (partition-pruned — at
    * 100 TB the stored-shingle table is corpus-sized but a batch
    * reads the few buckets its eval delta hashes to; eval deltas are
    * megabytes against the corpus). Contract: shards append-only and
    * disjoint across batches; overwrite + marker make crash-window
    * replay a no-op (deltas recompute identically — evalNew derives
    * from batches strictly before this one). */
  private[graft] def contaminationBatch(batch0: org.apache.spark.sql.DataFrame,
                                        batchId: Long, statePath: String,
                                        evalMod: Int = 50, n: Int = 5,
                                        nBuckets: Int = 64): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_cont_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val docs = batch0.dropDuplicates("doc_id").select(col("doc_id"), col("text"))
    val trainB = docs.filter(col("doc_id") % evalMod =!= 0)
    val evalB = docs.filter(col("doc_id") % evalMod === 0)
    val bkt = pmod(xxhash64(col("shingle")), lit(nBuckets.toLong)).cast("int")
    val trainSh = graft.operators.Dedup.wordShingles(trainB, n)
      .withColumn("bkt", bkt).persist()
    val evalOld =
      if (hasVisibleData(spark, s"$statePath/eval_sh"))
        spark.read.parquet(s"$statePath/eval_sh")
          .filter(col("batch") < batchId).select("shingle")
      else Seq.empty[String].toDF("shingle")
    val evalNew = graft.operators.Dedup.wordShingles(evalB, n)
      .select("shingle").distinct()
      .join(evalOld, Seq("shingle"), "left_anti")
      .withColumn("bkt", bkt).persist()
    try {
      graft.operators.Dedup.shingleSetSizes(trainB, n)
        .write.mode("overwrite").parquet(s"$statePath/train_docs/batch=$batchId")
      evalNew.write.mode("overwrite").parquet(s"$statePath/eval_sh/batch=$batchId")
      val term1 = trainSh
        .join(broadcast(evalOld.union(evalNew.select("shingle"))),
          Seq("shingle"), "left_semi")
        .select("doc_id")
      val newBkts = evalNew.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      val term2 =
        if (newBkts.isEmpty || !hasVisibleData(spark, s"$statePath/train_sh"))
          spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
        else spark.read.parquet(s"$statePath/train_sh")
          .filter(col("batch") < batchId && col("bkt").isin(newBkts: _*))
          .join(broadcast(evalNew.select("shingle")), Seq("shingle"), "left_semi")
          .select("doc_id")
      term1.union(term2).groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        .write.mode("overwrite").parquet(s"$statePath/hits/batch=$batchId")
      // cluster by bucket before the partitioned write (one file per
      // (batch, bucket) — the bm25IndexBatch fan-out note)
      trainSh.select("doc_id", "shingle", "bkt")
        .repartition(col("bkt"))
        .write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$statePath/train_sh/batch=$batchId")
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { trainSh.unpersist(); evalNew.unpersist(); () }
  }

  /** Resolve the maintained contamination state to
    * [[graft.operators.TextAnalysis.contamination]]'s exact shape:
    * per-batch hit deltas sum-fold (exact-once by construction),
    * set sizes read as written. Resolve never touches shingles —
    * it is a fold over two doc-keyed tables. */
  def contaminationResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/train_docs")) {
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("doc_id", "n_sh", "n_contaminated", "contamination")
    }
    val hits =
      if (hasVisibleData(spark, s"$statePath/hits"))
        spark.read.parquet(s"$statePath/hits")
          .groupBy("doc_id").agg(sum("n_hits").as("n_contaminated"))
      else Seq.empty[(Long, Long)].toDF("doc_id", "n_contaminated")
    spark.read.parquet(s"$statePath/train_docs")
      .select("doc_id", "n_sh")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_sh"), 4)
          .as("contamination"))
  }

  /** Streamed benchmark-contamination audit (the
    * `stream_contamination` entry): the always-on face of
    * `ta_contamination` — corpus shards land carrying BOTH train and
    * eval docs in any interleaving, and the audit stays continuously
    * current because a late-arriving eval shingle retro-flags every
    * already-ingested train doc that contains it (the pruned term2
    * read), which the batch audit gets for free only by rescanning
    * the corpus per run. Shares `ta_contamination`'s oracle verbatim
    * after the drain. */
  def streamedContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-cont-ing-").toString
    val incoming = s"$base/incoming"
    // % 3 split (not % 2): eval ids are % 50 == 0, all even — a
    // parity split would land every eval doc in one shard and never
    // drive the retro term at entry scale
    docs.filter(col("doc_id") % 3 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 3 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        contaminationBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    contaminationResolve(spark, state)
  }

  /** Streamed quality-classifier scoring — the always-on face of
    * `ta_quality_clf`: per-doc scoring is STATELESS (broadcast
    * weights, no corpus statistics), so each micro-batch scores
    * independently and the drained table equals the batch scorer
    * over the whole corpus — the entry shares its SQL oracle
    * verbatim. Per-batch results land in per-batch directories with
    * overwrite semantics + commit markers (replay-safe in the crash
    * window, the urlDedup pattern). This is the deployment shape of
    * the learned filter: train once, broadcast micros weights, score
    * every arriving shard at scan speed.
    */
  def streamedQualityClassify(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(Long, Long, Double, Boolean)]
        .toDF("doc_id", "n_feats", "logit", "keep")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-clf-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        qualityClassifyBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$state/scored")
      .select("doc_id", "n_feats", "logit", "keep")
  }

  /** One streamed-language-span micro-batch: spans are a pure
    * per-document function (windows within the doc — no corpus
    * statistics), so each batch segments independently into
    * overwrite delta dirs with commit markers (the
    * qualityClassifyBatch shape). */
  private[graft] def langSpansBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_lspan_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis.langSpans(
        batch0.select(col("doc_id"), col("text")).dropDuplicates("doc_id"))
      .write.mode("overwrite").parquet(s"$statePath/spans/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Streamed language-span segmentation (the `stream_lang_spans`
    * entry): the always-on face of `ta_lang_spans` — spans are
    * per-document, so arriving shards segment at scan speed and the
    * drained table equals the batch operator over the whole corpus
    * (oracle shared verbatim). The deployment shape of span-level
    * language curation: each shard's spans are final the moment it
    * lands — no resolve-time recomputation at all. */
  def streamedLangSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-lspan-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        langSpansBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$state/spans")
      .select("doc_id", "span_idx", "lang", "start_win", "end_win", "n_windows")
  }

  /** Streamed top-p curation (the `stream_quality_topp` entry): the
    * expensive pass — tokenize + hashed-feature scoring — runs
    * INCREMENTALLY per batch into the maintained scored store (the
    * `stream_quality_clf` machinery, reused verbatim), and the
    * inherently-GLOBAL rank selection runs at resolve over the
    * accumulated scores: one window over one sort per source, no
    * re-scoring. That split is the real deployment shape — a
    * re-curation at a new p re-ranks in seconds without paying the
    * scoring pass again. Shares `ta_quality_topp`'s oracle verbatim.
    */
  def streamedQualityTopP(spark: SparkSession, dir: String,
                          pPpm: Long = 250000L): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(Long, String, Double, Long)]
        .toDF("doc_id", "source", "logit", "rk")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-topp-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        qualityClassifyBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val scored = spark.read.parquet(s"$state/scored")
      .select(col("doc_id"), col("logit"))
      .join(graft.Tables.documents(spark, dir).select("doc_id", "source"),
        Seq("doc_id"))
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
    scored
      .withColumn("rk", row_number().over(
        bySrc.orderBy(col("logit").desc, col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(bySrc))
      .filter(col("rk") * lit(1000000L) <= lit(pPpm) * col("n_src"))
      .select(col("doc_id"), col("source"), col("logit"),
        col("rk").cast("long").as("rk"))
  }

  /** Streamed RETRAIN face of the learned quality filter: labeled
    * (id, text, label) shards land in an append-only labeled store
    * (per-batch overwrite delta dirs + commit markers — the
    * urlDedupBatch pattern), the model retrains DISTRIBUTED over the
    * accumulated store after the drain, and the documents table is
    * scored with the fresh weights. Training is a pure function of
    * the accumulated SET: the micros-gradient sums are exact Longs
    * in any order and re-delivered ids dedup on read, so the
    * streamed retrain equals batch training on the whole labeled
    * corpus — the entry shares `ta_quality_clf_full`'s oracle
    * VERBATIM (which also re-proves local/distributed bit-equality
    * through the same hash). */
  def streamedQualityRetrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val labeled = TextAnalysis.clfPlantedCorpus.zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
    val base = java.nio.file.Files.createTempDirectory("graft-clfrt-ing-").toString
    val incoming = s"$base/incoming"
    labeled.filter(_._1 % 2 == 0).toDF("id", "text", "label")
      .coalesce(1).write.mode("append").parquet(incoming)
    labeled.filter(_._1 % 2 != 0).toDF("id", "text", "label")
      .coalesce(1).write.mode("append").parquet(incoming)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType),
        StructField("text", StringType), StructField("label", BooleanType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        labeledCorpusBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val corpus = spark.read.parquet(s"$state/labeled")
      .dropDuplicates("id").select(col("text"), col("label"))
    val model = TextAnalysis.qualityClfTrainDistributed(corpus, 4096)
    TextAnalysis.qualityClassify(graft.Tables.documents(spark, dir),
      TextAnalysis.clfMicrosArtifact(model, 4096))
  }

  /** One [[streamedQualityRetrain]] labeled-store micro-batch,
    * exposed for the replay spec. */
  private[graft] def labeledCorpusBatch(batch0: org.apache.spark.sql.DataFrame,
                                        batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_lc_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    batch0.select(col("id"), col("text"), col("label")).dropDuplicates("id")
      .write.mode("overwrite").parquet(s"$statePath/labeled/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** HOT-SWAP face of the learned quality filter: scoring keeps
    * running while a retrain publishes a NEW weight version — no
    * stream restart, no half-scored batch. Weight tables live at
    * `weights/version=V` and become visible only when their commit
    * marker lands (write-then-mark, so a scoring batch can never
    * read a half-written table); each micro-batch resolves the
    * LATEST committed version at its start, scores the whole batch
    * under it, and stamps every output row with `weights_version` —
    * the lineage a later re-cleaning decision needs ("which docs
    * were admitted by the old model?"). In this harness the retrain
    * lands between batch 0 and batch 1 (v1 = the shipped
    * planted-corpus model, v2 = the full-batch model) and the batch
    * split is parity-deterministic with mtime-pinned order (the
    * qualityAudit rule), so the result is SQL-expressible: even docs
    * score under v1, odd under v2 — the oracle embeds BOTH
    * artifacts. At 100 TB the swap costs one ~weights-sized
    * broadcast on the next batch; nothing rescans, nothing restarts.
    */
  def streamedQualityHotswap(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(Long, Long, Double, Boolean, Long)]
        .toDF("doc_id", "n_feats", "logit", "keep", "weights_version")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-hs-ing-").toString
    val incoming = s"$base/incoming"
    val inPath = new org.apache.hadoop.fs.Path(incoming)
    val infs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stampShard(mtime: Long): Unit =
      infs.listStatus(inPath).foreach { s =>
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".") && s.getModificationTime >= mtime)
          infs.setTimes(s.getPath, mtime, -1)
      }
    // version-dependent output needs the batch ORDER pinned: even
    // shard scores first (v1), odd second (v2)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    stampShard(1000000L)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    stampShard(2000000L)
    graft.operators.Checkpoints.free(docs)
    val state = s"$base/state"
    publishWeights(spark, state, 1L, TextAnalysis.qualityClfArtifact)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // the retrain lands while batch 0 is already scored: v2
        // publishes just before batch 1 — the cut-over moment this
        // face exists to model
        if (id >= 1L) publishWeights(spark, state, 2L, TextAnalysis.qualityClfFullArtifact)
        qualityHotswapBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$state/scored")
      .select("doc_id", "n_feats", "logit", "keep", "weights_version")
  }

  /** Publish one weight version: write the table, THEN the commit
    * marker — readers trust only marked versions, so a crash between
    * the two leaves an invisible directory a retry overwrites.
    * Idempotent per version. */
  private[graft] def publishWeights(spark: SparkSession, statePath: String,
      version: Long, artifact: (Seq[(Long, Long)], Long, Int)): Unit = {
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_w_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, version.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis.qualityClfSaveWeights(
      artifact, s"$statePath/weights/version=$version", spark)
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Latest COMMITTED weight version — marker presence, never a
    * directory listing (a half-published version is invisible). */
  private[graft] def currentWeightsVersion(spark: SparkSession,
                                           statePath: String): Long = {
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_w_commits")
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(cfs.exists(commitDir), s"no committed weight versions under $statePath")
    val vs = cfs.listStatus(commitDir).map(_.getPath.getName.toLong)
    require(vs.nonEmpty, s"no committed weight versions under $statePath")
    vs.max
  }

  /** One hot-swap scoring micro-batch: resolve the latest committed
    * version at batch start, score the WHOLE batch under it, stamp
    * rows with the version. Replay is a marker no-op; a crash-window
    * RETRY rescores the whole batch under the then-current version
    * (overwrite semantics — the version column records the truth,
    * and a batch is never half-old half-new). */
  private[graft] def qualityHotswapBatch(batch0: org.apache.spark.sql.DataFrame,
                                         batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_hs_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val v = currentWeightsVersion(spark, statePath)
    val artifact = graft.operators.TextAnalysis.qualityClfLoadWeights(
      s"$statePath/weights/version=$v", spark)
    graft.operators.TextAnalysis.qualityClassify(
        batch0.select(col("doc_id"), col("text")).dropDuplicates("doc_id"), artifact)
      .withColumn("weights_version", lit(v))
      .write.mode("overwrite").parquet(s"$statePath/scored/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** One [[streamedQualityClassify]] micro-batch, exposed for the
    * replay spec. */
  private[graft] def qualityClassifyBatch(batch0: org.apache.spark.sql.DataFrame,
                                          batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_clf_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis.qualityClassify(
        batch0.select(col("doc_id"), col("text")).dropDuplicates("doc_id"))
      .write.mode("overwrite").parquet(s"$statePath/scored/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Streamed CDC chunk-store maintenance — the [[streamedUrlDedup]]
    * pure-delta pattern keyed by CDC chunk hash: per batch, chunk the
    * arriving docs ([[graft.operators.Dedup.cdcChunks]] — boundaries
    * are a function of local content, so per-batch chunking equals
    * whole-corpus chunking exactly) and write one (chunk_md5,
    * batch-min doc, batch count, len) aggregate to a per-batch
    * overwrite directory; resolve's global min/sum merge is
    * order-independent and filters to duplicated chunks, so the entry
    * shares `dedup_cdc`'s oracle verbatim. This is the always-on
    * chunk store a storage-dedup deployment maintains: each arriving
    * shard's blocks land as deltas, duplicated-block accounting stays
    * continuously current, nothing is rewritten or rescanned.
    */
  def streamedCdcDedup(spark: SparkSession, dir: String,
                       minLen: Int = 0, maxLen: Int = 0): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("chunk_md5", "keep_doc_id", "n_copies", "chunk_len")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-cdc-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        cdcDedupBatch(b, id, state, minLen, maxLen)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    cdcDedupResolve(spark, state)
  }

  /** One [[streamedCdcDedup]] micro-batch, exposed for the replay
    * spec. minLen > 0 chunks through [[graft.operators.Dedup
    * .cdcChunksMin]] — the clamp fold is per-DOC local (the kept-
    * boundary chain never crosses documents), so per-batch chunking
    * still equals whole-corpus chunking exactly and the min variant
    * shares `dedup_cdc_min`'s oracle verbatim. */
  private[graft] def cdcDedupBatch(batch0: org.apache.spark.sql.DataFrame,
                                   batchId: Long, statePath: String,
                                   minLen: Int = 0, maxLen: Int = 0): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_cdc_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val in = batch0.select(col("doc_id"), col("text")).dropDuplicates("doc_id")
    // maxLen > 0 selects the full size envelope; the clamp folds are
    // per-DOC local either way, so per-batch == whole-corpus holds
    (if (maxLen > 0) graft.operators.Dedup.cdcChunksClamped(in, minLen = minLen, maxLen = maxLen)
     else if (minLen > 0) graft.operators.Dedup.cdcChunksMin(in, minLen = minLen)
     else graft.operators.Dedup.cdcChunks(in))
      .groupBy("chunk_md5")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"),
        min(col("chunk_len")).as("chunk_len"))
      .write.mode("overwrite").parquet(s"$statePath/deltas/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Resolve the maintained chunk-store deltas to the duplicated-
    * chunk accounting table (the batch `cdcDedup` shape). */
  def cdcDedupResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/deltas")) {
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("chunk_md5", "keep_doc_id", "n_copies", "chunk_len")
    }
    spark.read.parquet(s"$statePath/deltas")
      .groupBy("chunk_md5")
      .agg(min(col("keep_doc_id")).as("keep_doc_id"),
        sum(col("n_copies")).as("n_copies"),
        min(col("chunk_len")).as("chunk_len"))
      .filter(col("n_copies") >= 2)
  }

  def urlDedupIngest(urlStream: DataFrame, statePath: String,
                     checkpoint: String, nBuckets: Int = 16): Unit = {
    val q = urlStream
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        urlDedupBatch(b, id, statePath, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One [[urlDedupIngest]] micro-batch, exposed for the replay spec. */
  private[graft] def urlDedupBatch(batch0: org.apache.spark.sql.DataFrame,
                                   batchId: Long, statePath: String,
                                   nBuckets: Int): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_url_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    batch0.select(col("doc_id"), col("url")).dropDuplicates("doc_id")
      .select(col("doc_id"),
        graft.operators.Dedup.canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .withColumn("bucket", pmod(xxhash64(col("canonical_url")), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$statePath/deltas/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Resolve the maintained URL-dedup deltas: global min survivor,
    * global copy count per canonical URL. */
  def urlDedupResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/deltas")) {
      return Seq.empty[(String, Long, Long)]
        .toDF("canonical_url", "keep_doc_id", "n_copies")
    }
    spark.read.parquet(s"$statePath/deltas")
      .groupBy("canonical_url")
      .agg(min(col("keep_doc_id")).as("keep_doc_id"),
        sum(col("n_copies")).as("n_copies"))
  }

  /** Streamed per-source drift alarms — the always-on face of
    * `ta_source_drift`, and a [[streamedUrlDedup]]-family PURE-DELTA
    * member: each micro-batch appends its own (source, x, cr, cc)
    * count deltas (bounded by sources × distinct values, never doc
    * rows) to a per-batch overwrite directory, and resolve merges
    * with a cell-wise SUM — order-independent, so the entry shares
    * the batch oracle verbatim. The KS roll-up itself is
    * [[graft.operators.TextAnalysis.sourceDriftFromCounts]], the
    * same code the batch operator runs (no drift between faces).
    * Deployment story: the alarm table refreshes per batch at
    * count-table cost; an alarming source triggers the retrain whose
    * cut-over is [[streamedQualityHotswap]].
    */
  def streamedSourceDrift(spark: SparkSession, dir: String,
                          thresholdPpm: Long = 150000L): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long, Long, Boolean)]
        .toDF("source", "n_ref", "n_cur", "d_raw", "ks_ppm", "alarm")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-drift-ing-").toString
    val incoming = s"$base/incoming"
    // shards split ACROSS the ref/cur windows (doc_id mod 4), so each
    // batch carries deltas for both windows — the merge, not the
    // shard layout, produces the final counts
    docs.filter(col("doc_id") % 4 < 2).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 4 >= 2).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType), StructField("n_chars", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sourceDriftBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sourceDriftResolve(spark, state, thresholdPpm)
  }

  /** One [[streamedSourceDrift]] micro-batch: the batch's own count
    * deltas, overwrite + marker (replay-safe). */
  private[graft] def sourceDriftBatch(batch0: org.apache.spark.sql.DataFrame,
                                      batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_drift_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis.sourceDriftCounts(
        batch0.dropDuplicates("doc_id"))
      .write.mode("overwrite").parquet(s"$statePath/deltas/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Merge the maintained count deltas (cell-wise sum — exact and
    * order-independent) and run the shared KS roll-up. */
  def sourceDriftResolve(spark: SparkSession, statePath: String,
                         thresholdPpm: Long = 150000L): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/deltas")) {
      return Seq.empty[(String, Long, Long, Long, Long, Boolean)]
        .toDF("source", "n_ref", "n_cur", "d_raw", "ks_ppm", "alarm")
    }
    val merged = spark.read.parquet(s"$statePath/deltas")
      .groupBy("source", "x")
      .agg(sum(col("cr")).as("cr"), sum(col("cc")).as("cc"))
    graft.operators.TextAnalysis.sourceDriftFromCounts(merged, thresholdPpm)
  }

  /** Streamed temperature-mix maintenance — a
    * [[streamedSourceDrift]]-family PURE-DELTA member: each
    * micro-batch appends its own per-source token-count aggregate
    * (bounded by |sources| rows, never doc rows) to a per-batch
    * overwrite dir; resolve merges with an exact sum
    * (order-independent) and runs the SHARED temperature arithmetic
    * ([[graft.operators.TextAnalysis.mixTemperatureFromCounts]] — the
    * same code the batch entry runs), so `stream_mix` shares
    * `ta_mix_temperature`'s oracle verbatim. Deployment story: the
    * mix table a sampler reads stays continuously current as shards
    * land, at count-table cost.
    */
  def streamedMixTemperature(spark: SparkSession, dir: String,
                             alpha: Double = 0.3): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "n_tokens", "share_ppm", "temp_share_ppm", "boost_ppm")
    }
    val base = java.nio.file.Files.createTempDirectory("graft-mix-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        mixCountBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    mixResolve(spark, state, alpha)
  }

  /** One [[streamedMixTemperature]] micro-batch: the batch's own
    * per-source token counts, overwrite + marker (replay-safe). */
  private[graft] def mixCountBatch(batch0: org.apache.spark.sql.DataFrame,
                                   batchId: Long, statePath: String): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_mix_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    graft.operators.TextAnalysis.perSourceTokenCounts(
        batch0.dropDuplicates("doc_id"))
      .write.mode("overwrite").parquet(s"$statePath/deltas/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Merge the maintained count deltas (exact sum) and run the shared
    * temperature arithmetic. */
  def mixResolve(spark: SparkSession, statePath: String,
                 alpha: Double = 0.3): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/deltas")) {
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "n_tokens", "share_ppm", "temp_share_ppm", "boost_ppm")
    }
    graft.operators.TextAnalysis.mixTemperatureFromCounts(
      spark.read.parquet(s"$statePath/deltas")
        .groupBy("source").agg(sum(col("n_tokens")).as("n_tokens")), alpha)
  }

  /** Streamed KLL sketch-store maintenance — the mergeable-quantile
    * deployment story ([[graft.operators.Sketches.kllQuantiles]]'s
    * always-on face): each micro-batch writes ONE KLL sketch per
    * source over its own values — a ~KB row regardless of batch
    * size — to a per-batch overwrite dir with a commit marker;
    * resolve merges the accumulated sketches ([[graft.functions
    * .Kll.merge]], O(batches·sources·k) driver arithmetic, no corpus
    * rescan) and answers the probe set through the SAME
    * probe-and-audit tail the batch query uses. Rows-only by the
    * batch entry's own reason (merge order shifts compaction
    * coins); the spec gates the rank-error bound and state
    * boundedness instead.
    */
  def streamedKllQuantiles(spark: SparkSession, dir: String, k: Int = 256,
      qPermille: Seq[Int] = Seq(10, 250, 500, 750, 900, 990)): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars")).localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      return graft.operators.Sketches.kllProbeAudit(
        graft.Tables.documents(spark, dir), "n_chars", None, qPermille)
    }
    val base = java.nio.file.Files.createTempDirectory("graft-kll-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 4 < 2).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 4 >= 2).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType), StructField("n_chars", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        kllSketchBatch(b, id, state, k)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Sketches.kllProbeAudit(
      graft.Tables.documents(spark, dir), "n_chars",
      kllSketchResolve(spark, state), qPermille)
  }

  /** One [[streamedKllQuantiles]] micro-batch: the batch's own
    * per-source sketches, overwrite + marker (replay-safe). */
  private[graft] def kllSketchBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String,
                                    k: Int): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_kll_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val kllUdaf = udaf(new graft.functions.KllAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)
    batch0.dropDuplicates("doc_id")
      .select(col("source"), col("n_chars").cast("long").as("v"))
      .groupBy("source").agg(kllUdaf(col("v")).as("sk"))
      .write.mode("overwrite").parquet(s"$statePath/sketches/batch=$batchId")
    cfs.mkdirs(commitDir)
    cfs.create(marker, true).close()
  }

  /** Merge the maintained sketch store to one corpus sketch —
    * O(store rows · k) driver arithmetic, never a corpus rescan. */
  private[graft] def kllSketchResolve(spark: SparkSession,
                                      statePath: String): Option[graft.functions.KllSketch] = {
    import graft.functions.{Kll, KllSketch}
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/sketches")) return None
    val sketches = spark.read.parquet(s"$statePath/sketches")
      .select(col("sk.*")).as[KllSketch].collect()
    if (sketches.isEmpty) None else Some(sketches.reduce(Kll.merge))
  }

  /** Production ingest sink: stream → `foreachBatch` → MERGE-on-write
    * into hour-partitioned parquet. Each batch upserts by event_id
    * into exactly the hour partitions it touches: prior rows of those
    * hours are kept unless the batch re-delivers their event_id, then
    * the whole hour directory is dynamic-overwritten with the merged
    * set. That makes the sink idempotent at EVENT level — safe under
    * replayed batches (crash before checkpoint commit, fresh
    * checkpoints, full backfill re-runs) AND under an event hour
    * spanning multiple batches or runs, where a bare
    * partition-overwrite of only the batch's rows would silently
    * delete the hour's earlier events. Untouched hours are never
    * read or rewritten (partition pruning on the read-back); the
    * merged frame is localCheckpoint-ed before the write so its
    * lineage cannot depend on the files being overwritten. This is
    * the no-table-format MERGE pattern; a real deployment with
    * Delta/Iceberg available would express the same thing as MERGE
    * INTO.
    */
  def ingestPartitioned(events: DataFrame, outPath: String,
                        checkpoint: String): Unit = {
    val q = events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd-HH").as("event_hour"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // Dedupe re-deliveries WITHIN the batch first: a source that
        // hands the same event_id twice in one micro-batch must still
        // write it once, or event-level idempotence only holds across
        // batches, not inside one.
        val b = batch.dropDuplicates("event_id").persist()
        try {
          val hours = b.select("event_hour").distinct().collect().map(_.getString(0))
          // Existence of prior output resolved through the Hadoop
          // FileSystem API, not java.io.File — the sink targets HDFS/
          // S3/local alike; a local-only check would make every remote
          // replay silently overwrite touched hours with batch rows.
          val hadoopPath = new org.apache.hadoop.fs.Path(outPath)
          val fs = hadoopPath.getFileSystem(
            b.sparkSession.sparkContext.hadoopConfiguration)
          val merged =
            if (hours.isEmpty) b
            else if (!fs.exists(hadoopPath)) b
            else {
              val existing = b.sparkSession.read.parquet(outPath)
                .filter(col("event_hour").isin(hours.toSeq: _*))
              existing
                .join(b.select("event_id").distinct(), Seq("event_id"), "left_anti")
                .unionByName(b)
            }
          if (hours.nonEmpty) {
            graft.sources.Sources.overwritePartitions(
              merged.localCheckpoint(true), outPath, Seq("event_hour"))
          }
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[ingestPartitioned]] over the standard events source. */
  def ingestPartitioned(spark: SparkSession, dir: String, outPath: String,
                        checkpoint: String): Unit =
    ingestPartitioned(EventStreams.readEventStream(spark, dir), outPath, checkpoint)

  /** One SCD2 interval row as persisted by [[scd2Ingest]]. */
  case class Scd2Row(user_id: Long, run_id: Long, state: String,
                     valid_from_us: Long, valid_to_us: Long, n_obs: Long)

  /** Incremental SCD2 dimension maintenance — the STREAMING face of
    * [[graft.operators.Relational.scd2Intervals]]: each micro-batch
    * of change events MERGEs into a persisted, user-bucketed
    * intervals table, so the dimension is continuously current
    * without ever rescanning history. The open run per user IS the
    * sufficient state: a batch folds each affected user's (sorted)
    * new observations against their open interval — same state
    * extends it, a different state closes it at the new observation
    * and opens the next run — while every closed interval passes
    * through untouched. Bucketed layout (user_id mod `nBuckets`) +
    * the [[ingestPartitioned]] dynamic-overwrite MERGE means a batch
    * rewrites ONLY the buckets its users touch.
    *
    * Ordered-ingest contract (the [[anomalousHours]] one): within a
    * batch, events sort by (time, event_id); across batches, files
    * land in time order. A straggler older than its user's open run
    * is DROPPED (never rewrites closed history) — spec-pinned.
    *
    * Finite-source parity: after any multi-batch run over ordered
    * files, the table equals the batch [[graft.operators.Relational
    * .scd2Intervals]] over the full event set — spec-pinned, the
    * cross-boundary gate every streaming operator here carries.
    *
    * Replay idempotence: foreachBatch is AT-LEAST-ONCE — after a
    * failure/restart the engine re-delivers the last uncommitted
    * micro-batch, and re-folding the same events into already-updated
    * open runs would double-count n_obs and split runs. So each
    * applied batchId is recorded as a marker under
    * `outPath/_scd2_commits/` (underscore-prefixed → invisible to the
    * parquet reader) and an already-marked batch is skipped outright
    * — the standard idempotent-foreachBatch MERGE pattern. The marker
    * lands after the partition overwrite; the residual window (crash
    * between overwrite and marker) re-applies a batch whose
    * observations are already folded, which the straggler guard below
    * CANNOT absorb — a table format's transactional MERGE is the full
    * fix, and this is exactly the boundary where a real deployment
    * would use one.
    */
  def scd2Ingest(events: DataFrame, outPath: String, checkpoint: String,
                 nBuckets: Int = 16): Unit = {
    val q = events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("tus"))
      .writeStream
      .foreachBatch { (batch0: org.apache.spark.sql.DataFrame, batchId: Long) =>
        scd2MergeBatch(batch0, batchId, outPath, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One [[scd2Ingest]] micro-batch MERGE, exposed for the replay
    * spec: calling it twice with the same batchId must leave the
    * table bit-identical (the second call is skipped via the commit
    * marker).
    */
  private[graft] def scd2MergeBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, outPath: String,
                                    nBuckets: Int): Unit = {
        val spark = batch0.sparkSession
        import spark.implicits._
        val commitDir = new org.apache.hadoop.fs.Path(outPath, "_scd2_commits")
        val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
        val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (cfs.exists(marker)) return // replayed batch: already applied
        val batch = batch0.persist()
        try {
          val hadoopPath = new org.apache.hadoop.fs.Path(outPath)
          val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val users = batch.select("user_id").distinct()
          val touchedBuckets = users
            .select(pmod(col("user_id"), lit(nBuckets.toLong)).as[Long])
            .distinct().collect().toSeq
          // only the touched buckets are ever read (partition pruning)
          // or rewritten; rows of UNTOUCHED users inside a touched
          // bucket must ride along or the overwrite would delete them
          val inTouched: org.apache.spark.sql.Dataset[Scd2Row] =
            if (fs.exists(hadoopPath))
              spark.read.parquet(outPath)
                .filter(col("bucket").isin(touchedBuckets: _*))
                .select(col("user_id"), col("run_id"), col("state"),
                  col("valid_from_us"), col("valid_to_us"), col("n_obs"))
                .as[Scd2Row]
            else spark.emptyDataset[Scd2Row]
          val keep = inTouched
            .join(broadcast(users), Seq("user_id"), "left_anti").as[Scd2Row]
          val affected = inTouched
            .join(broadcast(users), Seq("user_id"), "left_semi").as[Scd2Row]
          val openRuns = affected.filter(col("valid_to_us") === Long.MaxValue).as[Scd2Row]
          val closedRuns = affected.filter(col("valid_to_us") =!= Long.MaxValue).as[Scd2Row]
          // fold each user's sorted new observations against their open run
          val folded = openRuns.groupByKey(_.user_id).cogroup(
            batch.select(col("user_id").as[Long], col("tus").as[Long],
              col("event_id").as[Long], col("event_type").as[String])
              .groupByKey(_._1)) { (user, opens, evs) =>
            val open = opens.toSeq.headOption
            val sorted = evs.toSeq.sortBy(e => (e._2, e._3))
              // straggler guard: never rewrite closed history
              .filter(e => open.forall(o => e._2 >= o.valid_from_us))
            var out = List.empty[Scd2Row]
            var cur = open
            sorted.foreach { case (_, tus, _, state) =>
              cur match {
                case Some(o) if o.state == state =>
                  cur = Some(o.copy(n_obs = o.n_obs + 1))
                case Some(o) =>
                  out ::= o.copy(valid_to_us = tus)
                  cur = Some(Scd2Row(user, o.run_id + 1, state, tus, Long.MaxValue, 1L))
                case None =>
                  cur = Some(Scd2Row(user, 1L, state, tus, Long.MaxValue, 1L))
              }
            }
            (out reverse_::: cur.toList).iterator
          }
          val merged = keep.unionByName(closedRuns).unionByName(folded).toDF()
            .withColumn("bucket", pmod(col("user_id"), lit(nBuckets.toLong)))
          if (!merged.isEmpty) {
            graft.sources.Sources.overwritePartitions(
              merged.localCheckpoint(true), outPath, Seq("bucket"))
          }
          // commit LAST: a crash before this point replays the batch,
          // and the marker check above turns that replay into a no-op
          // only for batches that fully landed
          cfs.mkdirs(commitDir)
          cfs.create(marker, true).close()
        } finally { batch.unpersist(); () }
  }

  /** Write a keyed snapshot as the bucketed reference table the
    * streaming diff maintains reads against: (k, oh=md5(payload)),
    * partitioned by bucket = k mod nBuckets — so a micro-batch
    * touching few buckets reads few buckets (partition pruning), the
    * same layout contract as [[scd2Ingest]].
    */
  def writeSnapshotTable(df: DataFrame, keyCol: String, payloadCol: String,
                         path: String, nBuckets: Int = 16): Unit =
    df.select(col(keyCol).cast("long").as("k"), md5(col(payloadCol)).as("oh"))
      .withColumn("bucket", pmod(col("k"), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Streaming face of [[graft.operators.Relational.snapshotDiff]] —
    * the promote-gate as a continuous job: the NEW snapshot arrives
    * shard by shard (each key exactly once across the run), each
    * micro-batch is diffed against ONLY the maintained table buckets
    * it touches, and per-key statuses append to a bucketed diff
    * table. `added`/`changed`/`unchanged` are decidable per batch
    * from the (k, nh) rows alone; `removed` is inherently a
    * whole-snapshot fact (a key is removed only if NO shard delivers
    * it), so it is resolved by [[snapshotDiffSummary]] once the
    * stream drains — one LEFT ANTI of table keys vs seen keys.
    *
    * Batches replay at-least-once, so each applied batchId is
    * recorded as a commit marker and replays are skipped — without
    * it a replayed shard would append duplicate status rows and
    * double-count the diff ([[IngestStreams.scd2MergeBatch]]'s pattern).
    *
    * Input stream schema: (k: Long, nh: String) — key and md5 of the
    * new payload.
    */
  def snapshotDiffIngest(newSnapshot: DataFrame, tablePath: String,
                         diffPath: String, checkpoint: String,
                         nBuckets: Int = 16): Unit = {
    val q = newSnapshot
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        snapshotDiffBatch(b, id, tablePath, diffPath, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One [[snapshotDiffIngest]] micro-batch, exposed for the replay
    * spec: the maintained-table read is pruned to the batch's
    * buckets; a re-delivered batchId is a no-op.
    */
  private[graft] def snapshotDiffBatch(batch0: org.apache.spark.sql.DataFrame,
                                       batchId: Long, tablePath: String,
                                       diffPath: String, nBuckets: Int): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val commitDir = new org.apache.hadoop.fs.Path(diffPath, "_diff_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return // replayed batch: already applied
    val batch = batch0.dropDuplicates("k")
      .withColumn("bucket", pmod(col("k"), lit(nBuckets.toLong)))
      .persist()
    try {
      val touched = batch.select(col("bucket").as[Long]).distinct().collect().toSeq
      if (touched.nonEmpty) {
        // partition pruning: only the touched bucket directories of
        // the maintained table are ever read. An EMPTY maintained
        // table (zero-row partitionBy write — only _SUCCESS on disk)
        // must read as no old keys, not fail schema inference.
        val old =
          if (StreamState.hasDataFiles(spark, tablePath))
            spark.read.parquet(tablePath)
              .filter(col("bucket").isin(touched: _*))
              .select(col("k"), col("oh"))
          else Seq.empty[(Long, String)].toDF("k", "oh")
        val statuses = batch.select(col("k"), col("nh"), col("bucket"))
          .join(old, Seq("k"), "left")
          .select(col("k"),
            when(col("oh").isNull, "added")
              .when(col("oh") =!= col("nh"), "changed")
              .otherwise("unchanged").as("status"),
            col("bucket"))
        statuses.write.mode("append").partitionBy("bucket").parquet(diffPath)
      }
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { batch.unpersist(); () }
  }

  /** Close out a drained [[snapshotDiffIngest]] run: statuses from
    * the diff table plus the `removed` count (maintained-table keys
    * no shard delivered). Output schema and semantics are exactly
    * [[graft.operators.Relational.snapshotDiff]]'s (status, n) —
    * statuses with zero rows are absent, matching the batch twin's
    * groupBy.
    */
  def snapshotDiffSummary(spark: SparkSession, tablePath: String,
                          diffPath: String): DataFrame = {
    // hasVisibleData, not fs.exists: a drained run of all-empty
    // micro-batches leaves only the _diff_commits marker dir, which
    // parquet schema inference rejects
    val seen =
      if (hasVisibleData(spark, diffPath))
        spark.read.parquet(diffPath).select(col("k"), col("status"))
      else {
        import spark.implicits._
        Seq.empty[(Long, String)].toDF("k", "status")
      }
    val oldKeys =
      if (StreamState.hasDataFiles(spark, tablePath))
        spark.read.parquet(tablePath).select(col("k"))
      else {
        import spark.implicits._
        Seq.empty[Long].toDF("k")
      }
    val removed = oldKeys
      .join(seen.select(col("k")), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("removed").as("status"), col("n"))
    seen.groupBy(col("status")).agg(count(lit(1)).as("n"))
      .unionByName(removed)
      .filter(col("n") > 0)
  }

  /** End-to-end streamed snapshot reconciliation over the documents
    * table (the `stream_snapshot_diff` entry) — the same synthetic
    * v_old/v_new pair as `q_snapshot_diff`, with v_new arriving as
    * TWO shard files → two micro-batches. The summary must equal the
    * batch diff bit-for-bit, so it shares `q_snapshot_diff`'s DuckDB
    * oracle.
    */
  def streamedSnapshotDiff(spark: SparkSession, dir: String,
                           nBuckets: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val vOld = docs.filter(col("doc_id") % 41 =!= 0)
    val vNew = docs.filter(col("doc_id") % 43 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 37 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    val base = java.nio.file.Files.createTempDirectory("graft-snapdiff-").toString
    val tablePath = s"$base/table"
    val incoming = s"$base/incoming"
    writeSnapshotTable(vOld, "doc_id", "text", tablePath, nBuckets)
    val hashed = vNew.select(col("doc_id").cast("long").as("k"),
      md5(col("text")).as("nh"))
    hashed.filter(col("k") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    hashed.filter(col("k") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("k", LongType), StructField("nh", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    snapshotDiffIngest(stream, tablePath, s"$base/diff", s"$base/ckpt", nBuckets)
    snapshotDiffSummary(spark, tablePath, s"$base/diff")
  }

  /** Streamed perceptual-hash near-dup maintenance — the MEDIA twin
    * of [[nearDedupIngest]] (minhash is the text face, aHash bands
    * the media face): shard the payload docs into two micro-batches,
    * maintain band/phash state, and resolve the same per-doc summary
    * as batch `Multimodal.phashSummary` — verbatim-shared oracle,
    * because every pair is generated exactly once (in the batch its
    * later-arriving member lands in) from band-equality collisions
    * with no RNG anywhere.
    */
  def streamedPhashDedup(spark: SparkSession, dir: String,
                         nBuckets: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-ph-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    phashIngest(stream, s"$base/state", s"$base/ckpt", nBuckets)
    phashResolve(spark, s"$base/state")
  }

  /** Streamed REAL-decoder phash maintenance (the
    * `stream_phash_decoded` entry): the decoded twin of
    * [[streamedPhashDedup]] — each doc renders to a real PNG (the
    * `mm_phash_decoded` fixture), arrives as a binary payload, and
    * the maintenance runs ImageIO decode + DCT phash per arrival
    * with the SAME band state, cumulative-df cap, and resolve
    * re-filter. Rows-only gate (the DCT-double reason); the spec
    * pins streamed == batch `phashSummaryDecoded`. */
  def streamedPhashDecoded(spark: SparkSession, dir: String,
                           nBuckets: Int = 16): DataFrame =
    streamedPhashDecodedDocs(spark,
      graft.Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      nBuckets)

  /** The decoded-phash drive over an explicit (doc_id, text) frame —
    * the `stream_phash_decoded_gate` entry runs it over the PLANTED
    * corpus whose local-twin summary is embedded in the oracle. */
  def streamedPhashDecodedDocs(spark: SparkSession, docs0: DataFrame,
                               nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val docs = graft.operators.Checkpoints.cpuSplit(docs0)
      .as[(Long, String)]
      .map { case (id, t) => (id, graft.operators.Multimodal.pngFromPayload(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))) }
      .toDF("doc_id", "payload")
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-phd-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        phashBatch(b, id, s"$base/state", nBuckets, decoded = true)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    phashResolve(spark, s"$base/state")
  }

  /** CONTINUOUS MEDIA ingest — [[phashIngest]] fed from a streaming
    * `binaryFile` landing directory ([[graft.sources.Sources
    * .readBinaryCorpusStream]]): each arriving media file becomes a
    * payload row (doc_id = xxhash64 of the file name — stable across
    * redelivery; raw bytes, never a string round-trip), and the same
    * phashBatch maintenance applies — bands/pairs state, pruned
    * partition reads, commit markers. The media twin of the
    * documents-table ingest family, completing the 37m/37q machinery
    * with a genuinely-binary source face.
    */
  def mediaPhashIngest(binStream: DataFrame, statePath: String,
                       checkpoint: String, nBuckets: Int = 16): Unit = {
    val docs = binStream.select(
      xxhash64(col("media_name")).as("doc_id"),
      col("content").as("payload"))
    phashIngest(docs, statePath, checkpoint, nBuckets)
  }

  /** Streaming ingest for phash near-dup maintenance. State under
    * `statePath`: `phs` — per-doc band arrays, pmod(doc_id)-
    * partitioned (the verification side reads only candidate docs'
    * partitions); `bands` — the exploded (doc, band, value) table,
    * pmod(value)-partitioned (candidate generation reads only the
    * partitions the batch's own band values land in); `pairs` —
    * every verified near-dup pair, ever; batchId commit markers.
    */
  def phashIngest(docStream: DataFrame, statePath: String, checkpoint: String,
                  nBuckets: Int = 16): Unit = {
    val q = docStream
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        phashBatch(b, id, statePath, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One [[phashIngest]] micro-batch, exposed for the replay spec.
    *
    * Candidate generation is df-capped like batch
    * [[graft.operators.Multimodal.phashNearDup]]: a (band, value)
    * bucket whose CUMULATIVE df (stored + this batch) exceeds
    * `maxBandDf` is dropped before pair expansion. Since the corpus
    * is append-only the cumulative df only grows, so batch-time
    * pruning is a conservative SUPERSET of the final capped
    * semantics — a bucket under the cap now may cross it later, and
    * pairs it emitted must then disappear from the resolved answer.
    * [[phashResolve]] closes that window with an exact re-filter
    * against the final bucket dfs, so the drained state equals the
    * batch result bit-for-bit while every batch stays
    * cap²-per-bucket bounded.
    */
  private[graft] def phashBatch(batch0: org.apache.spark.sql.DataFrame,
                                batchId: Long, statePath: String,
                                nBuckets: Int, maxHamming: Int = 3,
                                maxBandDf: Int = 100,
                                decoded: Boolean = false): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_ph_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val batch = batch0.persist()
    try {
      val phsPath = s"$statePath/phs"
      val bandsPath = s"$statePath/bands"
      val pairsPath = s"$statePath/pairs"
      // the decode swap the stub docs promised: the REAL ImageIO+DCT
      // band function drops in here and every downstream state/join/
      // cap/resolve shape runs unchanged
      val newPh = (if (decoded)
          graft.operators.Multimodal.phashBandsDecoded(
            batch.select(col("doc_id"), col("payload")))
        else if (batch.columns.contains("payload"))
          graft.operators.Multimodal.phashBandsFromPayload(batch)
        else graft.operators.Multimodal.phashBands(batch))
        .localCheckpoint(true)
      val newEx = newPh
        .select(col("doc_id"), posexplode(col("phash_bands")).as(Seq("band", "bv")))
        .localCheckpoint(true)
      // the PRUNED stored band partitions this batch's values land in
      val touched = newEx.select(pmod(col("bv"), lit(nBuckets.toLong)).as("bk"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val stored =
        if (hasVisibleData(spark, bandsPath) && touched.nonEmpty)
          spark.read.parquet(bandsPath)
            .filter(col("bucket").isin(touched: _*))
            .select(col("doc_id").as("ex_doc"), col("band").as("eband"),
              col("bv").as("ebv"))
            .localCheckpoint(true)
        else null
      // cumulative bucket df (stored + new) over the batch's buckets;
      // counts only — no posting list is ever materialized
      val newCnt = newEx.groupBy("band", "bv").agg(count(lit(1)).as("n_new"))
      val cumDf =
        if (stored != null)
          newCnt.join(
            stored.groupBy(col("eband").as("band"), col("ebv").as("bv"))
              .agg(count(lit(1)).as("n_old")),
            Seq("band", "bv"), "left")
            .select(col("band"), col("bv"),
              (col("n_new") + coalesce(col("n_old"), lit(0L))).as("df"))
        else newCnt.select(col("band"), col("bv"), col("n_new").as("df"))
      val keptBv = cumDf.filter(col("df") <= maxBandDf).select("band", "bv")
        .localCheckpoint(true)
      val newKept = newEx.join(keptBv, Seq("band", "bv"))
      // candidates: new×new within the batch (under-cap buckets only)…
      val nn = newKept.as("a").join(newKept.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      // …plus new×existing, same pruned buckets
      val ex =
        if (stored != null)
          newKept.join(stored,
              col("band") === col("eband") && col("bv") === col("ebv"))
            .select(least(col("doc_id"), col("ex_doc")).as("doc_a"),
              greatest(col("doc_id"), col("ex_doc")).as("doc_b"))
        else nn.limit(0)
      val cand = nn.unionAll(ex).distinct().localCheckpoint(true)
      // verification lookup: new docs' arrays + PRUNED stored arrays
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
      val docBuckets = candDocs
        .select(pmod(col("doc_id"), lit(nBuckets.toLong)).as("bk"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val lookup =
        (if (hasVisibleData(spark, phsPath) && docBuckets.nonEmpty)
          newPh.unionByName(spark.read.parquet(phsPath)
            .filter(col("bucket").isin(docBuckets: _*))
            .select("doc_id", "phash_bands"))
        else newPh)
      val verified = cand
        .join(lookup.select(col("doc_id").as("doc_a"), col("phash_bands").as("pha")), "doc_a")
        .join(lookup.select(col("doc_id").as("doc_b"), col("phash_bands").as("phb")), "doc_b")
        .withColumn("hamming",
          expr("aggregate(zip_with(pha, phb, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
            .cast("long"))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
      verified.write.mode("append").parquet(pairsPath)
      newPh.withColumn("bucket", pmod(col("doc_id"), lit(nBuckets.toLong)))
        .write.mode("append").partitionBy("bucket").parquet(phsPath)
      newEx.withColumn("bucket", pmod(col("bv"), lit(nBuckets.toLong)))
        .write.mode("append").partitionBy("bucket").parquet(bandsPath)
      graft.operators.Checkpoints.free(cand)
      graft.operators.Checkpoints.free(keptBv)
      if (stored != null) graft.operators.Checkpoints.free(stored)
      graft.operators.Checkpoints.free(newEx)
      graft.operators.Checkpoints.free(newPh)
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally batch.unpersist()
  }

  /** Resolve the maintained phash state into the batch
    * `phashSummary` shape: per doc, the band values + near-dup
    * degree.
    *
    * The degree counts only pairs STILL eligible under the final
    * bucket dfs: a stored pair survives iff it collides in ≥1 band
    * whose (band, value) bucket ends ≤ `maxBandDf` — exactly the
    * batch cap semantics. The eligible-candidate regeneration is
    * itself cap-bounded (≤ cap²/2 per kept bucket), and the stored
    * pairs carry the already-verified hamming, so no band arrays are
    * re-compared.
    */
  def phashResolve(spark: SparkSession, statePath: String,
                   nBands: Int = 4, maxBandDf: Int = 100): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/phs")) {
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("doc_id", "b0", "b1", "b2", "b3", "n_near")
    }
    val ph = spark.read.parquet(s"$statePath/phs").select("doc_id", "phash_bands")
    val deg =
      if (hasVisibleData(spark, s"$statePath/pairs")) {
        val bands = spark.read.parquet(s"$statePath/bands")
          .select("doc_id", "band", "bv")
        val kept = bands.groupBy("band", "bv")
          .agg(count(lit(1)).as("df"))
          .filter(col("df").between(2, maxBandDf))
          .select("band", "bv")
        val keptEx = bands.join(kept, Seq("band", "bv"))
        val eligible = keptEx.as("a").join(keptEx.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val pairs = spark.read.parquet(s"$statePath/pairs").distinct()
          .join(eligible, Seq("doc_a", "doc_b"), "left_semi")
        pairs.select(col("doc_a").as("doc_id"))
          .unionAll(pairs.select(col("doc_b").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
      } else ph.select(col("doc_id")).limit(0).withColumn("n_near", lit(0L))
    ph.join(deg, Seq("doc_id"), "left")
      .select(col("doc_id") +:
        (0 until nBands).map(b => element_at(col("phash_bands"), b + 1).as(s"b$b")) :+
        coalesce(col("n_near"), lit(0L)).as("n_near"): _*)
  }

  /** Streamed per-source quality/dedup budget audit — the ingest face
    * of `Pipeline.qualityDedupAudit`: shard the documents into two
    * doc_id-RANGE micro-batches (range, not parity: arrival order
    * then respects doc_id order, so the earliest batch containing a
    * kept doc of a hash also contains that hash's GLOBAL min kept
    * doc_id — which is why the final counts equal the batch audit
    * and the entry shares its SQL oracle verbatim), maintain the
    * kept-hash store + per-batch count deltas, and resolve by
    * summing. The audit table stays continuously current as corpus
    * shards land instead of being recomputed from scratch.
    */
  def streamedQualityAudit(spark: SparkSession, dir: String,
                           nBuckets: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint(true)
    if (docs.isEmpty) {
      graft.operators.Checkpoints.free(docs)
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "n_docs", "n_keep", "n_unique", "tokens_unique")
    }
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val base = java.nio.file.Files.createTempDirectory("graft-qa-ing-").toString
    val incoming = s"$base/incoming"
    // The audit's oracle parity needs the low-doc_id shard processed
    // FIRST (survivor = min kept doc_id per hash). FileStreamSource
    // orders by modification time with ties broken by path name, and
    // two back-to-back writes can share an mtime — so stamp each
    // shard with an explicit, strictly increasing mtime instead of
    // trusting the filesystem clock.
    val inPath = new org.apache.hadoop.fs.Path(incoming)
    val infs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stampShard(mtime: Long): Unit =
      infs.listStatus(inPath).foreach { s =>
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".") && s.getModificationTime >= mtime)
          infs.setTimes(s.getPath, mtime, -1)
      }
    docs.filter(col("doc_id") <= mid).coalesce(1).write.mode("append").parquet(incoming)
    stampShard(1000000L)
    docs.filter(col("doc_id") > mid).coalesce(1).write.mode("append").parquet(incoming)
    stampShard(2000000L)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    qualityAuditIngest(stream, s"$base/state", s"$base/ckpt", nBuckets)
    qualityAuditResolve(spark, s"$base/state")
  }

  /** Streaming ingest for the per-source quality/dedup audit. State
    * under `statePath`: `kept_hashes` — content hashes that already
    * have a kept (rule-passing) doc, bucket-partitioned so a batch
    * reads ONLY the partitions its own hashes land in; `counts` —
    * append-only per-batch per-source count deltas (a batch writes
    * its deltas, never rewrites totals); `_qa_commits` batchId
    * markers for replay idempotence.
    */
  def qualityAuditIngest(docStream: DataFrame, statePath: String,
                         checkpoint: String, nBuckets: Int = 16): Unit = {
    val q = docStream
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        qualityAuditBatch(b, id, statePath, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def hashBucket(h: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(nBuckets.toLong))

  /** One [[qualityAuditIngest]] micro-batch, exposed for the replay
    * spec. Per batch: stateless gopher verdicts, within-batch
    * survivor election (min KEPT doc per hash), then the
    * new-vs-maintained hash check against the PRUNED kept-hash
    * partitions — per-batch cost is bounded by the batch's own
    * hashes, never a corpus rescan.
    */
  private[graft] def qualityAuditBatch(batch0: org.apache.spark.sql.DataFrame,
                                       batchId: Long, statePath: String,
                                       nBuckets: Int): Unit = {
    val spark = batch0.sparkSession
    import spark.implicits._
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_qa_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val batch = batch0.persist()
    try {
      val hashesPath = s"$statePath/kept_hashes"
      val countsPath = s"$statePath/counts"
      val flags = graft.operators.TextAnalysis.gopherFlags(batch)
        .select(col("doc_id"), col("keep"), col("n_words"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      val marked = batch.select(col("doc_id"), col("source"), col("text"))
        .join(flags, "doc_id")
        .withColumn("h", graft.operators.Dedup.contentHash(col("text")))
        .withColumn("surv",
          col("keep") && col("doc_id") ===
            min(when(col("keep"), col("doc_id"))).over(w))
        .localCheckpoint(true)
      val batchSurv = marked.filter(col("surv"))
        .select(col("source"), col("h"), col("n_words"))
        .withColumn("bucket", hashBucket(col("h"), nBuckets))
        .localCheckpoint(true)
      val touched = batchSurv.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSeq
      // Replay safety (crash window between the state writes and the
      // commit marker): kept_hashes rows carry the batch_id that
      // wrote them, and the seen-set read EXCLUDES the current
      // batch's own rows — so a foreachBatch retry whose first
      // attempt already appended this batch's hashes still recomputes
      // the same uniqueNew instead of a zeroed one.
      val uniqueNew =
        if (hasVisibleData(spark, hashesPath) && touched.nonEmpty) {
          val seen = spark.read.parquet(hashesPath)
            .filter(col("bucket").isin(touched: _*) &&
              col("batch_id") =!= lit(batchId))
            .select(col("h").as("seenH"))
          batchSurv.join(seen, col("h") === col("seenH"), "left_anti")
        } else batchSurv
      val uniqueCp = uniqueNew.localCheckpoint(true)
      // Per-batch count DELTAS: the all-docs aggregate and the
      // unique-survivor aggregate land as zero-padded rows in a
      // PER-BATCH directory written with overwrite semantics — a
      // retry replaces its own delta set rather than appending a
      // second one, so resolve's sum never double-counts (replay
      // safety for the same crash window).
      val baseCounts = marked.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_keep"),
        lit(0L).as("n_unique"), lit(0L).as("tokens_unique"))
      val uniqCounts = uniqueCp.groupBy("source").agg(
        lit(0L).as("n_docs"), lit(0L).as("n_keep"),
        count(lit(1)).as("n_unique"),
        sum(col("n_words")).as("tokens_unique"))
      baseCounts.unionByName(uniqCounts)
        .write.mode("overwrite").parquet(s"$countsPath/batch=$batchId")
      uniqueCp.select(col("h"), col("bucket"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").partitionBy("bucket").parquet(hashesPath)
      graft.operators.Checkpoints.free(uniqueCp)
      graft.operators.Checkpoints.free(batchSurv)
      graft.operators.Checkpoints.free(marked)
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally batch.unpersist()
  }

  /** Resolve the maintained audit: sum the per-batch deltas. */
  def qualityAuditResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/counts")) {
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "n_docs", "n_keep", "n_unique", "tokens_unique")
    }
    spark.read.parquet(s"$statePath/counts")
      .groupBy("source").agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_keep")).as("n_keep"),
        sum(col("n_unique")).as("n_unique"),
        sum(col("tokens_unique")).as("tokens_unique"))
  }

  /** Streaming NEAR-DUP dedup maintenance — the MinHash/LSH face of
    * the always-on ingest story ([[ingestDedup]] catches exact
    * re-arrivals; this catches near-duplicates), completing exact-hash
    * dedup → near-dup dedup → cluster maintenance ([[GraphStreams.ccIngest]]).
    * State under `statePath`, all append-only:
    *
    *  - `buckets`: the maintained (doc_id, band, bucket) LSH table —
    *    [[graft.operators.Dedup.minhashBandBuckets]] rows, partitioned
    *    by pmod(bucket) so a batch reads ONLY the band-bucket
    *    partitions its own docs touch;
    *  - `sets`: per-doc shingle-hash sets (the exact-verification
    *    side), partitioned by pmod(doc_id) for the same pruned read;
    *  - `pairs`: every verified (doc_a, doc_b, jaccard) edge, ever —
    *    bit-identical to what batch `minhashLsh` emits for the pair;
    *  - `labels`/`merges`: the [[ccMergeBatch]] incremental-CC state,
    *    fed the verified edges — component labels stay continuously
    *    current without rewriting anything.
    *
    * Per batch: band the NEW docs with the identical hash family the
    * batch operator uses, generate candidates from band-bucket
    * equality only — new×new within the batch plus new×existing
    * against the pruned bucket partitions — verify exact Jaccard
    * (new docs' sets computed in-batch, existing docs' sets read
    * pruned), append the verified edges to `pairs` AND into the CC
    * maintenance, then append the new docs' bucket/set rows. A pair
    * can only form in the batch its LATER doc arrives in, so nothing
    * is ever found twice; docs already in `sets` are skipped (the
    * exact-dedup contract upstream), so replays of content are
    * no-ops and batchId commit markers make replays of whole batches
    * no-ops ([[IngestStreams.scd2MergeBatch]]'s pattern).
    *
    * The final `pairs` table over any arrival order equals batch
    * [[graft.operators.Dedup.minhashLsh]] over the union — every
    * colliding pair is generated in its later doc's batch, and
    * xxhash64 signatures/band keys/shingle sets have no RNG — the
    * spec pins the two-batch run bit-for-bit.
    */
  def nearDedupIngest(docStream: DataFrame, statePath: String, checkpoint: String,
                      n: Int = 3, k: Int = 32, bands: Int = 8,
                      minJaccard: Double = 0.5, nBuckets: Int = 16): Unit = {
    val q = docStream
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        nearDedupBatch(b, id, statePath, n, k, bands, minJaccard, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One [[nearDedupIngest]] micro-batch, exposed for the replay spec. */
  private[graft] def nearDedupBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String,
                                    n: Int, k: Int, bands: Int,
                                    minJaccard: Double, nBuckets: Int): Unit = {
    import graft.operators.Dedup
    val spark = batch0.sparkSession
    val bucketsPath = s"$statePath/buckets"
    val setsPath = s"$statePath/sets"
    val pairsPath = s"$statePath/pairs"
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_nd_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return // replayed batch: already applied
    def mark(): Unit = { cfs.mkdirs(commitDir); cfs.create(marker, true).close() }
    val arrived = batch0.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    // docs already maintained are no-ops (re-deliveries, exact dups)
    val docs = (
      if (hasVisibleData(spark, setsPath)) {
        val aBuckets = arrived
          .select(pmod(col("doc_id"), lit(nBuckets.toLong)).as("sb"))
          .distinct().collect().map(_.getLong(0)).toSeq
        arrived.join(
          spark.read.parquet(setsPath).filter(col("sb").isin(aBuckets: _*))
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      } else arrived
    ).persist()
    try {
      if (docs.isEmpty) { mark(); return }
      val bb = Dedup.minhashBandBuckets(docs, n, k, bands).localCheckpoint(true)
      val sets = Dedup.shingleHashSets(docs, n).localCheckpoint(true)
      // candidates: new x new inside the batch...
      val within = bb.as("a")
        .join(bb.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      // ...plus new x existing against ONLY the touched partitions
      val cross =
        if (hasVisibleData(spark, bucketsPath)) {
          val pbs = bb.select(pmod(col("bucket"), lit(nBuckets.toLong)).as("pb"))
            .distinct().collect().map(_.getLong(0)).toSeq
          val existing = spark.read.parquet(bucketsPath)
            .filter(col("pb").isin(pbs: _*))
          existing.as("o").join(bb.as("nw"),
              col("o.band") === col("nw.band") && col("o.bucket") === col("nw.bucket"))
            .select(least(col("o.doc_id"), col("nw.doc_id")).as("doc_a"),
              greatest(col("o.doc_id"), col("nw.doc_id")).as("doc_b"))
        } else within.limit(0)
      val candidates = within.unionByName(cross).distinct()
      // verification sets: new docs in-batch, existing docs pruned
      val needOld = candidates
        .select(col("doc_a").as("doc_id")).unionByName(candidates.select(col("doc_b").as("doc_id")))
        .distinct()
        .join(sets.select("doc_id"), Seq("doc_id"), "left_anti")
      val oldSets =
        if (hasVisibleData(spark, setsPath)) {
          val sbs = needOld.select(pmod(col("doc_id"), lit(nBuckets.toLong)).as("sb"))
            .distinct().collect().map(_.getLong(0)).toSeq
          spark.read.parquet(setsPath).filter(col("sb").isin(sbs: _*))
            .join(needOld, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("sh_set"))
        } else sets.limit(0)
      val verified = Dedup.verifyJaccardSets(sets.unionByName(oldSets), candidates, minJaccard)
        .localCheckpoint(true)
      if (!verified.isEmpty) {
        verified.write.mode("append").parquet(pairsPath)
        GraphStreams.ccMergeBatch(verified.select(col("doc_a"), col("doc_b")), batchId,
          s"$statePath/labels", s"$statePath/merges", nBuckets)
      }
      bb.withColumn("pb", pmod(col("bucket"), lit(nBuckets.toLong)))
        .write.mode("append").partitionBy("pb").parquet(bucketsPath)
      sets.withColumn("sb", pmod(col("doc_id"), lit(nBuckets.toLong)))
        .write.mode("append").partitionBy("sb").parquet(setsPath)
      graft.operators.Checkpoints.free(bb)
      graft.operators.Checkpoints.free(sets)
      graft.operators.Checkpoints.free(verified)
      mark()
    } finally { docs.unpersist(); () }
  }

  /** All verified near-dup pairs maintained so far. */
  def nearDedupPairs(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/pairs")) {
      return Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "jaccard")
    }
    spark.read.parquet(s"$statePath/pairs")
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** End-to-end streamed near-dup dedup over the documents table (the
    * `stream_near_dedup` entry): the corpus arrives as TWO shard
    * files → two micro-batches; the maintained pair table must equal
    * batch `dedup_minhash` over the whole corpus (rows-only at the
    * driver like dedup_minhash — seeded xxhash64 has no DuckDB twin —
    * with the batch-parity spec as the oracle).
    */
  def streamedNearDedup(spark: SparkSession, dir: String,
                        nBuckets: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-nd-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    nearDedupIngest(stream, s"$base/state", s"$base/ckpt", nBuckets = nBuckets)
    nearDedupPairs(spark, s"$base/state")
  }

  /** Streaming span-level substring dedup — the always-on ingest face
    * of [[graft.operators.Dedup.duplicatedSpans]], completing the
    * ingest family (exact-hash 37b → near-dup 37m → THIS): an
    * arriving document's L-token window is duplicated iff its
    * occurrence count across corpus-so-far PLUS this batch is ≥ 2, so
    * boilerplate is quarantined AT INGEST, before it enters training
    * data. Append-only semantics: the FIRST copy is never
    * retro-flagged (its batch already shipped — the deployment-honest
    * contract); two copies arriving in the SAME batch both flag,
    * which is what makes a single-batch run equal the batch operator
    * exactly (spec-pinned).
    *
    * Everything here is exact string/integer logic — no seeded
    * hashing, no floats — so unlike the MinHash face this streaming
    * operator is FULLY SQL-ORACLED: the even/odd two-batch ingest
    * reproduces in DuckDB as two chained window-count CTEs, span for
    * span.
    *
    * Scale design: per batch, the window-count state table is read
    * ONLY at the partitions the batch's own windows hash into
    * (pmod(xxhash64(shingle))-partitioned appends, merge-on-read sum
    * — the 37l label-read shape), and appends are per-batch deltas:
    * no rewrite, no full-table read, per-batch cost bounded by the
    * batch's own window count. Re-delivered docs are no-ops via the
    * pruned seen-docs table; batchId commit markers make full
    * replays idempotent.
    */
  private[graft] def spanDedupBatch(batch0: DataFrame, batchId: Long,
                                    statePath: String, spanTokens: Int,
                                    nBuckets: Int): Unit = {
    import graft.operators.Dedup
    val spark = batch0.sparkSession
    val winPath = s"$statePath/windows"
    val docsPath = s"$statePath/docs"
    val spansPath = s"$statePath/spans"
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_sp_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return // replayed batch: already applied
    def mark(): Unit = { cfs.mkdirs(commitDir); cfs.create(marker, true).close() }
    val arrived = batch0.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .dropDuplicates("doc_id")
    val docs = (
      if (hasVisibleData(spark, docsPath)) {
        val sbs = arrived.select(pmod(col("doc_id"), lit(nBuckets.toLong)).as("sb"))
          .distinct().collect().map(_.getLong(0)).toSeq
        arrived.join(
          spark.read.parquet(docsPath).filter(col("sb").isin(sbs: _*))
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      } else arrived
    ).persist()
    try {
      if (docs.isEmpty) { mark(); return }
      val ps = Dedup.positionedShingles(docs, spanTokens).localCheckpoint(true)
      val inBatch = ps.groupBy("shingle").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      // maintained counts for ONLY the partitions this batch touches;
      // appends are deltas, so the stored count is a merge-on-read sum
      val oldCnt =
        if (hasVisibleData(spark, winPath)) {
          val wbs = inBatch
            .select(pmod(xxhash64(col("shingle")), lit(nBuckets.toLong)).as("wb"))
            .distinct().collect().map(_.getLong(0)).toSeq
          spark.read.parquet(winPath).filter(col("wb").isin(wbs: _*))
            .groupBy("shingle").agg(sum(col("cnt")).as("oldc"))
        } else inBatch.select(col("shingle"), col("c").as("oldc")).limit(0)
      val dup = inBatch.join(oldCnt, Seq("shingle"), "left")
        .filter(col("c") + coalesce(col("oldc"), lit(0L)) >= 2)
        .select("shingle")
      val dupPos = ps.join(dup, Seq("shingle"), "left_semi").select("doc_id", "pos")
      val spans = Dedup.spansFromDupPositions(dupPos, spanTokens)
        .localCheckpoint(true)
      if (!spans.isEmpty) spans.write.mode("append").parquet(spansPath)
      inBatch
        .withColumn("wb", pmod(xxhash64(col("shingle")), lit(nBuckets.toLong)))
        .select(col("shingle"), col("c").as("cnt"), col("wb"))
        .write.mode("append").partitionBy("wb").parquet(winPath)
      docs.select(col("doc_id"))
        .withColumn("sb", pmod(col("doc_id"), lit(nBuckets.toLong)))
        .write.mode("append").partitionBy("sb").parquet(docsPath)
      graft.operators.Checkpoints.free(ps)
      graft.operators.Checkpoints.free(inBatch)
      graft.operators.Checkpoints.free(spans)
      mark()
    } finally { docs.unpersist(); () }
  }

  def spanDedupIngest(docStream: DataFrame, statePath: String, checkpoint: String,
                      spanTokens: Int = 8, nBuckets: Int = 16): Unit = {
    val q = docStream
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        spanDedupBatch(b, id, statePath, spanTokens, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Compact the span-ingest window-count table: per-batch DELTAS
    * merge into one row per (partition, shingle) — the [[GraphStreams.ccCompact]]
    * maintenance pass for this state. The merge-on-read sum is
    * invariant under compaction, so subsequent batches are unaffected
    * (spec-pinned); run on the operator's schedule, never the ingest
    * path's. At 10⁹ maintained windows this is what keeps the pruned
    * per-batch reads proportional to distinct windows rather than to
    * ingest history.
    */
  def spanStateCompact(spark: SparkSession, statePath: String): Unit = {
    val winPath = s"$statePath/windows"
    if (!hasVisibleData(spark, winPath)) return
    val merged = spark.read.parquet(winPath)
      .groupBy("wb", "shingle").agg(sum(col("cnt")).as("cnt"))
      .select(col("shingle"), col("cnt"), col("wb"))
      // materialize BEFORE touching the files the plan reads
      .localCheckpoint(true)
    // cluster by bucket so each partition directory collapses to one
    // file — without this the rewrite keeps one file per shuffle
    // partition per bucket and the file count (what bounds per-batch
    // pruned-read listing cost) never actually shrinks (measured in
    // SpansRehearsal: 1024 delta files -> 16 after compaction)
    merged.repartition(col("wb"))
      .write.mode("overwrite").partitionBy("wb").parquet(winPath)
    graft.operators.Checkpoints.free(merged)
  }

  /** One streamed suffix-profile micro-batch (the
    * `stream_suffix_profile` state machine): the always-on face of
    * [[graft.operators.Suffix.dupMassProfile]]. The batch operator's
    * one corpus scan is the BOOTSTRAP — exploding documents into
    * exact Lmin-char windows — and that is precisely the part a
    * maintained face can pay incrementally: each arriving shard
    * writes its own (position-code, window) rows as a
    * bucket-partitioned overwrite delta (bkt = pmod(xxhash64(win)),
    * so equal windows always share a bucket), plus a (doc_id, len)
    * row per doc so resolve derives n_windows per probed length and
    * the position-code budget without ever touching text again.
    * Resolve then starts the doubling rounds from the maintained
    * window store ([[graft.operators.Suffix.profileFromWindows]] —
    * the SAME exact-integer core the batch operator runs, so the
    * drained profile hash-checks against `dedup_suffix_profile`'s
    * oracle verbatim).
    *
    * Window deltas are NOT content-local at window granularity (a
    * window's duplicates may span every batch ever ingested), which
    * is why this face maintains the bootstrap table rather than
    * per-batch profile deltas — the span-store treatment, not the
    * pure-delta one (SURVEY §2.7 note). Store cost is ~(Lmin+16)
    * bytes per corpus character — the batch operator materializes
    * the same table transiently per run; always-on span-cut cadence
    * amortizes it across runs and [[suffixCompact]] keeps the dir
    * count flat.
    *
    * Contract: corpus shards append-only and DISJOINT across batches
    * (the house ingest contract); within a batch doc_id duplicates
    * are dropped. Overwrite + commit marker make crash-window replay
    * a no-op. */
  private[graft] def suffixBatch(batch0: DataFrame, batchId: Long,
                                 statePath: String, minLen: Int = 8,
                                 nBuckets: Int = 32): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_sfx_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val docs = batch0.dropDuplicates("doc_id")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    try {
      docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$statePath/doc_lens/batch=$batchId")
      graft.operators.Checkpoints.cpuSplit(
          docs.filter(length(col("text")) >= minLen))
        .select(col("doc_id"),
          posexplode(expr(s"transform(sequence(0, char_length(text) - $minLen), " +
            s"i -> substr(text, i + 1, $minLen))")).as(Seq("pos", "win")))
        .select((col("doc_id") * lit(1L << 32) + col("pos").cast("long")).as("code"),
          col("win"))
        .withColumn("bkt", pmod(xxhash64(col("win")), lit(nBuckets.toLong)).cast("int"))
        .repartition(col("bkt"))
        .write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$statePath/windows/batch=$batchId")
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { graft.operators.Checkpoints.free(docs); () }
  }

  /** Fold committed window deltas into the consolidated base — the
    * [[StreamState.lsmFold]] contiguous-marker-run fold the bm25
    * store pins (crash-window batches never fold; a gapped late
    * marker is never hidden). doc_lens deltas stay unfolded (one
    * tiny file per batch — never the heavy state). */
  def suffixCompact(spark: SparkSession, statePath: String): Unit =
    StreamState.lsmFold(spark, s"$statePath/windows",
      s"$statePath/windows_base", s"$statePath/_sfx_commits",
      Seq("code", "win", "bkt"), "bkt")

  /** Profile the maintained window store: n_windows/position budget
    * from the doc_lens deltas, then the batch operator's doubling
    * core over base ∪ unfolded window deltas — NO corpus re-scan.
    * The store is bootstrapped at `minLen`; resolving a smaller
    * minimum than was ingested would need windows that were never
    * stored, hence the require. */
  def suffixProfileResolve(spark: SparkSession, statePath: String,
                           lengths: Seq[Int] = Seq(8, 16, 32, 64, 128, 256),
                           minLen: Int = 8): DataFrame = {
    import spark.implicits._
    val probed = graft.operators.Suffix.probedLengths(lengths)
    require(probed.min == minLen,
      s"store is bootstrapped at $minLen-char windows; cannot profile ${probed.min}")
    val docLens =
      if (StreamState.hasDataFiles(spark, s"$statePath/doc_lens"))
        spark.read.parquet(s"$statePath/doc_lens").select(col("doc_id"), col("len"))
      else Seq.empty[(Long, Long)].toDF("doc_id", "len")
    val (nWindows, _) = graft.operators.Suffix.windowBudget(docLens, probed)
    val windows = StreamState.lsmRead(spark, s"$statePath/windows",
        s"$statePath/windows_base", Seq("code", "win")) match {
      case Some(w) => w.select(
          shiftright(col("code"), 32).as("doc_id"),
          col("code").bitwiseAND(lit(0xFFFFFFFFL)).as("pos"),
          col("win"))
      case None => Seq.empty[(Long, Long, String)].toDF("doc_id", "pos", "win")
    }
    graft.operators.Suffix.profileFromWindows(spark, windows, nWindows, probed)
  }

  /** Streamed suffix profile (the `stream_suffix_profile` entry):
    * even/odd two-batch ingest of the documents table, the LSM fold,
    * then the resolve — the deployed cadence (ingest → compact →
    * query, the IndexRehearsal finding). Shares
    * `dedup_suffix_profile`'s oracle verbatim. */
  def streamedSuffixProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-sfx-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val state = s"$base/state"
    val q = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1").parquet(incoming)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        suffixBatch(b, id, state)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    suffixCompact(spark, state)
    suffixProfileResolve(spark, state)
  }

  /** RETRO-FLAG AUDIT — the honest cost of append-only span ingest:
    * which already-shipped documents contain windows that BECAME
    * duplicated after they shipped (their copies arrived in later
    * batches), and how many. This is the number that decides
    * re-cleaning cadence: a corpus whose retro count grows fast needs
    * periodic batch re-runs of [[graft.operators.Dedup.duplicatedSpans]]
    * over shipped data; one whose count stays near zero does not.
    *
    * An offline maintenance pass, not an ingest-path cost: one corpus
    * re-window scan joined against the maintained window counts
    * (merge-on-read sums, full read — this is the audit's one big
    * input), minus the positions already covered by a flagged span —
    * a LEFT ANTI hash join on doc_id with the range containment as
    * its residual condition, never a nested loop. Output:
    * (doc_id, n_retro_windows) for affected docs only. By
    * construction only docs whose copies arrived strictly later can
    * appear: a doc arriving WITH or AFTER its twin was flagged at
    * ingest (spec pins that the odd/second batch contributes zero).
    */
  def spanRetroAudit(spark: SparkSession, documents: DataFrame,
                     statePath: String, spanTokens: Int = 8): DataFrame = {
    import graft.operators.Dedup
    import spark.implicits._
    val winPath = s"$statePath/windows"
    if (!hasVisibleData(spark, winPath)) {
      return Seq.empty[(Long, Long)].toDF("doc_id", "n_retro_windows")
    }
    val ps = Dedup.positionedShingles(
      documents.select(col("doc_id").cast("long").as("doc_id"), col("text")), spanTokens)
    val dup = spark.read.parquet(winPath)
      .groupBy("shingle").agg(sum(col("cnt")).as("n"))
      .filter(col("n") >= 2).select("shingle")
    val dupPos = ps.join(dup, Seq("shingle"), "left_semi").select("doc_id", "pos")
    val covered = spanDedupSpans(spark, statePath)
      .select(col("doc_id").as("c_doc"), col("span_start"), col("span_end"))
    val retro = dupPos.join(covered,
      dupPos("doc_id") === covered("c_doc") &&
        dupPos("pos") >= covered("span_start") &&
        (dupPos("pos") + (spanTokens - 1)) <= covered("span_end"),
      "left_anti")
    retro.groupBy("doc_id").agg(count(lit(1)).as("n_retro_windows"))
  }

  /** The audit over the even/odd harness state — only even (first-
    * batch) docs can appear: odd-batch windows were checked against
    * the full counts at ingest.
    */
  def streamedSpanRetroAudit(spark: SparkSession, dir: String,
                             spanTokens: Int = 8, nBuckets: Int = 16): DataFrame = {
    val st = runSpanIngestHarness(spark, dir, spanTokens, nBuckets)
    spanRetroAudit(spark,
      graft.Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      st, spanTokens)
  }

  /** All spans flagged so far. */
  def spanDedupSpans(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!hasVisibleData(spark, s"$statePath/spans")) {
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("doc_id", "span_start", "span_end", "span_tokens")
    }
    spark.read.parquet(s"$statePath/spans")
      .select(col("doc_id"), col("span_start"), col("span_end"), col("span_tokens"))
      .dropDuplicates("doc_id", "span_start")
  }

  /** The driver entry: even docs arrive in batch 1, odd in batch 2
    * (maxFilesPerTrigger=1) — the oracle reproduces the two chained
    * window-count rounds in SQL, hash-exact.
    */
  def streamedSpanDedup(spark: SparkSession, dir: String,
                        spanTokens: Int = 8, nBuckets: Int = 16): DataFrame =
    spanDedupSpans(spark, runSpanIngestHarness(spark, dir, spanTokens, nBuckets))

  /** Drive the even/odd two-batch span ingest over the documents
    * table; returns the state path for the result readers. ONE
    * maintained window store serves both `stream_spans` and
    * `stream_span_retro` (the retro audit is explicitly an offline
    * read of the SAME store), so the ingest runs once per
    * (dir, spanTokens, nBuckets) per JVM — the 37r'' / sim_ann_opq
    * memoization pattern. */
  private val spanStates =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  private def runSpanIngestHarness(spark: SparkSession, dir: String,
                                   spanTokens: Int, nBuckets: Int): String =
    spanStates.getOrElseUpdate((dir, spanTokens, nBuckets),
      runSpanIngestHarnessOnce(spark, dir, spanTokens, nBuckets))

  private def runSpanIngestHarnessOnce(spark: SparkSession, dir: String,
                                       spanTokens: Int, nBuckets: Int): String = {
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-sp-ing-").toString
    val incoming = s"$base/incoming"
    // Batch ORDER matters here (the first copy is never retro-flagged),
    // and FileStreamSource orders by modification time — force distinct
    // mtimes so even-batch-first holds even when both writes land in
    // the same filesystem timestamp granule.
    def stampParquet(ts: Long): Unit = new java.io.File(incoming).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > ts)
      .foreach { f => f.setLastModified(ts); () }
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    stampParquet(1000000L)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    stampParquet(2000000L)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    spanDedupIngest(stream, s"$base/state", s"$base/ckpt", spanTokens, nBuckets)
    s"$base/state"
  }

  // ------------------------------------------------------------------
  // Streamed caption↔media pair audit (37u): the always-on face of
  // Multimodal.pairAudit. The streaming-only wrinkle is ARRIVAL
  // ORDER: a caption's media item may land in a LATER batch, so a
  // pair is either resolved the batch its second side arrives
  // (retro-resolution — the stream_span_retro precedent) or stays
  // pending; resolve-time pendings whose media never arrived are the
  // orphans, which is exactly the batch operator's left-join-null
  // verdict. After the drain every pair carries the same verdict as
  // the batch audit, so the entry shares mm_pair_audit's oracle
  // VERBATIM.
  // ------------------------------------------------------------------

  /** One [[streamedPairAudit]] micro-batch. State under `statePath`,
    * all PER-BATCH OVERWRITE delta dirs (retries replace, never
    * re-append): `ph` — per-doc band fingerprints, pmod(doc_id)-
    * bucketed (media lookups read only the buckets the batch's
    * pair references land in); `pending` — pairs whose media was
    * unseen at caption time, pmod(media_id)-bucketed (retro-
    * resolution reads only the arriving docs' buckets); `verdicts` —
    * resolved (caption_id, source, v) rows. Commit markers. */
  private[graft] def pairAuditBatch(batch0: org.apache.spark.sql.DataFrame,
                                    batchId: Long, statePath: String,
                                    nBuckets: Int = 16,
                                    maxHamming: Int = 3): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_pa_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val batch = batch0.select(col("doc_id"), col("text"), col("source"))
      .dropDuplicates("doc_id").persist()
    try {
      val phPath = s"$statePath/ph"
      val pendingPath = s"$statePath/pending"
      val verdictsPath = s"$statePath/verdicts"
      val hammingExpr = expr(
        "aggregate(zip_with(cap_ph, med_ph, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
        .cast("long")
      def verdictCol = when(col("hamming") <= maxHamming, lit("match"))
        .otherwise(lit("conflict"))
      val newPh = graft.operators.Multimodal.phashBands(batch)
        .localCheckpoint(true)
      // the batch's own pairs, caption side always resolvable locally
      val pairs = graft.operators.Multimodal.pairFixture(batch)
        .join(batch.select(col("doc_id").as("caption_id"), col("source")),
          Seq("caption_id"))
        .join(newPh.select(col("doc_id").as("caption_id"),
          col("phash_bands").as("cap_ph")), Seq("caption_id"))
        .localCheckpoint(true)
      // media lookup: this batch's fingerprints + PRUNED stored buckets
      val mediaBuckets = pairs
        .select(pmod(col("media_id"), lit(nBuckets.toLong)).as("bk"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val mediaPh =
        (if (StreamState.hasDataFiles(spark, phPath) && mediaBuckets.nonEmpty)
          newPh.unionByName(spark.read.parquet(phPath)
            .filter(col("bucket").isin(mediaBuckets: _*))
            .select("doc_id", "phash_bands"))
        else newPh)
          .select(col("doc_id").as("media_id"), col("phash_bands").as("med_ph"))
      val looked = pairs.join(mediaPh, Seq("media_id"), "left")
        .localCheckpoint(true)
      val resolvedNow = looked.filter(col("med_ph").isNotNull)
        .withColumn("hamming", hammingExpr)
        .select(col("caption_id"), col("source"), verdictCol.as("v"))
      // retro-resolution: pending pairs whose media just arrived
      val docBuckets = batch
        .select(pmod(col("doc_id"), lit(nBuckets.toLong)).as("bk"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val retro =
        if (StreamState.hasDataFiles(spark, pendingPath) && docBuckets.nonEmpty) {
          spark.read.parquet(pendingPath)
            .filter(col("mb").isin(docBuckets: _*))
            .select(col("caption_id"), col("media_id"), col("source"),
              col("cap_ph"))
            .join(newPh.select(col("doc_id").as("media_id"),
              col("phash_bands").as("med_ph")), Seq("media_id"))
            .withColumn("hamming", hammingExpr)
            .select(col("caption_id"), col("source"), verdictCol.as("v"))
        } else resolvedNow.limit(0)
      resolvedNow.unionByName(retro)
        .write.mode("overwrite").parquet(s"$verdictsPath/batch=$batchId")
      looked.filter(col("med_ph").isNull)
        .select(col("caption_id"), col("media_id"), col("source"), col("cap_ph"),
          pmod(col("media_id"), lit(nBuckets.toLong)).as("mb"))
        .write.mode("overwrite").partitionBy("mb")
        .parquet(s"$pendingPath/batch=$batchId")
      newPh.withColumn("bucket", pmod(col("doc_id"), lit(nBuckets.toLong)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$phPath/batch=$batchId")
      graft.operators.Checkpoints.free(looked)
      graft.operators.Checkpoints.free(pairs)
      graft.operators.Checkpoints.free(newPh)
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { batch.unpersist(); () }
  }

  /** Resolve the maintained pair-audit state into the batch
    * [[graft.operators.Multimodal.pairAudit]] shape: per source,
    * (n_pairs, n_match, n_conflict, n_orphan). A pending pair with a
    * verdict row resolved retroactively; a pending pair without one
    * is an orphan — its media never arrived, the batch operator's
    * left-join-null case.
    *
    * Verdict dedup is DETERMINISTIC by arrival order: resolved
    * pendings are not pruned from the pending store, so a media
    * doc_id re-arriving in a later batch retro-resolves the same
    * pending again — and if the re-arrival carries different bytes
    * the two verdict rows disagree. The earliest batch's verdict
    * wins (min over the `batch=` delta-dir partition column), the
    * same first-arrival semantics the fingerprint store's pruned
    * lookups give captions. A plain dropDuplicates here would pick
    * whichever row a shuffle surfaced first. */
  def pairAuditResolve(spark: SparkSession, statePath: String): DataFrame = {
    import spark.implicits._
    if (!StreamState.hasDataFiles(spark, s"$statePath/verdicts") &&
        !StreamState.hasDataFiles(spark, s"$statePath/pending")) {
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "n_pairs", "n_match", "n_conflict", "n_orphan")
    }
    val verdicts =
      if (StreamState.hasDataFiles(spark, s"$statePath/verdicts"))
        spark.read.parquet(s"$statePath/verdicts")
          .groupBy("caption_id")
          .agg(min(struct(col("batch").cast("long").as("b"),
            col("source"), col("v"))).as("w"))
          .select(col("caption_id"), col("w.source").as("source"),
            col("w.v").as("v"))
      else Seq.empty[(Long, String, String)].toDF("caption_id", "source", "v")
    val orphans =
      if (StreamState.hasDataFiles(spark, s"$statePath/pending"))
        spark.read.parquet(s"$statePath/pending")
          .select(col("caption_id"), col("source"))
          .dropDuplicates("caption_id")
          .join(verdicts.select("caption_id"), Seq("caption_id"), "left_anti")
          .select(col("caption_id"), col("source"), lit("orphan").as("v"))
      else verdicts.limit(0)
    verdicts.unionByName(orphans).groupBy("source").agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("v") === "match", 1L).otherwise(0L)).as("n_match"),
      sum(when(col("v") === "conflict", 1L).otherwise(0L)).as("n_conflict"),
      sum(when(col("v") === "orphan", 1L).otherwise(0L)).as("n_orphan"))
  }

  /** End-to-end streamed pair audit over the documents table (the
    * `stream_pair_audit` entry): two shards → two micro-batches, so
    * both arrival orders occur in the fixture (even-id media precede
    * their odd-id captions AND vice versa — retro-resolution runs on
    * real data, not just in the spec). Shares `mm_pair_audit`'s
    * oracle verbatim. */
  def streamedPairAudit(spark: SparkSession, dir: String,
                        nBuckets: Int = 16): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-pa-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(docs)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        pairAuditBatch(b, id, state, nBuckets)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    pairAuditResolve(spark, state)
  }

  // ------------------------------------------------------------------
  // Streamed interval-union coverage (the `stream_interval_coverage`
  // entry): per-key ISLAND state, merged on arrival — an arriving
  // interval extends an island, bridges two existing islands into
  // one, or opens a new one, all of which fall out of re-running the
  // weighted sweep over (stored islands ∪ batch intervals) for the
  // touched buckets only. The store holds MERGED islands (bounded by
  // islands, not raw intervals: a key with 10^6 arrivals and 3
  // activity windows stores 3 rows), each carrying its interval
  // count as a weight, so n_intervals stays exact across re-sweeps.
  // ------------------------------------------------------------------

  private def ivBucketDir(statePath: String, bk: Long) = s"$statePath/islands_b$bk"

  /** One streamed-coverage micro-batch, exposed for the replay spec.
    *
    * State: per-bucket parquet dirs `islands_b<k%nBuckets>` of
    * (k, i_s, i_e, n, last_b) — plain sibling dirs, not partitionBy
    * discovery, so each bucket swaps independently via rename-aside.
    * Idempotence is PER BUCKET: every rewritten row carries the
    * rewriting batch id (`last_b`), so a crash-window retry skips
    * buckets already current through this batch and merges only the
    * rest — re-merging would double the weights. Only touched
    * buckets are ever read or rewritten: per-batch cost is
    * O(islands in touched buckets + batch), however many intervals
    * ever streamed past.
    */
  private[graft] def intervalBatch(batch0: org.apache.spark.sql.DataFrame,
                                   batchId: Long, statePath: String,
                                   nBuckets: Int = 16): Unit = {
    val spark = batch0.sparkSession
    val commitDir = new org.apache.hadoop.fs.Path(statePath, "_iv_commits")
    val marker = new org.apache.hadoop.fs.Path(commitDir, batchId.toString)
    val cfs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cfs.exists(marker)) return
    val batch = batch0.select(col("k"), col("s"), col("e"))
      .withColumn("bk", pmod(col("k"), lit(nBuckets.toLong)))
      .persist()
    try {
      val touched = batch.select(col("bk")).distinct()
        .collect().map(_.getLong(0)).toSeq
      touched.foreach(bk => healSwap(spark, ivBucketDir(statePath, bk)))
      // ONE read over all touched bucket dirs serves both the retry
      // check and the merge input — the job count per batch is
      // constant however many buckets the deployment shards into
      // (a per-bucket read/write loop would be a sequential-job wall
      // at production bucket counts)
      val existingDirs = touched.map(ivBucketDir(statePath, _))
        .filter(hasVisibleData(spark, _))
      val stored0 =
        if (existingDirs.nonEmpty)
          spark.read.parquet(existingDirs: _*)
            .withColumn("bk", pmod(col("k"), lit(nBuckets.toLong)))
            .persist()
        else null
      // crash-window retry: skip buckets already merged by this batch
      val done: Set[Long] =
        if (stored0 != null)
          stored0.groupBy("bk").agg(max(col("last_b")).as("mb"))
            .filter(col("mb") >= batchId)
            .collect().map(_.getLong(0)).toSet
        else Set.empty
      val todo = touched.filterNot(done)
      if (todo.nonEmpty) {
        val stored =
          if (stored0 != null)
            stored0.filter(col("bk").isin(todo: _*))
              .select(col("k"), col("i_s").as("s"), col("i_e").as("e"),
                col("n").as("wt"))
          else batch.limit(0).select(col("k"), col("s"), col("e"),
            lit(0L).as("wt"))
        val fresh = batch.filter(col("bk").isin(todo: _*))
          .select(col("k"), col("s"), col("e"), lit(1L).as("wt"))
        val merged = graft.operators.Relational
          .sweepIslands(stored.unionByName(fresh))
          .withColumn("last_b", lit(batchId))
          .withColumn("bk", pmod(col("k"), lit(nBuckets.toLong)))
        // one partitioned staging write, then per-bucket RENAMES
        // (metadata ops) into swap position — never a job per bucket
        val staging = s"$statePath/_iv_staging"
        val sp = new org.apache.hadoop.fs.Path(staging)
        val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        merged.write.mode("overwrite").partitionBy("bk").parquet(staging)
        todo.foreach { bk =>
          val live = ivBucketDir(statePath, bk)
          val aside = new org.apache.hadoop.fs.Path(live + "_swap_staging")
          fs.delete(aside, true)
          require(fs.rename(new org.apache.hadoop.fs.Path(s"$staging/bk=$bk"), aside),
            s"interval coverage: staged bucket $bk missing")
          swapInstall(spark, live)
        }
        fs.delete(sp, true)
      }
      if (stored0 != null) stored0.unpersist()
      cfs.mkdirs(commitDir)
      cfs.create(marker, true).close()
    } finally { batch.unpersist(); () }
  }

  /** Resolve the maintained island store to the
    * [[graft.operators.Relational.intervalCoverage]] summary shape —
    * a single grouped aggregate: the maintenance already merged every
    * island on arrival. */
  def intervalCoverageResolve(spark: SparkSession, statePath: String,
                              nBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val dirs = (0L until nBuckets.toLong).map { bk =>
      healSwap(spark, ivBucketDir(statePath, bk))
      ivBucketDir(statePath, bk)
    }.filter(hasVisibleData(spark, _))
    if (dirs.isEmpty) {
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("part_id", "n_intervals", "n_islands", "covered_days",
          "span_days", "utilization_ppm")
    }
    graft.operators.Relational.coverageSummary(
      spark.read.parquet(dirs: _*).select("k", "i_s", "i_e", "n"))
  }

  /** End-to-end streamed coverage over the lineitem interval fixture
    * (the `stream_interval_coverage` entry): two u-parity shards →
    * two micro-batches; after the drain the maintained islands equal
    * the batch sweep's (interval union is associative), so the entry
    * shares `q_interval_coverage`'s oracle verbatim. */
  def streamedIntervalCoverage(spark: SparkSession, dir: String,
                               nBuckets: Int = 16): DataFrame = {
    val iv = graft.operators.Relational
      .intervalFixture(graft.Tables.lineitem(spark, dir))
      .localCheckpoint(true)
    val base = java.nio.file.Files.createTempDirectory("graft-iv-ing-").toString
    val incoming = s"$base/incoming"
    iv.filter(col("k") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    iv.filter(col("k") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    graft.operators.Checkpoints.free(iv)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("k", LongType),
        StructField("s", LongType), StructField("e", LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    val state = s"$base/state"
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        intervalBatch(b, id, state, nBuckets)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    intervalCoverageResolve(spark, state, nBuckets)
  }
}
