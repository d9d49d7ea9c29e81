package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming WINDOWED-STATE operators over the events
  * table (SURVEY §2.7; the r11 module split's third face — graph
  * maintenance lives in [[GraphStreams]], ingest-dedup/table
  * maintenance in [[IngestStreams]]).
  *
  * The batch twins live in [[graft.operators.Relational]]
  * (`eventsWindow`, `sessionize`); these streaming versions must agree
  * with them on a finite source — that parity is the correctness
  * gate (oracle SQL for the windowed agg, spec for sessionization).
  *
  * Scale notes: watermark + tumbling window keeps state bounded by
  * (windows in flight × event types); sessionization state is one
  * small record per active user, evicted on timeout in a real
  * always-on stream.
  */

object EventStreams {

  /** events.parquet declared schema for the given `ts` physical type.
    * DERIVED from the batch probe, not hard-coded: round 8 proved that
    * forcing `ts: LongType` over a `timestamp[us]` fixture makes Spark
    * surface raw µs values that downstream math treats as nanos —
    * every interval shrinks 1000× and the answers are silently wrong.
    * The declared type must match the file's physical type exactly;
    * [[graft.Tables.normalizeEventTs]] then converts (or fails loud on
    * an encoding it doesn't know).
    */
  private[graft] def eventsSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Streaming read of the events table with the same ts_ns/ts
    * convention as the batch loader. The `ts` physical type is probed
    * from the parquet footer (one batch-side read, before the stream
    * starts) and the declared stream schema matches it; normalization
    * to (ts_ns: Long nanos, ts: TimestampType micros) is the shared
    * [[graft.Tables.normalizeEventTs]], which throws on any encoding
    * it doesn't recognize rather than reinterpreting.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val file = s"$dir/events.parquet"
    val tsType = graft.Tables.eventsTsType(spark, dir)
    // FileStreamSource requires a directory basePath; the glob keeps
    // the basePath at $dir while matching only the events table file.
    val raw = spark.readStream
      .schema(eventsSchema(tsType))
      .parquet(s"$dir/events.parque[t]")
    graft.Tables.normalizeEventTs(raw, tsType, file)
  }

  /** Tumbling-window counts with a watermark; runs the finite source
    * to completion (AvailableNow) and returns the materialized result
    * shaped exactly like the batch twin / oracle SQL.
    *
    * Complete mode because the source is finite: append mode would
    * hold back the final window past the last watermark. An always-on
    * deployment would use append + a sink supporting upserts.
    */
  def windowCounts(spark: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_win_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2).cast("double").as("total_value"))
    val q = StreamState.withSizedStatePartitions(spark, Seq(s"$dir/events.parquet"))(agg.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname).select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
      col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming HOPPING-window counts (2 h windows sliding by 1 h):
    * every event lands in two overlapping windows, which Spark's
    * `window(ts, size, slide)` expands BEFORE the aggregation — state
    * is (windows in flight × event types), the tumbling-window bound
    * times size/slide. The batch twin [[graft.operators.Relational
    * .hoppingWindow]] shares the SQL oracle, so the drained stream is
    * hash-checked across the boundary like [[windowCounts]].
    */
  def hoppingWindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_hop_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2).cast("double").as("total_value"))
    val q = StreamState.withSizedStatePartitions(spark, Seq(s"$dir/events.parquet"))(agg.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname).select(
      unix_micros(col("window.start")).as("ws_us"),
      col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming exact dedup + aggregation: dropDuplicatesWithinWatermark
    * then counts per type. The streaming face of §2.3's exact dedup.
    *
    * WithinWatermark matters for an always-on deployment: plain
    * `dropDuplicates("event_id")` keeps one state row per event id
    * FOREVER (watermark eviction only applies when the event-time
    * column is among the dedup keys), so state grows without bound.
    * The WithinWatermark variant evicts each key once the watermark
    * passes its event time — state is bounded by events inside the
    * watermark horizon, which is exactly the replay window a
    * source-retry duplicate can arrive in.
    */
  def dedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(spark, Seq(s"$dir/events.parquet"))(readEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
  }

  /** Stream-static enrichment join + aggregate: the streaming face of
    * the broadcast dimension join (each micro-batch joins against the
    * STATIC customer dimension — stateless, no join state at all,
    * unlike the stream-stream [[intervalJoin]]). The dimension is
    * explicitly `broadcast()` so every executor holds it once and the
    * stream side never shuffles for the join; at 100 TB/day of events
    * the only shuffle is the final segment aggregate. Complete mode
    * for finite-source parity, as [[windowCounts]].
    */
  def enrichCounts(spark: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_enrich_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val dim = broadcast(graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
    val q = StreamState.withSizedStatePartitions(spark, Seq(s"$dir/events.parquet"))(readEventStream(spark, dir)
      .join(dim, "user_id")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2).cast("double").as("total_value"))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
  }



  /** Streaming per-source quota cap — the continuous face of
    * [[graft.operators.TextAnalysis.sourceCap]] (the RefinedWeb/CCNet
    * domain-balancing step): keep at most `cap` documents per source,
    * survivors picked by the content-stable md5 rank.
    *
    * The min-k-by-hash selection is a SEMILATTICE (min-k of a union =
    * min-k of min-ks), so the per-source fold is exact and
    * arrival-order-invariant with state bounded at cap entries —
    * documents can arrive in any batch order and a late doc with a
    * smaller hash correctly evicts the largest kept entry. This is
    * the always-on form of the batch op's k-bounded aggregator: the
    * giant source every web corpus has costs cap entries of state,
    * never a window sort. Each batch re-emits the source's current
    * kept set; `seen` is monotone so final = max, and the drained
    * sink hash-matches `ta_source_cap`'s SQL oracle exactly.
    */
  /** Per-source quota state: the current min-cap (md5, doc_id) set —
    * at most `cap` entries per source, see [[streamSourceCap]].
    */
  case class SourceCapBuf(kept: Seq[(String, Long)], seen: Long)

  /** One emitted quota row. */
  case class SourceCapOut(doc_id: Long, source: String, rk: Long, seen: Long)

  def streamSourceCap(spark: SparkSession, dir: String, cap: Int = 15): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val base = java.nio.file.Files.createTempDirectory("graft-scap-ing-").toString
    val incoming = s"$base/incoming"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(incoming)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(incoming)
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType), StructField("source", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(incoming)
    streamSourceCapOn(stream, cap)._1
  }

  /** [[streamSourceCap]] over an arbitrary document stream. */
  def streamSourceCapOn(docStream: DataFrame, cap: Int):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = docStream.sparkSession
    import spark.implicits._

    // the same hex md5 of "source:doc_id" the batch op and the SQL
    // oracle compute (concat_ws skips a NULL source — mirrored here)
    def hashOf(source: String, docId: Long): String = {
      val s = if (source == null) docId.toString else s"$source:$docId"
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

    def updateFn(source: String, it: Iterator[(Long, String)],
                 state: GroupState[SourceCapBuf]): Iterator[SourceCapOut] = {
      var buf = state.getOption.getOrElse(SourceCapBuf(Nil, 0L))
      it.foreach { case (docId, _) =>
        val e = (hashOf(source, docId), docId)
        buf = SourceCapBuf(
          ((buf.kept :+ e).distinct.sorted: Seq[(String, Long)]).take(cap),
          buf.seen + 1L)
      }
      state.update(buf)
      buf.kept.zipWithIndex.iterator.map { case ((_, docId), i) =>
        SourceCapOut(docId, source, i + 1L, buf.seen)
      }
    }

    val qname = "graft_stream_scap_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(docStream)(docStream
      .select(col("doc_id").as[Long], col("source").as[String])
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateFn)
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val out = spark.table(qname)
      .withColumn("_max_seen", max(col("seen")).over(w))
      .filter(col("seen") === col("_max_seen"))
      .select(col("doc_id"), col("source"), col("rk"))
    (out, q)
  }

  /** Per-user session accumulator carried across micro-batches. */
  case class SessionBuf(lastTsNs: Long, sessionId: Long, nEvents: Long, valueMicros: Long)

  /** One emitted session row. */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long, session_value: Double)

  /** Per-user carry for [[transitionsStateful]]: the last event seen
    * (time, id, type) — three fields, O(users) total state forever.
    */
  case class TransBuf(lastTs: Long, lastEid: Long, lastType: String)

  /** Ensure the event-time `ts` column the watermark needs exists —
    * some spec-driven sources carry only raw `ts_ns`. */
  private def withEventTs(events: DataFrame): DataFrame =
    if (events.columns.contains("ts")) events
    else events.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  /** One observed transition step. */
  case class TransStep(from_type: String, to_type: String)

  /** Streaming event-type transition counts — the stateful twin of
    * batch `eventTransitions`: per-user state is ONE row (the last
    * event), each arriving event emits exactly one (from → to) step
    * against it, and the drained steps aggregate into the Markov
    * matrix. A step is emitted in the batch its LATER event arrives
    * in, so steps are append-only facts — no re-emission, no dedup —
    * and the cross-batch carry is what a windowless batch job cannot
    * have: the final counts equal batch `eventTransitions` over
    * everything seen, PROVIDED files land in per-user time order
    * (the ingest contract [[anomalousHours]] documents; the parity
    * spec drives a time-split two-batch source through it). The
    * entry therefore shares `q_transitions`' SQL oracle verbatim.
    */
  def transitionsStateful(spark: SparkSession, dir: String): DataFrame =
    transitionsStateful(readEventStream(spark, dir))

  /** [[transitionsStateful]] over an arbitrary event stream (the
    * multi-batch parity spec drives this directly). Idle-key
    * retirement (hourlyTopK pattern): a user idle past
    * `idleHorizonHours` is dropped — state stays O(ACTIVE users), and
    * a returning user's first event after the horizon starts a fresh
    * chain (one transition across the idle gap is forgone; every
    * already-emitted step is an append-only fact in the sink).
    */
  def transitionsStateful(events: DataFrame, idleHorizonHours: Long = 720L,
                          watermarkDelay: String = "7 days"): DataFrame =
    transitionsStatefulOn(events, idleHorizonHours, watermarkDelay)._1

  /** [[transitionsStateful]] also returning the terminated query so
    * the retirement spec can read its state-store metrics. */
  def transitionsStatefulOn(events: DataFrame, idleHorizonHours: Long = 720L,
                            watermarkDelay: String = "7 days"):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    def updateFn(userId: Long, evs: Iterator[(Long, Long, String)],
                 state: GroupState[TransBuf]): Iterator[TransStep] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val sorted = evs.toSeq.sortBy(e => (e._1, e._2))
      var buf = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[TransStep]
      sorted.foreach { case (ts, eid, tpe) =>
        if (buf != null) out += TransStep(buf.lastType, tpe)
        buf = TransBuf(ts, eid, tpe)
      }
      if (buf != null) {
        state.update(buf)
        state.setTimeoutTimestamp(math.max(
          buf.lastTs / 1000000L + idleHorizonHours * 3600000L,
          state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }
    val qname = "graft_stream_trans_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(withEventTs(events))(withEventTs(events)
      .withWatermark("ts", watermarkDelay)
      // watermarked ts must reach the stateful operator's input
      .select(col("ts").as[java.sql.Timestamp], col("user_id").as[Long],
        col("ts_ns").as[Long], col("event_id").as[Long],
        col("event_type").as[String])
      .as[(java.sql.Timestamp, Long, Long, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (k: Long, it: Iterator[(java.sql.Timestamp, Long, Long, Long, String)],
         s: GroupState[TransBuf]) =>
          updateFn(k, it.map(e => (e._3, e._4, e._5)), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    (spark.table(qname)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")), q)
  }

  /** Stateful gap sessionization via flatMapGroupsWithState: state is
    * ONE small record per user (last event time + open-session
    * accumulator), not the events themselves. Emits every session
    * (closed and still-open) each update — parity with the batch
    * sessionizer on a finite source is asserted in the spec.
    */
  def sessionizeStateful(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapNs = gapMinutes * 60000L * 1000000L

    def updateFn(userId: Long, events: Iterator[(Long, Long, Double)],
                 state: GroupState[SessionBuf]): Iterator[SessionOut] = {
      // (ts_ns, event_id, value) sorted by event time within the group
      val sorted = events.toSeq.sortBy(e => (e._1, e._2))
      var closed = List.empty[SessionOut]
      var buf = state.getOption.orNull
      sorted.foreach { case (tsNs, _, value) =>
        val micros = BigDecimal(value).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .*(BigDecimal(1000000L)).toLongExact
        if (buf == null) {
          buf = SessionBuf(tsNs, 1L, 1L, micros)
        } else if (tsNs - buf.lastTsNs > gapNs) {
          closed ::= SessionOut(userId, buf.sessionId,
            buf.nEvents, microsToValue(buf.valueMicros))
          buf = SessionBuf(tsNs, buf.sessionId + 1, 1L, micros)
        } else {
          buf = SessionBuf(tsNs, buf.sessionId, buf.nEvents + 1, buf.valueMicros + micros)
        }
      }
      if (buf != null) state.update(buf)
      // emit closed sessions plus the currently-open one (finite-source
      // semantics; an always-on stream would emit open sessions on
      // timeout instead)
      (closed.reverse ++ state.getOption.map(b =>
        SessionOut(userId, b.sessionId, b.nEvents, microsToValue(b.valueMicros)))).iterator
    }

    val qname = "graft_stream_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(spark, Seq(s"$dir/events.parquet"))(readEventStream(spark, dir)
      .select(col("user_id").as[Long], col("ts_ns").as[Long],
        col("event_id").as[Long], col("value").as[Double])
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[(Long, Long, Long, Double)], s: GroupState[SessionBuf]) =>
          updateFn(k, it.map(e => (e._2, e._3, e._4)), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    // Update-mode emissions APPEND to the memory sink, so when
    // AvailableNow splits the source into >1 micro-batch a session can
    // appear twice: once open (early batch), once grown/closed (later
    // batch). n_events grows monotonically within a session, so the
    // final emission per (user_id, session_id) is the max-n_events row
    // — keep exactly that one. (Equal-n_events re-emissions carry
    // identical values, so the tie-break is value-stable.)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("n_events").desc, col("session_value").desc)
    spark.table(qname)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk")
  }

  /** Stream-stream interval join (the attribution shape: each left
    * event joined to right events of the same user within
    * (left, left+within]). BOTH sides carry watermarks and the join
    * condition bounds event time on both sides — that is what lets
    * the engine EVICT buffered rows (left state older than
    * watermark−within, right state older than the watermark); without
    * a time bound a stream-stream join must buffer both streams
    * forever. Append mode: the only mode stream-stream inner joins
    * support — matches emit in the micro-batch they occur.
    *
    * The join predicate stays ENTIRELY on the watermarked
    * TimestampType columns: that is what `StreamingJoinHelper`
    * derives both sides' state-eviction bounds from. Long (epoch
    * nanos) terms in the condition instead make the helper throw per
    * micro-batch (caught but stack-logged — observed flooding the
    * log at sf0.1), and a post-join nanos filter gets pushed back
    * into the condition by the optimizer, so the operator is defined
    * at microsecond resolution end to end — TimestampType's native
    * precision — and the oracle compares on `epoch_us` likewise.
    */
  def intervalJoin(spark: SparkSession, dir: String, leftType: String = "click",
                   rightType: String = "purchase", withinMinutes: Int = 30): DataFrame = {
    val left = readEventStream(spark, dir)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id").as("left_user"),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", "1 hour")
    val right = readEventStream(spark, dir)
      .filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"), col("user_id").as("right_user"),
        col("ts").as("right_ts"))
      .withWatermark("right_ts", "1 hour")
    val qname = "graft_stream_join_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(spark,
      // the source is read on BOTH join sides, so the state sizing
      // charges its bytes twice (r15 ADVICE: one count undersizes the
      // join's four state stores ~2× at scale; perf-only — results
      // are partition-count-invariant)
      Seq(s"$dir/events.parquet", s"$dir/events.parquet"))(left.join(right,
        col("left_user") === col("right_user") &&
          col("right_ts") > col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("left_user").as("user_id"), col("left_id").as("click_id"),
        col("right_id").as("purchase_id"),
        expr("(unix_micros(right_ts) - unix_micros(left_ts)) div 1000").as("lag_ms"))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
  }

  /** Stream-stream LEFT OUTER interval join — [[intervalJoin]] plus
    * the rows an attribution pipeline actually wants: clicks WITHOUT
    * a purchase in the window, emitted exactly once when the
    * watermark proves no match can still arrive (a left row is held
    * in state until the watermark passes `left_ts + within`; only
    * then can the engine emit its null-augmented row). The inner
    * matches stream immediately; the outer rows are the
    * state-eviction byproduct — which is why an outer stream-stream
    * join REQUIRES the time-bound condition (without it no row could
    * ever be declared unmatched).
    *
    * On a finite source the final watermark (max event time − 1 h)
    * never passes the last horizon, so the newest unmatched clicks
    * stay held — exactly the rows the oracle excludes by the same
    * cutoff. The no-data micro-batch (on by default) is what flushes
    * eviction-driven outer rows after the last data batch.
    *
    * NULL-free output for the hash gate: unmatched rows carry
    * purchase_id = −1, lag_ms = −1.
    */
  def intervalJoinOuter(spark: SparkSession, dir: String, leftType: String = "click",
                        rightType: String = "purchase", withinMinutes: Int = 30): DataFrame = {
    val left = readEventStream(spark, dir)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id").as("left_user"),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", "1 hour")
    val right = readEventStream(spark, dir)
      .filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"), col("user_id").as("right_user"),
        col("ts").as("right_ts"))
      .withWatermark("right_ts", "1 hour")
    val qname = "graft_stream_ojoin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(spark,
      // the source is read on BOTH join sides, so the state sizing
      // charges its bytes twice (r15 ADVICE: one count undersizes the
      // join's four state stores ~2× at scale; perf-only — results
      // are partition-count-invariant)
      Seq(s"$dir/events.parquet", s"$dir/events.parquet"))(left.join(right,
        col("left_user") === col("right_user") &&
          col("right_ts") > col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "leftOuter")
      .select(col("left_user").as("user_id"), col("left_id").as("click_id"),
        coalesce(col("right_id"), lit(-1L)).as("purchase_id"),
        coalesce(
          expr("(unix_micros(right_ts) - unix_micros(left_ts)) div 1000"),
          lit(-1L)).as("lag_ms"))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
  }

  /** Stream-stream FULL OUTER interval join — completes the
    * [[intervalJoin]] family's join-type matrix: inner matches plus
    * BOTH unmatched sides, each emitted exactly once when the
    * watermark proves its match can no longer arrive. A left (click)
    * row is declarable unmatched once the watermark passes
    * `left_ts + within` (no future purchase can land in its window);
    * a right (purchase) row once the watermark passes `right_ts`
    * (a matching click must be STRICTLY EARLIER — `right_ts >
    * left_ts` — and the watermark bounds how old a new arrival can
    * be). The two sides therefore have DIFFERENT eviction horizons,
    * and the oracle mirrors each with its own cutoff against the
    * final watermark (min of the two sides' max event time − 1 h, as
    * the engine computes it).
    *
    * NULL-free output for the hash gate: unmatched rows carry −1
    * sentinels in the absent side's id and lag; `user_id` coalesces
    * from whichever side is present.
    */
  def intervalJoinFull(spark: SparkSession, dir: String, leftType: String = "click",
                       rightType: String = "purchase", withinMinutes: Int = 30): DataFrame = {
    val left = readEventStream(spark, dir)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id").as("left_user"),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", "1 hour")
    val right = readEventStream(spark, dir)
      .filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"), col("user_id").as("right_user"),
        col("ts").as("right_ts"))
      .withWatermark("right_ts", "1 hour")
    val qname = "graft_stream_fjoin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(spark,
      // the source is read on BOTH join sides, so the state sizing
      // charges its bytes twice (r15 ADVICE: one count undersizes the
      // join's four state stores ~2× at scale; perf-only — results
      // are partition-count-invariant)
      Seq(s"$dir/events.parquet", s"$dir/events.parquet"))(left.join(right,
        col("left_user") === col("right_user") &&
          col("right_ts") > col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "fullOuter")
      .select(coalesce(col("left_user"), col("right_user")).as("user_id"),
        coalesce(col("left_id"), lit(-1L)).as("click_id"),
        coalesce(col("right_id"), lit(-1L)).as("purchase_id"),
        coalesce(
          expr("(unix_micros(right_ts) - unix_micros(left_ts)) div 1000"),
          lit(-1L)).as("lag_ms"))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
  }

  /** Stream-stream LEFT SEMI interval join — the conversion-audit
    * face of [[intervalJoin]]: each click emits AT MOST ONCE, as soon
    * as its FIRST in-window purchase arrives, however many follow.
    * For "which clicks converted" this beats the inner join + distinct
    * a batch mind would write twice over: no row multiplication on
    * multi-purchase users (state marks the left row matched instead
    * of re-emitting it), and no extra dedup shuffle after the join.
    * Same state story as the inner join: both sides keyed on user,
    * rows held only within the watermark + interval horizon.
    *
    * Unlike the outer join there is no watermark-eviction cutoff to
    * mirror: matched rows emit at match time, unmatched rows never
    * emit — so the batch oracle is a plain EXISTS over the full data.
    */
  def intervalJoinSemi(spark: SparkSession, dir: String, leftType: String = "click",
                       rightType: String = "purchase", withinMinutes: Int = 30): DataFrame = {
    val left = readEventStream(spark, dir)
      .filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id").as("left_user"),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", "1 hour")
    val right = readEventStream(spark, dir)
      .filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"), col("user_id").as("right_user"),
        col("ts").as("right_ts"))
      .withWatermark("right_ts", "1 hour")
    val qname = "graft_stream_sjoin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(spark,
      // the source is read on BOTH join sides, so the state sizing
      // charges its bytes twice (r15 ADVICE: one count undersizes the
      // join's four state stores ~2× at scale; perf-only — results
      // are partition-count-invariant)
      Seq(s"$dir/events.parquet", s"$dir/events.parquet"))(left.join(right,
        col("left_user") === col("right_user") &&
          col("right_ts") > col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "left_semi")
      .select(col("left_user").as("user_id"), col("left_id").as("click_id"))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
  }

  private def microsToValue(micros: Long): Double =
    (BigDecimal(micros) / BigDecimal(1000000L))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Running anomaly state per event type: closed-hour count moments
    * (n, Σc, Σc²) + the currently open hour — O(1) per key forever.
    */
  case class AnomalyBuf(curHour: Long, curCount: Long,
                        n: Long, s1: Long, s2: Long)

  /** One closed-hour verdict. */
  case class AnomalyOut(event_type: String, h: Long, cnt: Long,
                        is_anomaly: Boolean)

  /** Streaming per-type hourly anomaly flags: an hour is anomalous
    * when its event count sits more than 3σ above the mean of that
    * type's PRIOR closed hours (≥ `minPriorHours` of history). The
    * test is pure 64-bit integer arithmetic — c > μ + 3σ rewritten as
    * `c·n > S1 && (c·n − S1)² > 9·(n·S2 − S1²)` — so there is no
    * float accumulation anywhere and the DuckDB oracle (window prefix
    * sums over the batch hourly counts) must agree flag-for-flag.
    *
    * State per event type is five longs (open hour + count + three
    * moments of closed hours) — O(types), never the events, never the
    * hours. Hours are processed in event-time order (sorted within
    * each group batch; the finite single-file source delivers one
    * batch, and the rate-limited multi-batch case preserves order as
    * long as files land in time order — the ingest contract). Each
    * type's final, still-open hour is never emitted (it has not
    * closed; the oracle excludes it identically).
    */
  def anomalousHours(spark: SparkSession, dir: String,
                     minPriorHours: Int = 8): DataFrame =
    anomalousHours(readEventStream(spark, dir), minPriorHours)

  /** [[anomalousHours]] over an arbitrary event stream (the
    * multi-batch late-arrival spec drives this directly).
    */
  def anomalousHours(events: DataFrame, minPriorHours: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourNs = 3600000000000L

    def close(t: String, buf: AnomalyBuf): AnomalyOut = {
      val c = buf.curCount
      val n = buf.n
      // The comparison squares excess and the running sum: at ~1M
      // events/hour over ~10⁴ hours, s1² and excess² exceed 2⁶³, and
      // Long would wrap SILENTLY into wrong flags. BigInt makes the
      // test exact at any scale; the oracle's DuckDB side is already
      // 128-bit (sum(BIGINT) widens to HUGEINT, and the products
      // inherit it). The Long STATE fields are fine far beyond that
      // point (s2 ≤ hours·cnt_max² needs cnt_max ≲ 3·10⁹/hour to
      // stay in range) — only the derived products needed widening.
      val excess = BigInt(c) * n - buf.s1
      val varN2 = BigInt(n) * buf.s2 - BigInt(buf.s1) * buf.s1 // n² · σ²
      val anomalous = n >= minPriorHours && excess > 0 &&
        excess * excess > 9 * varN2
      AnomalyOut(t, buf.curHour, c, anomalous)
    }

    def updateFn(t: String, hours: Iterator[Long],
                 state: GroupState[AnomalyBuf]): Iterator[AnomalyOut] = {
      // One micro-batch's hours for this type are buffered and sorted
      // here — memory bounded by the TRIGGER size, not the stream; the
      // rate-limited source (Sources.readEventStreamRateLimited) is
      // the knob that keeps a backfill's batches small enough.
      val sorted = hours.toSeq.sorted
      var out = List.empty[AnomalyOut]
      var buf = state.getOption.orNull
      sorted.foreach { h =>
        if (buf == null) {
          buf = AnomalyBuf(h, 1L, 0L, 0L, 0L)
        } else if (h == buf.curHour) {
          buf = buf.copy(curCount = buf.curCount + 1L)
        } else if (h < buf.curHour) {
          // A late event for an already-closed hour (out-of-order
          // ACROSS micro-batches — within a batch the sort handles
          // it). Never rewind curHour: re-closing already-closed
          // hours would double-count them into the moments and emit
          // duplicate verdict rows. Dropping keeps the moments and
          // the emitted flags exactly once per hour; the ordered-
          // ingest contract makes this a rare straggler, not a data
          // path.
        } else {
          val closed = close(t, buf)
          out ::= closed
          buf = AnomalyBuf(h, 1L,
            buf.n + 1L, buf.s1 + closed.cnt, buf.s2 + closed.cnt * closed.cnt)
        }
      }
      if (buf != null) state.update(buf)
      out.reverse.iterator
    }

    val qname = "graft_stream_anom_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(events)(events
      .select(col("event_type").as[String], col("ts_ns").as[Long])
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (t: String, it: Iterator[(String, Long)], s: GroupState[AnomalyBuf]) =>
          updateFn(t, it.map(_._2 / hourNs), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    spark.table(qname)
      .select(col("event_type"), col("h"), col("cnt"), col("is_anomaly"))
  }

  /** Per-hour frequency state: one small counts map per hour bucket
    * (bounded by the event-type cardinality, NOT event volume).
    */
  case class HourCounts(counts: Map[String, Long])

  /** One emitted leaderboard row. */
  case class HourTopOut(h: Long, event_type: String, n: Long, rk: Long,
                        h_total: Long)

  /** Streaming per-hour top-k leaderboard via flatMapGroupsWithState:
    * the continuously-updating "top event types this hour" board.
    * State per hour bucket is one counts map over event types, and
    * each micro-batch re-emits the hour's current top-k, so the sink
    * always holds a complete board per hour.
    *
    * Closed hours RETIRE: the stream carries a 1-hour watermark and
    * every hour group arms an EventTimeTimeout at its hour end, so
    * once the watermark passes an hour (no more on-time events can
    * arrive) the timeout fires and the state is removed — live state
    * is O(open hours × type-cardinality), not O(all hours ever seen).
    * The timeout emits nothing: the hour's final board was already
    * emitted by its last data batch. A straggler later than the
    * watermark horizon starts a fresh (small-count) board, which the
    * max-total final-selection below discards — late data degrades to
    * ignored, never to corrupting a closed board.
    *
    * Finite-source parity (the oracle): the FINAL emission per hour
    * equals the batch hourly top-k exactly. The emission's running
    * total (`h_total`) is monotone in event count, so "final" =
    * max-total per hour — the same last-emission-wins selection the
    * stateful sessionizer uses.
    */
  def hourlyTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    hourlyTopK(readEventStream(spark, dir), k)._1

  /** [[hourlyTopK]] over an arbitrary event stream; also returns the
    * terminated query so callers (the state-retirement spec) can read
    * its state-store metrics.
    */
  def hourlyTopK(events: DataFrame, k: Int):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourNs = 3600000000000L
    val hourMs = 3600000L

    def updateFn(h: Long, types: Iterator[String],
                 state: GroupState[HourCounts]): Iterator[HourTopOut] = {
      if (state.hasTimedOut) {
        // watermark passed the hour end: the final board is already in
        // the sink — just drop the state
        state.remove()
        return Iterator.empty
      }
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      state.getOption.foreach(_.counts.foreach { case (t, n) => m.update(t, n) })
      types.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
      state.update(HourCounts(m.toMap))
      // retire when the watermark passes this hour's end; a straggler
      // re-opening an hour the watermark already passed must arm a
      // STILL-FUTURE timeout (setTimeoutTimestamp rejects the past)
      state.setTimeoutTimestamp(
        math.max((h + 1L) * hourMs, state.getCurrentWatermarkMs() + 1L))
      val total = m.valuesIterator.sum
      m.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex.map {
        case ((t, n), i) => HourTopOut(h, t, n, i + 1L, total)
      }.iterator
    }

    val qname = "graft_stream_topk_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(events)(events
      .withWatermark("ts", "1 hour")
      .select(col("ts").as[java.sql.Timestamp], col("ts_ns").as[Long],
        col("event_type").as[String])
      .as[(java.sql.Timestamp, Long, String)]
      .groupByKey(_._2 / hourNs)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (h: Long, it: Iterator[(java.sql.Timestamp, Long, String)], s: GroupState[HourCounts]) =>
          updateFn(h, it.map(_._3), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    // keep only each hour's final (max-total) board
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val out = spark.table(qname)
      .withColumn("_max_total", max(col("h_total")).over(w))
      .filter(col("h_total") === col("_max_total"))
      .select(col("h"), col("event_type"), col("n"), col("rk"))
    (out, q)
  }

  /** Per-user funnel state: the three greedy stage times (MaxValue =
    * not reached) plus the candidate buffers that make the fold EXACT
    * under out-of-order arrival — see [[streamFunnel]].
    */
  case class FunnelBuf(tView: Long, tClick: Long, tPurchase: Long,
                       clickCands: Seq[Long], purchCands: Seq[Long],
                       seen: Long, lastMs: Long)

  /** One emitted funnel row; `seen` is the monotone event count the
    * final-selection uses.
    */
  case class FunnelOut(user_id: Long, stage: Long, seen: Long)

  /** Streaming ordered funnel (view → click → purchase), the
    * continuous face of [[graft.operators.Relational.funnel]]: per
    * user, the greedy stage times t_view = min(views),
    * t_click = min(clicks > t_view), t_purchase = min(purchases >
    * t_click) — maintained EXACTLY under out-of-order arrival within
    * and ACROSS micro-batches, which the obvious 3-longs state
    * cannot do (a late-arriving EARLIER view lowers t_view, admitting
    * clicks the fold already rejected).
    *
    * The trick: each threshold is monotone NON-INCREASING as events
    * accumulate, so an event ≥ the current answer can never become
    * the answer and is safe to drop; an event < the current answer
    * is kept in a candidate buffer, and every fold step re-derives
    * t_click from the candidates admissible under the (possibly just
    * lowered) t_view, then cascades to t_purchase. The buffers hold
    * only events BELOW the current answers, so they shrink as the
    * answers tighten — state per user is 3 longs + two
    * monotone-shrinking buffers (adversarially O(user's clicks),
    * near-empty under the near-ordered arrival real streams have).
    * The result is arrival-order-invariant by construction, which is
    * what makes the batch funnel the oracle: the drained stream
    * hash-matches `q_funnel`'s SQL exactly.
    *
    * Always-on deployment: IDLE-KEY RETIREMENT (the hourlyTopK
    * watermark + EventTimeTimeout pattern, applied per user) bounds
    * the per-lifetime-user state — a user idle for
    * `idleHorizonHours` past the watermark is dropped, their final
    * stage having already been emitted. The defaults (7-day
    * watermark, 30-day idle horizon) dwarf the fixture's event span,
    * so retirement never fires inside the oracle runs — parity is by
    * construction, and the retirement spec drives tightened horizons
    * to watch state rows fall. A user who RETURNS after the horizon
    * restarts from an empty funnel (documented approximation: one
    * idle-horizon gap separates funnel attempts).
    */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame =
    streamFunnelOn(readEventStream(spark, dir))._1

  /** [[streamFunnel]] over an arbitrary event stream, for the
    * out-of-order multi-batch spec.
    */
  def streamFunnelOn(events: DataFrame, idleHorizonHours: Long = 720L,
                     watermarkDelay: String = "7 days"):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    val NONE = Long.MaxValue

    def refresh(buf: FunnelBuf): FunnelBuf = {
      var b = buf
      if (b.tView != NONE) {
        val adm = b.clickCands.filter(_ > b.tView)
        if (adm.nonEmpty && adm.min < b.tClick) b = b.copy(tClick = adm.min)
      }
      b = b.copy(clickCands = b.clickCands.filter(_ < b.tClick))
      if (b.tClick != NONE) {
        val admP = b.purchCands.filter(_ > b.tClick)
        if (admP.nonEmpty && admP.min < b.tPurchase) b = b.copy(tPurchase = admP.min)
      }
      b.copy(purchCands = b.purchCands.filter(_ < b.tPurchase))
    }

    def fold(b0: FunnelBuf, typ: String, ts: Long): FunnelBuf = {
      val b = typ match {
        case "view" if ts < b0.tView => b0.copy(tView = ts)
        case "click" if ts < b0.tClick => b0.copy(clickCands = b0.clickCands :+ ts)
        case "purchase" if ts < b0.tPurchase => b0.copy(purchCands = b0.purchCands :+ ts)
        case _ => b0
      }
      refresh(b.copy(seen = b.seen + 1L))
    }

    def updateFn(uid: Long, it: Iterator[(Long, String, Long)],
                 state: GroupState[FunnelBuf]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        // idle past the horizon: the final stage is already in the
        // sink — just drop the per-user state
        state.remove()
        return Iterator.empty
      }
      var buf = state.getOption.getOrElse(
        FunnelBuf(NONE, NONE, NONE, Nil, Nil, 0L, 0L))
      it.foreach { case (_, typ, ts) =>
        buf = fold(buf, typ, ts)
        if (ts / 1000000L > buf.lastMs) buf = buf.copy(lastMs = ts / 1000000L)
      }
      state.update(buf)
      // retire when the watermark passes lastActivity + idle horizon;
      // a straggler re-opening a user must still arm a FUTURE timeout
      state.setTimeoutTimestamp(math.max(
        buf.lastMs + idleHorizonHours * 3600000L,
        state.getCurrentWatermarkMs() + 1L))
      val stage =
        if (buf.tPurchase != NONE) 3L
        else if (buf.tClick != NONE) 2L
        else if (buf.tView != NONE) 1L else 0L
      Iterator.single(FunnelOut(uid, stage, buf.seen))
    }

    val qname = "graft_stream_funnel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(withEventTs(events))(withEventTs(events)
      .withWatermark("ts", watermarkDelay)
      // the watermarked ts column must reach the stateful operator's
      // input (Spark's event-time-timeout check), hence the 4-tuple
      .select(col("ts").as[java.sql.Timestamp], col("user_id").as[Long],
        col("event_type").as[String], col("ts_ns").as[Long])
      .as[(java.sql.Timestamp, Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, it: Iterator[(java.sql.Timestamp, Long, String, Long)],
         s: GroupState[FunnelBuf]) =>
          updateFn(uid, it.map(e => (e._2, e._3, e._4)), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    // stage is monotone non-decreasing in events folded, so the final
    // stage per user is simply the max emission
    val out = spark.table(qname)
      .groupBy(col("user_id"))
      .agg(max(col("stage")).as("stage"))
    (out, q)
  }

  /** Per-user retention state: cohort hour + the active hours inside
    * the offset window — AT MOST maxOffset+1 longs, see
    * [[streamRetention]].
    */
  case class RetentionBuf(h0: Long, hours: Seq[Long], seen: Long,
                          lastMs: Long)

  /** One emitted retention row: a user's cohort and in-window active
    * hours at this point of the stream.
    */
  case class RetentionOut(user_id: Long, h0: Long, hours: Seq[Long],
                          seen: Long)

  /** Streaming cohort retention — the continuous face of
    * [[graft.operators.Relational.retention]]: cohort = a user's
    * first active hour; for offsets 0..maxOffsetHours, how many of
    * the cohort were active again offset hours later.
    *
    * State per user is PROVABLY BOUNDED at maxOffset+2 longs: the
    * cohort hour h0 plus the distinct active hours inside
    * [h0, h0+maxOffset]. The subtlety is out-of-order arrival ACROSS
    * micro-batches lowering h0 (a late-arriving EARLIER event
    * re-cohorts the user): hours can only EXIT the window when h0
    * drops (h − h0 grows), never enter it, so hours already outside
    * [h0, h0+maxOffset] are safe to forget forever — the fold stays
    * exact without unbounded history. Per batch each user re-emits
    * (h0, in-window hours, seen); `seen` is monotone so final = max,
    * and one small aggregation over the drained sink produces the
    * (cohort_hour, offset_h, n_users) table the batch oracle
    * hash-matches.
    *
    * User COUNT is bounded too: idle-key retirement (watermark +
    * EventTimeTimeout, the hourlyTopK pattern) drops users idle past
    * `idleHorizonHours` — their final cohort row is already emitted,
    * so the roll-up is unaffected.
    */
  def streamRetention(spark: SparkSession, dir: String,
                      maxOffsetHours: Int = 3): DataFrame =
    streamRetentionOn(readEventStream(spark, dir), maxOffsetHours)._1

  /** [[streamRetention]] over an arbitrary event stream, for the
    * out-of-order re-cohorting spec.
    */
  def streamRetentionOn(events: DataFrame, maxOffsetHours: Int = 3,
                        idleHorizonHours: Long = 720L,
                        watermarkDelay: String = "7 days"):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourNs = 3600000000000L

    def fold(b: RetentionBuf, h: Long, ms: Long): RetentionBuf = {
      val h0 = math.min(b.h0, h)
      val hours = (b.hours :+ h).distinct
        .filter(x => x >= h0 && x - h0 <= maxOffsetHours)
      RetentionBuf(h0, hours, b.seen + 1L, math.max(b.lastMs, ms))
    }

    def updateFn(uid: Long, it: Iterator[Long],
                 state: GroupState[RetentionBuf]): Iterator[RetentionOut] = {
      if (state.hasTimedOut) {
        // idle-key retirement (hourlyTopK pattern): the user's final
        // cohort row is already in the sink
        state.remove()
        return Iterator.empty
      }
      var buf = state.getOption.getOrElse(
        RetentionBuf(Long.MaxValue, Nil, 0L, 0L))
      it.foreach(ns => buf = fold(buf, ns / hourNs, ns / 1000000L))
      state.update(buf)
      state.setTimeoutTimestamp(math.max(
        buf.lastMs + idleHorizonHours * 3600000L,
        state.getCurrentWatermarkMs() + 1L))
      Iterator.single(RetentionOut(uid, buf.h0, buf.hours, buf.seen))
    }

    val qname = "graft_stream_ret_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(withEventTs(events))(withEventTs(events)
      .withWatermark("ts", watermarkDelay)
      // watermarked ts must reach the stateful operator's input
      .select(col("ts").as[java.sql.Timestamp], col("user_id").as[Long],
        col("ts_ns").as[Long])
      .as[(java.sql.Timestamp, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, it: Iterator[(java.sql.Timestamp, Long, Long)],
         s: GroupState[RetentionBuf]) =>
          updateFn(uid, it.map(_._3), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    // final per user = the max-seen emission (monotone), then the
    // cohort roll-up the batch twin computes
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val out = spark.table(qname)
      .withColumn("_max_seen", max(col("seen")).over(w))
      .filter(col("seen") === col("_max_seen"))
      .select(col("user_id"), col("h0"), explode(col("hours")).as("h"))
      .groupBy(col("h0").as("cohort_hour"), (col("h") - col("h0")).as("offset_h"))
      .agg(count(lit(1)).as("n_users"))
    (out, q)
  }

  /** Per-hour histogram state for streaming quantiles: a sparse
    * bin→count map, bins clamped to [0, maxBin] so state per hour is
    * bounded by the bin range, never event volume.
    */
  case class QuantileBuf(bins: Map[Long, Long], n: Long)

  /** One emitted per-hour quantile estimate. */
  case class QuantileOut(h: Long, q_permille: Int, est: Long, h_total: Long)

  /** Streaming per-hour quantiles via flatMapGroupsWithState — the
    * streaming face of [[graft.operators.Sketches.quantileSketch]]
    * (row 49's histogram pattern, carried by the [[hourlyCountMin]]
    * state shape): per hour ONE clamped equi-width histogram
    * (binWidth 1.0 — an exactly-representable power of two keeps the
    * float division bit-identical across engines; bins clamped to
    * [0, maxBin]), micro-batches merge by cell-wise sum (exact), and
    * each batch re-emits the hour's current permille estimates:
    * est(q) = upper edge of the first bin whose cumulative count
    * reaches ⌈q·n/1000⌉.
    *
    * All-integer estimates over a deterministic binning → the DuckDB
    * oracle reproduces them exactly across the batch/streaming
    * boundary, the [[hourlyCountMin]] property for quantiles. Exact
    * streaming quantiles would need every value in state; the
    * histogram is the bounded-state form with error ≤ binWidth.
    *
    * PARITY PRECONDITION (the price of closed-hour retirement): the
    * 1-hour watermark makes Spark DROP input rows more than 1 hour
    * late relative to the max event time already seen, so the
    * batch/DuckDB oracle equality holds only for streams whose
    * out-of-order skew is ≤ 1 hour. Events later than that are
    * silently excluded — bounded state and unbounded lateness cannot
    * both hold; a deployment needing more lateness widens the
    * watermark (and pays proportionally longer state retention).
    */
  def hourlyQuantile(spark: SparkSession, dir: String,
                     qPermille: Seq[Int] = Seq(500, 900, 990),
                     maxBin: Long = 4095L): DataFrame =
    hourlyQuantile(readEventStream(spark, dir), qPermille, maxBin)._1

  /** [[hourlyQuantile]] over an arbitrary event stream (the
    * multi-batch merge spec drives this directly); also returns the
    * terminated query for the state-retirement assertion. Closed
    * hours retire via watermark + EventTimeTimeout (the
    * [[hourlyTopK]] contract, applied here r7).
    */
  def hourlyQuantile(events: DataFrame, qPermille: Seq[Int],
                     maxBin: Long):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000))
    val spark = events.sparkSession
    import spark.implicits._
    val hourNs = 3600000000000L
    val hourMs = 3600000L
    val qs = qPermille.distinct.sorted

    def updateFn(h: Long, bins: Iterator[Long],
                 state: GroupState[QuantileBuf]): Iterator[QuantileOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val prev = state.getOption.getOrElse(QuantileBuf(Map.empty, 0L))
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      prev.bins.foreach { case (b, c) => m.update(b, c) }
      var n = prev.n
      bins.foreach { b => m.update(b, m.getOrElse(b, 0L) + 1L); n += 1L }
      state.update(QuantileBuf(m.toMap, n))
      state.setTimeoutTimestamp(
        math.max((h + 1L) * hourMs, state.getCurrentWatermarkMs() + 1L))
      val sorted = m.toSeq.sortBy(_._1)
      val cum = sorted.scanLeft((Long.MinValue, 0L)) {
        case ((_, acc), (b, c)) => (b, acc + c)
      }.tail
      qs.map { q =>
        val rank = (q.toLong * n + 999L) / 1000L
        val est = cum.find(_._2 >= rank).map(_._1 + 1L).getOrElse(0L)
        QuantileOut(h, q, est, n)
      }.iterator
    }

    val qname = "graft_stream_qtl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val binCol = least(greatest(floor(col("value")).cast("long"), lit(0L)), lit(maxBin))
    val q = StreamState.withSizedStatePartitions(events)(events
      .withWatermark("ts", "1 hour")
      .select(col("ts").as[java.sql.Timestamp], col("ts_ns").as[Long], binCol.as[Long])
      .as[(java.sql.Timestamp, Long, Long)]
      .groupByKey(_._2 / hourNs)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (h: Long, it: Iterator[(java.sql.Timestamp, Long, Long)], s: GroupState[QuantileBuf]) =>
          updateFn(h, it.map(_._3), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val out = spark.table(qname)
      .withColumn("_max_total", max(col("h_total")).over(w))
      .filter(col("h_total") === col("_max_total"))
      .select(col("h"), col("q_permille"), col("est"), col("h_total"))
    (out, q)
  }

  /** Per-hour KMV theta state: the ≤k smallest distinct user hashes
    * plus the running event count (the monotone final-emission
    * selector).
    */
  case class ThetaBuf(sketch: Array[Long], n: Long)

  /** One emitted per-hour sketch snapshot. */
  case class ThetaOut(h: Long, sketch: Seq[Long], n: Long)

  /** Streaming per-hour audience sketches — the streaming face of
    * [[graft.operators.Sketches.thetaUserOverlap]]: state per hour
    * is ONE KMV theta sketch of the hour's user ids (≤ k longs, O(1)
    * in event volume — the [[hourlyCountMin]] state contract), and
    * because the KMV insert is a set operation the cross-batch
    * accumulated sketch equals the batch sketch of the hour's users
    * EXACTLY — no merge error, however the hours split across
    * micro-batches. After the drain, consecutive-hour set algebra on
    * the collected sketches (O(hours·k) driver arithmetic) answers
    * the question per-hour distinct counts alone cannot:
    * hour-over-hour RETAINED / NEW / CHURNED audience estimates.
    *
    * Deterministic md5 hashing + floor-division estimates → the
    * DuckDB oracle rebuilds the per-hour sketches and the retention
    * estimates bit-for-bit (the q_theta_sketch property across the
    * batch/streaming boundary). First hour of the stream (no h−1):
    * −1 sentinels, the NULL-free convention of the outer interval
    * join.
    *
    * CLOSED HOURS RETIRE (the [[hourlyTopK]] contract): a 1-hour
    * watermark + EventTimeTimeout armed at each hour's end drops the
    * hour's sketch once no on-time event can arrive — live state is
    * O(open hours × k), not O(all hours); the final sketch is
    * already in the sink when the timeout fires, and the
    * consecutive-hour algebra runs on the SINK's finals, so
    * retirement costs the summary nothing.
    *
    * PARITY PRECONDITION: the 1-hour watermark drops rows arriving
    * > 1 hour late relative to the max event time seen, so the
    * hash-exact batch-oracle equality holds only under ≤ 1-hour
    * out-of-order skew (the [[hourlyQuantile]] contract).
    *
    * Output: (h, est_users, est_retained, est_new, est_churned).
    */
  def hourlyTheta(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    hourlyTheta(readEventStream(spark, dir), k)._1

  /** [[hourlyTheta]] over an arbitrary event stream; also returns the
    * terminated query so the state-retirement spec can read its
    * state-store metrics.
    */
  def hourlyTheta(events: DataFrame, k: Int):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.Kmv
    val (finals, q) = hourlyThetaFinals(events, k)
    val rows = finals.keys.toSeq.sorted.map { h =>
      val cur = finals(h)
      finals.get(h - 1) match {
        case Some(prev) =>
          (h, Kmv.estimate(cur, k),
            Kmv.intersectEstimate(cur, prev, k),
            Kmv.diffEstimate(cur, prev, k),
            Kmv.diffEstimate(prev, cur, k))
        case None => (h, Kmv.estimate(cur, k), -1L, -1L, -1L)
      }
    }
    (rows.toDF("h", "est_users", "est_retained", "est_new", "est_churned"), q)
  }

  /** Sliding-horizon generalization of [[hourlyTheta]]'s retention
    * algebra (the round-8 item): each hour compares against the
    * KMV UNION of the `windowHours` preceding hours' final sketches —
    * "of the audience active in the last w hours, who came back this
    * hour, who is brand new, who went quiet". KMV union of
    * k-truncated sketches IS the k-sketch of the underlying union
    * (the k smallest of A ∪ B all survive their own set's
    * truncation), so the window sketch equals sketching the window's
    * raw users directly — which is exactly what the DuckDB oracle
    * does, keeping the estimates hash-exact like [[hourlyTheta]]'s.
    * Hours with no preceding activity in the horizon emit the −1
    * sentinels; O(hours · windowHours · k) driver arithmetic on the
    * sink's finals, the same shape as the consecutive-hour form.
    */
  def hourlyThetaWindow(spark: SparkSession, dir: String, k: Int = 256,
                        windowHours: Int = 3): DataFrame =
    hourlyThetaWindow(readEventStream(spark, dir), k, windowHours)._1

  /** [[hourlyThetaWindow]] over an arbitrary event stream. */
  def hourlyThetaWindow(events: DataFrame, k: Int, windowHours: Int):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    require(windowHours >= 1, s"windowHours >= 1, got $windowHours")
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.Kmv
    val (finals, q) = hourlyThetaFinals(events, k)
    val rows = finals.keys.toSeq.sorted.map { h =>
      val cur = finals(h)
      val win = ((h - windowHours) until h).flatMap(finals.get)
      if (win.isEmpty) (h, Kmv.estimate(cur, k), -1L, -1L, -1L)
      else {
        val wsk = win.reduce(Kmv.union(_, _, k))
        (h, Kmv.estimate(cur, k),
          Kmv.intersectEstimate(cur, wsk, k),
          Kmv.diffEstimate(cur, wsk, k),
          Kmv.diffEstimate(wsk, cur, k))
      }
    }
    (rows.toDF("h", "est_users", "est_retained", "est_new", "est_churned"), q)
  }

  /** The shared [[hourlyTheta]]/[[hourlyThetaWindow]] drain: run the
    * watermarked per-hour KMV accumulation to completion and return
    * each hour's FINAL sketch (the snapshot at the max running count)
    * plus the terminated query for state-retirement assertions.
    */
  private def hourlyThetaFinals(events: DataFrame, k: Int):
      (Map[Long, Array[Long]], org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.functions.Kmv
    val hourNs = 3600000000000L
    val hourMs = 3600000L

    def updateFn(h: Long, users: Iterator[String],
                 state: GroupState[ThetaBuf]): Iterator[ThetaOut] = {
      if (state.hasTimedOut) {
        // watermark passed the hour end: final sketch already sunk
        state.remove()
        return Iterator.empty
      }
      val prev = state.getOption.getOrElse(ThetaBuf(Array.empty[Long], 0L))
      var sketch = prev.sketch
      var n = prev.n
      users.foreach { u =>
        sketch = Kmv.insertHash(sketch, Kmv.hash48("th:" + u), k)
        n += 1L
      }
      state.update(ThetaBuf(sketch, n))
      state.setTimeoutTimestamp(
        math.max((h + 1L) * hourMs, state.getCurrentWatermarkMs() + 1L))
      Iterator.single(ThetaOut(h, sketch.toSeq, n))
    }

    val qname = "graft_stream_theta_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(events)(events
      .withWatermark("ts", "1 hour")
      .select(col("ts").as[java.sql.Timestamp], col("ts_ns").as[Long],
        col("user_id").cast("string").as[String])
      .as[(java.sql.Timestamp, Long, String)]
      .groupByKey(_._2 / hourNs)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (h: Long, it: Iterator[(java.sql.Timestamp, Long, String)], s: GroupState[ThetaBuf]) =>
          updateFn(h, it.map(_._3), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    // final sketch per hour = the snapshot at the max running count
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val finals = spark.table(qname)
      .withColumn("_max_n", max(col("n")).over(w))
      .filter(col("n") === col("_max_n"))
      .select(col("h"), col("sketch"))
      .as[(Long, Seq[Long])].collect()
      .map { case (h, s) => h -> s.toArray }.toMap
    (finals, q)
  }

  /** Per-hour count-min state: the depth×width counter matrix plus the
    * distinct types seen (the probe set — bounded by type cardinality;
    * the MATRIX is what stays fixed-size as per-type volume grows).
    */
  case class CmsBuf(sketch: Array[Long], types: Set[String], n: Long)

  /** One emitted per-hour frequency estimate. */
  case class CmsOut(h: Long, event_type: String, est: Long, h_total: Long)

  /** Streaming per-hour count-min frequency sketch via
    * flatMapGroupsWithState — the streaming face of
    * [[graft.operators.Sketches.countMinBySource]]: state per hour is
    * ONE depth×width matrix (O(1) in event volume), micro-batches
    * merge into it by cell-wise increment (the CMS merge is a cell
    * sum, so cross-batch accumulation is EXACTLY the batch sketch —
    * no merge error), and each batch re-emits the hour's current
    * estimates for every type seen so far.
    *
    * Determinism end to end: the md5 cell hash has no RNG, so the
    * final per-hour estimates equal the batch CMS of that hour's
    * events bit-for-bit, and the DuckDB oracle recomputes the
    * ESTIMATES themselves (the q_count_min property, now across the
    * batch/streaming boundary). Final emission per (h, type) = max
    * h_total, the [[hourlyTopK]] selection.
    *
    * Width default 64: event-type cardinality is ~10, so collisions
    * are possible but rare — and when one happens BOTH engines
    * reproduce the same overestimate, which is the point.
    *
    * Closed hours RETIRE (watermark + EventTimeTimeout — the
    * [[hourlyTopK]]/[[hourlyTheta]] contract, applied here r7): live
    * state is O(open hours × depth·width), and since the final
    * estimates are already in the sink the timeout only drops state.
    *
    * PARITY PRECONDITION: the 1-hour watermark drops rows arriving
    * > 1 hour late relative to the max event time seen, so the
    * batch-oracle equality holds only under ≤ 1-hour out-of-order
    * skew (the [[hourlyQuantile]] contract).
    */
  def hourlyCountMin(spark: SparkSession, dir: String,
                     depth: Int = 4, width: Int = 64): DataFrame =
    hourlyCountMin(readEventStream(spark, dir), depth, width)._1

  /** [[hourlyCountMin]] over an arbitrary event stream (the
    * multi-batch merge spec drives this directly); also returns the
    * terminated query for the state-retirement assertion.
    */
  def hourlyCountMin(events: DataFrame, depth: Int, width: Int):
      (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourNs = 3600000000000L
    val hourMs = 3600000L

    def updateFn(h: Long, types: Iterator[String],
                 state: GroupState[CmsBuf]): Iterator[CmsOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val prev = state.getOption.getOrElse(
        CmsBuf(new Array[Long](depth * width), Set.empty, 0L))
      val sketch = prev.sketch.clone()
      var seen = prev.types
      var n = prev.n
      types.foreach { t =>
        var j = 0
        while (j < depth) {
          sketch(j * width + graft.functions.CountMin.cell(j, t, width)) += 1L
          j += 1
        }
        seen += t
        n += 1L
      }
      state.update(CmsBuf(sketch, seen, n))
      state.setTimeoutTimestamp(
        math.max((h + 1L) * hourMs, state.getCurrentWatermarkMs() + 1L))
      seen.toSeq.sorted.map(t =>
        CmsOut(h, t, graft.functions.CountMin.estimate(sketch, depth, width, t), n)
      ).iterator
    }

    val qname = "graft_stream_cms_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamState.withSizedStatePartitions(events)(events
      .withWatermark("ts", "1 hour")
      .select(col("ts").as[java.sql.Timestamp], col("ts_ns").as[Long],
        col("event_type").as[String])
      .as[(java.sql.Timestamp, Long, String)]
      .groupByKey(_._2 / hourNs)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        (h: Long, it: Iterator[(java.sql.Timestamp, Long, String)], s: GroupState[CmsBuf]) =>
          updateFn(h, it.map(_._3), s))
      .writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start())
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val out = spark.table(qname)
      .withColumn("_max_total", max(col("h_total")).over(w))
      .filter(col("h_total") === col("_max_total"))
      .select(col("h"), col("event_type"), col("est"), col("h_total"))
    (out, q)
  }
}
