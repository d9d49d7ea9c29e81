package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources
import graft.streaming.{EventStreams, GraphStreams, IngestStreams}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("readTextCorpus: one row per file with whole contents (reference input shape)") {
    val dir = Files.createTempDirectory("graft-corpus-")
    Files.writeString(dir.resolve("a.txt"), "line one\nline two")
    Files.writeString(dir.resolve("b.txt"), "second file")
    val df = Sources.readTextCorpus(spark, dir.toString + "/*.txt")
    val rows = df.collect().map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    assert(rows == Map("a.txt" -> "line one\nline two", "b.txt" -> "second file"))
  }

  test("readBinaryCorpus: one row per media file, bytes intact, glob prunes, oversized skipped") {
    val dir = Files.createTempDirectory("graft-media-")
    val a = Array.tabulate[Byte](256)(i => i.toByte)
    val b = Array.tabulate[Byte](64)(i => (255 - i).toByte)
    Files.write(dir.resolve("a.bin"), a)
    Files.write(dir.resolve("b.bin"), b)
    Files.writeString(dir.resolve("ignore.txt"), "not media")
    Files.write(dir.resolve("huge.bin"), Array.fill[Byte](4096)(1))
    val rows = Sources.readBinaryCorpus(spark, dir.toString, "*.bin", maxBytes = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2))).toSeq
    assert(rows.map(_._1).toSet == Set("a.bin", "b.bin"),
      "glob must prune non-media; the length pushdown must skip the oversized file")
    val byName = rows.map(t => t._1 -> t).toMap
    assert(byName("a.bin")._2 == 256L && byName("a.bin")._3.sameElements(a))
    assert(byName("b.bin")._2 == 64L && byName("b.bin")._3.sameElements(b))
    // the payloads feed the §2.6 pipeline unchanged: codegen'd binary
    // expressions over the ingested column see the same bytes
    val sizes = Sources.readBinaryCorpus(spark, dir.toString, "*.bin", maxBytes = 1024)
      .select(octet_length(col("content"))).collect().map(_.getInt(0)).toSet
    assert(sizes == Set(256, 64))
  }

  test("readBinaryCorpusStream: streamed rows == batch read; feeds mediaPhashIngest (dup payloads pair, fresh ones don't)") {
    val dir = Files.createTempDirectory("graft-media-str-")
    // wave 1: two distinct payloads; wave 2: an exact COPY of m1's
    // payload under a new name plus a fresh payload — the copy must
    // pair with m1 across the wave boundary (hamming 0), fresh stays
    // unpaired. Non-UTF8 bytes (0x80+) pin the no-string-round-trip
    // claim.
    val p1 = Array.tabulate[Byte](200)(i => (i * 7 + 128).toByte)
    val p2 = Array.tabulate[Byte](150)(i => (255 - i * 3).toByte)
    val p3 = Array.tabulate[Byte](90)(i => (i * i + 161).toByte)
    Files.write(dir.resolve("m1.bin"), p1)
    Files.write(dir.resolve("m2.bin"), p2)
    Files.writeString(dir.resolve("skip.txt"), "not media")
    val base = Files.createTempDirectory("graft-media-state-").toString
    val stream1 = Sources.readBinaryCorpusStream(spark, dir.toString, "*.bin")
    IngestStreams.mediaPhashIngest(stream1, s"$base/state", s"$base/ckpt")
    // wave 2 lands later; a NEW checkpoint dir would reprocess, the
    // same one resumes — use the same (continuous-ingest semantics)
    Files.write(dir.resolve("m1copy.bin"), p1)
    Files.write(dir.resolve("m3.bin"), p3)
    val stream2 = Sources.readBinaryCorpusStream(spark, dir.toString, "*.bin")
    IngestStreams.mediaPhashIngest(stream2, s"$base/state", s"$base/ckpt")
    val resolved = IngestStreams.phashResolve(spark, s"$base/state").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_near"))).toMap
    def id(name: String): Long =
      spark.range(1).select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.lit(name))).head.getLong(0)
    assert(resolved.keySet == Set(id("m1.bin"), id("m2.bin"), id("m1copy.bin"), id("m3.bin")),
      s"expected all four media docs, got $resolved")
    assert(resolved(id("m1.bin")) == 1L && resolved(id("m1copy.bin")) == 1L,
      s"identical payloads must pair across waves: $resolved")
    assert(resolved(id("m2.bin")) == 0L && resolved(id("m3.bin")) == 0L,
      s"distinct payloads must not pair: $resolved")
    // the streamed source itself equals the batch read, bytes intact
    val qn = "graft_binstream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Sources.readBinaryCorpusStream(spark, dir.toString, "*.bin")
      .writeStream.format("memory").queryName(qn)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(qn).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val batch = Sources.readBinaryCorpus(spark, dir.toString, "*.bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(streamed == batch && streamed.size == 4)
  }

  test("csv and jsonl round-trip with explicit schema") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5), (2L, "y", -0.25)).toDF("id", "name", "score")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val base = Files.createTempDirectory("graft-io-").toString
    df.write.option("header", "true").csv(s"$base/csv")
    Sources.writeJsonl(df, s"$base/jsonl")
    val viaCsv = Sources.readCsv(spark, s"$base/csv", schema).collect().toSet
    val viaJson = Sources.readJsonl(spark, s"$base/jsonl", schema).collect().toSet
    assert(viaCsv == df.collect().toSet)
    assert(viaJson == df.collect().toSet)
  }

  test("readCsvQuarantine: malformed rows quarantine with their raw text; counts conserve; clean rows parse") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val base = Files.createTempDirectory("graft-quar-").toString
    // 3 clean lines, 2 malformed (bad type, truncated row)
    val lines = Seq(
      "1,alpha,1.5",
      "2,beta,not_a_number",
      "3,gamma,-0.25",
      "4,delta",
      "5,epsilon,2.75")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/feed.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val (clean, quarantine) = Sources.readCsvQuarantine(
      spark, s"$base/feed.csv", schema, header = false)
    val got = clean.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "alpha", 1.5), (3L, "gamma", -0.25), (5L, "epsilon", 2.75)))
    val quar = quarantine.collect().map(_.getString(0)).toSet
    assert(quar == Set("2,beta,not_a_number", "4,delta"),
      s"quarantine must carry the original lines: $quar")
    assert(clean.count() + quarantine.count() == lines.size,
      "no row may be silently dropped")
    // clean frame carries exactly the declared schema (no corrupt col)
    assert(clean.schema.fieldNames.toSeq == schema.fieldNames.toSeq)

    // jsonl twin: bad JSON and a type mismatch quarantine; counts conserve
    val jlines = Seq(
      """{"id":1,"name":"alpha","score":1.5}""",
      """{"id":2,"name":"beta","score":"not_a_number"}""",
      """not json at all""",
      """{"id":4,"name":"delta","score":-0.25}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/feed.jsonl"),
      jlines.mkString("\n").getBytes("UTF-8"))
    val (jc, jq) = Sources.readJsonlQuarantine(spark, s"$base/feed.jsonl", schema)
    assert(jc.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(jq.count() == 2 && jc.count() + jq.count() == jlines.size)
  }

  test("overwritePartitions replaces only the partitions in the new batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-dynpart-").toString
    val day1 = Seq((1L, "d1", 10.0), (2L, "d1", 11.0), (3L, "d2", 12.0))
      .toDF("id", "day", "v")
    Sources.overwritePartitions(day1, s"$base/t", Seq("day"))
    // re-run of day d2 with corrected rows must not touch d1
    val rerun = Seq((30L, "d2", 99.0)).toDF("id", "day", "v")
    Sources.overwritePartitions(rerun, s"$base/t", Seq("day"))
    val got = spark.read.parquet(s"$base/t")
      .select("id", "day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "d1", 10.0), (2L, "d1", 11.0), (30L, "d2", 99.0)))
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val base = Files.createTempDirectory("graft-orc-").toString
    val orders = Tables.orders(spark, SharedSpark.sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Sources.writeOrc(orders, s"$base/orders")
    val back = Sources.readOrcTable(spark, s"$base/orders")
    assert(back.schema == orders.schema)
    assert(back.count() == orders.count())
    val filtered = back.filter(col("o_totalprice") > 200000.0).select("o_orderkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"),
      s"ORC scan must push the predicate: $plan")
    assert(filtered.count() ==
      orders.filter(col("o_totalprice") > 200000.0).count())
  }

  test("partitioned write prunes partitions on read") {
    val base = Files.createTempDirectory("graft-part-").toString
    val events = Tables.events(spark, SharedSpark.sf).select("event_id", "event_type", "value")
    Sources.writePartitioned(events, s"$base/events", Seq("event_type"))
    val one = spark.read.parquet(s"$base/events").filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), "partition pruning in scan")
    assert(one.count() == events.filter(col("event_type") === "click").count())
  }

  test("bucketed table join avoids the shuffle on the bucket key") {
    val orders = Tables.orders(spark, SharedSpark.sf)
    Sources.writeBucketed(orders, "orders_bucketed", "o_custkey", 8, Some("o_custkey"))
    try {
      val t = spark.table("orders_bucketed")
      val agg = t.groupBy("o_custkey").count()
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "aggregation on the bucket key must reuse bucketing, not shuffle")
    } finally spark.sql("DROP TABLE IF EXISTS orders_bucketed")
  }

  test("compacting writer: explicit file count, disjoint sorted key ranges per file") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-compact-").toString + "/t"
    val orders = Tables.orders(spark, SharedSpark.sf).repartition(13) // messy input layout
    Sources.writeCompacted(orders, out, "o_orderkey", 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"file count must be the explicit knob, got ${files.length}")
    // each file holds a contiguous range: per-file [min, max] intervals
    // must not overlap — this is what makes parquet min/max stats
    // prune whole files for range predicates
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("rate-limited source: throttled micro-batches drain the backlog with EXACT state") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.types._
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-rate-").toString
    val src = s"$base/src"
    val schema = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    def addFile(name: String, rows: Seq[(String, Long)]): Unit = {
      val staging = s"$base/stage_$name"
      rows.toDF("k", "v").coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(src).mkdirs()
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/$name.parquet"))
    }
    // a "backlog": three files already sitting in the landing dir
    addFile("f1", Seq(("a", 1L), ("b", 10L)))
    addFile("f2", Seq(("a", 2L), ("c", 5L)))
    addFile("f3", Seq(("b", 3L), ("c", 7L)))
    val qn = "graft_rate_limited"
    val q = Sources.rateLimitedStream(spark, src, schema,
        Sources.RateLimit(maxFilesPerTrigger = Some(1)))
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // backpressure: the 3-file backlog must NOT collapse into one
    // catch-up batch
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 3, s"rate limit must admit one file per trigger, saw $dataBatches")
    // and state is exact across the induced micro-batch boundaries
    val got = spark.table(qn).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 13L, "c" -> 12L))
  }

  test("co-bucketed fact-fact join runs with ZERO exchange on either side") {
    // the 100 TB story for a recurring fact-fact join: pay the shuffle
    // once at write time (bucketBy on the join key, equal bucket
    // counts) and every subsequent join reads co-located buckets
    val orders = Tables.orders(spark, SharedSpark.sf)
    val customer = Tables.customer(spark, SharedSpark.sf)
    Sources.writeBucketed(orders, "orders_cob", "o_custkey", 8, Some("o_custkey"))
    Sources.writeBucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_cob", "o_custkey", 8, Some("o_custkey"))
    try {
      // disable auto-broadcast so the join genuinely exercises the
      // co-partitioned path rather than shipping the small side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_cob")
        .join(spark.table("customer_cob"), "o_custkey")
      val n = j.count()
      assert(n == orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count())
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "co-bucketed join must not shuffle either side")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_cob")
      spark.sql("DROP TABLE IF EXISTS customer_cob")
    }
  }

  test("zValue matches a local bit-interleave") {
    import spark.implicits._
    def local(x: Long, y: Long): Long =
      (0 until 21).foldLeft(0L)((a, i) =>
        a | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L),
      (170L, 85L), (123L, 45L), (2000L, 97L)).toDF("x", "y")
    pts.select(col("x"), col("y"), Sources.zValue(col("x"), col("y")).as("z"))
      .collect().foreach { r =>
        assert(r.getLong(2) === local(r.getLong(0), r.getLong(1)),
          s"(${r.getLong(0)}, ${r.getLong(1)})")
      }
  }

  test("zorderWrite: second-dimension predicate touches a fraction of the files a 1-D sort reads") {
    val base = Files.createTempDirectory("graft-zorder-").toString
    // Full 256x256 grid: every (x, y) exactly once, so file-boundary
    // geometry is deterministic up to range-sampler jitter.
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("x"),
      (col("id") / 256).cast("long").as("y"),
      col("id").as("payload"))
    Sources.zorderWrite(grid, "x", "y", s"$base/z", 16, bits = 8)
    Sources.writeCompacted(grid, s"$base/linear", "x", 16)
    def touched(path: String): (Long, Long) = {
      val f = spark.read.parquet(path)
        .filter(col("y") >= 100 && col("y") <= 127)
      (f.count(), f.select(input_file_name()).distinct().count())
    }
    val (zRows, zFiles) = touched(s"$base/z")
    val (lRows, lFiles) = touched(s"$base/linear")
    // Same answer either way...
    assert(zRows === 28L * 256)
    assert(lRows === zRows)
    // ...but the x-sorted layout scatters the y band into EVERY file,
    // while z-ordering confines it to the files whose Morton range
    // intersects y's high bits (y in [100,127] pins y7y6 = 01: 4 of
    // the 16 top-level blocks, +-1 file of range-boundary jitter).
    assert(lFiles === 16L)
    info(s"zorder touched $zFiles of 16 files; linear touched $lFiles")
    assert(zFiles * 2 < lFiles, s"zorder touched $zFiles of $lFiles files")
  }

  test("writeGroupedSorted: each group whole in one file, internally ordered (secondary-sort contract)") {
    val base = Files.createTempDirectory("graft-grpsort-").toString
    val ev = Tables.events(spark, SharedSpark.sf)
      .select("user_id", "event_id", "ts")
    Sources.writeGroupedSorted(ev, "user_id", "ts", s"$base/out", 8)
    val back = spark.read.parquet(s"$base/out")
      .select(input_file_name().as("f"), col("user_id"), col("ts"))
    // 1. no group spans two files
    val spread = back.groupBy("user_id")
      .agg(countDistinct(col("f")).as("nf"))
      .filter(col("nf") > 1).count()
    assert(spread === 0L, "a user's rows were split across files")
    // 2. within each file, each group's rows are contiguous and
    //    ts-ordered: walk files in row order (parquet preserves it)
    import spark.implicits._
    back.as[(String, Long, java.sql.Timestamp)].collect()
      .groupBy(_._1).foreach { case (_, rows) =>
        var seen = Set.empty[Long]
        var cur = -1L
        var lastTs: java.sql.Timestamp = null
        rows.foreach { case (_, uid, ts) =>
          if (uid != cur) {
            assert(!seen.contains(uid), s"group $uid not contiguous")
            seen += uid; cur = uid; lastTs = ts
          } else {
            assert(!ts.before(lastTs), s"group $uid out of ts order")
            lastTs = ts
          }
        }
      }
    // 3. nothing lost
    assert(back.count() === ev.count())
  }
}
