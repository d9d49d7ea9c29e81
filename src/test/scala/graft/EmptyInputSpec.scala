package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Operators must be total on empty inputs (a 100 TB pipeline always
  * has some empty partition/day/source): no exceptions, empty output.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))

  private def emptyEmb: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))

  test("text/dedup/analysis operators return empty on empty documents") {
    assert(TextOps.wordCount(emptyDocs).count() == 0)
    assert(TextOps.invertedIndex(emptyDocs).count() == 0)
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccard(emptyDocs).count() == 0)
    assert(Dedup.minhashLsh(emptyDocs).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
    assert(Dedup.connectedComponents(Dedup.ngramJaccard(emptyDocs)).count() == 0)
    assert(TextAnalysis.languageId(emptyDocs).count() == 0)
    assert(TextAnalysis.fingerprint(emptyDocs).count() == 0)
    assert(Pipeline.cleanCorpus(emptyDocs).count() == 0)
    assert(Multimodal.metadata(emptyDocs).count() == 0)
    assert(Multimodal.features(emptyDocs).count() == 0)
    assert(TextAnalysis.bm25TopK(emptyDocs, Seq("spark")).count() == 0)
    assert(TextAnalysis.weightedSample(emptyDocs).count() == 0)
    assert(Pipeline.pretrainMix(emptyDocs).count() == 0)
    // CMS on an empty corpus: a zero matrix — estimates 0, exacts 0
    assert(Sketches.countMinWordFreq(emptyDocs, Seq("a", "b")).collect()
      .forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    // KLL / drift alarm: empty output, not a throw
    assert(Sketches.kllQuantiles(emptyDocs).count() == 0)
    assert(TextAnalysis.sourceDriftAlarm(emptyDocs).count() == 0)
  }

  test("duplicatedSpans on empty documents is empty") {
    assert(Dedup.duplicatedSpans(emptyDocs).count() == 0)
  }

  test("bpeMerges/bpeVocab on empty documents are empty") {
    assert(TextAnalysis.bpeMerges(emptyDocs, 4).count() == 0)
    assert(TextAnalysis.bpeVocab(emptyDocs, 4).count() == 0)
  }

  test("bfsHops on an empty edge set is empty") {
    import spark.implicits._
    assert(Graph.bfsHops(Seq.empty[(Long, Long)].toDF("u", "v")).count() == 0)
  }

  test("skewProfile on an empty frame is empty") {
    import spark.implicits._
    assert(Relational.skewProfile(Seq.empty[Long].toDF("k"), "k").count() == 0)
  }

  test("mstSummary on an empty edge set is the (0, 0, 0) summary row (the oracle's LEFT JOIN guard pins the same shape)") {
    import spark.implicits._
    val r = Graph.mstSummary(Seq.empty[(Long, Long, Long)].toDF("u", "v", "w")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L)))
  }

  test("triangle count on an empty edge set is the (0, 0, 0) summary row") {
    import spark.implicits._
    val noEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    val r = Graph.triangleCount(noEdges).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L)))
  }

  test("similarity operators return empty on empty embeddings") {
    assert(Similarity.bruteForceTopK(emptyEmb).count() == 0)
    assert(Similarity.annTopK(emptyEmb).count() == 0)
    assert(Similarity.embeddingNearDup(emptyEmb).count() == 0)
    assert(Similarity.labelCentroids(emptyEmb).count() == 0)
    assert(Similarity.quantizeInt8(emptyEmb).count() == 0)
  }

  test("round-3 operators return empty on empty inputs") {
    import spark.implicits._
    assert(Dedup.connectedComponentsAlternating(Dedup.ngramJaccard(emptyDocs)).count() == 0)
    assert(Dedup.applyNearDupDedup(emptyDocs, Dedup.ngramJaccard(emptyDocs)).count() == 0)
    assert(TextAnalysis.contamination(emptyDocs).count() == 0)
    assert(TextAnalysis.repetitionStats(emptyDocs).count() == 0)
    assert(TextAnalysis.shuffleOrder(emptyDocs).count() == 0)
    assert(TextAnalysis.surprisal(emptyDocs).count() == 0)
    val emptyEvents = Seq.empty[(String, String)].toDF("event_type", "props")
    assert(Relational.jsonPropsAgg(emptyEvents).count() == 0)
    val emptyPairsSmall = Seq.empty[(Long, String)].toDF("k", "tag")
    val emptyPairsBig = Seq.empty[(Long, Long)].toDF("k", "payload")
    assert(Relational.saltedJoin(emptyPairsBig, emptyPairsSmall, "k", 4).count() == 0)
  }

  test("round-4 operators return empty (or survive) on empty inputs") {
    import spark.implicits._
    assert(TextAnalysis.sourceCap(emptyDocs).count() == 0)
    assert(TextAnalysis.ngramLmCounts(emptyDocs).count() == 0)
    assert(Multimodal.frameSample(emptyDocs).count() == 0)
    // empty batch -> no survivors; empty corpus -> batch survives intact
    val docs = Seq((1L, "some text")).toDF("doc_id", "text")
    assert(Dedup.incrementalDedup(docs, emptyDocs.select($"doc_id", $"text")).count() == 0)
    assert(Dedup.incrementalDedup(emptyDocs.select($"doc_id", $"text"), docs).count() == 1)
    // kmeans on an empty corpus: no seeds, no cells — empty output
    assert(Similarity.kmeans(emptyEmb, nCells = 4, iters = 2).count() == 0)
  }

  test("round-6 operators return empty (or zero summaries) on empty inputs") {
    import spark.implicits._
    // PQ family: empty corpus -> empty books -> empty results everywhere
    assert(Similarity.pqTrain(emptyEmb).isEmpty)
    assert(Similarity.pqEncode(emptyEmb, Seq.empty).count() == 0)
    assert(Similarity.annTopKPqRerank(emptyEmb).count() == 0)
    assert(Similarity.annTopKIvfPq(emptyEmb).count() == 0)
    assert(Similarity.annTopKIvfPqResidual(emptyEmb).count() == 0)
    // relational/new
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts_ns", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("ts", TimestampType))))
    assert(Relational.sessionWindowAgg(emptyEvents).count() == 0)
    assert(Relational.scd2Intervals(emptyEvents).count() == 0)
    assert(Relational.hoppingWindow(emptyEvents).count() == 0)
    assert(TextAnalysis.tfidfCosinePairs(emptyDocs).count() == 0)
    // diff of two empty snapshots: no statuses at all
    assert(Relational.snapshotDiff(emptyDocs, emptyDocs, "doc_id", "text").count() == 0)
    // FK audit over empty tables: two all-zero audit rows (total on empty)
    val audit = Relational.fkAudit(
      Seq.empty[(Long, Double)].toDF("l_orderkey", "x"),
      Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey"),
      Seq.empty[(Long, String)].toDF("c_custkey", "c_name")).collect()
    assert(audit.length == 2 && audit.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    // quantile sketch over an empty corpus: estimates exist, n_total 0
    val qs = Sketches.quantileSketch(emptyDocs).collect()
    assert(qs.length == 3 && qs.forall(r => r.getLong(2) == 0L))
    // k-core on an empty edge set: empty
    assert(Graph.kCore(Seq.empty[(Long, Long)].toDF("u", "v"), 3).count() == 0)
    assert(Graph.triangleCountApprox(Seq.empty[(Long, Long)].toDF("u", "v")).head().getLong(2) == 0L)
    // join-size estimate between empty sides: 0 est, 0 exact
    val js = Sketches.cmsJoinSizeEstimate(
      Seq.empty[Long].toDF("k"), "k", Seq.empty[Long].toDF("k"), "k",
      depth = 2, width = 64).head()
    assert(js.getLong(0) == 0L && js.getLong(1) == 0L && js.getLong(2) == 0L)
  }

  test("round-7 operators return empty (or zero summaries) on empty inputs") {
    import spark.implicits._
    // sketch-peeled k-core on an empty edge set: empty, converges round 1
    assert(Graph.kCoreApprox(Seq.empty[(Long, Long)].toDF("u", "v"), 3).count() == 0)
    // theta overlap with no events: no sketches, no pairs
    val emptyEvents = Seq.empty[(String, Long)].toDF("event_type", "user_id")
    assert(Sketches.thetaUserOverlap(emptyEvents).count() == 0)
    // coarse-quantizer training on an empty corpus: no centroids
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.trainCoarseQuantizer(emptyEmb).isEmpty)
    // estimate-only join-size path on empty sides: single zero row
    val js7 = Sketches.cmsJoinSizeEstimate(
      Seq.empty[Long].toDF("k"), "k", Seq.empty[Long].toDF("k"), "k",
      depth = 2, width = 64, computeExact = false).head()
    assert(js7.getLong(0) == 0L)
  }

  test("round-9 second-wave operators return empty (or zero summaries) on empty inputs") {
    import spark.implicits._
    val ee = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(Graph.labelPropagation(ee).isEmpty)
    assert(Graph.kTruss(ee, 4, 2).isEmpty)
    // clustering coefficient on empty edges: the (0,0,0,0,0) summary
    val cc = Graph.clusteringCoefficient(ee).head()
    assert((0 until 5).forall(i => cc.getLong(i) == 0L))
    assert(TextAnalysis.gopherFlags(emptyDocs).isEmpty)
    assert(TextAnalysis.cooccurrence(emptyDocs).isEmpty)
    // split drift on empty docs: zero counts, zero distance
    val sd = TextAnalysis.splitDrift(emptyDocs).head()
    assert((0 until 4).forall(i => sd.getLong(i) == 0L))
    assert(Multimodal.tilePlan(emptyDocs).isEmpty)
    assert(Pipeline.qualityDedupAudit(emptyDocs).isEmpty)
    val eev = Seq.empty[(Long, Long, Long, String)]
      .toDF("event_id", "ts_ns", "user_id", "event_type")
    assert(Relational.eventTransitions(eev).isEmpty)
    // nearest as-of: empty right keeps left rows with null payload
    val sl9 = Seq((1L, 10L, 1L)).toDF("uid", "t", "id")
    val er9 = Seq.empty[(Long, Long, Long, String)].toDF("uid", "t", "id", "v")
    val near = graft.plans.TemporalJoins.asofJoinNearest(sl9, er9, "uid", "t", "id", Seq("v"))
    assert(near.count() == 1 && near.head.isNullAt(3))
  }

  test("round-9 operators return empty (or survive) on empty inputs") {
    import spark.implicits._
    import graft.plans.TemporalJoins
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // fuzzy decontamination: empty train, empty eval, both
    val someDocs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    assert(Dedup.fuzzyContamination(emptyDocs, someDocs).count() == 0)
    assert(Dedup.fuzzyContamination(someDocs, emptyDocs).count() == 0)
    assert(Dedup.fuzzyContamination(emptyDocs, emptyDocs).count() == 0)
    // as-of variants on empty sides: left rows survive unmatched /
    // empty left gives empty output
    val el = Seq.empty[(Long, Long, Long)].toDF("uid", "t", "id")
    val sl = Seq((1L, 10L, 1L)).toDF("uid", "t", "id")
    val er = Seq.empty[(Long, Long, Long, String)].toDF("uid", "t", "id", "v")
    assert(TemporalJoins.asofJoinForward(el, er, "uid", "t", "id", Seq("v")).count() == 0)
    val fwdUnmatched = TemporalJoins.asofJoinForward(sl, er, "uid", "t", "id", Seq("v"))
    assert(fwdUnmatched.count() == 1 && fwdUnmatched.head.isNullAt(3))
    val tolUnmatched = TemporalJoins.asofJoinTolerance(sl, er, "uid", "t", "id", Seq("v"), 5L)
    assert(tolUnmatched.count() == 1 && tolUnmatched.head.isNullAt(3))
    // incremental IVF refresh over an empty-change quantizer handoff is
    // covered by its own no-op assertion (VectorStreamsSpec); here the
    // pure-Column assignment on an empty frame must not throw
    val emptyEmb9 = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val coarse9 = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
    assert(emptyEmb9.withColumn("c",
      graft.operators.Similarity.cellAssignColumn(org.apache.spark.sql.functions.col("embedding"), coarse9))
      .count() == 0)
    // session-9 additions: sliding chunks, interval builder, pagerank
    assert(TextAnalysis.slidingChunks(emptyDocs).count() == 0)
    val emptyEv = Seq.empty[(Long, Long, Long)].toDF("event_id", "ts_ns", "user_id")
    assert(Relational.sessionIntervals(emptyEv, 30).count() == 0)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.pagerankMicros(emptyPairs, 3).count() == 0)
  }

  test("round-10 operators return empty on empty inputs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.cdcChunks(emptyDocs).count() == 0)
    assert(Dedup.cdcDedup(emptyDocs).count() == 0)
    assert(Dedup.urlDedup(Seq.empty[(Long, String)].toDF("doc_id", "url")).count() == 0)
    assert(TextAnalysis.qualityClassify(emptyDocs).count() == 0)
    assert(TextAnalysis.qualityAgreement(emptyDocs).count() == 0)
    assert(TextAnalysis.packIntoShardsBpe(emptyDocs).count() == 0)
    assert(TextAnalysis.bpeVocabUntil(emptyDocs, 10L).count() == 0)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(graft.operators.Graph.bfsHopHistogram(emptyEdges).count() == 0)
    assert(graft.operators.Graph.harmonicCentrality(emptyEdges).count() == 0)
    assert(graft.operators.Graph.betweennessApprox(emptyEdges).count() == 0)
    // a single-char doc: shorter than the fingerprint window, still
    // one whole-text chunk (no boundary positions exist)
    val tiny = Dedup.cdcChunks(Seq((1L, "x")).toDF("doc_id", "text")).collect()
    assert(tiny.length == 1 && tiny(0).getLong(3) == 1L)
  }

  test("round-11 operators return empty on empty inputs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.cdcDedupMin(emptyDocs).count() == 0)
    assert(Dedup.cdcDedupClamped(emptyDocs).count() == 0)
    assert(Dedup.lineSurvivors(emptyDocs).count() == 0)
    assert(Dedup.lineDedup(emptyDocs).count() == 0)
    assert(Similarity.semanticDedup(emptyEmb).count() == 0)
    val emptySourced = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextAnalysis.dsirWeights(emptySourced).count() == 0)
    assert(TextAnalysis.dsirSample(emptySourced).count() == 0)
    assert(TextAnalysis.dsirScoreFrozen(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), Seq((0L, 5L))).count() == 0)
    // the profile's shape is one summary row per probed length — on an
    // empty corpus every count is zero, not a throw
    val prof = graft.operators.Suffix.dupMassProfile(emptyDocs, Seq(8, 16)).collect()
    assert(prof.length == 2 &&
      prof.forall(r => (1 to 4).forall(i => r.getLong(i) == 0L)), s"got ${prof.toSeq}")
  }

  test("round-13 second-session operators return empty on empty inputs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "source", "n_chars")
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(TextAnalysis.phraseSearch(emptyDocs, Seq("a", "b")).count() == 0)
    assert(TextAnalysis.langSpans(emptyDocs).count() == 0)
    assert(TextAnalysis.hybridRrf(emptyDocs,
      emptyEmb.select("vec_id", "embedding"), Seq("a")).count() == 0)
    assert(Similarity.robustOutliers(emptyEmb).count() == 0)
    // empty-corpus PCA trains an empty basis and the ANN path stays
    // total (empty result, no throw)
    assert(Similarity.annTopKPcaRerank(
      emptyEmb.select("vec_id", "embedding")).count() == 0)
    assert(Pipeline.curationScorecard(emptyDocs).count() == 0)
  }
}
