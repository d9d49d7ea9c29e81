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
  }

  test("skewProfile on an empty frame is empty") {
    import spark.implicits._
    assert(Relational.skewProfile(Seq.empty[Long].toDF("k"), "k").count() == 0)
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
}
