package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mapreduce.MapReduce
import graft.operators.TextOps
import graft.sources.Sources

/** Fidelity on the reference's OWN input corpus
  * (/root/reference/data/pg-*.txt, 8 Project Gutenberg books):
  * the engine must process the exact files the reference framework
  * processes, and the distributed result must equal an independent
  * single-threaded computation (the mrsequential.go oracle role).
  */
class ReferenceDataSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val corpusGlob = "/root/reference/data/pg-*.txt"

  private lazy val fileContents: Map[String, String] = {
    val dir = new java.io.File("/root/reference/data")
    dir.listFiles().filter(_.getName.startsWith("pg-")).map { f =>
      f.getName -> new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    }.toMap
  }

  test("distributed wordcount over the reference corpus equals a sequential count") {
    val df = Sources.readTextCorpus(spark, corpusGlob)
      .withColumnRenamed("doc_name", "doc_id") // TextOps only needs (doc_id, text)
    val distributed = TextOps.wordCount(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sequential = fileContents.values
      .flatMap("[A-Za-z]+".r.findAllIn(_))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(distributed.size == sequential.size)
    assert(distributed == sequential)
    assert(distributed("the") > 10000, "sanity: real books have many 'the'")
  }

  test("MapReduce API over the reference corpus matches the DataFrame plan") {
    import spark.implicits._
    val docs = Sources.readTextCorpus(spark, corpusGlob)
      .as[(String, String)]
    val viaMr = MapReduce.runCombining(docs)(
      (_, text) => "[A-Za-z]+".r.findAllIn(text).map(_ -> 1L).toSeq)(0L, _ + _)
      .collect().toMap
    val viaDf = TextOps.wordCount(
      Sources.readTextCorpus(spark, corpusGlob).withColumnRenamed("doc_name", "doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMr == viaDf)
  }

  test("inverted index on the reference corpus: doc counts bounded by 8 files") {
    val df = Sources.readTextCorpus(spark, corpusGlob)
      .selectExpr("doc_name as doc_id", "text")
      // doc ids must be numeric for the indexer's sorted doc list; use
      // a stable dense id per file name
      .withColumn("doc_id", org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("doc_id")))
    val idx = TextOps.invertedIndex(df).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val n = r.getLong(1)
      assert(n >= 1 && n <= 8)
      assert(r.getString(2).split(',').length == n)
    }
  }
}
