package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.mapreduce.MapReduce
import graft.operators.TextOps

/** §2.1 row 1: the generic map/shuffle/reduce API reproduces the
  * reference applications' semantics, and the combiner path agrees
  * with the faithful path.
  */
class MapReduceSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def docs = {
    import spark.implicits._
    Seq(("f1", "the cat the hat"), ("f2", "the end--end"), ("f3", "")).toDS()
  }

  private val tokenize: (String, String) => Seq[(String, Int)] =
    (_, contents) => "[A-Za-z]+".r.findAllIn(contents).map(_ -> 1).toSeq

  test("wordcount via faithful reduce matches hand counts") {
    import spark.implicits._
    val got = MapReduce.run(docs)(tokenize)((_, vs) => vs.sum).collect().toMap
    assert(got == Map("the" -> 3, "cat" -> 1, "hat" -> 1, "end" -> 2))
  }

  test("combiner path agrees with faithful path") {
    import spark.implicits._
    val faithful = MapReduce.run(docs)(tokenize)((_, vs) => vs.sum).collect().toMap
    val combined = MapReduce.runCombining(docs)(tokenize)(0, _ + _).collect().toMap
    assert(combined == faithful)
  }

  test("inverted index via non-associative reduce (sorted doc join)") {
    import spark.implicits._
    val perDocDistinct: (String, String) => Seq[(String, String)] =
      (name, contents) => "[A-Za-z]+".r.findAllIn(contents).toSeq.distinct.map(_ -> name)
    val got = MapReduce
      .run(docs)(perDocDistinct)((_, ds) => s"${ds.distinct.size} ${ds.distinct.sorted.mkString(",")}")
      .collect().toMap
    assert(got("the") == "2 f1,f2")
    assert(got("end") == "1 f2")
  }

  test("MapReduce wordcount agrees with the DataFrame TextOps plan") {
    import spark.implicits._
    val real = Tables.documents(spark, SharedSpark.sf)
      .selectExpr("CAST(doc_id AS STRING)", "text").as[(String, String)]
    val viaMr = MapReduce.runCombining(real)(
      (_, text) => "[A-Za-z]+".r.findAllIn(text).map(_ -> 1L).toSeq)(0L, _ + _)
      .collect().toMap
    val viaDf = TextOps.wordCount(Tables.documents(spark, SharedSpark.sf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMr == viaDf)
  }
}
