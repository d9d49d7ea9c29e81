package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  lazy val docs = Tables.documents(spark, SharedSpark.sf)

  test("wordCount counts every token occurrence") {
    import spark.implicits._
    val df = Seq((1L, "the cat the hat"), (2L, "the end")).toDF("doc_id", "text")
    val got = TextOps.wordCount(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 3L, "cat" -> 1L, "hat" -> 1L, "end" -> 1L))
  }

  test("wordCount total equals token total on real docs") {
    val total = TextOps.wordCount(docs).agg(sum("cnt")).head.getLong(0)
    val tokens = TextOps.tokens(docs).count()
    assert(total == tokens && tokens > 0)
  }

  test("invertedIndex lists sorted distinct docs per word") {
    import spark.implicits._
    val df = Seq((2L, "b a"), (1L, "a a c")).toDF("doc_id", "text")
    val got = TextOps.invertedIndex(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(("a", 2L, "1,2"), ("b", 1L, "2"), ("c", 1L, "1")))
  }

  test("grep matches count and filters non-matching docs") {
    import spark.implicits._
    val df = Seq((1L, "the thing"), (2L, "zzz")).toDF("doc_id", "text")
    val got = TextOps.grep(df, "th[ei]").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("mrOutLines produces the reference's sorted 'key value' lines") {
    import spark.implicits._
    val df = Seq((1L, "b a b")).toDF("doc_id", "text")
    val lines = TextOps.mrOutLines(TextOps.wordCount(df)).collect().map(_.getString(0))
    assert(lines.toSeq == Seq("a 1", "b 2"))
  }

  test("sortedWordCount is ordered by cnt desc, word asc") {
    val rows = TextOps.sortedWordCount(docs).limit(100).collect()
      .map(r => (r.getLong(1), r.getString(0)))
    val resorted = rows.sortBy { case (c, w) => (-c, w) }
    assert(rows.toSeq == resorted.toSeq)
  }
}
