package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("cleanCorpus applies quality, language, and dedup gates in order") {
    import spark.implicits._
    val en = "the cat and the dog of the house sat in the garden with the birds was fine"
    val df = Seq(
      (0L, en),                                  // survives
      (1L, en),                                  // exact dup of 0 -> dropped
      (2L, "  " + en.toUpperCase + " "),         // normalized dup of 0 -> dropped
      (3L, "el perro y la casa de que los un una por el la de que y los las un una por"), // not en
      (4L, "the and of"),                        // too short
      (5L, "!!!! ???? ,,,, the and of to in is that for with was xxxx yyyy zzzz aaaa bbbb cccc dddd") // low alpha? (check below)
    ).toDF("doc_id", "text")
    val kept = Pipeline.cleanCorpus(df).collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L))
    assert(!kept.contains(1L) && !kept.contains(2L), "dups keep only min doc_id")
    assert(!kept.contains(3L), "non-English rejected")
    assert(!kept.contains(4L), "short doc rejected")
  }

  test("cleanCorpus survivors on real docs are nonempty and unique") {
    val out = Pipeline.cleanCorpus(Tables.documents(spark, SharedSpark.sf)).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }
}
