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

  test("end-to-end export: clean -> pack -> compacted shards round-trips losslessly") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, SharedSpark.sf)
    val cleaned = Pipeline.cleanCorpus(docs)
    // pack the SURVIVORS (join back to text by doc_id), then write the
    // shard assignment compacted by shard id and read it back
    val survivors = docs.join(cleaned.select("doc_id"), "doc_id")
    val packed = graft.operators.TextAnalysis.packIntoShards(survivors, 2000L)
    val out = java.nio.file.Files.createTempDirectory("graft-export-").toString + "/shards"
    graft.sources.Sources.writeCompacted(packed, out, "shard", 4)
    val back = spark.read.parquet(out)
    // lossless: every survivor exactly once, same shard assignment
    assert(back.count() == survivors.count())
    assert(back.select("doc_id").distinct().count() == survivors.count())
    val a = back.select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(2 - 1))).toSet
    val b = packed.select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // shard budget holds: a prefix-sum shard can overshoot the budget
    // by at most one document (the one that crosses the boundary)
    val maxDoc = back.agg(max("n_tokens")).head.getLong(0)
    val shardTotals = back.groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getLong(1))
    assert(shardTotals.forall(_ <= 2000L + maxDoc), "shard exceeded budget + one doc")
    assert(shardTotals.sum == packed.agg(sum("n_tokens")).head.getLong(0))
  }

  test("cleanCorpusObserved: per-stage metrics from ONE job match independent counts") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val (cleaned, obsIn, obsGates, obsOut) = Pipeline.cleanCorpusObserved(docs)
    val survivors = cleaned.count()   // the single action that fires all observe points
    assert(obsIn.get("n") == docs.count())
    assert(obsOut.get("n") == survivors)
    // gate survivors must sit between dedup output and input
    val gateN = obsGates.get("n").asInstanceOf[Long]
    assert(gateN >= survivors && gateN <= docs.count())
    // observed token volume equals the frame's own sum
    import org.apache.spark.sql.functions._
    assert(obsOut.get("tokens") ==
      cleaned.agg(sum("n_ws_tokens")).head.getLong(0))
    // and the observed frame is row-identical to the plain pipeline
    assert(cleaned.collect().map(_.getLong(0)).toSet ==
      Pipeline.cleanCorpus(docs).collect().map(_.getLong(0)).toSet)
  }

  test("cleanCorpus survivors on real docs are nonempty and unique") {
    val out = Pipeline.cleanCorpus(Tables.documents(spark, SharedSpark.sf)).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("pretrainMix: subset of clean survivors, quota respected, ranks a 1..n permutation") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val cap = 10
    val mix = Pipeline.pretrainMix(docs, capPerSource = cap).collect()
    assert(mix.nonEmpty)
    // every mixed doc survived the SAME gates+dedup the clean pipeline applies
    val cleanIds = Pipeline.cleanCorpus(docs).collect().map(_.getLong(0)).toSet
    assert(mix.forall(r => cleanIds.contains(r.getLong(0))))
    // per-source quota holds
    val bySource = mix.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(bySource.values.forall(_ <= cap), s"quota violated: $bySource")
    // the shuffle order is a dense 1..n permutation
    val ranks = mix.map(_.getLong(3)).sorted.toList
    assert(ranks === (1L to mix.length.toLong).toList)
    // token accounting matches the clean pipeline's for shared docs
    val cleanTokens = Pipeline.cleanCorpus(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mix.forall(r => cleanTokens(r.getLong(0)) == r.getLong(2)))
  }

  test("pretrainMix is invariant to input partitioning") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val a = Pipeline.pretrainMix(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toList
    val b = Pipeline.pretrainMix(docs.repartition(17)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toList
    assert(a === b)
  }
}
