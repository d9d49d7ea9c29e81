package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("decontaminate: a planted eval copy drops, partial overlap below threshold keeps, funnel integers exact") {
    import spark.implicits._
    // doc 50 is EVAL (id % 50 == 0); the others are train
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (50L, evalText, "web"),
      // verbatim benchmark copy: every 5-shingle hits -> dropped
      (1L, evalText, "web"),
      // shares only the first 5 words: 1 of 6 shingles hits (17% < 50%) -> kept
      (2L, "alpha beta gamma delta epsilon other words entirely here now", "web"),
      // disjoint -> kept
      (3L, "one two three four five six seven eight nine ten", "books")
    ).toDF("doc_id", "text", "source")
    val got = Pipeline.decontaminate(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // web: 2 train docs, copy dropped, partial kept (10 tokens);
    // books: disjoint kept (10 tokens)
    assert(got == Map("web" -> ((2L, 1L, 1L, 10L)), "books" -> ((1L, 0L, 1L, 10L))),
      s"got $got")
    // threshold edge: at 17 pct the partial-overlap doc crosses too
    val strict = Pipeline.decontaminate(df, thresholdPct = 16L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(strict("web") == 2L, s"strict threshold must also drop the partial: $strict")
    // composition honesty vs the audit: dropped == audit rows at >= 50%
    val audit = graft.operators.TextAnalysis.contamination(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val auditDropped = audit.filter { case (_, nsh, nc) => nc * 100L >= 50L * nsh }
      .map(_._1).toSet
    assert(auditDropped == Set(1L))
  }

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

  test("qualityDedupAudit: per-source funnel counts; a DROPPED duplicate never shadows a kept one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 distinct words, 2 stopwords -> passes every gopher rule
    val good = "the and cat dog bird fish goat lion wolf bear deer mole " +
      "horse sheep mouse tiger otter eagle crow dove"
    val df = Seq(
      (1L, good, "web"),            // kept, unique
      (2L, good, "web"),            // kept, duplicate of 1 -> not unique
      (3L, "too short", "web"),     // dropped by f_len
      // books: doc 4 FAILS the gate (short) but shares content with
      // nothing; doc 5 is kept and unique even though its content
      // equals doc 6's, which is dropped — the kept-scoped survivor
      // rule must elect doc 5, not let the dropped 6 shadow it...
      (4L, "tiny", "books"),
      (6L, good + " extra", "books"),
      (5L, good + " extra", "books")
    ).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val got = Pipeline.qualityDedupAudit(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("web") === ((3L, 2L, 1L, 20L)))
    // books: 3 docs, 2 kept (5 and 6... no: 6 == good+extra is KEPT
    // too — both 5 and 6 pass the rules and share content; survivor
    // is min kept id = 5), unique = 1, tokens = 21
    assert(got("books") === ((3L, 2L, 1L, 21L)))
  }

  test("qualityDedupAudit: a dropped doc with a duplicate's content does not steal its survivorship") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val good = "the and cat dog bird fish goat lion wolf bear deer mole " +
      "horse sheep mouse tiger otter eagle crow dove"
    // doc 1 is DROPPED (one dominant word trips f_top_unigram/f_dup)
    // yet ends with content identical to nothing kept; docs 2,3 are
    // kept dups of each other: the survivor must be doc 2 — the
    // smallest KEPT id — and doc 1's smaller id must not matter even
    // if its hash collided (pin via same-source totals)
    val df = Seq(
      (1L, ("the " * 28).trim + " and cat", "s"),
      (2L, good, "s"),
      (3L, good, "s")).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val got = Pipeline.qualityDedupAudit(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("s") === ((3L, 2L, 1L, 20L)))
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

  test("mmCleanCorpus: keeps aligned pairs, drops conflicts/orphans, evicts the larger near-dup twin") {
    import spark.implicits._
    import graft.operators.{Multimodal, Pipeline}
    // 1, 2, 4 self-aligned; 3 pairs with 4 (conflict); 5's media is
    // dead (orphan); 8 and 9 are identical twins (both self-aligned,
    // 9 loses the near-dup election to 8)
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),
      (3L, "completely different content with other letters", "web"),
      (4L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq", "books"),
      (5L, "some caption whose media link is dead", "books"),
      (8L, "eeee ffff gggg hhhh eeee ffff gggg hhhh", "books"),
      (9L, "eeee ffff gggg hhhh eeee ffff gggg hhhh", "books")
    ).toDF("doc_id", "text", "source")
    val kept = Pipeline.mmCleanCorpus(docs).collect()
      .map(r => r.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 8L), s"got $kept")
    // composition honesty: kept ⊆ match-verdict captions, and no
    // kept doc is the doc_b of any near-dup pair
    val matches = Multimodal.pairVerdicts(docs)
      .filter(org.apache.spark.sql.functions.col("v") === "match")
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(matches))
    val losers = Multimodal.phashNearDup(docs, maxHamming = 0)
      .collect().map(_.getLong(1)).toSet
    assert(kept.intersect(losers).isEmpty)
  }

  test("curationScorecard: each gate bills exactly one verdict, precedence wins on multi-fail, columns partition n_docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // a healthy doc that passes everything (enough words, stopwords,
    // classifier-positive shape, no eval overlap, unique content)
    val good = "the project and the teams of the cities is that plan " +
      "for the reader with crisp detail was careful review documented " +
      "throughout and the appendix holds examples that survive edits"
    val evalTxt = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val rows = Seq(
      (1L, good, "s1"),
      (2L, "tiny", "s1"),                      // gopher: under minWords
      // mostly-eval text with two stopwords appended: >= 50% of its
      // shingles are eval shingles, gopher stats pass
      (3L, s"$evalTxt the and", "s1"),
      (4L, good, "s1"),                        // duplicate of 1 (loses to min id)
      // multi-fail: too short AND duplicate of 2 — billed to gopher
      (6L, "tiny", "s1"),
      (50L, evalTxt, "s1")                     // eval slice, not in pool
    )
    val docs = rows.toDF("doc_id", "text", "source")
    // independent composition oracle: run each GATE operator
    // standalone, apply the precedence rule locally, aggregate
    val train = docs.filter($"doc_id" % 50 =!= 0)
    val gk = TextAnalysis.gopherFlags(train).collect()
      .map(r => r.getLong(0) -> r.getBoolean(11)).toMap
    val ck = TextAnalysis.qualityClassify(train).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val tk = TextAnalysis.contamination(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) * 100 < 50 * r.getLong(1))).toMap
    val poolRows = rows.filter(_._1 % 50 != 0)
    val minByHash = poolRows.groupBy(t0 => t0._2.toLowerCase.trim.replaceAll("\\s+", " "))
      .map { case (_, ms) => ms.map(_._1).min }.toSet
    def verdict(id: Long): String =
      if (!gk(id)) "gopher" else if (!ck(id)) "classifier"
      else if (!tk(id)) "contaminated" else if (!minByHash(id)) "duplicate"
      else "kept"
    val vs = poolRows.map(t0 => t0._1 -> verdict(t0._1)).toMap
    assert(vs(2L) == "gopher" && vs(6L) == "gopher",
      s"multi-fail must bill FIRST gate: $vs")
    assert(vs(3L) == "contaminated", s"planted eval-heavy doc: $vs")
    assert(vs(4L) == "duplicate" && vs(1L) == "kept", s"dup election: $vs")
    val want = (
      5L,
      vs.values.count(_ == "gopher").toLong,
      vs.values.count(_ == "classifier").toLong,
      vs.values.count(_ == "contaminated").toLong,
      vs.values.count(_ == "duplicate").toLong,
      vs.values.count(_ == "kept").toLong)
    val got = Pipeline.curationScorecard(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.length == 1)
    val (_, nDocs, g, c, t, d, kept, tokKept) = got.head
    assert((nDocs, g, c, t, d, kept) == want,
      s"scorecard != gate composition: got ${got.head} want $want (verdicts $vs)")
    assert(g + c + t + d + kept == nDocs, s"verdicts don't partition: $got")
    assert(vs(1L) != "kept" || tokKept > 0)
    // real fixture: partition identity + funnel consistency with the
    // standalone decontaminate operator's dropped counts is NOT
    // expected (different precedence) but totals must cover the pool
    val real = Pipeline.curationScorecard(Tables.documents(spark, SharedSpark.sf))
      .collect()
    val pool = Tables.documents(spark, SharedSpark.sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0).count()
    assert(real.map(_.getLong(1)).sum == pool)
    assert(real.forall(r => r.getLong(1) ==
      r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6)))
  }
}
