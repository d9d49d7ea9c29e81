package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("languageId picks the language with the most stopword hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "der hund und die katze ist von den"),
      (4L, "xyzzy qwerty plugh")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "und"))
  }

  test("qualityScore ratios are consistent") {
    import spark.implicits._
    val df = Seq((1L, "Hello, world! abc")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df).head
    assert(r.getLong(r.fieldIndex("n_chars")) == 17L)
    assert(r.getLong(r.fieldIndex("n_words")) == 3L)
    assert(r.getLong(r.fieldIndex("n_punct")) == 2L)
    val alpha = r.getDouble(r.fieldIndex("alpha_ratio"))
    assert(alpha > 0.7 && alpha < 0.8) // 13 letters / 17 chars
  }

  test("gopherFlags: each rule trips on its own planted violation; clean doc keeps") {
    import spark.implicits._
    def row(df: org.apache.spark.sql.DataFrame, id: Long) =
      df.filter(org.apache.spark.sql.functions.col("doc_id") === id).head
    val clean = "the and cat dog bird fish goat lion wolf bear deer mole " +
      "horse sheep mouse tiger otter eagle crow dove" // 20 distinct words, 2 stopwords
    val df = Seq(
      (1L, clean),
      (2L, "the and short"),                                  // < minWords -> f_len
      (3L, ("a b c d e f g h i j " * 3).trim + " the and"),   // mean word len < 3 -> f_word_len
      (4L, ("cat dog bird fish goat lion wolf bear deer mole " * 3).trim), // no stopwords -> f_stop
      (5L, ("the " * 28).trim + " and cat"),                  // one word dominates -> f_top_unigram + f_dup
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(df, minWords = 20L, maxWords = 2000L).cache()
    try {
      val c = row(got, 1L)
      assert(c.getBoolean(c.fieldIndex("keep")), s"clean doc dropped: $c")
      assert(!row(got, 2L).getBoolean(row(got, 2L).fieldIndex("f_len")))
      assert(!row(got, 3L).getBoolean(row(got, 3L).fieldIndex("f_word_len")))
      assert(!row(got, 4L).getBoolean(row(got, 4L).fieldIndex("f_stop")))
      val dom = row(got, 5L)
      assert(!dom.getBoolean(dom.fieldIndex("f_top_unigram")))
      assert(!dom.getBoolean(dom.fieldIndex("f_dup")))
      // keep is exactly the conjunction
      got.collect().foreach { r =>
        val conj = Seq("f_len", "f_word_len", "f_stop", "f_top_unigram", "f_dup")
          .forall(f => r.getBoolean(r.fieldIndex(f)))
        assert(r.getBoolean(r.fieldIndex("keep")) === conj)
      }
    } finally got.unpersist()
  }

  test("splitDrift: zero on identical distributions, maximal on disjoint ones; hand-computed KS gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when, substring, md5}
    // Build docs whose SPLIT we control by choosing ids on each side
    // of the md5 threshold: find ids landing in valid vs train.
    val ids = (1L to 400L)
    val isValid = ids.map(i => i ->
      (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString < "29"))
      .toMap
    val validIds = ids.filter(isValid).take(20)
    val trainIds = ids.filterNot(isValid).take(20)
    // identical length distributions -> D = 0
    def doc(words: Int) = (1 to words).map(_ => "w").mkString(" ")
    val same = (validIds.map(i => (i, doc(5))) ++ trainIds.map(i => (i, doc(5))))
      .toDF("doc_id", "text")
    val r0 = graft.operators.TextAnalysis.splitDrift(same).head()
    assert(r0.getLong(2) === 0L && r0.getLong(3) === 0L)
    // disjoint supports (train all length 3, valid all length 9) ->
    // D = 1.0 exactly: d_raw = nT*nV, d_ppm = 1_000_000
    val disjoint = (validIds.map(i => (i, doc(9))) ++ trainIds.map(i => (i, doc(3))))
      .toDF("doc_id", "text")
    val r1 = graft.operators.TextAnalysis.splitDrift(disjoint).head()
    assert(r1.getLong(2) === r1.getLong(0) * r1.getLong(1))
    assert(r1.getLong(3) === 1000000L)
    // hand case: train lengths {3,3,5,7}, valid {3,5,5,7}: CDF gaps
    // at x=3: |2*4-1*4|=4, x=5: |3*4-3*4|=0, x=7: 0 -> d_raw=4,
    // d_ppm = 4*10^6/16 = 250000
    val t4 = trainIds.take(4).zip(Seq(3, 3, 5, 7))
    val v4 = validIds.take(4).zip(Seq(3, 5, 5, 7))
    val mix = (t4 ++ v4).map { case (i, n) => (i, doc(n)) }.toDF("doc_id", "text")
    val r2 = graft.operators.TextAnalysis.splitDrift(mix).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)) ===
      ((4L, 4L, 4L, 250000L)))
  }

  test("sourceDriftAlarm: per-source KS with alarm threshold; empty window = maximal drift") {
    import spark.implicits._
    // ref window = even doc_id, cur = odd; ids interleave per source
    def rows(source: String, ref: Seq[Long], cur: Seq[Long], base: Long) =
      ref.zipWithIndex.map { case (n, i) => (base + 2L * i, source, n) } ++
        cur.zipWithIndex.map { case (n, i) => (base + 2L * i + 1L, source, n) }
    val docs = (
      rows("stable", Seq(10L, 20L, 30L), Seq(30L, 10L, 20L), 0L) ++
        rows("drifted", Seq(10L, 10L, 10L), Seq(100L, 100L, 100L), 100L) ++
        rows("onesided", Seq(10L, 20L), Seq.empty, 200L) ++
        // hand case: ref {3,3,5,7}, cur {3,5,5,7} → sup-gap at x=3:
        // |2·4−1·4| = 4 → 4·10⁶/16 = 250000 ppm
        rows("hand", Seq(3L, 3L, 5L, 7L), Seq(3L, 5L, 5L, 7L), 300L)
      ).toDF("doc_id", "source", "n_chars")
    def asMap(threshold: Long) =
      graft.operators.TextAnalysis.sourceDriftAlarm(docs, threshold).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5)))).toMap
    val got = asMap(150000L)
    assert(got("stable") == ((3L, 3L, 0L, false)), s"stable: ${got("stable")}")
    assert(got("drifted") == ((3L, 3L, 1000000L, true)), s"drifted: ${got("drifted")}")
    assert(got("onesided") == ((2L, 0L, 1000000L, true)), s"onesided: ${got("onesided")}")
    assert(got("hand") == ((4L, 4L, 250000L, true)), s"hand: ${got("hand")}")
    // the threshold is the knob: at 300000 ppm the hand case stops alarming
    assert(!asMap(300000L)("hand")._4)
  }

  test("cooccurrence: doc-level pair counts, canonical order, deterministic top-k cut") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark shuffle scan"),
      (3L, "spark shuffle"),
      (4L, "spark spark spark shuffle")).toDF("doc_id", "text") // dup words count once
    val got = TextAnalysis.cooccurrence(df, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (shuffle, spark) co-occur in all 4 docs; everything else ≤ 2;
    // ties at n=1 cut by (w1, w2) lexicographic
    assert(got.head === (("shuffle", "spark", 4L)))
    assert(got.length === 3)
    // the n=1 tie block cuts lexicographically: join-* before scan-*
    assert(got(1) === (("join", "shuffle", 1L)))
    assert(got(2) === (("join", "spark", 1L)))
    val all = TextAnalysis.cooccurrence(df, k = 100).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(all.contains(("join", "shuffle", 1L)) && all.contains(("scan", "shuffle", 1L))
      && all.contains(("join", "spark", 1L)) && all.contains(("scan", "spark", 1L)))
    assert(all.forall { case (w1, w2, _) => w1 < w2 })
  }

  test("tokenCounts: ws tokens vs lexer tokens") {
    import spark.implicits._
    val df = Seq((1L, "ab1 cd-ef 23")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head
    assert(r.getLong(r.fieldIndex("n_ws_tokens")) == 3L)
    // ab,1,cd,-,ef,23
    assert(r.getLong(r.fieldIndex("n_bpe_tokens")) == 6L)
  }

  test("corpus totals equal the sum of per-doc counts") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    import org.apache.spark.sql.functions._
    val perDoc = TextAnalysis.tokenCounts(docs).agg(sum("n_ws_tokens")).head.getLong(0)
    val corpus = TextAnalysis.corpusTokenTotals(docs).head
    assert(corpus.getLong(corpus.fieldIndex("total_ws_tokens")) == perDoc)
    assert(corpus.getLong(corpus.fieldIndex("n_docs")) == docs.count())
  }

  test("trainValidSplit is deterministic and covers every doc exactly once") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val s1 = TextAnalysis.trainValidSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TextAnalysis.trainValidSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2, "same assignment on re-run")
    assert(s1.size == docs.count())
    val validFrac = s1.values.count(_ == "valid").toDouble / s1.size
    assert(validFrac > 0.05 && validFrac < 0.35, s"~16% expected, got $validFrac")
  }

  test("tfidf ranks a doc-distinctive term above corpus-common terms") {
    import spark.implicits._
    val df = Seq(
      (1L, "common common common zebra zebra zebra zebra"),
      (2L, "common common words here"),
      (3L, "common words there there")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "zebra", "'common' appears in every doc -> idf 0")
  }

  test("scrub redacts emails, urls, and long digit runs") {
    import spark.implicits._
    val df = Seq((1L, "mail me@example.com or visit https://x.io/page id 123456789 ok"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.scrub(df).head
    assert(r.getLong(r.fieldIndex("n_emails")) == 1L)
    assert(r.getLong(r.fieldIndex("n_urls")) == 1L)
    assert(r.getLong(r.fieldIndex("n_digit_runs")) == 1L)
    assert(r.getString(r.fieldIndex("scrubbed")) == "mail <EMAIL> or visit <URL> id <NUM> ok")
  }

  test("passages cover the whole doc in order without overlap") {
    import spark.implicits._
    val words = (1 to 45).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val rows = TextAnalysis.passages(df, 20).collect().sortBy(_.getLong(1))
    assert(rows.length == 3)
    assert(rows.map(_.getString(2)).mkString(" ") == words, "concatenation restores the doc")
  }

  test("packIntoShards: shards are contiguous in doc order and respect the budget") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val packed = TextAnalysis.packIntoShards(docs, 500L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(packed.length == docs.count())
    // shard ids non-decreasing in doc order
    packed.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3); case _ => }
    // recompute sequentially and compare
    var running = 0L
    packed.foreach { case (_, n, shard) =>
      assert(shard == running / 500L)
      running += n
    }
  }

  test("fingerprint of a doc shorter than k hashes the whole text (no descending sequence)") {
    import spark.implicits._
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df, 8).head.getString(1)
    // substr(text, 1, 8) on a 3-char doc is the doc itself
    assert(fp == java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes).map("%02x".format(_)).mkString)
  }

  test("fingerprint: equal for identical text, different for disjoint text") {
    import spark.implicits._
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "zyxwvutsrq")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df, 8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L), "no shared shingles -> different min-hash fingerprint")
  }

  test("contamination: exact eval copy scores 1.0, disjoint doc scores 0.0") {
    import spark.implicits._
    // doc 50 is the eval doc (50 % 50 == 0); doc 1 copies it verbatim,
    // doc 2 shares nothing with it
    val df = Seq(
      (50L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(df, 50, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("contamination"))).toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.0), s"got $got")
  }

  test("contamination: eval docs themselves are excluded from the output") {
    import spark.implicits._
    val df = Seq(
      (50L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six")).toDF("doc_id", "text")
    val ids = TextAnalysis.contamination(df, 50, 5).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("shuffleOrder: ranks are a 1..n permutation, invariant to input partitioning") {
    import spark.implicits._
    val docs = (1L to 97L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextAnalysis.shuffleOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val b = TextAnalysis.shuffleOrder(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(a.map(_._2).sorted.sameElements(1L to 97L), "dense 1..n ranks")
    assert(a.toMap == b.toMap, "same order under any input partitioning")
    // and the order really is the seeded-hash order, not doc order
    assert(a.sortBy(_._2).map(_._1).take(10).toSeq != (1L to 10L).toSeq)
  }

  test("surprisal: common-word doc scores below rare-word doc, exact micros arithmetic") {
    import spark.implicits._
    val docs = Seq((1L, "the the the the"), (2L, "the zzz")).toDF("doc_id", "text")
    val got = TextAnalysis.surprisal(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // freq: the=5, zzz=1, total=6
    // doc1: 4 tokens of ln(6/5)=0.18232156 -> 0.1823
    // doc2: (ln(6/5) + ln(6))/2 = (0.182322 + 1.791759)/2 -> 0.9870
    assert(got(1L) == ((4L, 0.1823)))
    assert(got(2L)._1 == 2L)
    assert(got(2L)._2 == 0.987)
    assert(got(1L)._2 < got(2L)._2)
  }

  test("repetitionStats: planted repeated doc vs all-distinct doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam"),   // 1 uniq word of 4; bigram "spam spam" 3/3
      (2L, "a b c d")).toDF("doc_id", "text") // all distinct; each bigram once
    val got = TextAnalysis.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> (
        r.getDouble(r.fieldIndex("dup_word_frac")),
        r.getLong(r.fieldIndex("top_bigram_n")),
        r.getLong(r.fieldIndex("n_bigrams")),
        r.getDouble(r.fieldIndex("top_bigram_frac")))).toMap
    assert(got(1L) == ((0.75, 3L, 3L, 1.0)))
    assert(got(2L) == ((0.0, 1L, 3L, 0.3333)))
  }

  test("repetitionStats: single-word doc has zero bigrams and zero fractions") {
    import spark.implicits._
    val r = TextAnalysis.repetitionStats(Seq((1L, "word")).toDF("doc_id", "text")).head
    assert(r.getLong(r.fieldIndex("n_words")) == 1L)
    assert(r.getLong(r.fieldIndex("n_bigrams")) == 0L)
    assert(r.getDouble(r.fieldIndex("top_bigram_frac")) == 0.0)
  }

  test("sourceCap == window row_number reference and is partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, SharedSpark.sf)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("source")),
        r.getLong(r.fieldIndex("rk")))).toSet
    val got = asSet(TextAnalysis.sourceCap(docs, 5))
    // the straightforward (unbounded-sort) window plan as the oracle
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(concat_ws(":", col("source"), col("doc_id").cast("string"))))
    val ref = asSet(docs
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5))
    assert(got == ref)
    assert(got.groupBy(_._2).forall(_._2.size <= 5))
    assert(asSet(TextAnalysis.sourceCap(docs.repartition(7), 5)) == got)
  }

  test("ngramLmCounts: known bigram counts with deterministic tie-broken ranks") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramLmCounts(df, 2, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // counts: "a b"->3, then ties ("b a","b c","b x" all 1) rank by ngram asc
    assert(got == List(("a b", 3L, 1L), ("b a", 1L, 2L), ("b c", 1L, 3L)))
  }

  test("bm25TopK matches a local fold and ranks tf-rich short docs first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark spark spark filler filler"),          // high tf, short
      (2L, "spark " + Seq.fill(50)("pad").mkString(" ")), // tf=1, long
      (3L, "spark spark other words here and there"),
      (4L, "nothing relevant at all")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(corpus, Seq("spark"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(r.fieldIndex("score")), r.getLong(r.fieldIndex("rk"))))
    // Doc 4 has no query terms: absent entirely.
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
    // BM25 with b=0.75 rewards high tf and penalizes length:
    // 1 (tf=3, dl=5) > 3 (tf=2, dl=7) > 2 (tf=1, dl=51).
    assert(got.sortBy(_._4).map(_._1).toList === List(1L, 3L, 2L))
    // Exact micros fold, replicated locally in the same op order.
    val n = 4.0; val df = 3.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val dls = Map(1L -> 5.0, 2L -> 51.0, 3L -> 7.0)
    val tfs = Map(1L -> 3.0, 2L -> 1.0, 3L -> 2.0)
    val avgdl = (5.0 + 51.0 + 7.0 + 4.0) / 4.0
    got.foreach { case (id, nTerms, score, _) =>
      assert(nTerms === 1L)
      val wMicros = math.floor(idf * (tfs(id) * 2.2) /
        (tfs(id) + 1.2 * (0.25 + 0.75 * dls(id) / avgdl)) * 1e6 + 0.5).toLong
      assert(math.abs(score - wMicros / 1e6) < 1e-9, s"doc $id")
    }
  }

  test("weightedSample: partitioning-invariant, and zero-weight docs never sampled") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val base = TextAnalysis.weightedSample(docs, 25).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toList
    val re = TextAnalysis.weightedSample(docs.repartition(17), 25).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toList
    assert(base === re)
    assert(base.map(_._2) === (1L to 25L).toList)
    // A different seed is a different (still deterministic) sample.
    val other = TextAnalysis.weightedSample(docs, 25, seed = "other").collect()
      .map(r => r.getLong(0)).toList
    assert(other !== base.map(_._1))
  }

  test("surprisalBigram: only held-out docs score; unseen continuations out-surprise seen ones") {
    import spark.implicits._
    def isValid(id: Long): Boolean = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 2) < "29"
    val validIds = (1L to 200L).filter(isValid)
    val trainIds = (1L to 200L).filterNot(isValid)
    val (vA, vB) = (validIds(0), validIds(1))
    val docs = (trainIds.map(i => (i, "the cat sat on the mat"))
      :+ (vA, "the cat sat") :+ (vB, "the zebra jumped")).toDF("doc_id", "text")
    val out = TextAnalysis.surprisalBigram(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out.keySet == Set(vA, vB), s"only valid docs score: ${out.keySet}")
    assert(out(vB) > out(vA),
      "unseen continuations (backoff + OOV paths) must out-surprise seen bigrams")
    val out3 = TextAnalysis.surprisalTrigram(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out3.keySet == Set(vA, vB))
    assert(out3(vB) > out3(vA), "the trigram ladder preserves the ordering")
    assert(out3(vB) >= out(vB),
      "fully-unseen text pays the deeper 0.16 backoff at trigram order")
  }

  /** Independent local BPE (the Sennrich reference semantics):
    * overlapping pair counts weighted by word frequency, arg-max by
    * (count desc, pair asc), leftmost-greedy non-overlapping merge.
    */
  private def localBpe(words: Map[String, Long], rounds: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Long], Map[String, Int]) = {
    var seg: Map[String, (List[String], Long)] =
      words.map { case (w, c) => w -> (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 1
    var stop = false
    while (r <= rounds && !stop) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((_, (syms, c)) <- seg; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) += c
      if (pairs.isEmpty) stop = true
      else {
        val ((l, rt), c) = pairs.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r.toLong, l, rt, c))
        seg = seg.map { case (w, (syms, cc)) =>
          val buf = scala.collection.mutable.ListBuffer[String]()
          for (x <- syms) {
            if (buf.nonEmpty && buf.last == l && x == rt) {
              buf.remove(buf.length - 1); buf += (l + rt)
            } else buf += x
          }
          w -> (buf.toList, cc)
        }
        r += 1
      }
    }
    val vocab = seg.values.toSeq.flatMap { case (syms, c) => syms.map(_ -> c) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    (out.toSeq, vocab, seg.map { case (w, (syms, _)) => w -> syms.length })
  }

  test("bpeMerges == independent local BPE on canonical, seeded-random, and exhausted corpora") {
    import spark.implicits._
    def check(texts: Seq[String], rounds: Int): Unit = {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val words = texts.flatMap(_.split("[^A-Za-z]+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, occ) => w -> occ.size.toLong }
      val (expect, expectVocab, segLen) = localBpe(words, rounds)
      val got = TextAnalysis.bpeMerges(docs, rounds).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      assert(got == expect, s"texts=$texts")
      val gotVocab = TextAnalysis.bpeVocab(docs, rounds).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotVocab == expectVocab, s"vocab divergence, texts=$texts")
      val expectEnc = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split("[^A-Za-z]+").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some((i.toLong, toks.length.toLong, toks.map(w => segLen(w).toLong).sum))
      }.toSet
      val gotEnc = TextAnalysis.bpeEncode(docs, rounds).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotEnc == expectEnc, s"encode divergence, texts=$texts")
    }
    // the classic BPE worked example shape
    check(Seq("low low low low low lower lower newest newest newest " +
      "newest newest newest widest widest widest"), 8)
    // small alphabets force overlapping-run and tie-break cases
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val texts = Seq.fill(3)(Seq.fill(30)(
        Seq.fill(2 + rnd.nextInt(6))("abcd" (rnd.nextInt(4))).mkString).mkString(" "))
      check(texts, 10)
    }
    // single-letter vocabulary: zero pairs, merges exhaust immediately
    check(Seq("a b c a b"), 4)
  }

  test("bpeVocabUntil: stops at the first round reaching the target; degenerate targets match char-level and full-round vocab") {
    import spark.implicits._
    // small alphabet, long random words: merged pairs coexist with
    // surviving singles, so the vocabulary genuinely GROWS per round
    // (an all-prefix corpus like "low lower lowest" shrinks it —
    // merges consume their constituents)
    val rnd = new scala.util.Random(7)
    val texts = Seq.fill(3)(Seq.fill(30)(
      Seq.fill(2 + rnd.nextInt(6))("abcd" (rnd.nextInt(4))).mkString).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def vocabAt(rounds: Int): Map[String, Long] =
      TextAnalysis.bpeVocab(docs, rounds).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocab-size trajectory under fixed-round learning; round 0 is
    // the character inventory (a target at or below it stops with
    // zero merges)
    val size0 = texts.flatMap(_.split("[^A-Za-z]+")).flatten.distinct.size
    val sizes = (1 to 12).map(r => r -> vocabAt(r).size)
    // a target just past the char inventory: expect the state of the
    // FIRST round whose size reaches it
    val target = size0 + 2
    val rStar = sizes.find(_._2 >= target).get._1
    val got = TextAnalysis.bpeVocabUntil(docs, target.toLong, 12).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == vocabAt(rStar), s"target=$target rStar=$rStar")
    // target below the character inventory: zero merges — the
    // char-level segmentation (every sym is one char)
    val charLevel = TextAnalysis.bpeVocabUntil(docs, 1L, 12).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(charLevel.keys.forall(_.length == 1), s"expected char-level, got $charLevel")
    // unreachable target: degrades to the full fixed-round vocab
    assert(TextAnalysis.bpeVocabUntil(docs, 10000L, 12).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == vocabAt(12))
  }

  test("qualityAgreement: 2x2 matrix equals composing the two verdicts; counts conserve the corpus") {
    import spark.implicits._
    val good = "the and cat dog bird fish goat lion wolf bear deer mole " +
      "horse sheep mouse tiger otter eagle crow dove"
    val docs = Seq((1L, good), (2L, "too short"), (3L, good + " join merge window"),
      (4L, "a a a a a a a a a a a a a a a a a a a a a")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityAgreement(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(got.values.sum == 4L, "matrix must conserve the corpus")
    val clf = TextAnalysis.qualityClassify(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val rules = TextAnalysis.gopherFlags(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val want = (1L to 4L).groupBy(i => (clf(i), rules(i)))
      .map { case (k, v) => k -> v.size.toLong }
    assert(got == want, s"got $got want $want")
  }

  test("weightedSample prefers heavy docs: inclusion tracks weight on a planted corpus") {
    import spark.implicits._
    // 5 heavy docs (w=5000) among 200 light ones (w=10): with k=10,
    // E-S keys u^(1/w) concentrate near 1 for heavy docs — all five
    // heavy docs must make a top-10 cut with overwhelming probability.
    val corpus = ((1L to 5L).map(i => (i, "h", 5000L)) ++
      (6L to 205L).map(i => (i, "l", 10L))).toDF("doc_id", "text", "n_chars")
    val picked = TextAnalysis.weightedSample(corpus, 10).collect()
      .map(_.getLong(0)).toSet
    assert((1L to 5L).forall(picked.contains))
  }

  test("slidingChunks: overlap, tail coverage, and sub-window docs") {
    import spark.implicits._
    // 25 words, window 6, stride 4 → starts 0,4,8,12,16 and a tail
    // start at 20 (ceil((25-6)/4) = 5) covering words 20..24
    val words = (0 until 25).map(i => s"w$i")
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, "a b c") // shorter than the window: exactly one chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.slidingChunks(docs, window = 6, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == (0L to 5L))
    // every consecutive pair overlaps by window - stride = 2 words
    assert(d1.head._3 == "w0 w1 w2 w3 w4 w5")
    assert(d1(1)._3 == "w4 w5 w6 w7 w8 w9")
    // tail chunk is short but covers the last words
    assert(d1.last._3 == "w20 w21 w22 w23 w24" && d1.last._4 == 5L)
    // full coverage: each word index appears in at least one chunk
    val covered = d1.flatMap(c => c._3.split(" ")).toSet
    assert(covered == words.toSet)
    val d2 = got.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, "a b c", 3L)))
  }

  test("packIntoShardsBpe budgets count BPE subwords; sharding matches a local prefix-sum replay") {
    import spark.implicits._
    val docs = Seq((1L, "aaa bbb aaa aaa"), (2L, ""), (3L, "ab ab cd"),
      (4L, "aaa cd xy"), (5L, "bbb bbb")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = TextAnalysis.packIntoShardsBpe(docs, tokensPerShard = 5L, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the cost column IS the encoder's subword count (0 for the
    // empty doc, which bpeEncode's inner join drops)
    got.foreach { case (id, n, _) =>
      assert(n == enc.getOrElse(id, 0L), s"doc $id cost $n != encoder ${enc.get(id)}")
    }
    // shard assignment = global running prefix sum / budget, in
    // doc_id order — replayed locally
    var run = 0L
    got.foreach { case (id, n, s) =>
      assert(s == run / 5L, s"doc $id shard $s != ${run / 5L}")
      run += n
    }
    assert(got.map(_._3).distinct.length > 1, "fixture too small to cross a shard boundary")
  }

  test("noveltyProfile: first doc fully novel, a verbatim copy fully recycled, partial overlap counted exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // 3 distinct 3-shingles, all first
      (2L, "alpha beta gamma delta epsilon"),          // verbatim copy -> 0 novel
      (3L, "alpha beta gamma zeta eta theta iota")     // shares exactly 'alpha beta gamma'
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyProfile(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)), s"got ${got(1L)}")
    assert(got(2L) == ((3L, 0L, 0.0)), s"got ${got(2L)}")
    // doc 3: 5 shingles, 'alpha beta gamma' seen in doc 1 -> 4 novel
    assert(got(3L) == ((5L, 4L, 0.8)), s"got ${got(3L)}")
    // corpus identity: novel counts sum to the distinct-shingle total
    val real = TextAnalysis.noveltyProfile(Tables.documents(spark, SharedSpark.sf))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val distinctTotal = graft.operators.Dedup
      .wordShingles(Tables.documents(spark, SharedSpark.sf), 3)
      .select("shingle").distinct().count()
    assert(real.map(_._2).sum == distinctTotal,
      "every distinct shingle is novel in exactly one doc")
    assert(real.forall { case (nsh, nn) => nn >= 0 && nn <= nsh })
  }

  test("qualityTopP keeps exactly each source's top-p fraction by rank, ties broken by doc_id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // full fixture: per source, kept count == floor(p * n_src), the
    // kept set is rank-1..k, and every kept logit >= every dropped
    // logit within its source
    val docs = Tables.documents(spark, SharedSpark.sf)
    val kept = TextAnalysis.qualityTopP(docs, 250000L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(kept.nonEmpty)
    val srcTotals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy(_._2).foreach { case (src, rows) =>
      val want = srcTotals(src) * 250000L / 1000000L
      assert(rows.length.toLong == want, s"$src kept ${rows.length}, want $want")
      assert(rows.map(_._4).sorted.toSeq == (1L to want), s"$src ranks not 1..k")
    }
    val clf = TextAnalysis.qualityClassify(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("doc_id"), col("source"), col("logit")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val keptIds = kept.map(_._1).toSet
    kept.groupBy(_._2).foreach { case (src, rows) =>
      val minKept = rows.map(_._3).min
      val maxDropped = clf.filter(c => c._2 == src && !keptIds(c._1))
        .map(_._3).maxOption.getOrElse(Double.NegativeInfinity)
      assert(minKept >= maxDropped,
        s"$src: kept logit $minKept below a dropped $maxDropped")
    }
    // hand fixture: 4 docs in one source at p=50% -> exactly the top
    // 2 by (logit desc, doc_id); identical texts tie and the smaller
    // doc_id wins the boundary rank
    val hand = Seq(
      (1L, "join merge window stream query agg", "s"),
      (2L, "join merge window stream query agg", "s"),
      (3L, "a the a the a the a the", "s"),
      (4L, "a the a the a the a the", "s")).toDF("doc_id", "text", "source")
    val h = TextAnalysis.qualityTopP(hand, 500000L).collect()
      .map(r => r.getLong(0)).toSet
    assert(h == Set(1L, 2L), s"got $h")
    // p = 0 keeps nothing; p = 100% keeps everything
    assert(TextAnalysis.qualityTopP(hand, 0L).count() == 0L)
    assert(TextAnalysis.qualityTopP(hand, 1000000L).count() == 4L)
  }

  test("qualityClassify separates planted boilerplate from prose; training is reproducible") {
    import spark.implicits._
    // retraining is bit-for-bit reproducible (pinned iteration order,
    // pure JVM doubles) — the shipped artifact is a function of the
    // source alone
    val again = {
      val (ws, b) = TextAnalysis.qualityClfTrain(TextAnalysis.clfPlantedCorpus, 4096)
      def micros(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      (ws.map { case (k, v) => (k, micros(v)) }.filter(_._2 != 0L), micros(b), 4096)
    }
    assert(again == TextAnalysis.qualityClfArtifact)
    // held-out planted docs (same generator register, fresh seed)
    // separate cleanly: filler soup drops, content prose keeps
    val rnd = new scala.util.Random(99L)
    val filler = Vector("a", "the", "value", "row", "part", "key", "small", "slow", "dup")
    val content = Vector("join", "merge", "window", "stream", "query",
      "agg", "group", "sort", "scan", "batch", "vector", "hash")
    def doc(words: Vector[String], n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val held = (1L to 10L).map(i => (i, doc(filler, 24), false)) ++
      (11L to 20L).map(i => (i, doc(content, 24), true))
    val df = held.map(h => (h._1, h._2)).toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassify(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    held.foreach { case (id, _, label) =>
      assert(got(id) == label, s"doc $id: expected keep=$label")
    }
    // empty / non-alpha doc scores at the bias, n_feats 0
    val empty = TextAnalysis.qualityClassify(
      Seq((1L, ""), (2L, "12345 !!!")).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(empty == Set((1L, 0L), (2L, 0L)))
    // the deployable-parquet faces round-trip the artifact
    val path = java.nio.file.Files.createTempDirectory("graft-clf-").toString + "/w"
    TextAnalysis.qualityClfSaveWeights(TextAnalysis.qualityClfArtifact, path, spark)
    val loaded = TextAnalysis.qualityClfLoadWeights(path, spark)
    assert(loaded._1.toSet == TextAnalysis.qualityClfArtifact._1.toSet &&
      loaded._2 == TextAnalysis.qualityClfArtifact._2 &&
      loaded._3 == TextAnalysis.qualityClfArtifact._3)
    // scoring through a loaded artifact is identical to the shipped one
    val viaLoaded = TextAnalysis.qualityClassify(df, loaded).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    assert(viaLoaded == got)
    // an all-zero-weight artifact round-trips too: bias and dim ride
    // the sentinel row, not the (empty) weight rows
    val path0 = java.nio.file.Files.createTempDirectory("graft-clf0-").toString + "/w"
    TextAnalysis.qualityClfSaveWeights((Seq.empty, -123456L, 2048), path0, spark)
    assert(TextAnalysis.qualityClfLoadWeights(path0, spark) ==
      ((Seq.empty, -123456L, 2048)))
  }

  test("qualityClfTrainDistributed: bit-equal to the local full-batch trainer at any partitioning; separates the planted corpus") {
    import spark.implicits._
    val corpus = TextAnalysis.clfPlantedCorpus
    val local = TextAnalysis.qualityClfTrainFullLocal(corpus, dim = 4096, epochs = 25)
    assert(local._1.nonEmpty, "local full-batch trainer learned nothing")
    val df = corpus.toDF("text", "label")
    // micros-floored Long gradients sum exactly in ANY partitioning,
    // so 1, 7 and 32 partitions must all reproduce the local weights
    // BIT-for-bit (== on Double, no tolerance)
    Seq(1, 7, 32).foreach { p =>
      val dist = TextAnalysis.qualityClfTrainDistributed(
        df.repartition(p), dim = 4096, epochs = 25)
      assert(dist._2 == local._2, s"bias drifted at $p partitions")
      assert(dist._1 == local._1, s"weights drifted at $p partitions")
    }
    // the full-batch model is a working classifier on held-out docs
    // of the same registers (reusing the shipped-model fixture shape)
    val rnd = new scala.util.Random(7L)
    val filler = Vector("a", "the", "value", "row", "part", "key",
      "small", "slow", "dup", "the", "a", "value")
    val content = Vector("join", "merge", "window", "stream", "query",
      "agg", "group", "sort", "scan", "batch", "vector", "hash")
    def doc(words: Vector[String], n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val held = (1L to 10L).map(i => (i, doc(filler, 24), false)) ++
      (11L to 20L).map(i => (i, doc(content, 24), true))
    def micros(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val artifact = (local._1.map { case (k, v) => (k, micros(v)) }.filter(_._2 != 0L),
      micros(local._2), 4096)
    val got = TextAnalysis.qualityClassify(
        held.map(h => (h._1, h._2)).toDF("doc_id", "text"), artifact).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    held.foreach { case (id, _, label) =>
      assert(got(id) == label, s"full-batch model misclassified doc $id")
    }
    // empty input: both faces return the zero model
    assert(TextAnalysis.qualityClfTrainFullLocal(Seq.empty) == ((Seq.empty, 0.0)))
    assert(TextAnalysis.qualityClfTrainDistributed(
      Seq.empty[(String, Boolean)].toDF("text", "label")) == ((Seq.empty, 0.0)))
  }

  test("packIntoShardsFertility: per-source estimated mass equals exact subword mass up to flooring; sharding is the shared prefix rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val docs = Tables.documents(spark, SharedSpark.sf)
    val est = TextAnalysis.packIntoShardsFertility(docs, 2000L)
    val exact = TextAnalysis.packIntoShardsBpe(docs, 2000L)
    val src = docs.select(col("doc_id"), col("source"))
    def perSource(df: org.apache.spark.sql.DataFrame) =
      df.join(src, "doc_id").groupBy("source")
        .agg(fsum("n_tokens").as("t"), org.apache.spark.sql.functions.count("*").as("n"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val e = perSource(est); val x = perSource(exact)
    assert(e.keySet == x.keySet && e.nonEmpty)
    e.foreach { case (s, (tEst, n)) =>
      val tExact = x(s)._1
      assert(math.abs(tEst - tExact) <= n,
        s"source $s: estimated mass $tEst vs exact $tExact beyond flooring slack $n")
    }
    // shard assignment is the shared prefix rule over the estimates
    val rows = est.collect().sortBy(_.getLong(0))
    var run = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == run / 2000L, s"shard rule drifted at doc ${r.getLong(0)}")
      run += r.getLong(1)
    }
    // an unknown source (absent from the fertility table) packs at parity
    val alien = Seq((1L, "five plain words right here", "never-seen"))
      .toDF("doc_id", "text", "source").withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
    // fertility table measured on `alien` itself has the source, so
    // drive the estimator path directly: w=5 at parity 1e6 -> 5
    val lone = TextAnalysis.packIntoShardsFertility(alien, 2000L).collect()
    assert(lone.length == 1 && lone.head.getLong(1) >= 5L, s"got ${lone.toSeq}")
  }

  test("dsirDrift: mirrored windows measure zero; a vocabulary shift in one window alarms; unseen buckets hit the floor, not silence") {
    import spark.implicits._
    def docsOf(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "text", "source")
    // mirrored corpus: every doc exists at an even AND an odd id, so
    // the two windows' LMs are identical -> exact zero drift
    val base = Seq(("alpha beta gamma delta", "src0"), ("epsilon zeta eta theta", "srcX"),
      ("iota kappa lambda mu", "srcX"))
    val mirrored = docsOf(base.zipWithIndex.flatMap { case ((t, s), i) =>
      Seq((2L * i, t, s), (2L * i + 1, t, s)) })
    val zero = TextAnalysis.dsirDrift(mirrored).collect().head
    assert(zero.getLong(0) == 4096L && zero.getLong(1) == 0L &&
      zero.getLong(3) == 0L && !zero.getBoolean(4), s"mirrored windows drifted: $zero")
    // drifted corpus: the odd window's POOL speaks a brand-new
    // vocabulary the even window never produced — those buckets
    // compare against the even window's smoothing floor and the
    // max bucket delta must clear the alarm threshold
    val drifted = docsOf(
      (0L to 18L by 2).map(i => (i, ("steady target words here " * 3).trim,
        if (i < 8) "src0" else "srcX")) ++
      (1L to 19L by 2).map(i => (i, ("novel drifted vocabulary burst " * 3).trim,
        if (i < 8) "src0" else "srcX")))
    val hit = TextAnalysis.dsirDrift(drifted).collect().head
    assert(hit.getBoolean(4) && hit.getLong(1) >= 200000L && hit.getLong(3) > 0L,
      s"vocabulary shift must alarm: $hit")
  }

  test("tokenizerFertility: merge-friendly source lands lower fertility than unseen-vocabulary source; totals conserve") {
    import spark.implicits._
    // source A: one word repeated -> BPE learns its merges, few
    // subwords per word; source B: long words sharing no bigrams with
    // the learned merges -> near character-level segmentation
    val docs = Seq(
      (1L, ("spark " * 40).trim, "A"), (2L, ("spark " * 40).trim, "A"),
      (3L, "xylophonic qwertzuiop bvcxymnkj dfghjklqw", "B"),
      (4L, "", "B") // letterless doc: zero words, chars still counted
    ).map { case (id, t, s) => (id, t, s, t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")
    val m = TextAnalysis.tokenizerFertility(docs, 12).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(m.keySet == Set("A", "B"))
    assert(m("A")._1 == 80L && m("B")._1 == 4L, s"word totals conserve: $m")
    val fertA = m("A")._4; val fertB = m("B")._4
    assert(fertA < fertB, s"merge-friendly A must beat unseen-vocab B: $m")
    assert(fertA >= 1000000L, "fertility is >= 1 subword per word")
    // chars-per-subword moves the other way
    assert(m("A")._5 > m("B")._5, s"A's subwords cover more chars: $m")
  }

  test("mixTemperature: alpha<1 boosts low-resource sources; alpha=1 keeps raw shares; shares conserve; partitioning-invariant") {
    import spark.implicits._
    // 90/9/1 token split across three sources
    def doc(src: String, words: Int) = (src.hashCode.toLong, ("w " * words).trim, src)
    val docs = Seq(doc("big", 900), doc("mid", 90), doc("small", 10))
      .toDF("doc_id", "text", "source")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val m = asMap(TextAnalysis.mixTemperature(docs, alpha = 0.3))
    assert(m("big")._1 == 900L && m("small")._1 == 10L)
    // flattening: small boosted above parity, big damped below
    assert(m("small")._4 > 1000000L && m("big")._4 < 1000000L, s"got $m")
    // temperature preserves the ordering but compresses the ratios
    assert(m("big")._3 > m("mid")._3 && m("mid")._3 > m("small")._3)
    val rawRatio = m("big")._2.toDouble / m("small")._2
    val tempRatio = m("big")._3.toDouble / m("small")._3
    assert(tempRatio < rawRatio / 2, s"alpha=0.3 must compress 90:1 sharply, got $tempRatio vs $rawRatio")
    // shares are distributions (up to ppm flooring)
    assert(math.abs(m.values.map(_._2).sum - 1000000L) <= 3)
    assert(math.abs(m.values.map(_._3).sum - 1000000L) <= 3)
    // alpha = 1: temperature share == raw share (identical flooring path)
    val id = asMap(TextAnalysis.mixTemperature(docs, alpha = 1.0))
    id.values.foreach { case (_, raw, temp, _) =>
      assert(math.abs(raw - temp) <= 2, s"alpha=1 drifted: $id") }
    // alpha = 0: equal shares regardless of size
    val eq = asMap(TextAnalysis.mixTemperature(docs, alpha = 0.0))
    assert(eq.values.map(_._3).toSet.size == 1, s"alpha=0 must equalize: $eq")
    // integer-micros weights: partitioning cannot drift anything
    assert(asMap(TextAnalysis.mixTemperature(docs.repartition(7), alpha = 0.3)) == m)
  }

  test("dsirWeights: target-like pool docs outweigh off-domain ones; weights exact under partitioning; sample tracks the weights") {
    import spark.implicits._
    // target domain (src0): medical-ish vocabulary; pool: one doc
    // speaking the target's language, many speaking another
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    val target = (1L to 8L).map(i =>
      (i, rep("dose patient trial clinical symptom", 6), "src0"))
    val mimic = Seq((100L, rep("dose patient trial clinical symptom", 6), "srcX"))
    val offDomain = (101L to 120L).map(i =>
      (i, rep("engine torque piston valve exhaust", 6), "srcX"))
    val empty = Seq((200L, "12345 67890", "srcX")) // no [a-z] tokens at all
    val docs = (target ++ mimic ++ offDomain ++ empty)
      .toDF("doc_id", "text", "source")
    val w = TextAnalysis.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(w.keySet == (Seq(100L, 200L) ++ (101L to 120L)).toSet,
      "one weight row per POOL doc, target excluded")
    val (_, wMimic) = w(100L)
    assert((101L to 120L).forall(i => w(i)._2 < wMimic),
      s"mimic doc must outweigh every off-domain doc: $w")
    assert(wMimic > 0L && w(101L)._2 < 0L,
      "log ratios: target-like positive, off-domain negative")
    assert(w(200L) == ((0L, 0L)), "featureless doc is selection-neutral")
    // exact integer weights: partitioning cannot drift them
    val reparted = TextAnalysis.dsirWeights(docs.repartition(11)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(reparted == w)
    // resampling: with this weight separation (millions of micros vs
    // Gumbel noise ~1e6) the mimic doc must always be drawn first
    val smp = TextAnalysis.dsirSample(docs, k = 5).collect()
    assert(smp.length == 5 && smp.map(_.getLong(5)).toSeq == (1L to 5L))
    assert(smp.head.getLong(0) == 100L,
      s"mimic doc must rank first, got ${smp.head}")
    assert(smp.forall(r => !(1L to 8L).contains(r.getLong(0))),
      "sample never draws target docs")
  }

  test("langSpans: planted code-switching doc segments into en/de/en spans; merge, boundaries, und fallback pinned") {
    import spark.implicits._
    val en = "the cat and the dog of the house is that"  // 10 words, en stopwords
    val de = "der hund und die katze ist von dem haus ein" // 10 words, de stopwords
    val docs = Seq(
      (1L, s"$en $de $en"),          // 30 words -> 3 windows of 10: en, de, en
      (2L, s"$en $en $de"),          // adjacent en windows MERGE into one span
      (3L, "xyz qrs tuv")).toDF("doc_id", "text") // no stopwords -> und
    val got = TextAnalysis.langSpans(docs, window = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (1L, 1L, "en", 0L, 0L, 1L), (1L, 2L, "de", 1L, 1L, 1L),
      (1L, 3L, "en", 2L, 2L, 1L),
      (2L, 1L, "en", 0L, 1L, 2L), (2L, 2L, "de", 2L, 2L, 1L),
      (3L, 1L, "und", 0L, 0L, 1L)), s"got $got")
    // real fixture: spans tile each doc exactly (start/end contiguous,
    // window counts sum to the doc's window count), no adjacent spans
    // share a language (else they'd have merged)
    val real = TextAnalysis.langSpans(Tables.documents(spark, SharedSpark.sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(real.nonEmpty)
    real.groupBy(_._1).foreach { case (doc, spans) =>
      val s = spans.sortBy(_._2)
      assert(s.head._4 == 0L, s"doc $doc spans don't start at window 0")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._5 + 1, s"doc $doc gap between spans $a $b")
          assert(a._3 != b._3, s"doc $doc unmerged adjacent spans $a $b")
        case _ =>
      }
      assert(s.forall(x => x._6 == x._5 - x._4 + 1), s"doc $doc window counts")
    }
  }

  test("phraseSearch: adjacency exact, repeated words handled, punctuation splits positions, counts and first_pos pinned") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),      // "alpha beta" twice
      (2L, "alpha, beta! gamma"),               // punctuation tokenizes away
      (3L, "beta alpha"),                       // reversed: no match
      (4L, "alpha alpha beta"),                 // overlapping starts
      (5L, "ALPHA Beta")).toDF("doc_id", "text")
    def got(phrase: String*) = TextAnalysis.phraseSearch(docs, phrase)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("alpha", "beta") == Map(
      1L -> ((2L, 1L)), 2L -> ((1L, 1L)), 4L -> ((1L, 2L)), 5L -> ((1L, 1L))),
      s"2-gram: ${got("alpha", "beta")}")
    // repeated-word phrase: "alpha alpha" matches only doc 4
    assert(got("alpha", "alpha") == Map(4L -> ((1L, 1L))),
      s"repeated-word: ${got("alpha", "alpha")}")
    // 3-gram spans the whole doc
    assert(got("alpha", "beta", "gamma") == Map(
      1L -> ((1L, 1L)), 2L -> ((1L, 1L))),
      s"3-gram: ${got("alpha", "beta", "gamma")}")
    // real fixture: nonzero hits for the registered phrase
    val real = TextAnalysis.phraseSearch(
      Tables.documents(spark, SharedSpark.sf), Seq("fast", "table")).collect()
    assert(real.nonEmpty && real.forall(_.getLong(1) >= 1L))
  }

  test("hybridRrf: both-arm doc beats single-arm tops; fusion micros exact; missing-embedding doc fuses from lexical alone") {
    import spark.implicits._
    // lexical: doc 2 matches two query terms (rank 1), doc 9 one
    // (rank 2); dense vs query vec 0: vec 2 closest, then 5, 7, 9
    val docs = Seq(
      (2L, "spark window"), (5L, "alpha beta"),
      (7L, "gamma delta"), (9L, "spark")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f, 0f)),
      (5L, Seq(0.7f, 0.3f, 0f, 0f)), (7L, Seq(0f, 1f, 0f, 0f)),
      (9L, Seq(-1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = TextAnalysis.hybridRrf(docs, embs, Seq("spark", "window", "vector"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // 10^6 DIV (60 + rank): rank 1 -> 16393, 2 -> 16129, 3 -> 15873,
    // 4 -> 15625. Doc 2 (both arms, rank 1+1) = 32786; doc 9 (lex 2 +
    // dense 4) = 31754 STILL beats every single-arm doc -- the RRF
    // property the operator exists for.
    assert(got == Seq(
      (2L, 1L, 1L, 32786L, 1L),
      (9L, 2L, 4L, 31754L, 2L),
      (5L, 0L, 2L, 16129L, 3L),
      (7L, 0L, 3L, 15873L, 4L)), s"got $got")
    // real fixture: every fused doc is in >=1 arm, ranks contiguous,
    // scores non-increasing; docs without embeddings (sf0.1) still
    // retrievable through the lexical arm
    val real = TextAnalysis.hybridRrf(Tables.documents(spark, SharedSpark.sf),
      Tables.embeddings(spark, SharedSpark.sf), Seq("spark", "window", "vector"))
      .collect()
    assert(real.nonEmpty && real.length <= 20)
    assert(real.map(_.getLong(4)).toSeq == (1L to real.length).toSeq)
    assert(real.forall(r => r.getLong(1) > 0 || r.getLong(2) > 0))
    val scores = real.sortBy(_.getLong(4)).map(_.getLong(3)).toSeq
    assert(scores == scores.sortBy(-_))
  }
}
