package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  lazy val docs = Tables.documents(spark, SharedSpark.sf)

  test("metadata: byte length and md5 consistent with the text payload") {
    import spark.implicits._
    val df = Seq((1L, "abc", "s")).toDF("doc_id", "text", "source")
    val r = Multimodal.metadata(df).head
    assert(r.getLong(r.fieldIndex("n_bytes")) == 3L)
    assert(r.getString(r.fieldIndex("payload_md5")) == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("features: fixed dim, deterministic, L1-normalized, one row per doc") {
    val f = Multimodal.features(docs, 16)
    val rows = f.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == 16)
      assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-3, "histogram L1-normalized")
    }
    // deterministic across runs
    val again = Multimodal.features(docs, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Float](1)))
  }

  test("decodeStub is a pure function of bytes") {
    val a = Multimodal.decodeStub("hello world".getBytes, 8)
    val b = Multimodal.decodeStub("hello world".getBytes, 8)
    val c = Multimodal.decodeStub("hello worle".getBytes, 8)
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("frameSample emits strided fixed-width slices") {
    import spark.implicits._
    val df = Seq((1L, "a" * 200, "s")).toDF("doc_id", "text", "source")
    val frames = Multimodal.frameSample(df, frameBytes = 32, stride = 2).collect()
    // 200/32 = 6 frames, strided by 2 -> indices 0,2,4
    assert(frames.map(_.getLong(1)).toSet == Set(0L, 2L, 4L))
    frames.foreach(r => assert(r.getAs[Array[Byte]](2).length == 32))
  }

  test("tilePlan: grid covers the fake dims exactly, edge tiles clipped, zero gaps") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 50 bytes -> w = 16+50%48 = 18, h = 16+(50/48)%48 = 17:
    // 3x3 tiles; last column width 2, last row height 1
    val df = Seq((1L, "x" * 50, "web")).toDF("doc_id", "text", "source")
    val tiles = graft.operators.Multimodal.tilePlan(df, 8).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(tiles.length === 9)
    // row 0 tiles: widths 8, 8, 2
    assert(tiles.filter(_._2 == 0L).sortBy(_._1).map(_._5).toSeq === Seq(8L, 8L, 2L))
    // col 0 tiles: heights 8, 8, 1
    assert(tiles.filter(_._1 == 0L).sortBy(_._2).map(_._6).toSeq === Seq(8L, 8L, 1L))
    // exact cover: sum of tile areas == w*h, and every tile positive
    assert(tiles.map(t => t._5 * t._6).sum === 18L * 17L)
    assert(tiles.forall(t => t._5 > 0 && t._6 > 0))
    // offsets are the tile grid
    assert(tiles.forall(t => t._3 == t._1 * 8 && t._4 == t._2 * 8))
  }

  test("phash: permutations collide at hamming 0, perturbations stay near, disjoint content far") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val df = Seq(
      (1L, base, "s"),
      (2L, base.split(' ').reverse.mkString(" "), "s"), // same multiset of chars*
      (3L, base + " zq", "s"),                           // tiny perturbation
      (4L, "0123456789" * 18, "s")                       // disjoint alphabet
    ).toDF("doc_id", "text", "source")
    // *reversal preserves the char multiset except it drops no chars:
    // same histogram => identical phash => hamming 0
    val pairs = Multimodal.phashNearDup(df, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L),
      s"histogram-equal docs must pair at hamming 0: $pairs")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L),
      s"disjoint-alphabet doc must not pair within 3 bits: $pairs")
    // the summary degree agrees with the pair list
    val deg = Multimodal.phashSummary(df).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val fromPairs = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (1L to 4L).foreach(id =>
      assert(deg(id) == fromPairs.getOrElse(id, 0L), s"degree mismatch for $id"))
  }

  test("phash band-df cap: over-cap buckets drop their pairs (conservative recall), under-cap pairs identical") {
    import spark.implicits._
    val base1 = "the quick brown fox jumps over the lazy dog " * 4
    val base2 = "0123456789" * 18
    // A/B/C share one histogram (permutations), D/E share another
    val df = Seq(
      (1L, base1, "s"),
      (2L, base1.split(' ').reverse.mkString(" "), "s"),
      (3L, base1.split(' ').sorted.mkString(" "), "s"),
      (4L, base2, "s"),
      (5L, base2.reverse, "s")
    ).toDF("doc_id", "text", "source")
    def pairSet(cap: Int) =
      Multimodal.phashNearDup(df, maxHamming = 3, maxBandDf = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped: both twin families pair up
    val uncapped = pairSet(1000)
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1L, 3L)) &&
      uncapped.contains((2L, 3L)) && uncapped.contains((4L, 5L)), s"got $uncapped")
    // cap = 2: the 3-doc family's buckets all hold 3 docs -> dropped
    // whole; the 2-doc family still collides in some band where its
    // value differs from the hot family's (phashes differ, asserted
    // by the uncapped hamming>3 separation), so (4,5) survives
    assert(pairSet(2) == Set((4L, 5L)),
      s"cap must drop exactly the over-cap family: ${pairSet(2)}")
    // the summary's degrees follow the same capped semantics
    val deg = Multimodal.phashSummary(df, maxBandDf = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(deg == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L), s"got $deg")
  }

  test("real decode: pngFromPayload is a genuine PNG, ImageIO round-trips it losslessly, undecodable payloads fall back to the stub") {
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val png = Multimodal.pngFromPayload(bytes)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte, "not a PNG")
    val Some((w, h, px)) = Multimodal.decodeImage(png)
    assert(w == 16 && h == 16 && px.length == 256)
    // lossless: decoded pixels are exactly the rendered histogram
    val hist = new Array[Long](256)
    bytes.foreach(b => hist(java.lang.Byte.toUnsignedInt(b)) += 1L)
    val mx = math.max(1L, hist.max)
    (0 until 256).foreach(i =>
      assert(px(i) == ((hist(i) * 255L) / mx).toInt, s"pixel $i lossy"))
    // a non-image payload is None -> stub fallback in the band frame
    assert(Multimodal.decodeImage(bytes).isEmpty)
    import spark.implicits._
    val mixed = Seq((1L, png), (2L, bytes)).toDF("doc_id", "payload")
    val bands = Multimodal.phashBandsDecoded(mixed).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val stub = Multimodal.phashBandsFromPayload(
        Seq((2L, bytes)).toDF("doc_id", "payload")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(2L) == stub(2L), "undecodable payload must take the stub path")
    // the decoded path's 4x16 bands reassemble the 64-bit DCT hash
    val hash = Multimodal.dctPhash64(w, h, px)
    val reassembled = (0 until 4).map(b => (hash >>> (b * 16)) & 0xffffL)
    assert(bands(1L) == reassembled)
  }

  test("decoded-path near-dup: identical renders pair at hamming 0, a perturbed render stays near, disjoint content far") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val df = Seq(
      (1L, base, "s"),
      (2L, base.split(' ').reverse.mkString(" "), "s"), // same histogram -> same PNG
      (3L, base + " zq", "s"),                          // tiny histogram perturbation
      (4L, "0123456789" * 18, "s")                      // disjoint alphabet
    ).toDF("doc_id", "text", "source")
    def hashOf(t: String) = {
      val Some((w, h, px)) = Multimodal.decodeImage(
        Multimodal.pngFromPayload(t.getBytes("UTF-8")))
      Multimodal.dctPhash64(w, h, px)
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hashOf(base) == hashOf(base.split(' ').reverse.mkString(" ")))
    val near = hamming(hashOf(base), hashOf(base + " zq"))
    val far = hamming(hashOf(base), hashOf("0123456789" * 18))
    assert(near <= 3, s"perturbation drifted $near bits")
    assert(far > 10, s"disjoint content only $far bits apart")
    // the full summary finds the planted twin through the band join
    val deg = Multimodal.phashSummaryDecoded(df).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(deg(1L) >= 1L && deg(2L) >= 1L,
      s"identical renders must pair: $deg")
    assert(deg(4L) == 0L, s"disjoint content must not pair: $deg")
    // determinism across invocations (StrictMath cosines)
    assert(hashOf(base) == hashOf(base))
  }

  test("phash bands are partitioning-invariant and within 16-bit range") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val a = Multimodal.phashBands(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Multimodal.phashBands(docs.repartition(11)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    assert(a.values.forall(bs => bs.size == 4 && bs.forall(v => v >= 0 && v < 65536)))
  }

  test("pairAudit: planted aligned / shifted / dead-link pairs land in match / conflict / orphan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ids chosen to hit each fixture rule exactly:
    //   5  -> % 23 == 5  -> media 1000005 (absent)       -> orphan
    //   3  -> % 17 == 3  -> media 4 (present, different) -> conflict
    //   1, 2, 4 -> self-paired                           -> match
    // 20 -> % 17 == 3 -> media 21 (absent: max id + 1)   -> orphan
    val texts = Map(
      1L -> "aaaa bbbb cccc dddd",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "completely different content with other letters",
      4L -> "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq",
      5L -> "some caption whose media link is dead",
      20L -> "shifted reference off the end of the corpus")
    val docs = texts.toSeq.map { case (id, t) =>
      (id, t, if (id <= 3) "web" else "books")
    }.toDF("doc_id", "text", "source")
    val out = Multimodal.pairAudit(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // web: ids 1, 2 match; 3 conflicts (paired with 4's very
    // different band signature)
    assert(out("web") == ((3L, 2L, 1L, 0L)), s"web got ${out("web")}")
    // books: 4 matches; 5 and 20 orphan
    assert(out("books") == ((3L, 1L, 0L, 2L)), s"books got ${out("books")}")
    // fixture rules are the declared residue arithmetic
    val pf = Multimodal.pairFixture(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pf == Map(1L -> 1L, 2L -> 2L, 3L -> 4L, 4L -> 4L,
      5L -> 1000005L, 20L -> 21L))
    // full-fixture sanity: every source row's counts add up
    val full = Multimodal.pairAudit(Tables.documents(spark, SharedSpark.sf))
    assert(full.filter(col("n_pairs") =!=
      col("n_match") + col("n_conflict") + col("n_orphan")).isEmpty)
  }

  test("decoded-phash hash gate: the distributed pipeline over the planted corpus equals the plain-Scala local twin, and the gate is non-vacuous (the reversal pair near-dups)") {
    import spark.implicits._
    val twin = Multimodal.phashDecodedLocalTwin(Multimodal.phashPlantedCorpus)
      .map { case (id, bs, n) => (id, bs.toList, n) }.sortBy(_._1)
    // non-vacuity: doc 2 is doc 1's reversal — identical byte
    // histogram, identical PNG, hamming 0 — so the twin MUST pair them
    val byId = twin.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == byId(2L)._2, "reversal pair lost hash equality")
    assert(byId(1L)._3 >= 1L && byId(2L)._3 >= 1L,
      s"gate is vacuous: no near-dups in the planted corpus ($twin)")
    val spark2 = spark
    val distributed = Multimodal.phashSummaryDecoded(
        Multimodal.phashPlantedCorpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0),
        List(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getLong(5)))
      .toList.sortBy(_._1)
    assert(distributed == twin,
      "distributed decoded pipeline diverged from the local twin")
  }
}
