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

  test("phash bands are partitioning-invariant and within 16-bit range") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val a = Multimodal.phashBands(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Multimodal.phashBands(docs.repartition(11)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    assert(a.values.forall(bs => bs.size == 4 && bs.forall(v => v >= 0 && v < 65536)))
  }
}
