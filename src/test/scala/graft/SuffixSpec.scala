package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Suffix

/** Prefix-doubling duplication profile (SURVEY §2.3): rank equality
  * must equal exact window equality at every dyadic length — the
  * oracle here is an independent local substring-grouping brute
  * force (a different algorithm agreeing on every integer).
  */
class SuffixSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def brute(docs: Seq[(Long, String)],
                    lengths: Seq[Int]): Map[Long, (Long, Long, Long, Long, Long)] =
    lengths.map { l =>
      val wins = docs.flatMap { case (id, t) =>
        (0 to t.length - l).map(i => (id, t.substring(i, i + l)))
      }
      val dup = wins.groupBy(_._2).filter(_._2.size > 1)
      val nWindows = wins.size.toLong
      val dupPos = dup.valuesIterator.map(_.size.toLong).sum
      val ppm = if (nWindows == 0L) 0L else dupPos * 1000000L / nWindows
      l.toLong -> ((nWindows, dupPos, dup.size.toLong,
        dup.valuesIterator.flatten.map(_._1).toSet.size.toLong, ppm))
    }.toMap

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("dupMassProfile matches the brute force on a planted corpus (self-overlaps included)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaaaa"),            // overlapping self-repeats at every length
      (2L, "the quick brown fox jumps"),
      (3L, "the quick brown cat jumps"), // shares long prefixes with doc 2
      (4L, "zzz"),                   // shorter than the longer probes
      (5L, ""))                      // empty doc must not contribute phantom windows
    val lengths = Seq(2, 4, 8, 16)
    val got = asMap(Suffix.dupMassProfile(docs.toDF("doc_id", "text"), lengths))
    assert(got == brute(docs, lengths), s"got $got")
    // sanity anchors computed by hand: "aaaaaaaaaa" alone duplicates
    // its length-8 window at positions 0,1,2 (3 positions, 1 content)
    assert(got(8L)._2 >= 3L && got(8L)._3 >= 1L)
  }

  test("dupMassProfile matches the brute force on the real corpus") {
    val docs = Tables.documents(spark, SharedSpark.sf)
    val local = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val lengths = Seq(8, 32)
    assert(asMap(Suffix.dupMassProfile(docs, lengths)) == brute(local, lengths))
  }

  test("early exit: a duplicate-free round zeroes all longer lengths, n_windows stays exact") {
    import spark.implicits._
    // globally unique characters -> no duplicated window at ANY length >= 2,
    // so round 1 already exhausts and lengths 4/8 never run
    val docs = Seq((1L, "abcd"), (2L, "efgh"), (3L, "ijklm"))
    val got = asMap(Suffix.dupMassProfile(docs.toDF("doc_id", "text"), Seq(2, 4, 8)))
    assert(got == brute(docs, Seq(2, 4, 8)))
    assert(got(2L)._2 == 0L && got(8L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(got(4L)._1 == (1L + 1L + 2L), "n_windows must come from doc lengths even on skipped rounds")
  }

  test("spanLengthElect: cheapest length within budget wins; no fit falls back to the longest probe") {
    import spark.implicits._
    // half the corpus is one repeated phrase -> short windows are
    // heavily duplicated, long windows are not: the election must
    // walk past the over-budget short lengths
    val phrase = "lorem ipsum dolor sit amet consectetur"
    val docs = (1L to 6L).map(i => (i, phrase)) ++
      (7L to 12L).map(i => (i, s"unique${i}a content${i}b words${i}c tail${i}d padding${i}e"))
    val df = docs.toDF("doc_id", "text")
    val prof = asMap(Suffix.dupMassProfile(df, Seq(4, 8, 16, 32)))
    val budget = 300000L
    val expectFit = Seq(4L, 8L, 16L, 32L).filter(l => prof(l)._5 <= budget)
    val elect = Suffix.spanLengthElect(df, Seq(4, 8, 16, 32), budget).collect()
    assert(elect.length == 1)
    val r = elect.head
    if (expectFit.nonEmpty) {
      assert(r.getLong(0) == expectFit.min && !r.getBoolean(1),
        s"elected ${r.getLong(0)}, profile $prof")
    } else assert(r.getLong(0) == 32L && r.getBoolean(1))
    assert(r.getLong(2) == budget && r.getLong(3) == prof(r.getLong(0))._5)
    // an impossible budget forces the conservative fallback
    val fb = Suffix.spanLengthElect(df, Seq(4, 8), maxDupPpm = -1L).collect().head
    assert(fb.getLong(0) == 8L && fb.getBoolean(1))
    // the duplicated phrase IS over budget at short lengths on this
    // corpus — make sure the test exercises the walk, not just rank 0
    assert(prof(4L)._5 > budget, s"fixture no longer stresses the election: $prof")
  }

  test("partitioning invariance and empty corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab ababab"), (2L, "ab abab ba"), (3L, "baba abab"))
    val lengths = Seq(2, 4)
    val one = asMap(Suffix.dupMassProfile(docs.toDF("doc_id", "text"), lengths))
    val many = asMap(Suffix.dupMassProfile(
      docs.toDF("doc_id", "text").repartition(7), lengths))
    assert(one == many && one == brute(docs, lengths))
    val empty = docs.toDF("doc_id", "text").filter(org.apache.spark.sql.functions.lit(false))
    val emptyGot = asMap(Suffix.dupMassProfile(empty, Seq(8, 16)))
    assert(emptyGot == Map(8L -> ((0L, 0L, 0L, 0L, 0L)), 16L -> ((0L, 0L, 0L, 0L, 0L))))
  }
}
