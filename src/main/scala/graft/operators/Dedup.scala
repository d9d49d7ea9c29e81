package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (SURVEY §2.3),
  * over the `documents` table.
  *
  * Scale design: none of these ever forms an O(n²) cross product.
  * Candidate pairs come only from equality joins on content keys
  * (exact hash, shared shingle, LSH band bucket), so the shuffle is
  * bounded by actual collisions; exact verification runs per
  * candidate pair.
  */
object Dedup {

  /** Whitespace-normalized, lowercased content. */
  private[operators] def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** The exact-dedup identity: md5 of normalized content. Shared by
    * [[exact]] and the cleaning pipeline so the key (and its SQL
    * oracle twin) is defined once.
    */
  def contentHash(text: Column): Column = md5(normalized(text))

  /** Exact dedup: md5 of normalized content → keep the smallest
    * doc_id per group. One shuffle on the hash; md5 hex is identical
    * across engines so this is fully SQL-checkable.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), contentHash(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per document: (doc_id, shingle). */
  def wordShingles(documents: DataFrame, n: Int = 3): DataFrame =
    documents
      .select(col("doc_id"),
        split(trim(normalized(col("text"))), "\\s+").as("ws"))
      .select(col("doc_id"),
        explode(expr(s"array_distinct(transform(sequence(1, greatest(size(ws) - ${n - 1}, 1)), " +
          s"i -> array_join(slice(ws, i, $n), ' ')))")).as("shingle"))

  /** Exact n-gram Jaccard over candidate pairs that share ≥1 shingle.
    * The shared-shingle equality join bounds candidates; set sizes
    * come from a pre-aggregated per-doc count. SQL-expressible, so
    * fully oracle-checked.
    */
  def ngramJaccard(documents: DataFrame, n: Int = 3, minJaccard: Double = 0.2): DataFrame = {
    val sh = wordShingles(documents, n)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shared = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    val j = col("shared").cast("double") /
      (col("ca.n_sh") + col("cb.n_sh") - col("shared"))
    shared
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
  }

  /** MinHash signatures: k seeded min-hashes over the doc's shingle
    * set. `xxhash64(shingle, seed_i)` gives k independent-enough hash
    * families entirely inside codegen (no UDF).
    */
  def minhashSignatures(documents: DataFrame, n: Int = 3, k: Int = 32): DataFrame = {
    val sh = wordShingles(documents, n)
    val mins = (0 until k).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"mh_$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: signatures → b bands of r rows →
    * band-bucket equality self-join → exact Jaccard verification of
    * the candidates only. At 100 TB the only shuffles are the
    * signature aggregation and the band-key join; no pair is ever
    * formed except via a bucket collision.
    */
  def minhashLsh(documents: DataFrame, n: Int = 3, k: Int = 32, bands: Int = 8,
                 minJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = minhashSignatures(documents, n, k)
    val bandCols = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(documents, candidates, n, minJaccard)
  }

  /** Exact Jaccard for given candidate pairs, via per-doc distinct
    * shingle-hash sets (array_intersect on bounded per-doc arrays).
    */
  private def verifyJaccard(documents: DataFrame, candidates: DataFrame, n: Int,
                            minJaccard: Double): DataFrame = {
    val sets = wordShingles(documents, n)
      .groupBy("doc_id")
      .agg(collect_set(xxhash64(col("shingle"))).as("sh_set"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val j = inter / (size(col("sa")) + size(col("sb")) - inter)
    candidates
      .join(sets.select(col("doc_id"), col("sh_set").as("sa")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh_set").as("sb")), col("doc_b") === col("doc_id"))
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
  }

  /** Connected components over near-dup pairs: the transitive-closure
    * step of dedup (if A~B and B~C, keep ONE of {A,B,C}). Iterative
    * min-label propagation — each round every node takes the min
    * component id among itself and its neighbors; converges in
    * O(graph diameter) rounds. This is the standard distributed CC
    * (GraphFrames/Pregel shape): per round one join + one aggregate,
    * labels cached, previous iteration unpersisted.
    *
    * Output: (doc_id, component_id = min doc_id in the component) for
    * every doc that appears in at least one pair.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .cache()
    // min-propagation strictly decreases the label sum until the
    // fixpoint, so convergence is a scalar checksum, not a join;
    // coalesce(0) keeps the empty-graph case total (sum of no rows is null)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val viaNeighbors = edges
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src"))
        .agg(min(col("comp")).as("n_comp"))
      val next = labels
        .join(viaNeighbors, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("n_comp"), col("comp"))).as("comp"))
        .cache()
      val newSum = labelSum(next)
      converged = newSum == prevSum
      prevSum = newSum
      labels.unpersist()
      labels = next
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("comp").as("component_id"))
  }

  /** Apply near-dup dedup to the corpus: drop every doc whose
    * component id is not itself (the canonical member is the min
    * doc_id per component, so exactly one survivor per cluster;
    * docs in no cluster survive untouched). left_anti against the
    * small non-canonical set — no row multiplication.
    */
  def applyNearDupDedup(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val dropList = connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as("drop_id"))
    documents
      .join(dropList, col("doc_id") === col("drop_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
  }

  /** 64-bit SimHash per document: each token's hash votes ±1 on each
    * bit, weighted by its in-doc count; bit i of the simhash is 1 iff
    * the vote sum is positive. All 64 bit-votes are codegen'd sums in
    * ONE aggregation pass (no UDF, no per-bit shuffle).
    */
  def simhash(documents: DataFrame): DataFrame = {
    // Vote per token OCCURRENCE (sum of ±1 ≡ count-weighted voting),
    // so one exploded pass + ONE aggregation — no (doc, word) count
    // pre-shuffle. Map-side partial aggregation carries 64 longs per
    // (partition, doc), not per token.
    val words = documents
      .select(col("doc_id"),
        explode(split(trim(normalized(col("text"))), "\\s+")).as("word"))
      .withColumn("h", xxhash64(col("word")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v_$i")
    }
    val bits = (0 until 64).map(i =>
      when(col(s"v_$i") > 0, expr(s"CAST(1 AS BIGINT) << $i")).otherwise(lit(0L)))
    words
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: 4 bands of 16 bits — any pair within
    * Hamming distance ≤3 must agree exactly on ≥1 band (pigeonhole),
    * so the band equality join finds all of them without O(n²).
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(documents)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
