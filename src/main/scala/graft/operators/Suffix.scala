package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Suffix-sorting machinery (SURVEY §2.3): distributed PREFIX
  * DOUBLING (Manber-Myers 1990 / the standard MPC suffix-array round
  * structure) re-expressed as Spark joins — the exact-substring
  * family member for LONG match lengths, where the fixed-window
  * spans operator ([[Dedup.duplicatedSpans]]) pays O(corpus · L)
  * re-hashing per probed length L and this pays one bootstrap pass
  * plus log₂(Lmax/Lmin) numeric rounds over a table that SHRINKS to
  * the duplication frontier.
  *
  * Core invariant: at window length L each surviving (doc, pos)
  * carries a label such that label equality ⟺ the L-char windows are
  * IDENTICAL — bootstrapped from exact substring grouping at the
  * smallest probed length, extended by exact label-pair grouping (no
  * hashing anywhere), so results are hash-exact against a direct
  * substring-grouping oracle (a genuinely different algorithm
  * agreeing on every integer — the q_triangles oracle philosophy).
  * Downstream only ever tests label EQUALITY, so the label needs no
  * global order: it is the group's minimum position code
  * (doc_id·2³² + pos — the leftmost occurrence, a suffix-automaton
  *-style canonical representative), computed INSIDE the grouping
  * aggregate. One shuffle per round, no rank-sort phase at all.
  *
  * The scale levers, all exactness-preserving:
  * - A duplicated 2L-window forces BOTH its L-halves duplicated, so
  *   positions with a unique label drop out after every round — all
  *   instances of a duplicated pair have duplicated halves, so
  *   surviving multiplicities are unchanged and nothing is missed.
  *   The table after each round is the duplicated-window set, not
  *   the corpus.
  * - The label table broadcasts back to positions while it fits the
  *   executor budget (`broadcastKeyLimit`), making the join-back
  *   shuffle-free; past the limit it degrades to a plain shuffle
  *   join — never a correctness change.
  */
object Suffix {

  /** One grouping round: label `df`'s `keyCols` classes by their
    * minimum position code, returning (labeled positions,
    * n_dup_positions, n_dup_windows, n_keys). The class stats ride
    * the same single aggregate pass. */
  private def labelRound(df: DataFrame, keyCols: Seq[String],
                         outCols: Seq[String],
                         broadcastKeyLimit: Long): (DataFrame, Long, Long, DataFrame) = {
    val grp = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        min(col("doc_id") * lit(1L << 32) + col("pos")).as("rank"))
      .localCheckpoint(true)
    val s = grp.agg(
      count(lit(1)).as("k"),
      coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("p"),
      coalesce(sum(when(col("cnt") > 1, 1L).otherwise(0L)), lit(0L)).as("w")).head()
    val (nKeys, dupPos, dupWin) = (s.getLong(0), s.getLong(1), s.getLong(2))
    val keyTable = if (nKeys <= broadcastKeyLimit) broadcast(grp) else grp
    val joined = df.join(keyTable, keyCols)
      .select((outCols ++ Seq("rank", "cnt")).map(col): _*)
    // `joined` still reads grp's checkpoint blocks — the caller frees
    // the returned handle only after materializing its successor
    (joined, dupPos, dupWin, grp)
  }

  /** Duplication mass by match length (the `dedup_suffix_profile`
    * entry): for each dyadic length L, how many character positions
    * start a window occurring ≥2 times anywhere in the corpus
    * (self-overlaps included — the Lee et al. counting), how many
    * distinct window contents are duplicated, how many docs are
    * touched, and the duplicated-position mass in ppm. This is the
    * profile a pipeline reads BEFORE committing to a span-cut
    * length: pick the L where the mass falls off the cliff.
    *
    * Bootstrap groups the corpus's Lmin-char windows by exact
    * substring (the ONLY string shuffle — every later round moves
    * longs); each doubling round is one co-keyed self-join (the
    * pos+L shift) + one label grouping over the DUP-FILTERED table,
    * with per-round localCheckpoint + free (the 26b lineage lesson).
    * EARLY EXIT: the first duplicate-free length zeroes every longer
    * length without running it; n_windows comes from doc lengths
    * alone (Σ max(len−L+1, 0)), so skipped rounds' rows stay exact.
    */
  def dupMassProfile(documents: DataFrame,
                     lengths: Seq[Int] = Seq(8, 16, 32, 64, 128, 256),
                     broadcastKeyLimit: Long = 4000000L): DataFrame = {
    val probed = probedLengths(lengths)
    val minLen = probed.min
    // n_windows per probed length and the position-code budget, one
    // tiny aggregate over doc lengths
    val docLens = documents.select(col("doc_id"),
      length(col("text")).cast("long").as("len"))
    val (nWindows, _) = windowBudget(docLens, probed)
    // bootstrap: exact Lmin-char windows (sequence+substr — the
    // fingerprint idiom; split-on-empty-pattern emits a leading
    // empty string and sequence(0, n<0) counts down, hence the shape)
    val windows = Checkpoints.cpuSplit(documents
        .filter(length(col("text")) >= minLen))
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, char_length(text) - $minLen), " +
          s"i -> substr(text, i + 1, $minLen))")).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("win"))
    profileFromWindows(documents.sparkSession, windows, nWindows, probed,
      broadcastKeyLimit)
  }

  private[graft] def probedLengths(lengths: Seq[Int]): Seq[Int] = {
    require(lengths.nonEmpty && lengths.forall(l => l >= 2 && (l & (l - 1)) == 0),
      s"lengths must be powers of two >= 2, got $lengths")
    lengths.distinct.sorted
  }

  /** n_windows per probed length (Σ max(len−L+1, 0)) and the position
    * -code budget check, one tiny aggregate over (doc_id, len) rows —
    * shared by the batch operator (lengths from `documents`) and the
    * streamed face (lengths from its maintained doc_lens store). */
  private[graft] def windowBudget(docLens: DataFrame,
                                  probed: Seq[Int]): (Map[Int, Long], Long) = {
    val aggs = probed.map(l =>
      sum(greatest(col("len") - lit(l.toLong) + 1L, lit(0L))).as(s"w$l"))
    val r = docLens.agg(coalesce(max(col("doc_id")), lit(0L)).as("m"), aggs: _*).head()
    val nWindows = probed.zipWithIndex.map { case (l, i) =>
      l -> (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
    }.toMap
    val maxDocId = r.getLong(0)
    require(maxDocId >= 0L && maxDocId < (1L << 31),
      s"position code doc_id*2^32+pos needs doc_id < 2^31, got $maxDocId")
    (nWindows, maxDocId)
  }

  /** The doubling core over an already-materialized Lmin-window table
    * (doc_id, pos, win) — the batch operator explodes `documents`
    * into it per run; the streamed face maintains it as bucketed
    * state and starts HERE at resolve, never re-scanning the corpus.
    * Both faces therefore run the identical exact-integer rounds and
    * share one oracle. The window table is materialized once: both
    * the label grouping and the join-back read it, and re-running the
    * explode costs more than storing ~(Lmin + 16) bytes per position. */
  private[graft] def profileFromWindows(spark: org.apache.spark.sql.SparkSession,
                                        windows0: DataFrame,
                                        nWindows: Map[Int, Long],
                                        probed: Seq[Int],
                                        broadcastKeyLimit: Long = 4000000L): DataFrame = {
    val minLen = probed.min
    val maxLen = probed.max
    val windows = windows0.localCheckpoint(true)
    val (labeled0, dupPos0, dupWin0, grp0) =
      labelRound(windows, Seq("win"), Seq("doc_id", "pos"), broadcastKeyLimit)
    val stats = scala.collection.mutable.Map.empty[Int, (Long, Long, Long)]
    // pin doc_id hash partitioning ONCE: every round's (doc_id, pos)
    // self-join is then exchange-free (HashPartitioning on a subset
    // of the join keys co-locates), the broadcast join-back preserves
    // it, and the per-length doc-distinct counts reuse it — the only
    // per-round shuffle left is the label groupBy
    var cur = labeled0.filter(col("cnt") > 1)
      .select(col("doc_id"), col("pos"), col("rank"))
      .repartition(col("doc_id"))
      .localCheckpoint(true)
    Checkpoints.free(grp0)
    Checkpoints.free(windows)
    stats(minLen) = (dupPos0, dupWin0,
      if (dupWin0 == 0L) 0L else cur.select(col("doc_id")).distinct().count())
    var winLen = minLen
    var exhausted = dupWin0 == 0L
    while (winLen < maxLen) {
      val half = winLen
      winLen *= 2
      if (!exhausted) {
        val a = cur.select(col("doc_id"), col("pos"), col("rank").as("r1"))
        val b = cur.select(col("doc_id"), (col("pos") - lit(half.toLong)).as("pos"),
          col("rank").as("r2"))
        val (labeled, dupPos, dupWin, grp) =
          labelRound(a.join(b, Seq("doc_id", "pos")), Seq("r1", "r2"),
            Seq("doc_id", "pos"), broadcastKeyLimit)
        val next = labeled.filter(col("cnt") > 1)
          .select(col("doc_id"), col("pos"), col("rank")).localCheckpoint(true)
        Checkpoints.free(grp)
        Checkpoints.free(cur)
        cur = next
        if (dupWin == 0L) exhausted = true
        if (probed.contains(winLen)) {
          stats(winLen) = (dupPos, dupWin,
            if (dupWin == 0L) 0L else cur.select(col("doc_id")).distinct().count())
        }
      } else if (probed.contains(winLen)) stats(winLen) = (0L, 0L, 0L)
    }
    Checkpoints.free(cur)
    val rows = probed.map { l =>
      val (dupPos, dupWin, nDocs) = stats.getOrElse(l, (0L, 0L, 0L))
      val nw = nWindows(l)
      val ppm = if (nw == 0L) 0L else dupPos * 1000000L / nw
      org.apache.spark.sql.Row(l.toLong, nw, dupPos, dupWin, nDocs, ppm)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(
        Seq("match_len", "n_windows", "n_dup_positions", "n_dup_windows",
          "n_docs_touched", "dup_mass_ppm").map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Span-cut length ELECTION over [[dupMassProfile]] — the
    * operating-point read the profile exists for: the SMALLEST
    * probed length whose duplicated-position mass is within
    * `maxDupPpm` (shorter cuts catch more duplication but cost more
    * re-cleaning; the election takes the cheapest length whose
    * residual duplication a pipeline has budgeted for), falling back
    * to the LONGEST probed length when no length fits the budget
    * (`fallback=true` — the most conservative cut, and the signal to
    * widen the probe set). One row out: the elected length's profile
    * columns plus the verdict flags. Driver arithmetic is O(lengths);
    * all the work is the profile itself.
    */
  def spanLengthElect(documents: DataFrame,
                      lengths: Seq[Int] = Seq(8, 16, 32, 64, 128, 256),
                      maxDupPpm: Long = 100000L): DataFrame =
    electFromProfile(dupMassProfile(documents, lengths), maxDupPpm)

  /** The election alone, over an already-computed profile — the
    * SparkEntry wiring memoizes one profile per corpus and runs this
    * on top (the sim_ann_opq train-once shape: the chain is priced by
    * the profile entry, the election prices its own read path). */
  def electFromProfile(profile: DataFrame, maxDupPpm: Long): DataFrame = {
    val verdict = profile.agg(
      min(when(col("dup_mass_ppm") <= maxDupPpm, col("match_len"))).as("fit"),
      coalesce(max(col("match_len")), lit(0L)).as("longest"))
      .select(coalesce(col("fit"), col("longest")).as("elected_len"),
        col("fit").isNull.as("fallback"))
    profile.join(broadcast(verdict),
        col("match_len") === col("elected_len"))
      .select(col("elected_len"), col("fallback"),
        lit(maxDupPpm).as("budget_ppm"), col("dup_mass_ppm"),
        col("n_dup_positions"), col("n_windows"))
  }
}
