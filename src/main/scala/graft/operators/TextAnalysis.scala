package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (SURVEY §2.5),
  * over the `documents` table.
  *
  * Everything here is pure `functions._` — whole-stage codegen'd
  * scalar expressions over one scan, no shuffle at all (per-document
  * results) or one bounded shuffle (corpus aggregates). That is the
  * 100 TB shape: these ops stream through the corpus at scan speed.
  */
object TextAnalysis {

  /** Stopword regexes per language; scores are whole-word match
    * counts. Tiny fixed lists — the point is the engine shape
    * (codegen'd regex count + argmax), not linguistic accuracy.
    */
  val StopwordPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|for|with|was)\\b",
    "es" -> "\\b(el|la|de|que|y|los|las|un|una|por)\\b",
    "de" -> "\\b(der|die|und|das|ist|von|mit|den|des|ein)\\b",
    "fr" -> "\\b(le|la|et|les|des|une|dans|est|pour|que)\\b")

  private def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** The language-ID argmax as a single scalar Column over a text
    * column — usable inline in any scan (no join needed to attach a
    * language to a row). First language in fixed order wins ties.
    */
  def langPred(text: Column): Column = {
    val scores = StopwordPatterns.map { case (lang, pat) => lang -> matchCount(text, pat) }
    val langs = scores.map(_._1)
    scores.foldRight(lit("und"): Column) { case ((lang, s), rest) =>
      val isMax = scores.filter(_._1 != lang).map(o => s >= o._2).reduce(_ && _)
      when(s > 0 && isMax, lit(lang)).otherwise(rest)
    }
  }

  /** Language ID: per-language stopword hit counts + deterministic
    * argmax (first language in fixed order wins ties).
    */
  def languageId(documents: DataFrame): DataFrame = {
    val scoreCols = StopwordPatterns.map { case (lang, pat) =>
      matchCount(col("text"), pat).as(s"s_$lang")
    }
    documents.select(
      col("doc_id") +: scoreCols :+ langPred(col("text")).as("lang_pred"): _*)
  }

  /** Language-ID evaluation against the corpus's ground-truth `lang`
    * column: the (truth, prediction) confusion counts. Zero joins —
    * the prediction is the same inline scalar [[langPred]], so this
    * is one scan + one tiny aggregate at any corpus size. (Languages
    * with no stopword list — e.g. zh here — land in 'und', which the
    * confusion table makes visible instead of hiding in an accuracy
    * scalar.)
    */
  def languageIdEval(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), langPred(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /** Gopher-style quality RULE VERDICTS (Rae et al. 2021, public
    * literature — the "document filters" a pretraining pipeline
    * applies before any model-based scoring): one boolean per rule
    * plus the conjunction `keep`. Where [[qualityScore]] reports raw
    * ratios for a human to threshold, this is the thresholded
    * drop/keep decision itself, with the supporting counts retained
    * for auditability.
    *
    * Every rule is EXACT INTEGER arithmetic — ratios are expressed as
    * cross-multiplied comparisons (`3·n_words ≤ tot_chars` instead of
    * `tot_chars/n_words ≥ 3`), so there is no float division for
    * engines to disagree on and the DuckDB oracle must match
    * flag-for-flag. Rules (thresholds tuned to this fixture's short
    * synthetic docs; the shape is Gopher's):
    *   f_len         word count within [minWords, maxWords]
    *   f_word_len    mean word length within [3, 10] chars
    *   f_stop        ≥ 2 DISTINCT stopwords from the standard list
    *   f_top_unigram most frequent word ≤ 30% of all words
    *   f_dup         duplicate-token fraction ≤ 50%
    *
    * Plan: one explode + (doc, word) count + per-doc aggregate — two
    * shuffles both keyed on doc_id, output one row per document.
    * At 100 TB the explode is the token stream a tokenizer pass reads
    * anyway; nothing here is corpus-quadratic or collects.
    */
  def gopherFlags(documents: DataFrame,
                  minWords: Long = 20L, maxWords: Long = 2000L): DataFrame = {
    val stop = Seq("the", "and", "of", "to", "in", "is", "that", "for",
      "with", "was")
    val words = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
    val wc = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val st = wc.groupBy("doc_id").agg(
      sum(col("c")).as("n_words"),
      sum(length(col("w")).cast("long") * col("c")).as("tot_chars"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("max_cnt"),
      count_distinct(when(col("w").isInCollection(stop), col("w"))).as("n_stop"))
    val fLen = col("n_words") >= minWords && col("n_words") <= maxWords
    val fWordLen = lit(3L) * col("n_words") <= col("tot_chars") &&
      col("tot_chars") <= lit(10L) * col("n_words")
    val fStop = col("n_stop") >= 2L
    val fTop = lit(10L) * col("max_cnt") <= lit(3L) * col("n_words")
    val fDup = lit(2L) * (col("n_words") - col("n_distinct")) <= col("n_words")
    st.select(col("doc_id"), col("n_words"), col("tot_chars"),
      col("n_distinct"), col("max_cnt"), col("n_stop"),
      fLen.as("f_len"), fWordLen.as("f_word_len"), fStop.as("f_stop"),
      fTop.as("f_top_unigram"), fDup.as("f_dup"),
      (fLen && fWordLen && fStop && fTop && fDup).as("keep"))
  }

  /** Top-k co-occurring word pairs (document-level): how often two
    * distinct words appear in the SAME document — the phrase-mining /
    * collocation primitive (counts are the integer numerator of PMI;
    * the log-scoring layer is a reader's choice, kept out so the
    * result stays engine-exact).
    *
    * Scale shape: the pair generator self-joins the distinct
    * (doc, word) set ON doc_id, so fan-out per doc is C(words, 2) —
    * bounded by document length, never corpus size (the
    * coPurchaseEdges argument). Top-k by (count DESC, w1, w2) is a
    * TakeOrderedAndProject — per-partition heads merged on the
    * driver, never a global sort of the pair space.
    */
  def cooccurrence(documents: DataFrame, k: Int = 20): DataFrame = {
    val dw = documents
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct()
    val a = dw.as("a")
    val b = dw.as("b")
    a.join(b, col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Quality scoring: length, punctuation density, stopword ratio,
    * alphabetic ratio — the standard cheap pre-filters before
    * expensive pipeline stages. All ratios are exact-int divisions
    * rounded to 4 (bit-identical across engines).
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("long")
    val nWords = size(split(trim(col("text")), "\\s+")).cast("long")
    val nPunct = matchCount(col("text"), "[.,!?;:]")
    val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long")
    val nStop = matchCount(col("text"), StopwordPatterns.head._2)
    documents.select(
      col("doc_id"),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      nPunct.as("n_punct"),
      round(nAlpha.cast("double") / nChars, 4).as("alpha_ratio"),
      round(nStop.cast("double") / nWords, 4).as("stopword_ratio"),
      round(nChars.cast("double") / nWords, 4).as("mean_word_len"))
  }

  /** Token counting: whitespace tokens and a BPE-ish lexer count
    * (letter runs / digit runs / single other non-space), per doc and
    * with a corpus total the pipeline budgets against.
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_ws_tokens"),
      matchCount(col("text"), "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]").as("n_bpe_tokens"))

  /** Corpus-level token budget (single bounded aggregate). */
  def corpusTokenTotals(documents: DataFrame): DataFrame =
    tokenCounts(documents).agg(
      sum(col("n_ws_tokens")).as("total_ws_tokens"),
      sum(col("n_bpe_tokens")).as("total_bpe_tokens"),
      count(lit(1)).as("n_docs"))

  /** Temperature-based source mixing (the mT5/XLM-R α-sampling rule,
    * Xue et al. 2021 §3.2 / Conneau et al. 2020 §3.1): resample
    * sources with probability ∝ share^α so low-resource sources are
    * upweighted (α<1 flattens the mix; α=1 keeps raw shares, α=0
    * equalizes). The read a pretraining mix does right after the
    * per-source token budget exists.
    *
    * Output per source: whitespace-token count, raw share (ppm),
    * temperature share (ppm), and the boost ratio (temp/raw, ppm) a
    * sampler applies. Determinism: each source's pow(share, α) floors
    * to integer MICROS before the normalizing sum (the 33j
    * discipline — a float sum over sources would drift with
    * aggregation order), and every later step is integer floor
    * division, so the entry hash-checks in SQL. One token aggregate
    * (map-side combined) + driver-size arithmetic over |sources|
    * rows; the corpus is read once.
    */
  def mixTemperature(documents: DataFrame, alpha: Double = 0.3): DataFrame =
    mixTemperatureFromCounts(perSourceTokenCounts(documents), alpha)

  /** The one aggregate [[mixTemperature]] runs over the corpus —
    * also the per-batch DELTA of its streamed face (token counts
    * merge by exact sum, order-independent). */
  def perSourceTokenCounts(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("t"))
      .groupBy("source").agg(sum(col("t")).as("n_tokens"))

  /** Temperature arithmetic over an existing per-source count table —
    * shared by the batch entry and the streamed face's resolve, so
    * the two cannot drift. */
  def mixTemperatureFromCounts(perSource: DataFrame, alpha: Double = 0.3): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    val total = perSource.agg(sum(col("n_tokens")).as("total"))
    val shared = perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"), col("total"),
        floor(pow(col("n_tokens").cast("double") / col("total").cast("double"),
          lit(alpha)) * lit(1e6) + lit(0.5)).cast("long").as("wm"))
    val wsum = shared.agg(sum(col("wm")).as("wsum"))
    shared.crossJoin(broadcast(wsum))
      .select(col("source"), col("n_tokens"),
        expr("(n_tokens * 1000000L) div total").as("share_ppm"),
        expr("(wm * 1000000L) div wsum").as("temp_share_ppm"))
      .withColumn("boost_ppm",
        when(col("share_ppm") === 0L, lit(0L))
          .otherwise(expr("(temp_share_ppm * 1000000L) div share_ppm")))
  }

  /** Deterministic train/validation split by content-stable hash:
    * the assignment depends only on doc_id, so it is reproducible
    * across runs, engines, and repartitions — the property a held-out
    * split must have at 100 TB (no RNG state, no sampling drift).
    * First md5 byte < 0x29 → "valid" (~16%).
    */
  def trainValidSplit(documents: DataFrame, validHexThreshold: String = "29"): DataFrame =
    documents.select(
      col("doc_id"),
      when(substring(md5(col("doc_id").cast("string")), 1, 2) < validHexThreshold, lit("valid"))
        .otherwise(lit("train")).as("split"))

  /** Split-drift monitor: the exact Kolmogorov-Smirnov distance
    * between the train and valid empirical distributions of a per-doc
    * integer statistic (word count here) — the pre-flight that
    * catches a content-hash split accidentally correlating with
    * document length. EXACT INTEGER arithmetic throughout: the KS
    * sup-gap is computed as `max |cumT·Nv − cumV·Nt|` (cross-
    * multiplied, no float CDFs) and reported both raw and as
    * parts-per-million of Nt·Nv — bit-identical across engines.
    *
    * Plan shape: the per-doc stat is one scan; counts per (split,
    * value) are one map-side-combined aggregate whose size is
    * bounded by DISTINCT STAT VALUES (hundreds), not docs; the CDF
    * window runs over that bounded table — a global window over a
    * provably small input, not over the corpus. One summary row.
    */
  def splitDrift(documents: DataFrame,
                 validHexThreshold: String = "29"): DataFrame = {
    val stat = documents.select(
      when(substring(md5(col("doc_id").cast("string")), 1, 2) < validHexThreshold,
        lit("valid")).otherwise(lit("train")).as("split"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("x"))
    val counts = stat.groupBy("x").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("ct"),
      sum(when(col("split") === "valid", 1L).otherwise(0L)).as("cv"))
    val W = org.apache.spark.sql.expressions.Window
    val wCdf = W.orderBy(col("x")).rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.orderBy(col("x"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    counts
      .withColumn("cumT", sum(col("ct")).over(wCdf))
      .withColumn("cumV", sum(col("cv")).over(wCdf))
      .withColumn("nT", sum(col("ct")).over(wAll))
      .withColumn("nV", sum(col("cv")).over(wAll))
      .agg(
        coalesce(max(col("nT")), lit(0L)).as("n_train"),
        coalesce(max(col("nV")), lit(0L)).as("n_valid"),
        coalesce(max(abs(col("cumT") * col("nV") - col("cumV") * col("nT"))),
          lit(0L)).as("d_raw"))
      .select(col("n_train"), col("n_valid"), col("d_raw"),
        when(col("n_train") * col("n_valid") === 0L, lit(0L))
          .otherwise(expr("d_raw * 1000000 div (n_train * n_valid)"))
          .as("d_ppm"))
  }

  /** Per-source (source, value) window counts for the drift alarm:
    * reference window = even doc_id, current = odd (deterministic
    * stand-ins for yesterday's / today's partitions), value =
    * n_chars. Bounded by sources × distinct values, map-side
    * combined — the mergeable delta shape the streamed face appends
    * per batch. */
  private[graft] def sourceDriftCounts(documents: DataFrame): DataFrame =
    documents.select(col("source"),
        (col("doc_id") % 2 === 0).as("is_ref"),
        col("n_chars").cast("long").as("x"))
      .groupBy("source", "x").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cc"))

  /** [[splitDrift]]'s KS machinery from a (source, x, cr, cc) count
    * table — shared by the batch alarm and the streamed resolve so
    * the two cannot drift (the r10 harmonic-roll-up lesson). Exact
    * integer cross-multiplied sup-gap; the CDF window runs over the
    * bounded count table, never the corpus. Spark 4's ANSI mode
    * makes the d_raw·10⁶ product fail loud if a window ever exceeds
    * the ~3M-docs-per-source Long budget — at that scale pre-bucket
    * x (the KLL/histogram path) before the KS. */
  private[graft] def sourceDriftFromCounts(counts: DataFrame,
                                           thresholdPpm: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCdf = W.partitionBy("source").orderBy(col("x"))
      .rowsBetween(W.unboundedPreceding, 0)
    val wAll = W.partitionBy("source").orderBy(col("x"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    counts
      .withColumn("cumR", sum(col("cr")).over(wCdf))
      .withColumn("cumC", sum(col("cc")).over(wCdf))
      .withColumn("nR", sum(col("cr")).over(wAll))
      .withColumn("nC", sum(col("cc")).over(wAll))
      .groupBy("source")
      .agg(max(col("nR")).as("n_ref"), max(col("nC")).as("n_cur"),
        max(abs(col("cumR") * col("nC") - col("cumC") * col("nR"))).as("d_raw"))
      .select(col("source"), col("n_ref"), col("n_cur"), col("d_raw"),
        when(col("n_ref") * col("n_cur") === 0L, lit(1000000L))
          .otherwise(expr("d_raw * 1000000 div (n_ref * n_cur)")).as("ks_ppm"))
      .withColumn("alarm", col("ks_ppm") >= thresholdPpm)
  }

  /** Per-source drift alarms (`ta_source_drift`): the exact-integer
    * KS distance of [[splitDrift]], computed PER SOURCE between the
    * reference and current windows over the n_chars distribution,
    * with an alarm flag at the ppm threshold. This is the retrain
    * CADENCE signal (the 37n cellStats story for text): a source
    * whose arriving data no longer matches the distribution the
    * quality filter was calibrated on is the source that should
    * trigger a retrain — and the hot-swap face
    * (`stream_quality_hotswap`) is the cut-over mechanism the alarm
    * feeds. An empty window reports maximal drift (10⁶ ppm): a
    * source that stopped (or just started) sending IS an alarm, not
    * a divide-by-zero. */
  def sourceDriftAlarm(documents: DataFrame,
                       thresholdPpm: Long = 150000L): DataFrame =
    sourceDriftFromCounts(sourceDriftCounts(documents), thresholdPpm)

  /** TF-IDF top terms per document: tf · ln(N/df), one aggregation
    * for term frequencies, one bounded aggregation for document
    * frequencies (vocabulary-sized, broadcast back), top-k via
    * window.
    *
    * Oracle-parity design: ln() is not IEEE-pinned, so engines may
    * disagree by ~1 ulp — and real-equal scores from DIFFERENT
    * (tf, df) pairs exist (tf=1,N/df=100 vs tf=2,N/df=10), where a
    * 1-ulp flip would reorder ranks between engines. Ranking
    * therefore orders by the score ROUNDED to 6 decimals (absorbing
    * libm noise; a disagreement now needs a score within 1 ulp of a
    * .5×10⁻⁶ boundary — vanishing for these irrational values) with
    * the term as an exact tiebreak, and emits integer tf/df beside
    * the rounded score.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val toks = TextOps.tokens(documents)
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // df derives from tf (rows of tf ARE distinct (doc, word) pairs):
    // one tokenize+explode pass total, not two
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = documents.select(countDistinct(col("doc_id"))).head.getLong(0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(broadcast(df), "word")
      .withColumn("score", round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("word"), col("tf"), col("df"), col("score"),
        col("rk").cast("long").as("rk"))
  }

  /** PII/URL scrubbing: redact emails, URLs, and long digit runs —
    * the standard cheap sanitization pass before training. Pure
    * codegen regexp_replace chain; flags count what was redacted.
    */
  def scrub(documents: DataFrame): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val urlPat = "https?://[^\\s]+"
    val digitPat = "[0-9]{9,}"
    documents.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(urlPat), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(col("text"), lit(digitPat), lit(0))).cast("long").as("n_digit_runs"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), urlPat, "<URL>"),
          emailPat, "<EMAIL>"),
        digitPat, "<NUM>").as("scrubbed"))
  }

  /** Passage splitting: one row per fixed-size word window (stride =
    * window, i.e. non-overlapping) with its index — the doc→passage
    * explosion feeding embedding/indexing stages. posexplode keeps
    * the (doc, passage_idx) identity stable.
    */
  def passages(documents: DataFrame, wordsPerPassage: Int = 20): DataFrame =
    documents
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, (size(ws) - 1) div $wordsPerPassage), " +
            s"i -> array_join(slice(ws, i * $wordsPerPassage + 1, $wordsPerPassage), ' '))"))
          .as(Seq("passage_idx", "passage")))
      .select(col("doc_id"), col("passage_idx").cast("long").as("passage_idx"), col("passage"))

  /** Sliding-window chunking ([[passages]] with stride < window — the
    * RAG-retrieval shape, where adjacent chunks overlap so no answer
    * span is ever split across a boundary with no chunk containing
    * it). Chunk i covers words [i·stride, i·stride + window); starts
    * run 0, stride, 2·stride, … until the window reaches the tail, so
    * every word lands in ≥1 chunk and ceil(window/stride) is the
    * worst-case duplication factor (2× at the 20/10 default) — the
    * knob a 100 TB corpus budgets explicitly.
    *
    * Plan: a pure per-row transform+slice explosion — zero shuffles,
    * scales with input splits. Start count is 64-bit integer math
    * (`div`, wrapped in greatest(0,·) so the sub-window-doc case
    * agrees with the oracle's floor division exactly).
    */
  def slidingChunks(documents: DataFrame, window: Int = 20, stride: Int = 10): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    documents
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .select(col("doc_id"), size(col("ws")).as("nw"),
        posexplode(expr(
          s"transform(sequence(0, greatest(0, (size(ws) - $window + ${stride - 1}) div $stride)), " +
            s"i -> array_join(slice(ws, i * $stride + 1, $window), ' '))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"),
        least(lit(window), col("nw") - col("chunk_idx") * stride).cast("long").as("n_words"))
  }

  /** Context-window packing: assign docs (in stable doc_id order) to
    * training shards by cumulative token budget — shard = running
    * token total BEFORE this doc, integer-divided by the budget.
    *
    * NOT a global window (a partition-less window would funnel
    * everything through one task): two-phase distributed prefix sum —
    * range-partition by doc_id, sum tokens per partition, prefix the
    * tiny per-partition totals on the driver, then one partition-local
    * pass with the broadcast offsets. Semantics identical to the
    * sequential definition, so the SQL oracle is an exact check.
    */
  def packIntoShards(documents: DataFrame, tokensPerShard: Long = 2000L): DataFrame = {
    val nTokens = size(split(trim(col("text")), "\\s+")).cast("long")
    packSized(documents.select(col("doc_id").cast("long"), nTokens.as("n_tokens")),
      tokensPerShard)
  }

  /** [[packIntoShards]] with TOKEN-EXACT budgets: each doc's cost is
    * its [[bpeEncode]] subword count under the learned tokenizer, not
    * the whitespace proxy — what a context-window packer actually
    * spends. ONE doc_id join composes the two operators (zero-word
    * docs cost 0); the prefix-sum sharder is shared unchanged.
    */
  def packIntoShardsBpe(documents: DataFrame, tokensPerShard: Long = 2000L,
                        rounds: Int = 12): DataFrame = {
    val enc = bpeEncode(documents, rounds).select(col("doc_id"), col("n_subwords"))
    val sized = documents.select(col("doc_id").cast("long"))
      .join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_subwords"), lit(0L)).as("n_tokens"))
    packSized(sized, tokensPerShard)
  }

  /** [[packIntoShards]] with FERTILITY-CALIBRATED budgets: each doc's
    * cost is its letter-word count × its source's measured BPE
    * fertility ([[tokenizerFertility]]) — the scan-speed estimator a
    * 100 TB packer uses when encoding every document
    * ([[packIntoShardsBpe]]) is too expensive: the fertility table is
    * |sources| rows measured once (amortized over every later packing
    * run), and the per-doc cost is then a pure projection + one
    * broadcast join — no per-doc subword segmentation anywhere.
    * Integer estimate (w·fertility_ppm div 10⁶, unknown sources at
    * parity 10⁶), shared prefix-sum sharder; the accuracy story is
    * exactly fertility's: the estimate is unbiased per source by
    * construction and drifts only within-source.
    */
  def packIntoShardsFertility(documents: DataFrame, tokensPerShard: Long = 2000L,
                              rounds: Int = 12): DataFrame = {
    val fert = tokenizerFertility(documents, rounds)
      .select(col("source"), col("fertility_ppm"))
    val nWords = size(filter(split(col("text"), TextOps.TokenPattern),
      w => w =!= "")).cast("long")
    val sized = documents.select(col("doc_id").cast("long"), col("source"),
        nWords.as("w"))
      .join(broadcast(fert), Seq("source"), "left")
      .select(col("doc_id"),
        expr("(w * coalesce(fertility_ppm, 1000000L)) div 1000000L").as("n_tokens"))
    packSized(sized, tokensPerShard)
  }

  /** Shared prefix-sum sharder over (doc_id, n_tokens): global token
    * prefix sums without a single-partition window — per-partition
    * subtotals (one tiny driver collect) seed each partition's
    * running offset, so the scan stays fully parallel at any scale.
    */
  private def packSized(sized0: DataFrame, tokensPerShard: Long): DataFrame = {
    val spark = sized0.sparkSession
    import spark.implicits._
    val sized = sized0
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
    val perPartition = sized.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((idx, s))
      }
      .collect().sortBy(_._1)
    val offsets = perPartition.map(_._2).scanLeft(0L)(_ + _)
    sized.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var running = offsets(idx)
        it.map { case (id, n) =>
          val shard = running / tokensPerShard
          running += n
          (id, n, shard)
        }
      }
      .toDF("doc_id", "n_tokens", "shard")
  }

  /** Document fingerprint: minimum md5 over all k-char shingles (a
    * winnowing-style rolling fingerprint). md5 hex compares
    * identically across engines, so this one is exactly
    * SQL-checkable, unlike the seeded minhash signatures.
    */
  def fingerprint(documents: DataFrame, k: Int = 8): DataFrame =
    // greatest(..., 1): a doc shorter than k chars fingerprints its
    // whole text — without the clamp, Spark's sequence(1, n<1) counts
    // DOWN and hashes nonsense positions while the oracle returns NULL
    documents.select(
      col("doc_id"),
      expr(s"array_min(transform(sequence(1, greatest(char_length(text) - ${k - 1}, 1)), " +
        s"i -> md5(substr(text, i, $k))))").as("fingerprint"))

  /** Benchmark-contamination check: for every train document, the
    * fraction of its word-n-gram shingles that also appear in the
    * held-out eval set (here `doc_id % evalMod == 0` — a stand-in for
    * a real benchmark table, which would arrive as its own small
    * DataFrame).
    *
    * Scale design: the eval shingle vocabulary is BROADCAST (eval
    * sets are megabytes against a 100 TB corpus), so the train side
    * is ONE scan + one semi-join with no corpus shuffle; per-doc hit
    * counts aggregate with map-side combine, and set sizes come from
    * the zero-shuffle scalar projection. The 100 TB cost is one pass
    * over the corpus — the floor for any contamination audit.
    */
  def contamination(documents: DataFrame, evalMod: Int = 50, n: Int = 5): DataFrame = {
    val train = documents.filter(col("doc_id") % evalMod =!= 0)
    val evalDocs = documents.filter(col("doc_id") % evalMod === 0)
    val evalSh = Dedup.wordShingles(evalDocs, n).select("shingle").distinct()
    val hits = Dedup.wordShingles(train, n)
      .join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    Dedup.shingleSetSizes(train, n)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_sh"), 4)
          .as("contamination"))
  }

  /** Deterministic corpus shuffle: the reproducible global training
    * order every run must agree on (seeded hash of the doc id, unique
    * tiebreak). The sort is Spark's sample-based range-partitioned
    * orderBy — no single reducer ever holds the corpus — and the
    * dense 1-based rank comes from the same two-phase prefix-sum as
    * [[packIntoShards]]: per-partition counts → driver offsets (one
    * long per partition) → partition-local scan.
    */
  def shuffleOrder(documents: DataFrame, seed: String = "shuf"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val keyed = documents
      .select(col("doc_id"),
        md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))).as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id"))
      .as[(Long, String)]
    val perPartition = keyed.rdd
      .mapPartitionsWithIndex { (i, it) => Iterator((i, it.size)) }
      .collect().sortBy(_._1)
    val offsets = perPartition.map(_._2.toLong).scanLeft(1L)(_ + _)
    keyed.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var rank = offsets(i)
        it.map { case (id, key) => val out = (id, key, rank); rank += 1; out }
      }
      .toDF("doc_id", "shuffle_key", "shuffle_rank")
  }

  /** Unigram-LM surprisal score: mean −ln P(word) per token, with
    * P estimated from the corpus itself — the cheapest "how unusual
    * is this text" quality signal (high = rare-word soup / noise,
    * low = common-word boilerplate).
    *
    * Determinism design: each token's surprisal is fixed to integer
    * MICROS (floor(x·1e6 + 0.5)) before the per-doc sum, so the sum
    * is exact integer arithmetic — no float accumulation-order
    * dependence between Spark's partial aggregates and any oracle.
    * Scale: one token→frequency join (hash; broadcastable when the
    * vocabulary fits) and two map-side-combined aggregations. The
    * join key is the word itself, so stop words make it the most
    * skewed join in this library — AQE skew-join splitting (on in
    * GraftSession) splits those partitions at runtime, and the
    * broadcast variant removes the shuffle entirely when the
    * vocabulary fits the broadcast budget.
    */
  def surprisal(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), "[^A-Za-z]+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), lower(col("w")).as("word"))
    val freq = toks.groupBy("word").agg(count(lit(1)).as("wc"))
    val total = freq.agg(coalesce(sum(col("wc")), lit(0L)).as("n_total"))
    val scored = toks.join(freq, "word").crossJoin(total)
      .select(col("doc_id"),
        floor(log(col("n_total").cast("double") / col("wc").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("micros"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("micros")).as("sum_m"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_m").cast("double") / col("n_tokens").cast("double")
          / lit(1000000.0), 4).as("surprisal"))
  }

  /** Held-out bigram-LM surprisal with stupid backoff (Brants et al.
    * 2007) — the CCNet/KenLM "perplexity filter" shape at bigram
    * order: train counts on the TRAIN split ([[trainValidSplit]]'s
    * content-stable rule), score the VALID split. Scoring held-out
    * text is what keeps the backoff genuinely live (self-scoring
    * makes every bigram count ≥ 1 and the backoff dead code — the
    * trap [[surprisal]]'s unigram form does not have).
    *
    * Per-token surprisal: seen bigram → ln(c(prev)/c(prev,w)); unseen
    * bigram → backoff ln((N/c(w))/0.4); doc-first token → plain
    * unigram ln(N/c(w)); out-of-vocabulary words floor at c=1. Each
    * token's value fixes to integer MICROS before the per-doc sum
    * (the [[surprisal]] pattern) so reduction order cannot diverge
    * from the oracle.
    *
    * Scale: two map-side-combined count shuffles over train tokens
    * (unigrams, bigrams), then scoring joins on the token — the LM
    * tables are vocabulary-sized, the corpus is read once, and
    * nothing iterates.
    */
  def surprisalBigram(documents: DataFrame): DataFrame = {
    val isValid = substring(md5(col("doc_id").cast("string")), 1, 2) < "29"
    val ws = filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "")
    val docsW = documents.select(col("doc_id"), isValid.as("v"), ws.as("ws"))
      .filter(size(col("ws")) >= 1)
    val pairsArr = expr("transform(ws, (w, i) -> struct(w AS word, " +
      "CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE try_element_at(ws, i) END AS prev))")
    val toks = docsW.select(col("doc_id"), col("v"), explode(pairsArr).as("t"))
      .select(col("doc_id"), col("v"), col("t.word").as("word"), col("t.prev").as("prev"))
    val train = toks.filter(!col("v"))
    val uni = train.groupBy("word").agg(count(lit(1)).as("wc"))
    val total = uni.agg(coalesce(sum(col("wc")), lit(0L)).as("n_total"))
    val big = train.filter(col("prev").isNotNull)
      .groupBy("prev", "word").agg(count(lit(1)).as("bc"))
    val scoredToks = toks.filter(col("v"))
      .join(uni, Seq("word"), "left")
      .join(big, Seq("prev", "word"), "left")
      .join(uni.select(col("word").as("prev"), col("wc").as("pc")), Seq("prev"), "left")
      .crossJoin(total)
    val wc2 = coalesce(col("wc"), lit(1L)).cast("double")
    val micros = floor(
      when(col("prev").isNull, log(col("n_total").cast("double") / wc2))
        .when(col("bc").isNotNull,
          log(col("pc").cast("double") / col("bc").cast("double")))
        .otherwise(log(col("n_total").cast("double") / wc2 / lit(0.4)))
        * lit(1000000.0) + lit(0.5)).cast("long")
    scoredToks.select(col("doc_id"), micros.as("micros"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("micros")).as("sum_m"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_m").cast("double") / col("n_tokens").cast("double")
          / lit(1000000.0), 4).as("surprisal2"))
  }

  /** [[surprisalBigram]] at TRIGRAM order — the same held-out
    * train/score split and integer-micros discipline, with stupid
    * backoff chaining through two levels: seen trigram →
    * ln(c(p2,p1)/c(p2,p1,w)); unseen trigram but seen bigram →
    * 0.4 · bigram model; neither → 0.4² · unigram (OOV floors at
    * c=1); the first two tokens of a doc score at the orders their
    * context supports. One more map-side-combined count shuffle than
    * the bigram form (trigrams), LM tables still vocabulary-sized.
    */
  def surprisalTrigram(documents: DataFrame): DataFrame = {
    val isValid = substring(md5(col("doc_id").cast("string")), 1, 2) < "29"
    val ws = filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "")
    val docsW = documents.select(col("doc_id"), isValid.as("v"), ws.as("ws"))
      .filter(size(col("ws")) >= 1)
    val tripleArr = expr("transform(ws, (w, i) -> struct(w AS word, " +
      "CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE try_element_at(ws, i) END AS p1, " +
      "CASE WHEN i <= 1 THEN CAST(NULL AS STRING) ELSE try_element_at(ws, i - 1) END AS p2))")
    val toks = docsW.select(col("doc_id"), col("v"), explode(tripleArr).as("t"))
      .select(col("doc_id"), col("v"), col("t.word").as("word"),
        col("t.p1").as("p1"), col("t.p2").as("p2"))
    val train = toks.filter(!col("v"))
    val uni = train.groupBy("word").agg(count(lit(1)).as("wc"))
    val total = uni.agg(coalesce(sum(col("wc")), lit(0L)).as("n_total"))
    val big = train.filter(col("p1").isNotNull)
      .groupBy("p1", "word").agg(count(lit(1)).as("bc"))
    val tri = train.filter(col("p2").isNotNull)
      .groupBy("p2", "p1", "word").agg(count(lit(1)).as("tc"))
    val scoredToks = toks.filter(col("v"))
      .join(uni, Seq("word"), "left")
      .join(big, Seq("p1", "word"), "left")
      .join(tri, Seq("p2", "p1", "word"), "left")
      .join(uni.select(col("word").as("p1"), col("wc").as("pc1")), Seq("p1"), "left")
      .join(big.select(col("p1").as("p2"), col("word").as("p1"), col("bc").as("cc")),
        Seq("p2", "p1"), "left")
      .crossJoin(total)
    val wc2 = coalesce(col("wc"), lit(1L)).cast("double")
    val micros = floor(
      when(col("p1").isNull, log(col("n_total").cast("double") / wc2))
        .when(col("p2").isNull && col("bc").isNotNull,
          log(col("pc1").cast("double") / col("bc").cast("double")))
        .when(col("p2").isNull,
          log(col("n_total").cast("double") / wc2 / lit(0.4)))
        .when(col("tc").isNotNull,
          log(col("cc").cast("double") / col("tc").cast("double")))
        .when(col("bc").isNotNull,
          log(col("pc1").cast("double") / col("bc").cast("double") / lit(0.4)))
        .otherwise(log(col("n_total").cast("double") / wc2 / lit(0.16)))
        * lit(1000000.0) + lit(0.5)).cast("long")
    scoredToks.select(col("doc_id"), micros.as("micros"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("micros")).as("sum_m"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_m").cast("double") / col("n_tokens").cast("double")
          / lit(1000000.0), 4).as("surprisal3"))
  }

  /** Repetition statistics (the Gopher-style quality signals for
    * machine-generated/boilerplate text): duplicate-word fraction and
    * the most-frequent-bigram share per document.
    *
    * Scale design: the word stats are a scalar projection (zero
    * shuffle); the bigram mode needs a (doc_id, bigram) aggregation,
    * which Spark runs with map-side partial aggregation — the shuffle
    * carries one row per distinct (doc, bigram), bounded by document
    * length, and both aggregations partition by doc_id so the second
    * reuses the first's clustering.
    */
  def repetitionStats(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
    val scalar = toks.select(col("doc_id"),
      size(col("ws")).cast("long").as("n_words"),
      size(array_distinct(col("ws"))).cast("long").as("n_uniq_words"))
    // guard size >= 2: sequence(1, 0) counts DOWN in Spark, it is not empty
    val bigrams = toks.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("bigram"))
    val bigramStats = bigrams
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    scalar.join(bigramStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_uniq_words"),
        round(lit(1.0) - col("n_uniq_words").cast("double") / col("n_words"), 4)
          .as("dup_word_frac"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("top_bigram_n").cast("double") / col("n_bigrams")), 4)
          .as("top_bigram_frac"))
  }

  /** Per-source quota cap (the RefinedWeb/CCNet-style domain
    * balancing step): keep at most `cap` documents per source,
    * survivors picked by a content-stable md5 rank — reproducible
    * across runs, engines, and partitionings, no RNG state (the same
    * argument as [[trainValidSplit]]).
    *
    * Scale design: selection runs through the k-bounded
    * [[graft.functions.MinKPairAggregator]], so the shuffle carries
    * ≤cap entries per (partition, source) — NEVER the whole group.
    * That is the difference at 100 TB: a window row_number() plan
    * sorts every source's full row set in one task, and the one
    * giant source every web corpus has (the common-crawl bucket)
    * becomes a straggler; the bounded aggregator caps that task's
    * input at cap·numPartitions entries.
    *
    * Output: (doc_id, source, rk) for survivors, rk = 1-based rank in
    * md5 order — matching the SQL oracle's row_number() exactly.
    */
  def sourceCap(documents: DataFrame, cap: Int = 15): DataFrame = {
    val mink = udaf(new graft.functions.MinKPairAggregator(cap),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Long)]())
    documents
      .select(col("source"),
        md5(concat_ws(":", col("source"), col("doc_id").cast("string"))).as("h"),
        col("doc_id"))
      .groupBy(col("source"))
      .agg(mink(col("h"), col("doc_id")).as("kept"))
      .select(col("source"), posexplode(col("kept")).as(Seq("pos", "entry")))
      .select(col("entry._2").as("doc_id"), col("source"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Corpus n-gram language-model counts, top-k (the count table
    * behind [[surprisal]]-style scoring and n-gram contamination
    * checks, kept as its own operator because a real pipeline
    * materializes it once and reuses it).
    *
    * Scale design: one tokenize pass, map-side-combined count per
    * n-gram (the wordcount shuffle shape — bounded by distinct
    * n-grams, not corpus size), then `orderBy().limit(k)`, which
    * Spark plans as TakeOrderedAndProject: per-partition bounded
    * top-k merged on the driver, NOT a global sort. (count DESC,
    * ngram ASC) is a total order — ngrams are distinct — so ranks
    * are deterministic and the oracle can hash them.
    */
  def ngramLmCounts(documents: DataFrame, n: Int = 2, k: Int = 100): DataFrame = {
    require(n >= 2, "unigram counts are mr_wordcount; use n >= 2")
    val toks = documents.select(split(lower(trim(col("text"))), "\\s+").as("ws"))
    val parts = (0 until n).map(j => s"element_at(ws, CAST(i + $j AS INT))").mkString(", ")
    val ngrams = toks.filter(size(col("ws")) >= n)
      .select(explode(expr(
        s"transform(sequence(1, size(ws) - ${n - 1}), i -> concat_ws(' ', $parts))"))
        .as("ngram"))
    val counts = ngrams.groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)
    // rank the k survivors (tiny — the window runs over k rows)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("ngram").asc)
    counts.withColumn("rk", row_number().over(w).cast("long"))
  }

  /** BM25 top-k retrieval (Robertson-Spärck Jones / Okapi — public
    * formula) for a literal query-term set: the relevance-ranking
    * primitive behind "find training docs about X".
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Scale design: the corpus-wide pieces (dl per doc, N, avgdl) are
    * one token-count aggregation; the per-term pieces (tf, df) come
    * from a scan-stage `IN` filter on the literal term set — only
    * query-term postings ever shuffle, which is the scatter-gather a
    * search engine does, not a corpus-wide score of everything. df is
    * derived from tf (its rows ARE distinct (doc, term) pairs) and
    * broadcast. Final top-k is TakeOrderedAndProject (per-partition
    * bounded heads merged on the driver), never a global sort.
    *
    * Oracle-parity: per-(doc, term) weights are floored to integer
    * micros BEFORE the per-doc sum (the [[unigramSurprisal]] pattern)
    * so the sum is exact integer arithmetic in any reduction order;
    * ranking compares (micros, doc_id) — total order, engine-stable.
    */
  def bm25TopK(documents: DataFrame, queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty)
    val toks = TextOps.tokens(documents)
      .select(col("doc_id"), lower(col("word")).as("word"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"),
      coalesce(sum("dl"), lit(0L)).as("tot")).head()
    val nDocs = stats.getLong(0)
    val totDl = stats.getLong(1)
    val tf = toks.filter(col("word").isin(queryTerms: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    bm25ScorePostings(tf.join(dl, "doc_id"), nDocs, totDl, k, k1, b)
  }

  /** The BM25 scoring core shared by [[bm25TopK]] and the streamed
    * maintained-index face ([[graft.streaming.IngestStreams
    * .bm25Resolve]]): score query-term postings that already carry
    * their doc's length. `postings` = (doc_id, word, tf, dl) —
    * EXACTLY one row per (doc, query-term) pair; df is derived from
    * it (its rows ARE distinct pairs) and broadcast.
    *
    * Both faces floor per-(doc, term) weights to integer micros
    * BEFORE the per-doc sum, so the reduction is exact integer
    * arithmetic in any order and both hash-check against the same
    * oracle. avgdl is passed as the (n_docs, Σdl) pair rather than a
    * float so the maintained index can accumulate it as exact count
    * deltas. */
  private[graft] def bm25ScorePostings(postings: DataFrame, nDocs: Long,
                                       totDl: Long, k: Int,
                                       k1: Double = 1.2,
                                       b: Double = 0.75): DataFrame = {
    // empty corpus: every downstream frame is empty regardless of
    // avgdl; any finite value keeps the plan total
    val avgdl = if (nDocs == 0) 1.0 else totDl.toDouble / nDocs
    val df = postings.groupBy("word").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val weight = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = postings.join(broadcast(df), "word")
      .select(col("doc_id"),
        floor(weight * lit(1e6) + lit(0.5)).cast("long").as("w_micros"))
    val agg = scored.groupBy("doc_id")
      .agg(sum("w_micros").as("micros"), count(lit(1)).as("n_terms"))
    val top = agg.orderBy(col("micros").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("micros").desc, col("doc_id").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("n_terms"),
        round(col("micros") / lit(1e6), 6).as("score"), col("rk"))
  }

  /** Weighted sample without replacement (Efraimidis-Spirakis, IPL
    * 2006 — public algorithm): keep the k items with the largest
    * u^(1/w), where u is a per-item uniform and w its weight — each
    * item's inclusion probability is proportional to its weight.
    *
    * u derives from md5(seed:doc_id) (48 bits → (h+0.5)/2^48), NOT
    * `rand()`: the sample is a pure function of content, so it is
    * reproducible across retries/partitionings (the property
    * [[trainValidSplit]]/[[shuffleOrder]] already pin) and the DuckDB
    * oracle can recompute it exactly. The sort key is floored to
    * integer nanos so engine libm noise in pow() cannot flip a rank.
    *
    * Scale design: one scan, zero shuffles — the top-k is
    * TakeOrderedAndProject (bounded per-partition heads merged on the
    * driver). This is the one-pass distributed weighted reservoir: at
    * 100 TB the alternative "sum weights then second prefix pass"
    * costs two scans and a prefix-sum shuffle.
    */
  /** Sparse TF-IDF cosine document-pair similarity — the LEXICAL
    * complement of the dense embedding near-dup (§2.3 row 26): two
    * docs score high when they share discriminative vocabulary, with
    * no embedding model in the loop. Weights are integer micros
    * (tf · ⌊ln(N/df)·10⁶ + ½⌋ — the [[surprisal]] ln-micros pattern),
    * so dot products and norms are EXACT integer sums and the only
    * float ops are the final cast/√/divide — identical IEEE ops in
    * DuckDB, hence a hash-exact oracle for a cosine similarity.
    *
    * Scale shape: candidate pairs come ONLY from the df-capped
    * posting-list join on the word (the [[Dedup.ngramJaccard]]
    * candidate bound — a word shared by ≤ maxDf docs expands to
    * ≤ maxDf² pairs, and words commoner than that carry ~no idf
    * signal anyway); per-doc norms are one map-side-combined
    * aggregate. Products run in DECIMAL(38,0)/HUGEINT — w ≈ tf·14·10⁶
    * squares past 2⁶³ on long docs.
    */
  def tfidfCosinePairs(documents: DataFrame, minCosine: Double = 0.3,
                       maxDf: Int = 100): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), "[^A-Za-z]+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), lower(col("w")).as("word"))
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("word").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val nDocs = documents.agg(count(lit(1)).as("n"))
    val weighted = tf.join(dfTbl, "word").crossJoin(nDocs)
      .select(col("doc_id"), col("word"),
        (col("tf") * floor(log(col("n").cast("double") / col("df").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long")).as("w"))
    val norms = weighted.groupBy("doc_id")
      .agg(sum(col("w").cast(dec) * col("w").cast(dec)).as("n2"))
    val dots = weighted.as("a")
      .join(weighted.as("b"),
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w").cast(dec) * col("b.w").cast(dec)).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))), 6)
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Distributed BPE merge learning (Sennrich et al. 2016, the
    * tokenizer-training step of an LLM data pipeline): learn the
    * first `rounds` byte-pair merge rules over the corpus vocabulary.
    * Output: (merge_rank, left_sym, right_sym, pair_count) — the
    * merge table a tokenizer applies at encode time.
    *
    * The structure is the one that scales: the CORPUS is read exactly
    * once (the word-count shuffle [[TextOps.wordCount]] shares);
    * every BPE round then runs over the VOCABULARY table (word,
    * freq, current segmentation) — orders of magnitude smaller than
    * the corpus and independent of its size. Per round: adjacent-pair
    * counts (one map-side-combined shuffle over the vocab), the
    * arg-max pair via `orderBy().limit(1)` ⇒ TakeOrderedAndProject
    * (bounded per-partition top-1, one row to the driver — O(rounds)
    * driver data total, the sketch-algebra budget), then the merge is
    * applied as a PURE PROJECTION: an `aggregate()` fold over each
    * word's symbol array (leftmost-greedy non-overlapping, the
    * reference semantics) — zero shuffle, no corpus contact. Rounds
    * localCheckpoint + free ([[Checkpoints]]) so plan size and block
    * storage stay O(1) in round count.
    *
    * Semantics pinned to the reference implementation: pair counts
    * weight by word frequency and count OVERLAPPING adjacencies
    * ("aaa" contributes (a,a) twice); application is leftmost-greedy
    * non-overlapping ("aaa" → [aa, a]); ties break (count desc,
    * left asc, right asc) so the learned table is deterministic. No
    * end-of-word marker (merges act within [[TextOps.TokenPattern]]
    * words; the marker is a tokenizer-façade concern, orthogonal to
    * the engine shape). The DuckDB oracle re-learns the table with a
    * DIFFERENT merge-application algorithm (window-function run
    * parity instead of a fold) — rank-for-rank, count-for-count
    * agreement, the q_triangles oracle philosophy.
    */
  def bpeMerges(documents: DataFrame, rounds: Int = 12): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val (merges, seg) = bpeLearn(documents, rounds)
    Checkpoints.free(seg)
    merges.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /** The learned subword VOCABULARY with corpus frequencies: apply
    * the same `rounds` merges and count every surviving symbol
    * weighted by word frequency — the (symbol, corpus count) table a
    * tokenizer ships beside its merge rules, and the coverage check
    * that decides whether `rounds` was enough. Same cost shape as
    * [[bpeMerges]] plus ONE more map-side-combined shuffle over the
    * vocabulary.
    */
  def bpeVocab(documents: DataFrame, rounds: Int = 12): DataFrame = {
    val (_, seg) = bpeLearn(documents, rounds)
    seg.select(col("cnt"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum(col("cnt")).as("n"))
  }

  /** Per-document subword token counts under the learned merges —
    * the ENCODE face, and the number a context-budget packer actually
    * needs (how many tokens will this doc cost under OUR tokenizer,
    * not a whitespace proxy). One join of the corpus tokens against
    * the vocabulary-sized (word → segmentation length) table, one
    * doc_id aggregate; the corpus is read once beyond the learning
    * pass.
    */
  def bpeEncode(documents: DataFrame, rounds: Int = 12): DataFrame = {
    val (_, seg) = bpeLearn(documents, rounds)
    val segSizes = seg.select(col("word"), size(col("syms")).cast("long").as("n_sub"))
    TextOps.tokens(documents).join(segSizes, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
  }

  /** Tokenizer FERTILITY per source under the learned BPE: subwords
    * per word and characters per subword — the numbers that decide
    * whether a tokenizer fits a corpus (high fertility on one source
    * means its text costs disproportionate context budget; the read
    * behind "train until fertility ≤ x" sizing decisions). Pure
    * composition: [[bpeEncode]]'s per-doc counts roll up per source
    * with integer-ppm ratios, so the entry hash-checks through the
    * same unrolled-rounds oracle. Docs with no letter tokens count
    * zero words (coalesced, not dropped) so corpus totals conserve.
    */
  def tokenizerFertility(documents: DataFrame, rounds: Int = 12): DataFrame = {
    val enc = bpeEncode(documents, rounds)
    documents.select(col("doc_id"), col("source"), col("n_chars"))
      .join(enc, Seq("doc_id"), "left")
      .select(col("source"),
        coalesce(col("n_words"), lit(0L)).as("w"),
        coalesce(col("n_subwords"), lit(0L)).as("sw"),
        col("n_chars"))
      .groupBy("source")
      .agg(sum(col("w")).as("n_words"), sum(col("sw")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("fertility_ppm",
        when(col("n_words") === 0L, lit(0L))
          .otherwise(expr("(n_subwords * 1000000L) div n_words")))
      .withColumn("chars_per_subword_ppm",
        when(col("n_subwords") === 0L, lit(0L))
          .otherwise(expr("(n_chars * 1000000L) div n_subwords")))
  }

  /** [[bpeVocab]] under a VOCAB-SIZE STOPPING RULE instead of a fixed
    * round count — how tokenizers are actually sized ("train until
    * |vocab| = 32000"): learn merges until the distinct-symbol count
    * first reaches `targetVocab` (checked BEFORE any merge too — an
    * already-rich character inventory learns nothing), capped at
    * `maxRounds`. Merges are prefix-stable (round i's choice doesn't
    * depend on later rounds), so the learned state equals the
    * fixed-round state truncated at the stopping round — which is
    * what lets the oracle unroll `maxRounds` CTEs, compute each
    * round's vocab size, and SELECT the first qualifying round's
    * vocabulary. One extra vocabulary-sized distinct-count per round;
    * the corpus is still read once.
    */
  def bpeVocabUntil(documents: DataFrame, targetVocab: Long,
                    maxRounds: Int = 12): DataFrame = {
    val (_, seg) = bpeLearnUntil(documents, maxRounds, Some(targetVocab))
    seg.select(col("cnt"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum(col("cnt")).as("n"))
  }

  private def bpeLearn(documents: DataFrame,
                       rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) =
    bpeLearnUntil(documents, rounds, None)

  private def bpeLearnUntil(documents: DataFrame, rounds: Int,
                            targetVocab: Option[Long]): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val chars = expr(
      "transform(sequence(1, length(word)), i -> substring(word, CAST(i AS INT), 1))")
    var seg = TextOps.wordCount(documents)
      .select(col("word"), col("cnt"), chars.as("syms"))
      .localCheckpoint(true)
    // adjacent symbol pairs; try_element_at + filter so one-symbol
    // words emit nothing (sequence(1, 0) would count DOWN, the ANSI
    // trap shingleArraySql documents)
    val pairSql = "filter(transform(sequence(1, greatest(size(syms) - 1, 1)), " +
      "i -> struct(try_element_at(syms, CAST(i AS INT)) AS l, " +
      "try_element_at(syms, CAST(i + 1 AS INT)) AS r)), p -> p.r IS NOT NULL)"
    def mergeFold(l: String, r: String): Column = aggregate(
      col("syms"), typedlit(Seq.empty[String]),
      (acc, x) => when(
        size(acc) > lit(0) && try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    def vocabSize(): Long = seg.select(explode(col("syms")).as("s"))
      .agg(countDistinct(col("s"))).head().getLong(0)
    var r = 1
    var exhausted = targetVocab.exists(t => vocabSize() >= t)
    while (r <= rounds && !exhausted) {
      val best = seg
        .select(col("cnt"), explode(expr(pairSql)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val b = best(0)
        val (l, rt, c) = (b.getString(0), b.getString(1), b.getLong(2))
        out += ((r.toLong, l, rt, c))
        val superseded = seg
        seg = seg.select(col("word"), col("cnt"), mergeFold(l, rt).as("syms"))
          .localCheckpoint(true)
        Checkpoints.free(superseded)
        if (targetVocab.exists(t => vocabSize() >= t)) exhausted = true
      }
      r += 1
    }
    (out.toSeq, seg)
  }

  // ------------------------------------------------------------------
  // Hashed n-gram linear quality classifier (the fastText-style
  // scorer that pairs with the rule-based gopherFlags the way real
  // pretraining pipelines pair heuristics with a learned filter —
  // CCNet's fastText quality model lineage, see SURVEY §2.5).
  //
  // Split of labor: TRAINING is tiny (a planted labeled corpus, a
  // few dozen docs) and runs driver-side in pure deterministic Scala
  // — the model artifact is vocabulary-sized, exactly like the PQ
  // codebooks. SCORING is the 100 TB part: one tokenize pass over
  // the corpus, feature-hash into `dim` buckets, one BROADCAST join
  // against the weight table, one map-side-combined per-doc
  // aggregate — scan-speed, no wide shuffle anywhere.
  //
  // Determinism: weights ship as integer MICROS; a doc's feature-
  // weight sum is exact integer arithmetic (the surprisal pattern),
  // so partial-aggregation order cannot drift, and the md5-bucket
  // feature hash is expressible identically in Spark
  // (conv(substring(md5 ..))) and DuckDB (('0x' || substr(md5 ..))),
  // keeping the entry hash-exact end to end.
  // ------------------------------------------------------------------

  /** Feature-hash bucket — MUST stay in lockstep with
    * [[clfBucketLocal]] and the `ta_quality_clf` oracle SQL. */
  private def clfBucket(f: Column, dim: Int): Column =
    pmod(conv(substring(md5(f), 1, 12), 16, 10).cast("long"), lit(dim.toLong))

  /** Driver-side twin of [[clfBucket]] for the trainer. */
  private[graft] def clfBucketLocal(f: String, dim: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(6).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % dim
  }

  /** The classifier's feature set for one text: hashed unigrams and
    * bigrams over the same `[^a-z]+` lowercase tokenization every
    * text operator here uses. Driver-side twin of the scorer's
    * feature expressions. */
  private[graft] def clfFeatures(text: String): Seq[String] = {
    val ws = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    ws.map("u:" + _) ++
      ws.sliding(2).filter(_.size == 2).map(p => "b:" + p(0) + " " + p(1))
  }

  /** Deterministic logistic-regression trainer over hashed n-gram
    * features: plain SGD in fixed corpus order with length-normalized
    * term counts (z = b + Σ w_k·c_k/n). Pure JVM double arithmetic in
    * a pinned iteration order — retraining reproduces the artifact
    * bit-for-bit, which the spec asserts. Returns (nonzero weights by
    * bucket, bias). */
  def qualityClfTrain(corpus: Seq[(String, Boolean)], dim: Int = 4096,
                      epochs: Int = 60, lr: Double = 0.5): (Seq[(Long, Double)], Double) = {
    val feats = corpus.map { case (t, y) =>
      val fs = clfFeatures(t).map(clfBucketLocal(_, dim))
      val counts = fs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      (counts, fs.size.toDouble, if (y) 1.0 else 0.0)
    }
    val w = new Array[Double](dim)
    var b = 0.0
    var e = 0
    while (e < epochs) {
      feats.foreach { case (counts, nf, y) =>
        if (nf > 0) {
          var z = b
          counts.foreach { case (k, c) => z += w(k.toInt) * c / nf }
          val p = 1.0 / (1.0 + math.exp(-z))
          val g = p - y
          counts.foreach { case (k, c) => w(k.toInt) -= lr * g * c / nf }
          b -= lr * g
        }
      }
      e += 1
    }
    (w.iterator.zipWithIndex.collect { case (v, i) if v != 0.0 => (i.toLong, v) }.toSeq, b)
  }

  /** One doc's hashed-feature view: (sorted (bucket, count) pairs,
    * feature total, label as 0/1). Shared by every trainer face. */
  private def clfDocFeat(t: String, y: Boolean,
                         dim: Int): (Seq[(Long, Int)], Double, Double) = {
    val fs = clfFeatures(t).map(clfBucketLocal(_, dim))
    val counts = fs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    (counts, fs.size.toDouble, if (y) 1.0 else 0.0)
  }

  /** One doc's full-batch gradient contribution, floored to integer
    * MICROS per feature before any summation — the 33j surprisal
    * discipline. Longs sum exactly in any partitioning and reduction
    * order, which is what makes the distributed epoch bit-equal to
    * the local one. Returns (per-bucket grad micros, bias grad
    * micros). */
  private def clfGradMicros(doc: (Seq[(Long, Int)], Double, Double),
                            w: Array[Double], b: Double): (Seq[(Long, Long)], Long) = {
    val (counts, nf, y) = doc
    if (nf == 0) (Seq.empty, 0L)
    else {
      var z = b
      counts.foreach { case (k, c) => z += w(k.toInt) * c / nf }
      val p = 1.0 / (1.0 + math.exp(-z))
      val g = p - y
      (counts.map { case (k, c) =>
        (k, math.floor(g * c / nf * 1e6 + 0.5).toLong) },
        math.floor(g * 1e6 + 0.5).toLong)
    }
  }

  /** Apply one summed epoch gradient (exact Long micros) to (w, b) —
    * the single shared update rule for both full-batch faces. */
  private def clfApplyGrad(w: Array[Double], b: Double, lr: Double, nDocs: Long,
                           grad: collection.Map[Long, Long], gBias: Long): Double = {
    grad.foreach { case (k, m) =>
      w(k.toInt) -= lr * (m.toDouble / 1e6) / nDocs.toDouble
    }
    b - lr * (gBias.toDouble / 1e6) / nDocs.toDouble
  }

  /** FULL-BATCH local twin of [[qualityClfTrainDistributed]]: one
    * epoch = one exact whole-corpus gradient, per-doc contributions
    * micro-floored before the (exact, associative) Long sum. This is
    * the reference the distributed trainer must match bit-for-bit.
    * The SHIPPED `ta_quality_clf` artifact still comes from the SGD
    * [[qualityClfTrain]] (unchanged weights, unchanged oracle
    * hashes); this pair is the corpus-scale training path. */
  def qualityClfTrainFullLocal(corpus: Seq[(String, Boolean)], dim: Int = 4096,
                               epochs: Int = 40, lr: Double = 0.5): (Seq[(Long, Double)], Double) = {
    val feats = corpus.map { case (t, y) => clfDocFeat(t, y, dim) }
    val w = new Array[Double](dim)
    var b = 0.0
    val n = feats.size.toLong
    if (n == 0) return (Seq.empty, 0.0)
    var e = 0
    while (e < epochs) {
      val acc = scala.collection.mutable.LongMap.empty[Long]
      var gBias = 0L
      feats.foreach { d =>
        val (gs, gb) = clfGradMicros(d, w, b)
        gs.foreach { case (k, m) => acc(k) = acc.getOrElse(k, 0L) + m }
        gBias += gb
      }
      b = clfApplyGrad(w, b, lr, n, acc, gBias)
      e += 1
    }
    (w.iterator.zipWithIndex.collect { case (v, i) if v != 0.0 => (i.toLong, v) }.toSeq, b)
  }

  /** Distributed full-batch trainer over a (text, label) DataFrame —
    * the OPQ pattern (Similarity.opqTrain): features extract once and
    * persist; each epoch broadcasts (w, b), mapPartitions folds
    * per-partition gradient micros into a bounded map (≤ dim + 1
    * Longs per partition — model-sized, never row data), and the
    * driver reduces and applies the update. Because per-doc
    * contributions floor to micros BEFORE the sum, the epoch
    * gradient is a Long sum — exact under any partitioning — so the
    * result is BIT-EQUAL to [[qualityClfTrainFullLocal]] regardless
    * of parallelism (the spec asserts it at several partitionings).
    */
  def qualityClfTrainDistributed(docs: DataFrame, dim: Int = 4096,
                                 epochs: Int = 40, lr: Double = 0.5,
                                 textCol: String = "text",
                                 labelCol: String = "label"): (Seq[(Long, Double)], Double) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val featRdd = docs
      .select(col(textCol).cast("string"), col(labelCol).cast("boolean"))
      .as[(String, Boolean)].rdd
      .map { case (t, y) => clfDocFeat(t, y, dim) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = featRdd.count()
      if (n == 0) return (Seq.empty, 0.0)
      val w = new Array[Double](dim)
      var b = 0.0
      var e = 0
      while (e < epochs) {
        val bw = spark.sparkContext.broadcast((w.clone(), b))
        val (grad, gBias) = featRdd.mapPartitions { it =>
          val (wv, bv) = bw.value
          val acc = scala.collection.mutable.LongMap.empty[Long]
          var bm = 0L
          it.foreach { d =>
            val (gs, gb) = clfGradMicros(d, wv, bv)
            gs.foreach { case (k, m) => acc(k) = acc.getOrElse(k, 0L) + m }
            bm += gb
          }
          Iterator.single((acc.toMap, bm))
        }.reduce { (x, y) =>
          val merged = scala.collection.mutable.LongMap.empty[Long]
          x._1.foreach { case (k, v) => merged(k) = v }
          y._1.foreach { case (k, v) => merged(k) = merged.getOrElse(k, 0L) + v }
          (merged.toMap, x._2 + y._2)
        }
        bw.destroy()
        b = clfApplyGrad(w, b, lr, n, grad, gBias)
        e += 1
      }
      (w.iterator.zipWithIndex.collect { case (v, i) if v != 0.0 => (i.toLong, v) }.toSeq, b)
    } finally { featRdd.unpersist(); () }
  }

  /** Planted labeled corpus the shipped model trains on, drawn from
    * the fixture corpus's own register: "low quality" = filler-token
    * soup, "high quality" = operator-content prose. Seeded, so the
    * trained artifact is a pure function of this source file. */
  val clfPlantedCorpus: Seq[(String, Boolean)] = {
    val rnd = new scala.util.Random(20260814L)
    val filler = Vector("a", "the", "value", "row", "part", "key",
      "small", "slow", "dup", "the", "a", "value")
    val content = Vector("join", "merge", "window", "stream", "query",
      "agg", "group", "sort", "scan", "batch", "vector", "hash",
      "filter", "order", "column")
    def doc(words: Vector[String], n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val lows = Seq.fill(30)(doc(filler, 24) -> false)
    val highs = Seq.fill(30)(doc(content, 24) -> true)
    lows ++ highs
  }

  /** The shipped model: (weights in integer micros by bucket, bias
    * micros, dim). Computed once per JVM from [[clfPlantedCorpus]];
    * [[qualityClfSaveWeights]]/[[qualityClfLoadWeights]] are the
    * deployable-parquet faces (the pqSaveCodebook pattern). */
  lazy val qualityClfArtifact: (Seq[(Long, Long)], Long, Int) = {
    val dim = 4096
    val (ws, b) = qualityClfTrain(clfPlantedCorpus, dim)
    def micros(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    (ws.map { case (k, v) => (k, micros(v)) }.filter(_._2 != 0L), micros(b), dim)
  }

  /** Micros-quantized deployable form of a trained (weights, bias)
    * model — the [[qualityClfArtifact]] packaging rule, shared so
    * every trainer face ships identically. */
  def clfMicrosArtifact(model: (Seq[(Long, Double)], Double),
                        dim: Int): (Seq[(Long, Long)], Long, Int) = {
    def micros(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    (model._1.map { case (k, v) => (k, micros(v)) }.filter(_._2 != 0L),
      micros(model._2), dim)
  }

  /** The full-batch model in deployable micros form — the LOCAL
    * reference the `ta_quality_clf_full` oracle embeds; the driver
    * query trains DISTRIBUTED from the same planted corpus, so the
    * hash gate pins local/distributed bit-equality end-to-end. */
  lazy val qualityClfFullArtifact: (Seq[(Long, Long)], Long, Int) =
    clfMicrosArtifact(qualityClfTrainFullLocal(clfPlantedCorpus, 4096), 4096)

  /** Persist a trained weight table as (bucket, wm, bias, dim)
    * parquet — train once, deploy everywhere. A sentinel row
    * (bucket = -1, wm = 0) always rides along so bias and dim
    * survive a model whose nonzero-weight set is empty: real
    * buckets are non-negative, so the sentinel can never collide. */
  def qualityClfSaveWeights(artifact: (Seq[(Long, Long)], Long, Int),
                            path: String,
                            spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val (ws, bias, dim) = artifact
    ((-1L, 0L) +: ws).map { case (k, wm) => (k, wm, bias, dim) }
      .toDF("bucket", "wm", "bias", "dim")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a weight table saved by [[qualityClfSaveWeights]]: the
    * sentinel row carries bias/dim; everything else is weights. */
  def qualityClfLoadWeights(path: String,
                            spark: org.apache.spark.sql.SparkSession): (Seq[(Long, Long)], Long, Int) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("bucket"), col("wm"), col("bias"), col("dim"))
      .as[(Long, Long, Long, Int)].collect()
    val sentinel = rows.find(_._1 < 0L).getOrElse(throw new IllegalStateException(
      s"qualityClfLoadWeights: no sentinel row in $path — not a qualityClfSaveWeights table"))
    (rows.iterator.filter(_._1 >= 0L).map(r => (r._1, r._2)).toSeq.sortBy(_._1),
      sentinel._3, sentinel._4)
  }

  /** Score every document with the linear model: logit =
    * (bias_micros + Σ c_f·w_f_micros / n_feats)/1e6, keep = logit>0.
    * One scan → hashed features → broadcast weight join → one per-doc
    * aggregate; docs with no features score at the bias. */
  def qualityClassify(documents: DataFrame,
                      artifact: (Seq[(Long, Long)], Long, Int) = qualityClfArtifact): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val (weights, biasMicros, dim) = artifact
    val ws = filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "")
    val uni = expr("transform(ws, w -> concat('u:', w))")
    val bi = expr("transform(slice(ws, 1, greatest(size(ws) - 1, 0)), " +
      "(w, i) -> concat('b:', w, ' ', element_at(ws, i + 2)))")
    val toks = documents.select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), explode(concat(uni, bi)).as("f"))
      .select(col("doc_id"), clfBucket(col("f"), dim).as("bucket"))
    val wdf = broadcast(weights.toDF("bucket", "wm"))
    val scored = toks.join(wdf, Seq("bucket"), "left")
      .groupBy("doc_id").agg(count(lit(1)).as("n_feats"),
        coalesce(sum(col("wm")), lit(0L)).as("sum_m"))
    val biasD = lit(biasMicros).cast("double")
    val logitRaw = when(col("n_feats") > 0,
        (biasD + col("sum_m").cast("double") / col("n_feats").cast("double"))
          / lit(1000000.0))
      .otherwise(biasD / lit(1000000.0))
    documents.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("sum_m"), lit(0L)).as("sum_m"))
      .select(col("doc_id"), col("n_feats"),
        round(logitRaw, 4).as("logit"),
        (logitRaw > lit(0.0)).as("keep"))
  }

  /** Per-doc n-gram novelty over training order (the `ta_novelty`
    * entry) — the curation/memorization signal: what fraction of a
    * doc's distinct shingles has NO earlier occurrence (doc_id
    * order)? Low novelty late in the corpus = recycled boilerplate a
    * dedup pass missed; the aggregate trajectory is the "novel-token
    * rate" curve memorization studies plot over training. One
    * shuffle on the shingle (a grouped min — map-side combinable,
    * no posting list, no self-join, so no df cap is needed); the
    * novelty ratio rounds the integer pair the output also carries.
    */
  def noveltyProfile(documents: DataFrame, n: Int = 3): DataFrame = {
    val sh = Dedup.wordShingles(documents, n)
    val firstSeen = sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, Seq("shingle"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_sh"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_sh"), 4).as("novelty"))
  }

  /** Top-p% classifier filtering per source (the `ta_quality_topp`
    * entry) — the FineWeb-Edu / DCLM curation step: rather than a
    * fixed logit threshold (whose kept fraction drifts with the
    * score distribution), keep each source's top p fraction BY RANK.
    * Rank order is the deterministic total order (logit DESC,
    * doc_id ASC) over the same rounded logits the `ta_quality_clf`
    * gate already pins hash-exact, and the p cut is pure integer
    * arithmetic (`rk · 10⁶ ≤ pPpm · n_source` — floor semantics, no
    * percent_rank floats), so the whole selection is
    * oracle-replayable. One score pass + one window over one sort
    * per source; at 100 TB the rank window shuffles once on source,
    * the same shape as the source-cap operator.
    */
  def qualityTopP(documents: DataFrame, pPpm: Long = 250000L,
                  artifact: (Seq[(Long, Long)], Long, Int) = qualityClfArtifact): DataFrame = {
    require(pPpm >= 0L && pPpm <= 1000000L, s"pPpm out of range: $pPpm")
    val clf = qualityClassify(documents, artifact)
    val withSrc = clf.select(col("doc_id"), col("logit"))
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    val bySrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val ranked = withSrc
      .withColumn("rk", row_number().over(
        bySrc.orderBy(col("logit").desc, col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(bySrc))
    ranked.filter(col("rk") * lit(1000000L) <= lit(pPpm) * col("n_src"))
      .select(col("doc_id"), col("source"), col("logit"),
        col("rk").cast("long").as("rk"))
  }

  /** Rules-vs-classifier agreement matrix: the 2×2 (gopher keep ×
    * classifier keep) doc counts — the calibration read a pipeline
    * checks before swapping a rule filter for a learned one (how
    * much do they disagree, and in which direction?). Pure
    * composition: both verdicts are per-doc scalars, one doc_id
    * join, one tiny aggregate; the oracle composes the two
    * entries' SQL verbatim.
    */
  def qualityAgreement(documents: DataFrame,
                       artifact: (Seq[(Long, Long)], Long, Int) = qualityClfArtifact): DataFrame = {
    val clf = qualityClassify(documents, artifact)
      .select(col("doc_id"), col("keep").as("clf_keep"))
    val rules = gopherFlags(documents)
      .select(col("doc_id"), col("keep").as("rules_keep"))
    clf.join(rules, "doc_id")
      .groupBy("clf_keep", "rules_keep")
      .agg(count(lit(1)).as("n_docs"))
  }

  def weightedSample(documents: DataFrame, k: Int = 50,
                     seed: String = "wsamp"): DataFrame =
    weightedSampleTop(weightedSampleKeys(documents, seed), k)

  /** The Efraimidis-Spirakis keying shared by [[weightedSample]] and
    * the maintained face ([[graft.streaming.IngestStreams
    * .streamedWeightedSample]]): (doc_id, weight, key_nanos) per doc,
    * key = u^(1/w) floored to integer nanos, u a content-hash
    * uniform — a pure per-row projection. */
  private[graft] def weightedSampleKeys(documents: DataFrame,
                                        seed: String = "wsamp"): DataFrame = {
    val h = conv(substring(
      md5(concat_ws(":", lit(seed), col("doc_id").cast("string"))), 1, 12),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(math.pow(2.0, 48))
    val key = pow(u, lit(1.0) / col("n_chars").cast("double"))
    documents.filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").as("weight"),
        floor(key * lit(1e9) + lit(0.5)).cast("long").as("key_nanos"))
  }

  /** The k largest keys, ranked — shared between the batch and
    * streamed faces so both produce the identical output frame. */
  private[graft] def weightedSampleTop(keyed: DataFrame, k: Int): DataFrame = {
    val top = keyed.orderBy(col("key_nanos").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("key_nanos").desc, col("doc_id").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
  }

  // ------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  // arXiv:2302.03169): select pretraining documents that LOOK LIKE a
  // small target domain by importance weighting in a hashed n-gram
  // feature space. Two bag-of-buckets unigram LMs — p̂_target from
  // the target slice, p̂_raw from the selection pool — give each pool
  // doc the log importance weight Σ_f c_doc(f)·(ln p̂_t(f) − ln
  // p̂_r(f)); resampling without replacement with probability ∝
  // exp(w) is the Gumbel-top-k trick. The per-feature log ratios
  // floor to integer MICROS before the per-doc sum (the 33j
  // surprisal discipline), so weights are exact Longs in any
  // partitioning and the whole pipeline hash-checks in SQL.
  // ------------------------------------------------------------------

  /** One (doc_id, source, bucket) row per hashed feature — the
    * quality classifier's exact feature space ([[clfBucket]]:
    * lowercase `[^a-z]+` tokens, `u:`/`b:` unigrams+bigrams, md5
    * bucket) so DSIR and the learned filter read one representation. */
  private def dsirFeatures(documents: DataFrame, dim: Int): DataFrame = {
    val ws = filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "")
    val uni = expr("transform(ws, w -> concat('u:', w))")
    val bi = expr("transform(slice(ws, 1, greatest(size(ws) - 1, 0)), " +
      "(w, i) -> concat('b:', w, ' ', element_at(ws, i + 2)))")
    documents.select(col("doc_id"), col("source"), ws.as("ws"))
      .select(col("doc_id"), col("source"), explode(concat(uni, bi)).as("f"))
      .select(col("doc_id"), col("source"), clfBucket(col("f"), dim).as("bucket"))
  }

  /** Per-pool-doc DSIR importance weight (integer micros), target =
    * the `targetSource` slice, pool = everything else. Plan: one
    * feature explode (zero shuffle) → ONE bucket aggregate carrying
    * both LMs' counts (map-side combined, state ≤ dim rows) → a
    * single-row totals broadcast (the scalar-cross pattern) → the
    * per-doc weight aggregate. The corpus is read once; no step
    * scales worse than the wordcount shuffle, which is what lets
    * DSIR run ahead of a 100 TB pretraining mix. Add-1 smoothing
    * over `dim` buckets keeps unseen-bucket ratios finite; pool docs
    * with zero features keep weight 0 (selection-neutral).
    */
  def dsirWeights(documents: DataFrame, targetSource: String = "src0",
                  dim: Int = 4096): DataFrame = {
    val lam = dsirLambdas(documents, targetSource, dim)
    val feats = dsirFeatures(documents, dim)
    val pooled = feats.filter(col("source") =!= targetSource)
      .join(lam, "bucket") // the lambda table covers every bucket
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lam_m")).as("w_micros"))
    documents.filter(col("source") =!= targetSource).select(col("doc_id"))
      .join(pooled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_micros"), lit(0L)).as("w_micros"))
  }

  /** The DSIR artifact: one integer-micros log-ratio per feature
    * bucket — COMPLETE over all `dim` buckets (unseen buckets get
    * the smoothing-floor lambda), so a frozen copy can score shards
    * containing features the training corpus never produced. This
    * table, collected, IS what a deployment persists and broadcasts
    * — the qualityClf weight-artifact contract. */
  def dsirLambdas(documents: DataFrame, targetSource: String = "src0",
                  dim: Int = 4096): DataFrame = {
    val spark = documents.sparkSession
    val feats = dsirFeatures(documents, dim)
    val isTarget = col("source") === targetSource
    val counts = feats.groupBy("bucket").agg(
      sum(when(isTarget, lit(1L)).otherwise(lit(0L))).as("ct"),
      sum(when(isTarget, lit(0L)).otherwise(lit(1L))).as("cr"))
    val totals = counts.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cr")), lit(0L)).as("nr"))
    val lnMicros = (c: Column, n: Column) =>
      floor(log((c + lit(1L)).cast("double") / (n + lit(dim.toLong)).cast("double"))
        * lit(1e6) + lit(0.5)).cast("long")
    spark.range(dim).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (lnMicros(col("ct"), col("nt")) - lnMicros(col("cr"), col("nr"))).as("lam_m"))
  }

  /** DSIR lambda-DRIFT alarm — the retrain trigger for the frozen
    * artifact ([[dsirScoreFrozen]]'s deployment contract): compare
    * the lambda table computed from a reference window (even doc_ids
    * — the ta_split_drift convention) against the current window's,
    * bucket for bucket, and alarm when any bucket's log-ratio moved
    * more than `thresholdMicros`. Both tables are COMPLETE over all
    * `dim` buckets, so vocabulary that appears only in one window
    * compares against the other's smoothing floor instead of
    * silently dropping — exactly the drift case the alarm exists
    * for. All-integer summary (max/mean/over-count in micros), one
    * row out; the cellStats→ivfCompact story for text selection:
    * alarm → retrain [[dsirLambdas]] → hot-swap the broadcast
    * artifact (the stream_quality_hotswap cut-over mechanics).
    */
  def dsirDrift(documents: DataFrame, targetSource: String = "src0",
                dim: Int = 4096, thresholdMicros: Long = 200000L): DataFrame = {
    val ref = dsirLambdas(documents.filter(col("doc_id") % 2 === 0L),
      targetSource, dim).withColumnRenamed("lam_m", "lr")
    val cur = dsirLambdas(documents.filter(col("doc_id") % 2 =!= 0L),
      targetSource, dim).withColumnRenamed("lam_m", "lc")
    ref.join(cur, "bucket")
      .select(abs(col("lr") - col("lc")).as("d"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("d")).as("max_dlam"),
        expr(s"sum(d) div ${dim}L").as("mean_dlam"),
        count(when(col("d") >= thresholdMicros, lit(1))).as("n_over"))
      .withColumn("alarm", col("max_dlam") >= thresholdMicros)
  }

  /** Score (doc_id, text) rows against a FROZEN collected lambda
    * artifact — the stateless deployment read path ([[dsirWeights]]
    * with training amortized away): one feature explode, one
    * broadcast join, one per-doc aggregate; featureless docs score 0.
    * Because the artifact is integer micros and covers every bucket,
    * per-shard scoring equals whole-corpus scoring exactly. */
  def dsirScoreFrozen(docs: DataFrame, lambdas: Seq[(Long, Long)],
                      dim: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lam = broadcast(lambdas.toDF("bucket", "lam_m"))
    val scored = dsirFeatures(docs.withColumn("source", lit("")), dim)
      .join(lam, "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lam_m")).as("w_micros"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_micros"), lit(0L)).as("w_micros"))
  }

  /** DSIR importance RESAMPLING: `k` pool docs without replacement
    * with probability ∝ exp(weight) — the Gumbel-top-k trick (add
    * G = −ln(−ln(u)) per doc, take the top k), with u drawn
    * deterministically from md5(`dsir:`‖doc_id) exactly like
    * [[weightedSample]]'s E-S keys, so the sample reproduces
    * bit-for-bit in SQL. Selection is TakeOrderedAndProject(k) — one
    * bounded reduction, never a global sort; the rank window runs
    * over the k selected rows only. */
  def dsirSample(documents: DataFrame, k: Int = 64,
                 targetSource: String = "src0", dim: Int = 4096): DataFrame = {
    val h = conv(substring(
      md5(concat(lit("dsir:"), col("doc_id").cast("string"))), 1, 12),
      16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(281474976710657.0) // 2^48 + 1
    val g = floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
    val keyed = dsirWeights(documents, targetSource, dim)
      .withColumn("g_micros", g)
      .withColumn("priority", col("w_micros") + col("g_micros"))
    val top = keyed.orderBy(col("priority").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority").desc, col("doc_id").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("n_feats"), col("w_micros"),
        col("g_micros"), col("priority"), col("rk"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher, SIGIR 2009 — public formula): fuse the LEXICAL ranking
    * ([[bm25TopK]] over `documents`) with the DENSE ranking
    * ([[Similarity.bruteForceTopK]] over `embeddings`, query =
    * vec 0's embedding, ids shared with `doc_id`) by
    * score(d) = Σ_arm ⌊10⁶ / (c + rank_arm(d))⌋, missing arm = 0.
    *
    * RRF is THE standard hybrid-retrieval combiner because it needs
    * no score calibration between arms — BM25 log-weights and cosine
    * live on incomparable scales, but ranks are ranks. The integer
    * floor-division keeps fusion arithmetic exact in any engine, so
    * the whole operator hash-checks even though one arm ranks by
    * float cosine (that ranking is itself gate-proven by
    * `sim_bruteforce_topk`).
    *
    * Scale shape: each arm is its own proven bounded plan (BM25 =
    * query-term postings only + TakeOrderedAndProject; dense = one
    * broadcast query row + one corpus scan + a k-bounded aggregate);
    * fusion touches only the ≤ 2·kArm survivors — a full-outer join
    * of two k-row frames plus one bounded top-k. A corpus without an
    * embedding for every doc (this fixture at sf0.1: 2000 of 5000)
    * degrades per-doc, not per-query: a doc missing its dense arm
    * simply fuses from the lexical rank alone.
    */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String], k: Int = 20, kArm: Int = 50,
                rrfC: Int = 60): DataFrame = {
    val lex = bm25TopK(documents, queryTerms, kArm)
      .select(col("doc_id"), col("rk").as("rk_lex"))
    val dense = Similarity.bruteForceTopK(embeddings, numQueries = 1, k = kArm)
      .select(col("corpus_id").as("doc_id"), col("rk").as("rk_dense"))
    rrfFuse(lex, dense, k, rrfC)
  }

  /** Per-segment language spans (the `ta_lang_spans` entry) — the
    * code-switching detector: segment each document into fixed word
    * windows, language-ID each window with the SAME [[langPred]]
    * argmax the per-doc entry uses, and merge adjacent same-language
    * windows into spans (the gaps-and-islands shape). A curation
    * pipeline keeps a mixed document's target-language spans instead
    * of dropping the whole document on its majority label — at
    * web-crawl scale, boilerplate/navigation in one language wrapped
    * around content in another is the NORM, not the exception.
    *
    * Scale shape: one scan + a bounded per-doc explosion
    * (ceil(words/window) rows), then one window over (doc, win_idx)
    * — doc partitions, never a global sort — and one aggregate.
    * All-integer output + fixed-order argmax = hash-exact.
    */
  def langSpans(documents: DataFrame, window: Int = 20): DataFrame = {
    val seg = documents
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, greatest(CAST(ceil(size(split(trim(text), '\\\\s+')) / $window.0) AS INT), 1)),
           |  i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), (i-1)*$window+1, $window)))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("win_idx"),
        langPred(col("col")).as("lang"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_idx"))
    val chg = when(lag(col("lang"), 1).over(byDoc) === col("lang"), lit(0L))
      .otherwise(lit(1L))
    seg.withColumn("span_idx", sum(chg).over(byDoc))
      .groupBy("doc_id", "span_idx", "lang")
      .agg(min(col("win_idx")).as("start_win"), max(col("win_idx")).as("end_win"),
        count(lit(1)).as("n_windows"))
  }

  /** Exact phrase search (the `ta_phrase_search` entry): every
    * document containing the literal word sequence, with occurrence
    * count and first position — the positional-index query a search
    * engine answers beside BM25. Positions are 1-based over the
    * NON-EMPTY lowercased [A-Za-z]+ tokens (the ta_bm25 token
    * convention), so the maintained positional index serves the
    * same query from stored postings.
    *
    * Scale shape: only the phrase's terms survive the scan filter
    * (the bm25TopK postings discipline), and adjacency is L−1 hash
    * joins on (doc_id, pos − offset) — candidates bounded by the
    * rarest term's posting list, never a corpus shuffle.
    */
  def phraseSearch(documents: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    phraseMatches(tokenPositions(documents), phrase)
  }

  /** (doc_id, pos, word): 1-based positions over non-empty lowercased
    * tokens — shared by [[phraseSearch]] and the maintained index
    * ingest ([[graft.streaming.IngestStreams.bm25IndexBatch]]). */
  private[graft] def tokenPositions(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(expr(
        "filter(transform(split(text, '[^A-Za-z]+'), w -> lower(w)), w -> w != '')")))
      .select(col("doc_id"), (col("pos") + lit(1)).cast("long").as("pos"),
        col("col").as("word"))

  /** The adjacency core shared by the batch and maintained faces:
    * term l's positions shift left by l, so a phrase occurrence is
    * one (doc_id, p0) key surviving L−1 equi-joins. Repeated words
    * in the phrase cost nothing special — each offset joins the same
    * posting list at a different shift. */
  private[graft] def phraseMatches(tokPos: DataFrame,
                                   phrase: Seq[String]): DataFrame = {
    val terms = phrase.map(_.toLowerCase)
    val tok = tokPos.filter(col("word").isin(terms.distinct: _*))
    val occ = terms.zipWithIndex.map { case (w, l) =>
      tok.filter(col("word") === w)
        .select(col("doc_id"), (col("pos") - lit(l.toLong)).as("p0"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "p0")))
    occ.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
  }

  /** The RRF fusion core shared by [[hybridRrf]] and the
    * maintained-store face ([[graft.streaming.IngestStreams
    * .streamedHybridRrf]]): fuse a lexical ranking (doc_id, rk_lex)
    * with a dense ranking (doc_id, rk_dense) by exact integer floor
    * division. Both inputs are ≤ kArm rows, so everything here is
    * driver-trivial: one full-outer join of two k-row frames + one
    * bounded top-k. */
  private[graft] def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int,
                             rrfC: Int): DataFrame = {
    val contrib = (rk: String) =>
      when(col(rk) > 0, expr(s"CAST(1000000 DIV ($rrfC + $rk) AS BIGINT)"))
        .otherwise(lit(0L))
    val fused = lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rk_lex"), lit(0L)).as("rk_lex"),
        coalesce(col("rk_dense"), lit(0L)).as("rk_dense"))
      .withColumn("rrf_micros", contrib("rk_lex") + contrib("rk_dense"))
    val top = fused.orderBy(col("rrf_micros").desc, col("doc_id").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_micros").desc, col("doc_id").asc)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rk_lex"), col("rk_dense"),
        col("rrf_micros"), col("rk"))
  }
}
