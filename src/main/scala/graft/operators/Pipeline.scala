package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship composition: a training-data cleaning pipeline over
  * the documents table — quality gate → language gate → exact dedup →
  * token accounting — exactly the pass an LLM data pipeline runs
  * before tokenization.
  *
  * Plan shape at 100 TB: the quality/language gates are pure codegen
  * scalar expressions evaluated in the scan stage (rejected docs
  * never leave it); dedup is one shuffle on the content hash; the
  * output is one row per surviving doc. Nothing here is more than
  * one shuffle deep.
  */
object Pipeline {

  def cleanCorpus(documents: DataFrame,
                  minAlphaRatio: Double = 0.5,
                  minWords: Int = 10,
                  keepLang: String = "en"): DataFrame =
    build(documents, minAlphaRatio, minWords, keepLang, hooks = None)

  /** The ONE pipeline definition both entry points share — the
    * observed variant differs only in the three optional observe
    * points, so the gates/dedup logic cannot drift between them.
    */
  private def build(documents: DataFrame, minAlphaRatio: Double, minWords: Int,
                    keepLang: String,
                    hooks: Option[(org.apache.spark.sql.Observation,
                      org.apache.spark.sql.Observation,
                      org.apache.spark.sql.Observation)]): DataFrame = {
    def tap(df: DataFrame, pick: ((org.apache.spark.sql.Observation,
              org.apache.spark.sql.Observation,
              org.apache.spark.sql.Observation)) => org.apache.spark.sql.Observation,
            metrics: Seq[org.apache.spark.sql.Column]): DataFrame =
      hooks.fold(df)(h => df.observe(pick(h), metrics.head, metrics.tail: _*))
    val nWords = size(split(trim(col("text")), "\\s+")).cast("long")
    val alphaRatio = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
      length(col("text"))
    // all three gates are scalar expressions on the SAME scan — no
    // join back by doc_id, rejected docs never leave the scan stage
    val kept = tap(documents, _._1, Seq(count(lit(1)).as("n")))
      .withColumn("n_ws_tokens", nWords)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("lang_pred", TextAnalysis.langPred(col("text")))
      .filter(col("alpha_ratio") >= minAlphaRatio && col("n_ws_tokens") >= minWords &&
        col("lang_pred") === keepLang)
    val gated = tap(kept, _._2,
      Seq(count(lit(1)).as("n"), sum(col("n_ws_tokens")).as("tokens")))
    val hashed = gated.withColumn("content_hash", Dedup.contentHash(col("text")))
    val out = hashed
      .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("keep"))
      .select(col("doc_id"), col("n_ws_tokens"))
    tap(out, _._3, Seq(count(lit(1)).as("n"), sum(col("n_ws_tokens")).as("tokens")))
  }

  /** [[cleanCorpus]] with pipeline telemetry: per-stage row and token
    * counts observed from the SAME job via `Dataset.observe`
    * (CollectMetrics). At 100 TB this is the difference between free
    * metrics and re-running the pipeline once per gate just to count
    * drops — the observe points are accumulator-backed, add no
    * shuffle and no extra pass, and `Observation.get` blocks until
    * the action that consumed the frame completes.
    *
    * Returns the cleaned frame plus (input, post-gates, post-dedup)
    * observations, each carrying `n` (rows) and post-gate ones
    * `tokens` (surviving token volume — the number a training run
    * budgets against).
    */
  def cleanCorpusObserved(documents: DataFrame,
                          minAlphaRatio: Double = 0.5,
                          minWords: Int = 10,
                          keepLang: String = "en")
      : (DataFrame, org.apache.spark.sql.Observation,
         org.apache.spark.sql.Observation, org.apache.spark.sql.Observation) = {
    val obsIn = org.apache.spark.sql.Observation("graft_in")
    val obsGates = org.apache.spark.sql.Observation("graft_gates")
    val obsOut = org.apache.spark.sql.Observation("graft_out")
    val cleaned = build(documents, minAlphaRatio, minWords, keepLang,
      hooks = Some((obsIn, obsGates, obsOut)))
    (cleaned, obsIn, obsGates, obsOut)
  }

  /** The COMPLETE pretraining-mix preparation, end to end: quality +
    * language gates → exact dedup → per-source quota cap →
    * deterministic global shuffle order, with token accounting — the
    * whole "raw crawl in, training order out" pass, every stage one
    * of this library's individually-oracled operators composed into
    * one run.
    *
    * Stage plumbing at scale: the gates are scan-stage scalar
    * expressions; dedup is one shuffle on the content hash; the
    * survivor set is materialized ONCE (localCheckpoint — the
    * CC-family pattern) because both the cap aggregation and the
    * metadata join-back consume it, and re-running gates+dedup per
    * consumer would double the corpus scans; the cap is the
    * k-bounded [[graft.functions.MinKPairAggregator]] (never a
    * giant-source window sort — the ta_source_cap argument); the
    * join-back ships only (doc_id) survivors against the checkpointed
    * frame; the global order is [[TextAnalysis.shuffleOrder]]'s
    * range-partitioned sort + two-phase prefix-sum rank (no single
    * reducer, no global window).
    *
    * Output: (doc_id, source, n_tokens, shuffle_rank) — feed it to
    * [[TextAnalysis.packIntoShards]] for token-budgeted shards.
    */
  /** Per-source corpus-budget audit through the GOPHER gate + exact
    * dedup: for each source, how many docs arrived, how many survive
    * the rule verdicts ([[TextAnalysis.gopherFlags]]), how many of
    * those are content-unique, and the surviving unique token volume
    * — the table a pretraining-mix design reads before setting
    * source weights (the number `pretrainMix`'s caps act on).
    *
    * Dedup is scoped to KEPT docs (the survivor is the smallest KEPT
    * doc_id per content hash — a dropped duplicate must not shadow a
    * kept one, spec-pinned). Plan: the flags aggregate (two doc_id
    * shuffles), one co-partitioned join back, one content-hash window
    * shuffle, one |sources|-bounded final aggregate. Every count and
    * token sum is integer — the SQL oracle recomputes the whole
    * composition flag-for-flag.
    */
  def qualityDedupAudit(documents: DataFrame): DataFrame = {
    val flags = TextAnalysis.gopherFlags(documents)
      .select(col("doc_id"), col("keep"), col("n_words"))
    val docs = documents.select(col("doc_id"), col("source"), col("text"))
      .join(flags, "doc_id")
    val marked = docs
      .withColumn("h", Dedup.contentHash(col("text")))
      .withColumn("survivor",
        col("keep") && col("doc_id") ===
          min(when(col("keep"), col("doc_id"))).over(Window.partitionBy(col("h"))))
    marked.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_keep"),
      sum(when(col("survivor"), lit(1L)).otherwise(lit(0L))).as("n_unique"),
      sum(when(col("survivor"), col("n_words")).otherwise(lit(0L))).as("tokens_unique"))
  }

  /** The multimodal cleaning capstone (the `pipeline_mm_clean`
    * entry): the two passes every captioned-media corpus runs before
    * training — keep only ALIGNMENT-VERIFIED pairs (the caption's
    * media arrived and fingerprints agree within `alignHamming` —
    * [[Multimodal.pairVerdicts]] == match) and drop fingerprint
    * DUPLICATES (any doc with a ≤`dupHamming` twin of smaller id
    * loses — [[Multimodal.phashNearDup]]'s doc_b side, the
    * dedup_apply election over pairs). The two tolerances are
    * deliberately different: alignment is a lenient agreement check
    * (the caption should roughly describe its media), dedup is
    * strict (default 0 — exact fingerprint twins), because the
    * stub's 64-bucket histogram makes loose near-dup thresholds
    * degenerate on homogeneous corpora (measured at sf0.01:
    * hamming ≤ 3 marks 483 of 500 docs as someone's twin; hamming 0
    * marks 196 — a real decoder's DCT phash separates far better
    * and a deployment re-widens the threshold with it). Output: the
    * surviving (doc_id, source) corpus; fingerprints computed once
    * per doc, one semi join + one anti join on doc_id.
    */
  def mmCleanCorpus(documents: DataFrame, dim: Int = 64, nBands: Int = 4,
                    alignHamming: Int = 3, dupHamming: Int = 0,
                    maxBandDf: Int = 100): DataFrame = {
    val aligned = Multimodal.pairVerdicts(documents, dim, nBands, alignHamming)
      .filter(col("v") === "match")
      .select(col("caption_id").as("doc_id"))
    val losers = Multimodal.phashNearDup(documents, dim, nBands, dupHamming, maxBandDf)
      .select(col("doc_b").as("doc_id")).distinct()
    documents.select(col("doc_id"), col("source"))
      .join(aligned, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
  }

  /** Benchmark-decontamination removal (the `pipeline_decontaminate`
    * entry) — the step AFTER the `ta_contamination` audit: drop
    * every train doc whose eval-overlapping shingle fraction reaches
    * `thresholdPct` percent, and report the per-source funnel
    * (n_train, n_dropped, n_kept, tokens_kept) a pretraining run
    * reads before subtracting. The threshold compares PRE-ROUND
    * integers (`100·n_contaminated ≥ pct·n_sh` — no float ratio
    * anywhere), so the whole funnel is oracle-replayable. Shingle
    * generation is the audit's own pass; the funnel adds one doc_id
    * join and one low-cardinality aggregate.
    */
  def decontaminate(documents: DataFrame, evalMod: Int = 50, n: Int = 5,
                    thresholdPct: Long = 50L): DataFrame = {
    val c = TextAnalysis.contamination(documents, evalMod, n)
      .select(col("doc_id"), col("n_sh"), col("n_contaminated"))
    val train = documents.filter(col("doc_id") % evalMod =!= 0)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val flagged = train.join(c, Seq("doc_id"))
      .withColumn("dropped",
        col("n_contaminated") * lit(100L) >= lit(thresholdPct) * col("n_sh"))
    flagged.groupBy("source").agg(
      count(lit(1)).as("n_train"),
      sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"),
      sum(when(col("dropped"), 0L).otherwise(1L)).as("n_kept"),
      sum(when(col("dropped"), 0L).otherwise(col("n_tokens"))).as("tokens_kept"))
  }

  def pretrainMix(documents: DataFrame,
                  minAlphaRatio: Double = 0.5,
                  minWords: Int = 10,
                  keepLang: String = "en",
                  capPerSource: Int = 10,
                  shuffleSeed: String = "mix"): DataFrame = {
    val nWords = size(split(trim(col("text")), "\\s+")).cast("long")
    val alphaRatio = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
      length(col("text"))
    val kept = documents
      .withColumn("n_tokens", nWords)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("lang_pred", TextAnalysis.langPred(col("text")))
      .filter(col("alpha_ratio") >= minAlphaRatio && col("n_tokens") >= minWords &&
        col("lang_pred") === keepLang)
      .select(col("doc_id"), col("source"), col("text"), col("n_tokens"))
    val surv = kept
      .withColumn("content_hash", Dedup.contentHash(col("text")))
      .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("keep"))
      .select("doc_id", "source", "n_tokens")
      .localCheckpoint(true)
    val mink = udaf(new graft.functions.MinKPairAggregator(capPerSource),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Long)]())
    val capped = surv
      .select(col("source"),
        md5(concat_ws(":", col("source"), col("doc_id").cast("string"))).as("h"),
        col("doc_id"))
      .groupBy(col("source"))
      .agg(mink(col("h"), col("doc_id")).as("kept"))
      .select(explode(col("kept")).as("entry"))
      .select(col("entry._2").as("doc_id"))
    val withMeta = capped.join(surv, "doc_id").localCheckpoint(true)
    TextAnalysis.shuffleOrder(withMeta.select("doc_id"), shuffleSeed)
      .join(withMeta, "doc_id")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("shuffle_rank"))
  }

  /** Per-source curation scorecard (the `pipeline_scorecard` entry) —
    * the one-table answer to "where does each source's data go?":
    * every TRAIN doc (the eval slice is the contamination reference,
    * not pool) gets exactly one verdict under the pipeline's
    * precedence — Gopher rules first (cheap scalar stats), then the
    * learned classifier, then benchmark decontamination (≥
    * thresholdPct% eval-shingle overlap), then exact-duplicate
    * election (min-doc_id survivor per content hash within the
    * pool) — rolled up per source with kept-token mass. Precedence
    * means the columns PARTITION n_docs: a doc failing two gates is
    * billed to the first, which is how a deployment reads a funnel
    * (fix the biggest EARLIEST leak first).
    *
    * Scale shape: each gate is its own proven bounded plan (scalar
    * projections + one agg; broadcast weights; broadcast eval
    * vocabulary; one hash agg) joined back on doc_id, and the
    * rollup is one low-cardinality aggregate. Nothing here is new
    * machinery — the capstone composes four gate families the §2
    * inventory already gates individually.
    */
  def curationScorecard(documents: DataFrame, evalMod: Int = 50, n: Int = 5,
                        thresholdPct: Long = 50L): DataFrame = {
    val train = documents.filter(col("doc_id") % evalMod =!= 0)
    val base = train.select(col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val g = TextAnalysis.gopherFlags(train)
      .select(col("doc_id"), col("keep").as("g_keep"))
    val c = TextAnalysis.qualityClassify(train)
      .select(col("doc_id"), col("keep").as("c_keep"))
    val t = TextAnalysis.contamination(documents, evalMod, n)
      .select(col("doc_id"),
        (col("n_contaminated") * lit(100L) < lit(thresholdPct) * col("n_sh"))
          .as("t_keep"))
    val hashed = train.select(col("doc_id"),
      Dedup.contentHash(col("text")).as("h"))
    val d = hashed
      .join(hashed.groupBy("h").agg(min(col("doc_id")).as("keep_id")), "h")
      .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("d_keep"))
    val verdict = when(!col("g_keep"), "gopher")
      .when(!col("c_keep"), "classifier")
      .when(!col("t_keep"), "contaminated")
      .when(!col("d_keep"), "duplicate")
      .otherwise("kept")
    base.join(g, "doc_id").join(c, "doc_id").join(t, "doc_id").join(d, "doc_id")
      .withColumn("v", verdict)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("v") === "gopher", 1L).otherwise(0L)).as("drop_gopher"),
        sum(when(col("v") === "classifier", 1L).otherwise(0L)).as("drop_clf"),
        sum(when(col("v") === "contaminated", 1L).otherwise(0L)).as("drop_contaminated"),
        sum(when(col("v") === "duplicate", 1L).otherwise(0L)).as("drop_dup"),
        sum(when(col("v") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("v") === "kept", col("n_tokens")).otherwise(0L)).as("tokens_kept"))
  }
}
