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
}
