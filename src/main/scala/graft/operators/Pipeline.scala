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
                  keepLang: String = "en"): DataFrame = {
    val nWords = size(split(trim(col("text")), "\\s+")).cast("long")
    val alphaRatio = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
      length(col("text"))
    // all three gates are scalar expressions on the SAME scan — no
    // join back by doc_id, rejected docs never leave the scan stage
    val kept = documents
      .withColumn("n_ws_tokens", nWords)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("lang_pred", TextAnalysis.langPred(col("text")))
      .filter(col("alpha_ratio") >= minAlphaRatio && col("n_ws_tokens") >= minWords &&
        col("lang_pred") === keepLang)
    val hashed = kept.withColumn("content_hash", Dedup.contentHash(col("text")))
    hashed
      .withColumn("keep", min(col("doc_id")).over(Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("keep"))
      .select(col("doc_id"), col("n_ws_tokens"))
  }
}
