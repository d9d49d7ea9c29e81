package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic MapReduce text applications, re-expressed as declarative
  * Spark plans.
  *
  * Reference semantics (cited, not copied):
  *  - word count: /root/reference/plugin/word_count/wc.go:22-42 —
  *    tokenize on non-letter runes, emit (word, 1), reduce = count.
  *  - inverted index: /root/reference/plugin/indexer/indexer.go:23-45 —
  *    per-document distinct words, reduce = "<ndocs> <sorted docs>".
  *
  * Spark-first design: tokenization is `split` + `explode` (whole-stage
  * codegen), counting is `groupBy.count` which Catalyst executes with
  * map-side partial aggregation — the combiner the reference's
  * framework lacks. At 100 TB this means the shuffle carries one row
  * per (partition, word), not one per token occurrence; hot words
  * (the "the" problem) never skew the exchange.
  */
object TextOps {

  /** ASCII-letter tokenization matching the oracle's regex exactly.
    * The Go reference uses unicode.IsLetter; we pin to [A-Za-z] so the
    * DuckDB oracle (same regex) agrees byte-for-byte.
    */
  val TokenPattern = "[^A-Za-z]+"

  /** documents(text) exploded to one row per token occurrence. */
  def tokens(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(split(col("text"), TokenPattern)).as("word"))
      .filter(col("word") =!= "")

  /** Word frequency across the corpus. One shuffle on `word` after
    * partial aggregation. Output: (word, cnt).
    */
  def wordCount(documents: DataFrame): DataFrame =
    tokens(documents).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Inverted index: word -> (#docs containing it, sorted doc list).
    * Matches the reference's "<n> <doc,doc,...>" output as typed
    * columns. Distinct (word, doc) first so the shuffle is bounded by
    * vocabulary x docs, not token occurrences.
    */
  def invertedIndex(documents: DataFrame): DataFrame =
    tokens(documents)
      .select(col("word"), col("doc_id"))
      .distinct()
      .groupBy("word")
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(transform(array_sort(collect_set(col("doc_id"))),
          d => d.cast("string")), ",").as("docs"))

  /** Distributed grep: documents whose text matches `pattern`, with a
    * per-document match count. The regex filter evaluates inside the
    * scan stage (codegen), so non-matching 100 TB rows never leave it.
    */
  def grep(documents: DataFrame, pattern: String): DataFrame =
    documents
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)

  /** Distributed sort of the wordcount output — the MapReduce "sort"
    * benchmark. Spark implements orderBy as a range-partitioned sort
    * (sampled boundaries), so no single reducer sees the whole data.
    */
  def sortedWordCount(documents: DataFrame): DataFrame =
    wordCount(documents).orderBy(desc("cnt"), asc("word"))

  /** The reference's exact output shape: one `"key value"` line per
    * key, sorted by key (core/worker.go writes `%v %v` lines to
    * mr-out-R; mrsequential.go sorts globally). Returns the lines as
    * a single-column DataFrame ready for a text sink.
    */
  def mrOutLines(counts: DataFrame, keyCol: String = "word", valCol: String = "cnt"): DataFrame =
    counts
      .orderBy(asc(keyCol))
      .select(concat_ws(" ", col(keyCol), col(valCol)).as("line"))
}
