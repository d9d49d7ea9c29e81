package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in `queries` is an operator from the survey; every
  * SQL-expressible one has a DuckDB twin in `oracleSql` with
  * identical column aliases (the driver sorts columns by name and
  * hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 MapReduce core applications
    "mr_wordcount" -> ((s, dir) => TextOps.wordCount(Tables.documents(s, dir))),
    "mr_inverted_index" -> ((s, dir) => TextOps.invertedIndex(Tables.documents(s, dir))),
    "mr_grep" -> ((s, dir) => TextOps.grep(Tables.documents(s, dir), "th[ei]")),
    "mr_sort" -> ((s, dir) => TextOps.sortedWordCount(Tables.documents(s, dir))),
    // §2.2 relational
    "q1_agg" -> ((s, dir) => Relational.q1PricingSummary(Tables.lineitem(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "mr_wordcount" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS cnt FROM toks WHERE word <> '' GROUP BY word""".stripMargin,
    "mr_inverted_index" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
        |    FROM documents)
        |  WHERE word <> '')
        |SELECT word, count(*) AS n_docs,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs
        |FROM toks GROUP BY word""".stripMargin,
    "mr_grep" ->
      """SELECT doc_id, len(regexp_extract_all(text, 'th[ei]')) AS n_matches
        |FROM documents
        |WHERE len(regexp_extract_all(text, 'th[ei]')) > 0""".stripMargin,
    "mr_sort" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS cnt FROM toks WHERE word <> ''
        |GROUP BY word ORDER BY cnt DESC, word ASC""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2)                          AS sum_qty,
        |  round(sum(l_extendedprice), 2)                     AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
        |  round(avg(l_quantity), 2)                          AS avg_qty,
        |  round(avg(l_extendedprice), 2)                     AS avg_price,
        |  count(*)                                           AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
