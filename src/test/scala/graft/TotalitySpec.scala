package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-driven empty-input totality: EVERY `SparkEntry.queries`
  * entry — batch and streamed alike — must run to completion on an
  * empty corpus (all ten tables present with their real schemas,
  * zero rows) and return a frame, never throw. A 100 TB pipeline
  * always has some empty partition/day/source, and the per-operator
  * EmptyInputSpec sweeps only the operators someone remembered to
  * list — this sweep is closed over the registry itself, so a new
  * entry is covered the day it lands (the MstSummarySql empty-shape
  * divergence is the bug class this retires wholesale).
  *
  * Oracle agreement on the empty fixture is checked out-of-band with
  * the same tooling the driver uses (Verify + check_oracle over an
  * empty sf dir — SURVEY §6 records the sweep); in-suite we pin
  * totality and, where the non-empty shape is a zero-row frame, that
  * the output is actually empty. Queries whose empty-input shape is
  * a degenerate SUMMARY row (profile/audit/sketch faces — the oracle
  * SQL produces the same rows) are listed with their pinned counts.
  */
class TotalitySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  /** All ten tables, real schemas, zero rows. */
  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf-").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${SharedSpark.sf}/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // empty-input output is a fixed set of degenerate summary rows, not
  // zero rows — pinned so a shape regression (a row appearing or
  // vanishing) fails loud; every count mirrors what the oracle SQL
  // produces on the same empty tables
  private val degenerateRows: Map[String, Long] = Map(
    "q_mst_summary" -> 1L,       // (0, 0, 0) via the LEFT JOIN + COALESCE guard
    "stream_mst_summary" -> 1L,  // shares the batch twin's degenerate shape
    "q_fk_audit" -> 2L,          // one all-zero audit row per FK edge
    "q_profile" -> 3L,           // one stats row per profiled column
    "q_quantile_sketch" -> 3L,   // one estimate row per probed quantile (est 0)
    "q_count_min" -> 4L,         // one row per probe word, estimate 0 = exact 0
    "q_triangles" -> 1L,         // (0, 0, 0) summary
    "q_triangles_approx" -> 1L,
    "q_triangles_approx_q" -> 1L,
    "q_triangles_approx_p2" -> 1L,
    "q_clustering" -> 1L,        // the five-zero summary row
    "q_null_semantics" -> 1L,    // the semantics pin is data-independent
    "mm_phash_decoded_gate" -> 12L,     // planted-corpus gate: data-independent
    "stream_phash_decoded_gate" -> 12L, // (oracle embeds the same fixture)
    "sim_kmeans_gate" -> 48L,           // planted ANN corpus: one row per vector
    "sim_ann_ivf_gate" -> 20L,          // 4 queries x k=5 ranks
    "stream_ann_ivf_gate" -> 20L,       // maintained-table twin, same shape
    "dedup_suffix_profile" -> 6L, // one row per probed length, all zero
    "stream_suffix_profile" -> 6L,
    "dedup_span_elect" -> 1L,    // election falls back to the longest length
    "ta_split_drift" -> 1L,      // zero counts, zero distance
    "ta_dsir_drift" -> 1L,       // zero-drift alarm row
    "q_join_size_est" -> 1L      // 0 est, 0 exact
  )

  test("every registry entry is total on the empty fixture") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val nonEmpty = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, emptyDir).count()
        degenerateRows.get(name) match {
          case Some(want) =>
            if (n != want) nonEmpty += ((name, n))
          case None =>
            if (n != 0L) nonEmpty += ((name, n))
        }
      } catch {
        case e: Throwable =>
          failures += ((name, s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"))
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} entries THREW on empty input:\n" +
        failures.map { case (n, m) => s"  $n -> $m" }.mkString("\n"))
    assert(nonEmpty.isEmpty,
      s"\n${nonEmpty.size} entries returned unexpected rows on empty input:\n" +
        nonEmpty.map { case (n, c) => s"  $n -> $c rows" }.mkString("\n"))
  }
}
