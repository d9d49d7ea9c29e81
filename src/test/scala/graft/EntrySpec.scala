package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: SparkEntry.entry returns rows, and
  * every declared query has either an oracle or a documented
  * rows-only role.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("entry() returns a non-empty flagship result on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("rows-only queries (no oracle) are the documented non-SQL-expressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "dedup_minhash", "dedup_simhash", "dedup_embedding", // seeded xxhash64 not in DuckDB
      "dedup_contamination", // fuzzy train x eval decontamination: same
                             // xxhash64 reason, DedupSpec is the oracle
      "stream_near_dedup", // streamed dedup_minhash twin: same xxhash64 reason,
                           // batch-parity spec is the oracle
      "sim_ann_lsh", "sim_ann_ivf",                        // LSH/IVF candidate sets
      "stream_ann_ivf", // streamed sim_ann_ivf twin: same float-candidate reason,
                        // batch-parity spec is the oracle
      "stream_ann_ivfpq", // streamed sim_ann_ivfpq_res twin: same trained-codebook
                          // reason, batch-parity spec is the oracle
      "sim_kmeans",   // iterated float means: not bit-reproducible across engines
      "q_approx_distinct_hll", // DataSketches HLL estimate; DuckDB ships a different sketch
      "sim_ann_pq", // PQ codebooks from iterated float k-means (the sim_kmeans
                    // reason); recall spec gates the shipped defaults at >= 0.8
      "sim_ann_ivfpq",   // same trained-codebook reason; recall spec >= 0.85
      "sim_ann_ivfpq_res", // residual variant; recall spec >= plain IVFPQ
      "sim_ann_opq", // learned rotation + codebooks (float-iterated);
                     // recall specs: >= PQ - eps on the fixture, > PQ
                     // on planted anisotropic data
      "sim_ann_pca", // driver-eigensolved float basis (the sim_kmeans
                     // reason); specs: full-dim path == brute force
                     // row-for-row, recall >= 0.8 at shipped dials
      "stream_ann_pca", // streamed sim_ann_pca twin: Gram-delta fold
                        // order differs from the batch pass by ulps,
                        // so the same float-basis reason; parity spec
      "q_mst", // Borůvka union-find is not DuckDB-CTE-expressible without
               // path enumeration; local-Kruskal edge-set spec is the oracle
      "q_betweenness", // Brandes backward-pass delta ratios are rational
                       // (level-recursive float accumulation); the spec's
                       // independent local Brandes is the oracle
      "q_kll_sketch", // KLL compaction depends on Spark's partial-merge
                      // order; SketchesSpec gates rank error and the query
                      // emits its own exact-rank audit columns
      "stream_kll", // streamed q_kll_sketch twin: same merge-order reason,
                    // StreamingSpec gates the bound + state boundedness
      "dedup_semantic", // SemDeDup clusters via float-iterated k-means (the
                        // sim_kmeans reason); SimilaritySpec pins the kept
                        // set against an independent local implementation
      "stream_semantic", // its maintained twin: same float reason,
                         // VectorStreamsSpec pins streamed == batch
      "mm_phash_decoded", // real ImageIO decode + DCT phash: the DCT
                          // coefficients are doubles, so DuckDB can't
                          // replay the threshold bits; MultimodalSpec
                          // pins losslessness + twin/far separations
      "stream_phash_decoded") // its maintained twin: same DCT-double
                              // reason; StreamingSpec pins streamed
                              // == batch phashSummaryDecoded
    assert(rowsOnly == expected, s"undocumented rows-only queries: ${rowsOnly -- expected}")
    // every rows-only query carries a pinned sf0.01 row count for the
    // driver's rows-gate, and nothing else does
    assert(SparkEntry.expectedRows.keySet == expected,
      s"expectedRows keys drifted from the rows-only set: " +
        s"${SparkEntry.expectedRows.keySet.diff(expected) ++ expected.diff(SparkEntry.expectedRows.keySet)}")
    assert(SparkEntry.expectedRows.values.forall(_ > 0L))
  }
}
