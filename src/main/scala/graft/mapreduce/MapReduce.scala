package graft.mapreduce

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** The reference's generic MapReduce programming model, re-expressed on
  * Spark Datasets.
  *
  * Reference semantics (cited, not copied):
  *  - map task: /root/reference/core/worker.go — `Map(filename,
  *    contents) -> [(k, v)]` over one input file per task;
  *  - shuffle: `ihash(key) %% nReduce` buckets spilled to
  *    intermediate files;
  *  - reduce task: merge + sort by key, then `Reduce(key, values)`
  *    per distinct key (mrsequential.go is the semantic oracle).
  *
  * Spark-first re-expression: the shuffle IS Spark's exchange — no
  * intermediate files to manage, no coordinator RPC; fault tolerance
  * (the 10s reassignment / idempotent re-execution contract in
  * core/coordinator.go) is Spark task retry + deterministic lineage,
  * exercised in FrameworkContractSpec.
  *
  * Two execution paths, matching the survey's scale notes:
  *  - [[run]] — faithful `Reduce(k, allValues)`: one
  *    `groupByKey.mapGroups`, needed when the reduce function is not
  *    associative (e.g. the indexer's "join sorted doc list").
  *    At 100 TB every value crosses the wire — exactly the
  *    reference's own cost model.
  *  - [[runCombining]] — associative/commutative combine via a typed
  *    [[Aggregator]]: Spark applies it map-side (partial aggregation),
  *    so the exchange carries one row per (partition, key), not one
  *    per emitted pair. This is the combiner the reference lacks and
  *    the only viable path for skewed keys (wordcount's "the").
  */
object MapReduce {

  /** One input "file" of the reference model: (name, contents). */
  type Doc = (String, String)

  /** Faithful MapReduce: all values of a key are presented to
    * `reduceF` together (not necessarily sorted — sort inside the
    * reducer if its semantics need it, as the reference's reduce does).
    */
  def run[K, V, R](input: Dataset[Doc])(mapF: (String, String) => IterableOnce[(K, V)])(
      reduceF: (K, Seq[V]) => R)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      krEnc: Encoder[(K, R)]): Dataset[(K, R)] =
    input
      .flatMap { case (name, contents) => mapF(name, contents) }
      .groupByKey(_._1)
      .mapGroups((k, vs) => (k, reduceF(k, vs.map(_._2).toSeq)))

  /** Combiner path: `combine` must be associative + commutative.
    * Runs as a typed Aggregator → map-side partial aggregation →
    * one shuffled row per key per map partition.
    */
  def runCombining[K, V](input: Dataset[Doc])(
      mapF: (String, String) => IterableOnce[(K, V)])(zero: V, combine: (V, V) => V)(implicit
      kvEnc: Encoder[(K, V)],
      kEnc: Encoder[K],
      vEnc: Encoder[V]): Dataset[(K, V)] = {
    val zeroValue = zero
    val agg = new Aggregator[(K, V), V, V] {
      override def zero: V = zeroValue
      override def reduce(b: V, a: (K, V)): V = combine(b, a._2)
      override def merge(b1: V, b2: V): V = combine(b1, b2)
      override def finish(r: V): V = r
      override def bufferEncoder: Encoder[V] = vEnc
      override def outputEncoder: Encoder[V] = vEnc
    }
    input
      .flatMap { case (name, contents) => mapF(name, contents) }
      .groupByKey(_._1)
      .agg(agg.toColumn)
  }

  /** The reference's text-file input shape: one (path, contents) row
    * per file, like the Go driver's os.ReadFile loop — but read
    * distributed (`wholetext`), one Spark task per file.
    */
  def readDocuments(spark: SparkSession, paths: Seq[String]): Dataset[Doc] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .text(paths: _*)
      .select(
        org.apache.spark.sql.functions.input_file_name().as("name"),
        org.apache.spark.sql.functions.col("value").as("contents"))
      .as[Doc]
  }
}
