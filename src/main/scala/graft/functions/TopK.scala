package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{DataFrame, Encoder}

/** Global top-k without a global sort (SURVEY §2.2 row 21).
  *
  * Each partition keeps a k-bounded buffer; partial buffers merge
  * pairwise on the driver-side combine tree. At 100 TB this moves
  * k·numPartitions rows over the wire instead of range-partitioning
  * the whole dataset the way orderBy().limit() at scale would —
  * and unlike `TakeOrderedAndProject` it composes as an aggregate
  * (usable per-group too).
  *
  * Ordering: score DESC, then id ASC — the unique id tiebreak keeps
  * results deterministic for oracle comparison.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def order(e: (Double, Long)): (Double, Long) = (-e._1, e._2)

  /** Keep the buffer loosely bounded (trim at 4k) so reduce is O(1)
    * amortized; exact top-k is enforced on finish/merge.
    */
  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (buf.length <= 4 * k) buf else buf.sortBy(order).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
    trim(buf :+ ((a._2, a._1)))

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sortBy(order).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy(order).take(k)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

/** k-smallest (key, id) pairs by (key asc, id asc) with a bounded
  * buffer — the ascending, string-keyed twin of [[TopKAggregator]],
  * for quota-style selection where the ordering key is a hash string
  * (e.g. a per-source md5 rank). The shuffle carries k-bounded
  * buffers per (partition, group), never whole groups — so one giant
  * group cannot skew a reduce task the way a window row_number()
  * plan (which sorts every group's full data) would.
  */
class MinKPairAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  /** Loosely bounded buffer (trim at 4k) so reduce is O(1) amortized;
    * exact min-k enforced on merge/finish.
    */
  private def trim(buf: Seq[(String, Long)]): Seq[(String, Long)] =
    if (buf.length <= 4 * k) buf else buf.sorted.take(k)

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(buf: Seq[(String, Long)], a: (String, Long)): Seq[(String, Long)] =
    trim(buf :+ a)

  override def merge(b1: Seq[(String, Long)], b2: Seq[(String, Long)]): Seq[(String, Long)] =
    (b1 ++ b2).sorted.take(k)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf.sorted.take(k)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

object TopK {
  import org.apache.spark.sql.functions._

  /** Per-key top-k via the same bounded-buffer aggregator, exposed as
    * a UDAF: one shuffle carrying k-bounded buffers per (partition,
    * key) — at scale this beats the window row_number() plan, which
    * must sort every partition's full data.
    *
    * `roundScale` controls the decimal rounding of the emitted score
    * (rounding happens AFTER ranking, so it never perturbs the order).
    */
  def perKeyTopK(df: DataFrame, keyCol: String, idCol: String, scoreCol: String,
                 k: Int, roundScale: Int = 2): DataFrame = {
    val topkUdaf = udaf(new TopKAggregator(k), ExpressionEncoder[(Long, Double)]())
    df.groupBy(col(keyCol))
      .agg(topkUdaf(col(idCol).cast("long"), col(scoreCol).cast("double")).as("topk"))
      .select(col(keyCol), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col(keyCol), col("entry._2").as(idCol),
        round(col("entry._1"), roundScale).as("score"), (col("pos") + 1).cast("long").as("rk"))
  }

  /** Top-k rows of `df` by `scoreCol` (desc, unique `idCol` tiebreak),
    * returned as (id, score, rk) — computed with the bounded-buffer
    * aggregator, no global sort.
    */
  def globalTopK(df: DataFrame, idCol: String, scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long"), col(scoreCol).cast("double"))
      .as[(Long, Double)]
    val topk = ds.select(new TopKAggregator(k).toColumn.name("topk"))
    topk
      .select(posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("entry._2").as(idCol), round(col("entry._1"), 2).as("score"),
        (col("pos") + 1).cast("long").as("rk"))
  }
}
