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
/** Shared k-bounded buffer mechanics: keep the buffer loosely bounded
  * (trim at 4k) so reduce is O(1) amortized; exact k-smallest under
  * `Ordering[E]` is enforced on merge/finish. Subclasses supply only
  * the input→element mapping, the ordering, and concrete encoders
  * (encoders can't be derived generically — `ExpressionEncoder`
  * needs the concrete element type).
  */
abstract class KBoundedAggregator[I, E](k: Int)(implicit ord: Ordering[E])
    extends Aggregator[I, Seq[E], Seq[E]] {

  protected def element(a: I): E

  private def trim(buf: Seq[E]): Seq[E] =
    if (buf.length <= 4 * k) buf else buf.sorted.take(k)

  override def zero: Seq[E] = Vector.empty

  override def reduce(buf: Seq[E], a: I): Seq[E] = trim(buf :+ element(a))

  override def merge(b1: Seq[E], b2: Seq[E]): Seq[E] = (b1 ++ b2).sorted.take(k)

  override def finish(buf: Seq[E]): Seq[E] = buf.sorted.take(k)
}

class TopKAggregator(k: Int)
    extends KBoundedAggregator[(Long, Double), (Double, Long)](k)(
      // score DESC, id ASC
      Ordering.by((e: (Double, Long)) => (-e._1, e._2))) {

  override protected def element(a: (Long, Double)): (Double, Long) = (a._2, a._1)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

/** k-smallest (key, id) pairs by (key asc, id asc) — the ascending,
  * string-keyed twin of [[TopKAggregator]], for quota-style selection
  * where the ordering key is a hash string (e.g. a per-source md5
  * rank). The shuffle carries k-bounded buffers per (partition,
  * group), never whole groups — so one giant group cannot skew a
  * reduce task the way a window row_number() plan (which sorts every
  * group's full data) would.
  */
class MinKPairAggregator(k: Int)
    extends KBoundedAggregator[(String, Long), (String, Long)](k) {

  override protected def element(a: (String, Long)): (String, Long) = a

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** k-best (cosine, cell) pairs by (cosine DESC, cell ASC) — the
  * [[graft.operators.Similarity.ivfCellsBroadcast]] probe buffer.
  * Bounding the buffer by `probes` (not nCells) is what that path's
  * shuffle volume rides on: at 1024 cells × 16 probes the per-key
  * state this moves is 64× smaller than a collect_list of every
  * scored cell. The ordering matches the inline/matrix assignment
  * comparator exactly, keeping the three paths row-identical.
  */
class CellTopKAggregator(k: Int)
    extends KBoundedAggregator[(Double, Long), (Double, Long)](k)(
      // cosine DESC, cell ASC
      Ordering.by((e: (Double, Long)) => (-e._1, e._2))) {

  override protected def element(a: (Double, Long)): (Double, Long) = a

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
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
