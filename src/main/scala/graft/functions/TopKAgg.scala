package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k per group as a typed `Aggregator` (SURVEY §7.2 ladder:
  * custom Aggregator before custom physical operator).
  *
  * The WindowExec alternative (`row_number() <= k`) must shuffle EVERY
  * group row and fully sort each partition before it can drop anything.
  * This aggregator's buffer is the k current best (ord, id) pairs —
  * bounded, associative, merge-able — so partial aggregation prunes
  * map-side and the shuffle carries at most k rows per group per
  * partition. At 100 TB that is the difference between shuffling the
  * fact table and shuffling k×|groups|.
  *
  * Ordering: ord DESC, id ASC (deterministic tie-break).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) (buf :+ x).sortWith(better)
    else if (better(x, buf(k - 1))) {
      buf(k - 1) = x
      buf.sortWith(better)
    } else buf

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Array[(Double, Long)]): Array[(Double, Long)] = r

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
