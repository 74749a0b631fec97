package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a mergeable typed Aggregator: per group, keep the k
  * largest (value, id) pairs, value descending with id ascending as the
  * tie-break.
  *
  * This is the scale-correct alternative to `row_number() OVER (...) <= k`:
  * the window form sorts and shuffles EVERY row of the group; this
  * aggregator's state is at most k pairs, combines map-side (partial
  * aggregation), and merges associatively — a group of 10^9 rows ships k
  * pairs per map task instead of 10^9 rows to one sort partition.
  *
  * Determinism: the result is a pure function of the input SET (no
  * arrival-order dependence), because the (−value, id) ordering is total —
  * which is what makes the query oracle-checkable.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  override def zero: List[(Double, Long)] = Nil

  /** Insert keeping the buffer sorted and bounded at k. */
  override def reduce(
      b: List[(Double, Long)],
      a: (Double, Long)): List[(Double, Long)] = {
    val (lt, ge) = b.span(ord.lt(_, a))
    (lt ::: a :: ge).take(k)
  }

  override def merge(
      b1: List[(Double, Long)],
      b2: List[(Double, Long)]): List[(Double, Long)] = {
    // both inputs sorted: linear merge, bounded at k
    val out = List.newBuilder[(Double, Long)]
    var (x, y) = (b1, b2)
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && ord.lteq(x.head, y.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
