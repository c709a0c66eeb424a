package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed AGGREGATE — the alternative to the
  * row_number() window for "top k per key": the window formulation
  * sorts every key group's full row set (WindowGroupLimit prunes but
  * the shuffle still carries all rows); this aggregator's state is a
  * k-bounded sorted list that combines MAP-SIDE, so the shuffle
  * carries at most k rows per (partition, key) — at 100 TB with
  * heavy keys that is the difference between shuffling the table and
  * shuffling k·partitions rows.
  *
  * Total order: (ord DESC, id ASC) — the id tiebreak makes the result
  * set deterministic and oracle-stateable. `reduce` is an O(k)
  * bounded insert; `merge` a bounded sorted-list merge; both maintain
  * the sorted-unique-bounded invariant, so the result is independent
  * of input order and partitioning (required for distributed
  * determinism).
  */
case class Kv(ord: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[Kv, List[Kv], Seq[Kv]] {
  require(k >= 1, "k must be >= 1")

  override def zero: List[Kv] = Nil

  private def before(a: Kv, b: Kv): Boolean =
    a.ord > b.ord || (a.ord == b.ord && a.id < b.id)

  override def reduce(buf: List[Kv], x: Kv): List[Kv] = {
    if (buf.lengthCompare(k) >= 0 && !before(x, buf.last)) buf
    else {
      val (hi, lo) = buf.span(before(_, x))
      (hi ::: (x :: lo)).take(k)
    }
  }

  override def merge(a: List[Kv], b: List[Kv]): List[Kv] = {
    val out = scala.collection.mutable.ListBuffer.empty[Kv]
    var (x, y) = (a, b)
    while (out.size < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
    }
    out.toList
  }

  override def finish(buf: List[Kv]): Seq[Kv] = buf

  override def bufferEncoder: Encoder[List[Kv]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Kv]]()

  override def outputEncoder: Encoder[Seq[Kv]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Kv]]()
}

object TopKAgg {
  def apply(k: Int): TopKAgg = new TopKAgg(k)
}
