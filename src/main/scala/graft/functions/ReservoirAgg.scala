package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic bounded "reservoir" as a typed aggregate: keeps the k
  * rows with the SMALLEST (hash, value) per group, where the hash is a
  * caller-supplied uniform key (md5 prefix of a unique id). Because
  * "smallest k by a total order" is a commutative, idempotent-merge
  * monoid, the result is independent of input order and partitioning —
  * unlike a true random reservoir, whose contents depend on arrival
  * order, this subsample is REPLAYABLE by an oracle stating the same
  * order ("the k rows with the smallest hash"). A uniform hash makes it
  * a uniform-without-replacement draw for estimation purposes
  * (the [[graft.operators.Sampling]] md5-order doctrine, here as
  * BOUNDED MAP-SIDE STATE: the shuffle carries ≤ k pairs per
  * (partition, key) instead of every row — the quantile-estimation
  * sibling of [[TopKAgg]]).
  *
  * `finish` returns the kept VALUES sorted ascending, ready for
  * positional (type-1) quantile indexing.
  */
case class Hv(h: Long, v: Double)

class ReservoirAgg(k: Int) extends Aggregator[Hv, List[Hv], Seq[Double]] {
  require(k >= 1, "k must be >= 1")

  override def zero: List[Hv] = Nil

  private def before(a: Hv, b: Hv): Boolean =
    a.h < b.h || (a.h == b.h && a.v < b.v)

  override def reduce(buf: List[Hv], x: Hv): List[Hv] = {
    if (buf.lengthCompare(k) >= 0 && !before(x, buf.last)) buf
    else {
      val (lo, hi) = buf.span(before(_, x))
      (lo ::: (x :: hi)).take(k)
    }
  }

  override def merge(a: List[Hv], b: List[Hv]): List[Hv] = {
    val out = scala.collection.mutable.ListBuffer.empty[Hv]
    var (x, y) = (a, b)
    while (out.size < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
    }
    out.toList
  }

  override def finish(buf: List[Hv]): Seq[Double] =
    buf.map(_.v).sorted

  override def bufferEncoder: Encoder[List[Hv]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Hv]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object ReservoirAgg {
  def apply(k: Int): ReservoirAgg = new ReservoirAgg(k)
}
