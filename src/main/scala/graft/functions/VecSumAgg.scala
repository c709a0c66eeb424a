package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise vector sum as a typed aggregate with QUANTIZED-exact
  * arithmetic: each component is converted to an integer number of
  * 1e-6 grains (`floor(x·1e6 + 0.5)` — the [[GramAgg]] rounding, so
  * both engines quantize identically) and summed in a primitive Long
  * buffer. A float/double elementwise sum over a shuffle is
  * order-dependent and can never hash-match an oracle; grain sums are
  * exact and order-independent, and the oracle replays the same
  * `floor(+½)` per component.
  *
  * The centroid/mean-vector primitive behind embedding diagnostics
  * (centroid norms, dispersion) — ONE fixed-size buffer per map
  * partition, never a d× posexplode. Contract: |Σ| per component
  * below 2^63 grains (≈9.2e12 in value); NULL vectors are excluded
  * like the built-in aggregates.
  */
class VecSumAgg(d: Int)
    extends Aggregator[Seq[Float], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d)

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    if (v == null) return buf
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val a = v.toArray
    var i = 0
    while (i < d) {
      buf(i) += math.floor(a(i).toDouble * 1e6 + 0.5).toLong
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object VecSumAgg {
  def apply(d: Int): VecSumAgg = new VecSumAgg(d)
}
