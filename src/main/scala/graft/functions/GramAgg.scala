package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Upper-triangular Gram-matrix accumulation as a typed aggregate: one
  * pass over the vectors produces all d(d+1)/2 pairwise component sums
  * Σ v_i·v_j — the covariance/PCA/whitening feeding matrix — without
  * ever exploding rows (the posexplode formulation fans each row out
  * d² times; this shuffles ONE fixed-size buffer per map partition).
  *
  * DETERMINISM: each product is QUANTIZED to an integer number of
  * 1e-6 grains (floor(x·1e6 + 0.5) — floor(+½) so both engines round
  * identically; Long sums are then exact and order-independent, which
  * a float sum over a shuffle is not. The grain bounds the contract:
  * |Σ| must stay below 2^63 grains ≈ 9.2e12 in value — comfortably
  * holding unit-norm embeddings to ~10^12 rows per group; quantization
  * error is ≤ 5e-7 per row, so callers reporting k decimals should
  * keep group sizes below 10^(6−k) / ulp needs — the operator rounds
  * to 6 with a ≥ 1e-1 safety margin at the tested scales.
  *
  * The buffer is a primitive Long array (d(d+1)/2 entries, 16 KiB at
  * d = 64); `merge` is elementwise addition, so partials combine
  * map-side like any algebraic aggregate.
  */
class GramAgg(d: Int)
    extends Aggregator[Seq[Float], Array[Long], Array[Long]] {

  private val size = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    // NULL embeddings are excluded, matching the NULL-excluded
    // convention of the built-in aggregates (a bare dereference would
    // fail the whole aggregation with an opaque NPE)
    if (v == null) return buf
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val a = v.toArray
    var i = 0
    var idx = 0
    while (i < d) {
      val vi = a(i).toDouble
      var j = i
      while (j < d) {
        buf(idx) += math.floor(vi * a(j).toDouble * 1e6 + 0.5).toLong
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object GramAgg {
  def apply(d: Int): GramAgg = new GramAgg(d)
}
