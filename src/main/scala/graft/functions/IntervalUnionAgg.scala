package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Gap-tolerant interval-set union as a typed aggregate — the reference's
  * interval coalescing (`program/src/main/java/hmushtaq/sparkga1/utils/
  * RegionIterator.java:59,101-132`: merge sorted intervals whose gap ≤
  * `INTERVAL_OVERLAP`), re-expressed as a Catalyst `Aggregator` so it runs
  * as a single-pass partial/final aggregate instead of a window.
  *
  * Why an aggregate and not the `lag`/cumsum window formulation
  * (`graft.operators.Sessionize`): the window needs a full sort of every
  * partition key's rows; the aggregate merges map-side partials, so the
  * shuffle carries per-(partition,key) *interval lists* (bounded by the
  * number of disjoint sessions, typically ≪ row count) instead of all
  * rows. At 100 TB with long-tailed keys that is the difference between
  * shuffling the table and shuffling a sketch.
  *
  * The buffer is a sorted, disjoint, gap-merged interval list; `reduce`
  * does an insert-merge, `merge` a linear list union — both maintain the
  * invariant, so the result is independent of input order (required for
  * distributed determinism).
  */
case class Iv(start: Long, end: Long, n: Long)

class IntervalUnionAgg(gap: Long)
    extends Aggregator[Iv, List[Iv], Seq[Iv]] {

  override def zero: List[Iv] = Nil

  /** Insert one interval, merging with any overlapping-within-gap
    * neighbors. Keeps the list sorted and disjoint.
    */
  override def reduce(buf: List[Iv], x: Iv): List[Iv] = insert(buf, x)

  override def merge(a: List[Iv], b: List[Iv]): List[Iv] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Iv]): Seq[Iv] = buf

  override def bufferEncoder: Encoder[List[Iv]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Iv]]()

  override def outputEncoder: Encoder[Seq[Iv]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Iv]]()

  private def mergeable(a: Iv, b: Iv): Boolean =
    b.start <= a.end + gap && a.start <= b.end + gap

  private def insert(buf: List[Iv], x: Iv): List[Iv] = {
    val (before, rest) = buf.span(iv => iv.end + gap < x.start)
    val (overlapping, after) = rest.span(iv => mergeable(iv, x))
    val merged = overlapping.foldLeft(x) { (acc, iv) =>
      Iv(math.min(acc.start, iv.start), math.max(acc.end, iv.end),
         acc.n + iv.n)
    }
    before ::: (merged :: after)
  }
}

object IntervalUnionAgg {
  /** DataFrame-facing UDAF: `agg(intervalUnion(struct-cols...))`. */
  def apply(gap: Long): IntervalUnionAgg = new IntervalUnionAgg(gap)
}
