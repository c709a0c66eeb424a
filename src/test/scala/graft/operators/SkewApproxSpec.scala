package graft.operators

import graft.{GraftSession, SparkTestBase}
import org.apache.spark.sql.functions._

/** Bounded-error spec for the approx equal-frequency split (O10's 100 TB
  * path, exercised by q41): no exact oracle exists for sketch boundaries,
  * so the contract is a BALANCE bound against the exact split instead —
  * mirroring the q34 sketch-spec pattern.
  */
class SkewApproxSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("approx segments cover every row and are near-balanced") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val bounds = Skew.approxBoundaries(li, Seq("l_returnflag"),
      "l_extendedprice", 4)
    val seg = Skew.segmentByBoundaries(li, bounds, Seq("l_returnflag"),
      "l_extendedprice")
    val counts = seg.groupBy(col("l_returnflag"), col("segment"))
      .agg(count(lit(1)).as("n")).collect()

    // coverage: segment ids stay in 1..4 and no row is dropped
    assert(counts.map(_.getInt(1)).forall(s => s >= 1 && s <= 4))
    assert(counts.map(_.getLong(2)).sum == li.count())

    // balance: with accuracy >> group size the sketch is near-exact, so
    // each of the 4 segments holds ~25% of its group (±10% of the group,
    // slack for ties on duplicate prices)
    val totals = counts.groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getLong(2)).sum }
    counts.foreach { r =>
      val total = totals(r.getString(0)).toDouble
      val frac = r.getLong(2) / total
      assert(math.abs(frac - 0.25) <= 0.10,
        s"segment ${r.getInt(1)} of ${r.getString(0)} holds $frac")
    }
  }
}
