package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample()` is seed-dependent per partition layout — re-running on a
  * repartitioned table yields a different sample, which is unacceptable
  * for reproducible dataset releases. Hash sampling keys the decision on
  * a content hash: the same row is in or out forever, on any engine, at
  * any parallelism. Decision is a pure codegen'd expression at the scan
  * (pushdown-friendly), so sampling 1% of 100 TB reads cheaply and
  * reproducibly.
  */
object Sampling {

  /** Keep rows whose md5(key) falls below `threshold256` / 256 — e.g.
    * 51 ≈ 20%. Comparison is on the first two hex chars (fixed-length
    * lowercase, so string order == numeric order).
    */
  def hashSamplePredicate(key: Column, threshold256: Int): Column = {
    require(threshold256 >= 0 && threshold256 <= 256)
    if (threshold256 == 256) lit(true) // "100" would compare as a string
    else substring(md5(key.cast("string")), 1, 2) < lit(f"$threshold256%02x")
  }

  def hashSample(df: DataFrame, keyCol: String, threshold256: Int)
      : DataFrame =
    df.where(hashSamplePredicate(col(keyCol), threshold256))

  /** Per-stratum rates: e.g. downsample over-represented sources.
    * `rates` maps stratum value → threshold256; strata not listed use
    * `defaultThreshold256`.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
                           stratumCol: String, rates: Map[String, Int],
                           defaultThreshold256: Int): DataFrame = {
    require((rates.values ++ Seq(defaultThreshold256)).forall(t =>
      t >= 0 && t <= 256))
    val threshold = rates.foldLeft(lit(defaultThreshold256)) {
      case (acc, (stratum, t)) =>
        when(col(stratumCol) === stratum, lit(t)).otherwise(acc)
    }
    df.where(threshold === 256 ||
      substring(md5(col(keyCol).cast("string")), 1, 2) <
        lower(lpad(hex(threshold), 2, "0")))
  }
}
