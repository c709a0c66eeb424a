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
  /** Rows with a NULL key are always excluded — sampling requires an
    * identity to hash (consistent across every threshold, including 256).
    */
  def hashSamplePredicate(key: Column, threshold256: Int): Column = {
    require(threshold256 >= 0 && threshold256 <= 256)
    if (threshold256 == 256) key.isNotNull // "100" compares wrong as hex
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
    // one predicate per stratum, each compiled through the same
    // constant-folded encoding as hashSamplePredicate — no per-row hex
    // formatting, one code path for the threshold rule.
    val predicate = rates.foldLeft(
      hashSamplePredicate(col(keyCol), defaultThreshold256)) {
      case (acc, (stratum, t)) =>
        when(col(stratumCol) === stratum,
          hashSamplePredicate(col(keyCol), t)).otherwise(acc)
    }
    df.where(predicate)
  }

  /** Rebalance the corpus to a target source MIXTURE — the "N parts
    * web, M parts code, K parts books" step of assembling a training
    * set. `targetParts` gives integer mixture weights per stratum;
    * strata not listed are dropped. The largest corpus consistent with
    * the mixture keeps the binding stratum whole and downsamples the
    * rest: nMax = min over s of (n_s · totalParts / w_s), then stratum
    * s keeps w_s · nMax / totalParts rows via the deterministic hash
    * predicate. All threshold arithmetic is integer (floor division,
    * /256 rate granularity) so any engine derives identical thresholds
    * — no float rounding divergence.
    *
    * Scale shape: one map-side-combined count per stratum (a
    * #strata-row driver scalar, dozens at 100 TB — same contract as
    * the skew-average collect), then the same scan-stage predicate as
    * [[stratifiedHashSample]]. The corpus itself never shuffles.
    */
  def mixtureSample(df: DataFrame, keyCol: String, stratumCol: String,
                    targetParts: Map[String, Long]): DataFrame = {
    require(targetParts.nonEmpty && targetParts.values.forall(_ > 0),
      "mixture parts must be positive")
    val total = targetParts.values.sum
    val counts = df
      .where(col(stratumCol).isin(targetParts.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targetParts.filter { case (s, _) => counts.contains(s) }
    require(present.nonEmpty, "no target stratum present in the corpus")
    val nMax = present.map { case (s, w) => counts(s) * total / w }.min
    val thresholds = present.map { case (s, w) =>
      s -> math.min(256L, 256L * w * nMax / (total * counts(s))).toInt
    }
    stratifiedHashSample(
      df.where(col(stratumCol).isin(present.keys.toSeq: _*)),
      keyCol, stratumCol, thresholds, defaultThreshold256 = 0)
  }

  /** LEAKAGE-SAFE train/val/test split: the assignment is keyed on the
    * duplicate-CLASS representative ([[Components.duplicateClusters]]'
    * component), not the document id, so a near-duplicate of a training
    * document can never land in eval — the contamination path a plain
    * per-doc hash split leaves open (doc A trains, its 98%-identical
    * copy B inflates eval). Returns duplicateClusters' (id, component,
    * cluster_size) plus `split` ∈ {train, val, test}: md5(component)
    * hex buckets [0, train256), [train256, train256+val256), rest of
    * 256 — the [[hashSamplePredicate]] determinism story (same class,
    * same split, any engine, any parallelism, forever).
    *
    * SCALE SHAPE: the closure is the [[Components]] cost (bounded
    * rounds, O(1) pinned plans); the split itself is one scan-stage
    * CASE over the labeled table — no shuffle beyond
    * duplicateClusters' own.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       train256: Int, val256: Int,
                       aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(train256 >= 0 && val256 >= 0 && train256 + val256 <= 256,
      "train256 + val256 must be within 256")
    val h = substring(md5(col("component").cast("string")), 1, 2)
    // bound 256 formats as "100", which hex-string-compares WRONG —
    // an exhausted budget means "everything below" (hashSamplePredicate's
    // same edge)
    def below(bound: Int): Column =
      if (bound >= 256) lit(true) else h < lit(f"$bound%02x")
    Components.duplicateClusters(docs, pairs, idCol, aCol, bCol)
      .withColumn("split",
        when(below(train256), lit("train"))
          .when(below(train256 + val256), lit("val"))
          .otherwise(lit("test")))
  }

  /** WEIGHTED sample WITHOUT replacement, deterministic (Efraimidis &
    * Spirakis 2006, "A-ES"): every row gets priority u^(1/w) where u is
    * an md5-derived uniform in [0,1) and w its weight; the k largest
    * priorities are exactly a without-replacement sample with inclusion
    * odds proportional to w. Same reproducibility contract as
    * [[hashSamplePredicate]]: the hash replaces the RNG, so the sample
    * is identical on any engine, at any parallelism, forever.
    *
    * ENGINE PARITY: u = (60-bit md5 prefix)/2^60 is bit-exact anywhere;
    * pow() can differ by an ulp between libm and the JVM, so the
    * priority is ROUNDED to 6 places and ties break on the key — the
    * selected SET can only diverge if two rounded priorities straddle a
    * rounding boundary by < 1 ulp (~1e-10 odds corpus-wide).
    *
    * SCALE SHAPE: priorities are scan-stage arithmetic; the selection
    * is a top-k, which Catalyst plans as TakeOrderedAndProject — a
    * per-partition k-heap plus a k-row gather, never a global sort
    * (plan-pinned, the q6 property). k rows hit the driver-side gather
    * by definition of top-k; keep k bounded (samples, not exports —
    * exports go through [[tokenBudgetSample]] or the hash predicates).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
                     k: Int, seed: String): DataFrame = {
    require(k >= 1, "k must be positive")
    val u = conv(substring(md5(
        concat(lit(seed + ":"), col(keyCol).cast("string"))), 1, 15),
        16, 10).cast("long").cast("double") / lit(1.152921504606846976e18)
    df.withColumn("priority",
        round(pow(u, lit(1.0) / weightCol.cast("double")), 6))
      .orderBy(desc("priority"), col(keyCol))
      .limit(k)
  }

  /** DISTRIBUTION-MATCHING sample: thin `target` so its histogram over
    * `bucketCol` matches `ref`'s shape — "make the web crawl's length
    * (or score) distribution look like the curated set's" resampler.
    * Per-bucket keep rate ∝ p_ref(b)/p_target(b), normalized so the
    * binding bucket (largest ratio) is kept whole; buckets `ref` never
    * exhibits drop entirely. Selection inside a bucket is the md5
    * uniform (same determinism contract as [[hashSamplePredicate]]:
    * engine- and parallelism-independent, forever).
    *
    * ENGINE PARITY: the corpus totals cancel under the max
    * normalization — keep_b = (cr_b/ct_b) / max_b(cr_b/ct_b) — so the
    * rate is a ratio of exact integer counts in one parenthesization;
    * any IEEE engine computes the identical double.
    *
    * SCALE SHAPE: two map-side-combined histogram aggregations (bucket
    * cardinality rows each), one tiny join + window over the bucket
    * table, then a broadcast of per-bucket thresholds into a scan-stage
    * predicate on `target`. The corpus shuffles ZERO rows.
    */
  def matchDistribution(target: DataFrame, ref: DataFrame,
                        keyCol: String, bucketCol: Column,
                        seed: String): DataFrame = {
    val tb = target.withColumn("_b", bucketCol)
    val ht = tb.groupBy(col("_b")).agg(count(lit(1)).as("_ct"))
    val hr = ref.select(bucketCol.as("_b"))
      .groupBy(col("_b")).agg(count(lit(1)).as("_cr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val rates = ht.join(hr, "_b")
      .withColumn("_r",
        col("_cr").cast("double") / col("_ct").cast("double"))
      .withColumn("_keep", col("_r") / max(col("_r")).over(w))
      .select(col("_b"), col("_keep"))
    val u = conv(substring(md5(
        concat(lit(seed + ":"), col(keyCol).cast("string"))), 1, 15),
        16, 10).cast("long").cast("double") / lit(1.152921504606846976e18)
    tb.join(broadcast(rates), "_b")
      .where(u < col("_keep"))
      .drop("_b", "_keep")
  }

  /** TOKEN-BUDGET sample — "assemble exactly an N-token training mix":
    * documents are taken in deterministic md5(key) order until the
    * cumulative token count would exceed `budget` (a doc is kept iff
    * its INCLUSIVE running total fits). Fraction-based sampling can't
    * hit a token target — doc lengths vary by orders of magnitude —
    * and nondeterministic order would make the mix unreproducible;
    * this is exact and engine-replayable (one window cumsum in SQL).
    *
    * SCALE SHAPE: an exact prefix-by-order is inherently sequential AT
    * THE BOUNDARY, so the order is split on the hash's first 4 hex
    * chars into 65,536 buckets: one map-side-combined aggregate gives
    * per-bucket token sums, the driver prefix-sums 65,536 longs (a
    * bounded driver step, same contract as IVF's centroid collect) to
    * find the cut bucket, and only THAT bucket — 1/65536 of the corpus,
    * ~1.5 GB of metadata at 100 TB — pays a within-bucket window
    * cumsum. Everything before the cut bucket is a scan-stage
    * predicate; everything after is filtered at the scan.
    */
  def tokenBudgetSample(docs: DataFrame, keyCol: String,
                        tokenCountCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = docs.sparkSession
    val withH = docs.select(col(keyCol),
      tokenCountCol.cast("long").as("n_tokens"),
      md5(col(keyCol).cast("string")).as("_h"))
      .withColumn("_b", substring(col("_h"), 1, 4))
    val bucketSums = withH.groupBy(col("_b"))
      .agg(sum(col("n_tokens")).as("_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    var used = 0L
    var cut = "" // first bucket whose full sum would blow the budget
    var priorUsed = 0L
    val it = bucketSums.iterator
    var done = false
    while (it.hasNext && !done) {
      val (b, s) = it.next()
      if (used + s > budget) { cut = b; priorUsed = used; done = true }
      else used += s
    }
    if (!done) {
      // every bucket fits: the whole corpus is within budget
      withH.select(col(keyCol), col("n_tokens"))
    } else {
      val before = withH.where(col("_b") < cut)
        .select(col(keyCol), col("n_tokens"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_b")).orderBy(col("_h"))
      val boundary = withH.where(col("_b") === cut)
        .withColumn("_cum", sum(col("n_tokens")).over(wb))
        .where(col("_cum") <= budget - priorUsed)
        .select(col(keyCol), col("n_tokens"))
      before.unionByName(boundary)
    }
  }

  /** Deterministic FRACTIONAL upsampling — the other half of mixture
    * building: small high-quality sources get repeated (epochs > 1),
    * possibly by a non-integer factor. factor = num/den: every row is
    * emitted floor(num/den) times, and the hash-selected fraction
    * (num mod den)/den of rows once more, so corpus-level volume lands
    * on factor × |rows| (to /256 rate granularity) and re-runs emit
    * byte-identical copies. Output adds `copy_id` (1-based) so
    * downstream shuffles can spread the copies.
    *
    * Scale shape: a scan-stage `explode(sequence(...))` — per-row fanout
    * with no shuffle and no driver involvement; the repeat decision is
    * the same codegen'd md5 predicate as [[hashSamplePredicate]].
    */
  def upsample(df: DataFrame, keyCol: String, factorNum: Int,
               factorDen: Int): DataFrame = {
    require(factorNum > 0 && factorDen > 0, "factor must be positive")
    val base = factorNum / factorDen
    val fracThreshold256 = ((factorNum % factorDen) * 256L /
      factorDen).toInt
    val copies = lit(base) +
      when(hashSamplePredicate(col(keyCol), fracThreshold256), 1)
        .otherwise(0)
    df.withColumn("_n_copies", copies)
      .where(col("_n_copies") > 0)
      .withColumn("copy_id",
        explode(sequence(lit(1), col("_n_copies"))))
      .drop("_n_copies")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling:
    * walk the md5-shuffled population once with a fixed stride of
    * `total_weight / n` and emit every item the stride lands in —
    * the classic exact-weighted design (an item of weight w is
    * selected with probability n·w/W, items with w ≥ W/n are
    * selected with certainty, possibly with multiplicity > 1, which
    * `hits` reports). ALL-INTEGER: the "did a stride boundary fall
    * inside this item's weight interval" test is
    * {{{ hits = (cum·n) DIV W − ((cum − w)·n) DIV W }}}
    * so the draw is engine-exact and reproducible — no float
    * thresholds, no RNG state (md5 order is the determinism contract
    * shared with every sampler in this file). This is the exact
    * counterpart to [[weightedSample]]'s keep-rate model: that one
    * targets expected proportions, this one pins the SELECTED SET.
    *
    * SCALE SHAPE — tokenBudgetSample's HASH-PREFIX decomposition, not
    * the sampled range partitioner: buckets are the first 2 hex chars
    * of the md5 key (256 deterministic, uniform buckets whose order
    * refines into the key order), the per-bucket cumsum is one
    * window, and the 256-row offset table derives from a PURE
    * AGGREGATE of the input — so the two plan branches that consume
    * the bucketing can never disagree. (A `repartitionByRange` here
    * samples boundaries per evaluation; with the offset branch and
    * the row branch evaluating independently, one recorded run
    * produced overlapping cum intervals and a 501-row "500-item"
    * sample. Deterministic bucketing removes that failure mode
    * structurally.) The population total W is a one-row aggregate
    * broadcast. Nothing driver-side. Caller contract: `idCol` unique
    * (md5 order total) and W·n fits a long.
    */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String,
                    n: Long): DataFrame = {
    require(n >= 1, "n must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol),
        col(weightCol).cast("long").as("_w"),
        md5(col(idCol).cast("string")).as("_h"))
      .where(col("_w") > 0)
      .withColumn("_b", substring(col("_h"), 1, 2))
    val tot = base.agg(sum(col("_w")).as("_tot"))
    val wIn = Window.partitionBy(col("_b")).orderBy(col("_h"))
    val withCum = base.withColumn("_cumIn", sum(col("_w")).over(wIn))
    // exclusive prefix of per-bucket totals — an aggregate of the
    // INPUT (not of the window output), re-evaluation-stable
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("_b"))
      .agg(sum(col("_w")).as("_pt"))
      .withColumn("_off", coalesce(sum(col("_pt")).over(wOff), lit(0L)))
      .select(col("_b"), col("_off"))
    withCum.join(broadcast(offsets), "_b")
      .crossJoin(broadcast(tot))
      .withColumn("_cum", col("_cumIn") + col("_off"))
      .withColumn("hits",
        expr(s"(_cum * $n) DIV _tot - ((_cum - _w) * $n) DIV _tot"))
      .where(col("hits") >= 1)
      .select(col(idCol), col("_w").as("weight"), col("hits"))
  }
}
