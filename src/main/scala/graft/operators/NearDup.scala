package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextAnalysis._

/** Near-duplicate detection for training-data curation: exact
  * (fingerprint group-by), n-gram Jaccard, MinHash + LSH banding, and
  * SimHash. The reference's dedup surface is `distinct` + MarkDuplicates
  * (`program/src/main/scala/hmushtaq/sparkga1/SparkGA1.scala:1241,822-851`);
  * these generalize it to *near*-duplicate text at corpus scale.
  *
  * Scale design:
  *  - Exact dedup = one hash shuffle on a 16-char fingerprint, not the
  *    full text (shuffle bytes ∝ 16B/doc, not doc size).
  *  - Jaccard is never all-pairs: pairs are generated either within a
  *    blocking key or from LSH candidates, both of which bound the
  *    quadratic blow-up. The inverted-index join (explode shingles →
  *    self-equi-join on shingle) lets Catalyst run it as a shuffled hash
  *    join; hot shingles (stopword-ish shingles shared by thousands of
  *    docs) should be dropped via a document-frequency cap first.
  *  - MinHash signatures are computed in ONE groupBy with k min()
  *    aggregates (map-side partial min ⇒ shuffle carries k×16 bytes per
  *    doc, independent of doc length). Banding then needs only an
  *    equi-join on (band, bandHash) — broadcast-free, skew handled by AQE.
  *  - All hashes are md5-derived hex strings: exact, engine-portable
  *    (same values in DuckDB/any SQL engine), and order-stable.
  */
object NearDup {

  /** Spread a (possibly few-partition) input across the cluster before
    * CPU-heavy per-row derivation: a small parquet file arrives as ONE
    * partition, which would serialize all hashing onto one core. No-op
    * cost at real scale (inputs already have ≥ shuffle-partitions
    * splits; Spark skips... the exchange still runs but is dwarfed by
    * the derivation it parallelizes).
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** (id, fingerprint) → canonical id per duplicate class + class size.
    * Exact near-dup: identical *normalized* text collapses together.
    */
  def exactDedupClasses(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("canonical_id"),
           count(lit(1)).as("class_size"))

  /** One row per (id [+ extra cols], DISTINCT shingle). `n`-token
    * shingles, derived with posexplode + window `lead` instead of
    * higher-order-function lambdas: HOFs run interpreted (no codegen, no
    * CSE) and measured 8× slower than this fully-codegen'd
    * explode → lead(1..n-1) → concat_ws pipeline. One exchange on the id
    * (the window) + one on the row (distinct) — both narrow rows.
    */
  def shingleRows(docs: DataFrame, idCol: String, extraCols: Seq[String],
                  textCol: String, n: Int): DataFrame = {
    val keep = col(idCol) +: extraCols.map(col)
    val tok = spread(docs).select(
      keep :+ posexplode(tokens(col(textCol))).as(Seq("_pos", "_tok")): _*)
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val parts = col("_tok") +:
      (1 until n).map(j => lead(col("_tok"), j).over(w))
    val guard = if (n > 1) lead(col("_tok"), n - 1).over(w).isNotNull
                else lit(true)
    tok.select(keep :+ concat_ws(" ", parts: _*).as("shingle")
               :+ guard.as("_full"): _*)
      .where(col("_full")).drop("_full")
      .distinct()
  }

  /** One row per (id, distinct shingle). `n`-token shingles. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    shingleRows(docs, idCol, Seq.empty, textCol, n)

  /** Exact pairwise n-gram Jaccard similarity ≥ `minJaccard`, restricted
    * to pairs sharing `blockCol` (blocking bounds the candidate space).
    *
    * Inverted-index formulation, single-shuffle variant: instead of a
    * self-equi-join on shingle (which scans + re-derives the shingle
    * table twice and shuffles it twice), group once per (block, shingle),
    * collect the sorted posting list, and emit ordered doc pairs with a
    * combinations expression. Pair volume is identical (Σ |posting|²/2),
    * but the expensive shingle derivation runs once and only posting
    * lists cross the wire. Hot shingles (stopword-grams with huge
    * postings) are the quadratic risk at corpus scale — cap them with
    * `maxDf` (drops shingles shared by more than maxDf docs; 0 = no cap,
    * exact semantics for oracle parity).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int, minJaccard: Double,
                   maxDf: Int = 0): DataFrame = {
    // shingleRows derives DISTINCT (id, blk, shingle) rows codegen'd; the
    // per-doc set size |A| rides along every row (one window pass), so
    // |A∪B| needs no extra join — the operator is the inverted-index
    // equi-join plus one aggregation. (A posting-list + combinations
    // formulation was measured 2× slower: materializing |posting|² pair
    // arrays allocates far more than the streamed shuffle join, and AQE
    // skew-handles the join for free.)
    //
    // persist is load-bearing: both join sides read the same derived
    // table — without it the tokenize/lead/distinct pipeline runs twice.
    // ~2× the text in size — disk-backed at scale.
    val sh = shingleRows(docs, idCol, Seq(blockCol), textCol, n)
      .withColumnRenamed(idCol, "id").withColumnRenamed(blockCol, "blk")
    // the maxDf cap applies BEFORE set sizes are counted, so the capped
    // universe is self-consistent: jaccard = |A∩B|/|A∪B| over surviving
    // shingles (counting n_sh first would divide a capped intersection
    // by uncapped sizes and systematically underestimate).
    val shCapped0 =
      if (maxDf > 0) {
        val w = Window.partitionBy(col("blk"), col("shingle"))
        sh.withColumn("_df", count(lit(1)).over(w))
          .where(col("_df") <= maxDf).drop("_df")
      } else sh
    val shCapped = shCapped0
      .withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy(col("id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = shCapped.select(col("blk"), col("shingle"), col("id").as("a"),
                            col("n_sh").as("na"))
    val b = shCapped.select(col("blk"), col("shingle"), col("id").as("b"),
                            col("n_sh").as("nb"))
    a.join(b, Seq("blk", "shingle"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_common"), col("jaccard"))
  }

  /** Portable 16-hex-char hash of a shingle under seed `i`. String min
    * over these is a valid MinHash (any injective-ish hash works); md5
    * keeps it engine-exact. Consecutive seed pairs share one md5
    * invocation (the two 16-hex halves of md5(shingle#⌊i/2⌋) are
    * independent bit ranges) — halves the hashing cost of a k-wide
    * signature, the dominant cost of MinHash at corpus scale.
    */
  def seededHash(shingle: Column, seed: Int): Column =
    substring(md5(concat(shingle, lit("#" + seed / 2))),
      1 + 16 * (seed % 2), 16)

  /** MinHash signature: one column `mh0..mh{k-1}` per seed, computed in a
    * single groupBy (k map-side partial mins — one shuffle of k×16B/doc).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    val sh = shingleRows(docs, idCol, Seq.empty, textCol, shingleN)
    val aggs = (0 until k).map(i =>
      min(seededHash(col("shingle"), i)).as(s"mh$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a k-wide signature: `bands` bands of k/bands rows;
    * band hash = md5 of the concatenated minhashes. Docs sharing any
    * (band, bandHash) are candidate near-duplicates.
    * Returns (id, band, band_hash).
    */
  def lshBands(sigs: DataFrame, idCol: String, k: Int, bands: Int)
      : DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (0 until r).map(i => col(s"mh${b * r + i}")): _*))
          .as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("bh"))
      .select(col(idCol), col("bh.band").as("band"),
              col("bh.band_hash").as("band_hash"))
  }

  /** Candidate pairs from LSH banding + estimated Jaccard =
    * (matching minhash components) / k.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            shingleN: Int, k: Int, bands: Int): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleN, k).cache()
    val bandsDf = lshBands(sigs, idCol, k, bands)
    val pairs = bandsDf.select(col("band"), col("band_hash"),
        col(idCol).as("a"))
      .join(bandsDf.select(col("band"), col("band_hash"), col(idCol).as("b")),
        Seq("band", "band_hash"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val sa = sigs.select(col(idCol).as("a") +:
      (0 until k).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
    val sb = sigs.select(col(idCol).as("b") +:
      (0 until k).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
    val nMatch = (0 until k)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a"), col("b"),
        round(nMatch.cast("double") / k, 6).as("est_jaccard"))
  }

  /** 16-bit SimHash per document from token md5s: one explode + one
    * groupBy with 16 sum() aggregates (map-side combined), then bit-pack.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = spread(docs)
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), explode(col("_toks")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val sums = (0 until 16).map(p =>
      sum(simhashBitContribution(col("h"), p)).as(s"s$p"))
    val packed = (0 until 16)
      .map(p => when(col(s"s$p") > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
    tok.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
      .select(col(idCol), packed.cast("int").as("simhash"))
  }
}
