package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** (id, fingerprint) → canonical id per duplicate class + class size.
    * Exact near-dup: identical *normalized* text collapses together.
    */
  def exactDedupClasses(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("canonical_id"),
           count(lit(1)).as("class_size"))

  /** One row per (id, distinct shingle). `n`-token shingles. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(wordShingles(col(textCol), n))).as("shingle"))

  /** Exact pairwise n-gram Jaccard similarity ≥ `minJaccard`, restricted
    * to pairs sharing `blockCol` (blocking bounds the candidate space).
    * Inverted-index formulation: |A∩B| via shingle equi-join, |A∪B| from
    * per-doc shingle counts.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int, minJaccard: Double): DataFrame = {
    val sh = docs.select(col(idCol), col(blockCol),
      explode(array_distinct(wordShingles(col(textCol), n))).as("shingle"))
    val counts = sh.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(blockCol).as("blk"), col(idCol).as("a"),
                      col("shingle"))
    val b = sh.select(col(blockCol).as("blk"), col(idCol).as("b"),
                      col("shingle"))
    val common = a.join(b, Seq("blk", "shingle"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(counts.select(col(idCol).as("a"), col("n_sh").as("na")), Seq("a"))
      .join(counts.select(col(idCol).as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_common"), col("jaccard"))
  }

  /** Portable 16-hex-char hash of a shingle under seed `i`. String min
    * over these is a valid MinHash (any injective-ish hash works); md5
    * keeps it engine-exact.
    */
  def seededHash(shingle: Column, seed: Int): Column =
    substring(md5(concat(shingle, lit("#" + seed))), 1, 16)

  /** MinHash signature: one column `mh0..mh{k-1}` per seed, computed in a
    * single groupBy (k map-side partial mins — one shuffle of k×16B/doc).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleN)
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
    val tok = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("tok"))
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
