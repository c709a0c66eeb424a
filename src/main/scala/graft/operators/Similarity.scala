package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and
  * an IVF (inverted-file / coarse-quantization) variant as the scale path.
  *
  * Scale design:
  *  - Cosine is a pure higher-order-function expression (`zip_with` +
  *    `aggregate` over doubles) — codegen-adjacent, no UDF, no Python.
  *  - Brute force: queries are broadcast (a query batch is small);
  *    the corpus never shuffles; per-query top-k is a window row_number.
  *    Note the window shuffles |Q|×|corpus| scored rows on query_id —
  *    acceptable for small query batches; shrink the candidate set with
  *    `ivfTopK` before brute-forcing when the corpus is large.
  *  - IVF: vectors are pre-assigned to their nearest centroid (one
  *    broadcast join + argmin — a linear scan over c centroids); a query
  *    probes only its own cluster ⇒ the candidate set shrinks by ~c×.
  *    Centroid assignment doubles as a partitioning key, so cluster files
  *    can be partition-pruned on read at 100 TB.
  */
object Similarity {

  /** Sum over element-wise product of two float-array columns, in double
    * arithmetic, left-to-right (deterministic, engine-portable).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns (double arithmetic).
    * CAVEAT: a zero-norm vector yields NaN, and both Spark and DuckDB
    * order NaN above every double — a zero vector in the corpus would
    * rank as everyone's nearest neighbor. Filter with `nonZeroNorm`
    * upstream if zero vectors can occur.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Predicate: the vector has a non-zero norm (guards cosine's NaN). */
  def nonZeroNorm(v: Column): Column = dot(v, v) > 0d

  /** Exact brute-force top-k: for each query vector, the k most cosine-
    * similar corpus vectors (excluding itself when ids collide).
    * `queries` is broadcast — keep query batches small (≤ ~10⁴ rows).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
                           col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("cand_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"),
              round(col("sim"), 6).as("sim"))
  }

  /** Assign each vector to its nearest centroid by cosine (IVF coarse
    * quantization). `centroids` must be small (broadcast). Adds
    * `centroid_id`.
    *
    * Argmax is a `max_by` aggregate, not a window: the per-vector best
    * centroid partial-aggregates MAP-SIDE, so only one row per vector
    * crosses the wire — a row_number window would shuffle the full
    * |vectors|×|centroids| scored cross product first, which at 1B
    * vectors × 256 centroids is the dominant cost of IVF assignment.
    * Tie-break matches `ORDER BY csim DESC, centroid_id ASC`.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    // tie-break via -centroid_id needs a numeric id (a string id would
    // implicitly cast to null and silently lose determinism)
    require(centroids.schema(idCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"ivfAssign requires a numeric $idCol for a deterministic tie-break")
    val cents = centroids.select(col(idCol).as("centroid_id"),
                                 col(vecCol).as("centv"))
    val payload = vectors.columns.filterNot(_ == idCol)
    vectors.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col(vecCol), col("centv")))
      .groupBy(col(idCol))
      .agg(max_by(
        struct((payload.map(col) :+ col("centroid_id")): _*),
        struct(col("csim"), -col("centroid_id"))).as("_best"))
      .select(col(idCol) +:
        (payload :+ "centroid_id").map(c => col(s"_best.$c").as(c)): _*)
  }

  /** One Lloyd (k-means) iteration over an embedding corpus: assign every
    * vector to its nearest centroid, then recompute per-cluster
    * element-wise means. Returns the LONG form (centroid_id, pos, mean,
    * n_members), pos 1-based — scalar rows that cross-check exactly
    * against any engine; pack with `collect_list(struct(pos, mean))` when
    * an array is needed. Scale shape: one broadcast (centroids), one
    * map-side-combined aggregation over |vectors|×dim rows — no shuffle
    * of the raw vectors beyond the agg exchange.
    */
  def kmeansIter(vectors: DataFrame, centroids: DataFrame, idCol: String,
                 vecCol: String): DataFrame = {
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol)
    assigned
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("p", "x")))
      .groupBy(col("centroid_id"), (col("p") + 1).as("pos"))
      .agg(round(avg(col("x").cast("double")), 6).as("mean"),
           count(lit(1)).as("n_members"))
  }

  /** Embedding-cosine near-duplicate pairs — the fifth dedup modality
    * (exact / Jaccard / MinHash / SimHash live in NearDup). Candidate
    * pairs are generated WITHIN an IVF cell only: near-identical vectors
    * assign to the same nearest centroid, so recall at high thresholds
    * is ≈1 while the pair space shrinks from |V|²/2 to Σ|cell|²/2 —
    * never all-pairs, and the cell equi-join shuffles on centroid_id
    * (AQE splits a skewed cell). At 100 TB, raise the centroid count so
    * cells stay ~10⁴–10⁵ vectors (cells² work per cell); the same
    * centroid set then serves ivfTopK probes and dedup.
    */
  def cosineNearDupPairs(vectors: DataFrame, centroids: DataFrame,
                         idCol: String, vecCol: String,
                         minCosine: Double): DataFrame = {
    val assigned = ivfAssign(vectors, centroids, idCol, vecCol)
    val a = assigned.select(col("centroid_id"), col(idCol).as("a"),
                            col(vecCol).as("av"))
    val b = assigned.select(col("centroid_id"), col(idCol).as("b"),
                            col(vecCol).as("bv"))
    a.join(b, Seq("centroid_id"))
      .where(col("a") < col("b"))
      // round BEFORE thresholding (both engines see the same 6-dp value,
      // so the cut never flips on a last-ulp difference)
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .where(col("sim") >= minCosine)
      .select(col("a"), col("b"), col("centroid_id"), col("sim"))
  }

  /** IVF ANN top-k: probe only the query's own cluster. Recall < 1 by
    * design (that's the approximation); nprobe>1 = relax the centroid
    * rank filter.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val corpusAssigned = ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
              col("centroid_id"))
    val queriesAssigned = ivfAssign(queries, centroids, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
              col("centroid_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("cand_id"))
    corpusAssigned.join(broadcast(queriesAssigned), Seq("centroid_id"))
      .where(col("query_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("rnk"),
              round(col("sim"), 6).as("sim"))
  }
}
