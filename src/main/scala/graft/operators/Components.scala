package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the dedup
  * endgame: pair emitters ([[NearDup.jaccardPairs]], minhash/simhash/
  * winnow candidates) find EDGES, but the curation decision ("keep one
  * doc per duplicate class") needs the transitive closure, because near-
  * duplication chains (A≈B, B≈C, A̸≈C ⇒ {A,B,C} is one class). The
  * reference's MarkDuplicates analog collapses exact-key groups only
  * (program/src/main/scala/hmushtaq/sparkga1/SparkGA1.scala:822-851);
  * this generalizes to the graph closure.
  *
  * Algorithm: distributed hash-min label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * label and its neighbors' labels; fixpoint = every node carries the
  * min id of its component. Each round is ONE shuffle join (edges ×
  * labels) + ONE min-aggregate — both hash-partitioned on the same id
  * key, so consecutive rounds reuse the partitioning. Labels persist
  * per round (MEMORY_AND_DISK) and the previous round unpersists, so
  * lineage stays one round deep — no recursive plan blow-up.
  *
  * SCALE: rounds = graph diameter. Near-dup graphs are piles of small
  * dense clusters (LSH buckets emit cliques), so diameter is small —
  * single digits even at corpus scale — and the per-round shuffle
  * volume is O(|pairs|), which near-dup emitters already bound far
  * below corpus size. The convergence probe (`limit(1)` over changed
  * labels) short-circuits at the first change and rides the persisted
  * frames. For adversarially chain-shaped graphs (diameter ~ n: linked
  * lists, road networks — not dedup output), switch to alternating
  * large-star/small-star contraction (Kiveris et al., SoCC 2014), which
  * converges in O(log n) rounds with the same join+min building blocks;
  * `maxRounds` is the guard that turns a mis-shaped input into an error
  * instead of an unbounded job.
  */
object Components {

  /** (id, component) for every node appearing in `edges`, where
    * `component` is the smallest node id reachable over the undirected
    * edge list. Ids must be non-null; self-loops and duplicate edges are
    * harmless (min() absorbs them).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 25): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // symmetric closure once; both propagation joins read it
    val sym = edges.select(col(aCol).as("s"), col(bCol).as("d"))
      .union(edges.select(col(bCol).as("s"), col(aCol).as("d")))
      .persist(lvl)
    var labels = sym.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
      .persist(lvl)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val prop = sym
        .join(labels.select(col("id").as("s"), col("lab")), Seq("s"))
        .select(col("d").as("id"), col("lab"))
      val next = prop.union(labels)
        .groupBy(col("id")).agg(min(col("lab")).as("lab"))
        .persist(lvl)
      // pin the whole round in cache BEFORE the previous round
      // unpersists — the limit(1) probe alone may materialize only some
      // partitions, and a partially-cached round would recompute through
      // the unpersisted chain next iteration
      next.count()
      // labels only ever decrease, so "no label changed" = fixpoint.
      // Both sides are hash-partitioned on id (groupBy output) — the
      // probe join adds no exchange, and limit(1) stops at first change.
      val changed = next
        .join(labels.withColumnRenamed("lab", "prev"), Seq("id"))
        .where(col("lab") =!= col("prev"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0L
      round += 1
    }
    sym.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxRounds rounds — " +
        "input is not dedup-shaped (huge diameter); use star contraction")
    labels.select(col("id"), col("lab").as("component"))
  }

  /** Every doc labeled with its duplicate-class representative:
    * (idCol, component, cluster_size). Docs in no pair are singleton
    * classes (component = own id, cluster_size = 1). Downstream, "keep
    * one per class" is `where(col(idCol) === col("component"))` — the
    * representative is the class min, chosen deterministically.
    *
    * The label join-back broadcasts when the pair graph is small (AQE
    * decides); cluster_size is one window count over the component key
    * — a single extra exchange on a #docs-row frame of two longs.
    */
  def duplicateClusters(docs: DataFrame, pairs: DataFrame,
                        idCol: String, aCol: String = "a",
                        bCol: String = "b"): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
    docs.select(col(idCol))
      .join(labels, docs(idCol) === labels("id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
  }
}
