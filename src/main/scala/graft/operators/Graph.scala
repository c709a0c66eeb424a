package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph-signal operators for corpus curation: link-graph authority
  * scoring (PageRank). A domain/page authority prior is a standard
  * crawl-curation quality signal (Common Crawl publishes harmonic +
  * PageRank centrality rankings for exactly this use); together with
  * [[Components]] (duplicate-class closure) this gives the engine its
  * iterative-graph family. The reference has no graph analog — this is
  * training-pipeline surface, like NearDup/Similarity.
  *
  * The iterative protocol mirrors `Components.scala`: eager
  * `localCheckpoint` per round keeps the plan O(1) instead of a
  * k-rounds-deep lineage (the reference's analog is its
  * materialize-between-parts protocol, runAll.py:37-44).
  */
object Graph {

  /** Simplified PageRank with a FIXED iteration count:
    *
    * {{{ pr_{k+1}(v) = (1-d)/N + d * Σ_{u→v} pr_k(u) / outdeg(u) }}}
    *
    * No dangling-mass redistribution — a sink node's mass leaves the
    * system (the common "pseudo-PageRank" simplification) — so the
    * recurrence is a pure join+agg both this code and an unrolled SQL
    * oracle can state identically. Multi-edges collapse (simple graph);
    * the node universe is every id appearing as src or dst.
    *
    * Scale design:
    *  - The edge table is joined with out-degrees ONCE, pre-partitioned
    *    on src, and persisted — every round's contribution join reuses
    *    that partitioning; only the (small) rank table moves per round.
    *  - Each round is exactly two shuffles (rank join + dst aggregation)
    *    over O(|E|) rows, map-side-combined; no collect of anything
    *    graph-sized. The one driver-side scalar is N (a count — same
    *    contract as Similarity's centroid collect).
    *  - Eager checkpoint per round (Components' `pin`) truncates
    *    lineage; superseded rounds' blocks are released eagerly
    *    (`releasePin`). `reliable = true` swaps executor-local blocks
    *    for the context checkpoint dir (executor-loss recovery at
    *    cluster scale — same contract as Components).
    *
    * Returns (id, pr) with Σ pr ≤ 1 (equality iff no sinks).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85,
               reliable: Boolean = false): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // persisted: nodes, outdeg and linked all derive from the distinct
    // — uncached, each would re-pay the dedup shuffle
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
              col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble // driver scalar, O(1) bytes
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val linked = e.join(outdeg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = Components.pin(
      nodes.select(col("id"), lit(1.0 / n).as("pr")), reliable)
    for (_ <- 1 to iterations) {
      val contrib = linked
        .join(ranks.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inmass"))
      val next = Components.pin(
        nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit((1 - damping) / n) +
             lit(damping) * coalesce(col("inmass"), lit(0.0))).as("pr")),
        reliable)
      // release the superseded round's blocks NOW (Components rule)
      Components.releasePin(ranks, reliable)
      ranks = next
    }
    e.unpersist(false)
    nodes.unpersist(false)
    linked.unpersist(false)
    ranks
  }
}
