package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.Components

/** Builder tooling (r18): phase decomposition of the pinned-round
  * iterative protocol on q113's graph — times each piece (edge build,
  * node count, linked materialize, init pin, per-round pin, final
  * sort) so the optimization targets the measured wall, not a guess.
  * Replicates Graph.pageRank inline with timers; REads the same data
  * the query reads. Usage: runMain graft.IterDecomp [sfDir] [reps]
  */
object IterDecomp {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[iterdecomp] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (rep <- 1 to reps) {
      System.err.println(s"=== rep $rep ===")
      val edges0 = GraftSession.table(spark, sf, "lineitem")
        .filter(col("l_orderkey").isNotNull)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_linenumber").as("ln"),
          col("l_partkey").as("pk"))).as("_it"))
        .select(explode(expr(
          "flatten(transform(_it, a -> transform(" +
            "filter(_it, b -> b.ln = a.ln + 1), " +
            "b -> named_struct('src', a.pk, 'dst', b.pk))))")).as("_e"))
        .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
        .where(col("src") =!= col("dst"))
      val e = edges0
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("edge dedup materialize")(e.count())
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = t("nodes count")(nodes.count().toDouble)
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val linked = e.join(outdeg, "src")
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("linked materialize")(linked.count())
      var ranks = t("init pin")(Components.pin(
        nodes.select(col("id"), lit(1.0 / n).as("pr")), reliable = false))
      for (i <- 1 to 3) {
        val contrib = linked
          .join(ranks.select(col("id").as("src"), col("pr")), "src")
          .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("inmass"))
        val stepped = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(0.15 / n) + lit(0.85) *
              coalesce(col("inmass"), lit(0.0))).as("pr"))
        val next = t(s"round $i pin")(Components.pin(stepped, reliable = false))
        Components.releasePin(ranks, reliable = false)
        ranks = next
      }
      t("final round+sort+noop") {
        ranks.select(col("id"), round(col("pr"), 9).as("pr"))
          .orderBy(col("id"))
          .write.format("noop").mode("overwrite").save()
      }
      e.unpersist(false); nodes.unpersist(false); linked.unpersist(false)
      Components.releasePin(ranks, reliable = false)
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
