package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder tooling (r18): in-session A/B of the two edge-build
  * formulations (pre-r18 self-join vs r18 basket in-row expansion) at
  * any scale point, interleaved so host phase cancels. Times the edge
  * multiset materialization (noop sink after a distinct, the shape the
  * graph operators consume).
  *
  * Usage: runMain graft.EdgeAB [sfDir] [reps] [adjacent|pairs]
  */
object EdgeAB {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val mode = if (args.length > 2) args(2) else "adjacent"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val li0 = GraftSession.table(spark, sf, "lineitem")

    def joinAdjacent(): DataFrame = {
      val li = li0.select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"), col("l_partkey").as("pk"))
      val nxt = li.select(col("ok"), (col("ln") - 1).as("ln"),
        col("pk").as("dst_pk"))
      li.join(nxt, Seq("ok", "ln"))
        .where(col("pk") =!= col("dst_pk"))
        .select(col("pk").as("src"), col("dst_pk").as("dst"))
    }
    def basketAdjacent(): DataFrame =
      li0.filter(col("l_orderkey").isNotNull)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_linenumber").as("ln"),
          col("l_partkey").as("pk"))).as("_it"))
        .select(explode(expr(
          "flatten(transform(_it, a -> transform(" +
            "filter(_it, b -> b.ln = a.ln + 1), " +
            "b -> named_struct('src', a.pk, 'dst', b.pk))))")).as("_e"))
        .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
        .where(col("src") =!= col("dst"))
    def joinPairs(): DataFrame = {
      val li = li0.select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"), col("l_partkey").as("pk"))
      val other = li.select(col("ok"), col("ln").as("ln2"),
        col("pk").as("pk2"))
      li.join(other, Seq("ok"))
        .where(col("ln") < col("ln2") && col("pk") =!= col("pk2"))
        .select(least(col("pk"), col("pk2")).as("u"),
          greatest(col("pk"), col("pk2")).as("v"))
    }
    def basketPairs(): DataFrame =
      li0.filter(col("l_orderkey").isNotNull)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_linenumber").as("ln"),
          col("l_partkey").as("pk"))).as("_it"))
        .select(explode(expr(
          "flatten(transform(_it, a -> transform(" +
            "filter(_it, b -> a.ln < b.ln AND NOT (a.pk = b.pk)), " +
            "b -> named_struct('u', least(a.pk, b.pk), " +
            "'v', greatest(a.pk, b.pk)))))")).as("_p"))
        .select(col("_p.u").as("u"), col("_p.v").as("v"))

    val (ja, ba): (() => DataFrame, () => DataFrame) =
      if (mode == "pairs") (() => joinPairs(), () => basketPairs())
      else (() => joinAdjacent(), () => basketAdjacent())
    def consume(df: DataFrame): Unit =
      // the operators' first consumption shape: dedup then materialize
      df.distinct().write.format("noop").mode("overwrite").save()
    consume(ja()); consume(ba()) // warm both arms
    for (r <- 1 to reps; (label, f) <- Seq("join" -> ja, "basket" -> ba)) {
      val t0 = System.nanoTime()
      consume(f())
      System.err.println(f"[edgeab] mode=$mode rep=$r arm=$label " +
        f"${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
