package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry and
  * (where SQL-expressible) a matching `oracleSql` entry. Column names are
  * aliased identically on both sides — the driver's compare sorts columns
  * by name before hashing.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O6/O7: partial+final hash aggregation (SamRegion accumulation ≈
    // groupBy count/min/max/sum; S/utils/SamRegion.scala:48-65).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(col("l_quantity")), 6).as("avg_qty")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows,
         sum(l_quantity) AS sum_qty,
         min(l_quantity) AS min_qty,
         max(l_quantity) AS max_qty,
         round(avg(l_quantity), 6) AS avg_qty
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""
  )
}
