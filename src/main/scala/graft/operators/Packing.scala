package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: greedily pack documents, in
  * ascending id order within each group, into fixed-token-budget
  * training sequences. A doc that would overflow the current sequence
  * starts a new one; a doc larger than the whole budget gets a sequence
  * of its own. The reference's closest shape is its per-region pipeline
  * ordering (`program/src/main/scala/hmushtaq/sparkga1/SparkGA1.scala:
  * 1153-1162` — size-aware task packing); here the packing itself is
  * the product.
  *
  * Implementation is the classic secondary-sort shape — ONE shuffle
  * (repartition by group), a spillable per-partition sort on
  * (group, id), then an O(1)-state streaming pass that never
  * materializes a group — so a group larger than executor memory still
  * packs. (A `groupByKey.flatMapGroups` would buffer each group; a
  * window function cannot express the reset-on-overflow running sum at
  * all — the running state depends on its own previous value, which is
  * exactly what the recursive-CTE oracle reproduces.)
  */
object Packing {

  /** One row per doc: (groupCol: string, idCol: long, nTokCol: long,
    * seq_id: long, seq_off: long) — seq_id counts sequences within the
    * group from 0, seq_off is the doc's token offset inside its
    * sequence. Group/id/count columns are cast to string/long/long (the
    * stable cross-engine shapes).
    */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
                    nTokCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(nTokCol).cast("long"))
      .as[(String, Long, Long)]
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
      .mapPartitions { it =>
        var curGrp: String = null
        var first = true
        var seq = 0L
        var fill = 0L
        it.map { case (g, id, n) =>
          if (first || g != curGrp) {
            curGrp = g; first = false; seq = 0L; fill = 0L
          }
          if (fill > 0 && fill + n > budget) { seq += 1; fill = 0L }
          val off = fill
          fill += n
          (g, id, n, seq, off)
        }
      }
      .toDF(groupCol, idCol, nTokCol, "seq_id", "seq_off")
  }
}
