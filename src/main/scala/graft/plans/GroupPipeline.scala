package graft.plans

import org.apache.spark.sql.{Dataset, Encoder}

/** Per-group multi-stage pipeline runner — the Spark-native shape of the
  * reference's Part 3 per-region tool chain (clean → dedup → realign →
  * recalibrate → call; `program/src/main/scala/hmushtaq/sparkga1/
  * SparkGA1.scala:757-953`, one shell-out per stage with files in
  * between).
  *
  * Here a stage is a pure `Iterator[T] => Iterator[T]` so the whole chain
  * runs inside ONE `flatMapGroups` call: no intermediate materialization,
  * no sideband files, groups stream through stages lazily. At 100 TB the
  * single shuffle is the `groupByKey` exchange; stage composition adds
  * zero extra shuffles (contrast: the reference writes HDFS files between
  * every stage). Skewed/huge groups should be pre-split with
  * `graft.operators.Skew` — stages must remain iterator-based (never
  * `.toList` the group) so a group larger than executor memory still
  * streams, unless a stage inherently needs materialization (e.g. sort),
  * which is the stage author's documented choice.
  */
object GroupPipeline {

  type Stage[T] = Iterator[T] => Iterator[T]

  /** Compose stages left-to-right into one stage. */
  def chain[T](stages: Seq[Stage[T]]): Stage[T] =
    stages.reduceOption(_ andThen _).getOrElse(identity)

  /** Run the stage chain once per key group.
    *
    * Deliberately NOT [[graft.operators.Spread]]-ing the input: unlike
    * the shingle/minhash derivations (heavy CPU per row), `groupByKey`'s
    * map-side key extraction is cheap per row, and an A/B measurement
    * (sf0.1, in-JVM, 9 interleaved reps) showed the extra round-robin
    * exchange costs ~2× more than the one-split parallelization saves
    * (0.72 s → 1.27 s median). At real scale the input has many splits
    * and the question is moot.
    */
  def run[K, T, U](ds: Dataset[T], key: T => K, stages: Seq[Stage[T]],
                   finish: (K, Iterator[T]) => Iterator[U])(
      implicit ek: Encoder[K], et: Encoder[T], eu: Encoder[U]): Dataset[U] = {
    val all = chain(stages)
    ds.groupByKey(key).flatMapGroups((k, it) => finish(k, all(it)))
  }

  // ---- reusable stages mirroring the reference's tool chain ----

  /** "CleanSam": drop records failing a predicate (counted upstream if
    * needed via an accumulator).
    */
  def cleanStage[T](keep: T => Boolean): Stage[T] = _.filter(keep)

  /** "MarkDuplicates": keep the best record per dedup key within the
    * group, best = min under `ord`. Streams in one pass with a per-group
    * hash map of winners (bounded by #distinct dedup keys in the group,
    * not group size).
    */
  def markDupStage[T, D](dedupKey: T => D, ord: scala.Ordering[T])
      : Stage[T] = { it =>
    val best = scala.collection.mutable.LinkedHashMap.empty[D, T]
    it.foreach { t =>
      val k = dedupKey(t)
      best.get(k) match {
        case Some(cur) if ord.lteq(cur, t) => ()
        case _ => best(k) = t
      }
    }
    best.valuesIterator
  }

  /** "Recalibrate": rewrite each record given group-level statistics that
    * the caller computed in a prior aggregate and joined in (the BQSR
    * shape: per-covariate aggregate → score rewrite).
    */
  def recalibrateStage[T](rewrite: T => T): Stage[T] = _.map(rewrite)
}
