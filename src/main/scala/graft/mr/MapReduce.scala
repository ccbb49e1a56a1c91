package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}

/** MapReduce-style job facade — the user API shape of the Hadoop-MR
  * reference class (`map(k1,v1) → list(k2,v2)`; shuffle by k2; `reduce
  * (k2, values) → list(k3,v3)`; optional map-side `combine`) expressed
  * over Datasets so existing user map/reduce programs port 1:1.
  *
  * Execution is NOT a literal reimplementation: `mapJob` is a
  * flatMap (narrow, fused into whole-stage codegen where possible) and
  * `reduceJob`'s combiner-enabled form compiles to a partial+final
  * aggregate — Spark's automatic combiner — so the shuffle carries
  * combined values, exactly the hand-optimization MR users apply.
  * The generic `reduceJob` (arbitrary reduce function over the full
  * value group) maps to groupByKey.mapGroups — shuffle of raw pairs,
  * same cost as an MR job without a combiner.
  */
object MapReduce {

  /** map phase: one input record → zero or more (k, v) pairs. */
  def mapJob[I, K, V](input: Dataset[I])(f: I => IterableOnce[(K, V)])(
      implicit e: Encoder[(K, V)]): Dataset[(K, V)] =
    input.flatMap(f)

  /** reduce with an associative combiner (MR combine+reduce): partial
    * aggregation runs map-side automatically. */
  def reduceJob[K, V](pairs: Dataset[(K, V)])(combine: (V, V) => V)(
      implicit ek: Encoder[K], ev: Encoder[(K, V)]): Dataset[(K, V)] =
    pairs.groupByKey(_._1).reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** general reduce: the full value list per key (no combiner — the MR
    * shape for non-associative user reducers). */
  def reduceGroupsJob[K, V, O](pairs: Dataset[(K, V)])(f: (K, Iterator[V]) => O)(
      implicit ek: Encoder[K], eo: Encoder[O]): Dataset[O] =
    pairs.groupByKey(_._1).mapGroups((k, it) => f(k, it.map(_._2)))

  /** chained jobs: MR materializes intermediates in the DFS between
    * jobs; here chaining is plan composition (one DAG, no
    * materialization) — call `.persist()` between stages only when a
    * stage feeds multiple downstream jobs. */
  def chain[A, B](stage1: Dataset[A])(stage2: Dataset[A] => Dataset[B]): Dataset[B] =
    stage2(stage1)
}
