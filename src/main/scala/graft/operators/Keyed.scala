package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Keyed flow (SURVEY.md §2.1 #12).
  *
  * Reference semantics: `flow/keyed.go:53-72` — partition the stream by a
  * key selector and run an independent operator chain per key, with fresh
  * state per key and nondeterministic cross-key output order
  * (`flow/keyed.go:29-31`).
  *
  * Spark-first stance: the reference instantiates a goroutine chain per key
  * in an unbounded in-memory map (`flow/keyed.go:131-158`) — the scale
  * hazard it cannot solve. Here a key's "chain" is either (a) aggregate
  * expressions over `groupBy(key)` — one shuffle, partial aggregation
  * map-side, AQE-skew-splittable, the 100 TB path — or (b) an arbitrary
  * per-group function over `groupByKey(...).flatMapGroups` when the logic is
  * genuinely imperative; streaming state lives in the state store, not on
  * the heap, and is TTL-evicted when
  * [[graft.streaming.StreamingFlows.keyedState]]'s `stateTtlMs` (or
  * `keyedTransformWithState`'s TTLConfig) is set — which it should be on
  * any high-cardinality key space.
  */
object Keyed {

  /** Per-key aggregation chain — the declarative (preferred) form. */
  def aggregate(keys: Seq[Column], aggs: Seq[Column]): DataFrame => DataFrame =
    df => df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Arbitrary per-key chain over the grouped values (fresh "state" per key
    * is the closure's local state — mirrors `flow/keyed.go:33-34`).
    */
  def flatMapGroups[T, K: Encoder, R: Encoder](
      keyFn: T => K,
      chain: (K, Iterator[T]) => IterableOnce[R]
  ): Dataset[T] => Dataset[R] =
    ds => ds.groupByKey(keyFn).flatMapGroups(chain)

  /** A per-key flow STAGE: a plan transformer parameterized by the key
    * columns, so stateful stages (fold, reduce, batch, throttle) scope
    * their state to the key — the building block of [[chain]].
    */
  type KeyedStage = Seq[Column] => DataFrame => DataFrame

  /** The reference's literal Keyed API (`flow/keyed.go:53-72, 131-158`):
    * take a LIST of flows and run every key's elements through its own
    * instance of that chain. The reference lazily instantiates one
    * goroutine chain per key in an unbounded driver-side map — the scale
    * hazard its docs concede. Here the chain is ONE Catalyst plan in
    * which each stateful stage partitions by the key columns: "fresh
    * state per key" is the window/groupBy partition, so a 100 TB-
    * cardinality key space costs shuffles, not heap. Consecutive stages
    * that partition by the same keys reuse the same exchange (Spark's
    * EnsureRequirements sees the identical distribution), so a chain of
    * k stateful stages does not pay k shuffles.
    *
    * Stage adapters below lift the §2.1 operators into [[KeyedStage]]s;
    * [[stateless]] wraps any existing `DataFrame => DataFrame` flow
    * (map/filter/flatMap do not depend on the key). A stage must preserve
    * the key columns if later stages need them — the adapters here all do
    * (they add columns or filter rows, never project keys away).
    *
    * Streaming profile: the same chain concept with state-store state is
    * [[graft.streaming.StreamingFlows.keyedState]] /
    * `keyedTransformWithState`.
    */
  def chain(keys: Seq[Column], stages: Seq[KeyedStage]): DataFrame => DataFrame =
    df => stages.foldLeft(df)((d, stage) => stage(keys)(d))

  /** Lift a key-independent flow (map, filter, flatMap, passThrough …)
    * into a chain stage.
    */
  def stateless(flow: DataFrame => DataFrame): KeyedStage = _ => flow

  /** Per-key running fold over an associative builtin aggregate —
    * [[CoreFlows.foldRunningAgg]] with the chain's keys as the state
    * scope.
    */
  def foldStage(
      agg: Column => Column, valueCol: Column, ord: Seq[Column], as: String
  ): KeyedStage =
    keys => CoreFlows.foldRunningAgg(agg, valueCol, keys, ord, as)

  /** Per-key running reduce (first element seeds the accumulator). */
  def reduceStage(
      agg: Column => Column, valueCol: Column, ord: Seq[Column], as: String
  ): KeyedStage =
    keys => CoreFlows.reduceRunning(agg, valueCol, keys, ord, as)

  /** Per-key count-based batching ([[Batching.batchIds]]). */
  def batchStage(size: Int, ord: Seq[Column], as: String = "batch_id"): KeyedStage =
    keys => Batching.batchIds(size, keys, ord, as)

  /** Per-key throttling ([[Batching.throttleDiscard]] Discard flavor). */
  def throttleStage(
      ts: Column, period: String, quota: Int, ord: Seq[Column]
  ): KeyedStage =
    keys => Batching.throttleDiscard(ts, period, quota, ord, keys)

  /** Keyed windowed aggregation — the composition the reference documents as
    * its flagship Keyed example (`flow/keyed.go:36-50`: per-device sliding
    * window then latest): `groupBy(key, window(...))` collapses the per-key
    * chain into one shuffle.
    */
  def windowed(
      keys: Seq[Column],
      ts: Column,
      size: String,
      slide: Option[String],
      aggs: Seq[Column]
  ): DataFrame => DataFrame = { df =>
    val win = slide.map(s => window(ts, size, s)).getOrElse(window(ts, size))
    df.groupBy(keys :+ win: _*).agg(aggs.head, aggs.tail: _*)
  }
}
