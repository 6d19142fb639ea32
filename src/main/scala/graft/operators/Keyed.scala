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
