package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming profile of the graft operators (Structured Streaming).
  *
  * The reference is a push-based stream processor; its batch-profile
  * analogues live in [[graft.operators]]. This module carries the semantics
  * that only exist on an unbounded stream:
  *
  *  - event-time windows with watermark-driven lateness
  *    (`flow/sliding_window.go:25-31` AllowedLateness ↔ `withWatermark`);
  *  - Batch's count-OR-time trigger (`flow/batch.go:83-113`) via
  *    per-key state + processing-time timeout;
  *  - Throttler Backpressure (`flow/throttler.go:12-26`) as source-side
  *    rate limiting — the Spark-native place for backpressure;
  *  - Keyed per-key chains (`flow/keyed.go:131-158`) with state-store-backed
  *    state instead of the reference's unbounded in-memory map.
  *
  * Scale: all state lives in the state store (RocksDB on a real cluster),
  * partitioned by key — watermarks bound it; nothing accumulates on the
  * driver.
  */
object StreamingFlows {

  /** Map/FlatMap/Filter/Flatten work unchanged on streaming DataFrames —
    * the same [[graft.operators.CoreFlows]] plan constructors apply. Only
    * the stateful operators need streaming-specific forms below.
    */

  /** Event-time tumbling window with lateness bound. */
  def tumbling(
      tsName: String,
      size: String,
      lateness: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame => DataFrame = { df =>
    df.withWatermark(tsName, lateness)
      .groupBy(window(col(tsName), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Event-time sliding window — the closest 1:1 mapping of the reference's
    * SlidingWindow (epoch-aligned starts, AllowedLateness ↔ watermark,
    * drop-too-late ↔ watermark filter; flow/sliding_window.go:87-109).
    */
  def sliding(
      tsName: String,
      size: String,
      slide: String,
      lateness: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame => DataFrame = { df =>
    df.withWatermark(tsName, lateness)
      .groupBy(window(col(tsName), size, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Event-time session window (inactivity gap; flow/session_window.go). */
  def session(
      tsName: String,
      gap: String,
      lateness: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame => DataFrame = { df =>
    df.withWatermark(tsName, lateness)
      .groupBy(keys :+ session_window(col(tsName), gap): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Batch (flow/batch.go:31-47): emit accumulated elements when either
    * `maxBatchSize` arrive OR `maxLatencyMs` elapse since the batch opened.
    * Per-key state + processing-time timeout — the exact count-or-time
    * hybrid the reference implements with a ticker, here backed by the
    * state store. Output: (key, batch) arrays.
    */
  def batchCountOrTime[K: Encoder, V: Encoder](
      keyFn: V => K,
      maxBatchSize: Int,
      maxLatencyMs: Long
  )(implicit pairEnc: Encoder[(K, Seq[V])]): Dataset[V] => Dataset[(K, Seq[V])] = { ds =>
    require(maxBatchSize > 0, "batch size must be positive") // flow/batch.go:34-36
    implicit val bufEnc: Encoder[Seq[V]] = org.apache.spark.sql.Encoders.kryo[Seq[V]]
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Seq[V], (K, Seq[V])](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()
      ) { (key: K, values: Iterator[V], state: GroupState[Seq[V]]) =>
        if (state.hasTimedOut) {
          // time trigger: flush whatever accumulated (flow/batch.go:89-96)
          val buf = state.getOption.getOrElse(Vector.empty[V])
          state.remove()
          if (buf.nonEmpty) Iterator((key, buf)) else Iterator.empty
        } else {
          // Vector, not List: `:+` append per element must stay O(1) —
          // a List here is O(n) per append, O(n²) per large batch
          var buf: Seq[V] = state.getOption.getOrElse(Vector.empty[V]).toVector
          val out = Seq.newBuilder[(K, Seq[V])]
          values.foreach { v =>
            buf = buf :+ v
            if (buf.size >= maxBatchSize) { // count trigger (flow/batch.go:86-88)
              out += ((key, buf))
              buf = Vector.empty[V]
            }
          }
          if (buf.nonEmpty) {
            state.update(buf)
            state.setTimeoutDuration(maxLatencyMs)
          } else {
            state.remove()
          }
          out.result().iterator
        }
      }
  }

  /** Throttler (flow/throttler.go:58-82).
    *
    * Backpressure mode: rate-limit at the source — `rowsPerSecond` for the
    * rate source, `maxOffsetsPerTrigger` for Kafka, `maxFilesPerTrigger`
    * for files. This is where Spark applies backpressure natively; an
    * operator-level blocking throttle inside a micro-batch engine would
    * only stall the whole batch.
    */
  def throttledRateSource(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond.toString).load()

  def kafkaSourceOptions(maxOffsetsPerTrigger: Long): Map[String, String] =
    Map("maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString)

  /** Throttler Discard mode: ≤ quota elements per key per processing-time
    * period; excess silently dropped (flow/throttler.go:21-25, 119-124).
    * Per-key counter with a period-aligned reset, in the state store.
    */
  def throttleDiscard[K: Encoder, V: Encoder](
      keyFn: V => K,
      quota: Int,
      periodMs: Long
  ): Dataset[V] => Dataset[V] = { ds =>
    require(quota > 0, "throttler elements must be positive")
    implicit val stEnc: Encoder[(Long, Int)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaInt)
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[(Long, Int), V](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()
      ) { (_: K, values: Iterator[V], state: GroupState[(Long, Int)]) =>
        val now = state.getCurrentProcessingTimeMs()
        val period = now / periodMs
        var (curPeriod, used) = state.getOption.getOrElse((period, 0))
        if (curPeriod != period) { curPeriod = period; used = 0 } // ticker reset
        val out = Seq.newBuilder[V]
        values.foreach { v =>
          if (used < quota) { out += v; used += 1 }
          // else: discard (flow/throttler.go:119-124)
        }
        state.update((curPeriod, used))
        out.result().iterator
      }
  }

  /** Keyed (flow/keyed.go:53-72): an arbitrary stateful chain per key.
    * The chain's state is an accumulator of type S in the state store —
    * fresh per key like the reference's lazily-instantiated per-key
    * operator chains, but evictable and fault-tolerant.
    */
  def keyedState[K: Encoder, V: Encoder, S: Encoder, O: Encoder](
      keyFn: V => K,
      init: S,
      step: (S, V) => (S, IterableOnce[O])
  ): Dataset[V] => Dataset[O] = { ds =>
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[S, O](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()
      ) { (_: K, values: Iterator[V], state: GroupState[S]) =>
        var s = state.getOption.getOrElse(init)
        val out = Seq.newBuilder[O]
        values.foreach { v =>
          val (s2, os) = step(s, v)
          s = s2
          out ++= os
        }
        state.update(s)
        out.result().iterator
      }
  }

  /** Fold/Reduce running emission on a stream (flow/fold.go:83-90): emit
    * the accumulator after every element, per key.
    */
  def foldRunning[K: Encoder, V: Encoder, R: Encoder](
      keyFn: V => K,
      init: R,
      merge: (R, V) => R
  )(implicit outEnc: Encoder[(K, R)]): Dataset[V] => Dataset[(K, R)] = { ds =>
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[R, (K, R)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()
      ) { (key: K, values: Iterator[V], state: GroupState[R]) =>
        var acc = state.getOption.getOrElse(init)
        val out = Seq.newBuilder[(K, R)]
        values.foreach { v =>
          acc = merge(acc, v)
          out += ((key, acc)) // emit after EVERY element (flow/fold.go:83-90)
        }
        state.update(acc)
        out.result().iterator
      }
  }

  /** Merge (flow/util.go:84-105) works on streams via union — unchanged. */
  def merge(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** Keyed via Spark 4's `transformWithState` — the modern arbitrary-state
    * operator (SPARK-46815) and the preferred long-term mapping for the
    * reference's per-key chains (flow/keyed.go:131-158): typed per-key
    * ValueState with optional TTL, RocksDB-backed, timer support.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`).
    */
  def keyedTransformWithState[K: Encoder, V: Encoder, S: Encoder, O: Encoder](
      keyFn: V => K,
      init: S,
      step: (S, V) => (S, IterableOnce[O]),
      ttl: java.time.Duration = null
  ): Dataset[V] => Dataset[O] = { ds =>
    val sEnc = implicitly[Encoder[S]]
    val initialState = init // avoid shadowing by StatefulProcessor.init(...)
    val ttlConfig = Option(ttl).map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val processor = new StatefulProcessor[K, V, O] {
      @transient private var state: ValueState[S] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[S]("graft_keyed_state", sEnc, ttlConfig)
      override def handleInputRows(key: K, rows: Iterator[V], tv: TimerValues): Iterator[O] = {
        var s = if (state.exists()) state.get() else initialState
        val out = Seq.newBuilder[O]
        rows.foreach { v =>
          val (s2, os) = step(s, v)
          s = s2
          out ++= os
        }
        state.update(s)
        out.result().iterator
      }
    }
    ds.groupByKey(keyFn)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
