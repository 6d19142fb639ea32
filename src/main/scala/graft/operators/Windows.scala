package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowing flows (SURVEY.md §2.1 #9–11).
  *
  * Reference semantics: `flow/tumbling_window.go:30-44` (processing-time
  * tumbling), `flow/sliding_window.go:87-109` (size+slide, event-time via
  * extractor, epoch-aligned starts `flow/sliding_window.go:309-326`),
  * `flow/session_window.go:31-46` (inactivity gap).
  *
  * Spark-first stance: the reference's wall-clock windows are
  * nondeterministic by construction (its own tests tolerate count ranges,
  * `flow/sliding_window_test.go:37-43`). The engine standardizes on
  * *event-time* windows over a timestamp column — deterministic, testable,
  * and exactly what Spark's `window()`/`session_window()` group expressions
  * implement, with identical epoch-aligned bucketing. Processing-time
  * flavors remain available on the streaming profile
  * ([[graft.streaming.StreamingFlows]]) via triggers, matching the
  * reference's runtime behavior.
  *
  * Scale: each of these is a single hash-shuffle on (keys, window-bucket) —
  * the assignment of rows to buckets is a map-side expression, so AQE can
  * coalesce/split partitions freely and partial aggregation runs map-side.
  * `collect_list` shapes (the reference's literal `[]T` output,
  * `flow/tumbling_window.go:12`) are provided but the grouped-row shape is
  * preferred at scale: a 100 TB window never materializes as one array.
  */
object Windows {

  /** Tumbling window: fixed size, non-overlapping, epoch-aligned. */
  def tumbling(ts: Column, size: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame => DataFrame =
    df => df.groupBy(window(ts, size) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Sliding window: size + slide, epoch-aligned starts — the reference
    * aligns identically (`flow/sliding_window.go:309-326`).
    */
  def sliding(
      ts: Column,
      size: String,
      slide: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame => DataFrame =
    df => df.groupBy(window(ts, size, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Sliding window without ramp-up partials — the reference's
    * `EmitPartialWindow=false` (`flow/sliding_window.go:22-24`, `214-230`):
    * windows that began before the earliest event (and therefore cover
    * less than a full `size` of the stream) are suppressed. The anchor is
    * the global min event time, computed as a broadcast scalar — no extra
    * shuffle of the fact table, just a min-aggregate over the (pruned,
    * stats-assisted) timestamp column.
    */
  def slidingComplete(
      ts: Column,
      size: String,
      slide: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame => DataFrame = { df =>
    val anchor = broadcast(df.agg(min(ts).as("__graft_t0")))
    sliding(ts, size, slide, keys, aggs)(df)
      .crossJoin(anchor)
      .where(col("window.start") >= col("__graft_t0"))
      .drop("__graft_t0")
  }

  /** Session window: per-key inactivity gap. Spark merges events whose gap
    * is exactly equal to the threshold (verified empirically; the oracle's
    * gaps-and-islands formulation uses strictly-greater to break).
    */
  def session(ts: Column, gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame => DataFrame =
    df => df.groupBy(keys :+ session_window(ts, gap): _*).agg(aggs.head, aggs.tail: _*)

  /** Per-EVENT session assignment — the labeling form of [[session]]:
    * every row gets its key's 1-based `session_seq` (a new session
    * starts when the gap to the previous event EXCEEDS `gapSeconds`,
    * the strictly-greater break matching the aggregate form's merge-on-
    * equal behavior and the reference's gap rule,
    * `flow/session_window.go:81-97`). The aggregate form collapses
    * sessions to one row; pipelines that need the session as a JOIN KEY
    * (transitions per session, session-level features, leakage-safe
    * splits by session) need the label on every event.
    *
    * Gap math in floored epoch seconds (integer-exact); `tiebreak`
    * orders same-timestamp events deterministically. ONE key exchange:
    * the lag and the running sum share the same window partition, so
    * both run off one sort.
    */
  def sessionize(
      df: DataFrame,
      key: Column,
      ts: Column,
      gapSeconds: Long,
      tiebreak: Seq[Column] = Seq.empty
  ): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val ord = ts +: tiebreak
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(ord.map(_.asc): _*)
    val newSession = when(
      lag(ts, 1).over(w).isNull ||
        unix_timestamp(ts) - unix_timestamp(lag(ts, 1).over(w)) > gapSeconds,
      1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
  }

  /** The reference's literal `[]T`-per-window output shape
    * (`flow/tumbling_window.go:12`): window bounds + sorted element array.
    * Sorting matches SlidingWindow's in-window event-time sort
    * (`flow/sliding_window.go:257-260`).
    */
  def tumblingCollect(ts: Column, size: String, payload: Column): DataFrame => DataFrame =
    df =>
      df.groupBy(window(ts, size))
        .agg(sort_array(collect_list(struct(ts.as("_ts"), payload.as("_v")))).as("elements"))
        .select(
          col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          transform(col("elements"), e => e.getField("_v")).as("elements")
        )
}
