package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch and Throttler flows (SURVEY.md §2.1 #7–8).
  *
  * Reference semantics: `flow/batch.go:31-47` (emit `[]T` on count OR time),
  * `flow/throttler.go:58-82` (≤ N elements per period; Backpressure blocks,
  * Discard drops).
  *
  * Batch profile (this file): the time dimension of both operators is a
  * *processing-time* behavior that only exists on an unbounded stream; on a
  * finite deterministic input the faithful analogues are count-based
  * chunking and per-time-bucket quota. The streaming profile implements the
  * hybrid count-or-time trigger with real timers
  * ([[graft.streaming.StreamingFlows.batchCountOrTime]]).
  */
object Batching {

  /** Count-based batching: within each `partitionKeys` group, elements
    * ordered by `ord` are chunked into batches of `size` (last batch
    * partial, matching `flow/batch.go:97-105`). Emits `batch_id` per row;
    * compose with a groupBy on it for the `[]T` shape.
    *
    * Scale: one shuffle+sort per group. Batching within natural partitions
    * (the keyed form) is the 100 TB path; a single global batch sequence
    * would serialize and is only for reference-shape parity on small data.
    */
  def batchIds(
      size: Int,
      partitionKeys: Seq[Column],
      ord: Seq[Column],
      as: String = "batch_id"
  ): DataFrame => DataFrame = { df =>
    require(size > 0, "batch size must be positive") // flow/batch.go:34-36
    val base =
      if (partitionKeys.nonEmpty) Window.partitionBy(partitionKeys: _*) else Window.partitionBy()
    val w = base.orderBy(ord: _*)
    df.withColumn(as, floor((row_number().over(w) - 1) / size))
  }

  /** Throttler, deterministic Discard flavor: keep at most `quota` elements
    * per time bucket of `period`, choosing the earliest by `ord` within the
    * bucket (ties must be broken by a unique column for determinism).
    * Reference: `flow/throttler.go:12-26` ThrottleMode.Discard.
    *
    * Scale: quota is enforced per (bucket[, keys]) partition — a bounded
    * sort of at most one bucket's rows per partition, never a global sort.
    * Backpressure mode belongs to sources (`maxOffsetsPerTrigger`,
    * `rowsPerSecond`) — see [[graft.streaming.StreamingFlows.throttledRateSource]].
    */
  def throttleDiscard(
      ts: Column,
      period: String,
      quota: Int,
      ord: Seq[Column],
      keys: Seq[Column] = Nil
  ): DataFrame => DataFrame = { df =>
    require(quota > 0, "throttler elements must be positive") // flow/throttler.go:62-70
    val bucket = window(ts, period).getField("start")
    val w = Window.partitionBy(bucket +: keys: _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota)
      .drop("__rn")
  }
}
