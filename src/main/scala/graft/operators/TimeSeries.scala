package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key slot grid and forward-fill the gaps (LOCF — last observation
  * carried forward), the feature-store/backfill primitive a training
  * pipeline runs before any windowed model sees the data.
  *
  * Scale shape: one map-combined agg to the per-(key, slot) observations,
  * one tiny per-key agg for the grid bounds, a `sequence`+`explode` grid
  * (rows = keys × span/step, generated, never shuffled in), one left join
  * on (key, slot) — both sides already hash-partitioned by the same key —
  * and ONE window pass per key ordered by slot for the fill. The window
  * partition is a key's slot count (span/step), bounded by the grid, not
  * by that key's event volume: a hot key with 10⁹ events still fills in
  * O(span/step) rows because the events were collapsed to slots first.
  */
object TimeSeries {

  /** Per-(key, slot) regular grid with forward-filled values.
    *
    * Columns out: `key`, `slot` (timestamp, aligned to `stepSeconds`),
    * `v_obs` (the slot's observed aggregate, null in gaps), `v_filled`
    * (LOCF: last non-null `v_obs` at or before the slot; null until the
    * key's first observation).
    *
    * The slot aggregate is `max(value)` — order-insensitive and exact, so
    * the result is bit-deterministic across engines and partitionings
    * (a mean would sum doubles in engine order). Grid bounds are each
    * key's own first/last slot; `maxSlotsPerKey` bounds the explode
    * (a key whose span/step exceeds it throws rather than silently
    * generating a year of empty slots per key).
    */
  def gapFillLocf(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      stepSeconds: Long = 3600,
      maxSlotsPerKey: Long = 100000
  ): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    val slot = timestamp_seconds(
      (unix_timestamp(ts) / stepSeconds).cast("long") * stepSeconds)
    val obs = df
      .select(key.as("key"), slot.as("slot"), value.cast("double").as("v"))
      .groupBy(col("key"), col("slot")).agg(max(col("v")).as("v_obs"))

    val bounds = obs.groupBy(col("key"))
      .agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"))
    val grid = bounds.select(
      col("key"),
      explode(sequence(col("lo"), col("hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("slot"))

    val guard = bounds
      .where((unix_timestamp(col("hi")) - unix_timestamp(col("lo"))) / stepSeconds >= maxSlotsPerKey)
    // loud, not silent: a mis-sized grid is a config error
    require(guard.isEmpty,
      s"gapFillLocf: some keys span more than $maxSlotsPerKey slots at step=${stepSeconds}s")

    val w = Window.partitionBy(col("key")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "slot"), "left")
      .withColumn("v_filled", last(col("v_obs"), ignoreNulls = true).over(w))
  }

  /** Compact per-key fill report over [[gapFillLocf]] — the gate-friendly
    * readout: slot/observation/fill counts plus the filled value at a
    * fixed probe instant (exact equality check that the carry-forward
    * semantics match, without shipping the whole grid).
    */
  def gapFillReport(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      stepSeconds: Long,
      probe: String
  ): DataFrame = {
    val filled = gapFillLocf(df, key, ts, value, stepSeconds)
    filled.groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_slots"),
        count(col("v_obs")).as("n_obs"),
        sum(when(col("v_obs").isNull && col("v_filled").isNotNull, 1L).otherwise(0L))
          .as("n_filled"),
        max(when(col("slot") === to_timestamp(lit(probe)), round(col("v_filled"), 4)))
          .as("v_probe"),
        max_by(round(col("v_filled"), 4), col("slot")).as("v_last"))
  }
}
