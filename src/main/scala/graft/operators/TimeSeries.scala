package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Linear-interpolation gap fill over the same per-key slot grid as
    * [[gapFillLocf]]: interior gaps get
    * `v_prev + (v_next − v_prev) · (slot − t_prev)/(t_next − t_prev)`
    * (slot arithmetic in epoch seconds — the fraction is a ratio of
    * small integers, and the whole interpolation is ONE fixed double
    * expression, engine-deterministic); observed slots keep their exact
    * `v_obs` (no fp noise at observation points); leading and trailing
    * gaps stay null (interpolation needs both ends — carry-forward
    * semantics are [[gapFillLocf]]'s job).
    *
    * Scale shape identical to [[gapFillLocf]] plus one more window pass
    * over the SAME (key, slot) partitioning — the forward-looking
    * `first(ignoreNulls)` shares the exchange and sort.
    */
  def gapFillLinear(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      stepSeconds: Long = 3600,
      maxSlotsPerKey: Long = 100000
  ): DataFrame = {
    val grid = gapFillLocf(df, key, ts, value, stepSeconds, maxSlotsPerKey)
      .drop("v_filled")
    val back = Window.partitionBy(col("key")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward lookup runs as last() over a DESCENDING UnboundedPreceding
    // frame, NOT first() over UnboundedFollowing: Spark's following-frame
    // evaluator re-aggregates from each row to the partition end — O(n²)
    // per key (measured 17.9 s on the q128 gate at sf0.1; this form runs
    // the same lookup incrementally in O(n): 2.0 s)
    val fwdAsBack = Window.partitionBy(col("key")).orderBy(col("slot").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsStruct = when(col("v_obs").isNotNull,
      struct(unix_timestamp(col("slot")).as("t"), col("v_obs").as("v")))
    val prev = last(obsStruct, ignoreNulls = true).over(back)
    val next = last(obsStruct, ignoreNulls = true).over(fwdAsBack)
    val slotS = unix_timestamp(col("slot"))
    val frac = (slotS - col("__p.t")).cast("double") /
      (col("__n.t") - col("__p.t")).cast("double")
    grid
      .withColumn("__p", prev).withColumn("__n", next)
      // UNROUNDED deliberately: the expression shape is identical across
      // engines, so the full double is bit-reproducible — while rounding
      // to k decimals DIVERGES at exact decimal-tie boundaries (Spark
      // HALF_UP vs DuckDB's scheme disagreed on a real sf0.1 row at
      // ...75 ties); `+ 0.0` canonicalizes a possible −0.0
      .withColumn("v_interp",
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("__p").isNotNull && col("__n").isNotNull,
            col("__p.v") + (col("__n.v") - col("__p.v")) * frac + lit(0.0)))
      .drop("__p", "__n")
  }

  /** Compact per-key interpolation report over [[gapFillLinear]] — the
    * gate readout: slot/observation/interpolated counts plus the value
    * at a fixed probe instant.
    */
  def gapFillLinearReport(
      df: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      stepSeconds: Long,
      probe: String
  ): DataFrame =
    gapFillLinear(df, key, ts, value, stepSeconds).groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_slots"),
        count(col("v_obs")).as("n_obs"),
        sum(when(col("v_obs").isNull && col("v_interp").isNotNull, 1L)
          .otherwise(0L)).as("n_interp"),
        max(when(col("slot") === to_timestamp(lit(probe)), col("v_interp")))
          .as("v_probe"))

  /** Per-group daily-volume trend: ordinary-least-squares slope of
    * events-per-day against the day index, per group — the "is this
    * source dying / exploding" monitor (the q94 Zipf-fit normal
    * equations applied to ingest volume). Empty days count 0 via the
    * spine (a dying source's silence IS the trend, not a missing row).
    *
    * Spine semantics — SHARED window by default: every group is regressed
    * over the GLOBAL [min day, max day] range, so a source that starts
    * late carries leading zero-count days (which bias its slope upward)
    * and one that dies early carries trailing zeros (downward). That is
    * the intended monitor reading — "volume relative to the whole
    * corpus's observation window" — and what the q133 oracle pins. Pass
    * `perGroupBounds = true` to regress each group over ITS OWN
    * [first day, last day] instead: the "trend while alive" reading,
    * with no synthetic leading/trailing zeros.
    *
    * All sums are EXACT integers (day indexes × counts in BIGINT — day
    * spans and daily volumes keep the products far under 2⁶³; the one
    * division at the end is a fixed double expression), so the slope is
    * engine- and partitioning-deterministic. A single-day group has no
    * slope (null), loudly distinguishable from a flat 0.0.
    *
    * Scale shape: one map-combined (group, day) count — the exchange
    * carries ≤ \|groups\|·days rows — a broadcast day spine (per-group
    * bounds: a broadcast per-group bounds relation and the spine exploded
    * from each group's own range), and a per-group aggregate over the
    * tiny counts relation.
    */
  def volumeTrend(
      df: DataFrame,
      group: Column,
      ts: Column,
      perGroupBounds: Boolean = false
  ): DataFrame = {
    val day = to_date(ts)
    val counts = df.select(group.as("g"), day.as("d"))
      .groupBy(col("g"), col("d")).agg(count(lit(1)).as("cnt"))
    val full =
      if (perGroupBounds) {
        // each group's spine from its OWN bounds: the bounds relation is
        // one row per group (broadcast), the explode fans out only that
        // group's day range
        val gBounds = counts.groupBy(col("g"))
          .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        val grid = gBounds
          .select(col("g"), col("d0"), explode(sequence(col("d0"), col("d1"))).as("d"))
        grid.join(counts, Seq("g", "d"), "left")
          .select(col("g"), datediff(col("d"), col("d0")).cast("long").as("x"),
            coalesce(col("cnt"), lit(0L)).as("y"))
      } else {
        val bounds = counts.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("d"))
        val grid = counts.select(col("g")).distinct()
          .crossJoin(broadcast(spine))
        grid.join(counts, Seq("g", "d"), "left")
          .crossJoin(broadcast(bounds))
          .select(col("g"), datediff(col("d"), col("d0")).cast("long").as("x"),
            coalesce(col("cnt"), lit(0L)).as("y"))
      }
    full.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col("g"), col("n"), col("sy").as("n_events"),
        (round(when(col("n") * col("sx2") - col("sx") * col("sx") > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sx2") - col("sx") * col("sx")).cast("double")), 6)
          + lit(0.0)).as("slope_per_day"))
  }

  /** Seasonal (hour-of-day) volume anomaly screen: per (group,
    * hour-of-day) event counts scored as z-values against that group's
    * own 24-bucket profile — the "did the crawler die at 3am / is this
    * source flooding" monitor over an ingest stream.
    *
    * The variance is computed from EXACT integer sums (`Σcnt` as BIGINT,
    * `Σcnt²` as DECIMAL(38,0) — `cnt²` would overflow BIGINT at ~3·10⁹
    * events per bucket, real at 100 TB) with one fixed double expression —
    * not a streaming stddev aggregate, whose partition-order-dependent
    * rounding would make the z-scores differ between engines and runs.
    * `z = (cnt − mean) / √var`; a flat profile (var 0) scores 0
    * everywhere rather than dividing by zero.
    *
    * Scale shape: one map-combined (group, bucket) count — the exchange
    * carries ≤ |groups|·24 rows — then a tiny per-group agg joined back.
    * Empty buckets count 0: the grid is the group's observed buckets
    * cross-filled, so a silent hour IS an anomaly, not a missing row.
    */
  def seasonalAnomaly(
      df: DataFrame,
      group: Column,
      ts: Column,
      buckets: Int = 24
  ): DataFrame = {
    require(buckets > 0 && 24 % buckets == 0,
      s"buckets must divide 24: $buckets")
    val bucket = (hour(ts) / (24 / buckets)).cast("int")
    val counts = df.select(group.as("g"), bucket.as("bucket"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("cnt"))
    // fill absent buckets with 0 — a silent hour must score, not vanish
    val grid = counts.select(col("g")).distinct()
      .crossJoin(broadcast(
        df.sparkSession.range(buckets).select(col("id").cast("int").as("bucket"))))
    val full = grid.join(counts, Seq("g", "bucket"), "left")
      .select(col("g"), col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val stats = full.groupBy(col("g"))
      .agg(count(lit(1)).as("nb"), sum(col("cnt")).as("s1"),
        sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt")).as("s2"))
      .select(col("g"),
        (col("s1").cast("double") / col("nb")).as("mean"),
        ((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("nb"))
          / col("nb")).as("variance"))
    full.join(broadcast(stats), Seq("g"))
      .select(col("g"), col("bucket"), col("cnt"),
        round(col("mean"), 4).as("mean"),
        // + 0.0 canonicalizes IEEE −0.0 (a z just under zero rounds to
        // −0.0; engines disagree on its string form — see SCALING.md)
        (round(when(col("variance") > 0,
          (col("cnt") - col("mean")) / sqrt(col("variance")))
          .otherwise(lit(0.0)), 4) + lit(0.0)).as("z"))
  }

  /** CUSUM changepoint scores per key over a time-ordered value
    * sequence — the drift LOCALIZER next to the drift detectors
    * ([[graft.curation.Corpus.ksDrift]] says "the distribution moved
    * between two corpora"; CUSUM says WHERE in one sequence the level
    * shifted). One-sided upward form (Page's classic):
    *
    * {{{ S_0 = 0;  S_t = max(0, S_{t-1} + (x_t − target − slack)) }}}
    *
    * computed DECLARATIVELY through the prefix-minimum identity
    * `S_t = R_t − min(0, min_{j≤t} R_j)` with
    * `R_t = Σ_{i≤t} (x_i − target − slack)` — the max-recurrence
    * unrolls exactly to "current prefix sum minus the lowest prefix sum
    * so far (or the empty prefix)". That turns a per-row recursion into
    * TWO keyed window passes (cumulative sum, running min) in one sort:
    * whole-stage codegen, no UDF, no driver loop, and an oracle that
    * replays the identical windows in SQL. `target` defaults to the
    * key's own series mean (one extra unbounded window aggregate on the
    * same partition — no second shuffle).
    *
    * Determinism: ties in `order` break by `tieBreak` (a per-key-unique
    * column), so the prefix walk — and therefore every score — is
    * reproducible across engines; double accumulation follows the same
    * row sequence everywhere.
    *
    * Scale shape: one hash exchange on the key, one sort per partition,
    * all four windows (mean, cumsum, running min, score) over the SAME
    * (key × order) frame — Catalyst collapses them into a single Window
    * node chain with one sort, partition size = the key's series length.
    *
    * @param target fixed reference level; None = per-key series mean
    * @param slack  per-observation allowance k (drift below `target +
    *               slack` never accumulates)
    * @return input keys + order + tieBreak + `score` (S_t, ≥ 0)
    */
  def cusum(
      df: DataFrame,
      key: Column,
      order: Column,
      tieBreak: Column,
      value: Column,
      slack: Double,
      target: Option[Double] = None
  ): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__o"), col("__t"))
    val wAll = Window.partitionBy(col("__k"))
    val rows = df.select(key.as("__k"), order.as("__o"), tieBreak.as("__t"),
      value.cast("double").as("__v"))
    // the reference level materializes as its own column first: a window
    // aggregate cannot nest inside another window's sum
    val withRef = target match {
      case Some(t) => rows.withColumn("__ref", lit(t))
      case None    => rows.withColumn("__ref", avg(col("__v")).over(wAll))
    }
    withRef
      .withColumn("__r", sum(col("__v") - col("__ref") - lit(slack)).over(w))
      .withColumn("__score", col("__r") - least(lit(0.0), min(col("__r")).over(w)))
      .select(col("__k").as("key"), col("__o").as("order"), col("__t").as("tie"),
        col("__score").as("score"))
  }
}
