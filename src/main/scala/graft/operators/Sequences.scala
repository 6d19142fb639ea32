package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence mining over keyed event streams: what happens AFTER what.
  * The batch analogue of chaining the reference's keyed flows
  * (`flow/keyed.go`) into a per-key ordered pass, with the session gap
  * rule of `flow/session_window.go:81-97` deciding where a sequence
  * breaks.
  */
object Sequences {

  /** Markov transition counts: for every pair of CONSECUTIVE events of
    * the same key closer than `gapSeconds` apart, count
    * (from_state → to_state). Pairs straddling a session gap are not
    * transitions — a user coming back tomorrow is a new journey, the
    * session-window boundary semantic of the reference
    * (`flow/session_window.go:81-97`) applied to pair formation.
    *
    * `tiebreak` columns order same-timestamp events deterministically
    * (pass the event id); without a total order the lag pairing — and
    * therefore the counts — would be partitioning-dependent.
    *
    * Gap comparison is in floored epoch SECONDS (`unix_timestamp`
    * semantics) so the predicate is integer-exact and engine-portable.
    *
    * Scale shape: ONE hash exchange on the key for the lag window (the
    * per-key sort is bounded by that key's event count), then a
    * map-combined count to the ≤ |states|² output relation. At 100 TB
    * the window partition is the hazard — a degenerate hot key routes
    * around via pre-filtering on [[Joins.skewReport]]'s output, the same
    * cap-and-observe pattern as `Joins.asOf(maxKeyRows)`.
    */
  /** Next-event training pairs — the sequence-dataset constructor: for
    * every event with at least `history` same-key predecessors (in
    * (ts, tiebreak) order), emit the `history` preceding states as flat
    * context columns `h1..hN` (oldest first) plus the event's own state
    * as `label`. The autoregressive (context → next token) shape, built
    * from event logs: each row is one supervised example.
    *
    * Flat columns, not an array: the downstream join/export surface and
    * the cross-engine oracle both prefer fixed-width columns, and
    * `history` is a small constant.
    *
    * Scale shape: ONE hash exchange on the key, `history` lag
    * expressions over the single sorted window — same cost as one lag.
    */
  def nextEventPairs(
      df: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      tiebreak: Column,
      history: Int = 3): DataFrame = {
    require(history >= 1, s"history must be >= 1, got $history")
    val w = Window.partitionBy(key).orderBy(ts.asc, tiebreak.asc)
    val hist = (1 to history).map(i => lag(state, history - i + 1).over(w).as(s"h$i"))
    df.select(
        (Seq(key.as("key"), tiebreak.as("seq_id"), state.as("label")) ++ hist): _*)
      .where(col(s"h1").isNotNull) // oldest lag present ⇒ all present
  }

  def transitionCounts(
      df: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      gapSeconds: Long,
      tiebreak: Seq[Column] = Seq.empty
  ): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val tb = tiebreak.zipWithIndex.map { case (c, i) => c.as(s"__tb$i") }
    val base = df.select(Seq(key.as("k"), ts.as("t"), state.as("s")) ++ tb: _*)
    val ord = col("t") +: tiebreak.indices.map(i => col(s"__tb$i"))
    val w = Window.partitionBy(col("k")).orderBy(ord: _*)
    base
      .withColumn("__ps", lag(col("s"), 1).over(w))
      .withColumn("__pt", lag(col("t"), 1).over(w))
      .where(col("__ps").isNotNull &&
        unix_timestamp(col("t")) - unix_timestamp(col("__pt")) <= gapSeconds)
      .groupBy(col("__ps").as("from_state"), col("s").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** Ordered funnel completion times: for each key, step i completes at
    * the EARLIEST event of `steps(i)` strictly after step i−1's
    * completion (step 0: the key's earliest such event). Returns one row
    * per key that completed step 1, with `t1..tn` columns — `t(i)` null
    * once the chain breaks. `windowSeconds` bounds the whole funnel
    * relative to t1 (the "converted within 7 days of entering" form),
    * in floored epoch seconds like every gap predicate here.
    *
    * Scale shape: one filtered min-agg per step plus one equi-join per
    * step, ALL keyed on the same column — after the first exchange every
    * stage reuses the hash partitioning (ENSURE_REQUIREMENTS inserts no
    * further data exchange; the per-key relation is |keys| rows, smaller
    * at every stage). No windows, no sorts, no per-key iteration.
    */
  def funnelTimes(
      df: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      steps: Seq[String],
      windowSeconds: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    windowSeconds.foreach(w => require(w > 0, s"windowSeconds must be positive: $w"))
    val base = df.select(key.as("k"), ts.as("t"), state.as("s"))
    var acc = base.where(col("s") === steps.head)
      .groupBy(col("k")).agg(min(col("t")).as("t1"))
    for (i <- 2 to steps.size) {
      val prevT = col(s"t${i - 1}")
      val winOk = windowSeconds match {
        case Some(w) =>
          unix_timestamp(col("t")) - unix_timestamp(col("t1")) <= w
        case None => lit(true)
      }
      val next = base.where(col("s") === steps(i - 1))
        .join(acc.select((1 until i).map(j => col(s"t$j")) :+ col("k"): _*), Seq("k"))
        .where(col("t") > prevT && winOk)
        .groupBy(col("k")).agg(min(col("t")).as(s"t$i"))
      acc = acc.join(next, Seq("k"), "left")
    }
    acc
  }

  /** Per-step completion counts over [[funnelTimes]] — the one-row
    * funnel readout (`n_step1..n_stepN`).
    */
  def funnelReport(
      df: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      steps: Seq[String],
      windowSeconds: Option[Long] = None
  ): DataFrame = {
    val times = funnelTimes(df, key, ts, state, steps, windowSeconds)
    times.agg(
      count(col("t1")).as("n_step1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"n_step$i")): _*)
  }

  /** Weekly retention cohorts: users grouped by the week of their FIRST
    * event, counted distinctly in every later week they appear —
    * `(cohort, week_offset, n_users)`, the standard retention triangle.
    *
    * Week truncation and the offset are CALENDAR-exact: both instants are
    * `date_trunc`'d to their week start, the offset is
    * `datediff(day) div 7` on the resulting dates — always a whole number
    * of weeks, in ANY session timezone. (A raw epoch-second difference
    * div 604800 only works under a fixed-offset zone: with DST, two week
    * starts can sit 604800±3600 s apart and the division floors to the
    * wrong offset.)
    *
    * Scale shape: one key agg for first-events, one key equi-join
    * (partitioning reused), one (cohort, offset) distinct-count — the
    * exchange carries (cohort, offset, key) distinct triples.
    */
  def retention(
      df: DataFrame,
      key: Column,
      ts: Column
  ): DataFrame = {
    val firsts = df.groupBy(key.as("k"))
      .agg(date_trunc("week", min(ts)).as("cohort"))
    df.select(key.as("k"), date_trunc("week", ts).as("w"))
      .join(firsts, Seq("k"))
      .select(col("k"), col("cohort"),
        expr("datediff(to_date(w), to_date(cohort)) div 7").as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(countDistinct(col("k")).as("n_users"))
  }

  /** Last-touch attribution: every `conversion` event, attributed to the
    * LATEST same-key `touches` event at-or-before it and within
    * `windowSeconds` — the credit-assignment readout a funnel
    * ([[funnelTimes]]) doesn't give (the funnel says WHETHER the chain
    * completed; attribution says WHICH touch gets the credit).
    *
    * Ordering is (ts, tiebreak) — a touch sharing the conversion's exact
    * timestamp counts as preceding it iff its tiebreak is smaller, so two
    * engines pair identically. Conversions with no in-window touch are
    * reported with null attribution (organic conversions are signal, not
    * rows to drop). The window predicate is floored epoch seconds, the
    * gap convention of every sequence operator here.
    *
    * Scale shape: ONE hash exchange on the key; the carry is a single
    * `last(_, ignoreNulls)` running window over each key's sorted events
    * (no self-join, no per-conversion scan), then a row filter — the
    * LOCF shape of `TimeSeries.gapFill`, pointed at credit assignment.
    */
  def lastTouchAttribution(
      df: DataFrame,
      key: Column,
      ts: Column,
      state: Column,
      tiebreak: Column,
      conversion: String,
      touches: Seq[String],
      windowSeconds: Long
  ): DataFrame = {
    require(touches.nonEmpty, "need at least one touch state")
    require(!touches.contains(conversion), "a conversion cannot be its own touch")
    require(windowSeconds > 0, s"windowSeconds must be positive: $windowSeconds")
    val base = df.select(
      key.as("k"), ts.as("t"), state.as("s"), tiebreak.as("tb"))
    val w = Window.partitionBy(col("k")).orderBy(col("t").asc, col("tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touchStruct = when(col("s").isin(touches: _*),
      struct(col("t").as("tt"), col("tb").as("tid"), col("s").as("tstate")))
    base
      .withColumn("__touch", last(touchStruct, ignoreNulls = true).over(w))
      .where(col("s") === conversion)
      .select(
        col("k").as("key"),
        col("tb").as("conversion_id"),
        col("t").as("conversion_ts"),
        when(unix_timestamp(col("t")) - unix_timestamp(col("__touch.tt")) <= windowSeconds,
          col("__touch")).as("a"))
      .select(
        col("key"), col("conversion_id"), col("conversion_ts"),
        col("a.tid").as("touch_id"),
        col("a.tstate").as("touch_state"),
        (unix_timestamp(col("conversion_ts")) - unix_timestamp(col("a.tt")))
          .as("delay_seconds"))
  }
}
