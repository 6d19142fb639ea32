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
}
