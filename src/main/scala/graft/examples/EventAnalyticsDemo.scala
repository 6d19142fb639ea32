package graft.examples

import graft.operators.{Joins, Sequences, TimeSeries}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end event-stream analytics over the events table — the
  * composition story for the sequence/time-series operator family
  * (the analyses a reugn/go-streams user chains keyed flows and windows
  * for, expressed as one Catalyst plan per readout):
  *
  *   skew triage → session transition matrix → ordered funnel →
  *   weekly retention triangle → hourly volume anomaly screen →
  *   per-user LOCF gap-fill report.
  *
  * Every stage is one of the gated operators; shapes per SCALING.md
  * (every exchange on the user key or a tiny profile relation — over a
  * user-bucketed events table the funnel plans ZERO exchanges,
  * spec-proven).
  */
object EventAnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val events = Tables.events(spark, dir)

    // 0. before any keyed work: is the key skewed enough to salt?
    println("== join-key skew triage (top 5) ==")
    Joins.skewReport(events, col("user_id"), topK = 5, targetRowsPerTask = 1000)
      .show(truncate = false)

    // 1. what happens after what, within 30-minute sessions
    println("== session transition matrix ==")
    Sequences.transitionCounts(
      events, col("user_id"), col("ts"), col("event_type"),
      gapSeconds = 1800, tiebreak = Seq(col("event_id")))
      .orderBy(desc("n")).show(10, truncate = false)

    // 2. conversion: view -> click -> purchase within 7 days of entry
    println("== funnel ==")
    Sequences.funnelReport(
      events, col("user_id"), col("ts"), col("event_type"),
      steps = Seq("view", "click", "purchase"), windowSeconds = Some(604800L))
      .show(truncate = false)

    // 3. the retention triangle
    println("== weekly retention ==")
    Sequences.retention(events, col("user_id"), col("ts"))
      .orderBy("cohort", "week_offset").show(12, truncate = false)

    // 4. did the pipeline die at 3am / is a source flooding?
    println("== hourly volume anomalies (|z| >= 1.5) ==")
    TimeSeries.seasonalAnomaly(events, col("event_type"), col("ts"))
      .where(abs(col("z")) >= 1.5)
      .orderBy(desc("z")).show(10, truncate = false)

    // 5. regularized per-user value series (fill report)
    println("== LOCF gap-fill report (5 users) ==")
    TimeSeries.gapFillReport(
      events, col("user_id"), col("ts"), col("value"),
      stepSeconds = 3600, probe = "2024-01-15 00:00:00")
      .orderBy("key").show(5, truncate = false)

    // 6. interaction-graph structure, BOTH readouts from one wedge join:
    // co-session user pairs -> triangleAnalysis gives per-user embedding
    // in the community structure (triangle counts) AND the edges worth
    // keeping under sparsification (structural similarity) without paying
    // the wedge enumeration twice
    println("== interaction graph: triangles + edge similarity (one machinery build) ==")
    val copresence = events
      .select(col("user_id"), window(col("ts"), "6 hours").getField("start").as("w"))
      .distinct()
    // co-occurrence blocking with the hammingPairs bucket-cap discipline:
    // a window is a pair BUCKET, and an unbounded bucket is quadratic —
    // cap it and move on (a flash-crowd window carries no pair signal)
    val bounded = copresence.join(
      copresence.groupBy("w").agg(count(lit(1)).as("nw")).where(col("nw") <= 64), Seq("w"))
    val pairs = bounded.as("a").join(bounded.as("b"), Seq("w"))
      .where(col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"))
    val (triCounts, edgeSim) = graft.graphs.Graphs.triangleAnalysis(
      pairs, col("ua"), col("ub"))
    triCounts.orderBy(desc("triangles")).show(5, truncate = false)
    edgeSim.orderBy(desc("jaccard"), asc("lo"), asc("hi")).show(5, truncate = false)

    spark.stop()
  }
}
