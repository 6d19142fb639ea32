package graft

import graft.operators.Windows
import org.apache.spark.sql.functions._

/** Event-time window semantics with fixed timestamps — deterministic
  * versions of the reference's wall-clock window tests
  * (flow/tumbling_window_test.go:39-43, flow/sliding_window_test.go:51-106,
  * flow/session_window_test.go:37-41).
  */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    ("a", ts("2024-01-01 00:00:05")),
    ("b", ts("2024-01-01 00:00:20")),
    ("c", ts("2024-01-01 00:00:50")),
    ("d", ts("2024-01-01 00:01:10")),
    ("e", ts("2024-01-01 00:02:30"))
  ).toDF("v", "t")

  test("tumbling 1m buckets: [a,b,c][d][e] (flow/tumbling_window_test.go:39-43)") {
    val out = Windows.tumblingCollect(col("t"), "1 minute", col("v"))(events)
      .orderBy("window_start")
      .select("elements").as[Seq[String]].collect()
    assert(out.toSeq == Seq(Seq("a", "b", "c"), Seq("d"), Seq("e")))
  }

  test("sliding 1m/30s: elements belong to 2 windows each, epoch-aligned (flow/sliding_window.go:309-326)") {
    val out = Windows.sliding(col("t"), "1 minute", "30 seconds", Nil,
      Seq(collect_list(col("v")).as("vs")))(events)
      .select(col("window.start").cast("long").as("s"), sort_array(col("vs")).as("vs"))
      .orderBy("s").as[(Long, Seq[String])].collect()
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    assert(out.toMap == Map(
      (base - 30) -> Seq("a", "b"),
      base -> Seq("a", "b", "c"),
      (base + 30) -> Seq("c", "d"),
      (base + 60) -> Seq("d"),
      (base + 120) -> Seq("e"),
      (base + 150) -> Seq("e")
    ))
  }

  test("session window: inactivity gap splits sessions; exact-gap event merges (verified Spark semantics)") {
    val evs = Seq(
      ("u1", ts("2024-01-01 00:00:00")),
      ("u1", ts("2024-01-01 00:00:30")), // exactly gap after -> same session
      ("u1", ts("2024-01-01 00:01:01")), // 31s after -> new session
      ("u2", ts("2024-01-01 00:00:10"))
    ).toDF("u", "t")
    val out = Windows.session(col("t"), "30 seconds", Seq(col("u")),
      Seq(count(lit(1)).as("n")))(evs)
      .select(col("u"), col("session_window.start").cast("long").as("s"), col("n"))
      .orderBy("u", "s").as[(String, Long, Long)].collect()
    val t0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(out.toSeq == Seq(("u1", t0, 2L), ("u1", t0 + 61, 1L), ("u2", t0 + 10, 1L)))
  }

  test("slidingComplete suppresses ramp-up partial windows (EmitPartialWindow=false, flow/sliding_window.go:214-230)") {
    val evs = Seq(
      ("a", ts("2024-01-01 00:00:40")),
      ("b", ts("2024-01-01 00:01:10")),
      ("c", ts("2024-01-01 00:01:40"))
    ).toDF("v", "t")
    val all = Windows.sliding(col("t"), "1 minute", "30 seconds", Nil,
      Seq(count(lit(1)).as("n")))(evs)
      .select(col("window.start").cast("long")).as[Long].collect().toSet
    val complete = Windows.slidingComplete(col("t"), "1 minute", "30 seconds", Nil,
      Seq(count(lit(1)).as("n")))(evs)
      .select(col("window.start").cast("long")).as[Long].collect().toSet
    val t0 = ts("2024-01-01 00:00:00").getTime / 1000
    // "a" at 00:00:40 belongs to windows starting 00:00:00 and 00:00:30;
    // the 00:00:00 one began before the first event (00:00:40) -> partial
    assert(all.contains(t0))
    assert(complete == all.filter(_ >= t0 + 40))
  }

  test("streaming sliding validates AllowedLateness <= slide (flow/sliding_window.go:92-94)") {
    import graft.streaming.StreamingFlows
    StreamingFlows.requireLatenessAtMostSlide("30 seconds", "30 seconds") // ok
    StreamingFlows.requireLatenessAtMostSlide("10 seconds", "1 minute")   // ok
    val e = intercept[IllegalArgumentException] {
      StreamingFlows.requireLatenessAtMostSlide("2 minutes", "30 seconds")
    }
    assert(e.getMessage.contains("lateness"))
  }

  test("tumblingCollect sorts window contents by event time (flow/sliding_window.go:257-260)") {
    val shuffled = Seq(
      ("late", ts("2024-01-01 00:00:50")),
      ("early", ts("2024-01-01 00:00:05")),
      ("mid", ts("2024-01-01 00:00:20"))
    ).toDF("v", "t")
    val out = Windows.tumblingCollect(col("t"), "1 minute", col("v"))(shuffled)
      .select("elements").as[Seq[String]].head()
    assert(out == Seq("early", "mid", "late"))
  }
}
