package graft

import graft.sinks.ConnectorSinks
import graft.sources.broker.{BrokerClients, BrokerOptions, InMemoryPullBroker}
import org.apache.spark.sql.functions._

/** graft-broker pull source: batch replay, offset/admission semantics, and
  * the end-to-end loop the connector sinks already demo — broker source →
  * watermarked window → appendStreamBatch back into a broker stream.
  */
/** Driver-side probe for the restart spec (object = survives the query). */
object ResumeProbe {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
}

class BrokerSourceSpec extends SparkSpec {
  import spark.implicits._

  test("splitRange covers (after, until] exactly, in order, without overlap") {
    assert(BrokerOptions.splitRange(-1, -1, 4) == Seq.empty) // empty stream
    assert(BrokerOptions.splitRange(5, 5, 4) == Seq.empty)   // caught up
    assert(BrokerOptions.splitRange(-1, 0, 4) == Seq((-1L, 0L))) // 1 entry, 1 part
    val parts = BrokerOptions.splitRange(9, 109, 4)
    assert(parts.size == 4)
    assert(parts.head._1 == 9 && parts.last._2 == 109)
    parts.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi == lo); case _ => }
    assert(parts.map { case (lo, hi) => hi - lo }.sum == 100)
  }

  test("batch read replays everything currently in the stream") {
    InMemoryPullBroker.clear()
    (0 until 10).foreach(i => InMemoryPullBroker.append("replay", s"m$i", 1000L * i))
    val df = spark.read.format("graft-broker")
      .option("stream", "replay").option("client", "memory").load()
    val rows = df.select("seq", "value").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (0L until 10L))
    assert(rows.head._2 == "m0" && rows.last._2 == "m9")
    // startingSequence skips the already-consumed prefix
    val tail = spark.read.format("graft-broker")
      .option("stream", "replay").option("client", "memory")
      .option("startingSequence", "6").load()
    assert(tail.select("seq").as[Long].collect().sorted.toSeq == Seq(7L, 8L, 9L))
  }

  test("unknown client name fails loudly with the registered set") {
    val err = intercept[Exception] {
      spark.read.format("graft-broker")
        .option("stream", "s").option("client", "nope").load().collect()
    }
    assert(err.getMessage.contains("nope") && err.getMessage.contains("memory"))
  }

  test("streaming: maxEntriesPerTrigger caps each micro-batch (Throttler-Backpressure shape)") {
    InMemoryPullBroker.clear()
    (0 until 7).foreach(i => InMemoryPullBroker.append("capped", s"e$i", 1000L * i))
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-broker")
      .option("stream", "capped").option("client", "memory")
      .option("maxEntriesPerTrigger", "3")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.add(df.count()); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val observed = sizes.asScala.toSeq.filter(_ > 0)
    assert(observed.sum == 7)      // nothing lost
    assert(observed.forall(_ <= 3)) // nothing over the cap
    assert(observed.size >= 3)      // the cap actually split the backlog
  }

  test("streaming end-to-end: broker source -> watermarked window -> appendStreamBatch sink") {
    InMemoryPullBroker.clear()
    ConnectorSinks.InMemoryBroker.clear()
    val handler = ConnectorSinks.appendStreamBatch("win:out", () => ConnectorSinks.InMemoryBroker.client())
    val windowed = spark.readStream.format("graft-broker")
      .option("stream", "events").option("client", "memory")
      .load()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 second"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").cast("long").as("win_start"),
        col("n"))
    val q = windowed.writeStream.outputMode("append").foreachBatch(handler).start()
    try {
      // window [10s, 11s): two events
      InMemoryPullBroker.append("events", "a", 10000L)
      InMemoryPullBroker.append("events", "b", 10500L)
      q.processAllAvailable()
      // advance the watermark past 11s, then past 12s — closes [10,11)
      InMemoryPullBroker.append("events", "c", 11200L)
      q.processAllAvailable()
      InMemoryPullBroker.append("events", "d", 12500L)
      q.processAllAvailable()
      val out = ConnectorSinks.InMemoryBroker.stream("win:out")
        .values.map(_.toMap).map(m => m("win_start") -> m("n")).toMap
      assert(out.get("10").contains("2")) // [10s,11s) closed with both events
      assert(out.get("11").contains("1")) // [11s,12s) closed by d's watermark
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the committed sequence, not from scratch") {
    InMemoryPullBroker.clear()
    ResumeProbe.seen.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-broker-ckpt").toString
    def start() = spark.readStream.format("graft-broker")
      .option("stream", "resume").option("client", "memory")
      .load()
      .select("seq", "value")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => ResumeProbe.seen.add(r.getLong(0) -> r.getString(1))); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    InMemoryPullBroker.append("resume", "first", 1000L)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(ResumeProbe.seen.size() == 1)
    // new entries land while the query is down
    InMemoryPullBroker.append("resume", "second", 2000L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // exactly one NEW entry processed after restart: the offset resumed at
    // the committed sequence instead of replaying from -1 (which would have
    // produced a duplicate of "first" in the probe set -> size 3)
    import scala.jdk.CollectionConverters._
    assert(ResumeProbe.seen.asScala.toSet == Set(0L -> "first", 1L -> "second"))
    assert(ResumeProbe.seen.size() == 2)
  }

  test("a client registered under a custom name is picked up driver-side and shipped as a closure") {
    InMemoryPullBroker.clear()
    InMemoryPullBroker.append("custom", "x", 1L)
    BrokerClients.register("spec-custom", () => InMemoryPullBroker.client())
    val n = spark.read.format("graft-broker")
      .option("stream", "custom").option("client", "spec-custom").load().count()
    assert(n == 1)
  }

  test("admission control: composite limits take the tightest ReadMaxRows; unknown limits fall back to the trigger cap") {
    import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
    import graft.sources.broker.{BrokerMicroBatchStream, BrokerOptions, BrokerSeqOffset}
    InMemoryPullBroker.clear()
    (0 until 10).foreach(i => InMemoryPullBroker.append("limits", s"m$i", 1000L * i))
    def seq(o: Offset): Long = o.asInstanceOf[BrokerSeqOffset].seq
    val stream = new BrokerMicroBatchStream(BrokerOptions("limits", "memory", -1L, 3L, 4))
    try {
      val start = BrokerSeqOffset(-1L)
      assert(seq(stream.latestOffset(start, ReadLimit.maxRows(2))) == 1L)
      // composite (e.g. Trigger.AvailableNow wrapping minRows + maxRows):
      // the tightest ReadMaxRows component wins, minRows never lifts the cap
      val composite = ReadLimit.compositeLimit(Array(
        ReadLimit.minRows(1, 0L), ReadLimit.maxRows(4), ReadLimit.maxRows(2)))
      assert(seq(stream.latestOffset(start, composite)) == 1L)
      assert(seq(stream.latestOffset(start, ReadLimit.allAvailable())) == 9L)
      // a limit class we don't recognize caps at maxEntriesPerTrigger (3)
      // instead of silently reading everything
      val unknown = new ReadLimit {}
      assert(seq(stream.latestOffset(start, unknown)) == 2L)
    } finally stream.stop()
  }

}
