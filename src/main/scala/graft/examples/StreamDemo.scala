package graft.examples

import graft.api.{Sinks, SourcesApi}
import graft.operators.CoreFlows
import graft.streaming.StreamingFlows
import org.apache.spark.sql.functions._

/** End-to-end demo of the graft DSL on both profiles — the analogue of the
  * reference's examples/std/main.go: build one pipeline description from
  * source → flows → sink and run it.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)

    // batch profile: parquet source → filter → map → split → merge → collect
    var got: Array[org.apache.spark.sql.Row] = Array.empty
    val pipe = SourcesApi.parquet(spark, "/root/testdata/sf0.001/orders.parquet")
      .via(CoreFlows.filter(col("o_totalprice") > 400000))
      .via(CoreFlows.map(col("o_orderkey"), upper(col("o_orderstatus")).as("st")))
    val (hi, lo) = pipe.split(col("o_orderkey") % 2 === 0)
    hi.merge(lo).to(Sinks.collect(rows => got = rows))
    println(s"DEMO_BATCH_ROWS=${got.length}")

    // custom DSv2 source: delimiter-framed byte stream (ReaderSource analogue)
    val dir = java.nio.file.Files.createTempDirectory("framed_demo")
    java.nio.file.Files.writeString(dir.resolve("frames.dat"), "alpha;beta;gamma")
    val framed = spark.read.format("graft-framed").option("delimiter", ";")
      .load(dir.toString)
    println(s"DEMO_FRAMED_ROWS=${framed.count()}")

    // streaming profile: rate source (throttled) → filter → tumbling window
    val q = SourcesApi.rate(spark, 500)
      .via(CoreFlows.filter(col("value") % 2 === 0))
      .via(StreamingFlows.tumbling("timestamp", "1 second", "0 seconds", Nil,
        Seq(count(lit(1)).as("n"))))
      .toStream(Sinks.memoryStream("demo_stream", "append"))
    // processAllAvailable never settles on a continuously-producing source
    // (rate keeps emitting) — sample the sink on a deadline instead.
    val deadline = System.currentTimeMillis() + 30000
    while (spark.table("demo_stream").count() < 3 && System.currentTimeMillis() < deadline)
      Thread.sleep(500)
    println(s"DEMO_STREAM_WINDOWS=${spark.table("demo_stream").count()}")
    q.stop()

    // streaming framed source → dedup-by-signature → connector sink
    // (Redis-Streams XADD shape against the in-JVM broker fake)
    import graft.sinks.ConnectorSinks
    val sdir = java.nio.file.Files.createTempDirectory("framed_demo_stream")
    java.nio.file.Files.writeString(sdir.resolve("w1.dat"), "x;y;x;z")
    ConnectorSinks.InMemoryBroker.clear()
    val q2 = graft.api.Pipeline.Pipe(
      spark.readStream.format("graft-framed").option("delimiter", ";").load(sdir.toString)
        .withColumn("ts", current_timestamp()))
      .via(StreamingFlows.dedupBySignature("ts", "1 minute", md5(col("value"))))
      .toStream(Sinks.foreachBatchSink(
        ConnectorSinks.appendStreamBatch("demo:out", () => ConnectorSinks.InMemoryBroker.client())))
    q2.processAllAvailable()
    q2.stop()
    println(s"DEMO_CONNECTOR_ENTRIES=${ConnectorSinks.InMemoryBroker.stream("demo:out").size}")

    // broker pull source (Redis-Streams/JetStream consumer shape) →
    // windowed count → append-stream sink: the full broker loop
    import graft.sources.broker.InMemoryPullBroker
    InMemoryPullBroker.clear()
    (0 until 6).foreach(i => InMemoryPullBroker.append("demo:in", s"e$i", 10000L + i * 400L))
    InMemoryPullBroker.append("demo:in", "late", 13000L) // closes the windows
    val q3 = graft.api.Pipeline.Pipe(
      spark.readStream.format("graft-broker")
        .option("stream", "demo:in").option("client", "memory")
        .option("maxEntriesPerTrigger", "4").load())
      .via(StreamingFlows.tumbling("ts", "1 second", "0 seconds", Nil,
        Seq(count(lit(1)).as("n"))))
      .toStream(Sinks.foreachBatchSink(
        ConnectorSinks.appendStreamBatch("demo:wins", () => ConnectorSinks.InMemoryBroker.client())))
    q3.processAllAvailable()
    q3.stop()
    println(s"DEMO_BROKER_WINDOWS=${ConnectorSinks.InMemoryBroker.stream("demo:wins").size}")
    spark.stop()
  }
}
