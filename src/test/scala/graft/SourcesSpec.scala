package graft

import graft.sources.Polling
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source harnesses: CDC-by-polling increments and the live socket source. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("PollingSource delivers strictly-newer increments across sweeps (aerospike/aerospike.go:100-126)") {
    val dir = Files.createTempDirectory("polling").toString
    def write(rows: Seq[(java.sql.Timestamp, String)]): Unit =
      rows.toDF("ts", "v").write.mode("append").parquet(dir)

    write(Seq((ts("2024-01-01 00:00:01"), "a"), (ts("2024-01-01 00:00:02"), "b")))
    val src = Polling.parquet(spark, dir, "ts")
    // first sweep: full scan
    assert(src.poll().select("v").as[String].collect().sorted.toSeq == Seq("a", "b"))
    assert(src.mark.contains(ts("2024-01-01 00:00:02")))
    // nothing new: empty increment, mark unchanged
    assert(src.poll().count() == 0)
    assert(src.mark.contains(ts("2024-01-01 00:00:02")))
    // new files land between sweeps: only newer rows delivered
    write(Seq((ts("2024-01-01 00:00:02"), "stale"), (ts("2024-01-01 00:00:05"), "c")))
    val inc = src.poll().select("v").as[String].collect().toSeq
    assert(inc == Seq("c")) // ts == mark is NOT redelivered (strictly newer)
    assert(src.mark.contains(ts("2024-01-01 00:00:05")))
  }

  test("socketText reads newline-framed lines from a live TCP socket") {
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("hello")
      out.println("world")
      out.flush()
      Thread.sleep(15000) // keep the connection open while the stream drains
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    val q = graft.api.SourcesApi.socketText(spark, "localhost", port)
      .via(df => df.select(upper(col("value")).as("v")))
      .toStream(graft.api.Sinks.memoryStream("socket_out"))
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("socket_out").count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val rows = spark.table("socket_out").as[String].collect().sorted.toSeq
      assert(rows == Seq("HELLO", "WORLD"))
    } finally {
      q.stop()
      server.close()
    }
  }
}
