package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** The graft pipeline DSL — the reference's three concepts
  * (`Source`/`Flow`/`Sink`, streams.go:25-60) as thin builders over Spark
  * plans.
  *
  * Construction is lazy (a `Flow` is `DataFrame => DataFrame`, so chaining
  * `via` just composes Catalyst plan constructors — the analogue of the
  * reference's eager goroutine wiring is Spark's lazy logical plan), and
  * `to(sink)` is the single action/`start()` point, mirroring
  * `Flow.To(sink)` + `AwaitCompletion` (streams.go:42-60).
  *
  * One pipeline description runs on either profile:
  *  - batch: deterministic, oracle-checkable — `Pipe(df)`;
  *  - streaming: `Pipe(readStream df)`; stateful flows from
  *    [[graft.streaming.StreamingFlows]] slot in as ordinary `Flow`s.
  */
object Pipeline {

  /** A Flow is a plan transformer — 1-in/1-out like streams.go:36-46. */
  type Flow = DataFrame => DataFrame

  final case class Pipe(df: DataFrame) {
    /** Chain a flow (Source.Via / Flow.Via, streams.go:27-46). */
    def via(f: Flow): Pipe = Pipe(f(df))

    /** Fan out into branches (flow/util.go:45-63). */
    def fanOut(n: Int): Seq[Pipe] = Seq.fill(n)(this)

    /** Split on a predicate (flow/util.go:23-41). */
    def split(pred: org.apache.spark.sql.Column): (Pipe, Pipe) = {
      val (t, f) = graft.operators.Topology.split(df, pred)
      (Pipe(t), Pipe(f))
    }

    /** Merge with other pipes (flow/util.go:84-105). */
    def merge(others: Pipe*): Pipe =
      Pipe(graft.operators.Topology.merge(df +: others.map(_.df)))

    /** Terminal: run the pipeline into a sink (Flow.To, streams.go:42-46). */
    def to(sink: Sink): Unit = sink.write(df)

    /** Terminal for streaming plans; returns the running query. */
    def toStream(sink: StreamSink): StreamingQuery = sink.start(df)
  }

  trait Sink { def write(df: DataFrame): Unit }

  trait StreamSink { def start(df: DataFrame): StreamingQuery }
}

/** Batch sinks matching the reference's extension set (SURVEY.md §2.3). */
object Sinks {
  import Pipeline._

  /** StdoutSink (extension/sink_stdout.go:11-46). */
  def stdout(limit: Int = 20): Sink = df => df.show(limit, truncate = false)

  /** IgnoreSink (extension/sink_ignore.go:7-37): full evaluation, no IO. */
  def ignore: Sink = df => { df.write.format("noop").mode("overwrite").save() }

  /** FileSink (extension/file.go:95-197) — parquet/text/csv by format.
    *
    * Retry semantics: the reference retries individual writes via
    * `WithRetryFunc` (extension/options.go:9-73) and on fatal error cancels
    * the source and drains input (extension/file.go:171-184). Spark's
    * mapping is strictly stronger and needs no per-write hook: a failed
    * write TASK is retried `spark.task.maxFailures` times (on another
    * executor if needed), and the `FileOutputCommitter` publishes output
    * atomically per job — a job that exhausts retries leaves no partial
    * visible files, where the reference's sink can have written a prefix.
    */
  def file(path: String, format: String = "parquet"): Sink =
    df => df.write.mode("overwrite").format(format).save(path)

  /** ChanSink (extension/chan.go:34-53): results back to the caller. */
  def collect(handler: Array[Row] => Unit): Sink = df => handler(df.collect())

  /** Streaming console sink. */
  def consoleStream(trigger: Trigger = Trigger.AvailableNow()): StreamSink =
    df => df.writeStream.format("console").trigger(trigger).start()

  /** Streaming memory sink for tests (queryable as a temp view). */
  def memoryStream(name: String, outputMode: String = "append"): StreamSink =
    df => df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()

  /** WriterSink analogue (extension/sink_writer.go:15-104): per-row writer
    * with open/process/close lifecycle — one writer instance per partition
    * per epoch, the Spark-native form of the reference's `io.Writer` sink.
    */
  def foreach(writer: org.apache.spark.sql.ForeachWriter[Row]): StreamSink =
    df => df.writeStream.foreach(writer).start()

  /** foreachBatch adapter — the integration point for the reference's
    * connector sinks without native Spark writers (Redis XADD, NATS publish,
    * Aerospike BatchOperate, WebSocket write; SURVEY.md §2.3): each
    * micro-batch arrives as a DataFrame plus epoch id, and the handler
    * performs the client IO (idempotent on epoch for effectively-once).
    */
  def foreachBatchSink(handler: (DataFrame, Long) => Unit): StreamSink =
    df => df.writeStream.foreachBatch(handler).start()
}

/** Batch + streaming sources matching the reference's extension set. */
object SourcesApi {
  import Pipeline._

  /** ChanSource (extension/chan.go:10-30): in-memory rows. */
  def fromSeq[T <: Product : org.apache.spark.sql.Encoder](spark: SparkSession, data: Seq[T]): Pipe =
    Pipe(spark.createDataset(data).toDF())

  /** FileSource (extension/file.go:15-91): line-per-element text. */
  def textFile(spark: SparkSession, path: String): Pipe = Pipe(spark.read.text(path))

  def parquet(spark: SparkSession, path: String): Pipe = Pipe(spark.read.parquet(path))

  /** Streaming file source (the reference reads files only in batch; Spark
    * adds incremental discovery for free).
    */
  def textStream(spark: SparkSession, path: String): Pipe =
    Pipe(spark.readStream.text(path))

  /** Rate source — the deterministic stand-in for the reference's
    * socket/queue sources in tests; rowsPerSecond is Throttler-Backpressure
    * at the source (flow/throttler.go:12-26).
    */
  def rate(spark: SparkSession, rowsPerSecond: Int): Pipe =
    Pipe(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load())

  /** TCP socket source — the working analogue of the reference's
    * WebSocket/UDP line sources (websocket/web_socket.go:22-149,
    * examples/udp/main.go): newline-framed text from a socket, one row per
    * line. Spark's built-in socket source (no extra jar); at-most-once, no
    * replay — same delivery class as the reference's socket reads. For
    * custom framing over files use `format("graft-framed")`.
    */
  def socketText(spark: SparkSession, host: String, port: Int): Pipe =
    Pipe(spark.readStream.format("socket")
      .option("host", host).option("port", port.toString).load())

  /** Kafka source wiring (kafka/kafka_sarama.go:14-136). The connector jar
    * is not in this container — activate with
    * `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2`; this
    * returns the configured reader — `.load()` at deploy site. The sink
    * half is [[graft.sinks.ConnectorSinks.kafkaWriter]].
    */
  def kafkaReader(spark: SparkSession, bootstrap: String, topic: String,
      maxOffsetsPerTrigger: Option[Long] = None) = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
    maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
  }

  /** Pulsar source wiring (pulsar/pulsar.go:14-113). Pulsar has a NATIVE
    * Spark connector (StreamNative's `pulsar-spark-connector_2.13`) and
    * should not go through foreachBatch; the jar is not in this container,
    * so this returns the configured reader — `.load()` at deploy site. The
    * sink half is [[graft.sinks.ConnectorSinks.pulsarWriter]].
    */
  def pulsarReader(spark: SparkSession, serviceUrl: String, topic: String,
      adminUrl: Option[String] = None) = {
    val r = spark.readStream.format("pulsar")
      .option("service.url", serviceUrl)
      .option("topics", topic)
    adminUrl.fold(r)(u => r.option("admin.url", u))
  }
}
