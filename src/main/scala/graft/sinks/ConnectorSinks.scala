package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Concrete `foreachBatch` connector sinks — the executable form of the
  * reference's client-library sinks (Redis Streams XADD
  * `redis/redis_stream.go:176-210`, NATS publish
  * `nats/nats_jetstream.go:244-258`, WebSocket write
  * `websocket/web_socket.go:152-174`, Aerospike put
  * `aerospike/aerospike.go:255-332`). They all share one Spark shape,
  * demonstrated here end-to-end with a broker-neutral client interface:
  *
  *  - each micro-batch arrives as (DataFrame, epochId) via `foreachBatch`;
  *  - the client is created PER PARTITION on the executor (connection setup
  *    amortized over the partition, nothing collected to the driver);
  *  - entry ids are deterministic in (epoch, row CONTENT) — a replayed
  *    epoch re-generates the same ids regardless of how the retry
  *    repartitioned the batch, and `append` rejects them: effectively-once
  *    across micro-batch retries. (Partition/row-index ids are NOT replay
  *    stable — a retried epoch can split the same rows differently; the
  *    spec caught exactly that.) The reference's auto-id XADD re-publishes
  *    on redelivery; explicit content ids are the upgrade Spark's epoch
  *    contract makes possible. Corollary: byte-identical duplicate rows
  *    within one epoch collapse to one entry — add a distinguishing column
  *    upstream if multiplicity must survive.
  *
  * A real deployment passes a factory that opens a real client (Jedis,
  * nats.java, ...); [[InMemoryBroker]] is the in-JVM stand-in used by the
  * specs (the container has no broker). Kafka and Pulsar have NATIVE Spark
  * connectors and should not go through foreachBatch at all:
  * `org.apache.spark:spark-sql-kafka-0-10_2.13` ([[kafkaWriter]]) and
  * StreamNative's `pulsar-spark-connector_2.13` (`format("pulsar")` with
  * `service.url` / `topic` options) respectively.
  */
object ConnectorSinks {

  /** Minimal append-stream client: the common denominator of XADD /
    * JetStream publish / WebSocket send. `append` returns false when the
    * (stream, id) entry already exists — the idempotence hook.
    */
  trait StreamClient extends Serializable {
    def append(stream: String, id: String, fields: Seq[(String, String)]): Boolean
    def close(): Unit = ()
  }

  /** In-JVM broker fake for specs and local runs. On a real cluster each
    * executor would see its own copy — production clients connect to the
    * actual broker instead.
    */
  object InMemoryBroker {
    private val entries =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[(String, String)]]()

    def client(): StreamClient = new StreamClient {
      override def append(stream: String, id: String, fields: Seq[(String, String)]): Boolean =
        entries.putIfAbsent((stream, id), fields) == null
    }

    def stream(name: String): Map[String, Seq[(String, String)]] = {
      import scala.jdk.CollectionConverters._
      entries.asScala.collect { case ((s, id), f) if s == name => id -> f }.toMap
    }

    def clear(): Unit = entries.clear()
  }

  /** The Redis-Streams-shaped `foreachBatch` handler: one XADD-style append
    * per row, explicit deterministic ids `epoch-md5(content)`. Plug into
    * [[graft.api.Sinks.foreachBatchSink]]:
    * {{{
    *   Pipe(streamDf).toStream(Sinks.foreachBatchSink(
    *     ConnectorSinks.appendStreamBatch("events:out", () => realRedisClient())))
    * }}}
    */
  def appendStreamBatch(
      streamKey: String,
      newClient: () => StreamClient
  ): (DataFrame, Long) => Unit = (df, epochId) => {
    val cols = df.columns
    df.foreachPartition { (rows: Iterator[Row]) =>
      val client = newClient()
      val md = java.security.MessageDigest.getInstance("MD5")
      try {
        rows.foreach { r =>
          md.reset()
          val fields = cols.toSeq.map { c =>
            val raw = r.getAs[Any](c)
            md.update(c.getBytes("UTF-8")); md.update(0x1f.toByte)
            // a null marker byte, NOT String.valueOf: the 4-char string
            // "null" and SQL NULL must hash to different entry ids, or one
            // of two genuinely distinct rows is silently dropped
            if (raw == null) md.update(0x00.toByte)
            else { md.update(0x01.toByte); md.update(raw.toString.getBytes("UTF-8")) }
            md.update(0x1e.toByte)
            c -> String.valueOf(raw)
          }
          val id = epochId.toString + "-" + md.digest().map("%02x".format(_)).mkString
          client.append(streamKey, id, fields)
        }
      } finally client.close()
    }
  }

  /** Fire-and-forget publisher: the Redis Pub-Sub PUBLISH / NATS core
    * publish shape (redis/redis_pub_sub.go, nats/nats_streaming.go pub) —
    * no entry ids, no acknowledgment, so delivery is at-least-once under
    * micro-batch replay (exactly the reference's semantics; subscribers
    * needing better dedup on a content key downstream). The third delivery
    * class next to [[appendStreamBatch]] (effectively-once by id) and
    * [[kvPutBatch]] (converging by key).
    */
  trait PublishClient extends Serializable {
    def publish(channel: String, message: String): Unit
    def close(): Unit = ()
  }

  def publishBatch(
      channel: String,
      column: String,
      newClient: () => PublishClient
  ): (DataFrame, Long) => Unit = (df, _) => {
    df.select(column).foreachPartition { (rows: Iterator[Row]) =>
      val client = newClient()
      try rows.foreach(r => client.publish(channel, String.valueOf(r.get(0))))
      finally client.close()
    }
  }

  /** Minimal keyed-record client: the Aerospike put / Redis SET shape. */
  trait KVClient extends Serializable {
    def put(namespace: String, key: String, bins: Seq[(String, String)]): Unit
    def close(): Unit = ()
  }

  /** In-JVM KV store fake (same caveats as [[InMemoryBroker]]). */
  object InMemoryKVStore {
    private val records =
      new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[(String, String)]]()

    def client(): KVClient = new KVClient {
      override def put(namespace: String, key: String, bins: Seq[(String, String)]): Unit =
        records.put((namespace, key), bins)
    }

    def namespace(ns: String): Map[String, Seq[(String, String)]] = {
      import scala.jdk.CollectionConverters._
      records.asScala.collect { case ((n, k), b) if n == ns => k -> b }.toMap
    }

    def clear(): Unit = records.clear()
  }

  /** The Aerospike-sink-shaped `foreachBatch` handler
    * (aerospike/aerospike.go:255-332): one keyed put per row. Keyed
    * upserts are last-write-wins per key, so micro-batch replays converge
    * without any id bookkeeping — the natural idempotence of KV sinks,
    * in contrast to append streams where [[appendStreamBatch]] needs
    * content ids. Client per partition; the reference's size+interval
    * write buffer maps to the micro-batch itself.
    */
  def kvPutBatch(
      namespace: String,
      keyCol: String,
      newClient: () => KVClient
  ): (DataFrame, Long) => Unit = (df, _) => {
    val cols = df.columns
    df.foreachPartition { (rows: Iterator[Row]) =>
      val client = newClient()
      try {
        rows.foreach { r =>
          val bins = cols.toSeq.map(c => c -> String.valueOf(r.getAs[Any](c)))
          client.put(namespace, String.valueOf(r.getAs[Any](keyCol)), bins)
        }
      } finally client.close()
    }
  }

  /** Kafka sink wiring (kafka/kafka_sarama.go:139-220). The connector jar
    * is not in this container — activate with
    * `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2` and
    * `.start()` at the deploy site. Input must carry a `value` column
    * (string or binary); an optional `key` column partitions the topic.
    */
  def kafkaWriter(df: DataFrame, bootstrap: String, topic: String): DataStreamWriter[Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)

  /** Pulsar sink wiring (pulsar/pulsar.go:115-176), routed to the native
    * StreamNative connector (`pulsar-spark-connector_2.13` — jar not in
    * this container; `.start()` at the deploy site). Input needs a `value`
    * column; the source half is [[graft.api.SourcesApi.pulsarReader]].
    */
  def pulsarWriter(df: DataFrame, serviceUrl: String, topic: String): DataStreamWriter[Row] =
    df.writeStream.format("pulsar")
      .option("service.url", serviceUrl)
      .option("topic", topic)
}
