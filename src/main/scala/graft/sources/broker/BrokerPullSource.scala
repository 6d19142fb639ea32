package graft.sources.broker

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** One broker entry: a monotonically-increasing per-stream sequence number,
  * the broker-assigned event time, and an opaque payload. The sequence
  * number is the consumer-group cursor — Redis Streams' entry id and NATS
  * JetStream's stream sequence both reduce to it.
  */
final case class BrokerEntry(seq: Long, timestampMs: Long, payload: String)

/** Pull-consumer client: the common denominator of the reference's broker
  * source loops — Redis Streams XREADGROUP batches
  * (redis/redis_stream.go:94-117) and NATS JetStream pull-subscription
  * Fetch (nats/nats_jetstream.go:114-158). Both are "give me the entries
  * after my cursor, up to a batch cap" against a seekable log; that is
  * exactly the contract a Spark micro-batch needs, so replayable
  * exactly-once reads fall out of the offset log for free (the reference's
  * ack/redelivery bookkeeping maps to Spark's checkpoint instead).
  *
  * Implementations must be cheap to construct per partition (connection
  * amortized over a fetch range) and must serve `fetch` repeatably for a
  * committed range (a failed task re-fetches its range — both Redis
  * Streams and JetStream allow reads by explicit position).
  */
trait PullClient extends Serializable {
  /** Newest available sequence (inclusive) in `stream`, or -1 when empty. */
  def latestSequence(stream: String): Long

  /** Entries with `seq` in (afterSeq, untilSeq], in sequence order. */
  def fetch(stream: String, afterSeq: Long, untilSeq: Long): Iterator[BrokerEntry]

  def close(): Unit = ()
}

/** In-JVM broker fake for specs and local runs (the source-side sibling of
  * [[graft.sinks.ConnectorSinks.InMemoryBroker]]; the container has no
  * broker). On a real cluster each executor sees its own copy — production
  * registers a factory opening a real client instead.
  */
object InMemoryPullBroker {
  private val streams =
    new java.util.concurrent.ConcurrentHashMap[String, util.ArrayList[BrokerEntry]]()

  /** Producer side: append one entry, returns its sequence number. */
  def append(stream: String, payload: String, timestampMs: Long): Long = {
    val list = streams.computeIfAbsent(stream, _ => new util.ArrayList[BrokerEntry]())
    list.synchronized {
      val seq = list.size().toLong
      list.add(BrokerEntry(seq, timestampMs, payload))
      seq
    }
  }

  def client(): PullClient = new PullClient {
    override def latestSequence(stream: String): Long = {
      val l = streams.get(stream)
      if (l == null) -1L else l.synchronized(l.size().toLong - 1)
    }
    override def fetch(stream: String, afterSeq: Long, untilSeq: Long): Iterator[BrokerEntry] = {
      val l = streams.get(stream)
      if (l == null) Iterator.empty
      else l.synchronized { // copy the slice; don't iterate under the lock
        val from = math.max(afterSeq + 1, 0L).toInt
        val to = math.min(untilSeq, l.size().toLong - 1).toInt
        (from to to).map(l.get).toVector
      }.iterator
    }
  }

  def clear(): Unit = streams.clear()
}

/** Driver-side registry mapping a `client` option value to a [[PullClient]]
  * factory. A DataSource V2 is constructed from string options, so the
  * factory cannot travel through `.option(...)`; it is looked up here ON
  * THE DRIVER at planning time and the resulting closure is serialized
  * into each input partition — executors never need the registry, the
  * same shipping model as a `foreachBatch` closure. Register at app
  * startup:
  * {{{
  *   BrokerClients.register("redis-prod", () => new MyRedisPullClient(host))
  *   spark.readStream.format("graft-broker")
  *     .option("stream", "events").option("client", "redis-prod").load()
  * }}}
  */
object BrokerClients {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, () => PullClient]()

  BrokerClients.registerBuiltins()

  def register(name: String, factory: () => PullClient): Unit =
    registry.put(name, factory)

  def factory(name: String): () => PullClient = {
    val f = registry.get(name)
    require(f != null,
      s"graft-broker: no PullClient registered under '$name' " +
        s"(registered: ${registry.keySet().asScala.toSeq.sorted.mkString(", ")})")
    f
  }

  private def registerBuiltins(): Unit =
    registry.put("memory", () => InMemoryPullBroker.client())
}

/** DataSource V2 for broker pull consumption: `format("graft-broker")` with
  * `stream` (the log name) and `client` (a [[BrokerClients]] registry key)
  * options. Output schema: (seq LONG, ts TIMESTAMP, value STRING,
  * stream STRING).
  *
  * Streaming form: offsets are sequence numbers, so the offset log is one
  * integer per batch (contrast the framed source's seen-file set);
  * `maxEntriesPerTrigger` caps batch size through Spark's admission
  * control — the Throttler-Backpressure mapping for broker sources, same
  * knob family as Kafka's `maxOffsetsPerTrigger`. Batch form reads
  * everything currently in the stream (a bounded replay).
  *
  * Scale notes: each micro-batch range splits into `fetchPartitions`
  * contiguous sub-ranges, one pull client each — the Spark analogue of the
  * reference's concurrent consumers in one consumer group. Entries fetch
  * directly from the broker on executors; nothing passes through the
  * driver but the two sequence numbers.
  */
class BrokerPullSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-broker"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerPullSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BrokerTable(properties.asScala.toMap)
}

object BrokerPullSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("stream", StringType, nullable = false)
  ))
}

private[graft] final case class BrokerOptions(
    stream: String,
    clientName: String,
    startingSequence: Long,
    maxEntriesPerTrigger: Long,
    fetchPartitions: Int)

private[graft] object BrokerOptions {
  def parse(opts: Map[String, String]): BrokerOptions = {
    val parsed = BrokerOptions(
      opts.getOrElse("stream",
        throw new IllegalArgumentException("graft-broker requires a 'stream' option")),
      opts.getOrElse("client", "memory"),
      opts.getOrElse("startingsequence", opts.getOrElse("startingSequence", "-1")).toLong,
      opts.getOrElse("maxentriespertrigger", opts.getOrElse("maxEntriesPerTrigger", "-1")).toLong,
      opts.getOrElse("fetchpartitions", opts.getOrElse("fetchPartitions", "4")).toInt)
    require(parsed.fetchPartitions > 0, "graft-broker: fetchPartitions must be positive")
    parsed
  }

  /** Split (after, until] into at most `n` contiguous sub-ranges. */
  def splitRange(after: Long, until: Long, n: Int): Seq[(Long, Long)] = {
    val count = until - after
    if (count <= 0) Seq.empty
    else {
      val parts = math.min(n.toLong, count).toInt
      (0 until parts).map { i =>
        val lo = after + count * i / parts
        val hi = after + count * (i + 1) / parts
        (lo, hi)
      }
    }
  }
}

class BrokerTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-broker(${properties.getOrElse("stream", "?")})"
  override def schema(): StructType = BrokerPullSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = properties ++ options.asScala
    new ScanBuilder with Scan with Batch {
      private val parsed = BrokerOptions.parse(opts)
      override def build(): Scan = this
      override def readSchema(): StructType = BrokerPullSource.schema
      override def toBatch: Batch = this

      // batch form: a bounded replay of everything currently in the stream
      override def planInputPartitions(): Array[InputPartition] = {
        val factory = BrokerClients.factory(parsed.clientName)
        val client = factory()
        val latest = try client.latestSequence(parsed.stream) finally client.close()
        BrokerOptions.splitRange(parsed.startingSequence, latest, parsed.fetchPartitions)
          .map { case (lo, hi) =>
            BrokerRangePartition(parsed.stream, factory, lo, hi): InputPartition
          }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = new BrokerReaderFactory

      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BrokerMicroBatchStream(parsed)
    }
  }
}

/** Micro-batch stream over a [[PullClient]]: `latestOffset` asks the broker
  * for its newest sequence (one tiny driver-side call), admission control
  * caps the advance at `maxEntriesPerTrigger`, and each batch's
  * (start, end] range fans out to `fetchPartitions` executor-side fetches.
  * A sequence-number offset serializes as one JSON integer — constant-size
  * regardless of how long the query runs.
  */
class BrokerMicroBatchStream(parsed: BrokerOptions)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val clientFactory = BrokerClients.factory(parsed.clientName)
  private val driverClient = clientFactory()

  override def initialOffset(): Offset = BrokerSeqOffset(parsed.startingSequence)

  override def getDefaultReadLimit: ReadLimit =
    if (parsed.maxEntriesPerTrigger > 0) ReadLimit.maxRows(parsed.maxEntriesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  /** Rows this limit allows per batch, or Long.MaxValue when unbounded.
    * CompositeReadLimit (Spark wraps limits when e.g. minRows or
    * Trigger.AvailableNow compose with maxRows) takes the tightest
    * ReadMaxRows component; a limit class we don't recognize falls back to
    * the configured trigger cap rather than silently reading everything.
    */
  private def maxRowsAllowed(limit: ReadLimit): Long = limit match {
    case m: ReadMaxRows => m.maxRows()
    case c: CompositeReadLimit =>
      c.getReadLimits.collect { case m: ReadMaxRows => m.maxRows() }
        .foldLeft(Long.MaxValue)(math.min)
    case _: ReadAllAvailable => Long.MaxValue
    case _ =>
      if (parsed.maxEntriesPerTrigger > 0) parsed.maxEntriesPerTrigger
      else Long.MaxValue
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val after = start.asInstanceOf[BrokerSeqOffset].seq
    val latest = driverClient.latestSequence(parsed.stream)
    val allowed = maxRowsAllowed(limit)
    val capped =
      if (allowed == Long.MaxValue) latest
      else math.min(latest, after + allowed)
    BrokerSeqOffset(math.max(capped, after))
  }

  override def reportLatestOffset(): Offset =
    BrokerSeqOffset(driverClient.latestSequence(parsed.stream))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BrokerSeqOffset].seq
    val e = end.asInstanceOf[BrokerSeqOffset].seq
    BrokerOptions.splitRange(s, e, parsed.fetchPartitions)
      .map { case (lo, hi) =>
        BrokerRangePartition(parsed.stream, clientFactory, lo, hi): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new BrokerReaderFactory

  override def deserializeOffset(json: String): Offset = BrokerSeqOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = driverClient.close()
}

/** Offset = last consumed sequence number (-1 before anything). */
final case class BrokerSeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

/** One fetch range; carries the serialized client factory closure so the
  * executor needs no registry (see [[BrokerClients]]).
  */
final case class BrokerRangePartition(
    stream: String, newClient: () => PullClient, afterSeq: Long, untilSeq: Long)
    extends InputPartition

class BrokerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BrokerRangePartition]
    new PartitionReader[InternalRow] {
      private val client = p.newClient()
      private val entries = client.fetch(p.stream, p.afterSeq, p.untilSeq)
      private val streamUtf8 = UTF8String.fromString(p.stream)
      private var current: BrokerEntry = _

      override def next(): Boolean =
        if (entries.hasNext) { current = entries.next(); true } else false

      override def get(): InternalRow = InternalRow(
        current.seq,
        current.timestampMs * 1000L, // TimestampType carries microseconds
        UTF8String.fromString(current.payload),
        streamUtf8)

      override def close(): Unit = client.close()
    }
  }
}
