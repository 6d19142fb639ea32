package graft

import graft.streaming.IngestDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Cross-batch streaming ingest dedup: novelty-only delivery across
  * micro-batches, across query restarts, and from a cold (no-index)
  * bootstrap — the full-history contract watermarked dedup can't give.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  test("ingest dedup: novelty-only across batches, restarts, and the empty-index bootstrap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "graft_ingest_seen_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def mkSink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (novel, id) => got ++= novel.select(col("id"), col("text"))
        .as[(Long, String)].collect().map(r => (r._1, r._2, id))
    try {
      val in = MemoryStream[(Long, String)]
      val q = in.toDS().toDF("id", "text").writeStream
        .foreachBatch(IngestDedup(col("text"), table, expectedItems = 10000L)(mkSink))
        .start()
      // batch 0 against NO index: within-batch dup of "a" collapses, all
      // novelty passes (the bootstrap case that once silently dropped all)
      in.addData((1L, "a"), (2L, "b"), (3L, "a"))
      q.processAllAvailable()
      assert(got.map(_._2).sorted == Seq("a", "b"))
      // batch 1: "a" is now history → dropped; "c" is new
      in.addData((4L, "a"), (5L, "c"))
      q.processAllAvailable()
      assert(got.map(_._2).sorted == Seq("a", "b", "c"))
      q.stop()

      // restart: fresh query + fresh IngestDedup (driver state gone) — the
      // filter must rebuild from the persisted index and still drop "b"
      val in2 = MemoryStream[(Long, String)]
      val q2 = in2.toDS().toDF("id", "text").writeStream
        .foreachBatch(IngestDedup(col("text"), table, expectedItems = 10000L)(mkSink))
        .start()
      in2.addData((6L, "b"), (7L, "d"))
      q2.processAllAvailable()
      assert(got.map(_._2).sorted == Seq("a", "b", "c", "d"))
      assert(got.collect { case (id, "d", _) => id } == Seq(7L))
      q2.stop()

      // the index carries each hash exactly once-per-append, never a
      // re-dedup of history: 4 distinct hashes total
      assert(spark.table(table).distinct().count() == 4)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ingest dedup: a sink failure BEFORE the index append re-delivers on restart — no loss") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "graft_ingest_seen_idx_fail"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    @volatile var failNext = false
    val ingest = graft.streaming.IngestDedup(col("text"), table, expectedItems = 10000L) {
      (novel, _) =>
        val rows = novel.select("text").as[String].collect()
        if (failNext) { failNext = false; sys.error("sink outage (injected)") }
        got ++= rows
    }
    try {
      val in = MemoryStream[(Long, String)]
      val q = in.toDS().toDF("id", "text").writeStream.foreachBatch(ingest).start()
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(got.sorted == Seq("a", "b"))
      // batch 1's sink dies BEFORE anything was recorded or appended
      failNext = true
      in.addData((3L, "b"), (4L, "c"))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.processAllAvailable())
      q.stop()
      assert(got.sorted == Seq("a", "b")) // nothing half-delivered
      // restart reusing the SAME IngestDedup instance (driver state kept):
      // sink-before-append means the failed batch's novelty was never
      // indexed, so the replay delivers "c" — at-least-once, zero loss
      val in2 = MemoryStream[(Long, String)]
      val q2 = in2.toDS().toDF("id", "text").writeStream.foreachBatch(ingest).start()
      in2.addData((3L, "b"), (4L, "c"))
      q2.processAllAvailable()
      q2.stop()
      assert(got.sorted == Seq("a", "b", "c"))
      assert(spark.table(table).distinct().count() == 3)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("backfill batch over the threshold maintains the filter executor-side — no O(batch) driver collect") {
    val table = "graft_ingest_backfill_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    var delivered = 0L
    val ingest = IngestDedup(col("text"), table,
      expectedItems = 2000000L, collectThreshold = 100000L) {
      (novel, _) => delivered += novel.count()
    }
    def docs(from: Long, until: Long) =
      spark.range(from, until).select(col("id"), concat(lit("doc-"), col("id")).as("text"))
    try {
      // 10⁶ novel rows in one batch: over the threshold → partial filters
      // tree-merged at the standing geometry, never 10⁶ hashes through
      // the driver
      ingest(docs(0L, 1000000L).toDF(), 0L)
      assert(ingest.lastFilterMaintenance == "treeReduce")
      assert(delivered == 1000000L)
      // a full replay is dropped THROUGH THE MERGED FILTER (proves the
      // tree-merged delta actually reached the driver copy + broadcast);
      // its 0 novel rows take the micro-batch collect path
      ingest(docs(0L, 1000000L).toDF(), 1L)
      assert(delivered == 1000000L)
      assert(ingest.lastFilterMaintenance == "collect")
      // mixed batch: only the 10 genuinely new rows deliver
      ingest(docs(999990L, 1000010L).toDF(), 2L)
      assert(delivered == 1000010L)
      assert(spark.table(table).distinct().count() == 1000010L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
