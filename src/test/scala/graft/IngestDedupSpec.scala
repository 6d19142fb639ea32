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
}
