package graft

import graft.streaming.IngestUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC maintenance: cross-batch convergence to the one-shot
  * merge, batch replay idempotence, and the loud missing-bootstrap
  * failure.
  */
class IngestUpsertSpec extends SparkSpec {
  import spark.implicits._

  // a reader in ANOTHER session must refresh its own relation cache —
  // the stream's per-batch refresh clears the batch session's caches,
  // not this one's (per-session caches; standard Spark contract for any
  // table rewritten behind a reader's back)
  private def snapshot(table: String): Map[Long, String] = {
    spark.sql(s"REFRESH TABLE $table")
    spark.table(table).select(col("k"), col("v"))
      .as[(Long, String)].collect().toMap
  }

  test("ingest upsert: changes split across batches converge; replay is idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = "graft_upsert_snap"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
    Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00")),
      (3L, "c", ts("2024-01-01 00:00:00"))
    ).toDF("k", "v", "ver").write.mode("overwrite").format("parquet").saveAsTable(table)
    try {
      val in = MemoryStream[(Long, String, java.sql.Timestamp, String)]
      val q = in.toDS().toDF("k", "v", "ver", "op").writeStream
        .foreachBatch(new IngestUpsert("k", "ver", table))
        .start()
      // batch 1: update k=1, delete k=2, insert k=4
      in.addData(
        (1L, "a2", ts("2024-01-02 00:00:00"), "upsert"),
        (2L, "x", ts("2024-01-02 00:00:00"), "delete"),
        (4L, "d", ts("2024-01-02 00:00:00"), "upsert"))
      q.processAllAvailable()
      assert(snapshot(table) == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
      // batch 2: a LATER change to k=1 (the cross-batch chain), and two
      // same-key changes within one batch (latest version wins)
      in.addData(
        (1L, "a3", ts("2024-01-03 00:00:00"), "upsert"),
        (4L, "d2", ts("2024-01-03 00:00:00"), "upsert"),
        (4L, "d3", ts("2024-01-04 00:00:00"), "upsert"))
      q.processAllAvailable()
      assert(snapshot(table) == Map(1L -> "a3", 3L -> "c", 4L -> "d3"))
      // batch 3 = REPLAY of batch 2 (the redelivery case): converges
      in.addData(
        (1L, "a3", ts("2024-01-03 00:00:00"), "upsert"),
        (4L, "d2", ts("2024-01-03 00:00:00"), "upsert"),
        (4L, "d3", ts("2024-01-04 00:00:00"), "upsert"))
      q.processAllAvailable()
      assert(snapshot(table) == Map(1L -> "a3", 3L -> "c", 4L -> "d3"))
      q.stop()
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
    }
  }

  test("ingest upsert: a missing snapshot table fails loudly, not as an empty snapshot") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS graft_upsert_missing")
    val in = MemoryStream[(Long, String, java.sql.Timestamp, String)]
    val q = in.toDS().toDF("k", "v", "ver", "op").writeStream
      .foreachBatch(new IngestUpsert("k", "ver", "graft_upsert_missing"))
      .start()
    in.addData((1L, "a", ts("2024-01-01 00:00:00"), "upsert"))
    val err = intercept[Exception] { q.processAllAvailable() }
    assert(err.getMessage.contains("must be initialized"),
      s"unexpected failure: ${err.getMessage}")
    q.stop()
  }
}
