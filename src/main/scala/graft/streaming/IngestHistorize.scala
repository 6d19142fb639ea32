package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Cross-batch streaming SCD2 maintenance — the streaming face of
  * [[graft.sources.Storage.historize]], run as a `foreachBatch` body in
  * the EVENT-SOURCING shape: the append-only change LOG is the source of
  * truth; the validity-interval history table is a derived view rebuilt
  * from it each batch.
  *
  *  1. the micro-batch of changes (payload + `op` upsert/delete + a
  *     monotone `version`) APPENDS to `logTable` — one cheap columnar
  *     append, no read-modify-write;
  *  2. the history view re-derives: `historize(distinct log)` writes to a
  *     staging table, then rewrites `table` (the same mandatory hop and
  *     crash contract as [[IngestUpsert]] — a crash before the main
  *     rewrite leaves the old view intact and the replayed batch
  *     reproduces it; a crash during it is healed the same way).
  *
  * Why log-then-derive instead of merging into the history table
  * directly: an SCD2 table is NOT self-reconstructible — a delete bounds
  * its predecessor's interval but leaves no row, so incremental merge
  * logic needs tombstones, monotonicity guards, and replay dedup rules.
  * The log keeps every change; `distinct()` at read makes batch REPLAY a
  * no-op (a redelivered batch appends byte-identical rows), and
  * out-of-order versions are handled by `historize`'s per-key sort
  * rather than rejected. Append-before-derive means at-least-once on the
  * log converges to exactly-once in the view.
  *
  * Scale: the derive step rewrites the view each batch — the same
  * full-rewrite trade [[IngestUpsert]] documents, the right one at
  * micro-batch cadence on a dimension-sized table. At warehouse scale,
  * derive on a schedule instead (the log is already durable) and bucket
  * `logTable` by the key so the historize window reuses the layout.
  *
  * Bootstrap: create `logTable` before the stream starts — with the
  * initial state as upsert rows, or empty with the change schema. A
  * missing log table is a wiring error, loudly.
  */
final class IngestHistorize(
    key: String,
    version: String,
    logTable: String,
    table: String
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(logTable),
      s"IngestHistorize: log table '$logTable' must be initialized before the stream " +
        "starts (the initial feed as upserts, or an empty frame of the change schema)")
    batch.write.mode("append").format("parquet").saveAsTable(logTable)
    // path reads with fresh listings, as in IngestUpsert: "the files as
    // of the start of this read", immune to this loop's own rewrites
    def pathOf(name: String): String =
      spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(name))
        .location.toString
    val staging = s"${table}__staging"
    val feed = spark.read.parquet(pathOf(logTable)).distinct()
    Storage.historize(feed, col(key), col(version))
      .write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.read.parquet(pathOf(staging))
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.sql(s"REFRESH TABLE $table")
  }
}
