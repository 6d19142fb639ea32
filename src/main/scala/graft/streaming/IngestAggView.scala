package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a per-key aggregate VIEW — the
  * streaming face of [[graft.sources.Storage.mergeAggDelta]], run as a
  * `foreachBatch` body: each micro-batch of row-level changes
  * (`rowId`, `key`, `value`, `op` ∈ insert|delete) updates
  *
  *  1. the aggregate view (`key`, n, total, mx) by IVM delta arithmetic —
  *     the base is touched only through `mergeAggDelta`'s semi-restricted
  *     dirty-key max recompute, never re-aggregated;
  *  2. the BASE row store itself, a parquet table partitioned by a hash
  *     bucket of the key: only the buckets containing this batch's keys
  *     are rebuilt (partition-pruned read, dynamic-partition-overwrite
  *     write through a staging hop) — per-batch base write cost is
  *     proportional to touched buckets, not base size. Touched buckets
  *     the batch's deletes fully EMPTIED are explicitly dropped: dynamic
  *     overwrite only replaces partitions present in the staging data,
  *     so without the drop an emptied bucket's stale rows would survive.
  *
  * Replay safety (foreachBatch is at-least-once): the view carries the
  * last applied `__batch` id; a redelivered batch with
  * `batchId <= max(__batch)` SKIPS the view update — IVM arithmetic is
  * not idempotent, so the guard, not the merge, provides exactly-once.
  * The watermark is persisted independently of the view's data rows:
  * every view write appends one all-null SENTINEL row (`n IS NULL`)
  * carrying `__batch`, so a batch that legitimately drains the view to
  * zero data rows does not reset `max(__batch)` to -1 and let a
  * redelivery re-apply the delta arithmetic ([[IngestJoinView]] is
  * hardened identically). Readers of the maintained view filter
  * `n IS NOT NULL`.
  * The base rebuild IS idempotent (inserts are anti-joined on `rowId`
  * before the union; deleting an absent row is a no-op), so it re-runs
  * unconditionally. Crash analysis: view-first ordering means a crash
  * before the view swap replays everything; a crash between view swap
  * and base rebuild replays with the view skipped and the base healed;
  * both converge (spec-proven at either hop).
  *
  * Bootstrap both tables before the stream starts: the base partitioned
  * by `bkt = pmod(hash(key), buckets)`, the view with `__batch = -1`.
  */
final class IngestAggView(
    rowId: String,
    key: String,
    value: String,
    baseTable: String,
    viewTable: String,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(baseTable) && spark.catalog.tableExists(viewTable),
      s"IngestAggView: '$baseTable' and '$viewTable' must be initialized before the stream starts")

    val changes = batch.persist()
    try {
      val inserts = changes.where(col("op") === "insert")
        .select(col(rowId), col(key), col(value))
      val deleteIds = changes.where(col("op") === "delete").select(col(rowId))
      // Catalog-backed reads throughout (never raw path scans): both the
      // base and the view may legitimately reach ZERO rows (every row /
      // every key deleted), and a bare parquet directory with no data
      // files cannot infer a schema — the catalog always knows it.
      spark.sql(s"REFRESH TABLE $baseTable")
      val base = spark.table(baseTable)

      // 1) view update, guarded for replay
      spark.sql(s"REFRESH TABLE $viewTable")
      val view = spark.table(viewTable)
      val lastRow = view.agg(max(col("__batch"))).head()
      val lastApplied = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
      if (batchId > lastApplied) {
        val merged = Storage.mergeAggDelta(
            view.where(col("n").isNotNull).drop("__batch"),
            base, inserts, deleteIds, rowId, key, value)
          .withColumn("__batch", lit(batchId))
        // exactly one sentinel per view version (class doc): the previous
        // one is filtered out of the merge input above, this write adds new
        val sentinel = spark.range(1).select(
          merged.schema.fields.map { f =>
            if (f.name == "__batch") lit(batchId).as("__batch")
            else lit(null).cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
        val next = merged.unionByName(sentinel)
        val staging = s"${viewTable}__staging"
        next.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
        // catalog-backed read (not a raw path scan): the staging table may
        // legitimately hold ZERO rows (every key deleted), and a bare
        // parquet directory with no data files cannot infer a schema.
        spark.sql(s"REFRESH TABLE $staging")
        spark.table(staging)
          .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(viewTable)
        spark.sql(s"REFRESH TABLE $viewTable")
      }

      // 2) base rebuild, touched buckets only, idempotent
      val touched = changes.select(pmod(hash(col(key)), lit(buckets)).as("bkt"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (touched.nonEmpty) {
        val withBkt = inserts.withColumn("bkt", pmod(hash(col(key)), lit(buckets)))
        // pin the table's read order before the positional insertInto: a
        // USING-column join moves `rowId` to the front, which here happens
        // to BE the table order — the explicit select makes that survive
        // any schema whose rowId is not the first column (the
        // IngestJoinView column-rotation bug, hardened against here too)
        val rebuilt = base.where(col("bkt").isin(touched: _*))
          .join(deleteIds, Seq(rowId), "left_anti")
          .join(inserts.select(col(rowId)), Seq(rowId), "left_anti")
          .unionByName(withBkt.select(col(rowId), col(key), col(value), col("bkt")))
          .select(base.columns.map(col).toIndexedSeq: _*)
        val baseStaging = s"${baseTable}__staging"
        rebuilt.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(baseStaging)
        spark.sql(s"REFRESH TABLE $baseStaging")
        val stagingDf = spark.table(baseStaging)
        // insertInto is positional and must not re-declare partitioning.
        // Dynamic mode scopes the overwrite to the buckets present in the
        // staging data — untouched partitions stay byte-identical. The
        // session conf is set (and restored — no cross-query leakage)
        // alongside the writer option: the option alone is not honored on
        // every table provider path, and a silently-static overwrite here
        // DELETES every untouched bucket.
        val modeKey = "spark.sql.sources.partitionOverwriteMode"
        val prevMode = spark.conf.getOption(modeKey)
        try {
          spark.conf.set(modeKey, "dynamic")
          stagingDf
            .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
            .insertInto(baseTable)
        } finally prevMode match {
          case Some(v) => spark.conf.set(modeKey, v)
          case None    => spark.conf.unset(modeKey)
        }
        // Dynamic overwrite only replaces partitions PRESENT in the staging
        // data. A touched bucket that this batch's deletes fully emptied
        // (no survivors, no inserts hashing to it) is absent from `rebuilt`
        // — without an explicit drop its stale rows would silently survive
        // and later dirty-key max recomputes would read resurrected deleted
        // rows. `touched` is already a bounded driver list, so the
        // emptied-bucket set is one distinct over the staging data away.
        val present = stagingDf
          .select(col("bkt")).distinct().collect().map(_.getInt(0)).toSet
        touched.filterNot(present).foreach { b =>
          spark.sql(s"ALTER TABLE $baseTable DROP IF EXISTS PARTITION (bkt=$b)")
        }
        spark.sql(s"REFRESH TABLE $baseTable")
      }
    } finally changes.unpersist()
  }
}
