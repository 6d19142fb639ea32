package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a per-group TOP-K view — the
  * streaming face of [[graft.sources.Storage.mergeTopKDelta]], run as a
  * `foreachBatch` body: each micro-batch of row-level changes
  * (`row_id`, `grp`, `score`, `op` ∈ insert|delete) updates
  *
  *  1. the view (`grp`, rank, row_id, score) by the delta split — kept
  *     rows compete with the batch's inserts state-side; only groups
  *     whose KEPT rows were deleted or replaced recompute from surviving
  *     base rows, semi-restricted;
  *  2. the BASE row store, hash-bucket partitioned ON THE GROUP (the
  *     dirty-group recompute is a group-sliced read, so the bucket key
  *     follows it), touched buckets only — the [[IngestAggView]] rebuild
  *     machinery (idempotent, dynamic-partition-overwrite through a
  *     staging hop, emptied buckets dropped).
  *
  * Replay safety and the watermark sentinel follow [[IngestJoinView]]
  * verbatim: the view carries `__batch`, a redelivered batch skips the
  * view update, every view version carries one all-null sentinel row
  * (`rank IS NULL`) so a drained view keeps its watermark; readers
  * filter `rank IS NOT NULL`.
  *
  * Row-id contract (first delivery only, inside the replay guard):
  * duplicate insert row_ids within a batch throw loudly — the base
  * rebuild keeps one row per id while the view pool competes both. An
  * insert REUSING a live base id is legal here (a REPLACE —
  * `mergeTopKDelta` dirties the group when the id is a view member and
  * the base rebuild replaces the row either way).
  *
  * Bootstrap both tables before the stream starts: the base partitioned
  * by `bkt = pmod(hash(grp), buckets)`, the view with `__batch = -1`.
  */
final class IngestTopKView(
    baseTable: String,
    viewTable: String,
    k: Int,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(baseTable) && spark.catalog.tableExists(viewTable),
      s"IngestTopKView: '$baseTable' and '$viewTable' must be initialized first")

    val changes = batch.persist()
    try {
      val inserts = changes.where(col("op") === "insert")
        .select(col("row_id"), col("grp"), col("score"))
      val deleteIds = changes.where(col("op") === "delete").select(col("row_id"))
      spark.sql(s"REFRESH TABLE $baseTable")
      val base = spark.table(baseTable)

      // 1) view update, guarded for replay; watermark over ALL rows
      //    including the sentinel (the IngestJoinView contract)
      spark.sql(s"REFRESH TABLE $viewTable")
      val view = spark.table(viewTable)
      val lastRow = view.agg(max(col("__batch"))).head()
      val lastApplied = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
      if (batchId > lastApplied) {
        val dupRow = inserts.groupBy(col("row_id")).count()
          .agg(count(when(col("count") > 1, 1)).as("dups")).head()
        if (dupRow.getLong(0) > 0) throw new IllegalStateException(
          s"IngestTopKView: batch carries ${dupRow.getLong(0)} duplicate insert " +
            "row_id(s) — the base rebuild keeps one row per id while the view " +
            "pool competes both; mint unique ids upstream")
        val merged = Storage.mergeTopKDelta(
            view.where(col("rank").isNotNull).drop("__batch"),
            base.select(col("row_id"), col("grp"), col("score")),
            inserts, deleteIds, "row_id", "grp", "score", k)
          .withColumn("__batch", lit(batchId))
        val sentinel = spark.range(1).select(
          merged.schema.fields.map { f =>
            if (f.name == "__batch") lit(batchId).as("__batch")
            else lit(null).cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
        val next = merged.unionByName(sentinel)
        val staging = s"${viewTable}__staging"
        next.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
        spark.sql(s"REFRESH TABLE $staging")
        spark.table(staging)
          .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(viewTable)
        spark.sql(s"REFRESH TABLE $viewTable")
      }

      // 2) base rebuild, touched buckets only, idempotent — the
      //    IngestAggView machinery with the GROUP as the bucket key
      val changedGrps = inserts.select(col("grp"))
        .unionByName(base.join(deleteIds, Seq("row_id"), "left_semi").select(col("grp")))
      val touched = changedGrps.select(pmod(hash(col("grp")), lit(buckets)).as("bkt"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (touched.nonEmpty) {
        val withBkt = inserts.withColumn("bkt", pmod(hash(col("grp")), lit(buckets)))
        // pin the table's read order before the positional insertInto
        // (the IngestJoinView column-rotation hardening)
        val rebuilt = base.where(col("bkt").isin(touched: _*))
          .join(deleteIds, Seq("row_id"), "left_anti")
          .join(inserts.select(col("row_id")), Seq("row_id"), "left_anti")
          .unionByName(withBkt.select(col("row_id"), col("grp"), col("score"), col("bkt")))
          .select(base.columns.map(col).toIndexedSeq: _*)
        val baseStaging = s"${baseTable}__staging"
        rebuilt.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(baseStaging)
        spark.sql(s"REFRESH TABLE $baseStaging")
        val stagingDf = spark.table(baseStaging)
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
        val present = stagingDf.select(col("bkt")).distinct().collect().map(_.getInt(0)).toSet
        touched.filterNot(present).foreach { b =>
          spark.sql(s"ALTER TABLE $baseTable DROP IF EXISTS PARTITION (bkt=$b)")
        }
        spark.sql(s"REFRESH TABLE $baseTable")
      }
    } finally changes.unpersist()
  }
}
