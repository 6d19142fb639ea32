package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a per-group QUANTILE view — the
  * streaming face of [[graft.sources.Storage.mergeQuantileCellsDelta]],
  * run as a `foreachBatch` body: each micro-batch of row-level changes
  * (`row_id`, `grp`, `value`, `op` ∈ insert|delete) updates
  *
  *  1. the (grp, cell, rc) DYADIC-CELL refcount relation by pure delta
  *     arithmetic — the bounded bracketing structure from which
  *     [[graft.sources.Storage.quantilesFromCells]] serves exact type-1
  *     quantiles; fully self-maintainable (no dirty recompute exists in
  *     this shape — the refcount algebra is the count-distinct one, one
  *     level up), the base read only to recover deleted rows' values;
  *  2. the BASE row store, hash-bucket partitioned on the group — the
  *     [[IngestAggView]] rebuild machinery (idempotent, touched buckets
  *     only, dynamic overwrite through a staging hop, emptied buckets
  *     dropped). Serving reads candidate-cell rows from this store.
  *
  * Replay safety, the drained-view watermark sentinel (`rc IS NULL`),
  * and the duplicate-insert-id loud contract follow [[IngestDistinctView]]
  * verbatim; an insert reusing a live base id is REJECTED for the same
  * reason (refcount arithmetic has no replace semantics — the cell would
  * count the value twice while the base keeps one row; send
  * delete+insert).
  *
  * Bootstrap both tables before the stream starts: the base partitioned
  * by `bkt = pmod(hash(grp), buckets)`, the cell relation
  * (grp, cell, rc) with `__batch = -1`.
  *
  * `weight = Some(col)` switches the state to WEIGHTED mass
  * ([[graft.sources.Storage.mergeWeightedQuantileCellsDelta]] — rc is
  * Σ weight per cell, the q197 LONG ≥ 1 contract): the batch and the
  * base then carry that column, and serving goes through
  * [[graft.sources.Storage.weightedQuantilesFromCells]].
  */
final class IngestQuantileView(
    baseTable: String,
    cellTable: String,
    buckets: Int,
    scale: Int,
    weight: Option[String] = None
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(baseTable) && spark.catalog.tableExists(cellTable),
      s"IngestQuantileView: '$baseTable' and '$cellTable' must be initialized first")

    val changes = batch.persist()
    try {
      val payload = Seq("row_id", "grp", "value") ++ weight
      val inserts = changes.where(col("op") === "insert")
        .select(payload.map(col): _*)
      val deleteIds = changes.where(col("op") === "delete").select(col("row_id"))
      spark.sql(s"REFRESH TABLE $baseTable")
      val base = spark.table(baseTable)

      spark.sql(s"REFRESH TABLE $cellTable")
      val cells = spark.table(cellTable)
      val lastRow = cells.agg(max(col("__batch"))).head()
      val lastApplied = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
      if (batchId > lastApplied) {
        val dupRow = inserts.groupBy(col("row_id")).count()
          .agg(count(when(col("count") > 1, 1)).as("dups")).head()
        if (dupRow.getLong(0) > 0) throw new IllegalStateException(
          s"IngestQuantileView: batch carries ${dupRow.getLong(0)} duplicate insert " +
            "row_id(s) — cell refcounts would double-count while the base keeps one row")
        val insBkts = inserts.select(pmod(hash(col("grp")), lit(buckets)).as("bkt"))
          .distinct().collect().map(_.getInt(0)).toSeq
        if (insBkts.nonEmpty) {
          val preexisting = base.where(col("bkt").isin(insBkts: _*))
            .join(inserts.select(col("row_id")), Seq("row_id"), "left_semi")
            .join(deleteIds, Seq("row_id"), "left_anti")
            .count()
          if (preexisting > 0) throw new IllegalStateException(
            s"IngestQuantileView: batch inserts $preexisting row_id(s) already live " +
              "in the base without a same-batch delete — refcount arithmetic has no " +
              "replace semantics; send delete+insert for updates")
        }
        val liveCells = cells.where(col("rc").isNotNull).drop("__batch")
        val basePayload = base.select(payload.map(col): _*)
        val merged = (weight match {
          case Some(w) => Storage.mergeWeightedQuantileCellsDelta(
            liveCells, basePayload, inserts, deleteIds, "row_id", "grp", "value", w, scale)
          case None => Storage.mergeQuantileCellsDelta(
            liveCells, basePayload, inserts, deleteIds, "row_id", "grp", "value", scale)
        }).withColumn("__batch", lit(batchId))
        val sentinel = spark.range(1).select(
          merged.schema.fields.map { f =>
            if (f.name == "__batch") lit(batchId).as("__batch")
            else lit(null).cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
        val next = merged.unionByName(sentinel)
        val staging = s"${cellTable}__staging"
        next.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
        spark.sql(s"REFRESH TABLE $staging")
        spark.table(staging)
          .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(cellTable)
        spark.sql(s"REFRESH TABLE $cellTable")
      }

      // base rebuild, touched buckets only, idempotent (the IngestTopKView
      // machinery — bucket key = the group)
      val changedGrps = inserts.select(col("grp"))
        .unionByName(base.join(deleteIds, Seq("row_id"), "left_semi").select(col("grp")))
      val touched = changedGrps.select(pmod(hash(col("grp")), lit(buckets)).as("bkt"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (touched.nonEmpty) {
        val withBkt = inserts.withColumn("bkt", pmod(hash(col("grp")), lit(buckets)))
        val rebuilt = base.where(col("bkt").isin(touched: _*))
          .join(deleteIds, Seq("row_id"), "left_anti")
          .join(inserts.select(col("row_id")), Seq("row_id"), "left_anti")
          .unionByName(withBkt.select((payload :+ "bkt").map(col): _*))
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
