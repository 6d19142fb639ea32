package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a JOIN view — the streaming face
  * of [[graft.sources.Storage.mergeJoinViewDelta]], run as a
  * `foreachBatch` body: each micro-batch carries row-level changes to
  * BOTH base tables (`side` ∈ a|b, `row_id`, `key`, `grp`/`value`,
  * `op` ∈ insert|delete) and updates
  *
  *  1. the join view (`grp`, n, total) by the signed delta-join algebra —
  *     ΔA⋈B + A⋈ΔB + ΔA⋈ΔB against the PRE-batch base tables, which are
  *     touched only through delta-keyed joins, never re-joined; deleted
  *     rows are recovered from the base by `row_id` (the CDC-without-
  *     full-before-image convention q159 set);
  *  2. both BASE row stores, hash-bucket partitioned, touched buckets
  *     only — the [[IngestAggView]] rebuild machinery verbatim
  *     (idempotent, dynamic-partition-overwrite through a staging hop,
  *     emptied buckets explicitly dropped).
  *
  * Replay safety: the view carries `__batch`; a redelivered batch skips
  * the (non-idempotent) view update, the base rebuilds re-run
  * unconditionally — the [[IngestAggView]] exactly-once contract.
  *
  * Bootstrap all three tables before the stream starts: bases partitioned
  * by `bkt = pmod(hash(key), buckets)`, the view with `__batch = -1`.
  */
final class IngestJoinView(
    aTable: String,
    bTable: String,
    viewTable: String,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(aTable) && spark.catalog.tableExists(bTable) &&
      spark.catalog.tableExists(viewTable),
      s"IngestJoinView: '$aTable', '$bTable', '$viewTable' must be initialized first")

    val changes = batch.persist()
    try {
      spark.sql(s"REFRESH TABLE $aTable")
      spark.sql(s"REFRESH TABLE $bTable")
      val aOld = spark.table(aTable)
      val bOld = spark.table(bTable)

      val aIns = changes.where(col("side") === "a" && col("op") === "insert")
        .select(col("row_id"), col("key"), col("grp"))
      val aDelIds = changes.where(col("side") === "a" && col("op") === "delete")
        .select(col("row_id"))
      val bIns = changes.where(col("side") === "b" && col("op") === "insert")
        .select(col("row_id"), col("key"), col("value"))
      val bDelIds = changes.where(col("side") === "b" && col("op") === "delete")
        .select(col("row_id"))

      // signed deltas; delete rows recovered from the PRE-batch base
      val aDelta = aIns.select(col("key"), col("grp"), lit(1).as("sign"))
        .unionByName(aOld.join(aDelIds, Seq("row_id"), "left_semi")
          .select(col("key"), col("grp"), lit(-1).as("sign")))
      val bDelta = bIns.select(col("key"), col("value"), lit(1).as("sign"))
        .unionByName(bOld.join(bDelIds, Seq("row_id"), "left_semi")
          .select(col("key"), col("value"), lit(-1).as("sign")))

      // 1) view update, guarded for replay
      spark.sql(s"REFRESH TABLE $viewTable")
      val view = spark.table(viewTable)
      val lastRow = view.agg(max(col("__batch"))).head()
      val lastApplied = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
      if (batchId > lastApplied) {
        val next = Storage.mergeJoinViewDelta(
            view.drop("__batch"),
            aOld.select(col("key"), col("grp")),
            bOld.select(col("key"), col("value")),
            aDelta, bDelta)
          .withColumn("__batch", lit(batchId))
        val staging = s"${viewTable}__staging"
        next.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
        spark.sql(s"REFRESH TABLE $staging")
        spark.table(staging)
          .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(viewTable)
        spark.sql(s"REFRESH TABLE $viewTable")
      }

      // 2) base rebuilds, touched buckets only, idempotent
      rebuildBuckets(spark, aTable, aOld, aIns, aDelIds, Seq("key", "grp"))
      rebuildBuckets(spark, bTable, bOld, bIns, bDelIds, Seq("key", "value"))
    } finally changes.unpersist()
  }

  /** The [[IngestAggView]] touched-bucket rebuild, generalized over the
    * carried columns: partition-pruned read, anti-joined survivors union
    * inserts, dynamic-overwrite through a staging hop, emptied buckets
    * dropped.
    */
  private def rebuildBuckets(
      spark: SparkSession,
      table: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame,
      carried: Seq[String]): Unit = {
    val changedKeys = inserts.select(col("key"))
      .unionByName(base.join(deleteIds, Seq("row_id"), "left_semi").select(col("key")))
    val touched = changedKeys.select(pmod(hash(col("key")), lit(buckets)).as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val cols = col("row_id") +: carried.map(col) :+ col("bkt")
    val withBkt = inserts.withColumn("bkt", pmod(hash(col("key")), lit(buckets)))
    // `insertInto` is POSITIONAL, and a USING-column join moves the join
    // key to the FRONT of the output — pin the staging data back to the
    // table's read order or every rebuilt row is silently column-rotated
    val rebuilt = base.where(col("bkt").isin(touched: _*))
      .join(deleteIds, Seq("row_id"), "left_anti")
      .join(inserts.select(col("row_id")), Seq("row_id"), "left_anti")
      .unionByName(withBkt.select(cols: _*))
      .select(base.columns.map(col).toIndexedSeq: _*)
    val staging = s"${table}__staging"
    rebuilt.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
    spark.sql(s"REFRESH TABLE $staging")
    val stagingDf = spark.table(staging)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    try {
      spark.conf.set(modeKey, "dynamic")
      stagingDf
        .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
        .insertInto(table)
    } finally prevMode match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None    => spark.conf.unset(modeKey)
    }
    val present = stagingDf.select(col("bkt")).distinct().collect().map(_.getInt(0)).toSet
    touched.filterNot(present).foreach { b =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (bkt=$b)")
    }
    spark.sql(s"REFRESH TABLE $table")
  }
}
