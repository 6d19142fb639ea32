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
  * unconditionally — the [[IngestAggView]] exactly-once contract. The
  * watermark is persisted INDEPENDENTLY of the view's data rows: every
  * view write appends one all-null SENTINEL row (`n IS NULL`) carrying
  * `__batch`, so a batch that legitimately drains the view to zero data
  * rows does not reset `max(__batch)` to -1 and let a redelivery
  * re-apply the delta arithmetic against already-rebuilt bases. Readers
  * of the maintained view filter `n IS NOT NULL`.
  *
  * Row-id contract (LOUD, the `cosineJoinSets` overflow-guard
  * discipline): within a batch, each side's insert `row_id`s must be
  * unique, and an insert's `row_id` must not still exist in the
  * pre-batch base unless the same batch deletes it (delete+insert = an
  * update). A CDC feed with colliding ids would otherwise silently
  * mis-maintain the view — the anti-join in the bucket rebuild keeps
  * exactly one row while the delta algebra counted two. The
  * existing-row check is bucket-pruned by the inserts' OWN keys: the
  * motivating collision (two b-rows sharing (orderkey, linenumber))
  * shares the key and therefore the bucket; a cross-key reuse of a
  * row_id is out of this contract's reach and stays the caller's duty.
  * The check runs only on FIRST delivery (inside the replay guard): a
  * redelivered batch's inserts already live in the healed base by
  * design, which is exactly what the idempotent rebuild expects.
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

      // 1) view update, guarded for replay. The watermark is max(__batch)
      // over ALL rows including the sentinel, so it survives a view that
      // drains to zero data rows; the merge input is data rows only.
      spark.sql(s"REFRESH TABLE $viewTable")
      val view = spark.table(viewTable)
      val lastRow = view.agg(max(col("__batch"))).head()
      val lastApplied = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
      if (batchId > lastApplied) {
        // the row-id contract is checked only on FIRST delivery: on a
        // redelivered batch the bases are already healed, so its inserts
        // legitimately exist in the base — the idempotent rebuild
        // anti-joins them, and the view guard above skips the math
        assertUniqueRowIds("a", aOld, aIns, aDelIds)
        assertUniqueRowIds("b", bOld, bIns, bDelIds)
        val merged = Storage.mergeJoinViewDelta(
            view.where(col("n").isNotNull).drop("__batch"),
            aOld.select(col("key"), col("grp")),
            bOld.select(col("key"), col("value")),
            aDelta, bDelta)
          .withColumn("__batch", lit(batchId))
        // exactly one sentinel per view version: the previous one is a
        // data-row-filtered non-participant above, this write adds the new
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

      // 2) base rebuilds, touched buckets only, idempotent
      rebuildBuckets(spark, aTable, aOld, aIns, aDelIds, Seq("key", "grp"))
      rebuildBuckets(spark, bTable, bOld, bIns, bDelIds, Seq("key", "value"))
    } finally changes.unpersist()
  }

  /** The loud row-id contract (class doc): throws on (1) duplicate insert
    * row_ids within the batch, (2) an insert row_id still present in the
    * pre-batch base and not deleted by this same batch. Check (2) reads
    * only the buckets the inserts' keys hash to — O(touched buckets), not
    * O(base) — which covers the motivating same-key collision exactly.
    */
  private def assertUniqueRowIds(
      side: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame): Unit = {
    val dupRow = inserts.groupBy(col("row_id")).count()
      .agg(count(when(col("count") > 1, 1)).as("dups")).head()
    val dups = dupRow.getLong(0)
    if (dups > 0) throw new IllegalStateException(
      s"IngestJoinView: side '$side' batch carries $dups duplicate insert row_id(s) — " +
        "row_id must uniquely identify a base row; a colliding CDC feed would " +
        "silently mis-maintain the view (delta algebra counts each insert, the " +
        "bucket rebuild keeps one row per id)")
    val insBkts = inserts.select(pmod(hash(col("key")), lit(buckets)).as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (insBkts.nonEmpty) {
      val preexisting = base.where(col("bkt").isin(insBkts: _*))
        .join(inserts.select(col("row_id")), Seq("row_id"), "left_semi")
        .join(deleteIds, Seq("row_id"), "left_anti")
        .count()
      if (preexisting > 0) throw new IllegalStateException(
        s"IngestJoinView: side '$side' batch inserts $preexisting row_id(s) already " +
          "present in the pre-batch base without a same-batch delete — send " +
          "delete+insert for updates, or the base rebuild drops the old row while " +
          "the view delta never subtracted it")
    }
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
