package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE copy of the exactly-once machinery shared by every streaming
  * IVM maintainer ([[IngestAggView]], [[IngestJoinView]],
  * [[IngestJoinView3]], [[IngestTopKView]], [[IngestDistinctView]],
  * [[IngestQuantileView]], [[IngestJoinViewN]]) — previously six
  * near-identical inline blocks, which made "a fix applied to five of
  * six" the likeliest path to a silent IVM bug. Four pieces:
  *
  *  1. '''Replay watermark''' ([[lastApplied]]): the view carries the last
  *     applied `__batch` id over ALL rows including the sentinel; IVM
  *     delta arithmetic is not idempotent, so a redelivered batch with
  *     `batchId <= max(__batch)` must skip the view update.
  *  2. '''Sentinel view swap''' ([[swapViewWithSentinel]]): every view
  *     version is written through a catalog staging hop (a bare parquet
  *     directory with zero data files cannot infer a schema — the staging
  *     TABLE always can) and carries exactly one all-null SENTINEL row
  *     with the new `__batch`, so a batch that legitimately drains the
  *     view to zero data rows does not reset the watermark to -1 and let
  *     a redelivery re-apply the delta arithmetic. Readers filter the
  *     first data column `IS NOT NULL`.
  *  3. '''Loud row-id contract''' ([[assertUniqueInsertIds]],
  *     [[assertNoLiveIdReuse]]): duplicate insert ids within a batch, or
  *     an insert reusing a row id still live in the pre-batch base
  *     without a same-batch delete, would silently desynchronize the
  *     delta algebra (which counts every insert) from the bucket rebuild
  *     (which keeps one row per id) — both throw. The reuse probe
  *     semi-joins the id column across the WHOLE base, not just the
  *     buckets the inserts' keys hash to, so a cross-key reuse of a live
  *     row id (different key → different bucket) is caught too; the scan
  *     shape (column-pruned id read + broadcast semi join, no shuffle)
  *     is the same one every maintainer already pays to recover deleted
  *     rows by id.
  *  4. '''Touched-bucket base rebuild''' ([[rebuildTouchedBuckets]]): the
  *     base row store is hash-bucket partitioned on a key; only buckets
  *     containing this batch's changed keys are rebuilt — partition-
  *     pruned read, survivors anti-joined on the id (idempotent: re-runs
  *     converge, deleting an absent row is a no-op), inserts unioned,
  *     written through a staging table with dynamic-partition-overwrite
  *     (conf set AND restored — the writer option alone is not honored on
  *     every provider path, and a silently-static overwrite deletes every
  *     untouched bucket). Touched buckets the batch fully EMPTIED are
  *     explicitly dropped: dynamic overwrite only replaces partitions
  *     present in the staging data, so without the drop an emptied
  *     bucket's stale rows would survive and later dirty-key recomputes
  *     would resurrect deleted rows. `insertInto` is POSITIONAL and a
  *     USING-column join moves the join key to the front — staging data
  *     is pinned back to the table's read order before the write.
  *
  * Crash analysis (unchanged from the inline originals): view-first
  * ordering means a crash before the view swap replays everything; a
  * crash between view swap and base rebuild replays with the view skipped
  * and the base healed; both converge.
  */
private[streaming] object IvmMaintenance {

  /** Max `__batch` over the view including its sentinel row; -1 for an
    * all-null (bootstrap) watermark.
    */
  def lastApplied(view: DataFrame): Long = {
    val lastRow = view.agg(max(col("__batch"))).head()
    if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
  }

  /** Writes `merged` (already carrying `__batch = batchId` on data rows)
    * plus exactly one all-null sentinel row to `viewTable` through the
    * staging hop. The caller filtered the PREVIOUS sentinel out of the
    * merge input, so each view version carries exactly one.
    */
  def swapViewWithSentinel(
      spark: SparkSession,
      viewTable: String,
      merged: DataFrame,
      batchId: Long): Unit = {
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

  /** Throws if the batch carries duplicate insert ids. `consequence`
    * names what the caller's algebra would silently do wrong.
    */
  def assertUniqueInsertIds(
      ctx: String,
      inserts: DataFrame,
      idCol: String,
      consequence: String): Unit = {
    val dupRow = inserts.groupBy(col(idCol)).count()
      .agg(count(when(col("count") > 1, 1)).as("dups")).head()
    val dups = dupRow.getLong(0)
    if (dups > 0) throw new IllegalStateException(
      s"$ctx: batch carries $dups duplicate insert $idCol(s) — $consequence")
  }

  /** Throws if an insert reuses an id still live in the pre-batch base
    * without a same-batch delete. Full-base id semi-join (class doc
    * piece 3): catches cross-key id reuse that a bucket-pruned probe
    * would miss. Call only on FIRST delivery (inside the replay guard):
    * a redelivered batch's inserts already live in the healed base by
    * design, which is exactly what the idempotent rebuild expects.
    */
  def assertNoLiveIdReuse(
      ctx: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame,
      idCol: String,
      consequence: String): Unit = {
    val preexisting = base.select(col(idCol))
      .join(inserts.select(col(idCol)), Seq(idCol), "left_semi")
      .join(deleteIds, Seq(idCol), "left_anti")
      .count()
    if (preexisting > 0) throw new IllegalStateException(
      s"$ctx: batch inserts $preexisting $idCol(s) already live in the pre-batch " +
        s"base without a same-batch delete — $consequence; send delete+insert for updates")
  }

  /** The touched-bucket idempotent base rebuild (class doc piece 4).
    *
    * @param idCols    the row identity — a single surrogate (`row_id`)
    *                  for most maintainers, a COMPOSITE (e.g. the
    *                  canonical `(u, v)` edge pair in
    *                  [[IngestTrianglesCdc]]) where the domain key IS
    *                  the identity. Survivor anti-joins and the delete
    *                  recovery semi-join run on the full tuple.
    *                  CONTRACT: `inserts` must be the batch's inserts
    *                  MINUS rows already live in the base under the same
    *                  identity (the maintainers compute exactly this to
    *                  drive their delta algebra) — anti-joining
    *                  survivors on a raw insert feed while unioning only
    *                  the novel subset would silently drop a re-inserted
    *                  already-present row whose bucket another change
    *                  touches.
    * @param bucketKey column whose hash partitions the base (`bkt =
    *                  pmod(hash(bucketKey), buckets)`); inserts must
    *                  carry it plus `idCols` plus the table's other
    *                  payload columns (any order — the union is by name)
    * @param touchedFromChanges when the CDC feed carries `bucketKey` on
    *                  delete rows too, the caller may pass the changes
    *                  relation to derive touched buckets without the
    *                  base lookup; None recovers delete keys from the
    *                  base by id (the general form)
    */
  def rebuildTouchedBuckets(
      spark: SparkSession,
      table: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame,
      idCols: Seq[String],
      bucketKey: String,
      buckets: Int,
      touchedFromChanges: Option[DataFrame] = None): Unit = {
    val changedKeys = touchedFromChanges.getOrElse(
      inserts.select(col(bucketKey)).unionByName(
        base.join(deleteIds, idCols, "left_semi").select(col(bucketKey))))
    val touched = changedKeys
      .select(pmod(hash(col(bucketKey)), lit(buckets)).as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val withBkt = inserts.withColumn("bkt", pmod(hash(col(bucketKey)), lit(buckets)))
    val rebuilt = base.where(col("bkt").isin(touched: _*))
      .join(deleteIds, idCols, "left_anti")
      .join(inserts.select(idCols.map(col): _*), idCols, "left_anti")
      .unionByName(withBkt.select(base.columns.map(col).toIndexedSeq: _*))
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
