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
  * existing-row check probes by row_id across the WHOLE base (not just
  * the inserts' buckets), so a cross-key reuse of a live row_id — which
  * lands in a different bucket — is caught too; the probe's scan shape
  * matches the delete-recovery id semi-join this maintainer already
  * pays. The check runs only on FIRST delivery (inside the replay
  * guard): a redelivered batch's inserts already live in the healed
  * base by design, which is exactly what the idempotent rebuild expects.
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

      // 1) view update, guarded for replay ([[IvmMaintenance]] pieces 1+2)
      spark.sql(s"REFRESH TABLE $viewTable")
      val view = spark.table(viewTable)
      if (batchId > IvmMaintenance.lastApplied(view)) {
        // the row-id contract is checked only on FIRST delivery: on a
        // redelivered batch the bases are already healed, so its inserts
        // legitimately exist in the base — the idempotent rebuild
        // anti-joins them, and the view guard above skips the math
        assertRowIdContract("a", aOld, aIns, aDelIds)
        assertRowIdContract("b", bOld, bIns, bDelIds)
        val merged = Storage.mergeJoinViewDelta(
            view.where(col("n").isNotNull).drop("__batch"),
            aOld.select(col("key"), col("grp")),
            bOld.select(col("key"), col("value")),
            aDelta, bDelta)
          .withColumn("__batch", lit(batchId))
        IvmMaintenance.swapViewWithSentinel(spark, viewTable, merged, batchId)
      }

      // 2) base rebuilds, touched buckets only, idempotent
      IvmMaintenance.rebuildTouchedBuckets(
        spark, aTable, aOld, aIns, aDelIds, "row_id", "key", buckets)
      IvmMaintenance.rebuildTouchedBuckets(
        spark, bTable, bOld, bIns, bDelIds, "row_id", "key", buckets)
    } finally changes.unpersist()
  }

  /** The loud row-id contract (class doc), via [[IvmMaintenance]] piece 3:
    * duplicate insert row_ids, or an insert reusing a row_id still live
    * anywhere in the pre-batch base (full-base probe — a cross-key reuse
    * lands in a different bucket and would escape a bucket-pruned check).
    */
  private def assertRowIdContract(
      side: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame): Unit = {
    IvmMaintenance.assertUniqueInsertIds(s"IngestJoinView side '$side'", inserts, "row_id",
      "row_id must uniquely identify a base row; a colliding CDC feed would " +
        "silently mis-maintain the view (delta algebra counts each insert, the " +
        "bucket rebuild keeps one row per id)")
    IvmMaintenance.assertNoLiveIdReuse(s"IngestJoinView side '$side'", base, inserts,
      deleteIds, "row_id",
      "the base rebuild drops the old row while the view delta never subtracted it")
  }
}
