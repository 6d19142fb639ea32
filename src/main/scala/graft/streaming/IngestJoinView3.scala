package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a THREE-WAY join view — the
  * streaming face of [[graft.sources.Storage.mergeJoinView3Delta]], run as
  * a `foreachBatch` body: each micro-batch carries row-level changes to
  * ALL THREE base tables (`side` ∈ a|b|c, `row_id`, the side's key/payload
  * columns, `op` ∈ insert|delete) and updates
  *
  *  1. the view (`grp`, n, total) by the COMPOSED signed delta algebra —
  *     Δ(A⋈B⋈C) in seven delta-restricted terms, the pre-batch bases
  *     touched only through delta-keyed (or delta-semi-pruned) joins,
  *     never re-joined; deleted rows recovered from the bases by `row_id`;
  *  2. all three BASE row stores, hash-bucket partitioned on their join
  *     keys (a, b on `ka`; c on `kb`), touched buckets only — the
  *     [[IngestAggView]] rebuild machinery (idempotent, dynamic-overwrite
  *     through a staging hop, emptied buckets dropped).
  *
  * Replay safety (view `__batch` + drained-view sentinel `n IS NULL`) and
  * the per-side loud row-id contract follow [[IngestJoinView]] verbatim.
  *
  * Bootstrap all four tables before the stream starts: bases partitioned
  * by `bkt = pmod(hash(<side key>), buckets)`, the view with
  * `__batch = -1`. Side schemas: a(row_id, ka, grp), b(row_id, ka, kb),
  * c(row_id, kb, value).
  */
final class IngestJoinView3(
    aTable: String,
    bTable: String,
    cTable: String,
    viewTable: String,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(Seq(aTable, bTable, cTable, viewTable).forall(spark.catalog.tableExists),
      s"IngestJoinView3: '$aTable', '$bTable', '$cTable', '$viewTable' must be initialized first")

    val changes = batch.persist()
    try {
      Seq(aTable, bTable, cTable).foreach(t => spark.sql(s"REFRESH TABLE $t"))
      val aOld = spark.table(aTable)
      val bOld = spark.table(bTable)
      val cOld = spark.table(cTable)

      def side(s: String, op: String, cols: Seq[String]): DataFrame =
        changes.where(col("side") === s && col("op") === op).select(cols.map(col): _*)
      val aIns = side("a", "insert", Seq("row_id", "ka", "grp"))
      val aDel = side("a", "delete", Seq("row_id"))
      val bIns = side("b", "insert", Seq("row_id", "ka", "kb"))
      val bDel = side("b", "delete", Seq("row_id"))
      val cIns = side("c", "insert", Seq("row_id", "kb", "value"))
      val cDel = side("c", "delete", Seq("row_id"))

      val aDelta = aIns.select(col("ka"), col("grp"), lit(1).as("sign"))
        .unionByName(aOld.join(aDel, Seq("row_id"), "left_semi")
          .select(col("ka"), col("grp"), lit(-1).as("sign")))
      val bDelta = bIns.select(col("ka"), col("kb"), lit(1).as("sign"))
        .unionByName(bOld.join(bDel, Seq("row_id"), "left_semi")
          .select(col("ka"), col("kb"), lit(-1).as("sign")))
      val cDelta = cIns.select(col("kb"), col("value"), lit(1).as("sign"))
        .unionByName(cOld.join(cDel, Seq("row_id"), "left_semi")
          .select(col("kb"), col("value"), lit(-1).as("sign")))

      spark.sql(s"REFRESH TABLE $viewTable")
      val view = spark.table(viewTable)
      if (batchId > IvmMaintenance.lastApplied(view)) {
        // full-base id probes ([[IvmMaintenance]] piece 3): a cross-key
        // reuse of a live row_id lands in a different bucket and would
        // escape a bucket-pruned check
        Seq(("a", aOld, aIns, aDel), ("b", bOld, bIns, bDel), ("c", cOld, cIns, cDel))
          .foreach { case (s, base, ins, del) =>
            IvmMaintenance.assertUniqueInsertIds(s"IngestJoinView3 side '$s'", ins, "row_id",
              "the delta algebra counts each insert while the bucket rebuild keeps " +
                "one row per id")
            IvmMaintenance.assertNoLiveIdReuse(s"IngestJoinView3 side '$s'", base, ins,
              del, "row_id",
              "the base rebuild drops the old row while the view delta never subtracted it")
          }
        val merged = Storage.mergeJoinView3Delta(
            view.where(col("n").isNotNull).drop("__batch"),
            aOld.select(col("ka"), col("grp")),
            bOld.select(col("ka"), col("kb")),
            cOld.select(col("kb"), col("value")),
            aDelta, bDelta, cDelta)
          .withColumn("__batch", lit(batchId))
        IvmMaintenance.swapViewWithSentinel(spark, viewTable, merged, batchId)
      }

      IvmMaintenance.rebuildTouchedBuckets(
        spark, aTable, aOld, aIns, aDel, "row_id", "ka", buckets)
      IvmMaintenance.rebuildTouchedBuckets(
        spark, bTable, bOld, bIns, bDel, "row_id", "ka", buckets)
      IvmMaintenance.rebuildTouchedBuckets(
        spark, cTable, cOld, cIns, cDel, "row_id", "kb", buckets)
    } finally changes.unpersist()
  }
}
