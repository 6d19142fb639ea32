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
      val lastRow = view.agg(max(col("__batch"))).head()
      val lastApplied = if (lastRow.isNullAt(0)) -1L else lastRow.getLong(0)
      if (batchId > lastApplied) {
        assertUniqueRowIds("a", "ka", aOld, aIns, aDel)
        assertUniqueRowIds("b", "ka", bOld, bIns, bDel)
        assertUniqueRowIds("c", "kb", cOld, cIns, cDel)
        val merged = Storage.mergeJoinView3Delta(
            view.where(col("n").isNotNull).drop("__batch"),
            aOld.select(col("ka"), col("grp")),
            bOld.select(col("ka"), col("kb")),
            cOld.select(col("kb"), col("value")),
            aDelta, bDelta, cDelta)
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

      rebuildBuckets(spark, aTable, "ka", aOld, aIns, aDel, Seq("ka", "grp"))
      rebuildBuckets(spark, bTable, "ka", bOld, bIns, bDel, Seq("ka", "kb"))
      rebuildBuckets(spark, cTable, "kb", cOld, cIns, cDel, Seq("kb", "value"))
    } finally changes.unpersist()
  }

  /** The [[IngestJoinView]] loud row-id contract, keyed per side. */
  private def assertUniqueRowIds(
      sideName: String,
      key: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame): Unit = {
    val dupRow = inserts.groupBy(col("row_id")).count()
      .agg(count(when(col("count") > 1, 1)).as("dups")).head()
    if (dupRow.getLong(0) > 0) throw new IllegalStateException(
      s"IngestJoinView3: side '$sideName' batch carries ${dupRow.getLong(0)} duplicate " +
        "insert row_id(s) — the delta algebra counts each insert while the bucket " +
        "rebuild keeps one row per id")
    val insBkts = inserts.select(pmod(hash(col(key)), lit(buckets)).as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (insBkts.nonEmpty) {
      val preexisting = base.where(col("bkt").isin(insBkts: _*))
        .join(inserts.select(col("row_id")), Seq("row_id"), "left_semi")
        .join(deleteIds, Seq("row_id"), "left_anti")
        .count()
      if (preexisting > 0) throw new IllegalStateException(
        s"IngestJoinView3: side '$sideName' batch inserts $preexisting row_id(s) " +
          "already present in the pre-batch base without a same-batch delete — send " +
          "delete+insert for updates")
    }
  }

  /** The [[IngestJoinView]] touched-bucket rebuild, keyed per side. */
  private def rebuildBuckets(
      spark: SparkSession,
      table: String,
      key: String,
      base: DataFrame,
      inserts: DataFrame,
      deleteIds: DataFrame,
      carried: Seq[String]): Unit = {
    val changedKeys = inserts.select(col(key))
      .unionByName(base.join(deleteIds, Seq("row_id"), "left_semi").select(col(key)))
    val touched = changedKeys.select(pmod(hash(col(key)), lit(buckets)).as("bkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val cols = col("row_id") +: carried.map(col) :+ col("bkt")
    val withBkt = inserts.withColumn("bkt", pmod(hash(col(key)), lit(buckets)))
    // insertInto is POSITIONAL; pin staging back to the table's read order
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
