package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-layout helpers — the parts of the 100 TB design that live in
  * how data is WRITTEN rather than how a query is planned.
  */
object Storage {

  /** Write a bucketed + in-bucket-sorted managed parquet table. Two tables
    * bucketed by the same key into the same bucket count join/aggregate on
    * that key with NO shuffle Exchange (and no sort, thanks to `sortBy`) —
    * the pre-shuffle is paid once at write time instead of on every query.
    * This is the standing answer for fact tables that are repeatedly
    * joined on one key (orders ⋈ lineitem on orderkey, documents ⋈
    * signatures on doc_id): at 100 TB the avoided exchange IS the query
    * cost. Verified by ScaleTechniquesSpec (the executed plan literally
    * contains no Exchange).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Per-file row-count profile of a table — the "do I need to compact"
    * readout, computed DISTRIBUTED via `input_file_name()` (one
    * map-combined aggregation whose exchange carries distinct file
    * names, never a driver-side listing): `(n_files, min_rows,
    * avg_rows, max_rows, n_rows)`. A million 600-row files after a
    * high-parallelism streaming ingest is the classic silent 100 TB
    * tax — every scan pays open/footer costs per file and the driver
    * pays the listing; this is the monitor that catches it.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    spark.table(table)
      .groupBy(input_file_name().as("file")).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_files"),
        min(col("n")).as("min_rows"),
        round(avg(col("n")), 1).as("avg_rows"),
        max(col("n")).as("max_rows"),
        sum(col("n")).as("n_rows"))
  }

  /** Rewrite a managed parquet table into `ceil(rows / targetRowsPerFile)`
    * files — small-files compaction, the maintenance sibling of
    * [[fileStats]]. Round-robin repartition (no key: compaction must not
    * skew on data) through a staging hop (Spark cannot overwrite a table
    * it is reading; same discipline as the CDC loop). The repartition IS
    * a full shuffle of the table — that is the price of compaction on
    * any engine, paid once to stop paying per-file costs on every scan.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      targetRowsPerFile: Long
  ): Unit = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive: $targetRowsPerFile")
    spark.sql(s"REFRESH TABLE $table") // tolerate a prior rewrite in another session
    val n = spark.table(table).count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val staging = s"${table}__compact"
    spark.table(table).repartition(files)
      .write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.table(staging)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.sql(s"REFRESH TABLE $table")
    spark.sql(s"DROP TABLE IF EXISTS $staging")
  }

  /** Apply a CDC change batch to a snapshot — the merge/upsert step that
    * maintains a table from a change stream (the batch half of the
    * [[Polling]] CDC source's contract) without a transactional table
    * format: latest-wins per key by `(version, change-precedence)`,
    * deletes drop the key.
    *
    * Contract: `snapshot` and `changes` share the payload schema;
    * `changes` adds an `op` column (`"upsert"` | `"delete"`); `version`
    * names a monotone column present in both (ingest timestamp or LSN).
    * On a (key, version) TIE between a snapshot row and a change row,
    * the CHANGE wins (re-applying a batch converges — idempotent
    * replay); ties between two change rows are a malformed feed and
    * break deterministically by op precedence (delete > upsert).
    *
    * Scale shape: union → one hash exchange on the key → rank-1 filter,
    * which Catalyst rewrites to WindowGroupLimit, so map tasks pre-prune
    * to one candidate row per key before the shuffle. Snapshot-over-
    * snapshot like [[graft.dedup.Dedup.dropSeen]]: the output IS the new
    * snapshot — write it bucketed by the key and the next apply's
    * exchange disappears too.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      key: Column,
      version: Column
  ): DataFrame = {
    val snap = snapshot
      .withColumn("__op", lit("upsert"))
      .withColumn("__pri", lit(0))
    val chg = changes
      .withColumn("__op", col("op"))
      .withColumn("__pri", when(col("op") === "delete", 2).otherwise(1))
      .drop("op")
    val w = Window.partitionBy(key)
      .orderBy(version.desc, col("__pri").desc)
    snap.unionByName(chg)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("__op") =!= "delete")
      .drop("__rn", "__op", "__pri")
  }
}
