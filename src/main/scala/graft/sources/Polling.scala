package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC-by-polling source harness — the reference's Aerospike polling source
  * shape (aerospike/aerospike.go:100-126: every PollingInterval, query
  * records with last-update newer than the previous sweep; one-shot full
  * scan when no interval). Spark-native form: the caller drives `poll()`
  * on whatever cadence (a scheduler tick, a `foreachBatch` epoch, a cron'd
  * batch job); each call plans an incremental DataFrame — rows whose
  * `tsCol` is strictly newer than the previous poll's high-water mark —
  * against a FRESH load, so new files/partitions landed since the last
  * sweep are visible.
  *
  * Same delivery contract as the reference: a row that lands with a
  * timestamp at or below an already-observed high-water mark is never
  * seen (polling is not a log); use a monotonic ingest timestamp column.
  * The watermark advance is driven by the data itself (max over the new
  * batch), computed as one aggregate on the pruned increment.
  */
class PollingSource(load: () => DataFrame, tsCol: String) {

  private var highWater: Option[java.sql.Timestamp] = None

  /** The current high-water mark (None before the first poll). */
  def mark: Option[java.sql.Timestamp] = highWater

  /** Plan + materialize the next increment: rows with `tsCol` strictly
    * above the high-water mark (everything, on the first poll). Advances
    * the mark to the increment's max timestamp. The returned DataFrame is
    * localCheckpoint'ed so callers can reuse it without racing later
    * arrivals.
    */
  def poll(): DataFrame = {
    val df = load()
    val increment = highWater match {
      case Some(t) => df.where(col(tsCol) > lit(t))
      case None => df
    }
    val snap = increment.localCheckpoint()
    val newMax = snap.agg(max(col(tsCol))).head().getTimestamp(0)
    if (newMax != null) highWater = Some(newMax)
    snap
  }
}

object Polling {
  /** Polling source over a parquet landing path (the common deploy shape:
    * an upstream system appends files; each sweep reads only newer rows).
    */
  def parquet(spark: org.apache.spark.sql.SparkSession, path: String, tsCol: String): PollingSource =
    new PollingSource(() => spark.read.parquet(path), tsCol)

  def apply(load: () => DataFrame, tsCol: String): PollingSource = new PollingSource(load, tsCol)
}
