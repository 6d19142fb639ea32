package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * These are thin `spark.read.parquet` wrappers — predicate pushdown and
  * column pruning happen in Catalyst, so callers should select/filter on the
  * returned DataFrame and let the optimizer reach the scan. The only
  * normalization done here is the `events.ts` nanosecond fix-up.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects ([PARQUET_TYPE_ILLEGAL]). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as `LongType`
    * nanoseconds; we truncate to microseconds (the data carries no
    * sub-microsecond component, verified: epoch_ns % 1000 == 0 for all rows)
    * and expose a proper `TimestampType` column for event-time windowing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // `nanosAsLong` is normally set once by GraftSession.tune; heal a bare
    // session ONCE rather than mutating conf on every call (the
    // every-call set was racy in shared sessions) or refusing to run
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
