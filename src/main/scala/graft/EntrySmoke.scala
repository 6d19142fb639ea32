package graft

/** Smoke-check main for the driver's `SparkEntry.entry` contract: builds a
  * local session, runs the flagship query, prints `ENTRY_ROWS=<n>`.
  * (`sbt console` cannot reliably evaluate piped scripts in batch mode, so
  * the verify skill drives this instead.)
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}
