package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-gate timer: `SPARK_GRAFT_QUERY=q175_jaccard_join
  * SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileOne` — one warm-up
  * rep then three timed reps of the named gate against a noop sink, the
  * quick loop for checking one query's cost without a full Bench pass.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_QUERY"))
      .getOrElse(throw new IllegalArgumentException("pass a query name (arg or SPARK_GRAFT_QUERY)"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    val fn = graft.SparkEntry.queries(name)
    for (rep <- 0 to 3) {
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[$name rep$rep${if (rep == 0) " warmup" else ""}] $secs%.2f s")
    }
    spark.stop()
  }
}
