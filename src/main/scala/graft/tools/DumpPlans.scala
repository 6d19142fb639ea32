package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-dump helper for the round evidence files:
  * `runMain graft.tools.DumpPlans <outDir> <suffix> <q1,q2,...>` writes
  * `<outDir>/<query>_<suffix>.txt` with `.explain("formatted")` output
  * for each named gate (same session shape as Bench: local[32],
  * shuffle.partitions=32, GraftSession.tune), so before/after plan
  * claims in OPTIMIZATION_r*.md can be checked without running Spark.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpPlans <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qlist) = args
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- qlist.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = graft.SparkEntry.queries(name)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
