package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc multi-gate timer: `SPARK_GRAFT_QUERIES=q161_edge_jaccard,q198_ktruss
  * runMain graft.tools.ProfileSet` — for each named gate one warm-up rep
  * then three timed reps against a noop sink, all in ONE session (the
  * Bench methodology), so a set of queries can be A/B-compared across
  * code versions without a full 199-query pass.
  */
object ProfileSet {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = (if (args.nonEmpty) args.mkString(",") else sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      throw new IllegalArgumentException("pass query names (args or SPARK_GRAFT_QUERIES)")))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"profileset:$name")
      val times = (0 to 3).map { rep =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      out(name) = times.drop(1)
      println(f"[$name] warm=${times.head}%.3f reps=${times.drop(1).map(t => f"$t%.3f").mkString(",")} min=${times.drop(1).min}%.3f med=${times.drop(1).sorted.apply(1)}%.3f")
    }
    println("PROFILESET " + out.map { case (n, ts) =>
      f""""$n":${ts.sorted.apply(1)}%.4f""" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
