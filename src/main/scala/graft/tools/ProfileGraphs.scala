package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the graph gates (q154/q155/q161). */
object ProfileGraphs {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    graft.sources.Tables.lineitem(spark, d).write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      for (name <- Seq("q154_pagerank", "q160_trustrank", "q155_triangles", "q161_edge_jaccard")) {
        time(s"[$rep] $name") {
          graft.SparkEntry.queries(name)(spark, d)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
