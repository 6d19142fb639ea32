package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q149 cdfBlend stages. */
object ProfileQ149 {
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
    import graft.curation.Quantiles
    import graft.functions.TextFunctions

    val docs = graft.sources.Tables.documents(spark, d)
    docs.write.format("noop").mode("overwrite").save() // warm
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (rep <- 1 to 2) {
      time(s"[$rep] exactQuantiles n_chars 255qs") {
        Quantiles.exactQuantiles(docs, lit(0), col("n_chars"),
          (1 until 256).map(_.toDouble / 256)).collect()
      }
      time(s"[$rep] exactQuantiles wsTok 255qs") {
        Quantiles.exactQuantiles(docs, lit(0), TextFunctions.wsTokenCount(col("text")),
          (1 until 256).map(_.toDouble / 256)).collect()
      }
      time(s"[$rep] full cdfBlend build+run") {
        Quantiles.cdfBlend(docs, col("doc_id"),
          Seq(col("n_chars") -> 0.75, TextFunctions.wsTokenCount(col("text")) -> 0.25),
          bins = 256)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"[$rep] cdfBlend n_chars only") {
        Quantiles.cdfBlend(docs, col("doc_id"),
          Seq(col("n_chars") -> 1.0), bins = 256)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"[$rep] cdfBlend wsTok PRE-projected") {
        val pre = docs.select(col("doc_id"),
          TextFunctions.wsTokenCount(col("text")).as("wst"))
        Quantiles.cdfBlend(pre, col("doc_id"), Seq(col("wst") -> 1.0), bins = 256)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
