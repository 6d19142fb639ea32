package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures [[graft.operators.Joins.bloomPrunedJoin]] against the plain
  * shuffle join in its target regime: the selective side too large to
  * broadcast as data (2M rows with payloads ≈ 10^2 MB) but whose key
  * filter is ~3 MB, the large side 50M rows of which ~4% match. The plain
  * join shuffles all 50M rows; the pruned join shuffles matches + 1% fpp.
  */
object ProfileBloomJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val keys = 10000000L
    val large = spark.range(n).select(
      (col("id") % keys).as("k"),
      (col("id") * 2654435761L % 1000003L).as("payload"))
      .localCheckpoint()
    // selective side: 2M of the 10M keys, wide-ish payload (no broadcast)
    val small = spark.range(2000000).select(
      (col("id") * 5).as("k"),
      concat(lit("dim-"), col("id"), lit("-"), md5(col("id").cast("string"))).as("label"))
      .localCheckpoint()

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; val s = (System.nanoTime() - t0) / 1e9
        (s, c)
      }
      println(f"[bloomjoin-bench] $tag: min ${ts.map(_._1).min}%.2f s (rows ${ts.head._2})")
    }
    time(s"plain shuffle join ($n x 2M)") {
      large.join(small, Seq("k")).count()
    }
    time("bloomPrunedJoin (in-scan key filter first)") {
      graft.operators.Joins.bloomPrunedJoin(large, small, "k", expectedKeys = 2000000L)
        .count()
    }
    spark.stop()
  }
}
