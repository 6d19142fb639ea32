package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures [[graft.operators.TopK.topKByGroup]] (bounded ObjectHash
  * aggregate) against the `row_number().over(window) <= k` idiom it
  * replaces, on a skewed synthetic relation (one hot group holding half
  * the rows — the shape that makes the window's per-task full-group sort
  * hurt). Prints min-of-3 for both.
  */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    // row count as an optional arg: the round-13 verdict watch item asks
    // for periodic re-measurement at LARGER scales before deciding on a
    // two-level (primitive sort key) ordering variant
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    // half the rows land in group 0 (hot key), the rest spread over 10k
    // checkpoint the input only while it fits executor storage; above
    // that, regenerate per rep — `range` is codegen'd and identical in
    // both arms, so the comparison stays fair
    val gen = spark.range(n).select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(10000L))).as("g"),
      (col("id") * 2654435761L % 1000003L).cast("double").as("score"),
      col("id"))
    val df = if (n <= 20000000L) gen.localCheckpoint() else gen
    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; val s = (System.nanoTime() - t0) / 1e9
        (s, c)
      }
      println(f"[topk-bench] $tag: min ${ts.map(_._1).min}%.2f s (rows ${ts.head._2})")
    }
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    time("window row_number <= 3") {
      df.withColumn("rank", row_number().over(w)).where(col("rank") <= 3).count()
    }
    time("TopKStructs aggregate k=3") {
      graft.operators.TopK.topKByGroup(df, Seq(col("g")),
        struct(col("score"), (-col("id")).as("nid"), col("id")), k = 3).count()
    }
    spark.stop()
  }
}
