package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 runs first (not timed): the first query in a
  * fresh JVM otherwise pays Catalyst/codegen/JIT startup (~8s) that says
  * nothing about operator cost. Timed runs then execute per query with a
  * noop-format write — unlike `count()`, which lets Catalyst prune
  * deterministic projections down to a bare scan, the noop sink evaluates
  * every output column, so projection-only queries (map, the text-analysis
  * family) are charged their real expression cost.
  *
  * Each query runs SPARK_GRAFT_REPS times (default 3) and the MEDIAN is
  * reported (minimum alongside, in `queries_min`): a single contended run
  * on a noisy machine otherwise distorts the record by an order of
  * magnitude without saying anything about the plans. Repetitions
  * interleave round-robin (all queries once, then all again) so a
  * transient load spike hits each query at most once, not all reps of one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def runFull(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: exercise codegen/JIT on the smallest SF; ignore result + errors
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try runFull(fn(spark, warmDir)) catch { case _: Throwable => () }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { runFull(fn(spark, sfDir)) } catch { case _: Throwable => () }
      timings(name) = timings(name) :+ (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map(n => n -> median(timings(n)))
    val mins = names.map(n => n -> timings(n).min)
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":${jsonMap(med)},"queries_min":${jsonMap(mins)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
