package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the Lloyd ASSIGN kernel swap (round-11): times one
  * assignment map over a replicated embedding corpus — per-centroid
  * `aggregate(zip_with(...))` interpreted lambdas vs the broadcast
  * [[graft.plans.SqDistsB]] codegen bank — so the swap's payoff is
  * measured at a row count where kernel cost dominates job overhead
  * (the q158 gate at sf0.1 is only 2 000 rows × 3 iterations, mostly
  * scheduling).
  */
object ProfileClusterKernel {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "100").toInt
    val k = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val big = emb.crossJoin(broadcast(
        spark.range(copies).select(col("id").as("copy"))))
      .select((col("vec_id") * copies + col("copy")).as("id"), col("v"))
    big.persist().count()
    val n = big.count()
    val centroids: Array[Array[Double]] =
      emb.orderBy("vec_id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows, k=$k)")
    }
    def argmin(dArr: org.apache.spark.sql.Column) =
      big.select(col("id"),
        (array_position(dArr, array_min(dArr)) - 1).cast("int").as("cluster"),
        array_min(dArr).as("dist"))
        .write.format("noop").mode("overwrite").save()

    // warmup both forms (codegen + JIT)
    argmin(graft.similarity.Clustering.declarativeSqDists(col("v"), centroids, 6))
    argmin(graft.plans.DistBank.distsColumn(col("v"), centroids, 6))
    for (rep <- 1 to 3) {
      time(s"assign/declarative zip_with lambdas rep$rep") {
        argmin(graft.similarity.Clustering.declarativeSqDists(col("v"), centroids, 6))
      }
      time(s"assign/SqDistsB codegen bank        rep$rep") {
        argmin(graft.plans.DistBank.distsColumn(col("v"), centroids, 6))
      }
    }
    spark.stop()
  }
}
