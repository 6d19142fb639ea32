package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q91 SemDeDup stages (round-10 regression
  * hunt): times the assignment materialize, the pair join, and the full
  * pipeline separately so the regression can be attributed to a stage.
  */
object ProfileQ91 {
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
    import graft.similarity.IVF

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup
    emb.write.format("noop").mode("overwrite").save()
    import graft.dedup.Dedup
    for (rep <- 1 to 3) {
      time(s"[$rep] assignment-project-only") {
        emb.select(
          col("vec_id"),
          IVF.literalCell(col("embedding"), IVF.pretrainedCentroids).as("cell"),
          round(IVF.literalCellCosine(col("embedding"), IVF.pretrainedCentroids), 4).as("cos"))
          .write.format("noop").mode("overwrite").save()
      }
      var assigned: org.apache.spark.sql.DataFrame = null
      time(s"[$rep] materialize-assigned(call)") {
        assigned = graft.Materialize(emb.select(
          col("vec_id").as("vec_id"), col("embedding").as("v"),
          IVF.literalCell(col("embedding"), IVF.pretrainedCentroids).as("cell"),
          round(IVF.literalCellCosine(col("embedding"), IVF.pretrainedCentroids), 4).as("cos_centroid")))
      }
      val pairs = Dedup.embeddingNearDups(
        assigned, col("vec_id"), col("v"), col("cell"), 0.35)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      time(s"[$rep] pairs-from-materialized") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      var clusters: org.apache.spark.sql.DataFrame = null
      time(s"[$rep] cc-clusters(call)") {
        clusters = Dedup.nearDupClusters(assigned, col("vec_id"), pairs)
      }
      time(s"[$rep] cc-clusters(noop-write)") {
        clusters.write.format("noop").mode("overwrite").save()
      }
      time(s"[$rep] full q91") {
        graft.SparkEntry.queries("q91_semantic_dedup")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
