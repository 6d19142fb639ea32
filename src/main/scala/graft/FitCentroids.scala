package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: fit the pretrained IVF centroids (k=8, seed=42, sf0.01
  * embeddings), quantized to exact 1024ths for cross-engine reproduction.
  */
object FitCentroids {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(8).setSeed(42L).setMaxIter(20).fit(emb)
    val rows = model.clusterCenters.map { c =>
      c.toArray.map(v => math.round(v * 1024).toInt).mkString("    Array(", ", ", "),")
    }
    println("CENTROID_NUMERATORS_BEGIN")
    rows.foreach(println)
    println("CENTROID_NUMERATORS_END")
    spark.stop()
  }
}
