package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MLVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: partition the corpus into k-means cells, search
  * only the `nProbe` cells nearest to each query — the centroid-bucketed
  * alternative to [[KNN.lshTopK]]'s hyperplane buckets, and the standard
  * scale path when embeddings are clustered (FAISS IVF-Flat structure;
  * Jégou et al., "Product quantization for nearest neighbor search",
  * TPAMI'11, the IVF part).
  *
  * Scale shape: training samples the corpus (k-means on a bounded sample),
  * cell assignment is a map-side transform, the probe join is an equijoin
  * on cell id — the corpus is never broadcast or globally shuffled beyond
  * its one partition-by-cell exchange, and per-query work is
  * |corpus| × nProbe / nCells.
  */
object IVF {

  /** Fitted index: the corpus with a `cell` column, plus the centroids. */
  final case class Index(assigned: DataFrame, centroids: Array[MLVector])

  /** Fit k-means cells over the corpus embedding column and assign each
    * row to its cell. Deterministic for a fixed seed.
    */
  def fit(corpus: DataFrame, id: Column, vec: Column, nCells: Int, seed: Long = 42L): Index = {
    val withVec = corpus.select(id.as("n_id"), vec.as("n_vec"))
      .withColumn("features", array_to_vector(col("n_vec").cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20).fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("n_id"), col("n_vec"), col("prediction").as("cell"))
    Index(assigned, model.clusterCenters)
  }

  /** Top-k cosine neighbors per query, probing the `nProbe` cells whose
    * centroids are cosine-nearest to the query. Queries must be small
    * (broadcast). Output schema matches [[KNN.bruteForceTopK]].
    */
  def topK(
      index: Index,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
    val centDf = cents.toSeq.toDF("cell", "centroid")
    val q = queries.select(id.as("q_id"), vec.as("q_vec"))
    // probe list: nProbe nearest centroids per query (tiny cross join:
    // |queries| × nCells rows)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(VectorFunctions.cosine(col("q_vec"), col("centroid")).desc, col("cell"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    // search only the probed cells: equijoin on cell id
    val scored = index.assigned
      .join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .select(
        col("q_id"), col("n_id"),
        VectorFunctions.cosineRounded(col("q_vec"), col("n_vec")).as("cosine")
      )
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
