package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast of the (small)
  *    query set against the (huge) corpus — the corpus is never shuffled;
  *    each partition scores its rows against the broadcast queries and a
  *    per-query window keeps k. Correct baseline and the recall oracle.
  *  - [[lshTopK]]: sign-random-projection buckets (Charikar hyperplane LSH)
  *    computed per row map-side; queries probe only their own bucket —
  *    the 100 TB path where scoring every corpus row is off the table.
  *    Recall tunes with `nBits` (fewer bits → bigger buckets → higher
  *    recall, more compute).
  */
object KNN {

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * (it is broadcast). Ties break on neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int
  ): DataFrame = {
    // Norms staged below the join: once per vector, not per (query, row).
    val c = corpus.select(id.as("n_id"), vec.as("n_vec"), VectorFunctions.norm2(vec).as("n_nrm"))
    val q = queries.select(id.as("q_id"), vec.as("q_vec"), VectorFunctions.norm2(vec).as("q_nrm"))
    val nn = col("q_nrm") * col("n_nrm")
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(
        col("q_id"),
        col("n_id"),
        round(when(nn > 0, VectorFunctions.dot(col("q_vec"), col("n_vec")) / nn).otherwise(lit(0.0)), 4)
          .as("cosine")
      )
    perQueryTopK(scored, k)
  }

  /** Per-query top-k cut shared by the exact/quantized/ADC searches: the
    * BOUNDED aggregate ([[graft.operators.TopK]], O(k) state, map-side
    * partials) in place of `row_number().over(partitionBy(q_id))`, whose
    * per-task sort materializes every (query, corpus-row) score — at
    * corpus scale the scored relation is the corpus × Q, and the window
    * shuffles ALL of it while the aggregate ships ≤ k per query per
    * mapper. Ordering identical: (cosine desc, n_id asc).
    */
  private[similarity] def perQueryTopK(scored: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.topKByGroup(scored, Seq(col("q_id")),
        struct(col("cosine"), (-col("n_id")).as("__nid"), col("n_id")), k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))

  /** Bucketed ANN: corpus and queries are both hashed to sign-projection
    * buckets; scoring happens only within a bucket. Returns the same schema
    * as [[bruteForceTopK]] (rank within bucket).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      nBits: Int,
      dim: Int
  ): DataFrame = {
    val bucketOf = (v: Column) => VectorFunctions.signRandomProjection(v, nBits, dim)
    val c = corpus.select(id.as("n_id"), vec.as("n_vec"), bucketOf(vec).as("bucket"),
      VectorFunctions.norm2(vec).as("n_nrm"))
    val q = queries.select(id.as("q_id"), vec.as("q_vec"), bucketOf(vec).as("bucket"),
      VectorFunctions.norm2(vec).as("q_nrm"))
    val nn = col("q_nrm") * col("n_nrm")
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .select(
        col("q_id"),
        col("n_id"),
        round(when(nn > 0, VectorFunctions.dot(col("q_vec"), col("n_vec")) / nn).otherwise(lit(0.0)), 4)
          .as("cosine")
      )
    perQueryTopK(scored, k)
  }

  /** Top-k search over int8-QUANTIZED embeddings — the serving path after
    * [[graft.functions.VectorFunctions.quantizeInt8]] shrinks the corpus
    * 4×: vectors are ranked by the cosine of their dequantized forms,
    * which the per-vector scales cancel out of entirely, leaving a pure
    * function of the integer code vectors: `q_a·q_b / (‖q_a‖·‖q_b‖)`.
    * The dot products are exact integer arithmetic (|code| ≤ 127, so a
    * 64-dim dot is ≤ 2^20 — no overflow anywhere near 2^63), making the
    * score reproducible cross-engine to the last bit before the one
    * rounded division.
    *
    * Same scale shape as [[bruteForceTopK]]: the small query set is
    * broadcast, the corpus is never shuffled, codes and norms are staged
    * once per vector below the join. At 100 TB the win is the 4× smaller
    * scan plus integer SIMD in the inner loop.
    */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int
  ): DataFrame = {
    val codeNorm = (c: Column) =>
      sqrt(aggregate(c, lit(0L), (acc, x) => acc + x * x).cast("double"))
    // scale staged per row before the code transform (see quantizeInt8Scaled)
    val codes = (df: DataFrame, idName: String) =>
      df.select(id.as(idName), vec.as("__v"))
        .withColumn("__s", VectorFunctions.int8Scale(col("__v")))
        .select(col(idName),
          VectorFunctions.quantizeInt8Scaled(col("__v"), col("__s")).as(s"${idName.take(1)}_q"))
    val c = codes(corpus, "n_id").withColumn("n_nrm", codeNorm(col("n_q")))
    val q = codes(queries, "q_id").withColumn("q_nrm", codeNorm(col("q_q")))
    val qdot = aggregate(zip_with(col("q_q"), col("n_q"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val nn = col("q_nrm") * col("n_nrm")
    val scored = c
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(
        col("q_id"),
        col("n_id"),
        round(when(nn > 0, qdot.cast("double") / nn).otherwise(lit(0.0)), 4)
          .as("cosine"))
    perQueryTopK(scored, k)
  }

  /** Recall@k of an approximate result set against exact truth — the
    * "measure, don't guess" loop for tuning nBits/nProbe: both inputs in
    * the (q_id, n_id) top-k schema of [[bruteForceTopK]]. Output: one row
    * per query with hit and truth counts plus the recall fraction, and the
    * macro average under q_id = -1 (so one call grades an index end to
    * end). Implementation is two tiny aggregates over the top-k outputs —
    * never touches the corpus.
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): DataFrame = {
    // distinct() both sides: a duplicate (q_id, n_id) in either input
    // would multiply rows through the join and corrupt both counts
    val t = truth.select(col("q_id"), col("n_id")).distinct()
    val a = approx.select(col("q_id"), col("n_id")).distinct()
    val perQuery = t
      .join(a.withColumn("__hit", lit(1)), Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .select(
        col("q_id"), col("n_truth"), col("n_hit"),
        round(col("n_hit") / col("n_truth"), 4).as("recall"))
    val macroAvg = perQuery.agg(
      lit(-1L).as("q_id"),
      sum(col("n_truth")).as("n_truth"),
      sum(col("n_hit")).as("n_hit"),
      round(avg(col("recall")), 4).as("recall"))
    perQuery.unionByName(macroAvg)
  }
}
