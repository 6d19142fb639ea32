package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighbor-graph applications over the IVF kNN machinery — the two
  * embedding-space curation steps a training-data pipeline runs right
  * after it has an index: propagate labels from a seed set to the
  * unlabeled bulk, and mine hard negatives for embedding-model training.
  * Both ride [[IVF.joinTopK]]'s both-sides-large shape: nothing is
  * broadcast but the centroid bank, candidates meet in a cell-keyed
  * shuffled join, and per-query top-k prunes map-side through Spark's
  * WindowGroupLimit.
  */
object NeighborOps {

  /** kNN LABEL PROPAGATION (auto-labeling): every `queries` row takes the
    * majority label among its `k` nearest `corpus` neighbors (cosine,
    * IVF-approximate); rows whose majority share falls below
    * `minAgreement` ABSTAIN (`label_pred` null) rather than guess — the
    * semi-supervised step that turns a small human-labeled seed set into
    * corpus-scale weak labels, with the abstentions left for the next
    * annotation round.
    *
    * Output: `(vec_id, label_pred, votes, n_neighbors, confidence)` —
    * `votes` is the winning label's neighbor count, `n_neighbors` the
    * neighbors actually found (< k at corpus edges / pruned cells),
    * `confidence = votes / n_neighbors` rounded to 4 dp. Ties break to
    * the LOWEST label (deterministic, oracle-replayable). A query with
    * no neighbors at all emits nothing — no neighbors is not evidence.
    *
    * Scale shape: [[IVF.joinTopK]] (two keyed exchanges, `maxCell` skew
    * cap available there) + one labels equijoin + one (query, label)
    * map-combined aggregate + a WindowGroupLimit majority rank. The
    * labeled seed set is NOT assumed small — it joins by key like
    * everything else (if it IS small, AQE broadcasts it on its own).
    */
  def labelPropagate(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      label: Column,
      k: Int,
      nProbe: Int,
      centroids: Array[Array[Float]],
      minAgreement: Double = 0.5,
      maxCell: Int = Int.MaxValue
  ): DataFrame = {
    require(minAgreement >= 0 && minAgreement <= 1,
      s"minAgreement must be in [0,1]: $minAgreement")
    val nn = IVF.joinTopK(corpus, queries, id, vec, k, nProbe, centroids, maxCell)
    val labels = corpus.select(id.as("n_id"), label.as("__n_label"))
    val votes = nn.join(labels, Seq("n_id"))
      .groupBy(col("q_id"), col("__n_label"))
      .agg(count(lit(1)).as("votes"))
    val wTot = Window.partitionBy(col("q_id"))
    val wMaj = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("__n_label").asc)
    votes
      .withColumn("n_neighbors", sum(col("votes")).over(wTot))
      .withColumn("__rn", row_number().over(wMaj))
      .where(col("__rn") === 1)
      .select(
        col("q_id").as("vec_id"),
        when(col("votes") >= col("n_neighbors") * minAgreement, col("__n_label"))
          .as("label_pred"),
        col("votes"),
        col("n_neighbors"),
        round(col("votes") / col("n_neighbors"), 4).as("confidence"))
  }

  /** HARD-NEGATIVE MINING: for every corpus row, its `k` nearest
    * neighbors carrying a DIFFERENT label — the pairs that sit close in
    * embedding space but must score apart, which is exactly the
    * contrastive-training signal an embedding model needs (in-batch
    * random negatives are too easy; these are the hard ones). Same-label
    * neighbors are excluded BEFORE the top-k rank, so each query gets k
    * genuine negatives, not k minus its same-label halo.
    *
    * Output: `(q_id, q_label, n_id, n_label, cosine, rank)`.
    *
    * Scale shape: [[IVF.joinTopK]]'s exact plan — cell-keyed shuffled
    * join (neither side broadcast), label filter on the joined row,
    * per-query WindowGroupLimit rank; `maxCell` drops degenerate cells
    * ([[IVF.oversizedCells]] reports what a cap excludes). Null-labeled
    * rows match nothing (null ≠ anything) and emit nothing as queries.
    */
  def hardNegatives(
      corpus: DataFrame,
      id: Column,
      vec: Column,
      label: Column,
      k: Int,
      nProbe: Int,
      centroids: Array[Array[Float]],
      maxCell: Int = Int.MaxValue
  ): DataFrame = {
    require(k > 0 && nProbe > 0, "k and nProbe must be positive")
    require(maxCell > 0, s"maxCell must be positive: $maxCell")
    val assignedAll = corpus.select(
      id.as("n_id"), vec.as("n_vec"), label.as("n_label"),
      IVF.literalCell(vec, centroids).as("cell"),
      VectorFunctions.norm2(vec).as("n_nrm"))
    val assigned =
      if (maxCell == Int.MaxValue) assignedAll
      else assignedAll
        .join(assignedAll.groupBy(col("cell")).agg(count(lit(1)).as("__n")), Seq("cell"))
        .where(col("__n") <= maxCell)
        .drop("__n")
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("cell").asc)
    val probes = corpus
      .select(id.as("q_id"), vec.as("q_vec"), label.as("q_label"),
        VectorFunctions.norm2(vec).as("q_nrm"),
        posexplode(graft.plans.CentroidBank.scoresColumn(vec, centroids))
          .as(Seq("cell", "score")))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_label"), col("q_nrm"), col("cell"))
    val nn = col("q_nrm") * col("n_nrm")
    // salted cell join — the [[IVF.joinTopK]] discipline: |centroids|
    // distinct keys cap the scoring stage's parallelism at the cell
    // count however wide the exchange is; a bounded deterministic salt
    // (corpus side hashed, probe side replicated ≤16×) spreads the
    // per-cell dot fan-out across the session's configured parallelism
    val saltS = math.max(1, math.min(16,
      math.ceil(corpus.sparkSession.sessionState.conf.numShufflePartitions.toDouble /
        math.max(1, centroids.length)).toInt))
    // REGIME-GATED repartition pin (the [[IVF.joinTopK]] note /
    // [[graft.Fanout]]): pinned only when the corpus scan collapsed
    // below the session target — in the broadcast regime at scale the
    // corpus never moves and the pin would shuffle every vector
    val salted = assigned
      .withColumn("__salt", pmod(xxhash64(col("n_id")), lit(saltS.toLong)).cast("int"))
    val scored = graft.Fanout
      .repartitionIfNarrow(salted, corpus, col("cell"), col("__salt"))
      .join(probes.withColumn("__salt",
        explode(lit((0 until saltS).toArray))), Seq("cell", "__salt"))
      .where(col("q_id") =!= col("n_id") && col("q_label") =!= col("n_label"))
      .select(
        col("q_id"), col("q_label"), col("n_id"), col("n_label"),
        round(when(nn > 0, VectorFunctions.dot(col("q_vec"), col("n_vec")) / nn)
          .otherwise(lit(0.0)), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
