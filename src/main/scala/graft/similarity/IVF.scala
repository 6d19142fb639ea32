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

  /** Persist a fitted index: the centroids as one tiny parquet and the
    * assigned corpus PARTITIONED BY CELL — the production layout for IVF
    * at 100 TB. Serving jobs [[load]] it instead of refitting, and
    * because `cell` is the storage partition column and the probe join
    * broadcasts the probe list, dynamic partition pruning reads ONLY the
    * probed cells' files from storage: per-query IO is
    * |corpus| × nProbe / nCells at the SCAN, not just at the join.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // repartition by cell BEFORE the partitioned write: without it every
    // upstream task writes one file per cell it touches — P tasks × k
    // cells small files at scale, defeating the pruned-scan layout. One
    // shuffle at index-build time bounds it at ~one file per cell.
    index.assigned.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/assigned")
  }

  /** Incrementally add vectors to a [[save]]d index WITHOUT refitting —
    * the ANN mirror of the MinHash band-index append
    * ([[graft.dedup.Dedup.saveBandIndex]]): a daily embedding batch lands
    * in the existing cell-partitioned layout and is immediately
    * searchable by [[load]] + [[topK]].
    *
    * Assignment reproduces [[fit]]'s KMeans rule as pure row arithmetic
    * against the SAVED centroids — `argmin ‖v − c‖²` computed as
    * `argmax (dot(v, c) − ‖c‖²/2)` (the `‖v‖²` term is constant per row),
    * in DOUBLE precision end to end (declarative [[VectorFunctions
    * .dotFold]] over the double centroids — the float-only fused kernel
    * is not used here), so no model object is needed and appended rows
    * land in the cells a refit-free `model.transform` would choose, up to
    * last-ulp summation-order ties. First-max on ties = lowest cell,
    * matching KMeans' first-min.
    *
    * Same small-files discipline as [[save]]: one repartition by cell
    * before the partitioned append bounds output at ~one file per cell
    * per batch. Centroids drift as the corpus grows — [[cellProfile]]
    * is the monitor, a periodic offline [[fit]] the refresh; between
    * refreshes appends stay consistent because assignment and probe
    * selection both use the saved centroids.
    */
  def append(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      vectors: DataFrame,
      id: Column,
      vec: Column
  ): Unit = {
    val cents: Array[Array[Double]] = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    // dotFold, not the fused graft_dot kernel: the kernel is float-only,
    // and float-cast centroids could flip near-tie assignments away from
    // the KMeans double-precision argmin (FuseDotProduct leaves double
    // arrays unfused, so this stays the declarative double path).
    // Literal shipping is DELIBERATE here, unlike the query path's
    // broadcast CellScoresB bank: this is a per-append maintenance job
    // (one plan, k×dim doubles once), not a predicate re-serialized into
    // every task of every query stage.
    val scores = array(cents.toIndexedSeq.map { c =>
      VectorFunctions.dotFold(vec.cast("array<double>"), lit(c)) -
        lit(c.map(x => x * x).sum / 2.0)
    }: _*)
    val cell = (array_position(scores, array_max(scores)) - 1).cast("int")
    vectors
      .select(id.as("n_id"), vec.as("n_vec"), cell.as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/assigned")
  }

  /** Load a [[save]]d index. The assigned corpus comes back lazily from
    * its cell-partitioned layout; the centroids (tiny by construction)
    * load eagerly to the driver, as the probe planner needs them.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids").orderBy("cell")
      .collect()
      .map(r => org.apache.spark.ml.linalg.Vectors.dense(
        r.getAs[scala.collection.Seq[Double]]("centroid").toArray))
    Index(spark.read.parquet(s"$path/assigned"), centroids)
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

  /** Pretrained cell centroids: KMeans k=8, seed=42, maxIter=20 on the
    * sf0.01 embeddings table ([[graft.FitCentroids]] is the fitting script),
    * quantized to exact 1024ths — every component is exactly representable
    * in both float and double, so the DuckDB oracle computes bit-identical
    * cell assignments from the same numerators. This is the production
    * shape for IVF at 100 TB anyway: the index is fit ONCE on a bounded
    * sample offline, then shipped to the job as constants; fitting inside
    * the query would re-cluster the corpus on every run.
    */
  val PretrainedCentroidNumerators: Array[Array[Int]] = Array(
    Array(-57, 27, -38, 0, -12, 49, 65, -4, -24, -30, 9, 12, -33, 67, -18, -17, 11, -51, -20, 14, 11, 3, 14, -7, 63, 56, -28, 12, 18, 2, -8, 54, -3, -43, -34, 48, 71, 9, -29, 16, 12, 24, -11, 4, -88, -23, 79, -36, 9, 31, 14, 29, 0, 13, -39, -48, 53, -24, -24, 29, -2, -1, -11, 11),
    Array(-18, -75, -3, 74, 23, -52, -60, 72, 43, 157, -77, 13, -19, -33, -14, -49, -54, -111, -15, -55, 25, 163, 53, 7, -14, 258, 105, -23, 54, -115, 23, 147, 94, -42, 35, -81, 54, -27, 7, 54, -10, -87, -92, 75, -31, 167, 42, 11, -156, 22, -36, 79, -61, 34, -142, -116, 131, -48, 84, 17, 21, -19, -45, -41),
    Array(-10, -12, -16, 1, 46, 28, -58, 31, 3, 16, -24, 42, -15, 29, -44, 21, 13, 31, -16, -52, 8, -1, 35, -125, -27, -8, -6, 9, 17, -45, 22, -54, -1, 19, 25, -14, -18, 51, 27, -34, -7, 21, 23, -12, -2, -15, 9, 22, -6, -44, -18, 11, -26, 36, 28, -18, -51, 12, 19, -22, -42, 21, 19, 9),
    Array(58, -9, -9, 12, -23, 5, -47, 19, -22, -44, -4, 17, -48, -41, -30, 39, 5, 24, 44, -42, -48, 17, 4, 70, 32, 3, 9, 21, 40, 19, 32, 77, -24, -11, 23, 18, -67, -15, 2, 24, 0, -15, 77, -19, -10, 49, 2, 16, -28, 10, 31, 33, 20, -70, -6, 32, 12, 16, -54, -39, 29, 2, 13, 23),
    Array(30, 57, -25, 49, 9, -2, -91, 3, -17, -20, 33, -118, 7, 25, 16, 20, -16, 14, -59, -3, 16, -10, 58, 37, 61, -41, -23, 5, 1, 53, -25, -79, 28, 16, -5, -45, 10, 42, -49, 30, -57, -48, -41, -22, -29, 9, -41, 22, 53, 36, 62, -62, -7, 6, -11, 14, 32, 21, 3, 75, 55, -23, 24, -18),
    Array(28, -19, 25, -75, -12, 11, -16, 37, 53, 84, 18, 8, 60, -24, 34, 29, -3, 65, 25, 86, -5, -32, -10, -26, -38, -6, -5, 93, -77, 1, -22, 6, 47, 17, 5, 50, 11, -71, 27, -47, 8, -50, 46, 12, -11, -18, -10, 24, 11, 7, 6, -12, 4, -1, 22, 65, -10, -46, -57, -41, 0, 28, -40, -61),
    Array(-4, -4, 82, -36, 22, -68, 54, 24, -8, -29, 12, -74, 2, -47, -19, -29, 31, -23, -10, 39, -5, -2, 7, 5, -51, 42, 53, -18, 10, 32, 8, -40, 6, 14, -1, -9, -30, -41, 25, 58, 4, -21, -20, 52, -38, -4, -48, -13, -46, 30, -9, -29, 16, 21, 103, -62, 33, -22, 4, -7, -47, -28, 18, -41),
    Array(-19, -34, 13, 8, 25, 21, -24, -43, -6, 1, 26, 59, 20, 8, 67, -20, -15, -14, 11, 6, 1, 16, -59, 25, -24, 18, -19, -30, -29, -12, 8, -28, 15, -46, 5, -29, 1, 3, -27, -30, 11, -13, -74, -15, 59, 10, -13, 1, 11, -90, 9, -14, 49, -28, -43, 1, -8, 17, 49, -19, 22, 19, -24, -30)
  )

  def pretrainedCentroids: Array[Array[Float]] =
    PretrainedCentroidNumerators.map(_.map(_ / 1024.0f))

  /** Per-cell scores `dot(v, c) / ‖c‖` — the ONE scoring formula both cell
    * assignment ([[literalCell]]) and probe selection ([[literalTopK]])
    * must share: the tie contract between them (first-max assignment ==
    * probe ORDER BY score DESC, cell) only holds if they compute identical
    * scores.
    *
    * Evaluated by [[graft.plans.CellScoresB]] against a BROADCAST
    * [[graft.plans.CentroidBank]] (bit-identical accumulation to the
    * per-centroid `graft_dot(vec, lit(c)) / sqrt(graft_dot(c, c))` form it
    * replaced): the centroid matrix rides the block manager once per
    * executor instead of being inlined as expression Literals into every
    * task's serialized plan — the round-8 6 MiB-task-binary finding.
    */
  private def literalCellScores(vec: Column, centroids: Array[Array[Float]]): Column =
    graft.plans.CentroidBank.scoresColumn(vec, centroids)

  /** Cell-assignment column against FIXED centroid literals — the
    * blocking key for IVF-bucketed operators (e.g.
    * [[graft.dedup.Dedup.embeddingNearDups]] with learned cells instead
    * of a user label). First-max index on ties, matching [[literalTopK]].
    */
  def literalCell(vec: Column, centroids: Array[Array[Float]]): Column = {
    val scores = literalCellScores(vec, centroids)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Cosine of `vec` to the centroid of its OWN assigned cell
    * ([[literalCell]]'s argmax): the assignment scores are
    * `dot(v,c)/‖c‖`, so dividing the max score by `‖v‖` is the cosine
    * without recomputing the argmax dot. 0.0 for a zero-norm vector.
    * The typicality axis [[graft.dedup.Dedup.semanticDedup]] ranks
    * cluster keepers by.
    */
  def literalCellCosine(vec: Column, centroids: Array[Array[Float]]): Column = {
    val best = array_max(literalCellScores(vec, centroids))
    val n = VectorFunctions.norm2(vec)
    when(n > 0, best / n).otherwise(lit(0.0))
  }

  /** IVF search against FIXED centroid literals — assignment and probe
    * selection are pure column arithmetic (no model object, no fit in the
    * query), which is both the oracle-reproducible form and the production
    * one (index constants shipped with the job). Cell score is
    * `dot(v, c) / ‖c‖` — cosine up to the row's own positive norm, so the
    * argmax is the cosine argmax without computing the row norm.
    */
  def literalTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      nProbe: Int,
      centroids: Array[Array[Float]]
  ): DataFrame = {
    def cellScores(v: Column): Column = literalCellScores(v, centroids)
    // first-max index = lowest cell on ties, matching the oracle's
    // row_number ORDER BY score DESC, cell ([[literalCell]])
    val assigned = corpus.select(
      id.as("n_id"), vec.as("n_vec"), literalCell(vec, centroids).as("cell"),
      VectorFunctions.norm2(vec).as("n_nrm"))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("cell").asc)
    val probes = queries
      .select(id.as("q_id"), vec.as("q_vec"), VectorFunctions.norm2(vec).as("q_nrm"),
        posexplode(cellScores(vec)).as(Seq("cell", "score")))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
    val nn = col("q_nrm") * col("n_nrm")
    val scored = assigned
      .join(broadcast(probes), Seq("cell"))
      .where(col("q_id") =!= col("n_id"))
      .select(
        col("q_id"), col("n_id"),
        round(when(nn > 0, VectorFunctions.dot(col("q_vec"), col("n_vec")) / nn).otherwise(lit(0.0)), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** kNN JOIN — [[literalTopK]]'s both-sides-LARGE sibling: every row of
    * `queries` gets its approximate top-k cosine neighbours from
    * `corpus`, with NEITHER side broadcast. [[literalTopK]] ships the
    * probe set to every executor, which is right for "a few thousand
    * queries against a big corpus" and wrong for "re-rank all 10 B
    * documents against each other" (cross-snapshot linkage, corpus-wide
    * SemDeDup candidate feeds, embedding-join of two whole corpora).
    * Here both sides hash-PARTITION on the IVF cell: corpus rows land in
    * their assigned cell, queries land in their `nProbe` best cells
    * (probe fan-out ×nProbe is the only row growth), the per-cell
    * shuffled join scores candidates, and a per-query top-k
    * (`row_number` ≤ k — Spark plans a WindowGroupLimit, so partial
    * top-ks prune map-side before the rank shuffle) finishes.
    *
    * Scale shape: two exchanges (cell join, per-query rank), both keyed
    * and map-combined; no broadcast of anything but the centroid bank.
    * Cell population skew is bounded by the centroid fit (cells are
    * k-means-balanced); [[cellProfile]] is the pre-flight skew readout,
    * and a hot cell splits by re-fitting with more centroids — the same
    * remedy as re-bucketing a skewed hash join. Self-matches (same id on
    * both sides) are excluded, so a table can join against itself.
    *
    * `maxCell` (off by default) drops corpus cells holding MORE than
    * `maxCell` rows from the join — the [[graft.dedup.Dedup.embeddingNearDups]]
    * skew cap, because no fit promise survives corpus drift: a cell the
    * centroids were never re-fit for can concentrate arbitrarily, and one
    * hot cell × its probing queries is the quadratic blow-up every other
    * pair generator here already guards against. Queries probing a
    * dropped cell simply lose that cell's candidates (they keep their
    * other probes); [[oversizedCells]] reports what a given cap excludes
    * so it can be sized from data, and a standing hot cell means re-fit
    * with more centroids.
    */
  def joinTopK(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      nProbe: Int,
      centroids: Array[Array[Float]],
      maxCell: Int = Int.MaxValue
  ): DataFrame = {
    require(k > 0 && nProbe > 0, "k and nProbe must be positive")
    require(maxCell > 0, s"maxCell must be positive: $maxCell")
    val assignedAll = corpus.select(
      id.as("n_id"), vec.as("n_vec"), literalCell(vec, centroids).as("cell"),
      VectorFunctions.norm2(vec).as("n_nrm"))
    val assigned =
      if (maxCell == Int.MaxValue) assignedAll
      else assignedAll
        .join(assignedAll.groupBy(col("cell")).agg(count(lit(1)).as("__n")), Seq("cell"))
        .where(col("__n") <= maxCell)
        .drop("__n")
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("cell").asc)
    val probes = queries
      .select(id.as("q_id"), vec.as("q_vec"), VectorFunctions.norm2(vec).as("q_nrm"),
        posexplode(literalCellScores(vec, centroids)).as(Seq("cell", "score")))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
    val nn = col("q_nrm") * col("n_nrm")
    // SALT the cell join (guide: synthetic keys with too few distinct
    // values): the join key has only |centroids| values, so however many
    // partitions the exchange has, at most |centroids| are non-empty —
    // and the per-partition work is the |cell corpus|×|cell probes| dot
    // fan-out (measured at sf0.1/local[32]: the q144 scoring stage ran
    // ONE task, 1.7 s). The corpus side takes a deterministic per-row
    // salt (xxhash64 of the id — never rand(), which re-draws on task
    // retry), the probe side replicates across all S salts; every
    // (corpus, probe) pair still meets exactly once, on one (cell, salt)
    // key. S is bounded so probe replication stays negligible: at most
    // 16, and no more than it takes for cells×S to cover the session's
    // configured parallelism (a cluster's thousands of cells already
    // spread — S degrades to 1).
    val saltS = math.max(1, math.min(16,
      math.ceil(corpus.sparkSession.sessionState.conf.numShufflePartitions.toDouble /
        math.max(1, centroids.length)).toInt))
    // REGIME-GATED repartition pin on the salted corpus side
    // ([[graft.Fanout]]): in the collapsed local regime the salt alone
    // only raises the distinct-key count — AQE's byte-based coalescing
    // would still fold the tiny post-shuffle partitions back into one,
    // so the pin keeps the scoring stage at the session's configured
    // parallelism. When the corpus scan is already at/above the target
    // width (the cluster regime, where this join runs broadcast and the
    // corpus never moves) the pin is SKIPPED — an unconditional pin
    // would shuffle every embedding vector that the broadcast plan
    // never paid (round-16 verdict). The probe is the raw corpus scan,
    // never the (possibly joined) assigned relation.
    val salted = assigned
      .withColumn("__salt", pmod(xxhash64(col("n_id")), lit(saltS.toLong)).cast("int"))
    val scored = graft.Fanout
      .repartitionIfNarrow(salted, corpus, col("cell"), col("__salt"))
      .join(probes.withColumn("__salt",
        explode(lit((0 until saltS).toArray))), Seq("cell", "__salt"))
      .where(col("q_id") =!= col("n_id"))
      .select(
        col("q_id"), col("n_id"),
        round(when(nn > 0, VectorFunctions.dot(col("q_vec"), col("n_vec")) / nn).otherwise(lit(0.0)), 4)
          .as("cosine"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
  }

  /** The cells a given [[joinTopK]] `maxCell` cap would drop, with member
    * counts — the observability half of the cap (parity with
    * [[graft.dedup.Dedup.embeddingOversizedBuckets]]): one map-combined
    * aggregate over the cell assignment, no pair expansion. Run it to
    * size the cap; a standing entry here means the centroid fit has
    * drifted and the index wants re-fitting with more cells.
    */
  def oversizedCells(
      corpus: DataFrame,
      vec: Column,
      centroids: Array[Array[Float]],
      maxCell: Int
  ): DataFrame =
    corpus.select(literalCell(vec, centroids).as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxCell)

  /** Corpus diversity profile by nearest centroid — the coverage report a
    * training-mix owner reads before sampling: one row per k-means cell
    * with its population, corpus share, cohesion (mean cosine to the
    * cell's centroid), the dominant label and its share, and the label
    * entropy (nats) — low entropy = the cell is one source's island, high
    * = genuinely mixed content.
    *
    * Scale shape: cell assignment and the cosine-to-centroid are per-row
    * expressions against FIXED centroid literals (no model object, no
    * fit — see [[literalTopK]]), so the corpus is scanned ONCE and
    * aggregated through ONE (cell, label) shuffle with map-side partial
    * aggregation. Everything after that — per-cell rollups, dominant
    * label, entropy — is window math over the materialized
    * |cells| × |labels| aggregated relation, which is the report itself
    * and bounded by construction; the corpus total for shares is a
    * scalar aggregate of that same relation, broadcast back (the
    * histogramFromBins pattern — never a single-partition window).
    *
    * Cohesion uses the same score family as assignment: cell score is
    * `dot(v, c) / ‖c‖`, so cosine to the assigned centroid is
    * `best_score / ‖v‖` — no second pass over the centroid array. Zero
    * vectors profile with cosine 0. Ties: dominant label is lowest on
    * equal counts, matching the oracle's `ORDER BY n DESC, label`.
    */
  def cellProfile(
      corpus: DataFrame,
      vec: Column,
      label: Column,
      centroids: Array[Array[Float]]
  ): DataFrame = {
    val rows = corpus
      .select(literalCellScores(vec, centroids).as("__s"),
        VectorFunctions.norm2(vec).as("__nrm"), label.as("label"))
      .select(
        (array_position(col("__s"), array_max(col("__s"))) - 1).cast("int").as("cell"),
        when(col("__nrm") > 0, array_max(col("__s")) / col("__nrm"))
          .otherwise(lit(0.0)).as("cos"),
        col("label"))
    // materialized so the corpus-total branch and the windowed rollup
    // both read the tiny (cell, label) aggregate instead of re-executing
    // the corpus scan lineage (the histogramFromBins pattern); the total
    // is a scalar aggregate + broadcast, never a single-partition window
    val byCellLabel = graft.Materialize(
      rows.groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("n"), sum(col("cos")).as("sc")))
    val total = byCellLabel.agg(sum(col("n")).as("total"))
    val wCell = Window.partitionBy(col("cell"))
    val wRank = Window.partitionBy(col("cell")).orderBy(col("n").desc, col("label").asc)
    byCellLabel
      .withColumn("n_vecs", sum(col("n")).over(wCell))
      .withColumn("sum_cos", sum(col("sc")).over(wCell))
      .withColumn("ent", sum(-(col("n") / col("n_vecs")) * log(col("n") / col("n_vecs"))).over(wCell))
      .withColumn("rn", row_number().over(wRank))
      .where(col("rn") === 1)
      .crossJoin(broadcast(total))
      .select(
        col("cell"),
        col("n_vecs"),
        round(col("n_vecs") / col("total"), 4).as("share"),
        round(col("sum_cos") / col("n_vecs"), 4).as("avg_cos"),
        col("label").as("top_label"),
        round(col("n") / col("n_vecs"), 4).as("top_share"),
        // + 0.0 normalizes the IEEE -0.0 a single-label cell produces
        // (-(1.0)·ln(1.0) sums to -0.0) so both engines emit +0.0
        round(col("ent") + lit(0.0), 4).as("label_entropy"))
  }
}
