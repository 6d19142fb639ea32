package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-ranking utilities: fuse heterogeneous rankings and measure
  * what embedding truncation costs — the evaluation/serving half of the
  * similarity stack ([[KNN]]/[[IVF]] produce rankings; these consume
  * them).
  */
object Ranking {

  /** RECIPROCAL-RANK FUSION (Cormack et al., SIGIR'09): combine N ranked
    * candidate lists into one by `score(d) = Σ_lists 1 / (c + rank_i(d))`
    * — the standard way to merge an embedding-ANN ranking with a lexical
    * (or any second) ranking in retrieval, robust because it needs no
    * score calibration between lists (only ranks). A document missing
    * from a list contributes 0 from it. Output:
    * `(q_id, n_id, rrf_score, rank)`, top `k` per query, ties on score
    * break to the lowest `n_id`.
    *
    * Each input must carry the [[KNN.bruteForceTopK]] contract columns
    * `(q_id, n_id, rank)`; a (q_id, n_id) must appear at most once per
    * list (ranks are positions).
    *
    * Determinism: contributions are folded in LIST ORDER (per-list
    * pivoted aggregates, then a fixed-order sum), never a
    * partition-order float sum — the score is bit-reproducible
    * cross-engine, so `rrf_score` ships UNROUNDED (rounding identical
    * doubles is where engines disagree, not computing them).
    *
    * Scale shape: one (q_id, n_id) map-combined aggregate over the
    * concatenated lists + one per-query WindowGroupLimit rank. Inputs
    * are top-k lists, not corpora — rows in ≈ Σ |lists| · |queries| · k.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.size >= 2, s"rrfFuse needs >= 2 rankings, got ${rankings.size}")
    require(k > 0 && c >= 0, s"bad k/c: $k/$c")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("q_id"), col("n_id"), col("rank"), lit(i).as("__list"))
    }.reduce(_ unionByName _)
    val perList = rankings.indices.map { i =>
      max(when(col("__list") === i, lit(1.0) / (lit(c) + col("rank")))).as(s"__s_$i")
    }
    val contribs = tagged.groupBy(col("q_id"), col("n_id"))
      .agg(perList.head, perList.tail: _*)
    val score = rankings.indices
      .map(i => coalesce(col(s"__s_$i"), lit(0.0)))
      .reduce(_ + _) // left-to-right in list order — fixed fold order
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf_score").desc, col("n_id").asc)
    contribs
      .withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rrf_score"), col("rank"))
  }

  /** MAXIMAL-MARGINAL-RELEVANCE RE-RANK (Carbonell & Goldstein,
    * SIGIR'98): greedily re-order a per-query candidate list so each pick
    * maximizes `λ·rel − (1−λ)·max_{s∈picked} cos(c, s)` — relevance
    * traded against redundancy with what is already picked. The
    * retrieval-diversity step after [[KNN]]/[[IVF]]/[[rrfFuse]]: a top-k
    * of 10 paraphrases of one document is less useful than 10 distinct
    * neighborhoods, for RAG serving and for diverse exemplar selection.
    *
    * Input contract: `(q_id, n_id, rel, vec)` — a TOP-N LIST per query
    * (the retriever's output joined back to its vectors), never a corpus;
    * groups above `maxCandidates` fail loudly. Output
    * `(q_id, n_id, mmr_score, rank)`, rank = pick order, ties on score
    * break to the lowest `n_id`.
    *
    * Determinism (oracle-replayable greedy): `rel` and every candidate
    * cosine are rounded HALF_UP to 4 dp BEFORE the arithmetic — both
    * engines then walk identical doubles through identical ops, so the
    * argmax sequence is engine-independent. The first pick's redundancy
    * term is 0 (empty picked set). Keep `lambda` dyadic (default 0.75)
    * so `λ·rel` and `(1−λ)·sim` stay exact scalings of grid values.
    *
    * Scale shape: `flatMapGroups` per query — the one legitimately
    * imperative spot (the greedy is sequential BY DEFINITION; each pick
    * depends on all prior picks). State is O(n) per group with n bounded
    * by the retriever's top-n, work O(k·n) plus n·k cached cosines; the
    * corpus never enters. One hash exchange on `q_id`.
    */
  def mmrRerank(
      candidates: DataFrame,
      k: Int,
      lambda: Double = 0.75,
      maxCandidates: Int = 4096
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0,1]: $lambda")
    require(maxCandidates > 0, s"bad maxCandidates: $maxCandidates")
    val spark = candidates.sparkSession
    import spark.implicits._
    val oneMinus = 1.0 - lambda // computed ONCE, mirrored as (1 - λ) in SQL
    def r4(v: Double): Double = // Spark round(_, 4) semantics: HALF_UP
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    candidates
      .select(col("q_id").cast("long"), col("n_id").cast("long"),
        round(col("rel").cast("double"), 4).as("rel"), col("vec"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        val cand = it.toArray
        require(cand.length <= maxCandidates,
          s"query $qid carries ${cand.length} candidates (max $maxCandidates) — " +
            "mmrRerank re-orders a top-n list; cut the list upstream")
        // deterministic local order (input partition order is not)
        val c = cand.sortBy(x => (x._2))
        val n = c.length
        def cos(a: Array[Float], b: Array[Float]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          val len = math.min(a.length, b.length)
          while (i < len) { // same fold order as DotProductF / list_sum
            dot += a(i).toDouble * b(i).toDouble
            na += a(i).toDouble * a(i).toDouble
            nb += b(i).toDouble * b(i).toDouble
            i += 1
          }
          val nn = math.sqrt(na) * math.sqrt(nb)
          if (nn > 0) r4(dot / nn) else 0.0
        }
        val picked = new Array[Boolean](n)
        // max cosine to the picked set — a genuine max (cosines can be
        // NEGATIVE; a 0.0 floor would hide anti-correlated redundancy).
        // −∞ marks "picked set empty so far": the term is 0 by convention.
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val out = Seq.newBuilder[(Long, Long, Double, Int)]
        var step = 1
        val kk = math.min(k, n)
        while (step <= kk) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val red = if (maxSim(i) == Double.NegativeInfinity) 0.0 else maxSim(i)
              val score = lambda * c(i)._3 - oneMinus * red
              // strict > plus sorted-by-n_id scan = lowest-id tie-break
              if (score > bestScore) { best = i; bestScore = score }
            }
            i += 1
          }
          picked(best) = true
          out += ((qid, c(best)._2, r4(bestScore), step))
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val s = cos(c(j)._4, c(best)._4)
              if (s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
          step += 1
        }
        out.result()
      }
      .toDF("q_id", "n_id", "mmr_score", "rank")
  }

  /** DIMENSION-ABLATION RECALL CURVE: micro recall@k of brute-force
    * search over the FIRST `d` embedding dimensions against full-width
    * truth, for each `d` in `dims` — the measurement behind
    * Matryoshka-style truncation decisions ("how many dims can serving
    * drop before recall pays"): truncated vectors shrink the index
    * linearly, and this is the measure-don't-guess readout for where
    * the curve bends. Output: `(n_dims, n_truth, n_hit, recall)` — one
    * row per ablation width; MICRO recall (hit totals over truth
    * totals), which is an exact integer ratio, not an average of
    * per-query rounds.
    *
    * Scale shape: the eval-harness shape, not a corpus op — `queries`
    * is a small probe panel ([[KNN.bruteForceTopK]] broadcasts it), and
    * the corpus is scanned once per ablation width with no shuffle. Run
    * it on a sampled panel, then configure the index with the chosen
    * width.
    */
  def dimAblationRecall(
      corpus: DataFrame,
      queries: DataFrame,
      id: Column,
      vec: Column,
      dims: Seq[Int],
      k: Int
  ): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ > 0), s"bad dims: $dims")
    val truth = KNN.bruteForceTopK(corpus, queries, id, vec, k)
      .select(col("q_id"), col("n_id")).distinct()
    dims.map { d =>
      val approx = KNN.bruteForceTopK(corpus, queries, id, slice(vec, 1, d), k)
        .select(col("q_id"), col("n_id")).distinct()
      truth
        // both sides are ≤ |panel|·k rows, but they come out of window
        // stages whose size estimates are opaque to the planner — broadcast
        // the probe side explicitly so the hit join never sort-merges
        .join(broadcast(approx.withColumn("__hit", lit(1))), Seq("q_id", "n_id"), "left")
        .agg(
          count(lit(1)).as("n_truth"),
          sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
        .select(
          lit(d).as("n_dims"), col("n_truth"), col("n_hit"),
          round(col("n_hit") / col("n_truth"), 4).as("recall"))
    }.reduce(_ unionByName _)
  }
}
