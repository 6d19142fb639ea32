package graft

import graft.curation.Quantiles
import graft.similarity.NeighborOps
import org.apache.spark.sql.functions._

/** Round-10 additions: kNN label propagation (auto-labeling with abstain),
  * hard-negative mining, and the quality-signal CDF rank ensemble.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // two orthogonal 2-d cells — every hand vector lands decisively
  private val cents: Array[Array[Float]] = Array(Array(1f, 0f), Array(0f, 1f))

  private def embDf(rows: (Long, Array[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "vec", "label")

  test("labelPropagate: unanimous neighborhood labels with confidence 1; ties break to the LOWEST label") {
    val corpus = embDf(
      (1L, Array(1.0f, 0.05f), 7), (2L, Array(1.0f, 0.1f), 7), (3L, Array(0.9f, 0.0f), 7),
      (4L, Array(0.05f, 1.0f), 3), (5L, Array(0.0f, 0.9f), 3))
    // q10 sits in the x-cell: its 3 nearest labeled rows are all label 7
    val q = embDf((10L, Array(0.95f, 0.02f), -1))
    val out = NeighborOps.labelPropagate(
      corpus, q, col("vec_id"), col("vec"), col("label"),
      k = 3, nProbe = 1, centroids = cents, minAgreement = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((10L, 7, 3L, 3L, 1.0)), out.toSeq.toString)
    // tie: probe both cells, k=4 → two label-7 and two label-3 neighbours
    // (2 votes each) → the LOWER label (3) wins; 0.5 agreement passes at
    // minAgreement=0.5 and abstains at 0.6
    val mid = embDf((11L, Array(0.7f, 0.7f), -1))
    val tied = NeighborOps.labelPropagate(
      corpus.where(col("vec_id") =!= 3L), mid, col("vec_id"), col("vec"), col("label"),
      k = 4, nProbe = 2, centroids = cents, minAgreement = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(4)))
    assert(tied.toSeq == Seq((11L, 3, 0.5)), tied.toSeq.toString)
    val abstained = NeighborOps.labelPropagate(
      corpus.where(col("vec_id") =!= 3L), mid, col("vec_id"), col("vec"), col("label"),
      k = 4, nProbe = 2, centroids = cents, minAgreement = 0.6)
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(tied.length == 1 && abstained.toSeq == Seq((11L, true)), abstained.toSeq.toString)
  }

  test("hardNegatives: same-label pairs never surface; negatives rank by cosine desc; " +
      "null-labeled rows match nothing") {
    val corpus = embDf(
      (1L, Array(1.0f, 0.0f), 7), (2L, Array(1.0f, 0.1f), 7),
      (3L, Array(0.9f, 0.3f), 3), (4L, Array(0.8f, 0.4f), 3)) union
      Seq((5L, Array(0.7f, 0.5f), Option.empty[Int])).toDF("vec_id", "vec", "label")
    val out = NeighborOps.hardNegatives(
      corpus, col("vec_id"), col("vec"), col("label"),
      k = 2, nProbe = 2, centroids = cents)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
      r.getDouble(4), r.getInt(5)))
    assert(rows.forall { case (_, ql, _, nl, _, _) => ql != nl }, rows.toSeq.toString)
    // vec 1's negatives are the two label-3 rows, nearest (3) first
    val v1 = rows.filter(_._1 == 1L).sortBy(_._6).map(_._3).toSeq
    assert(v1 == Seq(3L, 4L), rows.toSeq.toString)
    // per query, ranks are 1..n and cosine non-increasing
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1 to g.length).toSeq)
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sorted(Ordering[Double].reverse).toSeq)
    }
    // the null-labeled row is neither a query nor a negative
    assert(!rows.exists(r => r._1 == 5L || r._3 == 5L), rows.toSeq.toString)
  }

  test("cdfBlend: binned CDF equals the hand computation; weights normalize; null signal → null composite") {
    val df = Seq(
      (1L, Some(1.0), 10.0), (2L, Some(2.0), 20.0),
      (3L, Some(3.0), 30.0), (4L, Some(4.0), 40.0),
      (5L, None, 50.0)
    ).toDF("id", "a", "b")
    // bins=4, n=4 non-null per signal → cuts at ranks ceil(q·4) = 1,2,3.
    // Signal a: cuts {1,2,3} → cdf(1)=.25 cdf(2)=.5 cdf(3)=.75 cdf(4)=.75
    val out = Quantiles.cdfBlend(
      df.where(col("a").isNotNull), col("id"), Seq(col("a") -> 2.0, col("b") -> 2.0), bins = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // b is a monotone rescale of a → identical cdfs; weights 2/2 → mean
    assert(out.toSeq == Seq(
      (1L, 0.25, 0.25, 0.25), (2L, 0.5, 0.5, 0.5),
      (3L, 0.75, 0.75, 0.75), (4L, 0.75, 0.75, 0.75)), out.toSeq.toString)
    // a null signal yields a null composite for that row, not a silent 0
    val withNull = Quantiles.cdfBlend(
      df, col("id"), Seq(col("a") -> 1.0, col("b") -> 1.0), bins = 4)
      .where(col("doc_id") === 5L).collect().head
    assert(withNull.isNullAt(1) && !withNull.isNullAt(2) && withNull.isNullAt(3))
  }

  test("cdfBlend: composite orders rows identically to an exact percent_rank blend at fine bins") {
    val rng = new scala.util.Random(77)
    val df = (1L to 200L).map(i => (i, rng.nextGaussian(), rng.nextInt(1000).toDouble))
      .toDF("id", "a", "b")
    val out = Quantiles.cdfBlend(df, col("id"), Seq(col("a") -> 1.0, col("b") -> 3.0), bins = 256)
    // exact reference: percent_rank-based blend (fine for a 200-row spec;
    // the library avoids it because it is a global sort at scale)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("a"))
    val w2 = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
    val ref = df
      .withColumn("ra", percent_rank().over(w))
      .withColumn("rb", percent_rank().over(w2))
      .select(col("id"), (col("ra") * 0.25 + col("rb") * 0.75).as("ref"))
    val joined = out.join(ref, col("doc_id") === col("id")).select("doc_id", "composite", "ref")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // rank agreement: Spearman-style — the two blends order the corpus
    // the same way up to binning resolution (mean abs CDF error < 2/bins
    // per signal → composite within ~1.6% of the exact rank blend)
    joined.foreach { case (id, c, r) =>
      assert(math.abs(c - r) < 0.02, s"doc $id: composite $c vs exact $r")
    }
  }

  test("rrfFuse: hand-checked scores; a doc missing from one list contributes 0 from it; " +
      "score ties break to the LOWEST n_id") {
    import graft.similarity.Ranking
    // list A ranks (n1, n2, n3); list B ranks (n2, n1, n4) — n3/n4 each
    // appear in only one list
    def lst(rows: (Long, Long, Int)*) = rows.toSeq.toDF("q_id", "n_id", "rank")
    val a = lst((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
    val b = lst((0L, 2L, 1), (0L, 1L, 2), (0L, 4L, 3))
    val out = Ranking.rrfFuse(Seq(a, b), k = 10, c = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val s1 = 1.0 / 61 + 1.0 / 62 // n1: rank 1 in A, 2 in B
    val s2 = 1.0 / 62 + 1.0 / 61 // n2: mirror — EXACT tie with n1
    val s3 = 1.0 / 63            // n3: only in A
    val s4 = 1.0 / 63            // n4: only in B — ties n3, lower id first
    assert(out === Seq((1L, s1, 1), (2L, s2, 2), (3L, s3, 3), (4L, s4, 4)))
  }

  test("rrfFuse: fixed fold order — score is bit-identical regardless of input row order") {
    import graft.similarity.Ranking
    val rng = new scala.util.Random(41)
    def panel(seed: Int) = (0 until 3).flatMap { q =>
      rng.shuffle((1 to 20).toList).take(10).zipWithIndex.map { case (n, i) =>
        (q.toLong, n.toLong, i + 1)
      }
    }.toDF("q_id", "n_id", "rank")
    val (a, b) = (panel(1), panel(2))
    val once = Ranking.rrfFuse(Seq(a, b), k = 5).orderBy("q_id", "rank").collect().toSeq
    val again = Ranking.rrfFuse(Seq(a.repartition(7), b.orderBy(rand(9))), k = 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(once === again)
  }

  test("mmrRerank: hand-walked greedy — redundancy flips the relevance order; negative " +
      "cosines are real maxima (no 0 floor); λ=1 degenerates to pure relevance order") {
    import graft.similarity.Ranking
    // q0's candidates: n1 and n2 are near-duplicates of each other with top
    // relevance; n3 is orthogonal with lower relevance. Pure relevance
    // order is (n1, n2, n3); MMR at λ=0.5 must demote the duplicate n2.
    val cands = Seq(
      (0L, 1L, 0.90, Array(1.0f, 0.0f)),
      (0L, 2L, 0.89, Array(0.999f, 0.01f)),
      (0L, 3L, 0.50, Array(0.0f, 1.0f))
    ).toDF("q_id", "n_id", "rel", "vec")
    val picks = Ranking.mmrRerank(cands, k = 3, lambda = 0.5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // step1: n1 (0.5·0.90 = 0.45); step2: n2 scores 0.5·0.89 − 0.5·~1.0 ≈
    // −0.055, n3 scores 0.5·0.50 − 0.5·0 = 0.25 → n3; step3: n2 last
    assert(picks.map(_._1) === Seq(1L, 3L, 2L), picks)
    assert(picks.head._2 === 0.45)
    assert(picks(1)._2 === 0.25)
    // negative max-sim: opposite vectors REWARD diversity (score above
    // λ·rel) — a 0.0 floor would clamp this away
    val neg = Seq(
      (1L, 1L, 0.80, Array(1.0f, 0.0f)),
      (1L, 2L, 0.10, Array(-1.0f, 0.0f))
    ).toDF("q_id", "n_id", "rel", "vec")
    val negPicks = Ranking.mmrRerank(neg, k = 2, lambda = 0.5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(negPicks(1) === ((2L, 0.5 * 0.10 - 0.5 * (-1.0))), negPicks) // 0.55 > λ·rel
    // λ=1: exactly the relevance ranking, ties to lowest n_id
    val flat = Seq(
      (2L, 5L, 0.7, Array(1.0f, 0.0f)), (2L, 4L, 0.7, Array(0.0f, 1.0f)),
      (2L, 6L, 0.9, Array(1.0f, 1.0f))
    ).toDF("q_id", "n_id", "rel", "vec")
    val ordered = Ranking.mmrRerank(flat, k = 3, lambda = 1.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ordered === Seq(6L, 4L, 5L))
    // oversized candidate lists fail loudly — this is a re-ranker
    val big = (1 to 40).map(i => (9L, i.toLong, 0.5, Array(1.0f, 0.0f)))
      .toDF("q_id", "n_id", "rel", "vec")
    val err = intercept[Exception] {
      Ranking.mmrRerank(big, k = 2, maxCandidates = 10).collect()
    }
    assert(err.getMessage.contains("re-orders a top-n list")
      || err.getCause != null && err.getCause.getMessage.contains("re-orders a top-n list"),
      err.getMessage)
  }

  test("dimAblationRecall: full-width row anchors at recall 1.0; recall is non-decreasing " +
      "in dims on a monotone hand corpus") {
    import graft.similarity.Ranking
    val rng = new scala.util.Random(5)
    val corpus = (1L to 40L).map(i => (i, Array.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "vec")
    val out = Ranking.dimAblationRecall(
      corpus, corpus.where(col("vec_id") <= 3), col("vec_id"), col("vec"),
      dims = Seq(2, 8), k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(out.size == 2)
    val full = out.last
    assert(full._1 == 8 && full._2 == 15 && full._3 == 15 && full._4 == 1.0,
      s"full-width row must be exact recall 1.0: $full")
    assert(out.head._3 <= full._3)
  }
}
