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
}
