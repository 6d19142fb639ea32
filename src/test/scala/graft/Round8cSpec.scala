package graft

import graft.curation.{Assembly, Quantiles}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Round-8c additions: per-group domain cap, median/MAD outlier screen,
  * embedding-space contamination.
  */
class Round8cSpec extends SparkSpec {
  import spark.implicits._

  // --- capPerGroup --------------------------------------------------------

  test("capPerGroup keeps the order-best n per group, deterministically under ties") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 300L), ("a", 3L, 200L), ("a", 4L, 300L),
      ("b", 5L, 10L)
    ).toDF("g", "id", "score")
    val got = Assembly.capPerGroup(df, $"g", Seq($"score".desc, $"id".asc), n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // group a: score 300 ties between id 2 and 4 — id ascending keeps both
    // (they are ranks 1 and 2); group b keeps its single row
    assert(got == Set(("a", 2L), ("a", 4L), ("b", 5L)))
    // all original columns survive, no helper column leaks
    assert(Assembly.capPerGroup(df, $"g", Seq($"id"), 1).columns.toSeq ==
      Seq("g", "id", "score"))
    intercept[IllegalArgumentException] { Assembly.capPerGroup(df, $"g", Seq($"id"), 0) }
    intercept[IllegalArgumentException] { Assembly.capPerGroup(df, $"g", Seq.empty, 1) }
  }

  test("capPerGroup is a no-op on groups at or under the cap") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    assert(Assembly.capPerGroup(df, $"g", Seq($"id"), 2).count() == 3)
  }

  // --- madOutlierReport ---------------------------------------------------

  test("madOutlierReport: hand-checked median, MAD, and outlier count") {
    // group a: values 1,2,3,4,100 → median (rank ceil(2.5)=3) = 3,
    // deviations 2,1,0,1,97 → MAD (rank 3 of 0,1,1,2,97) = 1;
    // k=3 → |v-3| > 3 flags only 100
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("g", "v")
    val r = Quantiles.madOutlierReport(df, $"g", $"v", k = 3.0).collect().head
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Double]("med") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1)
  }

  test("madOutlierReport: MAD=0 group flags every off-median row (loud by design)") {
    // >50% of rows at one value → MAD 0; the 9.0 row must flag at any k
    val df = Seq(("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)).toDF("g", "v")
    val r = Quantiles.madOutlierReport(df, $"g", $"v", k = 100.0).collect().head
    assert(r.getAs[Double]("med") == 5.0)
    assert(r.getAs[Double]("mad") == 0.0)
    assert(r.getAs[Long]("n_outliers") == 1)
  }

  test("madOutlierReport agrees with a brute-force reference on random groups") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map(i =>
      (s"g${i % 3}", math.floor(rng.nextGaussian() * 100) / 2 + (if (i % 37 == 0) 5000 else 0)))
    val df = rows.toDF("g", "v")
    val got = Quantiles.madOutlierReport(df, $"g", $"v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_outliers")))).toMap
    def q1(vs: Seq[Double]): Double = {
      val s = vs.sorted
      s(math.min(s.size, math.max(1, math.ceil(0.5 * s.size).toLong)).toInt - 1)
    }
    for ((g, gvs) <- rows.groupBy(_._1)) {
      val vs = gvs.map(_._2)
      val med = q1(vs)
      val mad = q1(vs.map(v => math.abs(v - med)))
      val out = vs.count(v => math.abs(v - med) > 3.0 * mad)
      assert(got(g) == ((vs.size.toLong, med, mad, out.toLong)), s"group $g")
    }
  }

  // --- semanticContamination ----------------------------------------------

  test("semanticContamination flags near-bench vectors, skips orthogonal and zero-norm") {
    val bench = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f)),   // colinear: cosine 1.0
      (2L, Array(1.0f, 1.0f, 0.0f)),   // cos ≈ 0.7071
      (3L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (4L, Array(0.0f, 0.0f, 0.0f))    // zero norm: excluded, not NaN
    ).toDF("id", "vec")
    val got = Dedup.semanticContamination(
      corpus, $"id", $"vec", bench, $"id", $"vec", minCosine = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 100L, 1.0), (2L, 100L, 0.7071)))
  }

  test("semanticContamination: every (corpus, bench) pair is scored (recall-1 law)") {
    val bench = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f))).toDF("id", "vec")
    val corpus = Seq((1L, Array(1.0f, 1.0f))).toDF("id", "vec")
    val got = Dedup.semanticContamination(
      corpus, $"id", $"vec", bench, $"id", $"vec", minCosine = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L)))
  }
}
