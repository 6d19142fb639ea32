package graft

import graft.curation.Quantiles
import graft.dedup.Dedup
import graft.functions.{Sketches, TextFunctions}
import graft.operators.{Joins, TimeSeries}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-8b additions: CMS heavy hitters, exact quantiles by histogram
  * refinement, LOCF gap-fill, blocked fuzzy linkage, PII report, skew
  * diagnostics.
  */
class Round8bSpec extends SparkSpec {
  import spark.implicits._

  // --- heavy hitters ------------------------------------------------------

  test("heavyHitters == plain GROUP BY/HAVING on a skewed stream (the exactness law)") {
    // 1×1000, 1×300, 10×50, 200×1 — thresholds cut at several points
    val rows = Seq.fill(1000)("hot") ++ Seq.fill(300)("warm") ++
      (0 until 10).flatMap(i => Seq.fill(50)(s"mid$i")) ++
      (0 until 200).map(i => s"cold$i")
    val df = rows.toDF("term")
    for (minCount <- Seq(1L, 2L, 50L, 51L, 300L, 1000L, 1001L)) {
      val got = Sketches.heavyHitters(df, col("term"), minCount)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = df.groupBy($"term").count().where($"count" >= minCount)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"minCount=$minCount")
    }
  }

  test("heavyHitters: tiny sketch (forced collisions) still yields the exact result") {
    // width 4, depth 1: almost every item collides — false positives
    // abound, but the exact recount clears them all
    val rows = Seq.fill(40)("a") ++ (0 until 400).map(i => s"x$i")
    val df = rows.toDF("term")
    val got = Sketches.heavyHitters(df, col("term"), 40L, depth = 1, width = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 40L)))
  }

  test("heavyHittersByShare: phi over N; empty input; bad args throw") {
    val df = (Seq.fill(9)("a") ++ Seq("b")).toDF("t")
    val got = Sketches.heavyHittersByShare(df, col("t"), 0.5)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a")) // ceil(0.5*10)=5; a=9 passes, b=1 does not
    assert(Sketches.heavyHitters(spark.emptyDataset[String].toDF("t"), col("t"), 1L).isEmpty)
    intercept[IllegalArgumentException] { Sketches.heavyHitters(df, col("t"), 0L) }
    intercept[IllegalArgumentException] { Sketches.heavyHittersByShare(df, col("t"), 0.0) }
  }

  test("CmsCountGteB generated Java compiles; agrees with interpreted eval") {
    import graft.plans.CmsCountGteB
    import org.apache.spark.util.sketch.CountMinSketch
    val cms = CountMinSketch.create(5, 1 << 12, 42)
    (1 to 7).foreach(_ => cms.addLong(11L))
    cms.addLong(22L)
    val bcast = spark.sparkContext.broadcast(cms)
    val e = CmsCountGteB(bcast, 5L, BoundReference(0, LongType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(e)) // throws on compile error
    for ((v, want) <- Seq(11L -> true, 22L -> false)) {
      assert(proj(InternalRow(v)).getBoolean(0) == want, s"compiled $v")
      assert(e.eval(InternalRow(v)) == want, s"interpreted $v")
    }
  }

  // --- exact quantiles ----------------------------------------------------

  private def bruteQuantile(vs: Seq[Double], q: Double): Double = {
    val sorted = vs.sorted
    val rk = math.min(sorted.size, math.max(1, math.ceil(q * sorted.size).toLong)).toInt
    sorted(rk - 1)
  }

  test("exactQuantiles matches the rank definition, incl. ties and tiny groups") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 5000).map(i => ("big", math.floor(rng.nextGaussian() * 1000) / 4)) ++
      (0 until 500).map(_ => ("ties", 5.0)) ++
      Seq(("one", 42.0))
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.9, 0.99, 1.0)
    // maxFinal=64 forces real refinement rounds on the big group
    val got = Quantiles.exactQuantiles(df, $"g", $"v", qs, buckets = 16, maxFinal = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((g, vs) <- byG; q <- qs) {
      assert(got((g, q)) == bruteQuantile(vs, q), s"group=$g q=$q")
    }
    assert(got.size == byG.size * qs.size)
  }

  test("exactQuantiles: q=1 is the max, nulls ignored, bad q throws") {
    val df = Seq(("a", Some(1.0)), ("a", Some(9.0)), ("a", None)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, $"g", $"v", Seq(1.0))
      .collect().map(r => r.getDouble(2))
    assert(got.toSeq == Seq(9.0))
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, $"g", $"v", Seq(0.0))
    }
  }

  // --- LOCF gap-fill ------------------------------------------------------

  test("gapFillLocf: grid slots, carry-forward, leading gap stays null") {
    val df = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10.0),
      (1L, ts("2024-01-01 03:30:00"), 30.0),
      (2L, ts("2024-01-01 01:00:00"), 7.0)
    ).toDF("k", "t", "v")
    val filled = TimeSeries.gapFillLocf(df, $"k", $"t", $"v", stepSeconds = 3600)
      .orderBy($"key", $"slot").collect()
    val k1 = filled.filter(_.getLong(0) == 1L)
    assert(k1.length == 4) // 00..03
    assert(k1.map(r => Option(r.get(3)).map(_.asInstanceOf[Double])).toSeq ==
      Seq(Some(10.0), Some(10.0), Some(10.0), Some(30.0))) // v_filled
    assert(k1.map(r => Option(r.get(2)).map(_.asInstanceOf[Double])).toSeq ==
      Seq(Some(10.0), None, None, Some(30.0))) // v_obs
    val k2 = filled.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getDouble(3) == 7.0)
  }

  test("gapFillLocf: slot aggregate is max (order-insensitive); span guard throws") {
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 3.0),
      (1L, ts("2024-01-01 00:20:00"), 9.0),
      (1L, ts("2024-01-01 00:40:00"), 1.0)
    ).toDF("k", "t", "v")
    val one = TimeSeries.gapFillLocf(df, $"k", $"t", $"v", stepSeconds = 3600).collect()
    assert(one.length == 1 && one.head.getDouble(3) == 9.0)
    val wide = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-03-01 00:00:00"), 2.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillLocf(wide, $"k", $"t", $"v", stepSeconds = 60, maxSlotsPerKey = 1000)
    }
  }

  test("gapFillReport: probe picks the filled value AT the probe slot") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 5.0),
      (1L, ts("2024-01-01 04:00:00"), 8.0)
    ).toDF("k", "t", "v")
    val r = TimeSeries.gapFillReport(df, $"k", $"t", $"v", 3600, "2024-01-01 02:00:00")
      .collect().head
    assert(r.getAs[Long]("n_slots") == 5)
    assert(r.getAs[Long]("n_obs") == 2)
    assert(r.getAs[Long]("n_filled") == 3)
    assert(r.getAs[Double]("v_probe") == 5.0) // carried forward into the gap
    assert(r.getAs[Double]("v_last") == 8.0)
  }

  // --- fuzzy pairs --------------------------------------------------------

  test("fuzzyPairs: edit-distance pairs inside a block; cross-block pairs invisible") {
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitten", "b1"), (3L, "sittin", "b1"),
      (4L, "kitten", "b2"), // identical to 1 but another block: not paired
      (5L, "zzzzzz", "b1")
    ).toDF("id", "s", "blk")
    val got = Dedup.fuzzyPairs(df, $"id", $"s", $"blk", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (2L, 3L, 1)))
  }

  test("fuzzyPairs: maxBlock drops degenerate blocks; prefix caps the comparison") {
    val big = (0 until 30).map(i => (i.toLong, s"x$i", "hot")) :+ (99L, "ab", "ok") :+ (100L, "ac", "ok")
    val df = big.toDF("id", "s", "blk")
    val got = Dedup.fuzzyPairs(df, $"id", $"s", $"blk", maxDist = 1, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((99L, 100L))) // the 30-row block was dropped whole
    // prefixLen: strings differing only beyond the prefix count as dist 0
    val df2 = Seq((1L, "aaaaaX", "b"), (2L, "aaaaaY", "b")).toDF("id", "s", "blk")
    val d0 = Dedup.fuzzyPairs(df2, $"id", $"s", $"blk", maxDist = 0, prefixLen = 5)
      .collect()
    assert(d0.length == 1 && d0.head.getInt(2) == 0)
  }

  // --- PII report ---------------------------------------------------------

  test("piiReport counts docs and occurrences per group over the redact patterns") {
    val df = Seq(
      ("s1", "contact a@b.com and c@d.org today"),
      ("s1", "see https://x.test/page now"),
      ("s2", "account 1234567890 plain")
    ).toDF("src", "text")
    val got = TextFunctions.piiReport(df, $"text", $"src")
      .orderBy($"group").collect()
    val s1 = got(0)
    assert(s1.getAs[Long]("n_docs") == 2 && s1.getAs[Long]("docs_email") == 1 &&
      s1.getAs[Long]("n_email") == 2 && s1.getAs[Long]("docs_url") == 1 &&
      s1.getAs[Long]("n_url") == 1 && s1.getAs[Long]("n_num") == 0)
    val s2 = got(1)
    assert(s2.getAs[Long]("docs_num") == 1 && s2.getAs[Long]("n_num") == 1 &&
      s2.getAs[Long]("n_email") == 0)
  }

  // --- skew report --------------------------------------------------------

  test("skewReport: share, skew factor, salt buckets on a hot key") {
    val df = (Seq.fill(90)(7L) ++ Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L, 10L, 11L))
      .toDF("k")
    val got = Joins.skewReport(df, $"k", topK = 3, targetRowsPerTask = 40).collect()
    assert(got.length == 3)
    val hot = got.head
    assert(hot.getLong(0) == 7L && hot.getLong(1) == 90L)
    assert(hot.getAs[Double]("share") == 0.9)
    assert(hot.getAs[Double]("skew_factor") == 9.9) // 90 * 11 keys / 100 rows
    assert(hot.getAs[Long]("salt_buckets") == 3) // ceil(90/40)
    // ties below the hot key break by key ascending
    assert(got(1).getLong(0) == 1L && got(2).getLong(0) == 2L)
  }
}
