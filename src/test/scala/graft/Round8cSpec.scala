package graft

import graft.curation.{Assembly, Corpus, Quantiles}
import graft.dedup.Dedup
import graft.operators.{Sequences, TimeSeries}
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

  // --- blocklistScreen ----------------------------------------------------

  test("blocklistScreen: per-doc hit/term counts, case-insensitive, clean docs absent") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "Bad things happen"),
      (2L, "all clean here"),
      (3L, "bad bad worse")
    ).toDF("doc_id", "text")
    val dict = Seq("bad", "worse", "worse").toDF("term") // dup must not double-count
    val got = TextFunctions.blocklistScreen(docs, $"text", $"doc_id", dict)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 1L), (3L, 3L, 2L)))
  }

  // --- winsorizeReport ----------------------------------------------------

  test("winsorizeReport: cuts at the type-1 quantiles, clip counts exact") {
    val df = (1 to 20).map(i => ("a", i.toDouble)).toDF("g", "v")
    val r = Quantiles.winsorizeReport(df, $"g", $"v", pLo = 0.1, pHi = 0.9)
      .collect().head
    assert(r.getAs[Long]("n") == 20)
    assert(r.getAs[Double]("lo_cut") == 2.0) // rank ceil(0.1*20)=2
    assert(r.getAs[Double]("hi_cut") == 18.0) // rank ceil(0.9*20)=18
    assert(r.getAs[Long]("n_lo") == 1) // v < 2
    assert(r.getAs[Long]("n_hi") == 2) // v > 18
    intercept[IllegalArgumentException] {
      Quantiles.winsorizeReport(df, $"g", $"v", pLo = 0.9, pHi = 0.1)
    }
  }

  // --- transitionCounts ---------------------------------------------------

  test("transitionCounts: consecutive pairs count, session gaps break the chain") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:00:10"), "b", 2L),
      (1L, ts("2024-01-01 11:00:00"), "c", 3L), // 59:50 after b: gap > 1800s
      (1L, ts("2024-01-01 11:00:05"), "a", 4L),
      (2L, ts("2024-01-01 10:00:00"), "a", 5L), // singleton key: no pairs
      (3L, ts("2024-01-01 10:00:00"), "a", 6L),
      (3L, ts("2024-01-01 10:00:01"), "b", 7L)
    ).toDF("k", "t", "s", "id")
    val got = Sequences.transitionCounts(df, $"k", $"t", $"s", 1800, Seq($"id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L), ("c", "a", 1L)))
  }

  test("transitionCounts: same-timestamp events order by the tiebreak") {
    val t0 = ts("2024-01-01 10:00:00")
    val df = Seq((1L, t0, "y", 2L), (1L, t0, "x", 1L)).toDF("k", "t", "s", "id")
    val got = Sequences.transitionCounts(df, $"k", $"t", $"s", 10, Seq($"id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("x", "y"))) // id order, not row order
    intercept[IllegalArgumentException] {
      Sequences.transitionCounts(df, $"k", $"t", $"s", 0)
    }
  }

  // --- funnel -------------------------------------------------------------

  test("funnelTimes/funnelReport: strict ordering, entry window, chain breaks stay null") {
    val df = Seq(
      // completes all three
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // click BEFORE the first view: step 2 never completes
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // click at the same instant as view: not strictly after
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // click 8 days after entry: outside the 7-day window
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-09 11:00:00"), "click")
    ).toDF("k", "t", "s")
    val steps = Seq("view", "click", "purchase")
    val times = graft.operators.Sequences.funnelTimes(
      df, $"k", $"t", $"s", steps, windowSeconds = Some(604800L))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(times.keySet == Set(1L, 2L, 3L, 4L)) // every entrant has a row
    assert(times(1L)._1.isDefined && times(1L)._2.isDefined)
    assert(times(2L) == ((None, None)))
    assert(times(3L) == ((None, None)))
    assert(times(4L) == ((None, None)))
    val rep = graft.operators.Sequences.funnelReport(
      df, $"k", $"t", $"s", steps, windowSeconds = Some(604800L)).collect().head
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) == ((4L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      graft.operators.Sequences.funnelTimes(df, $"k", $"t", $"s", Seq("a", "a"))
    }
  }

  test("funnelTimes picks the EARLIEST qualifying event per step, not any") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "click") // earlier qualifying click wins
    ).toDF("k", "t", "s")
    val r = graft.operators.Sequences.funnelTimes(
      df, $"k", $"t", $"s", Seq("view", "click")).collect().head
    assert(r.getTimestamp(2) == ts("2024-01-01 10:20:00"))
  }

  // --- retention ----------------------------------------------------------

  test("retention: cohort = first-event week, distinct users per offset") {
    // 2024-01-01 is a Monday: week boundaries are exact
    val df = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort W0
      (1L, ts("2024-01-16 10:00:00")), // W0 offset 2
      (1L, ts("2024-01-17 10:00:00")), // same week: still one distinct user
      (2L, ts("2024-01-10 10:00:00"))  // cohort W1
    ).toDF("k", "t")
    val got = graft.operators.Sequences.retention(df, $"k", $"t")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (ts("2024-01-01 00:00:00"), 0L, 1L),
      (ts("2024-01-01 00:00:00"), 2L, 1L),
      (ts("2024-01-08 00:00:00"), 0L, 1L)))
  }

  // --- invertedIndex ------------------------------------------------------

  test("invertedIndex: df, tf-ranked postings, topK and minDf cuts") {
    val df = Seq(
      (1L, "w w w rare"),
      (2L, "w w common"),
      (3L, "w common"),
      (4L, "w")
    ).toDF("doc_id", "text")
    val got = Corpus.invertedIndex(df, $"text", $"doc_id", topK = 2, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    // "w": df 4, top-2 postings doc1(tf3) then doc2(tf2);
    // "common": df 2, both kept (tf ties → doc_id ascending);
    // "rare": df 1 < minDf — cut
    assert(got == Set(
      ("w", 4L, 1L, 3L, 1), ("w", 4L, 2L, 2L, 2),
      ("common", 2L, 2L, 1L, 1), ("common", 2L, 3L, 1L, 2)))
  }

  // --- volumeTrend --------------------------------------------------------

  test("volumeTrend: OLS slope on daily counts, zero-filled gaps, null for single-day") {
    import graft.operators.TimeSeries
    val rows =
      // "up": 2, 4, 6 events on consecutive days → slope 2
      (1 to 2).map(_ => ("up", ts("2024-01-01 10:00:00"))) ++
      (1 to 4).map(_ => ("up", ts("2024-01-02 10:00:00"))) ++
      (1 to 6).map(_ => ("up", ts("2024-01-03 10:00:00"))) ++
      // "gap": 3 on day 0, silent day 1, 3 on day 2 → slope 0 (not -3!)
      (1 to 3).map(_ => ("gap", ts("2024-01-01 10:00:00"))) ++
      (1 to 3).map(_ => ("gap", ts("2024-01-03 10:00:00")))
    val got = TimeSeries.volumeTrend(rows.toDF("g", "t"), $"g", $"t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got("up") == ((3L, 12L, Some(2.0))))
    assert(got("gap") == ((3L, 6L, Some(0.0))))
    // a one-day span: no slope, loudly null (never a fake flat 0.0)
    val one = TimeSeries.volumeTrend(
      Seq(("x", ts("2024-01-01 10:00:00"))).toDF("g", "t"), $"g", $"t")
      .collect().head
    assert(one.isNullAt(3))
  }

  // --- kmvDistinctByGroup -------------------------------------------------

  test("kmvDistinctByGroup: each group equals the global sketch of its slice; states roll up") {
    import graft.functions.Sketches
    val rows = (1 to 200).map(i => ("big", s"item$i")) ++
      (1 to 2).map(i => ("small", s"s$i"))
    val df = rows.toDF("g", "item")
    val byG = Sketches.kmvDistinctByGroup(df, $"g", $"item", k = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (g <- Seq("big", "small")) {
      val solo = Sketches.kmvDistinct(df.where($"g" === g), $"item", k = 16)
        .collect().head
      assert(byG(g) == ((solo.getLong(0), solo.getLong(1), solo.getLong(2))), g)
    }
    assert(byG("small")._1 == 2L && byG("small")._3 == 2L) // under-k: exact
    // the per-group states union to the whole corpus's sketch
    val states = Sketches.kmvStateByGroup(df, $"g", $"item", k = 16)
      .select($"hashes")
    val merged = Sketches.kmvUnion(states, k = 16).collect().head
    val whole = Sketches.kmvDistinct(df, $"item", k = 16).collect().head
    assert((merged.getLong(0), merged.getLong(1), merged.getLong(2)) ==
      ((whole.getLong(0), whole.getLong(1), whole.getLong(2))))
  }

  // --- intervalAnti -------------------------------------------------------

  test("intervalAnti: points inside any interval are excluded; others survive") {
    import graft.operators.Joins
    val points = Seq(
      (1L, 7L, ts("2024-01-01 10:30:00")), // inside [10:00, 11:00)
      (2L, 7L, ts("2024-01-01 12:00:00")), // outside
      (3L, 8L, ts("2024-01-01 10:30:00")), // other key: no interval
      (4L, 7L, ts("2024-01-01 11:00:00"))  // AT the end bound: half-open, outside
    ).toDF("pid", "k", "t")
    val intervals = Seq(
      (100L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("iid", "ik", "s", "e")
    val got = Joins.intervalAnti(points, intervals, "pid", "k", "ik", "t",
      "s", "e", bucketMicros = 3600L * 1000000L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 4L))
  }

  // --- equiDepthBuckets ---------------------------------------------------

  test("equiDepthBuckets: value-boundary buckets, ties stay together, counts exact") {
    val df = ((1 to 8).map(v => ("a", v.toDouble)) ++ Seq(("a", 4.0), ("a", 4.0)))
      .toDF("g", "v") // values 1..8 plus two extra 4s (10 rows)
    val got = Quantiles.equiDepthBuckets(df, $"g", $"v", nBuckets = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // median cut (rank 5 of 1,2,3,4,4,4,5,6,7,8) = 4; bucket1 = v <= 4
    // (all three 4s together: 1,2,3,4,4,4), bucket2 = 5..8
    assert(got == Map(1 -> 6L, 2 -> 4L))
    intercept[IllegalArgumentException] {
      Quantiles.equiDepthBuckets(df, $"g", $"v", 1)
    }
  }

  // --- audioWindows -------------------------------------------------------

  test("audioWindows: overlapping full windows, modality dispatch, exact energy") {
    import graft.multimodal.Multimodal
    val docs = Seq(
      (1L, "abcdefgh", "en", "s", 8L),     // doc_id % 3 == 1 → audio
      (2L, "abcdefgh", "en", "s", 8L),     // video: ignored
      (4L, "abc", "en", "s", 3L),          // audio but shorter than a window
      (7L, "abcdefghijkl", "en", "s", 12L) // audio, 12 bytes
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // 4000 Hz × 1 B: win 2 ms = 8 bytes, hop 1 ms = 4 bytes — OVERLAPPING.
    // doc 1 (8 B): one full window. doc 7 (12 B): windows at 0 and 4; the
    // trailing 4 bytes never form a full window. doc 4: none.
    val got = Multimodal.audioWindows(
      Multimodal.fromDocuments(docs), sampleRate = 4000, bytesPerSample = 1,
      winMs = 2, hopMs = 1).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 0L, 0L), (7L, 0L, 0L), (7L, 1L, 4L)))
    // energy is the exact byte sum: 'a'..'h' = 97..104
    val e1 = got.find(r => r.getLong(0) == 1L).get.getLong(4)
    assert(e1 == (97 to 104).sum)
    // overlapping windows of the same payload share bytes: doc 7's two
    // windows hash differently but sum to overlapping ranges
    val e7 = got.filter(_.getLong(0) == 7L).map(_.getLong(4)).toSet
    assert(e7 == Set((97 to 104).sum.toLong, (101 to 108).sum.toLong))
    intercept[IllegalArgumentException] {
      // 1 ms at 8001 Hz is not a whole byte count
      Multimodal.audioWindows(Multimodal.fromDocuments(docs), 8001, 1, 1, 1)
    }
  }

  // --- compaction ---------------------------------------------------------

  test("fileStats sees the fragmentation; compact rewrites to the target file count") {
    import graft.sources.Storage
    val table = "graft_compact_t"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
    try {
      // 40 files of ~25 rows each — the fragmented shape
      spark.range(1000).toDF("id").repartition(40)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      val before = Storage.fileStats(spark, table).collect().head
      assert(before.getAs[Long]("n_files") == 40)
      assert(before.getAs[Long]("n_rows") == 1000)
      Storage.compact(spark, table, targetRowsPerFile = 500)
      val after = Storage.fileStats(spark, table).collect().head
      assert(after.getAs[Long]("n_files") == 2, after.toString)
      assert(after.getAs[Long]("n_rows") == 1000)
      // content survives exactly
      assert(spark.table(table).agg(sum($"id")).head().getLong(0) == 499500L)
      intercept[IllegalArgumentException] { Storage.compact(spark, table, 0) }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
    }
  }

  // --- asOfTolerance ------------------------------------------------------

  test("asOfTolerance: in-window match survives, stale match nulls out, forward mirrors") {
    import graft.operators.Joins
    val l = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 13:00:00")) // nearest prior is 3h old
    ).toDF("id", "k", "t")
    val r = Seq((7L, ts("2024-01-01 09:30:00"), 5.0)).toDF("rk", "rt", "v")
    val got = Joins.asOfTolerance(l, r, "k", "rk", "t", "rt", Seq("v"),
      toleranceMicros = 3600L * 1000000L)
      .collect().map(x => x.getLong(0) -> Option(x.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> Some(5.0), 2L -> None)) // 30 min ok; 3.5 h stale
    val fwd = Joins.asOfTolerance(l, r, "k", "rk", "t", "rt", Seq("v"),
      toleranceMicros = 60L * 1000000L, direction = "forward")
      .collect().map(x => x.getLong(0) -> Option(x.get(4))).toMap
    assert(fwd(1L).isEmpty && fwd(2L).isEmpty) // no right row ahead within 60 s
    intercept[IllegalArgumentException] {
      Joins.asOfTolerance(l, r, "k", "rk", "t", "rt", Seq("v"), 0L)
    }
  }

  // --- gapFillLinear ------------------------------------------------------

  test("gapFillLinear: interior interpolation exact, edges null, observed slots untouched") {
    import graft.operators.TimeSeries
    val df = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 03:20:00"), 40.0)
    ).toDF("k", "t", "v")
    val got = TimeSeries.gapFillLinear(df, $"k", $"t", $"v", stepSeconds = 3600)
      .orderBy($"slot")
      .collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Double])).toSeq
    // slots 00..03; obs at 00 (10.0) and 03 (40.0); linear at 01, 02
    assert(got == Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0)))
    // leading gap: a key whose first slot precedes its first obs cannot
    // exist (grid starts at first obs) — trailing/leading nulls only
    // arise with distinct obs columns; check the observed slot passes
    // raw v_obs through, not a rounded copy
    val r = TimeSeries.gapFillLinearReport(
      df, $"k", $"t", $"v", 3600, "2024-01-01 01:00:00").collect().head
    assert(r.getAs[Long]("n_slots") == 4 && r.getAs[Long]("n_obs") == 2)
    assert(r.getAs[Long]("n_interp") == 2)
    assert(r.getAs[Double]("v_probe") == 20.0)
  }

  // --- applyChanges -------------------------------------------------------

  test("applyChanges: latest-wins upserts, deletes drop, change wins version ties") {
    import graft.sources.Storage
    val snap = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00")),
      (3L, "c", ts("2024-01-05 00:00:00")) // NEWER than its change: snapshot wins
    ).toDF("k", "v", "ver")
    val chg = Seq(
      (1L, "a2", ts("2024-01-02 00:00:00"), "upsert"), // newer: replaces
      (2L, "x", ts("2024-01-02 00:00:00"), "delete"),  // newer: drops key 2
      (3L, "c2", ts("2024-01-03 00:00:00"), "upsert"), // older: ignored
      (4L, "d", ts("2024-01-02 00:00:00"), "upsert")   // brand-new key
    ).toDF("k", "v", "ver", "op")
    val got = Storage.applyChanges(snap, chg, $"k", $"ver")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (3L, "c"), (4L, "d")))
    // idempotent replay: applying the same batch to the result converges
    val again = Storage.applyChanges(
      Storage.applyChanges(snap, chg, $"k", $"ver"), chg, $"k", $"ver")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got)
    // exact version tie between snapshot and change: the change wins
    val tieChg = Seq((3L, "c3", ts("2024-01-05 00:00:00"), "upsert"))
      .toDF("k", "v", "ver", "op")
    val tied = Storage.applyChanges(snap, tieChg, $"k", $"ver")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(tied(3L) == "c3")
  }

  // --- sessionize ---------------------------------------------------------

  test("sessionize labels every event; strictly-greater gap starts a new session") {
    import graft.operators.Windows
    val df = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1L),
      (7L, ts("2024-01-01 10:30:00"), 2L), // gap == 1800: SAME session
      (7L, ts("2024-01-01 11:00:01"), 3L), // gap 1801: new session
      (8L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("k", "t", "id")
    val got = Windows.sessionize(df, $"k", $"t", 1800, Seq($"id"))
      .collect().map(r => r.getLong(2) -> r.getAs[Long]("session_seq")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    intercept[IllegalArgumentException] { Windows.sessionize(df, $"k", $"t", 0) }
  }

  // --- coverageCurve ------------------------------------------------------

  test("coverageCurve: one-pass OOV sweep over vocab-size cuts") {
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text") // ranks: a=1, b=2
    val batch = Seq((2L, "a a b c")).toDF("doc_id", "text")
    val vocab = Corpus.vocabulary(ref, $"text", $"doc_id", topN = 10)
    val got = Corpus.coverageCurve(batch, $"text", $"doc_id", vocab, Seq(1, 2))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1) == ((4L, 2L, 0.5)))  // only 'a' covered: b+c OOV
    assert(got(2) == ((4L, 1L, 0.25))) // 'c' never in vocab
    intercept[IllegalArgumentException] {
      Corpus.coverageCurve(batch, $"text", $"doc_id", vocab, Seq(2, 1))
    }
  }

  // --- bucketed funnel (the zero-exchange scale path) ----------------------

  test("funnelTimes over a user-bucketed events table plans ZERO exchanges") {
    import graft.sources.Storage
    val events = (1L to 200L).flatMap(u => Seq(
      (u, ts("2024-01-01 10:00:00"), "view"),
      (u, ts("2024-01-01 10:05:00"), "click")
    )).toDF("k", "t", "s")
    Storage.writeBucketed(events, "graft_bkt_funnel", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = graft.operators.Sequences.funnelTimes(
        spark.table("graft_bkt_funnel"), $"k", $"t", $"s", Seq("view", "click"))
      val plan = f.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed funnel still shuffles:\n$plan")
      assert(f.where($"t2".isNotNull).count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_funnel")
    }
  }

  // --- psiDrift -----------------------------------------------------------

  test("psiDrift: hand-checked terms, add-half smoothing, clamped edge bins") {
    val ref = Seq(10.0, 10.0, 10.0, 30.0).toDF("v") // bins(0)=3, bins(1)=1
    val cur = Seq(10.0, 30.0, 30.0, 30.0, -5.0).toDF("v") // -5 clamps to bin 0
    val got = graft.curation.Corpus.psiDrift(
      ref, $"v", cur, $"v", bins = 2, lo = 0.0, hi = 40.0)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    assert(got.size == 2)
    assert(got(0)._1 == 3L && got(0)._2 == 2L) // 10,10,10 | 10,-5
    assert(got(1)._1 == 1L && got(1)._2 == 3L)
    def term(nr: Long, nc: Long, tr: Long, tc: Long): Double = {
      val p = (nr + 0.5) / (tr + 1.0); val q = (nc + 0.5) / (tc + 1.0)
      math.round((q - p) * math.log(q / p) * 1e6) / 1e6 + 0.0
    }
    assert(got(0)._3 == term(3, 2, 4, 5))
    assert(got(1)._3 == term(1, 3, 4, 5))
    // identical distributions: every term is exactly 0.0 (and never -0.0)
    val same = graft.curation.Corpus.psiDrift(
      ref, $"v", ref, $"v", bins = 4, lo = 0.0, hi = 40.0)
      .collect().map(_.getDouble(5))
    assert(same.forall(t => t == 0.0 && t.toString == "0.0"))
    intercept[IllegalArgumentException] {
      graft.curation.Corpus.psiDrift(ref, $"v", cur, $"v", 1, 0.0, 1.0)
    }
  }

  // --- clusterSizeProfile -------------------------------------------------

  test("clusterSizeProfile: histogram of cluster sizes") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // one 3-cluster
      (4L, 4L), (5L, 5L)            // two singletons
    ).toDF("doc_id", "cluster_id")
    val got = Dedup.clusterSizeProfile(clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 1L), (1L, 2L)))
  }

  // --- seasonalAnomaly ----------------------------------------------------

  test("seasonalAnomaly: empty buckets count zero and score; formula hand-checked") {
    // type e: 4 events at hour 0, 2 at hour 1, silent elsewhere
    val rows = Seq.fill(4)(("e", ts("2024-01-01 00:10:00"))) ++
      Seq.fill(2)(("e", ts("2024-01-01 01:10:00")))
    val df = rows.toDF("g", "t")
    val got = TimeSeries.seasonalAnomaly(df, $"g", $"t")
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(4)))).toMap
    assert(got.size == 24) // the silent hours are rows, not absences
    val mean = 6.0 / 24
    val variance = (20.0 - 6.0 * 6.0 / 24) / 24
    def z(c: Long) = math.round(((c - mean) / math.sqrt(variance)) * 10000) / 10000.0
    assert(got(0) == ((4L, z(4))))
    assert(got(1) == ((2L, z(2))))
    assert(got(5) == ((0L, z(0))))
  }

  test("seasonalAnomaly: flat profile has zero variance and all-zero z") {
    val rows = (0 until 24).map(h => ("f", ts(f"2024-01-01 $h%02d:30:00")))
    val got = TimeSeries.seasonalAnomaly(rows.toDF("g", "t"), $"g", $"t").collect()
    assert(got.length == 24 && got.forall(r => r.getDouble(4) == 0.0))
    // and the z string form is "0.0", never "-0.0" (the driver's hash
    // compare distinguishes them)
    assert(got.forall(r => r.getDouble(4).toString == "0.0"))
  }
}
