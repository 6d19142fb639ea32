package graft

import org.apache.spark.sql.functions._

/** Round-11 operator wave: BM25 retrieval, exact KS drift, label
  * propagation, k-core, the exact prefix-filtered Jaccard join, and
  * last-touch attribution — each against a hand-checked or brute-force
  * driver reference.
  */
class Round11bSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: matches a driver-side reference with the same idf/tf-norm and rounded-score " +
      "ranking; docs hitting no query term are absent") {
    import graft.curation.Corpus
    val docs = Seq(
      (1L, "spark join window spark spark"),
      (2L, "join join join filter scan"),
      (3L, "window"),
      (4L, "filter scan table row"),
      (5L, "spark window join window")
    ).toDF("doc_id", "text")
    val got = Corpus.bm25(docs, col("text"), col("doc_id"),
        Seq("spark", "join", "window"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))

    // driver reference
    val toks = Map(
      1L -> Seq("spark", "join", "window", "spark", "spark"),
      2L -> Seq("join", "join", "join", "filter", "scan"),
      3L -> Seq("window"),
      4L -> Seq("filter", "scan", "table", "row"),
      5L -> Seq("spark", "window", "join", "window"))
    val n = 5.0
    val avgdl = toks.values.map(_.size).sum / n
    val dfm = Seq("spark", "join", "window").map(t =>
      t -> toks.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): (Double, Long) = {
      val ts = toks(id)
      val hits = Seq("spark", "join", "window").filter(ts.contains)
      val s = hits.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.size / avgdl))
      }.sum
      (BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, hits.size.toLong)
    }
    val want = Seq(1L, 2L, 3L, 5L).map(id => (id, score(id)))
      .sortBy { case (id, (s, _)) => (-s, id) }
      .take(3).zipWithIndex
      .map { case ((id, (s, h)), i) => (id, s, h, i + 1) }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    assert(!got.exists(_._1 == 4L), "doc 4 hits no query term")
  }

  test("ksDrift: hand-checked two-group statistic; identical groups score 0; " +
      "disjoint supports score 1; single-group corpus reports null") {
    import graft.curation.Corpus
    // A: values {1,1,2}; B: values {2,3} — CDFs sampled at 1,2,3:
    // A: 2/3, 1, 1 ; B: 0, 1/2, 1 → D(A vs rest=B) = 2/3
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3)).toDF("g", "v")
    val got = Corpus.ksDrift(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("a") == ((3L, 2L, 0.666667)), got.toString)
    assert(got("b") == ((2L, 3L, 0.666667)), got.toString)

    // identical distributions -> 0
    val same = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("g", "v")
    val g2 = Corpus.ksDrift(same, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g2 == Map("a" -> 0.0, "b" -> 0.0))

    // disjoint supports -> 1
    val disj = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val g3 = Corpus.ksDrift(disj, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g3 == Map("a" -> 1.0, "b" -> 1.0))

    // one group: complement empty -> null
    val solo = Corpus.ksDrift(Seq(("a", 1)).toDF("g", "v"), col("g"), col("v")).collect()
    assert(solo.length == 1 && solo(0).isNullAt(3))
  }

  test("labelPropagation: two cliques with one bridge collapse to per-clique min labels; " +
      "the bridge endpoints stay with their cliques; direction/dups/self-loops ignored") {
    import graft.graphs.Graphs
    // cliques {1,2,3} and {10,11,12}, bridge 3-10; noise: dup edge,
    // reversed edge, self loop
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L), (5L, 5L), (1L, 2L))
      .toDF("a", "b")
    val got = Graphs.labelPropagation(edges, $"a", $"b", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced 4 synchronous rounds: clique {1,2,3} settles on label 1;
    // the min-label tiebreak leaks 3's early label across the bridge
    // (round 1 gives 10 the min neighbor label 3; rounds 2-3 spread it),
    // so clique {10,11,12} settles on label 3 — deterministic, and the
    // same trace the unrolled oracle replays. The self-loop-only node 5
    // induces no edge and is absent.
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 3L, 11L -> 3L, 12L -> 3L),
      got.toString)
  }

  test("labelPropagation matches a driver-side synchronous reference on a pseudo-random graph") {
    import graft.graphs.Graphs
    val n = 30
    val raw = (0 until 90).map(i => ((i * 7 % n).toLong, ((i * i + 3) % n).toLong))
    val edges = raw.toDF("a", "b")
    val rounds = 4
    // driver reference
    val canon = raw.flatMap { case (a, b) =>
      if (a == b) None else Some((math.min(a, b), math.max(a, b)))
    }.distinct
    val adj = (canon ++ canon.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (v, nbrs) =>
        val counts = nbrs.map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        val best = counts.toSeq.maxBy { case (l, c) => (c, -l) }
        v -> best._1
      }
    }
    val got = Graphs.labelPropagation(edges, $"a", $"b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lab, s"got $got\nwant $lab")
  }

  test("kCore: pendant chain peels away, the 3-core keeps exactly the K4; " +
      "early exit returns the same core as a generous round cap") {
    import graft.graphs.Graphs
    // K4 {1,2,3,4} + chain 4-5-6-7 + pendant 1-8
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (1L, 8L)).toDF("a", "b")
    val core3 = Graphs.kCore(edges, $"a", $"b", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core3.toString)
    // a tight cap gives the same PREFIX the oracle's unrolled rounds give
    // (one synchronous peel drops 5,6,7,8 at once here; round 2 is stable)
    val capped = Graphs.kCore(edges, $"a", $"b", k = 3, maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == core3)
    // 2-core: the chain still peels (endpoints have degree 1), K4 survives
    val core2 = Graphs.kCore(edges, $"a", $"b", k = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(core2 == Set(1L, 2L, 3L, 4L))
    // k above the max degree: empty core
    assert(Graphs.kCore(edges, $"a", $"b", k = 9).isEmpty)
  }

  test("jaccardJoin: equals the brute-force all-pairs join at several thresholds — " +
      "prefix filtering loses nothing") {
    import graft.dedup.Dedup
    // overlapping vocab pools so real pairs exist at every threshold
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
      "iota", "kappa", "lambda", "mu")
    val docs = (0 until 24).map { i =>
      val k = 3 + i % 5
      val toks = (0 until k).map(j => words((i * 3 + j * (1 + i % 4)) % words.size))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")

    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = Dedup.jaccardJoin(docs, col("text"), col("doc_id"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // brute force on the driver
      val sets = docs.collect().map(r =>
        r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet).toMap
      val m = math.round(t * 10000).toInt
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size
        uni = sets(a).size + sets(b).size - inter
        if uni > 0 && inter * 10000 >= uni * m
      } yield (a, b, inter.toLong, uni.toLong)).toSet
      assert(got == want, s"t=$t: got ${got.size} pairs, want ${want.size}\n$got\n$want")
      assert(want.nonEmpty, s"t=$t: degenerate test — no qualifying pairs")
    }
  }

  test("connectedComponents: min-member labels on a multi-component graph; direction, " +
      "dups, and self-loops ignored; self-loop-only nodes absent") {
    import graft.graphs.Graphs
    val edges = Seq((5L, 3L), (3L, 7L), (10L, 11L), (11L, 10L), (20L, 20L), (5L, 3L))
      .toDF("a", "b")
    val got = Graphs.connectedComponents(edges, $"a", $"b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 10L -> 10L, 11L -> 10L), got.toString)
  }

  test("frequentPairs: hand-checked counts and lift; within-basket duplicates count once; " +
      "support filters; oversized baskets are dropped and reported") {
    import graft.operators.Baskets
    // baskets: {1,2,3} ×3, {1,2} ×1, {4,5} ×1, plus dup items in one basket
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 1L), // dup item 1
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 2L),
      (14L, 4L), (14L, 5L)
    ).toDF("b", "i")
    val got = Baskets.frequentPairs(rows, $"b", $"i", minSupport = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // n_baskets 5; c_1 = 4, c_2 = 4, c_3 = 3; pairs: (1,2)=4, (1,3)=3, (2,3)=3
    // lift(1,2) = 5·4/(4·4) = 1.25; lift(1,3) = 5·3/(4·3) = 1.25;
    // lift(2,3) = 5·3/(4·3) = 1.25; (4,5) support 1 < 3 filtered
    assert(got == Map(
      (1L, 2L) -> ((4L, 4L, 4L, 1.25)),
      (1L, 3L) -> ((3L, 4L, 3L, 1.25)),
      (2L, 3L) -> ((3L, 4L, 3L, 1.25))), got.toString)

    // a giant basket is dropped (its pairs AND its basket count) and shows
    // up in the observability readout
    val giant = (0 until 40).map(j => (99L, j.toLong)).toDF("b", "i")
    val capped = Baskets.frequentPairs(rows.unionByName(giant), $"b", $"i",
      minSupport = 3L, maxBasket = 10)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == got.keySet, "giant basket must not contribute pairs")
    val over = Baskets.oversizedBaskets(rows.unionByName(giant), $"b", $"i", maxBasket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(over.toSeq == Seq((99L, 40L)))
  }

  test("lastTouchAttribution: latest in-window touch wins; same-ts tiebreak; organic " +
      "conversions report null; out-of-window touches do not attribute") {
    import graft.operators.Sequences
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view, click, purchase -> click (latest touch)
      (1L, ts("2024-01-01 10:00:00"), "view", 100L),
      (1L, ts("2024-01-01 11:00:00"), "click", 101L),
      (1L, ts("2024-01-01 12:00:00"), "purchase", 102L),
      // user 2: touch 2 days before purchase -> out of 24h window
      (2L, ts("2024-01-01 00:00:00"), "view", 200L),
      (2L, ts("2024-01-03 00:00:00"), "purchase", 201L),
      // user 3: organic purchase, no touch at all
      (3L, ts("2024-01-01 09:00:00"), "purchase", 300L),
      // user 4: touch at the SAME timestamp as the purchase — smaller
      // event id orders it before the conversion, so it attributes
      (4L, ts("2024-01-01 08:00:00"), "click", 400L),
      (4L, ts("2024-01-01 08:00:00"), "purchase", 401L),
      // user 5: two purchases share the same last touch
      (5L, ts("2024-01-01 07:00:00"), "view", 500L),
      (5L, ts("2024-01-01 07:30:00"), "purchase", 501L),
      (5L, ts("2024-01-01 08:00:00"), "purchase", 502L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Sequences.lastTouchAttribution(ev, $"user_id", $"ts", $"event_type",
        $"event_id", "purchase", Seq("view", "click"), windowSeconds = 86400L)
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) "" else r.getString(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got(102L) == ((101L, "click", 3600L)))
    assert(got(201L) == ((-1L, "", -1L)), "48h-old touch must not attribute")
    assert(got(300L) == ((-1L, "", -1L)), "organic purchase")
    assert(got(401L) == ((400L, "click", 0L)), "same-ts smaller-id touch attributes")
    assert(got(501L) == ((500L, "view", 1800L)))
    assert(got(502L) == ((500L, "view", 3600L)))
    assert(got.size == 6)
  }
}
