package graft

import graft.curation.Corpus
import graft.dedup.Dedup
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the corpus-statistics stage (vocabulary, TF-IDF, surprisal),
  * int8 quantization, and cross-document shared-span detection.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("versionDiff labels all four statuses; diff against self is all-unchanged") {
    val oldV = docs(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    val newV = docs(2L -> "beta", 3L -> "gamma EDITED", 4L -> "delta")
    val d = Corpus.versionDiff(oldV, newV, col("doc_id"), md5(col("text")))
      .as[(Long, String)].collect().toMap
    assert(d == Map(1L -> "removed", 2L -> "unchanged", 3L -> "modified", 4L -> "added"))
    // reflexivity: a version diffed against itself is pure unchanged
    val self = Corpus.versionDiff(oldV, oldV, col("doc_id"), md5(col("text")))
    assert(self.where(col("status") =!= "unchanged").count() == 0)
    // hash choice is the caller's: normalize-then-hash ignores case churn
    val reformatted = docs(1L -> "ALPHA", 2L -> "beta", 3L -> "gamma")
    val norm = Corpus.versionDiff(oldV, reformatted, col("doc_id"),
      md5(graft.functions.TextFunctions.normalize(col("text"))))
    assert(norm.where(col("status") =!= "unchanged").count() == 0)
  }

  test("vocabulary: counts conserve tokens, rank is the deterministic top-N cut") {
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "the dog sat",
      3L -> "a cat and a dog")
    val v = Corpus.vocabulary(d, col("text"), col("doc_id"), topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // total tokens = 6 + 3 + 5 = 14; top-3 by (tf desc, term asc):
    // "the" tf=3 df=2; then tf=2 terms alphabetically: "a"(1 doc), "cat"(2), "dog"(2), "sat"(2) → "a", "cat"
    assert(v.toSeq == Seq(("the", 3L, 2L, 1), ("a", 2L, 1L, 2), ("cat", 2L, 2L, 3)))
    val full = Corpus.vocabulary(d, col("text"), col("doc_id"), topN = 1000)
    assert(full.agg(sum("tf")).as[Long].head() == 14L)
    // df never exceeds the doc count and rank is contiguous from 1
    assert(full.where(col("df") > 3).isEmpty)
    val ranks = full.select("rank").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to ranks.length))
  }

  test("tfidf: corpus-wide terms score zero-ish, rare terms win; k rows per doc") {
    val d = docs(
      1L -> "common rare1 common",
      2L -> "common rare2",
      3L -> "common rare3")
    val t = Corpus.tfIdf(d, col("text"), col("doc_id"), k = 1)
    val top = t.select("doc_id", "term").as[(Long, String)].collect().toMap
    // "common" is in every doc (df=3 → idf=ln(4/4)=0); each rareN is unique
    assert(top == Map(1L -> "rare1", 2L -> "rare2", 3L -> "rare3"))
    val k2 = Corpus.tfIdf(d, col("text"), col("doc_id"), k = 2)
    assert(k2.groupBy("doc_id").count().where(col("count") > 2).isEmpty)
    // the df=3 term's smoothed idf is exactly ln(1) = 0 → tfidf 0
    assert(k2.where(col("term") === "common" && col("tfidf") =!= 0.0).isEmpty)
  }

  test("surprisal: boilerplate scores low bits, rare vocabulary scores high; empty doc is 0/0") {
    val d = docs(
      1L -> "x x x x x x x x",
      2L -> "unique1 unique2 unique3 unique4",
      3L -> "")
    val s = Corpus.unigramSurprisal(d, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val (n1, b1) = s(1L); val (n2, b2) = s(2L); val (n3, b3) = s(3L)
    assert(n1 == 8L && n2 == 4L && n3 == 0L)
    assert(b3 == 0.0)
    // total=12; "x" has cnt 8 → surprisal log2(12/8); uniqueN → log2(12)
    assert(math.abs(b1 - math.log(12.0 / 8) / math.log(2)) < 1e-3)
    assert(math.abs(b2 - math.log(12.0) / math.log(2)) < 1e-3)
    assert(b2 > b1)
  }

  test("quantizeInt8: codes fit int8, dequantization error is bounded by scale/2") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(100.0f, -50.0f, 0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.select(
      col("vec_id"),
      col("embedding"),
      VectorFunctions.int8Scale(col("embedding")).as("scale"),
      VectorFunctions.quantizeInt8(col("embedding")).as("codes"))
    val rows = q.collect()
    for (r <- rows) {
      val emb = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val codes = r.getSeq[Long](3)
      assert(codes.forall(c => math.abs(c) <= 127), s"codes out of int8 range: $codes")
      if (scale == 0.0) assert(codes.forall(_ == 0L))
      else emb.zip(codes).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12)
      }
    }
    // round-trip through the dequantize expression agrees with the law above
    val err = q.where(col("scale") > 0).select(
      aggregate(
        zip_with(
          VectorFunctions.dequantizeInt8(col("codes"), col("scale")),
          col("embedding"),
          (a, b) => abs(a - b.cast("double"))),
        lit(0.0), (acc, v) => greatest(acc, v)).as("max_err"),
      col("scale"))
    assert(err.where(col("max_err") > col("scale") / 2 + 1e-12).isEmpty)
  }

  test("quantizedTopK: high recall against exact search; scores within quantization error") {
    import graft.similarity.KNN
    // deterministic corpus: 60 vectors on a few directions + index-seeded noise
    val vecs = (0 until 60).map { i =>
      val base = i % 4
      (i.toLong, Array.tabulate(16) { j =>
        val noise = ((i * 31 + j * 17) % 13 - 6) / 100.0f
        (if (j % 4 == base) 1.0f else 0.1f) + noise
      })
    }.toDF("vec_id", "embedding")
    val queries = vecs.where(col("vec_id") < 3)
    val exact = KNN.bruteForceTopK(vecs, queries, col("vec_id"), col("embedding"), k = 5)
    val quant = KNN.quantizedTopK(vecs, queries, col("vec_id"), col("embedding"), k = 5)
    assert(quant.groupBy("q_id").count().where(col("count") =!= 5).isEmpty)
    assert(quant.where(col("cosine") > 1.0 || col("cosine") < -1.0).isEmpty)
    val recall = KNN.recallAtK(exact, quant)
      .where(col("q_id") === -1L).select("recall").as[Double].head()
    assert(recall >= 0.8, s"quantized recall@5 too low: $recall")
    // int8 absmax on 16 dims: quantized cosine within 0.05 of exact
    val joined = exact.select(col("q_id"), col("n_id"), col("cosine").as("c_exact"))
      .join(quant.select(col("q_id"), col("n_id"), col("cosine").as("c_quant")), Seq("q_id", "n_id"))
    assert(joined.where(abs(col("c_exact") - col("c_quant")) > 0.05).isEmpty)
  }

  test("boilerplateScore: templated docs score high, original text scores 0, short docs are 0/0") {
    val template = "=== COMPANY CONFIDENTIAL boilerplate header v2 ==="
    val d = docs(
      1L -> s"$template tiny unique bit one",
      2L -> s"$template another small unique tail",
      3L -> "entirely original prose with no repeated content whatsoever in it",
      4L -> "short") // < n + w - 1 bytes: no full winnow window
    val b = Dedup.boilerplateScore(d, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(b.keySet == Set(1L, 2L, 3L, 4L), "every doc must be scored")
    val (f1, s1, frac1) = b(1L)
    assert(f1 > 0 && s1 > 0 && frac1 > 0.4, s"templated doc should score high: $frac1")
    assert(b(3L)._3 == 0.0, "original doc must score 0")
    assert(b(4L) == ((0L, 0L, 0.0)), "too-short doc reports no fingerprints")
  }

  test("sharedSpans: a substring of length >= n+w-1 shared by two docs is detected") {
    val shared = "0123456789AB" // 12 bytes >= n + w - 1 = 11
    val d = docs(
      1L -> s"left padding $shared and some tail",
      2L -> s"totally different prefix $shared",
      3L -> "no overlap with anything else here at all")
    val spans = Dedup.sharedSpans(d, col("text"), col("doc_id"), n = 8, w = 4, minDocs = 2)
    val carriers = spans.select("first_doc").as[Long].collect()
    assert(spans.count() >= 1, "the planted shared span was not detected")
    assert(carriers.forall(_ == 1L), "first_doc must be the smallest carrier id")
    assert(spans.where(col("n_docs") < 2).isEmpty)
    // doc 3 shares nothing: no fingerprint counts it
    val withDoc3 = Dedup.winnowingFingerprints(d.where(col("doc_id") === 3), col("text"), col("doc_id"))
      .select("fingerprint")
      .intersect(spans.select("fingerprint"))
    assert(withDoc3.isEmpty)
  }

  test("histogram: counts conserve rows, cum_frac is monotone to 1, floor bins negatives") {
    val df = Seq(-7L, -1L, 0L, 3L, 9L, 10L, 10L, 25L, 999L).toDF("m")
    val h = Corpus.histogram(df, col("m"), binWidth = 10L)
      .orderBy("bin_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(h.map(_._2).sum == 9L)
    assert(h.map(_._1).toSeq == Seq(-10L, 0L, 10L, 20L, 990L)) // floor, not trunc
    assert(h.head == ((-10L, 2L, 0.222222))) // -7 and -1 both bin at [-10, 0)
    assert(h.map(_._3).toSeq == h.map(_._3).sorted.toSeq && h.last._3 == 1.0)
    intercept[IllegalArgumentException] { Corpus.histogram(df, col("m"), 0L) }
  }

  test("histogram drops null measures so counts conserve and cum_frac still ends at 1.0") {
    // null measures (e.g. null text making wsTokenCount null) previously
    // vanished from the cumulative join but still counted toward the
    // total — cum_frac never reached 1.0
    val df = Seq(Some(1L), None, Some(11L), None, Some(21L)).toDF("m")
    val h = Corpus.histogram(df, col("m"), binWidth = 10L)
      .orderBy("bin_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(h.map(_._1).toSeq == Seq(0L, 10L, 20L)) // no null bin row
    assert(h.map(_._2).sum == 3L)                  // nulls excluded from counts...
    assert(h.last._3 == 1.0)                       // ...and from the denominator
  }

  test("bigramSurprisal: common words in novel order score high, repeated text low, short docs 0") {
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat", // exact repeat: every bigram has corpus count >= 2
      3L -> "mat the sat cat on the", // same words, novel order: common prefixes, unseen combos
      4L -> "single",                 // no bigram
      5L -> null.asInstanceOf[String])
    val out = Corpus.bigramSurprisal(d, col("text"), col("doc_id"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(4L) == ((0L, 0.0)) && out(5L) == ((0L, 0.0)))
    assert(out(1L) == out(2L)) // identical docs, identical scores
    assert(out(3L)._2 > out(1L)._2, s"word salad ${out(3L)} must out-surprise boilerplate ${out(1L)}")
    assert(out(1L)._1 == 5L && out(3L)._1 == 5L) // 6 tokens -> 5 bigrams
  }

  test("quantileFromBins reads thresholds off the cumulative histogram; None when unreachable") {
    val df = (1L to 100L).toDF("m")
    val hist = Corpus.histogram(df, col("m"), binWidth = 10L)
    assert(Corpus.quantileFromBins(hist, 0.10).contains(10L)) // first bin reaching 10%: [10,20)
    assert(Corpus.quantileFromBins(hist, 1.0).contains(100L)) // the last bin ([100,110) holds m=100)
    val empty = Corpus.histogram(df.where(col("m") < 0), col("m"), 10L)
    assert(Corpus.quantileFromBins(empty, 0.5).isEmpty)
    intercept[IllegalArgumentException] { Corpus.quantileFromBins(hist, 0.0) }
  }

  test("histogramFromBins calibrates from pre-aggregated bins — no corpus re-scan") {
    val df = Seq(1L, 5L, 11L, 15L, 21L).toDF("m")
    // a pipeline computes bins ONCE where the filtered rows are in hand
    // (or unions persisted increments) and feeds them back in
    val bins = Corpus.binCounts(df, col("m"), binWidth = 10L)
    val fromBins = Corpus.histogramFromBins(bins)
      .orderBy("bin_lo").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val direct = Corpus.histogram(df, col("m"), binWidth = 10L)
      .orderBy("bin_lo").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fromBins.toSeq == direct.toSeq)
    assert(fromBins.last._3 == 1.0)
  }

  test("pmiCollocations: hand-computed PMI, minCount floor, deterministic tie cut") {
    // 6× "alpha beta gamma delta" + 2× "beta alpha delta gamma".
    // Bigram counts: (alpha beta)=(beta gamma)=(gamma delta)=6;
    // (beta alpha)=(alpha delta)=(delta gamma)=2; N=24. minCount=5 keeps
    // only the three 6-count bigrams:
    //   PMI(alpha beta)  = log2(6·24 / (8·6)) = log2(3)    [alpha· = 6+2]
    //   PMI(beta gamma)  = log2(6·24 / (8·8)) = log2(2.25) [·gamma = 6+2]
    //   PMI(gamma delta) = log2(6·24 / (6·8)) = log2(3)    [·delta = 6+2]
    // — a top-1 TIE on rounded pmi, broken by bigram asc ("alpha beta").
    val d = docs(
      (1L to 6L).map(i => i -> "alpha beta gamma delta") :+
        (7L -> "beta alpha delta gamma") :+ (8L -> "beta alpha delta gamma"): _*)
    val out = Corpus.pmiCollocations(d, col("text"), minCount = 5, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq(("alpha beta", 6L), ("gamma delta", 6L), ("beta gamma", 6L)))
    assert(out(0)._3 == r4(log2(3.0)) && out(1)._3 == r4(log2(3.0)))
    assert(out(2)._3 == r4(log2(2.25)))
    intercept[IllegalArgumentException] { Corpus.pmiCollocations(d, col("text"), minCount = 0) }
  }

  test("sourceDivergence: hand-computed KL, symmetry of mirrored sources, zero for the blend") {
    // source a: tokens (x,x,y); source b: (x,y,y). Corpus: x=3, y=3 →
    // P = (1/2, 1/2). Both sources are mirrored 2/3-1/3 splits, so
    //   KL = 2/3·log2((2/3)/(1/2)) + 1/3·log2((1/3)/(1/2))
    // identical for both. A source matching the blend exactly scores 0.
    val d = Seq(
      (1L, "x x y", "a"), (2L, "x y y", "b"), (3L, "x y x y", "c")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.sourceDivergence(d, col("text"), col("source"))
      .as[(String, Long, Double)].collect().toSeq
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val kl = BigDecimal(2.0 / 3 * log2(4.0 / 3) + 1.0 / 3 * log2(2.0 / 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(("a", 3L, kl), ("b", 3L, kl), ("c", 4L, 0.0)))
    assert(kl > 0.0) // KL against a covering mixture is finite and ≥ 0
  }

  test("qualityFunnel: per-rule fail counts, any_rule, pass_all on crafted docs") {
    val d = docs(
      // 5 tokens, mean len 2.8, stop ratio 2/5, distinct 5/5, lang en -> passes all
      1L -> "the cat sat on mat",
      // 2 tokens -> too_short; no stopwords -> low_stopword; no markers -> "und" -> non_english
      2L -> "hi yo",
      // 7 tokens -> too_long; 1 distinct -> repetitive (6/7 > 0.4); "the" keeps lang en + stop ratio 1
      3L -> "the the the the the the the")
    val out = Corpus.qualityFunnel(
      d, col("text"),
      minTokens = 3, maxTokens = 6, avgTokLenBand = (2.0, 5.0),
      minStopRatio = 0.2, maxRepeatRatio = 0.4)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("too_short") == ((1L, 0.3333)), out.toString)
    assert(out("too_long") == ((1L, 0.3333)))
    assert(out("word_length") == ((0L, 0.0)))
    assert(out("non_english") == ((1L, 0.3333)))
    assert(out("low_stopword") == ((1L, 0.3333)))
    assert(out("repetitive") == ((1L, 0.3333)))
    // doc 2 fails three rules but counts once; doc 1 survives everything
    assert(out("any_rule") == ((2L, 0.6667)))
    assert(out("pass_all") == ((1L, 0.3333)))
    // the funnel is exactly the rule rows + the two rollups
    assert(out.size == 8)
  }

  test("qualityFunnelBySource: per-source counts; shares are per-source; sums match global") {
    val d = Seq(
      (1L, "the cat sat on mat", "srcA"),       // passes all
      (2L, "hi yo", "srcB"),                    // too_short + low_stopword + non_english
      (3L, "the the the the the the the", "srcB") // too_long + repetitive
    ).toDF("doc_id", "text", "source")
    val per = Corpus.qualityFunnelBySource(
      d, col("text"), col("source"),
      minTokens = 3, maxTokens = 6, avgTokLenBand = (2.0, 5.0),
      minStopRatio = 0.2, maxRepeatRatio = 0.4)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // srcA: one doc, passes everything
    assert(per(("srcA", "pass_all")) == ((1L, 1.0)))
    assert(per(("srcA", "any_rule")) == ((0L, 0.0)))
    // srcB: both docs fail something; shares are over the SOURCE total (2)
    assert(per(("srcB", "too_short")) == ((1L, 0.5)))
    assert(per(("srcB", "too_long")) == ((1L, 0.5)))
    assert(per(("srcB", "any_rule")) == ((2L, 1.0)))
    assert(per(("srcB", "pass_all")) == ((0L, 0.0)))
    // 2 sources × 8 rows, and per-rule counts sum to the global funnel
    assert(per.size == 16)
    val global = Corpus.qualityFunnel(
      d, col("text"),
      minTokens = 3, maxTokens = 6, avgTokLenBand = (2.0, 5.0),
      minStopRatio = 0.2, maxRepeatRatio = 0.4)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    global.foreach { case (rule, n) =>
      assert(per(("srcA", rule))._1 + per(("srcB", rule))._1 == n, rule)
    }
  }

  test("surprisalAgainst: frozen-LM scoring with OOV ceiling; bucketed-table deltas equal inline") {
    val ref = docs(1L -> "the cat sat", 2L -> "the dog sat")
    // LM: the:2 cat:1 sat:2 dog:1 → T=6, V=4, denominator 10
    val lm = Corpus.termCounts(ref, col("text"))
    val batch = docs(10L -> "the the", 11L -> "zebra", 12L -> "")
    val out = Corpus.surprisalAgainst(batch, col("text"), col("doc_id"), lm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(10L) == ((2L, 1.737)))   // -log2((2+1)/10)
    assert(out(11L) == ((1L, 3.3219)))  // OOV ceiling: log2(T+V)
    assert(out(12L) == ((0L, 0.0)))     // zero-token doc
    // OOV scores the ceiling — strictly above any in-vocabulary term
    assert(out(11L)._2 > out(10L)._2)

    // an EMPTY LM must fail loudly, not score the whole batch a silent
    // 0.0 (the bootstrap data-loss class)
    val emptyLm = lm.where(lit(false))
    val ex = intercept[Exception] {
      Corpus.surprisalAgainst(batch, col("text"), col("doc_id"), emptyLm).collect()
    }
    assert(ex.getMessage.contains("EMPTY") || ex.getCause.getMessage.contains("EMPTY"))

    // persisted path: two DELTA appends aggregate to the same LM, and
    // scoring against the table equals scoring against the inline LM
    val tbl = "graft_test_frozen_lm"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      Corpus.saveTermCounts(docs(1L -> "the cat sat"), col("text"), tbl, buckets = 4)
      Corpus.saveTermCounts(docs(2L -> "the dog sat"), col("text"), tbl, buckets = 4)
      val fromTable = Corpus.termCountsFromTable(spark, tbl)
      val inline = lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fromTable.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == inline)
      val viaTable = Corpus.surprisalAgainst(batch, col("text"), col("doc_id"), fromTable)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(viaTable == out)
      // the scoring join plans no exchange on the bucketed LM side: the
      // only Exchange below the join is on the batch's term explode
      val plan = Corpus.surprisalAgainst(batch, col("text"), col("doc_id"), fromTable)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("dedupSegments: first occurrences kept in order; idempotent; delimiter-generic") {
    import graft.functions.TextFunctions
    val d = Seq(
      (1L, "a b a c b a"),
      (2L, "x x x"),
      (3L, "unique words only"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextFunctions.dedupSegments(col("text"), " ").as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "a b c")
    assert(out(2L) == "x")
    assert(out(3L) == "unique words only")
    assert(out(4L) == "")
    // idempotence: deduped text passes through unchanged
    val again = d.select(col("doc_id"),
      TextFunctions.dedupSegments(
        TextFunctions.dedupSegments(col("text"), " "), " ").as("t"))
      .as[(Long, String)].collect().toMap
    assert(again == out)
    // line-granularity production form
    val lines = Seq((1L, "intro\nbody\nintro\nfooter")).toDF("doc_id", "text")
      .select(TextFunctions.dedupSegments(col("text")).as("t")).as[String].head()
    assert(lines == "intro\nbody\nfooter")
  }

  test("vocabCoverage: OOV tokens counted with multiplicity; duplicate vocab rows don't double-count") {
    val vocab = Seq("the", "cat", "the").toDF("term") // deliberate duplicate
    val d = docs(1L -> "the cat", 2L -> "the dog dog", 3L -> "")
    val out = Corpus.vocabCoverage(d, col("text"), col("doc_id"), vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0L, 0.0)))          // fully covered
    assert(out(2L) == ((3L, 2L, 0.6667)))       // "dog" twice counts twice
    assert(out(3L) == ((0L, 0L, 0.0)))          // empty doc: 0 over 0
    // rate is monotone in coverage: adding "dog" to the vocab drops doc 2's rate to 0
    val wider = Corpus.vocabCoverage(d, col("text"), col("doc_id"),
      vocab.union(Seq("dog").toDF("term")))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(wider(2L) == 0.0)
  }

  test("zipfFit: exact slope/intercept on a constructed power law; degenerate fit is null") {
    // tf 8 at rank 1 (x=0, y=3) and tf 4 at rank 2 (x=1, y=2): slope −1,
    // intercept 3 — exact by construction
    val d = docs(1L -> (("a " * 8) + ("b " * 4)).trim)
    val fit = Corpus.zipfFit(d, col("text"), col("doc_id"), topN = 2).head()
    assert(fit.getLong(0) == 2L)
    assert(fit.getDouble(1) == -1.0 && fit.getDouble(2) == 3.0)
    // a steeper corpus (tf 16 vs 2) fits a steeper slope
    val steep = Corpus.zipfFit(
      docs(1L -> (("a " * 16) + ("b " * 2)).trim), col("text"), col("doc_id"), topN = 2).head()
    assert(steep.getDouble(1) < fit.getDouble(1))
    // single-term corpus: zero rank variance → null fit, not ±Inf
    val degen = Corpus.zipfFit(docs(1L -> "solo solo solo"), col("text"), col("doc_id"), topN = 5).head()
    assert(degen.getLong(0) == 1L && degen.isNullAt(1) && degen.isNullAt(2))
  }

  test("importanceWeights: hand-computed JM log-ratios; empty doc and empty target are neutral") {
    val d = Seq(
      (1L, "aa aa", true),   // the target distribution: all aa
      (2L, "aa bb", false),
      (3L, "bb bb", false),
      (4L, "", false)
    ).toDF("doc_id", "text", "tgt")
    val w = Corpus.importanceWeights(d, col("text"), col("doc_id"), col("tgt"), lambda = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // c_raw: aa=3 bb=3, T_raw=6; c_tgt: aa=2 bb=0, T_tgt=2
    // lr(aa) = log2(0.5 + 0.5·(2·6)/(3·2)) = log2(1.5) = 0.5849625
    // lr(bb) = log2(0.5 + 0)               = -1
    assert(w(1L) == ((2L, 0.585)))                    // pure target vocabulary
    assert(w(2L) == ((2L, round2((0.5849625 - 1.0) / 2, 4))))  // mixed
    assert(w(3L) == ((2L, -1.0)))                     // pure anti-target
    assert(w(4L) == ((0L, 0.0)))                      // empty doc: 0 over 0
    // target-likeness orders the scores
    assert(w(1L)._2 > w(2L)._2 && w(2L)._2 > w(3L)._2)
    // no target rows ⇒ no target LM ⇒ every score neutral 0, not the floor
    val none = Corpus.importanceWeights(d, col("text"), col("doc_id"), lit(false))
    assert(none.where(col("log_ratio") =!= 0.0).isEmpty)
  }

  private def round2(v: Double, p: Int): Double =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("importanceResample: deterministic, k-bounded, and weight-monotone") {
    val rows = (1L to 40L).map { i =>
      val text = if (i % 2 == 0) "target target words" else "filler noise junk"
      (i, text, i <= 4 && i % 2 == 0) // target LM = docs 2 and 4 (target-like only)
    }
    val d = rows.toDF("doc_id", "text", "tgt")
    val s1 = Corpus.importanceResample(d, col("text"), col("doc_id"), col("tgt"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Corpus.importanceResample(d, col("text"), col("doc_id"), col("tgt"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 10) // same plan, same sample — reproducible
    // k ≥ corpus returns everything
    assert(Corpus.importanceResample(d, col("text"), col("doc_id"), col("tgt"), k = 100)
      .count() == 40)
    // raising a doc's ratio (same u) can only improve its key: the
    // sampled set from a 10× sharper lambda keeps ordering laws intact —
    // here just assert the E-S key law directly: key is increasing in
    // -log_ratio for fixed doc (u fixed by id+salt)
    val out = Corpus.importanceResample(d, col("text"), col("doc_id"), col("tgt"), k = 40)
      .select("doc_id", "log_ratio", "key")
      .as[(Long, Double, Double)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    // docs 6 and 8: same text (same log_ratio); key order is decided by u alone,
    // and both must land below any same-u-scale anti-target doc more often than not.
    // Deterministic check: every even doc's log_ratio > every odd doc's.
    val evens = out.filter(_._1 % 2 == 0).map(_._2).min
    val odds = out.filter(_._1 % 2 == 1).map(_._2).max
    assert(evens > odds, s"target-like docs must outscore anti-target: $byDoc")
  }
}
