package graft

import graft.curation.Assembly
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dataset-assembly laws: deterministic splits, stratified sampling,
  * cell-diversity quotas, and the two-pass global shuffle order.
  */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  test("splitAssign partitions the corpus; membership is a pure function of (id, salt)") {
    val s = Assembly.splitAssign(docs, col("doc_id")).cache()
    try {
      val n = docs.count()
      assert(s.count() == n) // total function: every row gets a split
      val bySplit = s.groupBy("split").count().as[(String, Long)].collect().toMap
      assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
      assert(bySplit.values.sum == n)
      // hash-uniform: each 1% bucket holds tiny fractions, so 5% bands land
      // loosely around 5% even at this SF
      assert(bySplit("train") > bySplit.getOrElse("val", 0L))
      assert(bySplit("train") > bySplit.getOrElse("test", 0L))
      // stability under corpus growth: splitting a SUBSET assigns every
      // surviving row the same split it had in the full corpus
      val sub = Assembly.splitAssign(docs.where(col("doc_id") % 3 === 0), col("doc_id"))
      val joined = sub.as("a").join(s.as("b"), "doc_id")
        .where(col("a.split") =!= col("b.split"))
      assert(joined.count() == 0)
    } finally s.unpersist()
  }

  test("clusterSplitAssign is split-pure per cluster and stable under cluster growth") {
    // synthetic CC output: 1000 docs in 250 four-member clusters labeled by
    // their min member id (nearDupClusters' label contract)
    val clusters = spark.range(1000)
      .select(col("id").as("doc_id"), (col("id") - pmod(col("id"), lit(4))).as("cluster_id"))
    val s = Assembly.clusterSplitAssign(clusters, col("doc_id"), col("cluster_id")).cache()
    try {
      assert(s.count() == 1000)
      // leakage safety: every cluster maps to exactly ONE split
      val impure = s.groupBy("cluster_id")
        .agg(countDistinct(col("split")).as("k")).where(col("k") > 1)
      assert(impure.count() == 0)
      // the hash is uniform enough that all three splits appear at 250 clusters
      assert(s.select("split").distinct().count() == 3)
      // growth stability: a NEW near-duplicate joining an existing cluster
      // (same cluster_id, new doc_id) gets that cluster's existing split
      val grown = Assembly.clusterSplitAssign(
        clusters.unionByName(clusters.select(
          (col("doc_id") + 10000).as("doc_id"), col("cluster_id"))),
        col("doc_id"), col("cluster_id"))
      val moved = grown.as("a").join(s.as("b"), "cluster_id")
        .where(col("a.split") =!= col("b.split"))
      assert(moved.count() == 0)
      // decorrelated from the id-keyed split: membership differs for some
      // docs (different salt AND different key), so the two operators are
      // genuinely distinct policies
      val idSplit = Assembly.splitAssign(clusters, col("doc_id"))
      val differs = s.as("a").join(idSplit.as("b"), "doc_id")
        .where(col("a.split") =!= col("b.split"))
      assert(differs.count() > 0)
    } finally s.unpersist()
  }

  test("stratifiedSample keeps a stable subset at per-stratum rates; raising a rate only adds rows") {
    val rates = Map("en" -> 100, "fr" -> 1000)
    val kept = Assembly.stratifiedSample(docs, col("doc_id"), col("lang"), rates, defaultPermille = 300)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    // subset of the corpus, deterministic across invocations
    val again = Assembly.stratifiedSample(docs, col("doc_id"), col("lang"), rates, defaultPermille = 300)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds == again)
    // rate 1000 keeps EVERY row of the stratum
    val fr = docs.where(col("lang") === "fr").count()
    assert(kept.where(col("lang") === "fr").count() == fr)
    // monotonicity: a higher rate for `en` keeps a superset
    val more = Assembly.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 400, "fr" -> 1000), defaultPermille = 300)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds.subsetOf(more))
    assert(more.size > keptIds.size)
  }

  test("mixPlan: binding stratum keeps 1.0, kept tokens realize the target ratios, untargeted strata drop") {
    // en 1000 tokens, fr 100, de 500: target 50/50 en/fr → fr binds
    // (100/0.5 = 200 < 1000/0.5): t_max = 200, en keeps 100 of 1000
    val d = Seq(("en", 1000), ("fr", 100), ("de", 500)).toDF("lang", "toks")
    val plan = Assembly.mixPlan(d, col("lang"), col("toks"),
      Map("en" -> 0.5, "fr" -> 0.5)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(plan("fr").getAs[Double]("keep_rate") == 1.0)
    assert(plan("en").getAs[Double]("keep_rate") == 0.1)
    assert(plan("en").getAs[Double]("kept_tokens") == 100.0)
    assert(plan("de").getAs[Double]("keep_rate") == 0.0)
    assert(plan("de").getAs[Double]("kept_tokens") == 0.0)
    // kept tokens are in exactly the target ratio
    assert(plan("en").getAs[Double]("kept_tokens") ==
      plan("fr").getAs[Double]("kept_tokens"))
    // weights that don't sum to 1 are the caller's bug, loudly
    intercept[IllegalArgumentException] {
      Assembly.mixPlan(d, col("lang"), col("toks"), Map("en" -> 0.7))
    }
  }

  test("mixPlan: targeted-but-ABSENT stratum appears with 0 tokens and forces t_max = 0") {
    // fr is targeted at 50% but has NO corpus rows: without upsampling no
    // positive fr share is realizable, so the whole mix is unachievable —
    // the report must SAY so (t_max = 0 ⇒ every keep_rate/kept_tokens 0)
    // instead of silently dropping fr and promising en-only "ratios"
    val d = Seq(("en", 1000), ("de", 500)).toDF("lang", "toks")
    val plan = Assembly.mixPlan(d, col("lang"), col("toks"),
      Map("en" -> 0.5, "fr" -> 0.5)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(plan.keySet == Set("en", "fr", "de")) // fr reported, not vanished
    assert(plan("fr").getAs[Long]("n_docs") == 0L)
    assert(plan("fr").getAs[Long]("n_tokens") == 0L)
    for (s <- Seq("en", "fr", "de")) {
      assert(plan(s).getAs[Double]("keep_rate") == 0.0, s)
      assert(plan(s).getAs[Double]("kept_tokens") == 0.0, s)
    }
  }

  test("weightedSample: exact k, deterministic, weight-monotone inclusion, TakeOrdered plan") {
    val rows = (1L to 400L).map(i => (i, if (i <= 200) 1L else 20L)).toDF("id", "w")
    val s1 = Assembly.weightedSample(rows, col("id"), col("w"), k = 100, salt = "t-v1")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // exact k and deterministic across runs
    assert(s1.length == 100)
    val s2 = Assembly.weightedSample(rows, col("id"), col("w"), k = 100, salt = "t-v1")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 == s2)
    // E-S law: the 20x-weighted half dominates the sample (E[heavy] ≈ 95;
    // loose bound, deterministic given the salt)
    assert(s1.count(_ > 200) > 75, s"heavy rows sampled: ${s1.count(_ > 200)}")
    // different salt → different draw, same law
    val s3 = Assembly.weightedSample(rows, col("id"), col("w"), k = 100, salt = "t-v2")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s3 != s1 && s3.count(_ > 200) > 75)
    // zero/negative weight rows can never appear
    val withZero = rows.withColumn("w", when(col("id") <= 390, col("w")).otherwise(lit(0L)))
    val s4 = Assembly.weightedSample(withZero, col("id"), col("w"), k = 400, salt = "t-v1")
      .select("doc_id").as[Long].collect().toSeq
    assert(s4.length == 390 && s4.forall(_ <= 390))
    // plan is top-k per task, never a global sort of the corpus
    val plan = Assembly.weightedSample(rows, col("id"), col("w"), k = 100, salt = "t-v1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("weightedSamplePerStratum: per-stratum quota equals the global sampler run per stratum; map-side group limit") {
    val rows = (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b", 1L + i % 7))
      .toDF("id", "s", "w")
    val per = Assembly.weightedSamplePerStratum(
      rows, col("id"), col("s"), col("w"), kPerStratum = 15, salt = "t-v1")
    val got = per.select("stratum", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got.keySet == Set("a", "b") && got.values.forall(_.size == 15))
    // consistency law: each stratum's quota is exactly what the GLOBAL
    // sampler picks from that stratum alone (same keys, same salt)
    for (s <- Seq("a", "b")) {
      val solo = Assembly.weightedSample(
        rows.where(col("s") === s), col("id"), col("w"), k = 15, salt = "t-v1")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got(s) == solo, s"stratum $s")
    }
    // plan: rank filter pushed to a map-side group limit before the one
    // stratum exchange — the shuffle never carries the whole corpus
    val plan = per.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("mixPlan: present-but-zero-token targeted stratum yields keep_rate 0, not null") {
    val d = Seq(("en", 1000), ("fr", 0)).toDF("lang", "toks")
    val plan = Assembly.mixPlan(d, col("lang"), col("toks"),
      Map("en" -> 0.5, "fr" -> 0.5)).collect()
      .map(r => r.getString(0) -> r).toMap
    // fr binds at 0 tokens → t_max 0; its keep_rate must be a real 0.0
    // (the 0/0 division previously surfaced as null)
    assert(!plan("fr").isNullAt(plan("fr").fieldIndex("keep_rate")))
    assert(plan("fr").getAs[Double]("keep_rate") == 0.0)
    assert(plan("en").getAs[Double]("keep_rate") == 0.0)
    assert(plan("fr").getAs[Double]("cur_share") == 0.0)
  }

  test("epochMix materializes floor/ceil copies per weight; deterministic and growth-stable") {
    val weights = Map("en" -> 0.25, "fr" -> 2.5, "de" -> 2.0)
    val mix = Assembly.epochMix(docs, col("doc_id"), col("lang"), weights, defaultWeight = 0.0)
      .cache()
    try {
      // weight 0 strata contribute nothing
      assert(mix.where(!col("stratum").isin("en", "fr", "de")).isEmpty)
      // per-doc copy count is floor(w) or floor(w)+1, copy_idx is 0..copies-1
      val perDoc = mix.groupBy("doc_id", "stratum")
        .agg(count(lit(1)).as("copies"), max("copy_idx").as("max_idx"), min("copy_idx").as("min_idx"))
      assert(perDoc.where(col("min_idx") =!= 0 || col("max_idx") =!= col("copies") - 1).isEmpty)
      assert(perDoc.where(col("stratum") === "en" && col("copies") > 1).isEmpty)
      assert(perDoc.where(col("stratum") === "fr" && (col("copies") < 2 || col("copies") > 3)).isEmpty)
      // integer weight: exactly 2 copies of every de row
      val de = docs.where(col("lang") === "de").count()
      assert(mix.where(col("stratum") === "de").count() == 2 * de)
      // fractional realization tracks the weight (hash-uniform, loose bound)
      val fr = docs.where(col("lang") === "fr").count()
      val frCopies = mix.where(col("stratum") === "fr").count()
      assert(frCopies >= 2 * fr && frCopies <= 3 * fr)
      // growth stability: mixing a subset reproduces each surviving doc's copies
      val sub = Assembly.epochMix(
        docs.where(col("doc_id") % 3 === 0), col("doc_id"), col("lang"), weights, defaultWeight = 0.0)
        .groupBy("doc_id").agg(count(lit(1)).as("c"))
      val full = mix.groupBy("doc_id").agg(count(lit(1)).as("c"))
      assert(sub.as("a").join(full.as("b"), "doc_id")
        .where(col("a.c") =!= col("b.c")).isEmpty)
    } finally mix.unpersist()
  }

  test("diversityByCell caps every cell at the quota and picks deterministically") {
    val emb = Tables.embeddings(spark, sfDir)
    val cents = graft.similarity.IVF.pretrainedCentroids
    val picked = Assembly.diversityByCell(emb, col("vec_id"), col("embedding"), cents, quota = 5)
    val perCell = picked.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(perCell.values.forall(_ <= 5))
    assert(picked.select("pick_rank").as[Int].collect().forall(r => r >= 1 && r <= 5))
    // a cell with more than `quota` members is actually capped (the data
    // has >5 per cell at this SF — otherwise the quota is untested)
    val occupancy = emb.select(graft.similarity.IVF.literalCell(col("embedding"), cents).as("cell"))
      .groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(occupancy.values.max > 5)
    assert(perCell(occupancy.maxBy(_._2)._1) == 5)
  }

  test("shuffleOrder assigns a bijective 1..n position consistent with the salted-hash sort") {
    val ordered = Assembly.shuffleOrder(docs, col("doc_id"), nBuckets = 16)
    val rows = ordered.select("global_pos", "sort_key", "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val n = docs.count()
    // bijection onto 1..n
    assert(rows.map(_._1).toSeq == (1L to n))
    // walking by position walks (sort_key, doc_id) lexicographically:
    // the bucket offsets really do splice the local ranks into one order
    rows.sliding(2).foreach {
      case Array((_, k1, d1), (_, k2, d2)) =>
        assert(k1 < k2 || (k1 == k2 && d1 < d2), s"order break at key=$k1/$k2")
      case _ =>
    }
    // the order is a shuffle, not the identity: doc_id order is destroyed
    assert(rows.take(50).map(_._3).toSeq != rows.take(50).map(_._3).sorted.toSeq)
    // a different salt yields a different permutation (stages decorrelate)
    val other = Assembly.shuffleOrder(docs, col("doc_id"), salt = "order-v2", nBuckets = 16)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    val thisOne = rows.map(r => r._3 -> r._1).toMap
    assert(other != thisOne)
  }

  test("tokenBudgetSample: never over budget, maximal prefix, equals the one-window form") {
    import graft.functions.{Hashing, TextFunctions}
    val budgets = Map("en" -> 500L, "fr" -> 100L)
    val out = Assembly.tokenBudgetSample(
        docs, col("doc_id"), col("lang"), TextFunctions.wsTokenCount(col("text")),
        budgets, defaultBudget = 300L, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def budget(l: String) = budgets.getOrElse(l, 300L)
    // kept totals never exceed the stratum budget
    out.groupBy(_._2).foreach { case (l, rows) =>
      assert(rows.map(_._3).sum <= budget(l), s"stratum $l over budget")
      assert(rows.map(_._4).max <= budget(l))
    }
    // value-identical to the naive single-window running sum (the bucketed
    // two-pass must not change the walk or the cut)
    val naive = docs.select(
        col("doc_id"), col("lang"),
        TextFunctions.wsTokenCount(col("text")).cast("long").as("n_tokens"),
        Hashing.hash48(concat(col("doc_id").cast("string"), lit(":budget-v1"))).as("k"))
      .withColumn("cum", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("k").asc, col("doc_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .filter { case (_, l, _, cum) => cum <= budget(l) }
    assert(out.sortBy(_._1).toSeq == naive.sortBy(_._1).toSeq)
  }

  test("tokenBudgetSample: null-stratum rows sample under the default budget, not vanish") {
    val df = Seq((1L, Option("en"), 10L), (2L, Option.empty[String], 10L),
                 (3L, Option.empty[String], 10L), (4L, Option("en"), 10L))
      .toDF("doc_id", "lang", "n")
    val out = Assembly.tokenBudgetSample(df, col("doc_id"), col("lang"), col("n"),
        Map("en" -> 100L), defaultBudget = 15L, nBuckets = 4)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    // both en docs fit 100; exactly ONE null-stratum doc fits 15
    assert(out.count(_._2.contains("en")) == 2)
    assert(out.count(_._2.isEmpty) == 1)
  }

  test("writeTrainingShards: contiguous sorted ranges per file, all rows exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val ordered = Assembly.shuffleOrder((1L to 200L).map(Tuple1(_)).toDF("doc_id"), col("doc_id"))
    Assembly.writeTrainingShards(ordered, col("global_pos"), nShards = 4, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).sorted
    assert(files.length == 4)
    val perFile = files.map { f =>
      spark.read.parquet(f.getAbsolutePath).select("global_pos").as[Long].collect().toSeq
    }
    // within a file: sorted; across files: disjoint contiguous ranges
    perFile.foreach(p => assert(p == p.sorted))
    val ranges = perFile.map(p => (p.min, p.max)).sortBy(_._1).toSeq
    ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) => assert(hi < lo2); case _ => }
    assert(perFile.flatten.sorted.toSeq == (1L to 200L).toSeq) // bijection preserved
    intercept[IllegalArgumentException] {
      Assembly.writeTrainingShards(ordered, col("global_pos"), 0, dir)
    }
  }

  test("epochOrder: bijective positions over the mix, interleaved, partitioning-independent") {
    val weights = Map("en" -> 2.0, "de" -> 1.0)
    val n = 40L
    val docs = (1L to n).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val ordered = Assembly.epochOrder(
      docs, col("doc_id"), col("lang"), weights, defaultWeight = 1.0, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val mixRows = Assembly.epochMix(
      docs, col("doc_id"), col("lang"), weights, defaultWeight = 1.0).count()
    // positions are exactly 1..|mix| — a bijection over the (doc, copy) rows
    assert(ordered.length == mixRows)
    assert(ordered.map(_._4).sorted.toSeq == (1L to mixRows).toSeq)
    // epoch copies INTERLEAVE: the two copies of an en doc are not all
    // adjacent (probability of every pair adjacent under a uniform hash
    // order is astronomically small — any adjacency run means the order
    // degenerated to corpus-repetition)
    val byDoc = ordered.filter(_._2 == "en").groupBy(_._1).view.mapValues(_.map(_._4).sorted.toSeq)
    val gaps = byDoc.values.toSeq.collect { case Seq(a, b) => b - a }
    assert(gaps.nonEmpty && gaps.exists(_ > 1), "all epoch copies adjacent — no interleave")
    // reproducible under a different input partitioning
    val repart = Assembly.epochOrder(
      docs.repartition(7), col("doc_id"), col("lang"), weights, defaultWeight = 1.0, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).sorted
    assert(repart.toSeq == ordered.sorted.toSeq)
  }

  test("temperatureWeights: exact α=0.5 shares, α=1 identity, α=0 uniform, tail upsampled") {
    val d = Seq(
      (1L, "A", 3L), (2L, "A", 1L), // stratum A: 4 tokens → pw 2 at α=0.5
      (3L, "B", 1L)                 // stratum B: 1 token  → pw 1
    ).toDF("doc_id", "stratum", "m")
    val w = Assembly.temperatureWeights(d, col("stratum"), col("m"), alpha = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(w("A") == ((4L, 0.8, 0.6667, 0.8333)))
    assert(w("B") == ((1L, 0.2, 0.3333, 1.6667)))
    // α = 1: proportional — every rate exactly 1
    val id1 = Assembly.temperatureWeights(d, col("stratum"), col("m"), alpha = 1.0)
    assert(id1.where(col("rate") =!= 1.0).isEmpty)
    // α = 0: uniform shares regardless of size
    val u = Assembly.temperatureWeights(d, col("stratum"), col("m"), alpha = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(u("A") == 0.5 && u("B") == 0.5)
    // the law the technique exists for: the small stratum's rate exceeds
    // the large stratum's for every α < 1
    assert(w("B")._4 > w("A")._4)
  }

  test("curriculumOrder: levels ramp, within-level order is the salted shuffle, nulls excluded") {
    val d = (1L to 40L).map(i => (i, (i % 4).toInt)).toDF("doc_id", "lvl")
    val out = Assembly.curriculumOrder(d, col("doc_id"), col("lvl"), nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // bijective positions 1..n
    assert(out.map(_._4).sorted.toSeq == (1L to 40L))
    // levels are non-decreasing along the global order
    val byPos = out.sortBy(_._4)
    assert(byPos.map(_._2).toSeq == byPos.map(_._2).sortBy(identity).toSeq)
    // within a level, order is exactly the salted-hash shuffle (sort_key, id)
    byPos.groupBy(_._2).values.foreach { g =>
      val inOrder = g.sortBy(_._4).map(r => (r._3, r._1)).toSeq
      assert(inOrder == inOrder.sorted, "within-level order must follow (sort_key, doc_id)")
    }
    // null levels are excluded, not sorted to an end
    val withNull = d.withColumn("lvl", when(col("doc_id") <= 5, lit(null)).otherwise(col("lvl")))
    val filtered = Assembly.curriculumOrder(withNull, col("doc_id"), col("lvl"), nBuckets = 8)
    assert(filtered.count() == 35)
    assert(filtered.agg(max(col("global_pos"))).head().getLong(0) == 35L)
    // partitioning-independent
    val repart = Assembly.curriculumOrder(d.repartition(7), col("doc_id"), col("lvl"), nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(repart.toSeq == out.sorted.toSeq)
  }
}
