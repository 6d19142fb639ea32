package graft.examples

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline over the documents table —
  * the composition story the individual operators exist for:
  *
  *   language filter → quality + repetition filters → blocklist screen
  *   + within-doc segment dedup + per-domain cap → exact dedup →
  *   MinHash-LSH near-dup pairs → connected-component clusters →
  *   keeper selection → surprisal filter → cluster-keyed (leakage-safe)
  *   train/val/test split → test-in-train n-gram decontamination report →
  *   length-threshold calibration (histogram) → mixture sizing report →
  *   token-budget sampling → token accounting + distinct-token sketch →
  *   corpus health (byte entropy, Zipf fit) → BPE vocabulary training +
  *   encode accounting → DSIR acquisition ranking → embedding SemDeDup →
  *   release version audit.
  *
  * Every stage is one of the gated operators; the whole pipeline is a
  * single lazy Catalyst plan per action, and at 100 TB each stage keeps
  * the shapes reviewed in SCALING.md (blocked joins, bucketed candidate
  * generation, no per-row interpreted lambdas on hot paths).
  */
object TrainingDataDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val docs = Tables.documents(spark, dir)

    // 1. language ID, keep English
    val lang = TextFunctions.langIdTable(docs, col("text"), col("doc_id"))
    val english = docs.join(lang.where(col("lang_pred") === "en"), Seq("doc_id"))

    // 2. quality + repetition gates (integer counts -> ratios at the site)
    val rep = TextFunctions.repetitionStats(english, col("text"), col("doc_id"))
    val clean = english
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .join(rep, Seq("doc_id"))
      .where(col("quality") > 0.5)
      .where(col("n_tokens") > 0 &&
        (lit(1.0) - col("n_distinct") / col("n_tokens")) < 0.6)

    // 2b. blocklist screen + within-doc segment dedup + per-domain cap:
    // the C4/Gopher/RefinedWeb trio — drop dictionary-flagged docs,
    // strip in-document repetition, cap any one source's share
    val dict = {
      import spark.implicits._
      Seq("forbidden", "blockedterm").toDF("term")
    }
    val screened = clean
      .join(TextFunctions.blocklistScreen(clean, col("text"), col("doc_id"), dict)
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .withColumn("text", TextFunctions.dedupSegments(col("text"), " "))
    val capped = graft.curation.Assembly.capPerGroup(
      screened, col("source"), Seq(col("quality").desc, col("doc_id").asc), n = 1000)

    // 3. exact dedup (content hash), then near-dup dedup (LSH -> CC ->
    // keepers). The CC labels are computed ONCE and shared by the keeper
    // selection AND the cluster audit below — the ...ByClusters forms
    // exist so no consumer re-runs the iterative CC (hours at 100 TB)
    val exactKept = capped.join(
      Dedup.exact(capped, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val pairs = Dedup.minhashLshPairs(exactKept, col("text"), col("doc_id"), maxBucket = 1000)
    val clusters = Dedup.nearDupClusters(exactKept, col("doc_id"), pairs)
    // production keeper rule: keep each cluster's best-quality member
    // (rounded score — the rank must not flip on an ulp), not first-seen
    val keepers = Dedup.keepBestByClusters(
      exactKept, col("doc_id"), clusters, round(col("quality"), 5))
    val curated = exactKept.join(
      keepers.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    // the audit half of keep + audit, from the SAME labels: how many
    // multi-member near-dup groups the curation step collapsed
    val nearDupGroups = clusters.groupBy(col("cluster_id"))
      .count().where(col("count") > 1)

    // 4. corpus-statistics filter: drop boilerplate (low surprisal under
    // the curated corpus's own unigram LM — the perplexity-filter shape)
    val surprisal = graft.curation.Corpus.unigramSurprisal(curated, col("text"), col("doc_id"))
    val informative = curated.join(
      surprisal.where(col("n_tokens") === 0 || col("bits_per_token") > 0.5)
        .select("doc_id"), Seq("doc_id"), "left_semi")

    // 5. deterministic split — keyed on the NEAR-DUP CLUSTER id (the
    // THIRD consumer of step 3's one CC run): near-duplicates can never
    // straddle train/test, and a future near-dup of a test doc inherits
    // the test split instead of leaking into train. Membership stays
    // stable under corpus growth (pure hash of the stable cluster label)
    val splits = graft.curation.Assembly
      .clusterSplitAssign(clusters, col("doc_id"), col("cluster_id"))
      .select("doc_id", "split")
    val labeled = informative.join(splits, Seq("doc_id"))
    val train = labeled.where(col("split") === "train").drop("split")

    // 5b. decontamination report: the fraction of each held-out doc's
    // distinct 3-grams already present in train — the number a data
    // card publishes next to its split (high coverage here is expected:
    // the synthetic corpus is near-dup-heavy by construction)
    val novelty = Dedup.ngramCoverage(
      labeled.where(col("split") === "test"), train, col("text"), col("doc_id"))
    val meanSeenFrac = novelty
      .agg(coalesce(avg(col("seen_frac")), lit(0.0))).head().getDouble(0)

    // 5c. surgical decontamination: instead of DROPPING a train doc for
    // one overlapping test span, find WHERE the overlap sits and cut it
    // out (±2 bytes) — the readout is how many train docs needed surgery
    // and how many bytes came out (report here; `excised.clean_text` is
    // the would-be replacement column)
    val spans = Dedup.contaminationSpans(
      train, col("text"), col("doc_id"),
      labeled.where(col("split") === "test"), col("text"), col("doc_id"),
      n = 8, minShared = 3)
    val excised = Dedup.exciseSpans(train, col("text"), col("doc_id"),
      spans, col("doc_id"), col("first_byte"), col("last_byte") + 8L, pad = 2)
    val surgery = excised.where(col("n_spans") > 0)
      .agg(count(lit(1)).as("docs"), coalesce(sum(col("n_cut_bytes")), lit(0L)).as("bytes"))
      .head()

    // 6. calibrate a min-length threshold from the histogram (the p10
    // bin floor: first bin where the cumulative fraction clears 10%) —
    // a one-pass aggregate over bins, never a corpus sort
    val hist = graft.curation.Corpus.histogram(
      train, TextFunctions.wsTokenCount(col("text")), binWidth = 5L)
    // an empty train split yields no qualifying bin — fail with a
    // message, not an NPE
    val minLen = graft.curation.Corpus.quantileFromBins(hist, 0.10)
      .getOrElse(sys.error(
        "length-histogram calibration found no bin with cum_frac >= 0.10 — empty train split?"))
    val sized = train.where(TextFunctions.wsTokenCount(col("text")) >= minLen)

    // 6b. mixture sizing report — what a 40/30/30 source mix over the
    // three largest sources could keep WITHOUT upsampling (binding
    // stratum keeps 1.0). Read, not applied: the demo's budget stage
    // below is the sampling act; this is the sizing the mix owner does
    // before choosing rates
    val mix = graft.curation.Assembly.mixPlan(
      sized, col("source"), TextFunctions.wsTokenCount(col("text")),
      Map("src13" -> 0.4, "src8" -> 0.3, "src18" -> 0.3))
    val mixKept = mix.agg(round(sum(col("kept_tokens")), 1)).head().getDouble(0)

    // 7. token-budget sampling: the recipe is written in tokens
    val budgeted = sized.join(
      graft.curation.Assembly.tokenBudgetSample(
          sized, col("doc_id"), lit("en"), TextFunctions.wsTokenCount(col("text")),
          budgetByStratum = Map.empty, defaultBudget = 5000L)
        .select("doc_id"), Seq("doc_id"), "left_semi")

    // 8. materialize the deliverable: the budgeted set in a reproducible
    // global shuffle order, written as contiguous internally-sorted
    // shards — what a training loader actually consumes
    val order = graft.curation.Assembly.shuffleOrder(budgeted, col("doc_id"))
    val shardDir = java.nio.file.Files.createTempDirectory("graft-demo-shards").toString
    graft.curation.Assembly.writeTrainingShards(
      budgeted.join(order.select("doc_id", "global_pos"), Seq("doc_id")),
      col("global_pos"), nShards = 4, shardDir)
    val shardFiles = new java.io.File(shardDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the demo's shards are illustrative — reclaim the temp dir rather
    // than leaking a materialized dataset per run
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(shardDir))

    // 9. token accounting over the train split (pre-budget — the split
    // stage's own health signal) + portable distinct-token sketch of the
    // final budgeted set
    val stats = train.agg(
      count(lit(1)).as("docs"),
      sum(TextFunctions.wsTokenCount(col("text")).cast("long")).as("ws_tokens"),
      sum(TextFunctions.regexTokenCount(col("text")).cast("long")).as("bpe_tokens"))
    val sketch = graft.functions.Sketches.kmvDistinct(
      budgeted.select(explode(TextFunctions.wsTokens(col("text"))).as("t")), col("t"))

    // 9b. corpus health + tokenizer prep over the train split: the
    // byte-entropy range (noise screen — binary junk would read > 6
    // bits), the Zipf fit (distribution health; template-heavy corpora
    // read flat), and an actual BPE vocabulary trained on the split with
    // vocabulary-true token accounting from the broadcast encode
    val ent = train.agg(
      round(min(TextFunctions.byteEntropy(col("text"))), 2).as("lo"),
      round(max(TextFunctions.byteEntropy(col("text"))), 2).as("hi")).head()
    val zipf = graft.curation.Corpus
      .zipfFit(train, col("text"), col("doc_id"), topN = 30).head()
    val merges = graft.curation.Bpe.train(train, col("text"), maxMerges = 50)
    val bpePieces = graft.curation.Bpe
      .encodeCorpus(train, col("text"), col("doc_id"), merges)
      .agg(coalesce(sum(col("n_pieces")), lit(0L))).head().getLong(0)

    // 9c. DSIR readout over the RAW input: which documents look most like
    // the curated English target distribution — the acquisition-ranking
    // view (what to crawl/buy more of), computed before any filter ran
    val dsir = graft.curation.Corpus.importanceResample(
      docs, col("text"), col("doc_id"), col("lang") === "en", k = 100)
    val dsirMean = dsir.agg(round(avg(col("log_ratio")), 4)).head().getDouble(0)

    // 9d. the non-text modality's dedup: SemDeDup over the embedding
    // table (IVF-cell-blocked near-dup clusters, keep-farthest keeper)
    val sem = Dedup.semanticDedup(
      Tables.embeddings(spark, dir), col("vec_id"), col("embedding"),
      graft.similarity.IVF.pretrainedCentroids, threshold = 0.35)
    val semKept = sem.where(col("keep")).count()
    val semTotal = sem.count()

    println(s"DEMO_INPUT_DOCS=${docs.count()}")
    println(s"DEMO_ENGLISH_DOCS=${english.count()}")
    println(s"DEMO_CLEAN_DOCS=${clean.count()} DEMO_SCREENED_DOCS=${capped.count()}")
    println(s"DEMO_EXACT_KEPT=${exactKept.count()}")
    println(s"DEMO_CURATED_DOCS=${curated.count()} DEMO_NEARDUP_GROUPS=${nearDupGroups.count()}")
    // 10. release audit: what this run changed relative to the
    // previous release (simulated here by the pre-near-dup corpus) —
    // the one-line diff a data card cites for the version bump
    val audit = graft.curation.Corpus
      .versionDiff(exactKept, informative, col("doc_id"), md5(col("text")))
      .groupBy("status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")

    println(s"DEMO_INFORMATIVE_DOCS=${informative.count()}")
    println(f"DEMO_TEST_NGRAM_SEEN_FRAC=$meanSeenFrac%.4f")
    println(s"DEMO_EXCISED_DOCS=${surgery.getLong(0)} DEMO_CUT_BYTES=${surgery.getLong(1)}")
    println(s"DEMO_MIN_LEN=$minLen DEMO_BUDGETED_DOCS=${budgeted.count()}")
    val row = stats.head()
    println(s"DEMO_TRAIN_DOCS=${row.getLong(0)} WS_TOKENS=${row.getLong(1)} BPE_TOKENS=${row.getLong(2)}")
    println(s"DEMO_DISTINCT_TOKENS_EST=${sketch.head().getLong(2)}")
    println(s"DEMO_SHARD_FILES=$shardFiles")
    println(f"DEMO_MIX_KEPT_TOKENS=$mixKept%.1f")
    println(s"DEMO_BYTE_ENTROPY_RANGE=${ent.getDouble(0)}..${ent.getDouble(1)}")
    println(s"DEMO_ZIPF_SLOPE=${zipf.get(1)} N_TERMS=${zipf.getLong(0)}")
    println(s"DEMO_BPE_FIRST_MERGES=" +
      merges.take(3).map(m => s"${m.left}+${m.right}").mkString(",") +
      s" DEMO_BPE_PIECES=$bpePieces")
    println(s"DEMO_DSIR_TOP100_MEAN_LOG_RATIO=$dsirMean")
    println(s"DEMO_SEMDEDUP_KEPT=$semKept/$semTotal")
    println(s"DEMO_VERSION_AUDIT $audit")

    // 11. round-11 analysis passes over the curated corpus:
    //  - distribution drift: which SOURCE's length profile diverges from
    //    the rest (exact KS — what PSI's fixed bins smear out)
    //  - retrieval QA: BM25 probe for a query the corpus should answer
    //  - exact near-dup audit at shingle granularity: the PPJoin exact
    //    join as a recall check on the sketch-based MinHash pipeline
    val drift = graft.curation.Corpus.ksDrift(curated, col("source"), col("n_chars"))
      .orderBy(desc("ks")).limit(3)
      .collect().map(r => s"${r.getString(0)}=${r.getDouble(3)}").mkString(",")
    println(s"DEMO_KS_DRIFT_TOP3=$drift")
    val hits = graft.curation.Corpus.bm25(
        curated, col("text"), col("doc_id"), Seq("spark", "join", "window"), topK = 5)
      .collect().map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(",")
    println(s"DEMO_BM25_TOP5=$hits")
    val exactPairs = Dedup.jaccardJoinSets(
      curated, graft.functions.Hashing.shingleHashSet(col("text"), 3),
      col("doc_id"), threshold = 0.5)
    println(s"DEMO_EXACT_JACCARD_PAIRS=${exactPairs.count()}")

    // 12. round-12 passes:
    //  - the PQ serving stack end-to-end on the embedding table: train
    //    residual-free codebooks, encode, serve a 5-query probe through
    //    the ADC shortlist + exact rerank (the production shape)
    //  - the COSINE complement of the exact-Jaccard audit (size-asymmetric
    //    near-dups Jaccard under-scores)
    //  - per-source top-3 longest curated docs through the BOUNDED top-k
    //    aggregate — no window, O(k) state per source
    val emb = Tables.embeddings(spark, dir)
    val pqCb = graft.similarity.PQ.trainCodebooks(
      emb, col("vec_id"), col("embedding"), m = 16, k = 16, iters = 2)
    val pqCodes = graft.similarity.PQ.encode(emb, col("vec_id"), col("embedding"), pqCb)
    val probes = emb.orderBy(col("vec_id")).limit(5)
    val served = graft.similarity.PQ.adcTopKReranked(
      pqCodes, emb, col("vec_id"), col("embedding"),
      probes, col("vec_id"), col("embedding"), pqCb, topK = 10, shortlist = 50)
    val servedStats = served.agg(count(lit(1)), round(avg(col("dist")), 4)).head()
    println(s"DEMO_PQ_SERVED=${servedStats.getLong(0)} MEAN_RERANKED_DIST=${servedStats.getDouble(1)}")
    val cosPairs = Dedup.cosineJoinSets(
      curated, graft.functions.Hashing.shingleHashSet(col("text"), 3),
      col("doc_id"), threshold = 0.6)
    println(s"DEMO_EXACT_COSINE_PAIRS=${cosPairs.count()}")
    val topBySource = graft.operators.TopK.topKByGroup(
      curated, Seq(col("source")),
      struct(col("n_chars"), (-col("doc_id")).as("nd"), col("doc_id")), k = 3)
    println(s"DEMO_TOP3_BY_SOURCE_ROWS=${topBySource.count()}")
    spark.stop()
  }
}
