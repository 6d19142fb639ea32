package graft.curation

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset assembly — the last stage of a training-data pipeline, after
  * curation/dedup/decontamination: deterministic train/val/test splits,
  * stratified down-sampling, diversity sampling over learned cells, and a
  * reproducible global shuffle order.
  *
  * Everything here is keyed on content-independent 48-bit hashes of the
  * row id plus an explicit salt, so every decision is (a) reproducible
  * across runs and engines, (b) independent between stages (different
  * salts decorrelate the split from the sample from the order), and
  * (c) a pure per-row expression — the split and sample operators plan
  * ZERO exchanges, which at 100 TB means they fuse into whatever scan or
  * shuffle the surrounding pipeline already pays for.
  */
object Assembly {

  private def ticket(id: Column, salt: String, buckets: Int): Column =
    pmod(Hashing.hash48(concat(id.cast("string"), lit(s":$salt"))), lit(buckets.toLong))

  /** Deterministic train/val/test assignment: `bucket` is the id's salted
    * hash modulo 100, `split` carves [0,testPct) → test,
    * [testPct, testPct+valPct) → val, rest → train. Membership depends
    * only on (id, salt), so re-running over a grown corpus never moves an
    * existing row between splits — the property that keeps eval sets
    * uncontaminated across dataset versions.
    */
  def splitAssign(
      df: DataFrame,
      id: Column,
      testPct: Int = 5,
      valPct: Int = 5,
      salt: String = "split-v1"
  ): DataFrame =
    df.select(
      id.as("doc_id"),
      ticket(id, salt, 100).as("bucket"),
      splitLabel(id, testPct, valPct, salt).as("split"))

  /** Cluster-aware train/val/test assignment: the split is keyed on the
    * NEAR-DUP CLUSTER id (from [[graft.dedup.Dedup.nearDupClusters]]),
    * not the document id, so every member of a cluster lands in the same
    * split. This is the leakage-safe form of [[splitAssign]]: an id-keyed
    * split scatters near-identical documents across train and test, and
    * the eval set silently memorizes the training set — the
    * train-test-contamination failure mode dedup exists to prevent.
    *
    * Scale shape: the split is a pure row expression over `cluster_id`,
    * so the only distributed work is the CC that produced the clusters
    * relation — assigning splits to 100 TB of labeled docs adds ZERO
    * exchanges. Reproducibility is inherited from CC's deterministic
    * labels (cluster_id = min doc id of the component): the same corpus
    * always splits the same way, and a NEW near-duplicate of an existing
    * document joins its cluster and therefore its split, never leaking
    * an already-published test document into train.
    */
  def clusterSplitAssign(
      clusters: DataFrame,
      docId: Column,
      clusterId: Column,
      testPct: Int = 5,
      valPct: Int = 5,
      salt: String = "cluster-split-v1"
  ): DataFrame =
    clusters.select(
      docId.as("doc_id"),
      clusterId.as("cluster_id"),
      ticket(clusterId, salt, 100).as("bucket"),
      splitLabel(clusterId, testPct, valPct, salt).as("split"))

  /** The split label as a pure COLUMN expression over the id — for
    * pipelines that need the label NEXT TO their own columns
    * ([[graft.dedup.Dedup.ngramCoverage]] callers filtering a corpus to
    * its test/train halves): `docs.withColumn("split", splitLabel(id))`
    * keeps one scan per consumer, where joining [[splitAssign]]'s
    * (doc_id, split) relation back onto the corpus would re-scan the
    * table a second time per branch just to re-derive a hash of a
    * column it already has. Same membership function as [[splitAssign]]
    * by construction (that method delegates here).
    */
  def splitLabel(
      id: Column,
      testPct: Int = 5,
      valPct: Int = 5,
      salt: String = "split-v1"
  ): Column = {
    require(testPct >= 0 && valPct >= 0 && testPct + valPct <= 100,
      s"split percentages must be within [0,100]: test=$testPct val=$valPct")
    val bucket = ticket(id, salt, 100)
    when(bucket < testPct, "test")
      .when(bucket < testPct + valPct, "val")
      .otherwise("train")
  }

  /** Mixture plan — the sizing report that turns "I want 50% en / 20% zh
    * / 30% fr BY TOKENS" into per-stratum keep rates a
    * [[stratifiedSample]] run can apply: per stratum, its document and
    * token counts, current token share, target share, the keep rate that
    * realizes the target WITHOUT upsampling (the binding stratum — the
    * one scarcest relative to its target — keeps rate 1.0 and caps the
    * achievable mixed-corpus size at `t_max = min over targeted strata
    * of tokens/target`), and the resulting kept token count. Strata
    * absent from the target map get rate 0. Targeted strata ABSENT from
    * the corpus (or present with zero tokens) still appear in the report
    * with `n_tokens = 0` and — because a 0-token stratum can realize no
    * positive target without upsampling — force `t_max = 0`: the report
    * says "this mix is unachievable" instead of promising ratios the
    * corpus cannot deliver.
    *
    * Scale shape: ONE map-combined groupBy(stratum) token sum — the only
    * corpus-sized work; every ratio is arithmetic over the resulting
    * ≤ #strata relation (materialized once, scalar-aggregated for the
    * total and the binding minimum, broadcast back — never a
    * single-partition window).
    *
    * `targetWeights` must sum to 1 (±1e-9): rates are computed from the
    * raw weights, so normalization is the CALLER's explicit act, not a
    * silent rescale that would make the report disagree with its input.
    */
  def mixPlan(
      df: DataFrame,
      stratum: Column,
      tokens: Column,
      targetWeights: Map[String, Double]
  ): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ >= 0),
      "target weights must be non-negative")
    require(math.abs(targetWeights.values.sum - 1.0) < 1e-9,
      s"target weights must sum to 1, got ${targetWeights.values.sum}")
    val tgtMap = map(targetWeights.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v))
    }: _*)
    // outer-join the target key set so a targeted-but-absent stratum shows
    // up as an explicit 0-token row (and therefore constrains t_max to 0)
    // instead of silently vanishing from the plan. Both sides are ≤ #strata
    // rows — this join costs nothing.
    val targetKeys = df.sparkSession
      .createDataFrame(
        java.util.Arrays.asList(targetWeights.keys.toSeq.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "stratum", org.apache.spark.sql.types.StringType, nullable = false))))
    val agg = graft.Materialize(
      df.groupBy(stratum.as("stratum"))
        .agg(count(lit(1)).as("n_docs"), sum(tokens.cast("long")).as("n_tokens"))
        .join(targetKeys, Seq("stratum"), "full_outer")
        .select(
          col("stratum"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
        .withColumn("tgt_share",
          coalesce(element_at(tgtMap, col("stratum")), lit(0.0))))
    val totals = agg.agg(
      sum(col("n_tokens")).as("total_tokens"),
      // null when nothing is targeted; a targeted 0-token stratum yields
      // min(0) → nothing is achievable without upsampling
      coalesce(
        min(when(col("tgt_share") > 0, col("n_tokens") / col("tgt_share"))),
        lit(0.0)).as("t_max"))
    agg.crossJoin(broadcast(totals))
      .select(
        col("stratum"),
        col("n_docs"),
        col("n_tokens"),
        round(when(col("total_tokens") > 0, col("n_tokens") / col("total_tokens"))
          .otherwise(lit(0.0)), 6).as("cur_share"),
        round(col("tgt_share"), 6).as("tgt_share"),
        round(when(col("tgt_share") > 0 && col("n_tokens") > 0,
          col("tgt_share") * col("t_max") / col("n_tokens"))
          .otherwise(lit(0.0)), 6).as("keep_rate"),
        round(when(col("tgt_share") > 0, col("tgt_share") * col("t_max"))
          .otherwise(lit(0.0)), 4).as("kept_tokens"))
  }

  /** Stratified deterministic sampling: keep a row iff its salted hash
    * ticket (mod 1000) falls under its stratum's permille rate. One filter
    * expression — no shuffle, no state, and the kept set is a stable
    * subset under corpus growth (a row's fate never depends on other
    * rows). This is how a 100 TB corpus re-balances its language or
    * domain mix without a sort or a sample() whose seed changes per
    * partitioning.
    */
  def stratifiedSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      permilleByStratum: Map[String, Int],
      defaultPermille: Int,
      salt: String = "strat-v1"
  ): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (s, p)) => when(stratum === s, p).otherwise(acc)
    }
    df.where(ticket(id, salt, 1000) < rate)
  }

  /** Per-group document cap: keep at most `n` rows per `group`, chosen by
    * `order` (ties MUST be broken — pass an id as the last order column —
    * or the kept set is nondeterministic across runs). This is the
    * RefinedWeb / C4 "at most N pages per domain" rule: exact dedup leaves
    * mirror-heavy domains (forums, wikis, doc hosts) massively
    * over-represented, and the cap is the standard counter.
    *
    * Distinct from [[graft.dedup.Dedup.keepBestByClusters]] (top-1 per
    * CLUSTER, downstream of a CC run): this caps top-n per a CHEAP
    * grouping column with no clustering stage.
    *
    * Scale shape: one hash exchange on `group`, and the rank<=n filter
    * sits directly on `row_number` so Catalyst rewrites it to
    * WindowGroupLimit — each map task pre-prunes to its local top-n per
    * group BEFORE the exchange, so the shuffle carries at most
    * n·|groups|·|tasks| rows, not the corpus. A degenerate mega-domain
    * therefore costs its map-side top-n heaps, not a single giant sorted
    * partition.
    */
  def capPerGroup(
      df: DataFrame,
      group: Column,
      order: Seq[Column],
      n: Int
  ): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    require(order.nonEmpty, "need at least one order column (end with an id tiebreak)")
    val w = Window.partitionBy(group).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Exact-k weighted sampling WITHOUT replacement — deterministic
    * Efraimidis–Spirakis order sampling: each row draws a salted-hash
    * uniform `u ∈ (0, 1]` (48-bit ticket, so the draw is a pure function
    * of (id, salt) — reproducible cross-run AND cross-engine) and an
    * exponential key `-ln(u) / w`; the k SMALLEST keys are the sample.
    * Inclusion probability scales with weight (E-S'62/ES'06 law:
    * equivalent to sequential weighted draws without replacement) — the
    * quality-weighted subset-selection shape ("keep the best 10M docs,
    * favoring high quality scores") that rate-based
    * [[stratifiedSample]]/[[tokenBudgetSample]] don't express.
    *
    * Scale shape: a pure row expression then `orderBy(key).limit(k)` —
    * Spark plans `TakeOrderedAndProject`, each task ships at most k rows,
    * never a global sort of the corpus. Keys are ROUNDED (10 dp) before
    * ranking with the id as tiebreak: ln differs in the last ulp across
    * libm implementations, and the rank must not flip on an ulp for the
    * DuckDB oracle to reproduce the exact set.
    *
    * Rows with non-positive weight are excluded (weight 0 = never
    * sampled, matching the w→0 limit of the inclusion law). Exact-k is
    * NOT growth-stable by nature — adding better-keyed rows displaces the
    * boundary; use the rate-based samplers when stability under growth
    * matters more than an exact count.
    */
  def weightedSample(
      df: DataFrame,
      id: Column,
      weight: Column,
      k: Int,
      salt: String = "wsample-v1"
  ): DataFrame = {
    require(k >= 1, s"sample size must be positive: $k")
    val h = Hashing.hash48(concat(id.cast("string"), lit(s":$salt")))
    // (h+1)/2^48: exact doubles (h+1 ≤ 2^48 is representable; the divisor
    // is a power of two), so u is bit-identical cross-engine
    val u = (h + 1L).cast("double") / lit(281474976710656.0)
    val key = round(-log(u) / weight.cast("double"), 10)
    df.where(weight.cast("double") > 0)
      .select(id.as("doc_id"), weight.cast("long").as("weight"), key.as("key"))
      .orderBy(col("key").asc, col("doc_id").asc)
      .limit(k)
  }

  /** [[weightedSample]] with an exact-k quota PER STRATUM — "keep the
    * best 1M docs per language, quality-weighted": the same deterministic
    * Efraimidis–Spirakis keys, ranked within each stratum instead of
    * globally.
    *
    * Scale shape: ONE shuffle on the stratum key; the rank-≤-k filter is
    * a `row_number` window that Spark 4's `WindowGroupLimit` rewrites
    * into a map-side per-partition top-k BEFORE the exchange, so the
    * shuffle carries at most k rows per (stratum, input partition), not
    * the corpus. Same rounded-key + id tiebreak determinism contract as
    * [[weightedSample]].
    */
  def weightedSamplePerStratum(
      df: DataFrame,
      id: Column,
      stratum: Column,
      weight: Column,
      kPerStratum: Int,
      salt: String = "wsample-v1"
  ): DataFrame = {
    require(kPerStratum >= 1, s"per-stratum sample size must be positive: $kPerStratum")
    val h = Hashing.hash48(concat(id.cast("string"), lit(s":$salt")))
    val u = (h + 1L).cast("double") / lit(281474976710656.0)
    val key = round(-log(u) / weight.cast("double"), 10)
    val w = Window.partitionBy(col("stratum")).orderBy(col("key").asc, col("doc_id").asc)
    df.where(weight.cast("double") > 0)
      .select(id.as("doc_id"), stratum.as("stratum"),
        weight.cast("long").as("weight"), key.as("key"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= kPerStratum)
  }

  /** Weighted epoch mixing: materialize the training mix for a data
    * recipe that up-/down-samples sources — weight 2.5 means every row
    * appears twice and a deterministic 50% of rows a third time; weight
    * 0.25 keeps a deterministic quarter. Fractional parts resolve by
    * salted-hash ticket (permille resolution), so the mix is exactly
    * reproducible, stable under corpus growth, and consistent with (but
    * decorrelated from, by salt) the other assembly stages.
    *
    * Emits (doc_id, stratum, copy_idx) with copy_idx ∈ [0, copies) —
    * compose with [[shuffleOrder]] on `doc_id·maxCopies + copy_idx` (or a
    * salted hash of the pair) to interleave the epochs. Pure per-row
    * expression + explode: ZERO exchanges, fuses into the surrounding
    * pipeline's scan.
    */
  def epochMix(
      df: DataFrame,
      id: Column,
      stratum: Column,
      weightByStratum: Map[String, Double],
      defaultWeight: Double,
      salt: String = "mix-v1"
  ): DataFrame = {
    def parts(w: Double): (Int, Int) = {
      require(w >= 0 && w <= 1000, s"mix weight out of range [0,1000]: $w")
      val f = math.floor(w).toInt
      val p = math.round((w - f) * 1000).toInt
      // permille 1000 would mean "always one more": fold into the floor
      if (p == 1000) (f + 1, 0) else (f, p)
    }
    val (f0, p0) = parts(defaultWeight)
    val floorCol = weightByStratum.foldLeft(lit(f0)) {
      case (acc, (s, w)) => when(stratum === s, parts(w)._1).otherwise(acc)
    }
    val permCol = weightByStratum.foldLeft(lit(p0)) {
      case (acc, (s, w)) => when(stratum === s, parts(w)._2).otherwise(acc)
    }
    val copies = floorCol + when(ticket(id, salt, 1000) < permCol, 1).otherwise(0)
    df.select(id.as("doc_id"), stratum.as("stratum"), copies.as("__copies"))
      .where(col("__copies") > 0)
      .select(
        col("doc_id"), col("stratum"),
        explode(sequence(lit(0), col("__copies") - 1)).as("copy_idx"))
  }

  /** Diversity sampling over learned cells: assign each vector to its
    * nearest centroid ([[graft.similarity.IVF.literalCell]] — fixed
    * literals, pure arithmetic) and keep at most `quota` rows per cell in
    * deterministic salted-hash order. Caps any one region of embedding
    * space: the head cluster contributes `quota` rows, same as the tail.
    * One exchange on the cell key; the rank filter is a top-k per group,
    * so Spark's WindowGroupLimit prunes each map partition to `quota`
    * rows BEFORE the shuffle.
    */
  def diversityByCell(
      emb: DataFrame,
      id: Column,
      vec: Column,
      centroids: Array[Array[Float]],
      quota: Int,
      salt: String = "div-v1"
  ): DataFrame = {
    val base = emb.select(
      id.as("vec_id"),
      graft.similarity.IVF.literalCell(vec, centroids).as("cell"),
      Hashing.hash48(concat(id.cast("string"), lit(s":$salt"))).as("tkt"))
    val w = Window.partitionBy(col("cell")).orderBy(col("tkt").asc, col("vec_id").asc)
    base
      .withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= quota)
      .select(col("vec_id"), col("cell"), col("pick_rank"))
  }

  /** Reproducible global shuffle order WITHOUT a global-sort bottleneck:
    * every row gets a salted 48-bit sort key, rows are range-bucketed by
    * the key's top bits (buckets are contiguous key ranges, so bucket
    * order IS global order; the hash is uniform by construction, so the
    * fixed boundaries balance — no sampling pass needed), each bucket
    * ranks locally, and per-bucket offsets shift local ranks to global
    * positions.
    *
    * The offsets come from a `nBuckets`-row aggregate joined to itself
    * below the final broadcast — O(B²) on a CONSTANT-size relation, never
    * a single-partition window over data. `row_number() OVER (ORDER BY
    * key)` — the naive form — serializes 100 TB through one task; this
    * plans the same result as two bucket-parallel passes.
    */
  def shuffleOrder(
      df: DataFrame,
      id: Column,
      salt: String = "order-v1",
      nBuckets: Int = 256
  ): DataFrame =
    rankBySaltedKey(df.select(id.as("doc_id")), col("doc_id"), col("doc_id"), salt, nBuckets)
      .select(col("doc_id"), col("sort_key"), col("global_pos"))

  /** The two-pass range-bucketed ranking core shared by [[shuffleOrder]]
    * and [[epochOrder]]: every row gets a salted 48-bit key from `key`,
    * rows range-bucket on the key's top bits, per-bucket counts
    * materialize ONCE ([[graft.Materialize]] — without it each side of
    * the offset self-join would re-scan the input), offsets come from
    * the broadcast non-equi self-join on the constant-size counts
    * relation, and local ranks shift to global positions. `tie` must be
    * unique per row — it breaks sort-key hash collisions
    * deterministically, in ITS own type's ordering (the oracle must
    * order by the same typed value). All passthrough columns of `df`
    * survive.
    */
  private def rankBySaltedKey(
      df: DataFrame,
      key: Column,
      tie: Column,
      salt: String,
      nBuckets: Int
  ): DataFrame = {
    require(nBuckets > 0 && nBuckets <= (1 << 24), "nBuckets must be in [1, 2^24]")
    // top bits of the 48-bit key: contiguous ranges, uniform occupancy
    val shift = 48 - (32 - Integer.numberOfLeadingZeros(nBuckets - 1 max 1))
    val keyed = df
      .withColumn("sort_key", Hashing.hash48(concat(key.cast("string"), lit(s":$salt"))))
      .withColumn("__tie", tie)
      .withColumn("bucket", shiftright(col("sort_key"), shift).cast("int"))
    val counts = graft.Materialize(
      keyed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt")))
    // offset(b) = rows in all lower buckets — tiny non-equi self-join on
    // the CONSTANT-size counts relation (≤ nBuckets rows), broadcast
    val offsets = counts.as("b")
      .join(broadcast(counts.as("p")), col("p.bucket") < col("b.bucket"), "left")
      .groupBy(col("b.bucket").as("bucket"))
      .agg(coalesce(sum(col("p.cnt")), lit(0L)).as("offset"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("sort_key").asc, col("__tie").asc)
    keyed
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("global_pos", col("offset") + col("__rn"))
      .drop("bucket", "__tie", "__rn", "offset")
  }

  /** Temperature-scaled mixture weights — the multilingual-sampling
    * standard (exponentiated smoothing, mBERT / XLM-R: sample stratum `s`
    * with `p_s ∝ n_s^α`): α < 1 flattens the size distribution so
    * head strata stop drowning the tail, α = 1 is proportional, α = 0
    * uniform. Emits per stratum the raw share, the α-share, and the
    * realized up/down-sampling `rate = p_α / p_raw` — feed the rates to
    * [[epochMix]] / [[stratifiedSample]] as the recipe weights
    * (rate > 1 = upsample the tail, < 1 = downsample the head).
    *
    * Scale shape: ONE map-combined stratum shuffle to the ≤ #strata
    * counts relation; the α-normalization runs over that tiny relation
    * (unordered window + broadcast-free scalar math). Rounded 4 dp for
    * the cross-engine contract.
    */
  def temperatureWeights(
      df: DataFrame,
      stratum: Column,
      measure: Column,
      alpha: Double
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1]: $alpha")
    val counts = df.select(stratum.as("stratum"), measure.cast("long").as("m"))
      .groupBy(col("stratum"))
      .agg(sum(col("m")).as("n_tokens"))
      .withColumn("__pow", pow(col("n_tokens").cast("double"), lit(alpha)))
    // scalar aggregate + broadcast (the mixPlan pattern): the totals are
    // one row over the ≤ #strata relation — never a single-partition
    // window exchange
    val totals = counts.agg(
      sum(col("n_tokens")).as("__tot"), sum(col("__pow")).as("__totp"))
    counts.crossJoin(broadcast(totals)).select(
      col("stratum"),
      col("n_tokens"),
      round(col("n_tokens") / col("__tot"), 4).as("p_raw"),
      round(col("__pow") / col("__totp"), 4).as("p_alpha"),
      round((col("__pow") / col("__totp")) / (col("n_tokens") / col("__tot")), 4)
        .as("rate"))
  }

  /** CURRICULUM order: a deterministic global training order that ramps
    * difficulty — rows sort by ascending `level` (an INTEGER difficulty
    * bucket the caller derives from any score: `round(quality*10)`,
    * length deciles, perplexity bands — Bengio et al., "Curriculum
    * Learning", ICML'09), and WITHIN a level by the same salted-hash
    * shuffle as [[shuffleOrder]], so each difficulty band is internally
    * decorrelated instead of leaking whatever order the score sort left.
    * Rows with a null level have no place in a curriculum and are
    * EXCLUDED (explicitly, not sorted to an arbitrary end).
    *
    * Scale shape: the [[shuffleOrder]] two-pass ranking generalized to a
    * composite (level, hash-bucket) range key — per-(level, bucket)
    * counts materialize once, offsets come from a broadcast non-equi
    * self-join over the ≤ #levels·nBuckets counts relation, and the only
    * data-sized exchange is the one (level, bucket) window. Never a
    * global sort.
    */
  def curriculumOrder(
      df: DataFrame,
      id: Column,
      level: Column,
      salt: String = "curriculum-v1",
      nBuckets: Int = 256
  ): DataFrame = {
    require(nBuckets > 0 && nBuckets <= (1 << 24), "nBuckets must be in [1, 2^24]")
    val shift = 48 - (32 - Integer.numberOfLeadingZeros(nBuckets - 1 max 1))
    val keyed = df
      .select(id.as("doc_id"), level.cast("int").as("level"))
      .where(col("level").isNotNull)
      .withColumn("sort_key",
        Hashing.hash48(concat(col("doc_id").cast("string"), lit(s":$salt"))))
      .withColumn("bucket", shiftright(col("sort_key"), shift).cast("int"))
    val counts = graft.Materialize(
      keyed.groupBy(col("level"), col("bucket")).agg(count(lit(1)).as("cnt")))
    val offsets = counts.as("b")
      .join(broadcast(counts.as("p")),
        col("p.level") < col("b.level") ||
          (col("p.level") === col("b.level") && col("p.bucket") < col("b.bucket")),
        "left")
      .groupBy(col("b.level").as("level"), col("b.bucket").as("bucket"))
      .agg(coalesce(sum(col("p.cnt")), lit(0L)).as("offset"))
    val w = Window.partitionBy(col("level"), col("bucket"))
      .orderBy(col("sort_key").asc, col("doc_id").asc)
    keyed
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(offsets), Seq("level", "bucket"))
      .withColumn("global_pos", col("offset") + col("__rn"))
      .select(col("doc_id"), col("level"), col("sort_key"), col("global_pos"))
  }

  /** The final training ORDER for a weighted data recipe — [[epochMix]]
    * composed with the [[shuffleOrder]] ranking over the (doc, copy)
    * universe, so epoch copies INTERLEAVE through the whole order instead
    * of repeating the corpus back to back (the property that keeps every
    * training window an unbiased sample of the mix). Output:
    * (doc_id, stratum, copy_idx, global_pos), reproducible from
    * (id, salts) alone. Plan cost: the mix is a zero-exchange expression,
    * so this is exactly the two-pass ranking — one bucket-window exchange
    * over the mixed rows plus the broadcast offsets.
    */
  def epochOrder(
      df: DataFrame,
      id: Column,
      stratum: Column,
      weightByStratum: Map[String, Double],
      defaultWeight: Double,
      mixSalt: String = "mix-v1",
      orderSalt: String = "order-v1",
      nBuckets: Int = 256
  ): DataFrame = {
    val mixed = epochMix(df, id, stratum, weightByStratum, defaultWeight, mixSalt)
    val copyKey =
      concat_ws("#", col("doc_id").cast("string"), col("copy_idx").cast("string"))
    rankBySaltedKey(mixed, copyKey, copyKey, orderSalt, nBuckets)
      .select(col("doc_id"), col("stratum"), col("copy_idx"), col("global_pos"))
  }

  /** Materialize an ordered dataset into training SHARDS on disk: rows
    * range-partition by `orderCol` (the [[shuffleOrder]]/[[epochOrder]]
    * `global_pos`) into `nShards` contiguous, internally sorted parquet
    * files under `path` — the layout a training loader consumes
    * sequentially, where shard k holds positions before shard k+1 and
    * rows within a file are in position order. Emits UP TO `nShards`
    * files: a range partition that receives no rows (input smaller than
    * nShards, or too few distinct order values) writes no file — loaders
    * should glob the directory, not enumerate shard indices.
    *
    * Scale shape: `repartitionByRange` samples the order column to place
    * balanced range boundaries (cheap: the column is a uniform rank) and
    * plans ONE range exchange; the in-file order is a per-partition sort,
    * never a global one. No coalesce(1), no driver collection — 100 TB
    * writes as `nShards` parallel tasks.
    */
  def writeTrainingShards(
      df: DataFrame,
      orderCol: Column,
      nShards: Int,
      path: String
  ): Unit = {
    require(nShards > 0, "nShards must be positive")
    df.repartitionByRange(nShards, orderCol.asc)
      .sortWithinPartitions(orderCol.asc)
      .write.mode("overwrite").parquet(path)
  }

  /** Token-budget sampling: walk each stratum's documents in deterministic
    * salted-hash order and keep rows while the running token total stays
    * within the stratum's budget — "give me 50 B tokens of code and 10 B
    * of forum text", the unit data recipes are actually written in
    * (counts of documents are a proxy; budgets are tokens). The kept set
    * is reproducible — the walk order is (id, salt)-determined, never
    * partitioning-determined. Unlike [[stratifiedSample]] it is NOT
    * growth-stable: a new row inserts into the walk at its hash position
    * and can push rows after it over the budget. Pin the corpus version
    * when the kept set must not move.
    *
    * The row that would cross the budget is dropped (strict `cum ≤
    * budget`), so the kept total never exceeds the budget.
    *
    * Scale shape: the naive form — `sum(tokens) OVER (PARTITION BY
    * stratum ORDER BY key)` — serializes each stratum through ONE task,
    * and strata are exactly the skewed key (one language is half the
    * corpus). Same cure as [[shuffleOrder]]: range-bucket the walk by the
    * key's top bits, aggregate per-(stratum, bucket) token sums (a
    * constant-size relation), turn those into per-bucket starting offsets
    * with a broadcast self-join, and run the running sum only WITHIN each
    * bucket — every pass is (stratum × bucket)-parallel.
    */
  def tokenBudgetSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      tokens: Column,
      budgetByStratum: Map[String, Long],
      defaultBudget: Long,
      salt: String = "budget-v1",
      nBuckets: Int = 256
  ): DataFrame = {
    require(defaultBudget >= 0 && budgetByStratum.values.forall(_ >= 0),
      "token budgets must be non-negative")
    require(nBuckets > 0 && nBuckets <= (1 << 24), "nBuckets must be in [1, 2^24]")
    val shift = 48 - (32 - Integer.numberOfLeadingZeros(nBuckets - 1 max 1))
    val keyed = df.select(
      id.as("doc_id"), stratum.as("stratum"), tokens.cast("long").as("n_tokens"),
      Hashing.hash48(concat(id.cast("string"), lit(s":$salt"))).as("sort_key"))
      .withColumn("__b", shiftright(col("sort_key"), shift).cast("int"))
    // per-(stratum, bucket) token totals: ≤ strata·nBuckets rows, computed
    // once ([[graft.Materialize]]) so the offset self-join cannot re-scan
    // the corpus
    val counts = graft.Materialize(
      keyed.groupBy(col("stratum"), col("__b"))
        .agg(sum(col("n_tokens")).as("cnt")))
    // null-safe stratum equality THROUGHOUT: a null stratum is a real
    // group (it samples under defaultBudget); plain === would silently
    // drop every null-stratum row at the joins below
    val offsets = counts.as("b")
      .join(broadcast(counts.as("p")),
        col("p.stratum") <=> col("b.stratum") && col("p.__b") < col("b.__b"), "left")
      .groupBy(col("b.stratum").as("os"), col("b.__b").as("ob"))
      .agg(coalesce(sum(col("p.cnt")), lit(0L)).as("offset"))
    val budgetCol = budgetByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
        when(col("stratum") === s, lit(b)).otherwise(acc)
      }
    val w = Window.partitionBy(col("stratum"), col("__b"))
      .orderBy(col("sort_key").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("__run", sum(col("n_tokens")).over(w))
      .join(broadcast(offsets),
        col("stratum") <=> col("os") && col("__b") === col("ob"))
      .withColumn("cum_tokens", col("offset") + col("__run"))
      .where(col("cum_tokens") <= budgetCol)
      .select(col("doc_id"), col("stratum"), col("n_tokens"), col("cum_tokens"))
  }

  /** Sequence PACKING, concat-and-chunk form — the GPT-style pretraining
    * layout: walk the corpus in a deterministic salted-hash order (the
    * shuffled order training wants anyway), concatenate every document's
    * tokens into one global stream, and cut the stream into fixed-length
    * training sequences of `seqLen` tokens. The output is the packing
    * MANIFEST a shard loader consumes: one row per (sequence, document)
    * overlap with the document's token slice (`tok_from`, `tok_to`,
    * half-open, doc-relative) and where that slice lands inside the
    * sequence (`pos`). A document longer than `seqLen` spans several
    * sequences; a short document shares its sequence with neighbours —
    * zero padding waste by construction (only the final sequence can be
    * short). Zero-token documents are dropped (they occupy no stream
    * positions).
    *
    * Scale shape: the only global state is each document's EXCLUSIVE
    * prefix sum of token counts in walk order — computed with the same
    * two-pass range-bucketed plan as [[shuffleOrder]] (the salted key is
    * uniform, so fixed top-bit buckets balance; per-bucket token totals
    * materialize ONCE and the offset self-join runs on that constant-size
    * relation) — never `sum() OVER (ORDER BY …)` serializing the corpus
    * through one task. The explode emits `n/seqLen + 1` rows per doc —
    * output is O(corpus tokens / seqLen + docs), a constant factor of the
    * input.
    */
  def packChunks(
      df: DataFrame,
      id: Column,
      tokens: Column,
      seqLen: Long,
      salt: String = "pack-v1",
      nBuckets: Int = 256
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(nBuckets > 0 && nBuckets <= (1 << 24), "nBuckets must be in [1, 2^24]")
    val shift = 48 - (32 - Integer.numberOfLeadingZeros(nBuckets - 1 max 1))
    val keyed = df.select(id.as("doc_id"), tokens.cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("sort_key", Hashing.hash48(concat(col("doc_id").cast("string"), lit(s":$salt"))))
      .withColumn("__b", shiftright(col("sort_key"), shift).cast("int"))
    val counts = graft.Materialize(
      keyed.groupBy(col("__b")).agg(sum(col("n_tokens")).as("cnt")))
    val offsets = counts.as("b")
      .join(broadcast(counts.as("p")), col("p.__b") < col("b.__b"), "left")
      .groupBy(col("b.__b").as("ob"))
      .agg(coalesce(sum(col("p.cnt")), lit(0L)).as("offset"))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("sort_key").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = lit(seqLen)
    keyed
      .withColumn("__run", sum(col("n_tokens")).over(w))
      .join(broadcast(offsets), col("__b") === col("ob"))
      .withColumn("__e", col("offset") + col("__run"))   // exclusive end in the token stream
      .withColumn("__s", col("__e") - col("n_tokens"))   // inclusive start
      .withColumn("seq_id", explode(sequence(floor(col("__s") / L).cast("long"),
        floor((col("__e") - 1) / L).cast("long"))))
      .select(
        col("seq_id"), col("doc_id"),
        (greatest(col("__s"), col("seq_id") * L) - col("__s")).as("tok_from"),
        (least(col("__e"), (col("seq_id") + 1) * L) - col("__s")).as("tok_to"),
        (greatest(col("__s"), col("seq_id") * L) - col("seq_id") * L).as("pos"))
  }

  /** Sequence packing, DOCUMENT-PRESERVING form — first-fit-contiguous
    * bin packing: walk each stratum's documents in the deterministic
    * salted-hash order and close the current bin whenever the next
    * document would overflow `binCapacity`; a document larger than the
    * capacity gets a bin of its own. Documents are never split across
    * bins (the layout for SFT / contrastive training, where truncating a
    * document mid-thought poisons the example — accept padding waste to
    * keep each document whole; [[packChunks]] is the zero-waste
    * stream-chunking alternative). Emits one row per kept document with
    * its `(stratum, shard, bin)` assignment and the bin's running fill.
    *
    * The greedy walk is inherently sequential, so the parallel unit is
    * the (stratum × shard) group: `subShards` splits each stratum into
    * that many independent walks keyed on the salted hash (shard =
    * `sort_key mod subShards`). Packing within a shard is still valid
    * packing — every bin stays within capacity; the only cost is up to
    * one partially-filled TAIL bin per shard instead of one per stratum,
    * a bounded waste that buys shard-parallelism. Each walk streams its
    * group through an O(1)-state fold (sorted-group iterator — nothing
    * accumulates in memory), so a shard of any length packs in one pass.
    * Size `subShards` so the biggest stratum's shards are task-sized
    * (e.g. 100 TB / 5 strata / 4096 shards ≈ 5 GB walks).
    *
    * Zero- and negative-token documents are dropped, like [[packChunks]].
    *
    * Id contract: `id` must be integral (the manifest carries `doc_id`
    * as long). A null or NON-NUMERIC id (string/UUID ids are common)
    * fails LOUDLY at execution — the silent alternative packs every row
    * with `doc_id = null` and the bin manifest is useless with no error.
    * String-id corpora should pack a surrogate (`xxhash64(id)`) and keep
    * the mapping, or use [[packChunks]], which preserves the id as-is.
    */
  def packGreedy(
      df: DataFrame,
      id: Column,
      stratum: Column,
      tokens: Column,
      binCapacity: Long,
      salt: String = "pack-v1",
      subShards: Int = 1
  ): DataFrame = {
    require(binCapacity > 0, "binCapacity must be positive")
    require(subShards > 0, "subShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
      when(id.cast("long").isNull,
        raise_error(concat(
          lit("packGreedy: null or non-numeric document id cannot pack "
            + "(the long cast would silently null the manifest): "),
          coalesce(id.cast("string"), lit("NULL")))))
        .otherwise(id.cast("long")).as("doc_id"),
      stratum.cast("string").as("stratum"),
      tokens.cast("long").as("n_tokens"),
      Hashing.hash48(concat(id.cast("string"), lit(s":$salt"))).as("sort_key"))
      .where(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("sort_key"), lit(subShards.toLong)).cast("int"))
      .as[PackDoc]
    keyed
      .groupByKey(r => (Option(r.stratum).getOrElse(""), r.shard))
      .flatMapSortedGroups($"sort_key", $"doc_id") { case ((_, _), docs) =>
        var bin = -1L
        var fill = 0L
        docs.map { r =>
          if (bin >= 0 && fill + r.n_tokens <= binCapacity) fill += r.n_tokens
          else { bin += 1; fill = r.n_tokens }
          PackAssign(r.stratum, r.shard, r.doc_id, r.n_tokens, bin, fill)
        }
      }
      .toDF()
  }
}

private[curation] case class PackDoc(
    doc_id: Long, stratum: String, n_tokens: Long, sort_key: Long, shard: Int)

private[curation] case class PackAssign(
    stratum: String, shard: Int, doc_id: Long, n_tokens: Long, bin: Long, bin_fill: Long)
