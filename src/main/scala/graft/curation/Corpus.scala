package graft.curation

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics — the "look at the whole corpus once"
  * operators a training-data pipeline runs between curation and assembly:
  * vocabulary building (tokenizer/BPE prep, stopword discovery), TF-IDF
  * salient-term extraction, and unigram-LM surprisal scoring (the shape of
  * a perplexity quality filter, with the corpus itself as the language
  * model).
  *
  * Everything tokenizes with [[TextFunctions.wsTokens]] (lower-cased
  * whitespace tokens), the same tokenizer the dedup and text-analysis
  * stages use, so one explode feeds every stage in a fused pipeline.
  *
  * Scale shape shared by all three: token rows are aggregated to
  * (doc, term) partial counts FIRST — map-side combine collapses the
  * per-token explosion before anything shuffles — and every corpus-wide
  * relation that joins back onto per-doc rows (the vocabulary, the total
  * token count) is vocabulary-sized, not corpus-sized.
  */
object Corpus {

  /** (doc_id, term) token rows — the single explode all stages share. */
  private def tokenRows(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(TextFunctions.wsTokens(text)).as("term"))

  /** Per-(doc, term) counts: the map-side-combinable base relation. */
  private def docTermCounts(docs: DataFrame, text: Column, id: Column): DataFrame =
    tokenRows(docs, text, id).groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Inverted index build: per term, its document frequency and the
    * top-`topK` postings by term frequency — the retrieval-side artifact
    * (BM25 serving, corpus search, "which documents dominate this term"
    * forensics) built from the same (doc, term, tf) base relation the
    * statistics stages share.
    *
    * Output: one row per kept posting — `term, df, doc_id, tf, rank`
    * (rank 1 = highest tf, doc_id ascending on ties — deterministic).
    * `minDf` drops hapax/rare terms (the long tail that would dominate
    * output size without serving value); `topK` bounds postings per term.
    *
    * Scale shape: the explode is combined map-side into (doc, term)
    * counts (shuffle 1 carries distinct pairs, not token occurrences);
    * the df count and the rank share ONE term exchange (two window
    * functions over the same partition key plan a single Exchange). The
    * df window needs every posting of the term, so map-side
    * WindowGroupLimit pruning does NOT apply here by design — pre-prune
    * with a `where(df >= minDf)` semi-join from [[vocabulary]] if the
    * rare-term tail dominates a corpus.
    */
  def invertedIndex(
      docs: DataFrame,
      text: Column,
      id: Column,
      topK: Int = 3,
      minDf: Long = 1L
  ): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val tf = docTermCounts(docs, text, id)
    val byTerm = Window.partitionBy(col("term"))
    val ranked = byTerm.orderBy(col("tf").desc, col("doc_id").asc)
    tf.withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rank", row_number().over(ranked))
      .where(col("rank") <= topK && col("df") >= minDf)
      .select(col("term"), col("df"), col("doc_id"), col("tf"), col("rank"))
  }

  /** Vocabulary coverage CURVE: corpus-level OOV rate at each candidate
    * vocabulary-size cut in ONE pass — the "how big must the tokenizer
    * vocab be" decision readout ([[vocabCoverage]] scores one frozen
    * vocab per doc; this sweeps sizes over the whole batch). The vocab
    * must carry the `rank` column [[vocabulary]] emits (1 = most
    * frequent): a token is covered at cut c iff its rank ≤ c.
    *
    * Scale shape: the batch explodes once into map-combined (term, tf)
    * counts, joins the broadcast-sized ranked vocab once, then ONE
    * conditional-sum aggregate emits every cut (the cuts spine is a
    * broadcast cross of ≤ |cuts| rows; the exchange after the map-side
    * combine carries |cuts| partial rows). Never a pass per cut.
    */
  def coverageCurve(
      docs: DataFrame,
      text: Column,
      id: Column,
      vocab: DataFrame,
      cuts: Seq[Int]
  ): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_ > 0), s"cuts must be positive: $cuts")
    require(cuts.distinct == cuts && cuts == cuts.sorted, s"cuts must be sorted distinct: $cuts")
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = vocab.select(col("term"), col("rank"))
    val termCounts = tokenRows(docs, text, id)
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .join(broadcast(ranked), Seq("term"), "left")
    val cutsDf = broadcast(cuts.toDF("cut"))
    termCounts.crossJoin(cutsDf)
      .groupBy(col("cut"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(when(col("rank").isNull || col("rank") > col("cut"), col("tf"))
          .otherwise(0L)).as("n_oov"))
      .select(col("cut"), col("n_tokens"), col("n_oov"),
        when(col("n_tokens") > 0, round(col("n_oov") / col("n_tokens"), 4))
          .otherwise(lit(0.0)).as("oov_rate"))
  }

  /** Population Stability Index drift between a REFERENCE corpus and the
    * current batch over a binned numeric column — the numeric-feature
    * complement of [[sourceDivergence]]'s vocabulary KL: lengths, quality
    * scores, and perplexities drift long before the vocabulary does, and
    * PSI over fixed bins is the standard monitoring statistic for them
    * (PSI < 0.1 stable, 0.1–0.25 watch, > 0.25 act — credit-scoring
    * practice, adopted by ML monitoring).
    *
    * Bins are `bins` equal-width cells over the CALLER-FIXED `[lo, hi)`
    * (out-of-range values clamp into the edge bins — drift monitoring
    * needs the bin edges frozen across runs, which data-derived ranges
    * would break); counts get add-half (Jeffreys) smoothing so empty
    * bins contribute finite terms with no arbitrary epsilon.
    *
    * Output is PER-BIN: `(bin, n_ref, n_cur, p_ref, p_cur, term)` with
    * `term = (p_cur − p_ref)·ln(p_cur / p_ref)`; `PSI = Σ term`. The
    * per-bin form is deliberate — each term is one fixed double
    * expression over integer counts (engine-deterministic), while a
    * cross-bin sum would depend on float summation order; callers sum
    * the handful of bins.
    *
    * Scale shape: one map-combined bin count per side (exchanges carry
    * ≤ `bins` rows), totals via scalar aggregate, the bins spine
    * generated — never a data shuffle.
    */
  def psiDrift(
      ref: DataFrame,
      refValue: Column,
      cur: DataFrame,
      curValue: Column,
      bins: Int,
      lo: Double,
      hi: Double
  ): DataFrame = {
    require(bins >= 2, s"need >= 2 bins: $bins")
    require(lo < hi, s"need lo < hi: [$lo, $hi)")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, v: Column, name: String): DataFrame =
      df.select(least(lit(bins - 1), greatest(lit(0),
          floor((v.cast("double") - lo) / width).cast("int"))).as("bin"))
        .where(v.isNotNull)
        .groupBy(col("bin")).agg(count(lit(1)).as(name))
    val spark = ref.sparkSession
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(binned(ref, refValue, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, curValue, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val p = (col("n_ref") + 0.5) / (col("t_ref") + 0.5 * bins)
    val q = (col("n_cur") + 0.5) / (col("t_cur") + 0.5 * bins)
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        (round(p, 6) + lit(0.0)).as("p_ref"),
        (round(q, 6) + lit(0.0)).as("p_cur"),
        (round((q - p) * log(q / p), 6) + lit(0.0)).as("term"))
  }

  /** Corpus vocabulary: the `topN` terms by total occurrence count, with
    * document frequency and a dense 1-based rank (ties broken by term so
    * the cut is deterministic).
    *
    * Plan shape: one term-key shuffle with map-side partial aggregation
    * (the token explosion never crosses the wire un-combined), then a
    * `TakeOrderedAndProject` global top-N — each task ships at most `topN`
    * rows, so the "global sort" touches O(partitions · topN) rows, never
    * the vocabulary. The rank window runs AFTER the limit, over a
    * ≤ `topN`-row relation — bounded by the parameter, not the data.
    */
  def vocabulary(
      docs: DataFrame,
      text: Column,
      id: Column,
      topN: Int = 100
  ): DataFrame = {
    require(topN >= 1, "topN must be positive")
    val stats = docTermCounts(docs, text, id)
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("df"))
    val top = stats.orderBy(col("tf").desc, col("term").asc).limit(topN)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("tf").desc, col("term").asc)))
  }

  /** Per-document salient terms by smoothed TF-IDF:
    * `score = tf · ln((N + 1) / (df + 1))`, top `k` terms per document.
    *
    * Ranking is by the ROUNDED score (4 decimals) with the term as
    * tie-break: the raw score is a product with a transcendental ln, and
    * two independent engines may disagree in the last ulp — rounding
    * before ranking makes the cut reproducible cross-engine, which is the
    * property a dataset card has to state.
    *
    * Plan shape: ONE token explode → (doc, term) map-side-combined counts
    * → df via an unordered term-partition window → 1-row doc count
    * broadcast → per-doc window for the top-k. The corpus text is scanned
    * and exploded exactly once.
    */
  def tfIdf(
      docs: DataFrame,
      text: Column,
      id: Column,
      k: Int = 3
  ): DataFrame = {
    require(k >= 1, "k must be positive")
    val dt = docTermCounts(docs, text, id)
    // df via an unordered window over the term partition, NOT a
    // dt-groupBy-join: a join's derived side embeds a second copy of the
    // whole explode+aggregate subplan (Spark's exchange reuse cannot match
    // it once join null-filters specialize one branch), which at 100 TB
    // means exploding the corpus twice. The window is one term exchange
    // over the already-combined (doc, term) rows.
    val withDf = dt.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    // N is a 1-row count of the doc table — a pruned id-only scan, no
    // explode — broadcast under the cross join
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val scored = withDf
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** Unigram-LM surprisal per document: mean information content of the
    * document's tokens under the corpus's own unigram distribution,
    * `bits = log2(total) − Σ tf_dt · log2(cnt_t) / n_tokens`. High bits =
    * rare vocabulary (or noise); low bits = boilerplate — the decision
    * axis of a perplexity filter, computed with the corpus itself as the
    * model so no external LM is needed. Documents with zero tokens score
    * 0 bits over 0 tokens.
    *
    * Plan shape: ONE token explode → (doc, term) map-side-combined counts
    * → corpus term counts via an unordered term-partition window →
    * per-doc aggregate; the 1-row corpus total (a no-explode kernel scan)
    * joins by broadcast. Nothing corpus-sized is ever broadcast and the
    * token explosion runs exactly once.
    */
  def unigramSurprisal(
      docs: DataFrame,
      text: Column,
      id: Column
  ): DataFrame = {
    val dt = docTermCounts(docs, text, id)
    // corpus term counts via an unordered term-partition window (see
    // tfIdf: a groupBy-join would re-explode the corpus); the corpus
    // TOTAL comes from the wsTokenCount kernel over the raw doc table —
    // a scan with a per-row expression and a 1-row partial aggregate,
    // no explode — so the expensive token explosion runs exactly once
    val withCnt = dt.withColumn("cnt",
      sum(col("tf")).over(Window.partitionBy(col("term"))))
    val total = docs.select(
      sum(TextFunctions.wsTokenCount(text).cast("long")).as("total"))
    val perDoc = withCnt
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(
          log2(max(col("total"))) -
            sum(col("tf") * log2(col("cnt"))) / sum(col("tf")),
          4
        ).as("bits_per_token"))
    docs.select(id.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("bits_per_token"), lit(0.0)).as("bits_per_token"))
  }

  /** Bigram-LM surprisal per document: mean `-log2 P(w_i | w_{i-1})`
    * under the corpus's own maximum-likelihood bigram model,
    * `P(w|v) = c(v w) / c(v ·)` — the context-aware upgrade of
    * [[unigramSurprisal]]'s quality axis: word salad scores HIGH here
    * even when its unigrams are common (the Gopher/perplexity-filter
    * signal), boilerplate scores low. Every observed bigram has count
    * ≥ 1 under its own corpus, so the MLE needs no smoothing to score.
    * Documents with fewer than 2 tokens have no bigrams and score 0
    * over 0.
    *
    * Plan shape: bigrams form per row as a zero-shuffle array expression
    * (zip of the token array with its own tail — no lead() window, no
    * per-token explode), then ONE bigram explode feeds BOTH corpus
    * counts as unordered window aggregates (bigram key and prefix key —
    * the two exchanges), then one doc-key aggregate. The corpus text is
    * scanned and exploded exactly once; nothing corpus-sized broadcasts.
    * The window keys are the 48-bit portable hashes of the bigram /
    * prefix strings, not the strings themselves: both exchanges of the
    * exploded stream then carry fixed 8-byte longs and the window sorts
    * compare binary longs instead of variable-length UTF-8. At sf0.1
    * this is noise-neutral (1.5 s, overhead-dominated: 266k bigrams) —
    * the narrow key targets the 100 TB exchange, where multi-word UTF-8
    * keys dominate shuffle bytes and sort compares. Counting by hash is
    * value-identical cross-engine — the oracle hashes with the same
    * md5-fold, so even a 48-bit collision (birthday-bounded ≈ 10^-3 per
    * pair-of-strings at 10^6 distinct bigrams) collapses the same two
    * strings in both engines.
    */
  def bigramSurprisal(
      docs: DataFrame,
      text: Column,
      id: Column
  ): DataFrame = {
    val toks = TextFunctions.wsTokens(text)
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("pre"), concat(a, lit(" "), b).as("bg")))
    val rows = docs.select(id.as("doc_id"), explode(bigrams).as("p"))
      .select(col("doc_id"),
        graft.functions.Hashing.hash48(col("p.pre")).as("hp"),
        graft.functions.Hashing.hash48(col("p.bg")).as("hb"))
    val counted = rows
      .withColumn("cb", count(lit(1)).over(Window.partitionBy(col("hb"))))
      .withColumn("cp", count(lit(1)).over(Window.partitionBy(col("hp"))))
    val perDoc = counted
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(sum(log2(col("cp")) - log2(col("cb"))) / count(lit(1)), 4)
          .as("bits_per_bigram"))
    docs.select(id.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bits_per_bigram"), lit(0.0)).as("bits_per_bigram"))
  }

  /** Collocation mining: the corpus's `topN` adjacent-token bigrams by
    * pointwise mutual information — the multiword-expression discovery
    * pass a tokenizer/vocabulary pipeline runs before merging tokens
    * ("new york", "machine learning"), and a boilerplate detector's
    * cheapest signal (navigation chrome scores as impossibly-glued
    * pairs). PMI is over the bigram stream itself:
    * `log2(c(ab)·N / (c(a·)·c(·b)))` with `N` the total bigram count and
    * the marginals counted as first/second POSITION of a bigram —
    * everything derives from one counted relation, no separate unigram
    * pass. `minCount` floors the bigram count (PMI's low-frequency
    * pathology: a pair seen once scores near the maximum).
    *
    * Scale shape: the exploded bigram stream crosses the wire ONCE, as a
    * map-side-combined (w1, w2) count — the grouped relation is
    * distinct-bigram-sized (vocabulary², sparse) and is eagerly
    * materialized ([[graft.Materialize]]): the scalar `N` branch and the
    * marginal windows both read the materialized counts, so the corpus
    * is scanned/exploded/shuffled exactly once (without it the 1-row
    * total embeds a SECOND full copy of the scan+explode+count subplan —
    * a second pass over 100 TB of text for one number). Both marginals
    * are unordered-window sums OVER the counts relation, `N` is a 1-row
    * broadcast off it. The final top-N is TakeOrdered (each task ships
    * ≤ `topN` rows), ranked on the ROUNDED pmi with the bigram string as
    * tiebreak, so the cut cannot flip on a last-ulp log2 difference
    * between engines (the q62 round-then-rank rule).
    */
  def pmiCollocations(
      docs: DataFrame,
      text: Column,
      minCount: Int = 5,
      topN: Int = 50
  ): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    require(topN >= 1, "topN must be positive")
    val toks = TextFunctions.wsTokens(text)
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val counts = graft.Materialize(docs.select(explode(bigrams).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair")))
    val marginals = counts
      .withColumn("n_left", sum(col("n_pair")).over(Window.partitionBy(col("w1"))))
      .withColumn("n_right", sum(col("n_pair")).over(Window.partitionBy(col("w2"))))
    val total = counts.agg(sum(col("n_pair")).as("n_total"))
    // log-sum form, never the product: c(ab)·N overflows BIGINT at corpus
    // scale (N ~ 10^13 bigrams at 100 TB), and the sum-of-log2 evaluates
    // in the same term order in every engine
    marginals.crossJoin(broadcast(total))
      .where(col("n_pair") >= minCount)
      .select(
        concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        col("n_pair"),
        round(
          log2(col("n_pair")) + log2(col("n_total"))
            - log2(col("n_left")) - log2(col("n_right")), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topN)
  }

  /** Fixed-width histogram of a per-document measure (token count, quality
    * score scaled to int, …) with cumulative document fractions — how
    * length/quality filter thresholds are actually calibrated at corpus
    * scale: any quantile reads off the `cum_frac` column with `binWidth`
    * resolution, from ONE aggregation pass. The exact alternative
    * (`percentile` / a global sort) shuffles the corpus; this shuffles the
    * ≤ #bins histogram.
    *
    * Bins are `[lo, lo + binWidth)`, `bin_lo = floor(m / binWidth) ·
    * binWidth` (negatives land correctly via floor). Exact integer counts
    * and a rounded fraction — deterministic in every engine, no
    * interpolation rule to disagree on. Null measures are dropped before
    * binning (see [[binCounts]]) so counts conserve and `cum_frac` ends
    * at exactly 1.0.
    *
    * Plan shape: per-row bin expression → map-side-combined count on the
    * bin key (the exchange carries bins, not documents) → cumulative sums
    * via a broadcast non-equi self-join on the CONSTANT-size bin relation
    * (the [[Assembly.shuffleOrder]] offsets pattern) — an ordered running
    * window would plan a single-partition exchange instead; O(B²) on ≤
    * #bins rows beats a serialization point as a habit, and the eager
    * materialization ([[graft.Materialize]]) keeps the self-join from
    * re-scanning the corpus.
    */
  def histogram(
      docs: DataFrame,
      measure: Column,
      binWidth: Long
  ): DataFrame =
    histogramFromBins(binCounts(docs, measure, binWidth))

  /** The pre-aggregated (bin_lo, n_docs) half of [[histogram]] — public so
    * a calibration over a FILTERED corpus (post-dedup, post-quality-gate)
    * can compute its bins once where the filtered rows are already in
    * hand, persist them, union increments, and feed
    * [[histogramFromBins]] — mirroring how [[graft.dedup.Dedup
    * .dropByClusters]] shares CC labels instead of recomputing them per
    * consumer.
    *
    * Null measures are DROPPED here, before binning: a null bin would
    * vanish from the cumulative self-join (`null <= x` is null) while
    * still counting toward the total, leaving `cum_frac` short of 1.0.
    * Dropping them keeps counts conserved — `sum(n_docs)` is exactly the
    * non-null-measure row count and `cum_frac` ends at 1.0. Count nulls
    * separately if they matter (they usually mean "unmeasurable row",
    * e.g. null text).
    */
  def binCounts(
      docs: DataFrame,
      measure: Column,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    docs
      .select((floor(measure.cast("long") / binWidth) * binWidth).as("bin_lo"))
      .where(col("bin_lo").isNotNull)
      .groupBy(col("bin_lo")).agg(count(lit(1)).as("n_docs"))
  }

  /** Read a quantile threshold off a cumulative histogram: the smallest
    * `bin_lo` whose `cum_frac` reaches `q` — the calibration readout
    * ("the p10 length floor") with `binWidth` resolution. Runs one
    * aggregate over the ≤ #bins relation (a driver-side scalar is the
    * POINT — the threshold feeds a filter expression). `None` when no bin
    * reaches `q`: an empty histogram, or rounding keeping every cum_frac
    * below a q chosen at the far tail.
    */
  def quantileFromBins(hist: DataFrame, q: Double): Option[Long] = {
    require(q > 0.0 && q <= 1.0, s"quantile must be in (0, 1], got $q")
    Option(hist.where(col("cum_frac") >= q).agg(min(col("bin_lo"))).head().get(0))
      .map(_.asInstanceOf[Long])
  }

  /** Cumulative fractions over a pre-aggregated (bin_lo, n_docs) relation
    * ([[binCounts]]' output shape). Duplicate `bin_lo` rows — the normal
    * case when persisted increments are UNIONED together — are summed
    * here before cumulating, so incremental feeding just works (without
    * the re-aggregate, each duplicate would double-count in the non-equi
    * self-join and push `cum_frac` past 1.0 with no error raised). The
    * broadcast self-join runs on the ≤ #bins relation, never the corpus;
    * [[graft.Materialize]] keeps the three references to `bins` from
    * re-executing whatever produced it.
    */
  def histogramFromBins(binRows: DataFrame): DataFrame = {
    val bins = graft.Materialize(
      binRows.groupBy(col("bin_lo")).agg(sum(col("n_docs")).as("n_docs")))
    val total = bins.agg(sum(col("n_docs")).as("total"))
    bins.as("b")
      .join(broadcast(bins.as("p")), col("p.bin_lo") <= col("b.bin_lo"))
      .groupBy(col("b.bin_lo").as("bin_lo"), col("b.n_docs").as("n_docs"))
      .agg(sum(col("p.n_docs")).as("__cum"))
      .crossJoin(broadcast(total))
      .select(
        col("bin_lo"),
        col("n_docs"),
        round(col("__cum") / col("total"), 6).as("cum_frac"))
  }

  /** Gopher-style quality-rule funnel — the one-page filter report a
    * curation run produces before dropping anything: one row per rule
    * with how many documents fail it, plus `any_rule` (docs failing at
    * least one) and `pass_all` (the survivors). Shares are of the corpus.
    * (Gopher/MassiveText-style threshold filters, Rae et al. 2021
    * §A1.1; thresholds are parameters because they are corpus-tuned,
    * with defaults tuned to the synthetic tables.)
    *
    * Rules: `too_short`/`too_long` (whitespace token count outside
    * [minTokens, maxTokens]), `word_length` (mean token length outside
    * `avgTokLenBand`, the single-space-separation estimate
    * `(chars - (tokens-1)) / tokens`), `non_english`
    * ([[TextFunctions.langId]] ≠ "en"), `low_stopword` (English stopword
    * ratio below `minStopRatio`), `repetitive` (repeated-token fraction
    * `1 - distinct/tokens` above `maxRepeatRatio`). Empty/null documents
    * have zero tokens: they fail `too_short`, `word_length` (mean length
    * 0), `low_stopword`, and `non_english` (language "und"), and pass
    * `too_long`/`repetitive` — every ratio is defined, nothing is null.
    *
    * Plan shape: ONE corpus scan — the token/distinct counts come from
    * the fused [[graft.plans.RepStatsF]] kernel and the language marker
    * counts from [[graft.plans.LangCountsF]] (whose "en" slot IS the
    * stopword count — [[TextFunctions.stopwordCount]] uses the same
    * marker list), so every rule is arithmetic over two kernel structs —
    * into a single partial-aggregated global sum (a 1-row relation; no
    * shuffle wider than the partial-agg merge). The funnel rows are then
    * an explode of that one row. Adding a rule adds a conditional sum,
    * not a pass. (The first cut used the column-form
    * [[TextFunctions.langId]]/[[TextFunctions.stopwordCount]]: both are
    * single-referenced, so projection collapse inlined each tokenizing
    * chain into the rule AND its `__any` copy — 2.6 s at sf0.1 vs 0.5 s
    * for the kernel form, which multi-references the kernel output and
    * therefore evaluates it once.)
    */
  def qualityFunnel(
      docs: DataFrame,
      text: Column,
      minTokens: Int = 30,
      maxTokens: Int = 90,
      avgTokLenBand: (Double, Double) = (4.2, 4.8),
      minStopRatio: Double = 0.02,
      maxRepeatRatio: Double = 0.6
  ): DataFrame = {
    val flags = funnelFlags(docs, text, Nil,
      minTokens, maxTokens, avgTokLenBand, minStopRatio, maxRepeatRatio)
    val one = flags.agg(funnelAggCols.head, funnelAggCols.tail: _*)
    one.select(explode(funnelRows).as("r"), col("__total"))
      .select(
        col("r.rule").as("rule"),
        col("r.n_docs").as("n_docs"),
        when(col("__total") > 0, round(col("r.n_docs") / col("__total"), 4))
          .otherwise(lit(0.0)).as("share"))
  }

  /** [[qualityFunnel]] GROUPED BY SOURCE — the "which domain is rotting"
    * report: per-rule fail counts and shares for every source, from the
    * SAME single kernel-projection pass (one extra group column on the
    * one shuffle; output ≤ #sources × #rules rows). The monitoring view
    * a crawl owner reads per ingest: a source whose `repetitive` or
    * `non_english` share jumps between versions is drifting, no matter
    * how healthy the corpus-wide funnel still looks.
    */
  def qualityFunnelBySource(
      docs: DataFrame,
      text: Column,
      source: Column,
      minTokens: Int = 30,
      maxTokens: Int = 90,
      avgTokLenBand: (Double, Double) = (4.2, 4.8),
      minStopRatio: Double = 0.02,
      maxRepeatRatio: Double = 0.6
  ): DataFrame = {
    val flags = funnelFlags(docs, text, Seq("source" -> source),
      minTokens, maxTokens, avgTokLenBand, minStopRatio, maxRepeatRatio)
    val per = flags.groupBy(col("source"))
      .agg(funnelAggCols.head, funnelAggCols.tail: _*)
    per.select(col("source"), explode(funnelRows).as("r"), col("__total"))
      .select(
        col("source"),
        col("r.rule").as("rule"),
        col("r.n_docs").as("n_docs"),
        when(col("__total") > 0, round(col("r.n_docs") / col("__total"), 4))
          .otherwise(lit(0.0)).as("share"))
  }

  private val FunnelRuleNames = Seq(
    "too_short", "too_long", "word_length", "non_english", "low_stopword",
    "repetitive")

  /** The shared per-rule aggregate columns over a [[funnelFlags]] relation. */
  private def funnelAggCols: Seq[Column] =
    FunnelRuleNames.map(name => coalesce(sum(col(name)), lit(0L)).as(name)) :+
      coalesce(sum(col("__any")), lit(0L)).as("any_rule") :+
      count(lit(1)).as("__total")

  /** The funnel rows (per rule + the two rollups) over the aggregated
    * counts, as an array-of-structs ready to explode.
    */
  private def funnelRows: Column = array(
    (FunnelRuleNames.map { name =>
      struct(lit(name).as("rule"), col(name).as("n_docs"))
    } :+ struct(lit("any_rule").as("rule"), col("any_rule").as("n_docs")) :+
      struct(lit("pass_all").as("rule"),
        (col("__total") - col("any_rule")).as("n_docs"))): _*)

  /** One kernel-projection pass producing the per-document rule-fail flag
    * columns (+ `__any`), with optional passthrough key columns — the
    * shared core of [[qualityFunnel]] and [[qualityFunnelBySource]].
    */
  private def funnelFlags(
      docs: DataFrame,
      text: Column,
      keys: Seq[(String, Column)],
      minTokens: Int,
      maxTokens: Int,
      avgTokLenBand: (Double, Double),
      minStopRatio: Double,
      maxRepeatRatio: Double
  ): DataFrame = {
    val rs = org.apache.spark.sql.GraftBridge.column(
      graft.plans.RepStatsF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string"))))
    val lc = org.apache.spark.sql.GraftBridge.column(
      graft.plans.LangCountsF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string"))))
    val base = docs.select(
      keys.map { case (n, c) => c.as(n) } ++ Seq(
        rs.as("__rs"),
        lc.as("__lc"),
        length(text).cast("double").as("__n_chars"),
        TextFunctions.cjkCount(text).cast("long").as("__cjk")): _*)
    val nT = coalesce(col("__rs.n_tokens"), lit(0L)).cast("double")
    val nD = coalesce(col("__rs.n_distinct"), lit(0L)).cast("double")
    def score(i: Int): Column = coalesce(element_at(col("__lc"), i + 1), lit(0L))
    val Seq(sEn, sFr, sEs, sDe) = (0 until 4).map(score)
    // "en" survives TextFunctions.langId's decision fold iff it has a
    // nonzero score no later language strictly beats, and the doc is not
    // CJK-dominant — the negation is pure long arithmetic, no re-tokenize
    val nonEnglish = (col("__cjk") * 5 > col("__n_chars")) ||
      sEn === 0 || sFr > sEn || sEs > sEn || sDe > sEn
    val avgTok = when(nT > 0, (col("__n_chars") - (nT - 1)) / nT).otherwise(lit(0.0))
    val stopRatio = when(nT > 0, sEn.cast("double") / nT).otherwise(lit(0.0))
    val repRatio = when(nT > 0, lit(1.0) - nD / nT).otherwise(lit(0.0))
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (nT < minTokens),
      "too_long" -> (nT > maxTokens),
      "word_length" -> (avgTok < avgTokLenBand._1 || avgTok > avgTokLenBand._2),
      "non_english" -> nonEnglish,
      "low_stopword" -> (stopRatio < minStopRatio),
      "repetitive" -> (repRatio > maxRepeatRatio))
    // __any recomputes the conditions rather than referencing the sibling
    // aliases (lateral column resolution) — codegen CSE collapses the
    // duplication, and the projection stays portable
    base.select(
      keys.map { case (n, _) => col(n) } ++
        rules.map { case (name, cond) => cond.cast("long").as(name) } :+
        greatest(rules.map { case (_, cond) => cond.cast("long") }: _*).as("__any"): _*)
  }

  /** Corpus snapshot diff — the audit between two dataset versions a
    * data-ops owner reads before promoting a release: per-document
    * status `added` (id only in the new version), `removed` (only in the
    * old), `modified` (both, content hash differs), `unchanged`. Run a
    * `groupBy("status").count()` over the result for the one-line
    * summary; the per-doc relation is the drill-down and the input to
    * incremental downstream work (re-embed only `added`/`modified`).
    *
    * Scale shape: ONE full-outer hash equijoin on the id — both sides
    * reduce to (id, hash) projections before the shuffle, so the join
    * carries two thin columns, not document bodies; with both versions
    * bucketed by id on storage the exchange disappears entirely. The
    * hash expression is the caller's ([[TextFunctions.normalize]]-then-
    * md5 to ignore formatting churn, raw md5 for byte-exact audits).
    */
  /** Per-source token-distribution drift: KL(P_source ‖ P_corpus) in
    * bits, with the source's token count — the mixture-health companion
    * to [[graft.curation.Assembly.mixPlan]]. mixPlan sizes HOW MUCH of
    * each source to take; this measures how DIFFERENT each source's
    * language is from the blend, so a mixture owner can see which
    * sources add diversity (high KL: code, legalese) versus which are
    * redundant with the average (near-zero KL) — and spot drift when a
    * re-crawled source's KL jumps between versions. KL against the
    * corpus (a mixture containing the source) is always finite: every
    * source term has corpus mass, so no smoothing constant is needed.
    *
    * Scale shape: the ONLY corpus-sized work is one (source, term)
    * groupBy over the token explosion, map-side combined. Everything
    * after — term marginals, source totals, the corpus total, the log
    * sum — runs over the vocabulary-sized count relation (unordered
    * windows, broadcast scalar). The sum is in log2 space per term
    * (never a probability product), and callers compare the rounded
    * `kl_bits`, so a last-ulp summation-order difference between
    * engines cannot flip a reading.
    */
  def sourceDivergence(docs: DataFrame, text: Column, source: Column): DataFrame = {
    val counts = docs
      .select(source.as("source"), explode(TextFunctions.wsTokens(text)).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n_st"))
    val m = counts
      .withColumn("n_t", sum(col("n_st")).over(Window.partitionBy(col("term"))))
      .withColumn("n_s", sum(col("n_st")).over(Window.partitionBy(col("source"))))
    val total = counts.agg(sum(col("n_st")).as("n_total"))
    m.crossJoin(broadcast(total))
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_tokens"),
        round(sum(
          col("n_st").cast("double") / col("n_s") *
            (log2(col("n_st")) + log2(col("n_total"))
              - log2(col("n_s")) - log2(col("n_t")))), 4).as("kl_bits"))
      .orderBy(col("source"))
  }

  def versionDiff(
      oldVersion: DataFrame,
      newVersion: DataFrame,
      id: Column,
      contentHash: Column
  ): DataFrame = {
    val o = oldVersion.select(id.as("doc_id"), contentHash.as("__oh"))
    val n = newVersion.select(id.as("doc_id"), contentHash.as("__nh"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "modified")
          .otherwise("unchanged").as("status"))
  }

  /** The corpus's unigram term counts `(term, cnt)` — the reference-LM
    * relation [[surprisalAgainst]] scores against, and the payload
    * [[saveTermCounts]] persists. One explode + one map-combined term
    * shuffle.
    */
  def termCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextFunctions.wsTokens(text)).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))

  /** Persist a batch's term counts into a bucketed reference-LM table —
    * the incremental shape of the corpus-statistics stage (the
    * [[graft.dedup.Dedup.saveBandIndex]] pattern at the LM tier):
    * appends are DELTAS (yesterday's corpus is never re-tokenized), and
    * the additive semantics make aggregate-on-read exact.
    * Bucketed on `term`, so both the read-side aggregation and the
    * [[surprisalAgainst]] scoring join plan NO exchange on the LM side
    * however large history grows.
    */
  def saveTermCounts(
      docs: DataFrame,
      text: Column,
      table: String,
      buckets: Int = 64
  ): Unit =
    graft.sources.Storage.writeBucketed(
      termCounts(docs, text), table, "term", buckets, mode = "append")

  /** The aggregated reference LM from a [[saveTermCounts]] table: delta
    * rows sum per term — on the bucketed layout the grouping is satisfied
    * by the table's own partitioning (no exchange).
    */
  def termCountsFromTable(
      spark: org.apache.spark.sql.SparkSession,
      table: String
  ): DataFrame =
    spark.table(table).groupBy(col("term")).agg(sum(col("cnt")).as("cnt"))

  /** Per-document out-of-vocabulary rate against a FROZEN vocabulary
    * relation (a [[vocabulary]] cut, a tokenizer's word list, or any
    * (term, …) table): `(doc_id, n_tokens, n_oov, oov_rate)` — the
    * coverage gate run before committing to a tokenizer vocabulary, and
    * the drift monitor after ("this crawl's OOV rate doubled" =
    * language/domain shift the quality rules may not see). Zero-token
    * docs rate 0 over 0.
    *
    * Scale shape: the batch explodes once into map-combined (doc, term)
    * counts, LEFT-joins the vocabulary-sized term set (distinct'd — a
    * duplicated vocab row must not double-count tokens), one doc-key
    * aggregate. The vocabulary side never exchanges when read from a
    * bucketed table.
    */
  def vocabCoverage(
      docs: DataFrame,
      text: Column,
      id: Column,
      vocab: DataFrame
  ): DataFrame = {
    val vt = vocab.select(col("term")).distinct().withColumn("__in", lit(1L))
    val dt = docTermCounts(docs, text, id)
    val scored = dt.join(vt, Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(when(col("__in").isNull, col("tf")).otherwise(0L)).as("n_oov"))
    docs.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          round(col("n_oov") / col("n_tokens"), 4)).otherwise(lit(0.0)).as("oov_rate"))
  }

  /** Per-document surprisal under a FROZEN reference LM — the production
    * perplexity filter: the LM is built once ([[termCounts]] /
    * [[saveTermCounts]]) and every new crawl batch scores against it,
    * instead of each batch re-deriving a self-LM whose statistics drift
    * with the batch ([[unigramSurprisal]] is the self-LM form). Add-one
    * smoothing over the LM's own vocabulary (`p(t) = (c_t + 1)/(T + V)`)
    * keeps OOV terms finite: unseen vocabulary scores the
    * `log2(T + V)`-bits ceiling — exactly the "this is not the language
    * the LM saw" signal. Zero-token docs score 0 over 0.
    *
    * Scale shape: the batch explodes once into (doc, term) map-combined
    * counts and LEFT-joins the vocabulary-sized LM on term — with a
    * bucketed [[saveTermCounts]] table, no exchange on the LM side; the
    * two scalar totals are a 1-row aggregate over the LM relation (never
    * a corpus re-scan) and join by broadcast.
    */
  def surprisalAgainst(
      docs: DataFrame,
      text: Column,
      id: Column,
      lm: DataFrame
  ): DataFrame = {
    // materialized ONCE: both the scalar totals and the scoring join
    // consume the LM relation — an inline LM (termCounts over a raw
    // corpus) would otherwise re-run its full explode+aggregate per
    // consumer. Vocabulary-sized by contract, so the checkpoint is cheap;
    // a bucketed-table LM loses nothing.
    val counts = graft.Materialize(
      lm.select(col("term"), col("cnt").cast("long").as("cnt")))
    val tot = counts.agg(sum(col("cnt")).as("t_lm"), count(lit(1)).as("v_lm"))
    val dt = docTermCounts(docs, text, id)
    // An EMPTY LM makes t_lm null and every score would coalesce to a
    // silent 0.0 — "perfectly predictable" for the whole batch, precisely
    // when nothing was scored at all (the bootstrap data-loss bug class).
    // Scoring against a nonexistent LM is a pipeline bug: fail loudly,
    // per row, without forcing an eager count on the lazy plan.
    val bits = when(max(col("v_lm")) > 0,
      -sum(col("tf") *
        log2((coalesce(col("cnt"), lit(0L)) + 1.0) / (col("t_lm") + col("v_lm"))))
        / sum(col("tf")))
      .otherwise(raise_error(lit(
        "[graft] surprisalAgainst: the reference LM relation is EMPTY — " +
          "scoring would silently return 0.0 bits for every document. " +
          "Build the LM first (termCounts/saveTermCounts).")))
    val scored = dt
      .join(counts, Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        (round(bits, 4) + lit(0.0)).as("bits_per_token"))
    docs.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("bits_per_token"), lit(0.0)).as("bits_per_token"))
  }

  /** Zipf-law fit over the top-`topN` vocabulary: least-squares slope and
    * intercept of `log2(tf)` against `log2(rank)` — the classic
    * corpus-health diagnostic (natural language sits near slope −1;
    * template/boilerplate-heavy corpora flatten, scraped-junk corpora
    * steepen; a kink at low ranks means a few tokens dominate). One row:
    * `(n_terms, slope, intercept)`.
    *
    * Plan shape: [[vocabulary]]'s one term shuffle + `TakeOrdered` top-N,
    * then a scalar aggregate over ≤ topN points — the regression sums
    * never touch anything corpus-sized. Slope/intercept are computed in
    * the explicit normal-equation form (`(n·Σxy − Σx·Σy)/(n·Σx² −
    * (Σx)²)`) so an oracle replays them term-for-term; rounded 4 dp with
    * −0.0 canonicalized. Degenerate fits (fewer than 2 points, zero rank
    * variance) return null slope/intercept rather than ±Inf.
    */
  def zipfFit(
      docs: DataFrame,
      text: Column,
      id: Column,
      topN: Int = 200
  ): DataFrame = {
    require(topN >= 2, s"a fit needs at least 2 rank points: $topN")
    val pts = vocabulary(docs, text, id, topN).select(
      log2(col("rank").cast("double")).as("x"),
      log2(col("tf").cast("double")).as("y"))
    val a = pts.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sx2"))
    val denom = col("n") * col("sx2") - col("sx") * col("sx")
    val slopeRaw = (col("n") * col("sxy") - col("sx") * col("sy")) / denom
    a.select(
      col("n").as("n_terms"),
      when(denom > 0, round(slopeRaw, 4) + lit(0.0)).as("slope"),
      when(denom > 0,
        round((col("sy") - slopeRaw * col("sx")) / col("n"), 4) + lit(0.0))
        .as("intercept"))
  }

  /** DSIR-shaped importance weights: per-document mean log-likelihood
    * ratio (bits per token) of a TARGET unigram LM over the raw-corpus
    * unigram LM — the "does this raw document look like my curated
    * target distribution?" axis of importance resampling (Xie et al.,
    * Data Selection for Language Models via Importance Resampling,
    * NeurIPS 2023 — hashed-n-gram feature space; unigrams here, with
    * the corpus itself supplying both models so no external LM is
    * needed).
    *
    * The target LM is Jelinek–Mercer smoothed BY THE RAW LM —
    * `p_tgt(t) = λ·c_tgt(t)/T_tgt + (1−λ)·c_raw(t)/T_raw` — so the
    * per-term ratio collapses to
    * `log2(1−λ + λ·(c_tgt·T_raw)/(c_raw·T_tgt))`: every corpus term has
    * `c_raw ≥ 1`, no vocabulary-size constant is needed, and a term the
    * target never uses scores the floor `log2(1−λ)` instead of −∞.
    * Documents with zero tokens score 0 over 0 (weight-neutral).
    *
    * Plan shape (the [[unigramSurprisal]] template): ONE token explode →
    * (doc, tgt, term) map-side-combined counts → BOTH corpus-count
    * columns as unordered term-partition window aggregates over the same
    * single exchange (`c_raw` = sum tf, `c_tgt` = sum tf·tgt) → per-doc
    * aggregate; the two scalar totals come from no-explode
    * `wsTokenCount` kernel scans and join by broadcast. Nothing
    * corpus-sized broadcasts and the explosion runs exactly once.
    */
  def importanceWeights(
      docs: DataFrame,
      text: Column,
      id: Column,
      isTarget: Column,
      lambda: Double = 0.9
  ): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val dt = docs
      .select(id.as("doc_id"), when(isTarget, 1L).otherwise(0L).as("tgt"),
        explode(TextFunctions.wsTokens(text)).as("term"))
      .groupBy(col("doc_id"), col("tgt"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("term"))
    val withCnt = dt
      .withColumn("cnt_raw", sum(col("tf")).over(w))
      .withColumn("cnt_tgt", sum(col("tf") * col("tgt")).over(w))
    val tok = TextFunctions.wsTokenCount(text).cast("long")
    val totals = docs.select(
      sum(tok).as("t_raw"),
      sum(when(isTarget, tok).otherwise(0L)).as("t_tgt"))
    // empty target ⇒ no target LM exists; score 0 (neutral) rather than
    // the λ→ratio floor, so a mis-scoped predicate is visible, not a
    // silent "drop almost everything" weighting
    val lr = when(col("t_tgt") > 0,
      log2(lit(1.0 - lambda) + lit(lambda) *
        (col("cnt_tgt").cast("double") * col("t_raw").cast("double")) /
        (col("cnt_raw").cast("double") * col("t_tgt").cast("double"))))
      .otherwise(lit(0.0))
    val perDoc = withCnt.crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        // + 0.0 canonicalizes IEEE −0.0 (a near-balanced ratio sum lands
        // on either side of zero per engine's summation order; rounding
        // keeps the sign and −0.0 ≠ 0.0 under string/bit comparison)
        (round(sum(col("tf") * lr) / sum(col("tf")), 4) + lit(0.0)).as("log_ratio"))
    docs.select(id.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("log_ratio"), lit(0.0)).as("log_ratio"))
  }

  /** Importance RESAMPLING: exact-`k` weighted sample without
    * replacement, weighted by `2^log_ratio` from [[importanceWeights]] —
    * the full DSIR loop (weight raw docs by target/raw LM ratio, sample
    * proportionally) as one relation.
    *
    * Sampling is the deterministic Efraimidis–Spirakis scheme of
    * [[Assembly.weightedSample]], computed in LOG space
    * (`key = ln(−ln u) − log_ratio·ln 2`, ascending): the weight
    * `2^log_ratio` itself is never materialized, so an extreme-ratio
    * document cannot overflow/underflow the key. `u` is the exact salted
    * 48-bit hash rational, `log_ratio` enters pre-rounded (4 dp), and
    * the key is rounded (8 dp) with `doc_id` tiebreak — reproducible
    * cross-engine like every assembly stage. Zero-token docs carry
    * weight 1 (neutral), not 0: DSIR resamples them at base rate.
    *
    * Scale: the weighting is [[importanceWeights]]' one explode + one
    * term exchange + one doc aggregate; the sample adds only a
    * `TakeOrdered` top-k (O(partitions·k) driver work, never a global
    * sort).
    */
  def importanceResample(
      docs: DataFrame,
      text: Column,
      id: Column,
      isTarget: Column,
      k: Int,
      lambda: Double = 0.9,
      salt: String = "dsir-v1"
  ): DataFrame = {
    require(k >= 1, s"sample size must be positive: $k")
    val wts = importanceWeights(docs, text, id, isTarget, lambda)
    val h = graft.functions.Hashing.hash48(
      concat(col("doc_id").cast("string"), lit(s":$salt")))
    // (h+1)/2^48: exact doubles, bit-identical cross-engine (the
    // weightedSample contract)
    val u = (h + 1L).cast("double") / lit(281474976710656.0)
    val key = round(log(-log(u)) - col("log_ratio") * lit(0.6931471805599453), 8)
    wts
      .select(col("doc_id"), col("n_tokens"), col("log_ratio"), key.as("key"))
      .orderBy(col("key").asc, col("doc_id").asc)
      .limit(k)
  }

  /** Leave-one-out group ablation — "what happens to the corpus-level
    * mean of `metric` if this source is removed?", for every group at
    * once. The data-curation question behind source pruning ("does
    * dropping this crawl raise average quality?"), answered ALGEBRAICALLY:
    * mean-without-group = (T − S_g) / (N − n_g) needs only the per-group
    * partial sums and the corpus totals, so the whole report is ONE
    * grouped aggregate plus a broadcast 1-row totals relation — no
    * per-group second pass, no N× re-aggregation (the naive
    * leave-one-out loop a 100-TB corpus cannot afford).
    *
    * `delta` = group mean − rest mean: positive means the group runs
    * above the rest of the corpus on this metric. A group covering the
    * whole corpus reports a null rest mean (nothing remains).
    *
    * @return (group, n, mean_in, mean_rest, delta) on the 10^-scale grid
    */
  def leaveOneOutAblation(
      df: DataFrame,
      group: Column,
      metric: Column,
      scale: Int = 6): DataFrame = {
    // materialized so the totals aggregate reads the |groups|-row partials
    // instead of re-deriving them — ONE corpus scan, not two
    val perGroup = graft.Materialize(
      df.select(group.as("group"), metric.cast("double").as("m"))
        .groupBy(col("group"))
        .agg(count(lit(1)).as("n"), sum(col("m")).as("s")))
    val totals = perGroup.agg(sum(col("n")).as("tn"), sum(col("s")).as("ts"))
    perGroup.crossJoin(broadcast(totals))
      .select(
        col("group"), col("n"),
        round(col("s") / col("n"), scale).as("mean_in"),
        when(col("tn") > col("n"),
          round((col("ts") - col("s")) / (col("tn") - col("n")), scale)).as("mean_rest"),
        when(col("tn") > col("n"),
          round(col("s") / col("n") - (col("ts") - col("s")) / (col("tn") - col("n")), scale))
          .as("delta"))
  }

  /** BM25 retrieval: score every document against a fixed bag of query
    * terms and return the top `topK` — the corpus-search / example-mining
    * readout served from the same token statistics the inverted index
    * ([[invertedIndex]]) is built on.
    *
    * Scoring is the classic Robertson/Sparck-Jones form with Lucene's
    * non-negative idf:
    *
    * {{{ Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) ·
    *         tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl)) }}}
    *
    * Ranking is by the ROUNDED score (the [[tfIdf]] cross-engine
    * discipline: transcendentals may differ in the last ulp between
    * engines; rounding before ranking makes the cut reproducible), ties
    * by doc id.
    *
    * Plan shape: the token explode is FILTERED to the query terms before
    * anything aggregates (a `topK`-independent isin prune on the exploded
    * relation — at 100 TB the shuffle carries only query-term postings,
    * not the corpus vocabulary); doc length comes from the `wsTokenCount`
    * kernel over the raw doc table (a scan, no second explode); `avgdl`
    * and `N` ride as a broadcast 1-row relation; the final top-K is a
    * single `TakeOrderedAndProject`-shaped window cut (WindowGroupLimit
    * prunes per-partition before the single-reducer rank).
    */
  def bm25(
      docs: DataFrame,
      text: Column,
      id: Column,
      queryTerms: Seq[String],
      topK: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      scale: Int = 4
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    require(topK >= 1, "topK must be positive")
    val terms = queryTerms.map(_.toLowerCase).distinct

    // query-term postings only: prune the exploded relation BEFORE the
    // (doc, term) aggregation so the shuffle is proportional to the
    // query's posting lists, not the corpus token count
    val dt = tokenRows(docs, text, id)
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // df per query term (≤ |terms| rows) — broadcast side of the score join
    val dfr = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // doc length from the kernel scan (no second explode); corpus scalars
    // as a broadcast 1-row relation
    val dl = docs.select(id.as("doc_id"),
      graft.functions.TextFunctions.wsTokenCount(text).cast("double").as("dl"))
    val scalars = dl.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))

    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = dt
      .join(broadcast(dfr), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * tfNorm), scale).as("score"),
        count(lit(1)).as("n_terms_hit"))
    // top-K via orderBy+limit (TakeOrderedAndProject: each task ships at
    // most topK rows, no single-partition exchange of the scored
    // relation), THEN the rank window over the ≤ topK survivors — the
    // [[vocabulary]] cut structure
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(topK)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("score"), col("n_terms_hit"), col("rank"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift per group: for every group,
    * the KS statistic `D = max_x |CDF_in(x) − CDF_rest(x)|` between the
    * group's distribution of `value` and the REST of the corpus — the
    * distribution-drift screen that catches shape changes PSI's fixed
    * binning ([[psi]]-style) smears out. 0 = identical distributions,
    * 1 = disjoint supports.
    *
    * `value` must be discrete or pre-binned (quantize continuous signals
    * first — [[graft.curation.Quantiles]]): the CDF axis is the distinct
    * value set, and the method materializes a |groups| × |values| grid.
    * With bounded groups and a binned axis that grid is small by
    * construction; the corpus itself is touched by ONE (group, value)
    * aggregate.
    *
    * Plan shape: one map-side-combined (group, value) count over the
    * data, MATERIALIZED — group totals, value totals, and the grand total
    * all aggregate from those partials, never from the corpus again →
    * broadcast values-axis cross join (|G|·|V| rows, data-independent) →
    * one cumulative window per group → one max aggregate. Groups with an
    * empty complement (single-group corpus) report null.
    */
  def ksDrift(
      df: DataFrame,
      group: Column,
      value: Column,
      scale: Int = 6
  ): DataFrame =
    // one corpus-touching aggregate: counts per (group, value)
    ksDriftFromCounts(
      df.select(group.as("group"), value.cast("double").as("v"))
        .where(col("group").isNotNull && col("v").isNotNull)
        .groupBy(col("group"), col("v")).agg(count(lit(1)).as("c")),
      scale)

  /** The KS statistic from (group, v, c) COUNT PARTIALS — the shared
    * engine behind [[ksDrift]] (which aggregates the corpus once and
    * delegates) and the streaming histogram path
    * ([[graft.streaming.StreamingFlows.histogramTWS]] holds the per-group
    * value histogram in the state store; its final counts feed this
    * verbatim, the q159-over-q157 equivalence pattern). `gv` must carry
    * `group`, `v` (double), `c` (long ≥ 1 per present pair); it is
    * materialized HERE so the grid, axis totals, and grand total all
    * aggregate from the checkpointed partials, never the source again.
    */
  def ksDriftFromCounts(counts: DataFrame, scale: Int = 6): DataFrame = {
    val gv = graft.Materialize(
      counts.select(col("group"), col("v").cast("double").as("v"), col("c").cast("long").as("c")))

    val groups = gv.groupBy(col("group")).agg(sum(col("c")).as("n_in"))
    val vals = gv.groupBy(col("v")).agg(sum(col("c")).as("cv"))
    val totals = groups.agg(sum(col("n_in")).as("n_all"))

    // data-independent grid: every group × every value, so each group's
    // CDF is sampled at every jump point of either distribution
    val grid = vals.crossJoin(broadcast(groups)).crossJoin(broadcast(totals))
      .join(gv, Seq("group", "v"), "left")
      .na.fill(0L, Seq("c"))

    val w = Window.partitionBy(col("group")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = sum(col("c")).over(w)
    val cumAll = sum(col("cv")).over(w)
    grid
      .select(col("group"), col("n_in"), (col("n_all") - col("n_in")).as("n_rest"),
        cumIn.as("ci"), cumAll.as("ca"))
      .groupBy(col("group"), col("n_in"), col("n_rest"))
      // the zero-complement guard sits INSIDE the aggregate: ANSI mode
      // evaluates the aggregate child on every row even when an outer
      // `when` would discard the result, so a bare /n_rest would throw
      // DIVIDE_BY_ZERO on a single-group corpus
      .agg(round(max(when(col("n_rest") > 0,
        abs(col("ci") / col("n_in") - (col("ca") - col("ci")) / col("n_rest")))), scale)
        .as("ks"))
      .select(col("group"), col("n_in"), col("n_rest"), col("ks"))
  }
}
