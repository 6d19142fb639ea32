package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: language ID,
  * quality scoring, token counting. All pure column expressions
  * (codegen'd, no UDFs) so they vectorize inside WholeStageCodegen and are
  * reproducible verbatim in the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens of the lower-cased text (duplicates preserved). */
  def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Marker stopwords per language, used by the n-gram/stopword language
    * heuristic. Order matters: ties resolve to the earlier language.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "a"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une", "est", "que", "pour"),
    "es" -> Seq("el", "los", "las", "y", "una", "es", "que", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht", "mit", "von")
  )

  /** CJK codepoint count (CJK Unified Ideographs block). */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))

  /** Heuristic language ID: 'zh' when >20% of characters are CJK; otherwise
    * the language whose marker-stopword hit-count over the whitespace tokens
    * is highest (ties -> marker list order); 'und' when no marker hits.
    */
  def langId(text: Column): Column = {
    val tokens = wsTokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens, t => t.isin(markers.map(lit): _*))).cast("long")
    }
    langDecision(text, scores)
  }

  /** The shared decision expression: 'zh' when >20% CJK chars, else a left
    * fold in marker order with strictly-greater replacement — the earliest
    * language wins ties, and an all-zero score stays 'und'.
    */
  private def langDecision(text: Column, scores: Seq[(String, Column)]): Column = {
    val best = scores.foldLeft(struct(lit(0L).as("s"), lit("und").as("l"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("s"), struct(score.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(cjkCount(text) * 5 > length(text), lit("zh")).otherwise(best.getField("l"))
  }

  /** Language ID over a corpus: the marker counts are ONE per-row
    * expression ([[graft.plans.TextKernel.langCounts]] — tokenize once,
    * probe 4 marker hash-sets), then the same decision fold. Marker
    * counting is per-document math, so the former explode + 4-conditional
    * -sum groupBy + join (itself ~4× over per-language `filter(tokens,
    * isin)` lambdas) routed token rows through a shuffle for nothing
    * (value-identical; measured 0.8 s → 0.1 s at sf0.1).
    */
  def langIdTable(df: DataFrame, text: Column, id: Column): DataFrame = {
    val counts = org.apache.spark.sql.GraftBridge.column(
      graft.plans.LangCountsF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string"))))
    val docs = df.select(id.as("doc_id"), text.as("__text"), counts.as("__lc"))
    val scores = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(col("__lc"), i + 1)
    }
    docs.select(col("doc_id"), langDecision(col("__text"), scores).as("lang_pred"))
  }

  /** Punctuation-character count (anything not alphanumeric/whitespace). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** English stopword-hit count over whitespace tokens. */
  def stopwordCount(text: Column): Column = {
    val en = LangMarkers.head._2
    size(filter(wsTokens(text), t => t.isin(en.map(lit): _*)))
  }

  /** Document quality score in [0,1] (rounded to 4 decimals):
    * weighted blend of length saturation, mean-token-length band,
    * low punctuation ratio, and a nonzero-but-bounded stopword ratio.
    * A deterministic analogue of the Gopher/C4-style quality filters.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = wsTokens(text)
    val nToks = size(toks).cast("double")
    val avgTok = when(nToks > 0, (nChars - (nToks - 1)) / nToks).otherwise(lit(0.0))
    val lenScore = least(nChars / lit(400.0), lit(1.0))
    val tokLenScore = when(avgTok >= 3 && avgTok <= 10, lit(1.0)).otherwise(lit(0.5))
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio * 5, lit(0.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nToks, lit(1.0))
    val stopScore = when(stopRatio > 0.01 && stopRatio < 0.5, lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.3 + tokLenScore * 0.2 + punctScore * 0.25 + stopScore * 0.25, 5)
  }

  /** Repetition statistics per document — the Gopher-style repetition
    * quality signals: how much of the document is repeated tokens, and how
    * dominant its most frequent bigram is. Emitted as exact INTEGER counts
    * (`n_tokens`, `n_distinct`, `top_bigram_count`) rather than ratios —
    * ratios with small power-of-two denominators (16/32/64-token docs are
    * common) land exactly on decimal rounding midpoints where engines
    * disagree, while integer counts hash-match trivially; derive
    * `1 - n_distinct/n_tokens` and `top_bigram_count/(n_tokens-1)` at the
    * filter site.
    *
    * The stats are ONE per-row expression
    * ([[graft.plans.TextKernel.repStats]]: tokenize → distinct set →
    * bigram counts, fused per document) — token counts and the top-bigram
    * max are per-document math, so the former explode + lead() window +
    * two groupBys + join routed token rows through three exchanges for
    * nothing (value-identical; measured 1.3 s → 0.1 s at sf0.1).
    */
  def repetitionStats(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.RepStatsF(
          org.apache.spark.sql.GraftBridge.expression(text.cast("string")))).as("__rs"))
      .select(
        col("doc_id"),
        // NULL-text docs count as empty — (0,0,0), the explode_outer
        // form's contract (downstream ratio filters need defined values)
        coalesce(col("__rs.n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("__rs.n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("__rs.top_bigram_count"), lit(0L)).as("top_bigram_count"))

  /** Fixed-window text chunking with stride — the context-window
    * preparation step: chunk c starts at `1 + c·stride`; new chunks are
    * emitted only while the PREVIOUS window has not yet reached the text
    * end (a naive start ≤ len rule emits tail chunks that are strict
    * suffixes of the previous one — duplicated training content), and the
    * final chunk truncates at the end. `stride ≤ size` is required: a
    * larger stride would silently drop the text between windows. Pure
    * codegen: a position sequence explode + substr, no per-row arrays of
    * chunk strings.
    */
  def chunkFixed(df: DataFrame, text: Column, id: Column, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    require(stride <= size,
      s"stride ($stride) must be <= size ($size) — a gap would silently drop text")
    // last useful start s satisfies s - stride + size - 1 < len,
    // i.e. s <= len - size + stride (clamped to 1 for short texts)
    val lastStart = greatest(length(col("__t")) - (size - stride), lit(1))
    df.select(id.as("doc_id"), text.as("__t"))
      .select(
        col("doc_id"), col("__t"),
        posexplode(
          when(length(col("__t")) > 0, sequence(lit(1), lastStart, lit(stride)))
            .otherwise(array().cast("array<int>"))
        ).as(Seq("chunk_idx", "__start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("__t").substr(col("__start"), lit(size)).as("chunk_text"))
  }

  /** Budgeted sequence packing WITHIN shards by START-OFFSET bucketing:
    * rows ordered by `id` inside each `shard` accumulate `weight`, and a
    * row joins the pack its start offset falls in — so a pack can OVERFLOW
    * `capacity` by up to one row's weight (bounded by
    * `capacity + max(weight)`; callers that must fit a hard window size
    * either pre-split oversized rows with [[chunkFixed]] or size capacity
    * accordingly). Exactly-bounded greedy packing needs a sequential
    * carry-reset that a single window prefix-sum cannot express — this is
    * the deliberate trade for a one-pass, one-shuffle plan. The shard key
    * is what keeps it scale-shaped — a global pack order would be a
    * single-partition window (the q04 trap); per-shard packing matches how
    * packing jobs actually run (per source / language / date partition).
    * Integer arithmetic throughout (div, not fp) so the oracle is exact.
    */
  def packByBudget(
      df: DataFrame, id: Column, weight: Column, shard: Column, capacity: Long
  ): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(shard.as("shard"), id.as("doc_id"), weight.cast("long").as("w"))
      .withColumn("cum_weight", sum(col("w")).over(w))
      .withColumn("pack_id", expr(s"(cum_weight - w) div ${capacity}L"))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("cum_weight"))
  }

  /** PII-style redaction: emails, URLs, and long digit runs replaced with
    * typed placeholder tokens — the scrubbing pass a training corpus runs
    * before anything else sees the text. Patterns stay in the common
    * Java-regex/RE2 subset (char classes, bounded repetition — no
    * lookaround), so the same expressions run verbatim in the DuckDB
    * oracle; order matters (emails before digit runs, or the local part's
    * digits get clobbered first).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // exclude ALL whitespace, not just space: `[^ ]` matches \n and would
  // swallow the text between a URL and the next space across lines
  val UrlPattern = "https?://[^ \\t\\n\\r]+"
  val LongNumberPattern = "[0-9]{6,}"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      LongNumberPattern, "<NUM>")

  /** Per-group PII incidence report over the SAME patterns [[redact]]
    * scrubs — the audit artifact a curation run publishes next to the
    * scrubbed corpus ("how much was there, where") so a reviewer can
    * judge source risk without re-scanning the raw text. Pure
    * map-combined aggregation: `regexp_count` per row fuses into the
    * scan projection, one exchange of |groups| rows. At 100 TB this is
    * scan-bound, exactly like [[redact]] itself.
    */
  def piiReport(df: DataFrame, text: Column, group: Column): DataFrame = {
    def stats(pattern: String, tag: String) = Seq(
      sum(when(regexp_count(text, lit(pattern)) > 0, 1L).otherwise(0L))
        .as(s"docs_$tag"),
      sum(regexp_count(text, lit(pattern)).cast("long")).as(s"n_$tag"))
    val aggs = count(lit(1)).as("n_docs") +:
      (stats(EmailPattern, "email") ++ stats(UrlPattern, "url") ++
        stats(LongNumberPattern, "num"))
    df.groupBy(group.as("group")).agg(aggs.head, aggs.tail: _*)
  }

  /** Blocklist screen — the C4 "bad words" stage: per-document hit
    * counts against a dictionary RELATION (one lowercase string column
    * `term`; [[wsTokens]] lowercases the text side to match). Returns
    * `(doc_id, n_hits, n_terms)` for documents with ≥ 1 hit — join it
    * back anti/semi to drop or quarantine, or threshold on `n_hits`.
    *
    * The dictionary is a relation, not a regex, deliberately: real
    * blocklists are thousands of terms (a single alternation regex
    * degrades to linear-scan-per-pattern), they are maintained as data
    * (versioned tables, per-locale variants), and the relational form
    * broadcasts.
    *
    * Scale shape: the token explode meets the BROADCAST dictionary in a
    * hash join BEFORE any exchange — only matching token rows cross the
    * wire into the per-document count (blocklist hits are rare by
    * construction, so the shuffle is tiny however large the corpus).
    */
  def blocklistScreen(
      df: DataFrame,
      text: Column,
      id: Column,
      terms: DataFrame
  ): DataFrame = {
    val dict = broadcast(terms.select(col("term")).distinct())
    df.select(id.as("doc_id"), explode(wsTokens(text)).as("term"))
      .join(dict, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("term")).as("n_terms"))
  }

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric-non-space characters — a cheap deterministic proxy for
    * subword tokenizer counts.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  /** WITHIN-document repeated-segment removal (the Gopher/C4 "drop
    * duplicated lines/paragraphs inside a document" rule, at any
    * delimiter granularity): keep each segment's FIRST occurrence,
    * preserve order, rejoin — the complement of
    * [[graft.dedup.Dedup.dropSharedSegments]]' ACROSS-document form.
    * One O(n) codegen kernel per row ([[graft.plans.DedupSegmentsF]];
    * SQL surface `graft_dedup_segments(s, delim)`) — zero exchanges,
    * fuses into the surrounding projection. Replaced the declarative
    * `split → filter(array_position == i+1) → concat_ws` form, which was
    * O(segments²) per row (an array scan per element): the q101 gate
    * dropped 2.20 s → 0.23 s at sf0.1, output byte-identical
    * (parity-spec'd, including empty/trailing segments).
    */
  def dedupSegments(text: Column, delimiter: String = "\n"): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.DedupSegmentsF(
        org.apache.spark.sql.GraftBridge.expression(text), delimiter))

  /** The pre-kernel declarative form of [[dedupSegments]], kept as the
    * parity oracle for the kernel's spec (and the reference for what the
    * kernel must compute). Not for production paths.
    */
  private[graft] def dedupSegmentsDeclarative(text: Column, delimiter: String): Column = {
    val segs = split(text, java.util.regex.Pattern.quote(delimiter))
    concat_ws(delimiter,
      filter(segs, (x, i) => array_position(segs, x) === i + 1))
  }

  /** Shannon entropy of the UTF-8 byte stream in bits per byte — the
    * compressibility axis of a noise filter (binary/base64 junk ≈ 6–8,
    * natural language ≈ 4–4.5, repeated boilerplate low; empty text 0).
    * One codegen'd per-row kernel ([[graft.plans.ByteEntropyF]]), zero
    * exchanges; SQL surface `graft_byte_entropy(s)`.
    */
  def byteEntropy(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.ByteEntropyF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string"))))

  /** Canonical text normalization — the preprocessing every dedup/hash
    * stage should share so "the same text" hashes the same: lower-case,
    * strip NON-whitespace control characters, collapse whitespace runs to
    * one space, trim. The control class excludes \x09–\x0d deliberately:
    * a tab is both control and whitespace and must act as a separator,
    * not vanish — and stripping controls BEFORE the collapse is what
    * makes the function idempotent (a control removed after the collapse
    * would fuse two collapsed runs into a double space). Pure codegen'd
    * regex expressions, so it fuses into whatever scan feeds it. The
    * whitespace class is written out explicitly rather than as `\s`:
    * Java's `\s` includes vertical tab (\x0b), RE2's does not — the one
    * character where the "shared subset" isn't shared.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x08\\x0e-\\x1f\\x7f]", ""),
      "[ \\t\\n\\x0b\\f\\r]+", " "))
}
