package graft.curation

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over the corpus — the
  * vocabulary-prep stage that sits between curation and training (Sennrich
  * et al., "Neural Machine Translation of Rare Words with Subword Units",
  * ACL'16 — the word-internal character-merge variant).
  *
  * Scale shape, which is also how production trainers (sentencepiece, HF
  * tokenizers) structure the problem: the ONLY corpus-sized work is the
  * (word, freq) aggregation — one explode + one word-key shuffle with
  * map-side combine. Everything after runs over the VOCABULARY-sized
  * relation (≤ `maxVocabWords`, a `TakeOrdered` cut, bounded like the IVF
  * centroid fetch): the merge loop is driver-side over that bounded
  * aggregate, because 10⁵–10⁷ distinct words summarize a 100 TB corpus
  * losslessly for BPE purposes — re-scanning the corpus per merge round
  * would be the non-scalable design.
  *
  * Symbols are Unicode characters within whitespace-tokenized words (the
  * [[TextFunctions.wsTokens]] tokenizer every other corpus stage uses); no
  * end-of-word marker — a merged piece never crosses a word boundary
  * because pairs form word-internally only.
  */
object Bpe {

  /** Word-frequency-weighted adjacent-character-pair counts — BPE's round-0
    * statistics, distributed: one corpus explode → (word, freq) map-side
    * combined → per-word char pairs as a zero-shuffle array expression →
    * one (left, right) key shuffle. The output is alphabet²-bounded.
    *
    * `topN` cuts by (count desc, left asc, right asc) through a
    * `TakeOrderedAndProject` — each task ships ≤ topN rows.
    */
  def pairCounts(
      docs: DataFrame,
      text: Column,
      topN: Int = 50
  ): DataFrame = {
    require(topN >= 1, s"topN must be positive: $topN")
    val words = docs
      .select(explode(TextFunctions.wsTokens(text)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
    // chars via explicit substring indexing: identical semantics in Spark
    // and the DuckDB oracle (code-point positions)
    val pairs = words
      .where(length(col("word")) >= 2)
      .select(col("freq"),
        explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => struct(
            substring(col("word"), i, lit(1)).as("lhs"),
            substring(col("word"), i + 1, lit(1)).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))
    val top = pairs
      .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
      .limit(topN)
    top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)))
  }

  /** A learned merge: `left + right → left+right`, with the pair count at
    * the round it was learned and its 1-based rank (= merge priority).
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Train `maxMerges` BPE merges. The corpus collapses to a (word, freq)
    * relation FIRST (the one corpus-sized pass, capped at `maxVocabWords`
    * by frequency with deterministic word tie-break); the merge loop then
    * runs driver-side over that bounded aggregate — the sentencepiece/HF
    * structure, and the honest 100 TB answer (per-merge distributed
    * re-counting would schedule thousands of vocabulary-sized jobs for
    * data that fits in driver memory by construction).
    *
    * Deterministic: each round merges the pair with the highest count,
    * ties broken by (left, right) lexicographically. Stops early when no
    * pair reaches `minCount`.
    */
  def train(
      docs: DataFrame,
      text: Column,
      maxMerges: Int,
      minCount: Long = 2L,
      maxVocabWords: Int = 1000000
  ): Seq[Merge] = {
    require(maxMerges >= 0, s"maxMerges must be non-negative: $maxMerges")
    val words = docs
      .select(explode(TextFunctions.wsTokens(text)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    trainFromWordCounts(words.toIndexedSeq, maxMerges, minCount)
  }

  /** The driver-side merge loop over a bounded (word, freq) aggregate —
    * exposed for incremental use (train from yesterday's persisted word
    * counts without re-scanning the corpus).
    */
  def trainFromWordCounts(
      wordCounts: Seq[(String, Long)],
      maxMerges: Int,
      minCount: Long = 2L
  ): Seq[Merge] = {
    // symbol sequences per word; Unicode code points as initial symbols
    var seqs: Array[(Array[String], Long)] = wordCounts.map { case (w, f) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), f)
    }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var continue = rank <= maxMerges
    while (continue) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- seqs; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      val best = counts.filter(_._2 >= minCount)
      if (best.isEmpty) continue = false
      else {
        val ((l, r), c) = best.minBy { case ((bl, br), bc) => (-bc, bl, br) }
        merges += Merge(rank, l, r, c)
        val piece = l + r
        seqs = seqs.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += piece; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, f)
          }
        }
        rank += 1
        if (rank > maxMerges) continue = false
      }
    }
    merges.result()
  }

  /** Segment one word with learned merges, applying them in RANK order —
    * the standard BPE encode. Driver-side utility (tests, interactive
    * inspection); the distributed form is [[encodeCorpus]].
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] =
    encodeSorted(word, merges.sortBy(_.rank))

  /** Encode against PRE-SORTED merges — the per-row path of
    * [[encodeCorpus]] (sorting once per broadcast, not once per word).
    */
  private def encodeSorted(word: String, sorted: Seq[Merge]): Seq[String] = {
    var syms: Vector[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector
    for (m <- sorted if syms.length >= 2) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == m.left && syms(i + 1) == m.right) {
          out += m.left + m.right; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** The merge table as a relation — the release artifact a data card
    * ships next to the corpus version ([[graft.curation.Corpus.versionDiff]]
    * audits the corpus; this is the tokenizer side of the same release).
    */
  def mergesToDF(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "lhs", "rhs", "cnt")
  }

  /** Persist learned merges as parquet (overwrite: a vocabulary is a
    * versioned artifact, not an append log).
    */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge],
      path: String
  ): Unit =
    mergesToDF(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge table, rank-sorted — the bounded collect of a
    * vocabulary-sized artifact (same contract as the IVF centroid fetch).
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .select(col("rank"), col("lhs"), col("rhs"), col("cnt"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank)
      .toSeq
  }

  /** Distributed BPE encode: per-document piece sequences under the
    * learned merges. The merge table ships ONCE per executor via a
    * broadcast variable (never a per-task plan Literal); the encode is
    * per-partition imperative logic over broadcast state — the
    * `mapPartitions` case ([[graft.multimodal.Multimodal]] precedent),
    * zero exchanges, fuses nothing but needs nothing fused.
    *
    * Output: (doc_id, pieces array, n_pieces) — feed `n_pieces` to the
    * token-budget/packing stages for vocabulary-true token counts.
    */
  def encodeCorpus(
      docs: DataFrame,
      text: Column,
      id: Column,
      merges: Seq[Merge]
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.sortBy(_.rank).toIndexedSeq)
    val base = docs.select(id.cast("long").as("doc_id"),
      TextFunctions.wsTokens(text).as("toks"))
      .as[(Long, Seq[String])]
    base.mapPartitions { it =>
      val ms = bc.value
      it.map { case (docId, toks) =>
        val pieces = toks.flatMap(w => encodeSorted(w, ms))
        (docId, pieces, pieces.length.toLong)
      }
    }.toDF("doc_id", "pieces", "n_pieces")
  }
}
