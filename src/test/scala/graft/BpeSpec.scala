package graft

import graft.curation.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer semantics: hand-computed pair statistics and merges on the
  * classic Sennrich corpus, encode laws, and the distributed/driver
  * consistency contract.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. ACL'16 running example (word, freq):
  // low:5 lower:2 newest:6 widest:3
  private def classic = Seq(
    ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim
  ).toDF("text").withColumn("doc_id", lit(1L))

  test("pairCounts: hand-computed weighted pair counts, deterministic tie rank") {
    val d = Seq((1L, "aa ab"), (2L, "ab")).toDF("doc_id", "text")
    // words: aa:1 ab:2 → pairs (a,a):1 (a,b):2
    val out = Bpe.pairCounts(d, col("text"), topN = 10)
      .select("lhs", "rhs", "cnt", "rank")
      .as[(String, String, Long, Int)].collect().toSeq
    assert(out == Seq(("a", "b", 2L, 1), ("a", "a", 1L, 2)))
    // classic corpus round-0 leaders: (e,s)=9 and (s,t)=9 tie broken
    // lexicographically, then (w,e)=8
    val top3 = Bpe.pairCounts(classic, col("text"), topN = 3)
      .select("lhs", "rhs", "cnt").as[(String, String, Long)].collect().toSeq
    assert(top3 == Seq(("e", "s", 9L), ("s", "t", 9L), ("w", "e", 8L)))
  }

  test("train: the classic corpus learns es, est, lo in order with exact counts") {
    val ms = Bpe.train(classic, col("text"), maxMerges = 3)
    assert(ms.map(m => (m.rank, m.left, m.right, m.count)) ==
      Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
    // determinism: same corpus, same merges
    assert(Bpe.train(classic, col("text"), maxMerges = 3) == ms)
    // minCount floor stops early: nothing reaches 100
    assert(Bpe.train(classic, col("text"), maxMerges = 3, minCount = 100L).isEmpty)
    // driver loop over explicit counts agrees with the distributed aggregate
    val fromCounts = Bpe.trainFromWordCounts(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 3)
    assert(fromCounts == ms)
  }

  test("encodeWord applies merges in rank order; encodeCorpus reconstructs and counts") {
    val ms = Bpe.train(classic, col("text"), maxMerges = 3)
    // l o w e s t → es → est → lo
    assert(Bpe.encodeWord("lowest", ms) == Seq("lo", "w", "est"))
    assert(Bpe.encodeWord("newest", ms) == Seq("n", "e", "w", "est"))
    // unseen symbols pass through as characters
    assert(Bpe.encodeWord("xyz", ms) == Seq("x", "y", "z"))
    val docs = Seq((1L, "lowest newest"), (2L, "low"), (3L, "")).toDF("doc_id", "text")
    val enc = Bpe.encodeCorpus(docs, col("text"), col("doc_id"), ms)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    assert(enc(1L) == ((Seq("lo", "w", "est", "n", "e", "w", "est"), 7L)))
    assert(enc(2L) == ((Seq("lo", "w"), 2L)))
    assert(enc(3L) == ((Seq.empty[String], 0L)))
    // reconstruction law: concatenated pieces equal the concatenated words
    assert(enc(1L)._1.mkString == "lowestnewest")
  }

  test("saveMerges/loadMerges round-trips the vocabulary artifact in rank order") {
    val ms = Bpe.train(classic, col("text"), maxMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString + "/merges"
    Bpe.saveMerges(spark, ms, dir)
    assert(Bpe.loadMerges(spark, dir) == ms)
    // overwrite semantics: a retrained (shorter) vocabulary replaces, not appends
    val shorter = Bpe.train(classic, col("text"), maxMerges = 2)
    Bpe.saveMerges(spark, shorter, dir)
    assert(Bpe.loadMerges(spark, dir) == shorter)
    // the artifact relation carries (rank, lhs, rhs, cnt)
    assert(Bpe.mergesToDF(spark, ms).columns.toSeq == Seq("rank", "lhs", "rhs", "cnt"))
  }
}
