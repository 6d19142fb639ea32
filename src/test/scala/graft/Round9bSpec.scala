package graft

import graft.curation.{Assembly, Quantiles}
import graft.functions.Hashing
import graft.similarity.IVF
import graft.sources.{Storage, Tables}
import org.apache.spark.sql.functions._

/** Round-9 second wave: sequence packing (both layouts), the
  * both-sides-large kNN join, the adaptive per-group threshold filter,
  * and snapshot diff.
  */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sfDir)
  private def toks = graft.functions.TextFunctions.wsTokenCount(col("text"))

  // --- packChunks --------------------------------------------------------

  test("packChunks: slices tile every document exactly and every sequence is full") {
    val L = 128L
    val out = Assembly.packChunks(docs, col("doc_id"), toks, L).cache()
    val nDocs = docs.where(toks > 0).count()

    // per doc: slices are contiguous from 0 to n_tokens, non-overlapping
    val perDoc = out.groupBy($"doc_id").agg(
      min($"tok_from").as("lo"), max($"tok_to").as("hi"),
      sum($"tok_to" - $"tok_from").as("covered"), count(lit(1)).as("slices"))
    assert(perDoc.count() == nDocs)
    assert(perDoc.where($"lo" =!= 0 || $"covered" =!= $"hi").count() == 0)
    val expected = docs.select(col("doc_id"), toks.cast("long").as("n")).where($"n" > 0)
    assert(perDoc.join(expected, Seq("doc_id")).where($"hi" =!= $"n").count() == 0)

    // per sequence: slices tile [0, L) exactly — every sequence but the
    // last holds exactly L tokens starting at pos 0 with no gaps
    val perSeq = out.groupBy($"seq_id").agg(
      sum($"tok_to" - $"tok_from").as("filled"), min($"pos").as("p0"),
      max($"pos" + $"tok_to" - $"tok_from").as("pEnd"))
    val lastSeq = out.agg(max($"seq_id")).head().getLong(0)
    assert(perSeq.where($"seq_id" < lastSeq && $"filled" =!= L).count() == 0)
    assert(perSeq.where($"p0" =!= 0 || $"pEnd" =!= $"filled").count() == 0)

    // total stream length conservation
    val totTokens = docs.select(sum(toks.cast("long"))).head().getLong(0)
    val totPacked = out.agg(sum($"tok_to" - $"tok_from")).head().getLong(0)
    assert(totPacked == totTokens)
    out.unpersist()
  }

  test("packChunks: a doc longer than seqLen spans ceil(n/L)±1 sequences; zero-token docs drop") {
    val df = Seq((1L, 300L), (2L, 5L), (3L, 0L)).toDF("id", "n")
    val out = Assembly.packChunks(df, $"id", $"n", seqLen = 100L).collect()
    assert(!out.exists(_.getLong(1) == 3L), "zero-token doc must be dropped")
    val doc1 = out.filter(_.getLong(1) == 1L)
    assert(doc1.length == 3 || doc1.length == 4) // 300 tokens over 100-token seqs
    // slice lengths of doc1 sum to 300
    assert(doc1.map(r => r.getLong(3) - r.getLong(2)).sum == 300L)
  }

  test("packChunks is deterministic across runs and nBuckets settings") {
    val a = Assembly.packChunks(docs, col("doc_id"), toks, 128L, nBuckets = 256)
    val b = Assembly.packChunks(docs, col("doc_id"), toks, 128L, nBuckets = 16)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  // --- packGreedy --------------------------------------------------------

  test("packGreedy matches a sequential reference replay; bins respect capacity") {
    val cap = 256L
    val out = Assembly.packGreedy(
      docs, col("doc_id"), col("source"), toks, cap, subShards = 2).cache()

    // reference: single-threaded greedy walk per (stratum, shard)
    val rows = docs.select(col("doc_id"), col("source"), toks.cast("long").as("n"))
      .withColumn("sk", Hashing.hash48(concat(col("doc_id").cast("string"), lit(":pack-v1"))))
      .where($"n" > 0).collect()
      .map(r => (r.getString(1), (r.getLong(3) % 2).toInt, r.getLong(3), r.getLong(0), r.getLong(2)))
    val expect = rows.groupBy(t => (t._1, t._2)).flatMap { case ((src, shard), g) =>
      var bin = -1L; var fill = 0L
      g.toVector.sortBy(t => (t._3, t._4)).map { case (_, _, _, id, n) =>
        if (bin >= 0 && fill + n <= cap) fill += n else { bin += 1; fill = n }
        (src, shard, id, n, bin, fill)
      }
    }.toSet
    val got = out.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)

    // capacity law: a bin's final fill exceeds cap only if it is a
    // single oversized document
    val binTotals = out.groupBy($"stratum", $"shard", $"bin")
      .agg(max($"bin_fill").as("fill"), count(lit(1)).as("n_docs"))
    assert(binTotals.where($"fill" > cap && $"n_docs" > 1).count() == 0)
    // bins are contiguously numbered from 0 per (stratum, shard)
    val binIds = out.groupBy($"stratum", $"shard")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"), countDistinct($"bin").as("nd"))
    assert(binIds.where($"lo" =!= 0 || $"nd" =!= $"hi" + 1).count() == 0)
    out.unpersist()
  }

  test("packGreedy fails LOUDLY on null / non-numeric ids (never a doc_id=null manifest)") {
    val bad = Seq(("not-a-number", "a", 10L), ("2", "a", 10L)).toDF("id", "src", "n")
    val e = intercept[Exception] {
      Assembly.packGreedy(bad, $"id", $"src", $"n", binCapacity = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // ANSI sessions throw on the malformed cast itself; non-ANSI sessions
    // reach the raise_error guard — either way, LOUD, never doc_id=null
    assert(messages(e).exists(m =>
      m.contains("non-numeric document id") || m.contains("CAST_INVALID_INPUT")), e.toString)
    // a NULL id reaches the guard in both modes (casting null never throws)
    val withNull = Seq((Some(1L), "a", 10L), (None, "a", 10L))
      .toDF("id", "src", "n")
    val e2 = intercept[Exception] {
      Assembly.packGreedy(withNull, $"id", $"src", $"n", binCapacity = 100L).collect()
    }
    assert(messages(e2).exists(_.contains("null or non-numeric document id")), e2.toString)
    // NUMERIC strings cast cleanly and pack normally
    val ok = Seq(("7", "a", 10L)).toDF("id", "src", "n")
    val out = Assembly.packGreedy(ok, $"id", $"src", $"n", binCapacity = 100L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 7L)
  }

  test("packGreedy: an oversized document gets a bin of its own") {
    val df = Seq((1L, "a", 10L), (2L, "a", 999L), (3L, "a", 10L), (4L, "a", 0L))
      .toDF("id", "src", "n")
    val out = Assembly.packGreedy(df, $"id", $"src", $"n", binCapacity = 100L)
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(!out.contains(4L), "zero-token doc must drop")
    val big = out(2L)
    assert(out.count(_._2 == big) == 1, s"oversized doc shares bin $big: $out")
  }

  // --- joinTopK ----------------------------------------------------------

  test("IVF.joinTopK equals literalTopK on the broadcast-sized query slice") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val viaJoin = IVF.joinTopK(emb, q, col("vec_id"), col("embedding"),
      k = 10, nProbe = 2, centroids = IVF.pretrainedCentroids)
    val viaBcast = IVF.literalTopK(emb, q, col("vec_id"), col("embedding"),
      k = 10, nProbe = 2, centroids = IVF.pretrainedCentroids)
    assert(viaJoin.exceptAll(viaBcast).count() == 0 &&
      viaBcast.exceptAll(viaJoin).count() == 0)
  }

  test("joinTopK maxCell cap law: hot cells dropped, small cells untouched, default unchanged; " +
      "oversizedCells reports what a cap excludes") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 5)
    val cents = IVF.pretrainedCentroids
    // cell populations, to pick a cap that splits them
    val sizes = emb.select(IVF.literalCell(col("embedding"), cents).as("cell"))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cap = (sizes.values.max - 1).toInt // drops exactly the hottest cell(s)
    val hot = sizes.filter(_._2 > cap).keySet
    assert(hot.nonEmpty)
    // the report names exactly the cells above the cap, with their counts
    val reported = IVF.oversizedCells(emb, col("embedding"), cents, cap)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(reported.keySet == hot && reported.forall { case (c, n) => sizes(c) == n })
    // capped join = uncapped join minus every neighbour living in a hot cell
    val uncapped = IVF.joinTopK(emb, q, col("vec_id"), col("embedding"),
      k = 10, nProbe = 2, centroids = cents)
    val capped = IVF.joinTopK(emb, q, col("vec_id"), col("embedding"),
      k = 10, nProbe = 2, centroids = cents, maxCell = cap)
    val cellOf = emb.select(col("vec_id").as("n_id"),
      IVF.literalCell(col("embedding"), cents).as("n_cell"))
    assert(capped.join(cellOf, Seq("n_id")).where(col("n_cell").isInCollection(hot)).count() == 0,
      "capped join surfaced a neighbour from a dropped cell")
    // survivors' candidate sets shrink, so ranks can only move up — every
    // capped (q_id, n_id) pair must exist in the uncapped candidate pool
    assert(capped.select("q_id", "n_id")
      .exceptAll(
        IVF.joinTopK(emb, q, col("vec_id"), col("embedding"),
          k = Int.MaxValue - 1, nProbe = 2, centroids = cents).select("q_id", "n_id"))
      .count() == 0)
    // default cap adds nothing: same result object shape, same rows
    val default = IVF.joinTopK(emb, q, col("vec_id"), col("embedding"),
      k = 10, nProbe = 2, centroids = cents, maxCell = Int.MaxValue)
    assert(default.exceptAll(uncapped).count() == 0 && uncapped.exceptAll(default).count() == 0)
  }

  // --- adaptiveThresholdFilter --------------------------------------------

  test("adaptiveThresholdFilter keeps exactly the rows at/above each group's type-1 quantile") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0), ("c", 5.0)
    ).toDF("g", "v")
    val out = Quantiles.adaptiveThresholdFilter(df, $"g", $"v", 0.5)
      .select($"g", $"v", $"threshold").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // type-1 median: a → rank ceil(0.5*4)=2 → 2.0; b → rank 1 → 10.0; c → 5.0
    assert(out == Set(
      ("a", 2.0, 2.0), ("a", 3.0, 2.0), ("a", 4.0, 2.0),
      ("b", 10.0, 10.0), ("b", 20.0, 10.0), ("c", 5.0, 5.0)))
  }

  test("adaptiveThresholdFilter drops null values and all-null groups") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None), ("d", None))
      .toDF("g", "v")
    val out = Quantiles.adaptiveThresholdFilter(df, $"g", $"v", 0.5)
    assert(out.where($"g" === "d").count() == 0)
    assert(out.where($"v".isNull).count() == 0)
  }

  // --- diffSnapshots -------------------------------------------------------

  test("diffSnapshots classifies added/removed/changed with null-safe column attribution") {
    val a = Seq(
      (1L, Some("x"), "en"), (2L, Some("y"), "en"),
      (3L, None: Option[String], "fr"), (4L, Some("same"), "de")
    ).toDF("id", "text", "lang")
    val b = Seq(
      (1L, Some("x2"), "en"),                       // text changed
      (3L, Some("now"), "fr"),                      // null → value = changed
      (4L, Some("same"), "de"),                     // unchanged → filtered
      (5L, Some("new"), "es")                       // added
    ).toDF("id", "text", "lang")
    val byId = Storage.diffSnapshots(a, b, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(byId(1L) == (("changed", "text")))
    assert(byId(2L) == (("removed", "")))
    assert(byId(3L) == (("changed", "text")))
    assert(byId(5L) == (("added", "")))
    assert(!byId.contains(4L), s"unchanged row surfaced: $byId")
    assert(byId.size == 4)
  }

  test("diffSnapshots lists multiple changed columns in sorted order") {
    val a = Seq((1L, "t", "en")).toDF("id", "text", "lang")
    val b = Seq((1L, "u", "fr")).toDF("id", "text", "lang")
    val row = Storage.diffSnapshots(a, b, "id", Seq("text", "lang")).head()
    assert(row.getString(1) == "changed" && row.getString(2) == "lang,text")
  }
}
