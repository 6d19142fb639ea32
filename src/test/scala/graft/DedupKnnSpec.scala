package graft

import graft.dedup.Dedup
import graft.functions.{Hashing, TextFunctions}
import graft.similarity.KNN
import org.apache.spark.sql.functions._

/** Dedup + similarity semantics on crafted inputs. */
class DedupKnnSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog again and once"),  // near dup of 0
    (3L, "completely different words appear here with nothing shared at all"),
    (4L, "der hund und die katze und das haus und der garten und")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
      .orderBy("keep_id").select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("minhash LSH surfaces exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, col("text"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical -> all bands agree
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never surfaces
  }

  test("null-text docs: signature 0 (pairable), rep stats (0,0,0) — the explode_outer contract") {
    val withNulls = Seq((1L, null), (2L, "some real text here"), (3L, null))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(withNulls, col("text"), col("doc_id"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == 0L && sigs(3L) == 0L) // NULL coalesces to 0, not NULL
    // two null-text docs are hamming-0 duplicates and must pair up
    val pairs = Dedup.simhashPairs(withNulls, col("text"), col("doc_id"), maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
    val rs = TextFunctions.repetitionStats(withNulls, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rs(1L) == ((0L, 0L, 0L)))
  }

  test("simhash of identical docs equal; hamming to near-dup small, to unrelated large") {
    val sigs = Dedup.simhashSignatures(docs, col("text"), col("doc_id"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L))
    val hNear = java.lang.Long.bitCount(sigs(0L) ^ sigs(2L))
    val hFar = java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))
    assert(hNear < hFar)
  }

  test("ngram jaccard: identical=1.0, disjoint~0") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.ngramJaccard(pairs, docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((0L, 1L)) == 1.0)
    assert(out((0L, 3L)) < 0.2)
  }

  test("brute-force KNN: self excluded, ranks descend, k respected") {
    val emb = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val out = KNN.bruteForceTopK(emb, emb.where(col("vec_id") < 2), col("vec_id"), col("embedding"), 5)
    val rows = out.as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 10)
    assert(!rows.exists(r => r._1 == r._2))
    val perQ = rows.groupBy(_._1)
    perQ.values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq) // cosine desc by rank
    }
  }

  test("LSH KNN buckets: results are a subset of the corpus with sane scores") {
    val emb = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i + j * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val out = KNN.lshTopK(emb, emb.where(col("vec_id") < 3), col("vec_id"), col("embedding"), 5, 3, 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.forall(r => r._3 <= 1.0001 && r._3 >= -1.0001))
    assert(out.forall(r => r._1 != r._2))
  }

  test("IVF ANN: probing all cells recovers the exact top-k; fewer probes stay sane") {
    import graft.similarity.{IVF, KNN}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < 3)
    val index = IVF.fit(emb, col("vec_id"), col("embedding"), nCells = 8)
    // nProbe = nCells -> exhaustive search -> must equal brute force exactly
    val full = IVF.topK(index, queries, col("vec_id"), col("embedding"), 5, nProbe = 8)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val exact = KNN.bruteForceTopK(emb, queries, col("vec_id"), col("embedding"), 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact)
    // nProbe = 2: results valid (self-excluded, <= k per query)
    val probed = IVF.topK(index, queries, col("vec_id"), col("embedding"), 5, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(probed.forall(r => r._1 != r._2))
    assert(probed.groupBy(_._1).values.forall(_.length <= 5))
  }

  test("IVF cells as the embedding near-dup blocking key: learned buckets, same pair contract") {
    import graft.similarity.IVF
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cell = IVF.literalCell(col("embedding"), IVF.pretrainedCentroids)
    val pairs = Dedup.embeddingNearDups(emb, col("vec_id"), col("embedding"), cell, 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0.3))
    // blocking soundness: every surfaced pair really shares a cell
    val cells = emb.select(col("vec_id"), cell.as("c")).as[(Long, Int)].collect().toMap
    assert(pairs.forall(p => cells(p._1) == cells(p._2)))
  }

  test("IVF cellProfile: counts, cohesion, dominant label, entropy on crafted cells") {
    import graft.similarity.IVF
    // centroids = the axes; assignment is by dot(v,c)/‖c‖ first-max
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    val emb = Seq(
      (1L, Array(1f, 0f), 10),  // cell 0, cos 1, label 10
      (2L, Array(3f, 0f), 20),  // cell 0, cos 1, label 20
      (3L, Array(0f, 5f), 20),  // cell 1, cos 1, label 20
      (4L, Array(0f, 0f), 20)   // zero vector: tie -> first-max cell 0, cos 0
    ).toDF("vec_id", "embedding", "label")
    val prof = IVF.cellProfile(emb, col("embedding"), col("label"), cents)
      .orderBy("cell")
      .as[(Int, Long, Double, Double, Int, Double, Double)].collect()
    val ent0 = BigDecimal(-(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // cell 0: 3 vecs (share .75), avg cos (1+1+0)/3, label 20 dominates 2/3
    assert(prof(0) == ((0, 3L, 0.75, 0.6667, 20, 0.6667, ent0)), prof(0).toString)
    // cell 1: single label -> entropy exactly +0.0 (the -0.0 normalize)
    assert(prof(1) == ((1, 1L, 0.25, 1.0, 20, 1.0, 0.0)), prof(1).toString)
    assert(!prof(1)._7.equals(-0.0))
    // shares sum to 1
    assert(math.abs(prof.map(_._3).sum - 1.0) < 1e-9)
  }

  test("IVF index save/load roundtrip: cell-partitioned layout, identical search results") {
    import graft.similarity.IVF
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < 3)
    val index = IVF.fit(emb, col("vec_id"), col("embedding"), nCells = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    IVF.save(index, dir)
    // cell-partitioned layout on disk (the DPP-prunable production shape)
    val cellDirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.nonEmpty && cellDirs.forall(_.matches("cell=\\d+")))
    val loaded = IVF.load(spark, dir)
    assert(loaded.centroids.toSeq == index.centroids.toSeq)
    def run(ix: IVF.Index) =
      IVF.topK(ix, queries, col("vec_id"), col("embedding"), 5, nProbe = 2)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(run(loaded) == run(index))
  }

  test("IVF append: new vectors land in the fit-rule cells and full-probe search sees the union") {
    import graft.similarity.{IVF, KNN}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (oldBatch, newBatch) = (emb.where(col("vec_id") >= 10), emb.where(col("vec_id") < 10))
    val index = IVF.fit(oldBatch, col("vec_id"), col("embedding"), nCells = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    IVF.save(index, dir)
    IVF.append(spark, dir, newBatch, col("vec_id"), col("embedding"))
    val loaded = IVF.load(spark, dir)
    assert(loaded.assigned.count() == emb.count())
    // appended rows sit in the KMeans-rule cell (euclidean argmin vs the
    // SAVED centroids), recomputed independently on the driver
    val cents = loaded.centroids.map(_.toArray)
    val gotCells = loaded.assigned
      .where(col("n_id") < 10).select(col("n_id"), col("n_vec"), col("cell"))
      .as[(Long, Array[Float], Int)].collect()
    assert(gotCells.length == 10)
    gotCells.foreach { case (nId, v, cell) =>
      val want = cents.zipWithIndex.minBy { case (c, i) =>
        (c.zip(v.map(_.toDouble)).map { case (ci, vi) => (ci - vi) * (ci - vi) }.sum, i)
      }._2
      assert(cell == want, s"vec $nId in cell $cell, euclidean argmin is $want")
    }
    // exhaustive probe over the appended index == brute force over the union
    val queries = emb.where(col("vec_id") < 3)
    val full = IVF.topK(loaded, queries, col("vec_id"), col("embedding"), 5, nProbe = 4)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val exact = KNN.bruteForceTopK(emb, queries, col("vec_id"), col("embedding"), 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact)
  }

  test("langId picks marker-dominant language; und when no markers") {
    val out = docs.select(col("doc_id"), TextFunctions.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "en")
    assert(out(4L) == "de")
    assert(out(3L) == "und" || out(3L) == "en") // 'at' not a marker; may hit none
  }

  test("native DotProductF equals the declarative fold bit-for-bit") {
    import graft.functions.VectorFunctions
    val vecs = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(64)(j => (math.sin(i * 64 + j) * 100).toFloat))
    }.toDF("id", "v")
    val paired = vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
    val diff = paired.select(
      (VectorFunctions.dot(col("a.v"), col("b.v")) -
        VectorFunctions.dotFold(col("a.v"), col("b.v"))).as("d")
    ).where(col("d") =!= 0.0).count()
    assert(diff == 0) // identical accumulation order -> identical doubles
  }

  test("graft_dot registered for SQL via DotProductF.register / GraftExtensions") {
    graft.plans.DotProductF.register(spark)
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b").createOrReplaceTempView("vv")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vv").as[Double].head()
    assert(r == 32.0)
  }

  test("FuseDotProduct rule rewrites the declarative fold into graft_dot") {
    import graft.functions.VectorFunctions
    // must be a non-local source: ConvertToLocalRelation constant-folds
    // literal inputs before user-provided rules run
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(VectorFunctions.dotFold(col("embedding"), col("embedding")).as("d"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_dot"), s"rule did not fire:\n$plan")
    // and the fused value equals the native path
    val both = emb.select(
      VectorFunctions.dotFold(col("embedding"), col("embedding")).as("f"),
      VectorFunctions.dot(col("embedding"), col("embedding")).as("n"))
    assert(both.where(col("f") =!= col("n")).count() == 0)
  }

  test("hash48 is stable and 48-bit bounded") {
    val h = Seq("abc").toDF("s").select(Hashing.hash48(col("s"))).as[Long].head()
    assert(h == 158335321521362L) // == int('900150983cd2', 16), cross-checked in DuckDB
    assert(h >= 0 && h < (1L << 48))
  }

  test("recallAtK grades an approximate index against brute-force truth") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val truth = KNN.bruteForceTopK(emb, queries, col("vec_id"), col("embedding"), 5)
    // exact vs itself: recall 1.0 everywhere
    val self = KNN.recallAtK(truth, truth).as[(Long, Long, Long, Double)].collect()
    assert(self.forall(_._4 == 1.0))
    assert(self.exists(_._1 == -1L)) // macro row present
    // IVF with few probes: recall in (0, 1], macro row aggregates all queries
    val ivf = graft.similarity.IVF.literalTopK(
      emb, queries, col("vec_id"), col("embedding"), 5, 1,
      graft.similarity.IVF.pretrainedCentroids)
    val r = KNN.recallAtK(truth, ivf).as[(Long, Long, Long, Double)].collect()
    val macroRow = r.find(_._1 == -1L).get
    assert(macroRow._2 == 15L) // 3 queries x k=5 truth rows
    assert(macroRow._4 > 0.0 && macroRow._4 <= 1.0)
  }

  test("relational forms equal column forms: simhash, fingerprint, langId") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.functions.TextFunctions
    val simCol = docs.select(col("doc_id"), Hashing.simhash48(TextFunctions.wsTokens(col("text"))).as("simhash"))
    val simRel = Dedup.simhashSignatures(docs, col("text"), col("doc_id"))
    assert(simRel.join(simCol.withColumnRenamed("simhash", "c"), "doc_id")
      .where(col("simhash") =!= col("c")).count() == 0)
    val fpCol = docs.select(col("doc_id"), Hashing.fingerprint(col("text"), 8).as("fingerprint"))
    val fpRel = Dedup.fingerprints(docs, col("text"), col("doc_id"), 8)
    assert(fpRel.join(fpCol.withColumnRenamed("fingerprint", "c"), "doc_id")
      .where(col("fingerprint") =!= col("c")).count() == 0)
    val liCol = docs.select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
    val liRel = TextFunctions.langIdTable(docs, col("text"), col("doc_id"))
    assert(liRel.join(liCol.withColumnRenamed("lang_pred", "c"), "doc_id")
      .where(col("lang_pred") =!= col("c")).count() == 0)
    assert(liRel.count() == docs.count() && fpRel.count() == docs.count() && simRel.count() == docs.count())
  }

  test("nearDupClusters: components labeled by min id; singletons self-labeled; chains converge") {
    val vertices = (1L to 8L).map(Tuple1(_)).toDF("doc_id")
    // component {1,2,3,4} as a CHAIN (needs >1 propagation round),
    // component {6,7}, singletons 5 and 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("doc_a", "doc_b")
    val out = Dedup.nearDupClusters(vertices, col("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("nearDupClusters: driver union-find fast path ≡ distributed loop (random graphs, long + string ids)") {
    val rng = new scala.util.Random(421)
    for (trial <- 1 to 4) {
      val n = 40 + trial * 13
      val vertices = (1L to n.toLong).map(Tuple1(_)).toDF("doc_id")
      val pairs = Seq.fill(n)((rng.nextInt(n) + 1L, rng.nextInt(n) + 1L))
        .filter { case (a, b) => a != b }
        .toDF("doc_a", "doc_b")
      val fast = Dedup.nearDupClusters(vertices, col("doc_id"), pairs)
        .as[(Long, Long)].collect().toMap
      val loop = Dedup.nearDupClusters(vertices, col("doc_id"), pairs, localPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(fast == loop, s"trial $trial: fast-path labels diverge from the distributed loop")
    }
    // string ids: cluster_id is the UTF8-binary minimum in both paths
    val sv = Seq("b", "a", "c", "z", "m").map(Tuple1(_)).toDF("doc_id")
    val sp = Seq(("b", "z"), ("z", "a")).toDF("doc_a", "doc_b")
    val sFast = Dedup.nearDupClusters(sv, col("doc_id"), sp)
      .as[(String, String)].collect().toMap
    val sLoop = Dedup.nearDupClusters(sv, col("doc_id"), sp, localPairs = 0L)
      .as[(String, String)].collect().toMap
    assert(sFast == Map("a" -> "a", "b" -> "a", "z" -> "a", "c" -> "c", "m" -> "m"))
    assert(sFast == sLoop)
  }

  test("nearDupClusters ignores pairs citing ids outside the vertex universe (no keeperless clusters)") {
    val vertices = Seq(2L, 3L, 4L).map(Tuple1(_)).toDF("doc_id")
    // pair (1,2) cites doc 1, which is NOT in the universe (pairs computed
    // over a superset corpus): it must not crown 1 as cluster root —
    // dropNearDuplicates would then delete doc 2 with no keeper retained
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.nearDupClusters(vertices, col("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(2L -> 2L, 3L -> 3L, 4L -> 3L))
    val docs = Seq((2L, "two"), (3L, "three"), (4L, "four")).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, col("doc_id"), pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L)) // 2 kept (its foreign pair is ignored), 4 deduped into 3
  }

  test("embeddingNearDups cap law: skewed bucket dropped, small buckets untouched, default unchanged") {
    // label "unlabeled" is the degenerate catch-all (6 members); "a" is a
    // healthy 2-member bucket. Vectors are near-identical within a bucket
    // so every in-bucket pair clears the threshold.
    val emb = ((0 until 6).map(i => (i.toLong, Array.fill(4)(1.0f + i * 1e-4f), "unlabeled")) ++
      Seq((10L, Array.fill(4)(0.5f), "a"), (11L, Array.fill(4)(0.5f), "a")))
      .toDF("vec_id", "embedding", "label")
    def run(cap: Int) = Dedup.embeddingNearDups(
      emb, col("vec_id"), col("embedding"), col("label"), 0.3, maxBucket = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val all = run(Int.MaxValue)
    assert(all.contains((10L, 11L)) && all.size == 15 + 1) // C(6,2) + 1
    val capped = run(4)
    assert(capped == Set((10L, 11L))) // oversized bucket fully excluded
    assert(capped.subsetOf(all))
    val report = Dedup.embeddingOversizedBuckets(emb, col("vec_id"), col("label"), 4)
      .as[(String, Long)].collect().toSeq
    assert(report == Seq(("unlabeled", 6L)))
  }

  test("contamination screen flags docs sharing n-grams with the benchmark, not clean ones") {
    val leaked = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq(
      (10L, s"prefix text $leaked and a suffix"),  // contains the benchmark item
      (11L, "completely clean document with original content throughout"),
      (12L, leaked)                                 // verbatim copy
    ).toDF("doc_id", "text")
    val bench = Seq((100L, leaked)).toDF("bench_id", "bench_text")
    val hits = Dedup.contamination(
      corpus, col("text"), col("doc_id"), bench, col("bench_text"), col("bench_id"),
      n = 8, minShared = 3
    ).as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(hits.contains(10L) && hits.contains(12L))
    assert(!hits.contains(11L))
    assert(hits(12L) >= hits(10L)) // verbatim copy shares at least as many grams
  }

  test("chunkFixed covers the text with strided windows; packByBudget fills shard packs") {
    import graft.functions.TextFunctions
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val chunks = TextFunctions.chunkFixed(docs, col("text"), col("doc_id"), size = 4, stride = 3)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // starts 1,4,7: windows abcd, defg, ghij — no redundant suffix-only
    // tail chunk (the previous window already reached the end); empty doc: none
    assert(chunks == Seq((1L, 0L, "abcd"), (1L, 1L, "defg"), (1L, 2L, "ghij")))
    // full coverage: concatenating stride-prefixes + last chunk rebuilds the text
    assert(chunks.init.map(_._3.take(3)).mkString + chunks.last._3 == "abcdefghij")
    // stride > size would silently drop text — rejected
    intercept[IllegalArgumentException] {
      TextFunctions.chunkFixed(docs, col("text"), col("doc_id"), size = 4, stride = 5)
    }

    val weighted = Seq((1L, 30L, "s1"), (2L, 50L, "s1"), (3L, 40L, "s1"), (4L, 90L, "s2"))
      .toDF("doc_id", "n", "src")
    val packs = TextFunctions.packByBudget(weighted, col("doc_id"), col("n"), col("src"), capacity = 60L)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // s1: cum 30,80,120 -> starts 0,30,80 -> packs 0,0,1 ; s2: start 0 -> pack 0
    assert(packs == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("redact scrubs emails, URLs, and long digit runs; clean text untouched") {
    import graft.functions.TextFunctions
    val rows = Seq(
      "contact alice.smith+x@example.co.uk for details",
      "see https://example.com/path?q=1 now",
      "card 1234567890 but year 2024 stays",
      "nothing sensitive here at all"
    ).toDF("text").select(TextFunctions.redact(col("text")).as("c")).as[String].collect()
    assert(rows(0) == "contact <EMAIL> for details")
    assert(rows(1) == "see <URL> now")
    assert(rows(2) == "card <NUM> but year 2024 stays") // 4 digits below the threshold
    assert(rows(3) == "nothing sensitive here at all")
  }

  test("keepBestPerCluster picks the highest score, not the lowest id") {
    // docs 0/1/2 near-dup cluster; give doc 2 (largest id) the best score
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    val scores = Map(0L -> 0.2, 1L -> 0.5, 2L -> 0.9, 3L -> 0.1, 4L -> 0.1)
    val scoreCol = scores.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("doc_id") === k, lit(v)).otherwise(acc)
    }
    val out = Dedup.keepBestPerCluster(docs, col("doc_id"), pairs, scoreCol)
      .select("keep_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(2L, 3L, 4L)) // NOT doc 0, the min id
    assert(out(2L) == 0L) // cluster label stays the min id
    // contrast with the min-id rule
    val minId = Dedup.dropNearDuplicates(docs, col("doc_id"), pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(0L, 3L, 4L))
  }

  test("normalize: lower, strip control chars, collapse whitespace, trim") {
    import graft.functions.TextFunctions
    val rows = Seq(
      "  Hello\t\tWORLD \n again  ",
      "tab\u0000null\u0007bell\u007fdel",
      "already clean",
      ""
    ).toDF("text").select(TextFunctions.normalize(col("text")).as("c")).as[String].collect()
    assert(rows(0) == "hello world again")
    assert(rows(1) == "tabnullbelldel") // non-ws controls vanish, no separator added
    assert(rows(2) == "already clean")
    assert(rows(3) == "")
    // vertical tab: Java \s includes \x0b, RE2's does not — the explicit
    // whitespace class must treat it as a separator in both engines
    val vt = Seq("a\u000bb").toDF("text")
      .select(TextFunctions.normalize(col("text")).as("c")).as[String].head()
    assert(vt == "a b")
    // idempotence: normalizing normalized text is the identity
    // the \u0001 between two whitespace runs is the idempotence trap:
    // stripped after a collapse it would fuse two spaces
    val once = Seq("  A  \u0001 B  ").toDF("text")
      .select(TextFunctions.normalize(col("text")).as("c"))
    val twice = once.select(TextFunctions.normalize(col("c")).as("c"))
    assert(once.as[String].head() == twice.as[String].head())
  }

  test("repetitionStats: exact duplicate-token and top-bigram counts") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "spam spam spam spam"),           // 4 tokens, 1 distinct, top bigram "spam spam" x3
      (2L, "all words here are unique"),     // 5 tokens, 5 distinct, every bigram once
      (3L, "one"),                           // single token: no bigrams
      (4L, "")                               // empty: all zeros
    ).toDF("doc_id", "text")
    val out = TextFunctions.repetitionStats(docs, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 1L, 3L)))
    assert(out(2L) == ((5L, 5L, 1L)))
    assert(out(3L) == ((1L, 1L, 0L)))
    assert(out(4L) == ((0L, 0L, 0L)))
  }

  test("winnowing fingerprints: shared long substrings guarantee a shared fingerprint") {
    val common = "this exact sentence appears verbatim in two documents"
    val docs = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"totally different lead-in $common and outro"),
      (3L, "nothing in common with the others at all here"),
      (4L, "tiny") // shorter than n+w-1: no full window, no rows
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowingFingerprints(docs, col("text"), col("doc_id"), n = 8, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // shared substring of length >= n+w-1 = 11 -> guaranteed common fingerprint
    assert((fp(1L) intersect fp(2L)).nonEmpty)
    assert((fp(1L) intersect fp(3L)).isEmpty)
    assert(!fp.contains(4L))
    // each fingerprint is some gram hash of the doc (window-min soundness)
    val grams1 = docs.where(col("doc_id") === 1L)
      .select(explode(Hashing.gramHashes(col("text"), 8)).as("h"))
      .as[Long].collect().toSet
    assert(fp(1L).subsetOf(grams1))
    // kernel parity: the expression's hashes equal a direct recompute
    val text1 = docs.where(col("doc_id") === 1L).select("text").as[String].head()
    val direct = graft.plans.RollingHash48
      .gramHashes(text1.getBytes(java.nio.charset.StandardCharsets.UTF_8), 8).toSet
    assert(grams1 == direct)
  }

  test("minhash maxBucket cap drops degenerate boilerplate buckets before pair expansion") {
    // 10 copies of the same boilerplate: identical signatures, one bucket of
    // 10 per band -> 45 quadratic pairs without the cap
    val boiler = (1L to 10L).map(i => (i, "the same license header boilerplate repeated across many documents verbatim"))
    val others = Seq(
      (100L, "completely different content about an unrelated subject matter"),
      (101L, "another independent document with its own distinct vocabulary"))
    val docs = (boiler ++ others).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(docs, col("text"), col("doc_id"))
    assert(uncapped.count() == 45)
    val capped = Dedup.minhashLshPairs(docs, col("text"), col("doc_id"), maxBucket = 5)
    assert(capped.count() == 0) // the only candidate buckets were oversized
    val oversized = Dedup.minhashOversizedBuckets(docs, col("text"), col("doc_id"), maxBucket = 5)
    val members = oversized.select(col("n_members")).as[Long].collect()
    assert(members.nonEmpty && members.forall(_ == 10L)) // observability of what was dropped
    // default cap unchanged: same result as an explicit huge cap
    assert(Dedup.minhashLshPairs(docs, col("text"), col("doc_id"), maxBucket = 1000).count() == 45)
  }

  test("simhash pair join finds exactly the all-pairs hamming<=r set (pigeonhole recall)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (4L, "totally unrelated words nothing shared here at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, col("text"), col("doc_id"), maxHamming = 3)
      .select(col("doc_a"), col("doc_b"), col("hamming")).as[(Long, Long, Long)].collect().toSet
    // brute-force oracle in Scala
    val sigs = Dedup.simhashSignatures(docs, col("text"), col("doc_id"))
      .as[(Long, Long)].collect().toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(pairs == expected)
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 3L && h == 0L })
  }

  test("minhashEstimate: 1.0 for identical docs, matches the Scala-recomputed agreement exactly") {
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.minhashEstimate(pairs, docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((0L, 1L)) == 1.0) // identical text -> all components agree
    assert(out((0L, 2L)) > 0.0 && out((0L, 2L)) < 1.0) // near-dup: partial agreement
    // oracle-in-Scala: recompute the agreement from the signatures
    val sigs = docs.select(col("doc_id"),
        graft.functions.Hashing.minhashSigDoc(col("text"), 3, 12).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    out.foreach { case ((a, b), est) =>
      val expect = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 12.0
      assert(math.abs(est - math.rint(expect * 10000) / 10000) < 1e-9, s"pair ($a,$b)")
    }
  }

  test("mergeClusters: star edges + new pairs == full recompute over the union") {
    val vertices = (1L to 10L).map(Tuple1(_)).toDF("doc_id")
    val oldPairs = Seq((1L, 2L), (2L, 3L), (6L, 7L)).toDF("doc_a", "doc_b")
    val newPairs = Seq((3L, 6L), (8L, 9L)).toDF("doc_a", "doc_b") // bridges {1-3} with {6,7}
    val old = Dedup.nearDupClusters(vertices, col("doc_id"), oldPairs)
    val merged = Dedup.mergeClusters(vertices, col("doc_id"), old, newPairs)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.nearDupClusters(
      vertices, col("doc_id"), oldPairs.unionByName(newPairs))
      .as[(Long, Long)].collect().toMap
    assert(merged == full)
    assert(merged(7L) == 1L) // the bridge united the two old components
    assert(merged(9L) == 8L && merged(10L) == 10L)
  }

  test("dropSharedSegments: shared lines vanish everywhere, unique lines keep order; edge cases") {
    val d = Seq(
      (1L, "SHARED HEADER\nalpha one\nbeta two"),
      (2L, "SHARED HEADER\ngamma three"),
      (3L, "SHARED HEADER"),            // everything shared -> empty string
      (4L, "delta four\nepsilon five"), // nothing shared -> untouched
      (5L, null.asInstanceOf[String])   // null text stays null
    ).toDF("doc_id", "text")
    val out = Dedup.dropSharedSegments(d, col("text"), col("doc_id"), "\n", minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(3)))).toMap
    assert(out(1L) == ((Some("alpha one\nbeta two"), 2L)))
    assert(out(2L) == ((Some("gamma three"), 1L)))
    assert(out(3L) == ((Some(""), 0L)))
    assert(out(4L) == ((Some("delta four\nepsilon five"), 2L)))
    assert(out(5L) == ((None, 0L)))
    // repeated occurrences within ONE doc do not make a segment "shared" —
    // carrier counts are DISTINCT documents
    val solo = Seq((1L, "x\nx\ny"), (2L, "z")).toDF("doc_id", "text")
    val soloOut = Dedup.dropSharedSegments(solo, col("text"), col("doc_id"), "\n", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(soloOut(1L) == "x\nx\ny" && soloOut(2L) == "z")
    intercept[IllegalArgumentException] {
      Dedup.dropSharedSegments(d, col("text"), col("doc_id"), "\n", minDocs = 1)
    }
  }

  test("graft.checkpointDir switches CC materialization to RELIABLE checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    val vertices = (1L to 8L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L)
    spark.conf.set(graft.Materialize.ConfKey, dir.getAbsolutePath)
    try {
      // localPairs = 0 forces the DISTRIBUTED loop — this test is about
      // the loop's checkpoint durability, which the small-graph driver
      // fast path never touches
      val out = Dedup.nearDupClusters(vertices, col("doc_id"), pairs, localPairs = 0L)
        .as[(Long, Long)].collect().toMap
      assert(out == expected) // identical labels under either durability mode
      // reliable checkpoint = RDD blocks written to the checkpoint FS
      // (executor-loss-safe), not executor-local storage: assert files of
      // the rdd-NN form landed under the configured directory
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).toSeq.flatten.flatMap { c =>
          (if (c.isDirectory) rddDirs(c) else Nil) ++
            (if (c.getName.startsWith("rdd-")) Seq(c) else Nil)
        }
      assert(rddDirs(dir).nonEmpty,
        s"expected reliable checkpoint files under $dir — none written")
    } finally spark.conf.unset(graft.Materialize.ConfKey)
    // conf unset: back to localCheckpoint, same labels
    val local = Dedup.nearDupClusters(vertices, col("doc_id"), pairs)
      .as[(Long, Long)].collect().toMap
    assert(local == expected)
  }

  test("conflicting graft.checkpointDir values on one SparkContext throw; repoint re-points deliberately") {
    // setCheckpointDir is context-GLOBAL while the conf is session-scoped:
    // a second session (or a reconfigured one) silently re-pointing the
    // shared dir would land one session's "reliable" blocks under the
    // other's scratch path. The guard makes the conflict loud.
    val d1 = java.nio.file.Files.createTempDirectory("graft-ckpt-a").toFile
    val d2 = java.nio.file.Files.createTempDirectory("graft-ckpt-b").toFile
    val ds = Seq(1L, 2L, 3L).toDF("x")
    graft.Materialize.repoint(spark) // self-contained: forget prior suites' applied dir
    try {
      spark.conf.set(graft.Materialize.ConfKey, d1.getAbsolutePath)
      assert(graft.Materialize(ds).count() == 3)
      spark.conf.set(graft.Materialize.ConfKey, d2.getAbsolutePath)
      val e = intercept[IllegalStateException] { graft.Materialize(ds) }
      assert(e.getMessage.contains("context-global"), e.getMessage)
      // the context still points at the FIRST dir — nothing was re-pointed
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(d1.getName)))
      // a DELIBERATE re-point: forget the applied record, then apply again
      graft.Materialize.repoint(spark)
      assert(graft.Materialize(ds).count() == 3)
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(d2.getName)))
    } finally {
      spark.conf.unset(graft.Materialize.ConfKey)
      graft.Materialize.repoint(spark)
    }
  }

  test("dropByClusters/keepBestByClusters share ONE CC run; pairs forms pay one each") {
    val scores = Map(0L -> 0.2, 1L -> 0.5, 2L -> 0.9, 3L -> 0.1, 4L -> 0.1)
    val scoreCol = scores.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("doc_id") === k, lit(v)).otherwise(acc)
    }
    // the pair plan carries an evaluation counter: nearDupClusters
    // materializes its (single-partition) input exactly once per CC run,
    // so the accumulator counts CC runs
    val acc = spark.sparkContext.longAccumulator("pairEvals")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
      .repartition(1).as[(Long, Long)]
      .mapPartitions { it => acc.add(1); it }.toDF("doc_a", "doc_b")
    acc.reset()
    val viaPairsKept = Dedup.dropNearDuplicates(docs, col("doc_id"), pairs)
      .select("doc_id").as[Long].collect().toSet
    val viaPairsBest = Dedup.keepBestPerCluster(docs, col("doc_id"), pairs, scoreCol)
      .select("keep_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(acc.value == 2, "each pairs-form consumer pays its own CC run")
    acc.reset()
    val clusters = Dedup.nearDupClusters(docs, col("doc_id"), pairs)
    val sharedKept = Dedup.dropByClusters(docs, col("doc_id"), clusters)
      .select("doc_id").as[Long].collect().toSet
    val sharedBest = Dedup.keepBestByClusters(docs, col("doc_id"), clusters, scoreCol)
      .select("keep_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(acc.value == 1, "shared-labels composition runs CC exactly once")
    assert(sharedKept == viaPairsKept && sharedBest == viaPairsBest)
  }

  test("ngramCoverage: distinct-gram fractions; short docs report 0/0; repeats count once") {
    val ref = Seq((1L, "a b c d e")).toDF("doc_id", "text") // grams: "a b c" "b c d" "c d e"
    val tgt = Seq(
      (10L, "a b c d"),           // "a b c" "b c d" → both in ref → 1.0
      (11L, "x y z w"),           // nothing shared → 0.0
      (12L, "a b c x y z"),       // "a b c"(hit) "b c x" "c x y" "x y z" → 1/4
      (13L, "hi there"),          // < 3 tokens → no grams
      (14L, "a b c a b c")        // distinct grams: "a b c"(hit) "b c a" "c a b" → 1/3
    ).toDF("doc_id", "text")
    val out = Dedup.ngramCoverage(tgt, ref, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) == ((2L, 2L, 1.0)))
    assert(out(11L) == ((2L, 0L, 0.0)))
    assert(out(12L) == ((4L, 1L, 0.25)))
    assert(out(13L) == ((0L, 0L, 0.0)))
    assert(out(14L) == ((3L, 1L, 0.3333)))
    assert(out.size == 5) // every target doc reports, gram-less ones included
  }

  test("containment: a doc fully quoted inside a longer doc scores containment_a = 1.0") {
    val a = "alpha beta gamma delta epsilon" // 3 word-3-shingles
    val b = s"intro words here $a trailing content words" // quotes all of A
    val d = Seq((1L, a), (2L, b), (3L, "nothing shared with either other doc"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.containment(pairs, d, col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // A ⊂ B: all 3 of A's shingles occur in B (9 shingles) — the
    // asymmetry IS the signal: containment_a = 1 while Jaccard ≈ 0.33
    assert(out((1L, 2L)) == ((3L, 1.0, 0.3333)), out.toString)
    assert(out((1L, 3L)) == ((0L, 0.0, 0.0)))
  }

  test("sourceOverlap: cross-source near-dups land in the unordered source cell") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = Seq(
      (1L, base, "srcA"),
      (2L, base, "srcB"),
      (3L, base, "srcB"),
      (4L, "completely different unrelated words appear here with nothing shared", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(d, col("text"), col("doc_id"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // identical docs 1/2/3 pair exhaustively: (1,2) (1,3) cross-source, (2,3) within srcB
    assert(out == Map(("srcA", "srcB") -> 2L, ("srcB", "srcB") -> 1L), out.toString)
    // cells are unordered pairs (least, greatest) and totals conserve the pair count
    assert(out.keys.forall(k => k._1 <= k._2))
    assert(out.values.sum ==
      Dedup.minhashLshPairs(d, col("text"), col("doc_id")).count())
  }

  test("embeddingStats: null / wrong-dim / non-finite / zero counts and valid-norm stats") {
    import graft.functions.VectorFunctions
    val emb = Seq(
      (1L, Array(3f, 4f)),                     // valid, norm 5
      (2L, Array(0f, 0f)),                     // valid but zero-norm
      (3L, Array(1f)),                         // wrong dimension
      (4L, Array(Float.NaN, 1f)),              // non-finite
      (5L, null.asInstanceOf[Array[Float]]),   // null
      (6L, Array(Float.PositiveInfinity, 0f))  // non-finite
    ).toDF("vec_id", "embedding")
    val r = VectorFunctions.embeddingStats(emb, col("embedding"), expectedDim = 2).head()
    assert(r.getLong(0) == 6L, "n_vectors")
    assert(r.getLong(1) == 1L, "n_null")
    assert(r.getLong(2) == 1L, "n_wrong_dim")
    assert(r.getLong(3) == 2L, "n_nonfinite")
    assert(r.getLong(4) == 1L, "n_zero")
    // norm stats over the two VALID vectors only: {5.0, 0.0}
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 2.5 && r.getDouble(7) == 5.0)
    // a clean table reports all-zero pathology counts
    val clean = VectorFunctions.embeddingStats(
      Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding"), col("embedding"), 2).head()
    assert(clean.getLong(1) == 0 && clean.getLong(2) == 0 && clean.getLong(3) == 0)
    // a NULL ELEMENT poisons dot products like a NaN — counted non-finite
    val nullElem = VectorFunctions.embeddingStats(
      Seq(1L).toDF("vec_id")
        .select(col("vec_id"), array(lit(1f), lit(null).cast("float")).as("embedding")),
      col("embedding"), 2).head()
    assert(nullElem.getLong(3) == 1L, "null element must count as non-finite")
  }

  test("semanticDedup: cell-blocked clusters, SemDeDup keep-farthest rule, cross-cell blindness") {
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    val emb = Seq(
      (1L, Array(1f, 0f)),        // cell 0, on-centroid
      (2L, Array(0.999f, 0.01f)), // cell 0, near-dup of 1 (cos ≈ 0.99995)
      (3L, Array(0.8f, 0.2f)),    // cell 0, distinct (cos to 1 ≈ 0.970 < τ)
      (4L, Array(0f, 1f)),        // cell 1, alone
      (5L, Array(0.714f, 0.7f)),  // cell 0 ┐ cos(5,6) ≈ 0.9998 ≥ τ but cells
      (6L, Array(0.7f, 0.714f))   // cell 1 ┘ differ — blocking never pairs them
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(
      emb, col("vec_id"), col("embedding"), cents, threshold = 0.99)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // cells: argmax of cos to (1,0)/(0,1)
    assert(out(1L)._1 == 0 && out(2L)._1 == 0 && out(3L)._1 == 0)
    assert(out(4L)._1 == 1 && out(5L)._1 == 0 && out(6L)._1 == 1)
    // clusters: {1,2} merge; everything else singleton (5/6 split by cells)
    assert(out(1L)._2 == out(2L)._2)
    assert(Seq(3L, 4L, 5L, 6L).map(out(_)._2).distinct.size == 4)
    assert(out(3L)._2 != out(1L)._2 && out(5L)._2 != out(6L)._2)
    // SemDeDup keeper: FARTHEST from centroid wins the {1,2} cluster — vec 2
    // (cos_centroid 0.9999) over vec 1 (exactly 1.0)
    assert(!out(1L)._4 && out(2L)._4)
    assert(out(1L)._3 == 1.0 && out(2L)._3 < 1.0)
    // exactly one keeper per cluster
    val perCluster = out.values.groupBy(_._2).values
    assert(perCluster.forall(_.count(_._4) == 1))
    // keep-most-typical flips the {1,2} keeper to vec 1
    val typical = Dedup.semanticDedup(
      emb, col("vec_id"), col("embedding"), cents, threshold = 0.99,
      keepFarthest = false)
      .where(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(typical.contains(1L) && !typical.contains(2L))
  }
}
