package graft

import graft.operators.{CoreFlows, Topology}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws the reference's test suite lacks (SURVEY.md §5):
  * algebraic invariants over randomized (seeded, reproducible) inputs.
  * Uses raw ScalaCheck generators — the scalatest bridge artifact is not
  * in the offline dependency cache.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val intLists = Gen.listOfN(30, Gen.chooseNum(-1000, 1000))

  test("Fold law: running sum is a prefix sum and ends at the total (flow/fold.go:78-82)") {
    samples(intLists, 5).filter(_.nonEmpty).foreach { xs =>
      val df = xs.zipWithIndex.toDF("v", "i")
      val out = CoreFlows.foldRunningAgg(sum, col("v"), Nil, Seq(col("i")), "acc")(df)
        .orderBy("i").select("acc").as[Long].collect()
      assert(out.last == xs.map(_.toLong).sum)
      out.zip(xs).zipWithIndex.foreach { case ((acc, x), i) =>
        val prev = if (i == 0) 0L else out(i - 1)
        assert(acc == prev + x)
      }
    }
  }

  test("Merge preserves the multiset (flow/util.go:84-105)") {
    samples(Gen.zip(intLists, intLists), 5).foreach { case (xs, ys) =>
      val merged = Topology.merge(Seq(xs.toDF("v"), ys.toDF("v")))
        .as[Int].collect().sorted.toSeq
      assert(merged == (xs ++ ys).sorted)
    }
  }

  test("Split is a partition: branches disjoint, union = input (flow/util.go:23-41)") {
    samples(intLists, 5).foreach { xs =>
      val df = xs.toDF("v")
      val (t, f) = Topology.split(df, col("v") % 3 === 0)
      val ts = t.as[Int].collect().toSeq
      val fs = f.as[Int].collect().toSeq
      assert(ts.forall(_ % 3 == 0) && fs.forall(_ % 3 != 0))
      assert((ts ++ fs).sorted == xs.sorted)
    }
  }

  test("Flatten inverts grouping: explode(collect) = identity multiset") {
    samples(intLists, 5).filter(_.nonEmpty).foreach { xs =>
      val df = xs.zipWithIndex.toDF("v", "i")
      val nested = df.groupBy(col("i") % 5).agg(collect_list(col("v")).as("arr"))
      val out = CoreFlows.flatten(col("arr"), "v")(nested).as[Int].collect().toSeq
      assert(out.sorted == xs.sorted)
    }
  }

  test("ZipWith output length = max input length; zero-fill beyond shorter (flow/flow_test.go:296-369)") {
    samples(Gen.zip(Gen.chooseNum(1, 15), Gen.chooseNum(1, 15)), 5).foreach { case (n, m) =>
      val a = (1 to n).toDF("a")
      val b = (1 to m).toDF("b")
      val out = Topology.zipWith(spark, Seq(
        (a, Seq(col("a")), Map("a" -> lit(0))),
        (b, Seq(col("b")), Map("b" -> lit(0)))
      )).orderBy("__idx").select("a", "b").as[(Int, Int)].collect()
      assert(out.length == math.max(n, m))
      out.zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == (if (i < n) i + 1 else 0))
        assert(y == (if (i < m) i + 1 else 0))
      }
    }
  }

  private val wordGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu")
  private val docGen = Gen.listOfN(10, wordGen).map(_.mkString(" "))

  test("SimHash pair-join law: chunk blocking == all-pairs hamming filter on random corpora") {
    import graft.dedup.Dedup
    samples(Gen.listOfN(20, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val blocked = Dedup.simhashPairs(docs, col("text"), col("doc_id"), maxHamming = 3)
        .as[(Long, Long, Long)].collect().toSet
      val sigs = Dedup.simhashSignatures(docs, col("text"), col("doc_id"))
        .as[(Long, Long)].collect().toMap
      val brute = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
      } yield (a, b, h.toLong)).toSet
      assert(blocked == brute) // pigeonhole recall is exact, not approximate
    }
  }

  test("Winnowing law: fingerprints are gram hashes; shared substring >= n+w-1 shares one") {
    import graft.dedup.Dedup
    import graft.functions.Hashing
    val fragGen = Gen.listOfN(5, Gen.alphaLowerStr.map(_.take(6))).map(_.mkString(" "))
    samples(Gen.zip(fragGen, fragGen, fragGen), 4).foreach { case (shared0, pre, post) =>
      val shared = (shared0 + " padding padding").take(20) // ensure >= n+w-1 = 11 chars
      val docs = Seq(
        (1L, s"$pre $shared"),
        (2L, s"$shared $post"),
        (3L, "zq" * 12) // unrelated
      ).toDF("doc_id", "text")
      val fp = Dedup.winnowingFingerprints(docs, col("text"), col("doc_id"), n = 8, w = 4)
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert((fp(1L) intersect fp(2L)).nonEmpty) // guarantee holds on random content
      val grams1 = docs.where(col("doc_id") === 1L)
        .select(explode(Hashing.gramHashes(col("text"), 8)).as("h"))
        .as[Long].collect().toSet
      assert(fp(1L).subsetOf(grams1)) // soundness: every fingerprint is a real gram hash
    }
  }

  test("Rolling-hash law: recurrence equals weighted-sum definition on arbitrary bytes (incl. non-ASCII)") {
    import graft.plans.RollingHash48
    val byteGen = Gen.listOfN(40, Gen.chooseNum(-128, 127).map(_.toByte))
    samples(Gen.zip(byteGen, Gen.chooseNum(1, 12)), 12).foreach { case (bs, n) =>
      val bytes = bs.toArray
      val got = RollingHash48.gramHashes(bytes, n).toSeq
      val want = (0 to bytes.length - n).map { p =>
        (0 until n).map(j => (bytes(p + j) & 0xffL) * RollingHash48.Pow(n - 1 - j)).sum & RollingHash48.Mask
      }
      assert(got == want)
      assert(got.forall(h => h >= 0 && h <= RollingHash48.Mask))
    }
  }

  test("Kernel parity law: simhash/minhash-sig kernels equal the declarative forms on random text") {
    import graft.functions.{Hashing, TextFunctions}
    // tokens with mixed case, repeats, unicode, and odd whitespace runs
    val tokGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const("Zün"), Gen.const("the"))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = Gen.listOfN(12, Gen.zip(tokGen, sepGen))
      .map(_.map { case (t, s) => t + s }.mkString)
    samples(textGen, 8).foreach { text =>
      val df = Seq(Tuple1(text)).toDF("text")
      val row = df.select(
        coalesce(Hashing.simhashDoc(col("text")), lit(0L)).as("kernel_sim"),
        Hashing.simhash48(TextFunctions.wsTokens(col("text"))).as("decl_sim"),
        Hashing.minhashSigDoc(col("text"), 3, 12).as("kernel_sig"),
        when(size(TextFunctions.wsTokens(col("text"))) >= 3,
          Hashing.minhashSignature(Hashing.wordShingles(TextFunctions.wsTokens(col("text")), 3), 12))
          .otherwise(array().cast("array<bigint>")).as("decl_sig")
      ).head()
      assert(row.getLong(0) == row.getLong(1), s"simhash mismatch on: '$text'")
      assert(row.getSeq[Long](2) == row.getSeq[Long](3), s"minhash sig mismatch on: '$text'")
    }
  }

  test("MinHash cap law: capped pairs are a subset; default cap changes nothing") {
    import graft.dedup.Dedup
    samples(Gen.listOfN(15, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val all = Dedup.minhashLshPairs(docs, col("text"), col("doc_id"))
        .as[(Long, Long)].collect().toSet
      val capped = Dedup.minhashLshPairs(docs, col("text"), col("doc_id"), maxBucket = 4)
        .as[(Long, Long)].collect().toSet
      assert(capped.subsetOf(all))
      val explicit = Dedup.minhashLshPairs(docs, col("text"), col("doc_id"), maxBucket = Int.MaxValue)
        .as[(Long, Long)].collect().toSet
      assert(explicit == all)
    }
  }

  test("MinhashSigF rejects signature lengths past the overflow-safe bound k=8190") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // largest safe k constructs: a_j = 2k+3 < 2^14 keeps a_j*h under 2^62
    graft.plans.MinhashSigF(Literal("x"), 2, 8190)
    val err = intercept[IllegalArgumentException] {
      graft.plans.MinhashSigF(Literal("x"), 2, 8191)
    }
    assert(err.getMessage.contains("8190"))
  }

  // dense key/time ranges force heavy collisions: many rights per left,
  // equal-timestamp ties, keys with no rights at all
  private val asofEvents = Gen.zip(
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 50L))),
    Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 50L))))

  test("as-of law: union-and-carry == brute-force latest-at-or-before on random data") {
    import graft.operators.Joins
    samples(asofEvents, 5).foreach { case (ls, rsRaw) =>
      // right unique per (key, ts) — the operator's contract
      val rs = rsRaw.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("id", "k", "t")
      val right = rs.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000), v) }
        .toDF("rk", "rt", "v")
      for (strict <- Seq(false, true); dir <- Seq("backward", "forward")) {
        val got = Joins.asOf(left, right, "k", "rk", "t", "rt", Seq("v"),
            strict = strict, direction = dir)
          .select($"id", $"v").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        val want = ls.zipWithIndex.map { case ((k, t), i) =>
          val cands = rs.filter { r =>
            r._1 == k && ((dir, strict) match {
              case ("backward", false) => r._2 <= t
              case ("backward", true)  => r._2 < t
              case ("forward", false)  => r._2 >= t
              case _                   => r._2 > t
            })
          }
          val pick = if (cands.isEmpty) None
            else Some((if (dir == "backward") cands.maxBy(_._2) else cands.minBy(_._2))._3)
          i.toLong -> pick
        }.toMap
        assert(got == want, s"strict=$strict dir=$dir")
      }
    }
  }

  test("interval law: bucketed join == brute-force range scan, any bucket width") {
    import graft.operators.Joins
    samples(asofEvents, 5).foreach { case (ps, ivRaw) =>
      val ivs = ivRaw.zipWithIndex.map { case ((k, s), i) =>
        (i.toLong, k, s, s + (i % 7)) } // lengths 0..6 (incl. empty)
      val points = ps.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("pid", "k", "t")
      val intervals = ivs.map { case (id, k, s, e) =>
        (id, k, new java.sql.Timestamp(s * 1000), new java.sql.Timestamp(e * 1000)) }
        .toDF("iid", "ik", "s", "e")
      val want = (for {
        (pid, pk, pt) <- ps.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        (iid, ik, s, e) <- ivs if ik == pk && pt >= s && pt < e
      } yield (pid, iid)).sorted
      for (width <- Seq(1L, 3L, 1000L)) { // seconds: smaller, similar, larger than lengths
        val got = Joins.interval(points, intervals, "k", "ik", "t", "s", "e",
            bucketMicros = width * 1000000)
          .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
        assert(got == want, s"width=$width")
      }
    }
  }

  test("mergeClusters law: star edges + new pairs == full recompute, on random graphs") {
    import graft.dedup.Dedup
    val n = 24
    val edgeGen = Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(1L, n.toLong), Gen.chooseNum(1L, n.toLong)))
      .map(_.filter(p => p._1 != p._2))
    samples(Gen.zip(edgeGen, edgeGen), 3).foreach { case (oldE, newE) =>
      val vertices = (1L to n.toLong).map(Tuple1(_)).toDF("doc_id")
      val oldPairs = oldE.toDF("doc_a", "doc_b") // empty lists convert fine
      val newPairs = newE.toDF("doc_a", "doc_b")
      val old = Dedup.nearDupClusters(vertices, col("doc_id"), oldPairs)
      val merged = Dedup.mergeClusters(vertices, col("doc_id"), old, newPairs)
        .as[(Long, Long)].collect().toMap
      val full = Dedup.nearDupClusters(
        vertices, col("doc_id"), oldPairs.unionByName(newPairs))
        .as[(Long, Long)].collect().toMap
      assert(merged == full, s"old=$oldE new=$newE")
    }
  }

  test("dropSharedSegments round-trip law: with an unreachable minDocs, reassembly is the identity") {
    import graft.dedup.Dedup
    // arbitrary texts INCLUDING empty segments, leading/trailing and
    // repeated delimiters — split followed by ordered join must rebuild
    // the exact byte sequence when nothing is dropped
    val segGen = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("x y"))
    val textGen = Gen.listOfN(6, segGen).map(_.mkString("\n"))
    samples(Gen.listOfN(12, textGen), 3).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.dropSharedSegments(df, col("text"), col("doc_id"), "\n",
          minDocs = texts.length + 1) // no segment can reach the threshold
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (rebuilt, nSegs, nKept) = out(i.toLong)
        assert(rebuilt == t, s"doc $i: '$rebuilt' != '$t'")
        assert(nSegs == nKept && nSegs == t.split("\n", -1).length)
      }
    }
  }

  test("IngestDedup law: any batch partitioning of any input delivers each distinct content exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // small alphabet → guaranteed duplicates within AND across batches
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val batchesGen = Gen.listOfN(3, Gen.listOfN(8, word))
    samples(batchesGen, 3).zipWithIndex.foreach { case (batches, run) =>
      val table = s"graft_prop_ingest_$run"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      try {
        val in = MemoryStream[(Long, String)]
        val q = in.toDS().toDF("id", "text").writeStream
          .foreachBatch(graft.streaming.IngestDedup(
            col("text"), table, expectedItems = 100L) {
            (novel, _) => got ++= novel.select("text").as[String].collect()
          })
          .start()
        try {
          batches.zipWithIndex.foreach { case (b, i) =>
            in.addData(b.zipWithIndex.map { case (w, j) => ((i * 100 + j).toLong, w) }: _*)
            q.processAllAvailable()
          }
        } finally q.stop()
        // the law: delivered multiset == distinct set of everything fed,
        // regardless of where the batch boundaries fell
        assert(got.sorted.toSeq == batches.flatten.distinct.sorted,
          s"batches=$batches delivered=$got")
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("exciseSpans law: equals a brute-force byte mask for any random span set") {
    val spanGen = Gen.listOfN(6,
      Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(1, 12)).map { case (s, len) => (s, s + len) })
    val textGen = Gen.chooseNum(10, 50)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    samples(Gen.zip(textGen, spanGen), 8).foreach { case (text, spans) =>
      val pad = 1
      def brute(t: String, sp: Seq[(Int, Int)]): (String, Long) = {
        val keep = Array.fill(t.length)(true)
        sp.foreach { case (s, e) =>
          (math.max(0, s - pad) until math.min(t.length, e + pad)).foreach(keep(_) = false)
        }
        (t.zipWithIndex.collect { case (c, i) if keep(i) => c }.mkString,
          keep.count(!_).toLong)
      }
      val (expText, expCut) = brute(text, spans)
      val out = graft.dedup.Dedup.exciseSpans(
          Seq((1L, text)).toDF("doc_id", "text"), col("text"), col("doc_id"),
          spans.map { case (s, e) => (1L, s.toLong, e.toLong) }.toDF("doc_id", "s", "e"),
          col("doc_id"), col("s"), col("e"), pad = pad)
        .select(col("clean_text"), col("n_cut_bytes")).head()
      assert(out.getString(0) == expText, s"text=$text spans=$spans")
      assert(out.getLong(1) == expCut, s"text=$text spans=$spans")
    }
  }

  test("historize law: per key, intervals chain (valid_to = next valid_from), exactly one current unless deleted last") {
    val feedGen = Gen.listOfN(12, Gen.zip(
      Gen.chooseNum(1, 3),                      // key
      Gen.chooseNum(0, 1000),                   // version offset (deduped below)
      Gen.oneOf("upsert", "upsert", "delete"))) // deletes at ~1/3
    samples(feedGen, 8).foreach { raw =>
      // unique (key, version) per the operator contract
      val feed = raw.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val df = feed.map { case (k, v, op) =>
        (k.toLong, s"p$v", new java.sql.Timestamp(86400000L * v), op)
      }.toDF("k", "payload", "ver", "op")
      val out = graft.sources.Storage.historize(df, col("k"), col("ver"))
        .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)), r.getBoolean(3)))
        .groupBy(_._1)
      feed.groupBy(_._1).foreach { case (k, rows) =>
        val ordered = rows.sortBy(_._2)
        val got = out.getOrElse(k.toLong, Array.empty).sortBy(_._2.getTime)
        // non-delete rows emit, in version order; each interval closes at
        // the NEXT change's version (upsert or delete alike)
        val expected = ordered.zipWithIndex.collect {
          case ((_, v, op), i) if op != "delete" =>
            (new java.sql.Timestamp(86400000L * v),
              ordered.lift(i + 1).map(t => new java.sql.Timestamp(86400000L * t._2)))
        }
        assert(got.map(g => (g._2, g._3)).toSeq == expected, s"k=$k feed=$ordered got=${got.toSeq}")
        // exactly one current iff the LAST change is not a delete
        val expectCurrent = ordered.lastOption.exists(_._3 != "delete")
        assert(got.count(_._4) == (if (expectCurrent) 1 else 0), s"k=$k feed=$ordered")
      }
    }
  }

  test("jaccardJoinSets law: equals driver brute force on random long-item sets " +
      "at a random 4-dp threshold (the prefix-filter completeness property)") {
    import graft.dedup.Dedup
    val setGen = Gen.listOfN(18, Gen.zip(
      Gen.chooseNum(3, 9),
      Gen.chooseNum(0L, 100000L)))
    for ((raw, i) <- samples(Gen.zip(setGen, Gen.chooseNum(2000, 9000)), 4).zipWithIndex) {
      val (spec, tRaw) = raw
      val t = tRaw / 10000.0
      // items drawn from a small pool so intersections actually occur
      val docs = spec.zipWithIndex.map { case ((k, seed), id) =>
        (id.toLong, (0 until k).map(j => (seed + j * 37) % 50).map(_.toLong).distinct.toArray)
      }
      val df = docs.toDF("doc_id", "items")
      val got = Dedup.jaccardJoinSets(df, col("items"), col("doc_id"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val sets = docs.map { case (id, xs) => id -> xs.toSet }.toMap
      val m = math.round(t * 10000).toInt
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size
        uni = sets(a).size + sets(b).size - inter
        if inter * 10000 >= uni * m
      } yield (a, b, inter.toLong, uni.toLong)).toSet
      assert(got == want, s"case $i t=$t: got ${got.size} want ${want.size}")
    }
  }

  test("cosineJoinSets law: equals driver brute force on random long-item sets " +
      "at a random 4-dp threshold (the t²-prefix completeness property)") {
    import graft.dedup.Dedup
    val setGen = Gen.listOfN(18, Gen.zip(
      Gen.chooseNum(3, 9),
      Gen.chooseNum(0L, 100000L)))
    for ((raw, i) <- samples(Gen.zip(setGen, Gen.chooseNum(2000, 9000)), 4).zipWithIndex) {
      val (spec, tRaw) = raw
      val t = tRaw / 10000.0
      val docs = spec.zipWithIndex.map { case ((k, seed), id) =>
        (id.toLong, (0 until k).map(j => (seed + j * 37) % 50).map(_.toLong).distinct.toArray)
      }
      val df = docs.toDF("doc_id", "items")
      val got = Dedup.cosineJoinSets(df, col("items"), col("doc_id"), t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sets = docs.map { case (id, xs) => id -> xs.toSet }.toMap
      val m2 = math.round(t * 10000) * math.round(t * 10000)
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size.toLong
        if inter * inter * 100000000L >= sets(a).size.toLong * sets(b).size * m2
      } yield (a, b, inter)).toSet
      assert(got == want, s"case $i t=$t: got ${got.size} want ${want.size}")
    }
  }

  test("ksDrift laws: shift- and duplication-invariant; zero against an identical complement") {
    import graft.curation.Corpus
    val gvGen = Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(1, 12)))
    for (rows <- samples(gvGen, 4) if rows.map(_._1).distinct.size >= 2) {
      def ks(data: Seq[(String, Int)]): Map[String, Double] =
        Corpus.ksDrift(data.toDF("g", "v"), col("g"), col("v"))
          .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val base = ks(rows)
      // CDFs are location-invariant: adding a constant changes nothing
      assert(ks(rows.map { case (g, v) => (g, v + 7) }) == base, "shift invariance")
      // duplicating every row scales both counts equally: D unchanged
      assert(ks(rows ++ rows) == base, "duplication invariance")
      // a group distributed exactly like its complement scores 0
      val mirrored = rows.map { case (_, v) => ("x", v) } ++ rows.map { case (_, v) => ("y", v) }
      assert(ks(mirrored).values.forall(_ == 0.0), "identical complement")
    }
  }
}
