package graft

import graft.functions.{Hashing, VectorFunctions}
import graft.plans.{DotProductF, Hash48F}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Regression gate for the native expressions' generated Java.
  *
  * `GenerateUnsafeProjection.generate` compiles the code with Janino and
  * THROWS on failure — unlike a DataFrame action, where Spark catches the
  * CompileException and silently degrades to interpreted eval (exactly what
  * happened to Hash48F's chained-cast fold in round 1: correctness held,
  * the "native" speed never engaged). These tests make that failure loud.
  */
class CodegenSpec extends SparkSpec {

  test("Hash48F generated Java compiles and matches interpreted eval") {
    val expr = Hash48F(BoundReference(0, StringType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on compile error
    for (s <- Seq("", "a", "hello world", "café 日本語")) {
      val compiled = proj(InternalRow(UTF8String.fromString(s))).getLong(0)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expected = Hash48F.first48(md.digest(s.getBytes("UTF-8")))
      assert(compiled === expected)
      assert(expr.eval(InternalRow(UTF8String.fromString(s))) === expected)
    }
  }

  test("DotProductF generated Java compiles; ragged arrays are null in both eval paths") {
    def ref(ord: Int) = BoundReference(ord, ArrayType(FloatType), nullable = true)
    val expr = DotProductF(ref(0), ref(1))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    def arr(xs: Float*): ArrayData = ArrayData.toArrayData(xs.toArray)

    assert(proj(InternalRow(arr(1f, 2f, 3f), arr(4f, 5f, 6f))).getDouble(0) === 32.0)
    // unequal lengths: zip_with null-pads, so the fold this expression
    // replaces yields null — the fused form must agree (FuseDotProduct is
    // injected globally; a value here would silently change user queries)
    assert(proj(InternalRow(arr(1f, 2f, 3f), arr(4f, 5f))).isNullAt(0))
    assert(expr.eval(InternalRow(arr(1f, 2f), arr(3f, 4f))) === 11.0)
    assert(expr.eval(InternalRow(arr(1f, 2f), arr(3f))) == null)
  }

  test("declarative fold and fused dot agree on ragged input (both null)") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).head.isNullAt(0))
    assert(df.select(VectorFunctions.dotFold(col("a"), col("b"))).head.isNullAt(0))
  }

  test("GramHashes48F / WinnowSet48F generated Java compiles; values match a direct recompute") {
    import graft.plans.{GramHashes48F, RollingHash48, WinnowSet48F}
    val gExpr = GramHashes48F(BoundReference(0, StringType, nullable = true), 8)
    val wExpr = WinnowSet48F(BoundReference(0, StringType, nullable = true), 8, 4)
    val proj = GenerateUnsafeProjection.generate(Seq(gExpr, wExpr)) // throws on compile error
    for (s <- Seq("", "short", "a longer document with enough bytes to produce several grams",
      "café 日本語 — multibyte codepoints hash by their UTF-8 bytes")) {
      val row = proj(InternalRow(UTF8String.fromString(s)))
      val bytes = s.getBytes("UTF-8")
      val expectG = RollingHash48.gramHashes(bytes, 8)
      val expectW = RollingHash48.winnowSet(bytes, 8, 4)
      assert(row.getArray(0).toLongArray().toSeq === expectG.toSeq)
      assert(row.getArray(1).toLongArray().toSeq === expectW.toSeq)
      // the rolling recurrence equals the direct weighted-sum definition
      // (what the DuckDB oracle computes)
      val direct = (0 to bytes.length - 8).map { p =>
        (0 until 8).map(j => (bytes(p + j) & 0xffL) * RollingHash48.Pow(7 - j)).sum & RollingHash48.Mask
      }
      assert(expectG.toSeq === direct)
    }
  }

  test("winnowSet is the distinct sliding-window minima (brute-force cross-check)") {
    import graft.plans.RollingHash48
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val s = scala.util.Random.alphanumeric.take(5 + rnd.nextInt(60)).mkString
      val bytes = s.getBytes("UTF-8")
      val hs = RollingHash48.gramHashes(bytes, 3)
      val brute =
        if (hs.length < 5) Set.empty[Long]
        else hs.sliding(5).map(_.min).toSet
      assert(RollingHash48.winnowSet(bytes, 3, 5).toSet === brute)
    }
  }

  test("SimhashF / MinhashSigF / RepStatsF generated Java compiles; values match the declarative forms") {
    import graft.plans.{MinhashSigF, RepStatsF, SimhashF}
    import spark.implicits._
    val sExpr = SimhashF(BoundReference(0, StringType, nullable = true))
    val mExpr = MinhashSigF(BoundReference(0, StringType, nullable = true), 3, 12)
    val rExpr = RepStatsF(BoundReference(0, StringType, nullable = true))
    GenerateUnsafeProjection.generate(Seq(sExpr, mExpr, rExpr)) // throws on compile error

    val texts = Seq(
      "", "   ", "one", "one two", "The quick  Brown fox\tjumps over the lazy dog the quick",
      "a a a a a b b c", "Tabs\tand\nnewlines   separate tokens too")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // simhash: native expression vs the interpreted lambda column form
    val sim = df.select(
      Hashing.simhashDoc(col("text")).as("n"),
      Hashing.simhash48(graft.functions.TextFunctions.wsTokens(col("text"))).as("c"))
    assert(sim.where(col("n") =!= col("c")).count() == 0)

    // minhash signature: native vs minhashSignature over wordShingles
    val mh = df.select(
      Hashing.minhashSigDoc(col("text"), 3, 12).as("n"),
      when(size(graft.functions.TextFunctions.wsTokens(col("text"))) >= 3,
        Hashing.minhashSignature(
          Hashing.wordShingles(graft.functions.TextFunctions.wsTokens(col("text")), 3), 12))
        .otherwise(array().cast("array<bigint>")).as("c"))
    assert(mh.where(not(col("n") <=> col("c"))).count() == 0)

    // shingle set: native kernel vs sorted-distinct hash48 over wordShingles
    import graft.plans.ShingleSetF
    GenerateUnsafeProjection.generate(
      Seq(ShingleSetF(BoundReference(0, StringType, nullable = true), 3)))
    val ss = df.select(
      Hashing.shingleHashSet(col("text"), 3).as("n"),
      coalesce(array_sort(array_distinct(transform(
        Hashing.wordShingles(graft.functions.TextFunctions.wsTokens(col("text")), 3),
        s => Hashing.hash48(s)))), array().cast("array<bigint>")).as("c"))
    assert(ss.where(not(col("n") <=> col("c"))).count() == 0)

    // byteEntropy: generated Java compiles; hand values (uniform bytes 0,
    // two equi-probable bytes exactly 1 bit, empty 0) and a driver-side
    // recompute on the mixed texts
    import graft.plans.ByteEntropyF
    GenerateUnsafeProjection.generate(
      Seq(ByteEntropyF(BoundReference(0, StringType, nullable = true))))
    val ent = df.select(col("doc_id"),
      graft.functions.TextFunctions.byteEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val bytes = t.getBytes("UTF-8")
      val expected =
        if (bytes.isEmpty) 0.0
        else {
          val n = bytes.length.toDouble
          val ln2 = math.log(2.0)
          math.log(n) / ln2 - bytes.groupBy(identity).values
            .map(g => g.length.toDouble * (math.log(g.length.toDouble) / ln2)).sum / n
        }
      assert(math.abs(ent(i.toLong) - expected) < 1e-9, s"doc: '$t'")
    }
    val hand = Seq((1L, "aaaa"), (2L, "abab"), (3L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.byteEntropy(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(hand(1L) == 0.0 && hand(2L) == 1.0 && hand(3L) == 0.0)

    // repStats: native vs a driver-side recompute
    val rs = graft.functions.TextFunctions.repetitionStats(df, col("text"), col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val top = if (bigrams.isEmpty) 0L else bigrams.groupBy(identity).values.map(_.size).max.toLong
      assert(rs(i.toLong) == ((toks.size.toLong, toks.distinct.size.toLong, top)), s"doc: '$t'")
    }
  }

  test("hash-heavy query runs clean with codegen fallback disabled") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq(("alpha", Array(1f, 2f, 3f, 4f)), ("beta", Array(-1f, 0.5f, 2f, -3f)))
        .toDF("s", "v")
        .select(
          Hashing.hash48(col("s")).as("h"),
          VectorFunctions.dot(col("v"), col("v")).as("d"),
          VectorFunctions.signRandomProjection(col("v"), 4, 4).as("bucket"),
          // the kernel family must also survive CODEGEN_ONLY: a Janino
          // failure in any doGenCode surfaces here instead of silently
          // degrading to interpreted eval
          Hashing.gramHashes(col("s"), 3).as("g"),
          Hashing.winnowSet(col("s"), 2, 2).as("w"),
          Hashing.simhashDoc(col("s")).as("sh"),
          Hashing.minhashSigDoc(col("s"), 1, 4).as("ms"),
          graft.functions.TextFunctions.wsTokenCount(col("s")).as("nt")
        )
      assert(df.collect().length === 2)
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("the full native-function surface is callable from SQL") {
    import spark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "t").createOrReplaceTempView("sqlsurface")
    val row = spark.sql(
      """SELECT graft_hash48(t) AS h,
        |  graft_simhash48(t) AS sh,
        |  size(graft_gram_hashes48(t, 8)) AS ng,
        |  size(graft_winnow_set48(t, 8, 4)) AS nw,
        |  size(graft_minhash_sig(t, 3, 12)) AS nm,
        |  graft_rep_stats(t).n_tokens AS nt,
        |  graft_lang_counts(t)[0] AS en,
        |  size(graft_shingle_set(t, 3)) AS ns
        |FROM sqlsurface""".stripMargin).head()
    assert(row.getLong(0) != 0L && row.getLong(1) != 0L)
    assert(row.getInt(2) == "the quick brown fox jumps over the lazy dog".length - 7)
    assert(row.getInt(3) > 0 && row.getInt(4) == 12)
    assert(row.getLong(5) == 9L)
    assert(row.getLong(6) == 2L) // "the" twice
    assert(row.getInt(7) == 7L)  // 9 tokens -> 7 distinct 3-shingles
    // non-literal kernel width is rejected at planning, not miscompiled
    val err = intercept[Exception] {
      spark.sql("SELECT graft_gram_hashes48(t, id + 1) FROM sqlsurface").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("hyperplane-literal sign projection matches the per-row lambda formula") {
    import spark.implicits._
    val dim = 8
    val nBits = 4
    val vecs = Seq(
      Array.tabulate(dim)(i => (i + 1) * 0.5f - 1.7f),
      Array.tabulate(dim)(i => math.sin(i + 1).toFloat),
      Array.fill(dim)(0f)
    )
    // the pre-literalization semantics, recomputed directly: per (bit, dim)
    // sign from rehash parity, strict left-to-right double accumulation
    def expectedBucket(v: Array[Float]): Long =
      (0 until nBits).map { b =>
        val (a, c) = Hashing.hashParams(b)
        var acc = 0.0
        for (i <- 0 until dim) {
          val h = (a * (i.toLong + 1000003L * (b + 1)) + c) % Hashing.Prime
          acc += (if (h % 2 == 0) v(i).toDouble else -v(i).toDouble)
        }
        if (acc > 0) 1L << b else 0L
      }.sum
    val got = vecs.toDF("v")
      .select(VectorFunctions.signRandomProjection(col("v"), nBits, dim).as("bk"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === vecs.map(expectedBucket))
  }

  test("CellScoresB generated Java compiles; compiled values match interpreted eval") {
    val cents: Array[Array[Float]] = Array(
      Array.tabulate(6)(i => (i - 2) * 0.5f),
      Array.tabulate(6)(i => math.sin(i + 1).toFloat))
    val bc = spark.sparkContext.broadcast(new graft.plans.CentroidBank(cents))
    val expr = graft.plans.CellScoresB(
      bc, BoundReference(0, ArrayType(FloatType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on compile error
    def arr(xs: Float*): ArrayData = ArrayData.toArrayData(xs.toArray)
    val v = arr(1f, -2f, 3f, 0.5f, -0.25f, 4f)
    val compiled = proj(InternalRow(v)).getArray(0).toDoubleArray().toSeq
    val interpreted = expr.eval(InternalRow(arr(1f, -2f, 3f, 0.5f, -0.25f, 4f)))
      .asInstanceOf[ArrayData].toDoubleArray().toSeq
    assert(compiled == interpreted && compiled.size == 2)
    // ragged input through the COMPILED path: per-centroid nulls
    val ragged = proj(InternalRow(arr(1f, 2f))).getArray(0)
    assert(ragged.numElements() == 2 && ragged.isNullAt(0) && ragged.isNullAt(1))
    // null vector through the compiled path: non-null array of nulls
    val nv = proj(InternalRow(null)).getArray(0)
    assert(nv.numElements() == 2 && nv.isNullAt(0) && nv.isNullAt(1))
  }

  test("CellScoresB: bit-identical to the per-centroid literal formula; null/ragged contract holds") {
    import spark.implicits._
    val cents: Array[Array[Float]] = Array(
      Array.tabulate(8)(i => (i - 3) * 0.25f),
      Array.tabulate(8)(i => math.cos(i + 1).toFloat),
      Array.fill(8)(0.125f))
    val vecs: Seq[Array[Float]] = Seq(
      Array.tabulate(8)(i => math.sin(i * 2 + 1).toFloat),
      Array.fill(8)(0f),
      Array.tabulate(8)(i => (i + 1) * 1e-3f))
    // the pre-bank semantics: graft_dot(v, lit(c)) / sqrt(graft_dot(c, c)),
    // strict left-to-right double accumulation
    def expected(v: Array[Float]): Seq[Double] = cents.toSeq.map { c =>
      var dot = 0.0; var nn = 0.0
      for (i <- 0 until 8) { dot += v(i).toDouble * c(i).toDouble; nn += c(i).toDouble * c(i).toDouble }
      dot / math.sqrt(nn)
    }
    val got = vecs.toDF("v")
      .select(graft.plans.CentroidBank.scoresColumn(col("v"), cents).as("s"))
      .collect().map(_.getSeq[Double](0))
    vecs.zip(got).foreach { case (v, g) =>
      // java.lang.Double.equals semantics — BIT identity, not approximate
      assert(g.toSeq == expected(v), s"scores diverge for ${v.toSeq}")
    }
    // ragged vector: every score null (graft_dot's unequal-length null)
    val ragged = Seq(Array(1f, 2f)).toDF("v")
      .select(graft.plans.CentroidBank.scoresColumn(col("v"), cents).as("s"))
      .collect().head.getSeq[java.lang.Double](0)
    assert(ragged.size == 3 && ragged.forall(_ == null))
    // null vector: a non-null array of k nulls, matching array(null, ...)
    val nullVec = Seq(Option.empty[Array[Float]]).toDF("v")
      .select(graft.plans.CentroidBank.scoresColumn(col("v"), cents).as("s"))
      .collect().head
    assert(!nullVec.isNullAt(0) && nullVec.getSeq[java.lang.Double](0).forall(_ == null))
    // the broadcast is cached per (context, contents): a second column over
    // an equal-but-distinct matrix reuses the same broadcast id
    val bc1 = graft.plans.CentroidBank.broadcastFor(spark, cents)
    val bc2 = graft.plans.CentroidBank.broadcastFor(spark, cents.map(_.clone()))
    assert(bc1.id == bc2.id, "equal centroid contents must reuse one broadcast")
  }

  test("BloomMightContainB generated Java compiles; broadcast filter agrees with interpreted eval") {
    import graft.plans.BloomMightContainB
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000L, 0.01)
    Seq(1L, 42L, 9999L).foreach(bf.putLong)
    val bcast = spark.sparkContext.broadcast(bf)
    val expr = BloomMightContainB(bcast, BoundReference(0, LongType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on compile error
    for (v <- Seq(1L, 42L, 9999L)) {
      assert(proj(InternalRow(v)).getBoolean(0), s"$v must be (possibly) contained")
      assert(expr.eval(InternalRow(v)) == true)
    }
    // a value never put: overwhelmingly false at fpp 1% (3 fixed probes)
    val missing = (100000L to 100010L).count { v =>
      proj(InternalRow(v)).getBoolean(0) != expr.eval(InternalRow(v)).asInstanceOf[Boolean]
    }
    assert(missing == 0, "compiled and interpreted paths must agree everywhere")
  }

  test("DedupSegmentsF generated Java compiles; byte-identical to the declarative form") {
    import graft.plans.DedupSegmentsF
    import graft.functions.TextFunctions
    import spark.implicits._
    GenerateUnsafeProjection.generate( // throws on compile error
      Seq(DedupSegmentsF(BoundReference(0, StringType, nullable = true), "\n")))
    // the tricky shapes: empties from consecutive/trailing delimiters,
    // first-empty survival, delimiter absent, multi-char and multi-byte
    // delimiters, unicode segments
    val texts = Seq(
      "", "a", "a\na", "a\n\na\nb\n\nb", "\na\n", "\n\n", "a\nb\na\nc\nb",
      "no delim here", "é\nü\né", "x", "a\nb\n")
    for (delim <- Seq("\n", " ", "||", "é")) {
      val df = texts.toDF("text")
      val diff = df.select(
        TextFunctions.dedupSegments(col("text"), delim).as("k"),
        TextFunctions.dedupSegmentsDeclarative(col("text"), delim).as("d"))
        .where(not(col("k") <=> col("d")))
      assert(diff.isEmpty, s"delim=${delim.replace("\n", "\\n")}: " +
        diff.collect().mkString(" | "))
    }
    // SQL surface + literal-only delimiter enforcement
    Seq(("a\na\nb", "\n")).toDF("t", "d").createOrReplaceTempView("dedupseg")
    assert(spark.sql("""SELECT graft_dedup_segments(t, '\n') FROM dedupseg""")
      .head().getString(0) == "a\nb")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dedup_segments(t, d) FROM dedupseg").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("SearchSortedCountF generated Java compiles; count matches the HOF filter form it replaced") {
    import graft.plans.SearchSortedCountF
    val cuts = Array(1.0, 3.0, 3.0, 7.5, 10.0) // duplicates on purpose — ties count
    val expr = SearchSortedCountF(cuts, BoundReference(0, DoubleType, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    // (value, expected #{cuts <= v}) — below-min 0, above-max len, exact-tie
    // includes ALL equal cuts (type-1 quantile semantics, same as `c <= v`)
    val cases = Seq(0.5 -> 0, 1.0 -> 1, 2.9 -> 1, 3.0 -> 3, 7.5 -> 4, 9.0 -> 4, 10.0 -> 5, 99.0 -> 5)
    for ((v, expected) <- cases) {
      assert(proj(InternalRow(v)).getInt(0) === expected, s"compiled v=$v")
      assert(expr.eval(InternalRow(v)) === expected, s"interpreted v=$v")
    }
    assert(proj(InternalRow(null)).isNullAt(0))
    // end-to-end parity: the expression inside a Dataset plan agrees with
    // size(filter(...)) — the exact form cdfBlend used before the swap
    import spark.implicits._
    val vals = Seq(0.5, 1.0, 3.0, 8.0, 11.0).toDF("v")
    val viaExpr = vals.select(org.apache.spark.sql.GraftBridge.column(
      SearchSortedCountF(cuts, org.apache.spark.sql.GraftBridge.expression(col("v").cast("double"))))
      .as("n")).as[Int].collect()
    val viaHof = vals.select(size(filter(lit(cuts), c => c <= col("v"))).as("n")).as[Int].collect()
    assert(viaExpr.toSeq === viaHof.toSeq)
  }

  test("SqDistsB generated Java compiles; compiled values match interpreted eval; null/ragged contract") {
    val cents: Array[Array[Double]] = Array(
      Array.tabulate(6)(i => (i - 2) * 0.5),
      Array.tabulate(6)(i => math.sin(i + 1)))
    val bc = spark.sparkContext.broadcast(new graft.plans.DistBank(cents, 6))
    val expr = graft.plans.SqDistsB(
      bc, BoundReference(0, ArrayType(DoubleType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on compile error
    def arr(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)
    val v = arr(1.0, -2.0, 3.0, 0.5, -0.25, 4.0)
    val compiled = proj(InternalRow(v)).getArray(0).toDoubleArray().toSeq
    val interpreted = expr.eval(InternalRow(arr(1.0, -2.0, 3.0, 0.5, -0.25, 4.0)))
      .asInstanceOf[ArrayData].toDoubleArray().toSeq
    assert(compiled == interpreted && compiled.size == 2)
    // ragged input through the COMPILED path: per-centroid nulls
    val ragged = proj(InternalRow(arr(1.0, 2.0))).getArray(0)
    assert(ragged.numElements() == 2 && ragged.isNullAt(0) && ragged.isNullAt(1))
    // null vector through the compiled path: non-null array of nulls
    val nv = proj(InternalRow(null)).getArray(0)
    assert(nv.numElements() == 2 && nv.isNullAt(0) && nv.isNullAt(1))
  }

  test("AHash48F generated Java compiles; compiled values match interpreted eval and the " +
      "shared compute reference; past-end pixels read 0") {
    val expr = graft.plans.AHash48F(
      BoundReference(0, BinaryType, nullable = true),
      BoundReference(1, LongType, nullable = false), 64)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on compile error
    val payload = Array.tabulate(200)(i => ((i * 53 + 7) % 256 - 128).toByte)
    for (f <- 0L to 3L) { // frame 3 starts at byte 192 -> 40 past-end pixels
      val compiled = proj(InternalRow(payload, f)).getLong(0)
      val interpreted = expr.eval(InternalRow(payload, f)).asInstanceOf[Long]
      val reference = graft.plans.AHash48F.compute(payload, f, 64)
      assert(compiled == interpreted && compiled == reference, s"frame $f")
    }
    // a fully-past-end frame is all-zero pixels -> mean 0 -> no bit set
    assert(proj(InternalRow(payload, 99L)).getLong(0) == 0L)
    // null payload -> null result through the compiled path
    assert(proj(InternalRow(null, 0L)).isNullAt(0))
  }

  test("SqDistsB: bit-identical to the zip_with/aggregate/round lambda form incl. rounding edges") {
    import graft.similarity.Clustering
    import spark.implicits._
    val dim = 8
    val cents: Array[Array[Double]] = Array(
      Array.tabulate(dim)(i => (i - 3) * 0.25),
      Array.tabulate(dim)(i => math.cos(i + 1)),
      Array.fill(dim)(0.125))
    // vectors engineered to land distances near 10^-6 grid boundaries
    // (HALF_UP ties) as well as generic irrational sums
    val vecs: Seq[Seq[Double]] = Seq(
      Seq.tabulate(dim)(i => math.sin(i * 2 + 1)),
      Seq.fill(dim)(0.0),
      Seq.tabulate(dim)(i => (i + 1) * 1e-3),
      Seq.tabulate(dim)(i => if (i == 0) 0.2500005 else 0.0),
      Seq.tabulate(dim)(i => i * 0.0000005))
    val df = vecs.toDF("v").select(col("v").cast("array<double>").as("v"))
    val viaKernel = df.select(
      graft.plans.DistBank.distsColumn(col("v"), cents, 6).as("d"))
      .collect().map(_.getSeq[Double](0).toSeq)
    val viaLambda = df.select(
      Clustering.declarativeSqDists(col("v"), cents, 6).as("d"))
      .collect().map(_.getSeq[Double](0).toSeq)
    // java.lang.Double.equals — BIT identity, not approximate
    assert(viaKernel.toSeq == viaLambda.toSeq)
    // ragged vector: every distance null in BOTH forms (zip_with pads null)
    val rdf = Seq(Seq(1.0, 2.0)).toDF("v").select(col("v").cast("array<double>").as("v"))
    val rk = rdf.select(graft.plans.DistBank.distsColumn(col("v"), cents, 6).as("d"))
      .collect().head.getSeq[java.lang.Double](0)
    val rl = rdf.select(Clustering.declarativeSqDists(col("v"), cents, 6).as("d"))
      .collect().head.getSeq[java.lang.Double](0)
    assert(rk.size == 3 && rk.forall(_ == null) && rk.toSeq == rl.toSeq)
    // null-element vector: every distance null in both forms
    val ndf = spark.sql(
      "select array(1.0d, cast(null as double), 3.0d, 4.0d, 5.0d, 6.0d, 7.0d, 8.0d) as v")
    val nk = ndf.select(graft.plans.DistBank.distsColumn(col("v"), cents, 6).as("d"))
      .collect().head.getSeq[java.lang.Double](0)
    val nl = ndf.select(Clustering.declarativeSqDists(col("v"), cents, 6).as("d"))
      .collect().head.getSeq[java.lang.Double](0)
    assert(nk.size == 3 && nk.forall(_ == null) && nk.toSeq == nl.toSeq)
  }

  test("SqDistsB: NaN/Infinity PROPAGATE like Spark's Round (no BigDecimal crash), " +
      "bit-identical to the lambda form") {
    import graft.similarity.Clustering
    import spark.implicits._
    val dim = 4
    val cents: Array[Array[Double]] = Array(
      Array.tabulate(dim)(i => i * 0.5),
      Array.fill(dim)(-1.25))
    // a NaN element, a -Inf element ((x-c)^2 = +Inf), and a magnitude
    // whose squared sum overflows to +Inf — each used to throw
    // NumberFormatException inside the kernel's BigDecimal rounding
    val vecs: Seq[Seq[Double]] = Seq(
      Seq(1.0, Double.NaN, 3.0, 4.0),
      Seq(Double.NegativeInfinity, 0.0, 0.0, 0.0),
      Seq(1e200, 1e200, 0.0, 0.0),
      Seq(Double.PositiveInfinity, 1.0, 1.0, 1.0))
    val df = vecs.toDF("v").select(col("v").cast("array<double>").as("v"))
    // compare raw IEEE bit patterns: NaN == NaN is false under primitive
    // equality, so Seq == would fail exactly on the case under test
    def bits(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      df.collect().map(_.getSeq[Double](0).map(java.lang.Double.doubleToLongBits).toSeq).toSeq
    val viaKernel = bits(df.select(
      graft.plans.DistBank.distsColumn(col("v"), cents, 6).as("d")))
    val viaLambda = bits(df.select(
      Clustering.declarativeSqDists(col("v"), cents, 6).as("d")))
    assert(viaKernel == viaLambda)
    val nanBits = java.lang.Double.doubleToLongBits(Double.NaN)
    val infBits = java.lang.Double.doubleToLongBits(Double.PositiveInfinity)
    assert(viaKernel(0).forall(_ == nanBits) && viaKernel(1).forall(_ == infBits))
  }

  test("AdcDistsB generated Java compiles; compiled values match interpreted eval and a " +
      "driver reference; malformed codes null every query") {
    // 2 queries, m=3 subspaces, k=2 codewords: tables(q)(j)(c)
    val tables: Array[Array[Array[Double]]] = Array(
      Array(Array(0.25, 1.5), Array(2.0, 0.125), Array(3.5, 0.75)),
      Array(Array(1.0, 0.5), Array(0.0625, 4.0), Array(0.25, 2.25)))
    val bc = spark.sparkContext.broadcast(new graft.plans.AdcBank(tables))
    val expr = graft.plans.AdcDistsB(
      bc, BoundReference(0, ArrayType(IntegerType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on compile error
    def arr(xs: Int*): ArrayData = ArrayData.toArrayData(xs.toArray)
    val code = arr(1, 0, 1)
    val compiled = proj(InternalRow(code)).getArray(0).toDoubleArray().toSeq
    val interpreted = expr.eval(InternalRow(arr(1, 0, 1)))
      .asInstanceOf[ArrayData].toDoubleArray().toSeq
    // j-ascending left-to-right accumulation — the documented order
    val reference = tables.map(t => ((0.0 + t(0)(1)) + t(1)(0)) + t(2)(1)).toSeq
    assert(compiled == interpreted && compiled == reference)
    // malformed codes: wrong length, out-of-range, null element, null input
    for (bad <- Seq(arr(1, 0), arr(1, 0, 2), arr(-1, 0, 1))) {
      val out = proj(InternalRow(bad)).getArray(0)
      assert(out.numElements() == 2 && out.isNullAt(0) && out.isNullAt(1), bad)
    }
    val nullElem = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](1, null, 0))
    assert(proj(InternalRow(nullElem)).getArray(0).isNullAt(1))
    val nv = proj(InternalRow(null)).getArray(0)
    assert(nv.numElements() == 2 && nv.isNullAt(0) && nv.isNullAt(1))
  }

  test("BankCache: bounded LRU — same key reuses, overflow evicts the least-recent entry") {
    val c = new graft.plans.BankCache[Integer, String](3)
    var built = 0
    def get(k: Int): String = c.getOrCreate(k) { built += 1; s"v$k" }
    assert(get(1) == "v1" && get(2) == "v2" && get(1) == "v1" && built == 2)
    get(3); get(4) // 4 distinct keys, capacity 3: LRU key 2 evicted (1 was re-touched)
    assert(c.size == 3)
    get(1); assert(built == 4, "key 1 must still be cached")
    get(2); assert(built == 5, "key 2 must have been evicted and rebuilt")
  }
}
