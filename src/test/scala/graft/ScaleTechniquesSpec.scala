package graft

import graft.operators.Topology
import graft.sources.Storage
import org.apache.spark.sql.functions._

/** The two write/plan-level scale techniques, verified against real plans:
  * bucketed co-located joins (no Exchange) and deterministic join salting
  * (identical results to the plain join).
  */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any shuffle Exchange") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "vb")
    Storage.writeBucketed(a, "graft_bkt_a", "k", 4)
    Storage.writeBucketed(b, "graft_bkt_b", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // expose the SMJ path
    try {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 1000)
      // contrast: the same join over unbucketed inputs shuffles both sides
      val unbucketed = a.join(b, Seq("k"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("zValue interleaves bits exactly; writeZOrdered makes per-file 2-D bounding " +
      "areas shrink with the file count where a round-robin write cannot") {
    // hand-checked interleave: a=0b101 (5), b=0b011 (3) → z = 1·1 + 1·2 +
    // 0·4 + 1·8 + 1·16 + 0·32 = 27
    val one = Seq((5L, 3L)).toDF("a", "b")
      .select(Storage.zValue($"a", $"b", 3).as("z")).head().getLong(0)
    assert(one == 27L, s"z(5,3)=$one")

    // a 317×317 scatter; both layouts write 8 files
    val n = 100000L
    val pts = spark.range(n).select(
      (col("id") % 317).as("a"), ((col("id") * 7919) % 317).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      Storage.writeZOrdered(pts, $"a", $"b", bits = 9, files = 8, path = s"$dir/z")
      pts.repartition(8).write.mode("overwrite").parquet(s"$dir/plain")
      def avgArea(path: String): Double =
        spark.read.parquet(path)
          .groupBy(input_file_name()).agg(
            ((max($"a") - min($"a")) * (max($"b") - min($"b"))).as("area"))
          .agg(avg($"area")).head().getDouble(0)
      val (zArea, plainArea) = (avgArea(s"$dir/z"), avgArea(s"$dir/plain"))
      // round-robin files span ~the whole plane; z-ordered files cover
      // Morton tiles — at 8 files, well under a quarter of it
      assert(plainArea > 0.9 * 316.0 * 316.0, s"plain avg area $plainArea")
      assert(zArea < plainArea / 4, s"z avg area $zArea vs plain $plainArea")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("quantile serve over the z-ordered layout: candidate IN-filters push into the " +
      "scan, results equal the full-base serve, and the candidate read intersects a " +
      "fraction of the files where a round-robin write leaves every file a candidate") {
    val n = 200000L
    val base = spark.range(n).select(
      (col("id") % 5).as("grp"),
      ((col("id") * 48271) % 4096).cast("double").as("value"))
    val scale = 6 // 64-wide cells → ~64 cells per group
    val cells = base.groupBy($"grp", Storage.dyadicCell($"value", scale).as("cell"))
      .agg(count(lit(1)).as("rc"))
    val qs = Seq(0.5, 0.9)
    val dir = java.nio.file.Files.createTempDirectory("graft_qlayout").toString
    try {
      Storage.writeQuantileServeLayout(base, "grp", "value", scale,
        grpBuckets = 8, bits = 6, files = 16, path = s"$dir/z")
      base.withColumn("__gb", pmod(hash($"grp"), lit(8)))
        .withColumn("cell", Storage.dyadicCell($"value", scale))
        .repartition(16).write.mode("overwrite").parquet(s"$dir/plain")

      // value-identical to the full-base serve
      val got = Storage.quantilesFromCellsLayout(
        spark, s"$dir/z", cells, "grp", "value", scale, qs, grpBuckets = 8)
      val want = Storage.quantilesFromCells(cells, base, "grp", "value", scale, qs)
      val gs = got.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      val ws = want.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(gs == ws, s"layout serve $gs vs full serve $ws")

      // the candidate restriction reaches the parquet scan as pushed filters
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("In(cell"), plan)

      // file-level skippability: a file is a CANDIDATE when its
      // (__gb, cell) min/max box contains any bracketed pair — the
      // row-group stats proxy (one row group per file at this size)
      val cand = Storage.quantileBracketPairs(cells, "grp", qs, grpBuckets = 8)
      def candidateFiles(path: String): (Long, Long) = {
        val stats = spark.read.parquet(path)
          .groupBy(input_file_name().as("f"))
          .agg(min($"__gb").as("g0"), max($"__gb").as("g1"),
            min($"cell").as("c0"), max($"cell").as("c1"))
          .collect()
        val hit = stats.count(r => cand.exists { case (g, c) =>
          g >= r.getAs[Int]("g0") && g <= r.getAs[Int]("g1") &&
            c >= r.getAs[Long]("c0") && c <= r.getAs[Long]("c1") })
        (hit.toLong, stats.length.toLong)
      }
      val (zHit, zTotal) = candidateFiles(s"$dir/z")
      val (pHit, pTotal) = candidateFiles(s"$dir/plain")
      // round-robin: every file spans the whole (bucket, cell) plane
      assert(pHit == pTotal, s"plain $pHit/$pTotal")
      // z-ordered: candidates land in Morton tiles — at most half the files
      assert(zHit <= zTotal / 2, s"z-ordered $zHit/$zTotal vs plain $pHit/$pTotal")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("saltedJoin equals the plain equijoin on a hot-key distribution") {
    // 5000 rows of one hot key + a uniform tail — the degenerate shape
    val skewed = ((1 to 5000).map(i => (1L, s"payload$i")) ++ (2 to 50).map(i => (i.toLong, s"p$i")))
      .toDF("k", "payload")
    val dim = (1L to 50L).map(i => (i, s"dim$i")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "payload", "label").as[(Long, String, String)].collect().sorted.toSeq
    val salted = Topology.saltedJoin(skewed, dim, "k", salt = 8)
      .select("k", "payload", "label").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain)
    // and the salted large side really scatters the hot key across sub-keys
    val saltCount = skewed
      .withColumn("__salt", pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(8)))
      .where(col("k") === 1L).select("__salt").distinct().count()
    assert(saltCount > 1)
  }

  test("incremental dedup: the persisted index never re-shuffles, appends accumulate") {
    import graft.dedup.Dedup
    val table = "graft_seen_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val day1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("id", "text")
    val day2 = Seq((4L, "alpha"), (5L, "gamma"), (6L, "beta"), (7L, "delta")).toDF("id", "text")
    try {
      Dedup.saveSeen(day1, col("text"), table, buckets = 4)
      val fresh = Dedup.dropSeen(day2, col("text"), table)
      assert(fresh.select("id").as[Long].collect().sorted.toSeq == Seq(5L, 7L))
      // index side is bucketed: the ONLY exchange in the anti-join plan is
      // the new batch being routed to the index's bucketing
      val plan = fresh.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).size == 1, plan)
      // append day2's novelty; nothing from day1 ∪ day2 is fresh anymore
      Dedup.saveSeen(fresh, col("text"), table, buckets = 4)
      assert(Dedup.dropSeen(day1.unionByName(day2), col("text"), table).isEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bloom prefilter: dropSeenFast equals dropSeen exactly; seen rows never take the fast path") {
    import graft.dedup.Dedup
    val table = "graft_seen_bloom_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val seen = (1L to 200L).map(i => (i, s"doc number $i")).toDF("id", "text")
    // batch: 150 seen + 150 new
    val batch = ((51L to 200L).map(i => (i + 1000, s"doc number $i")) ++
      (201L to 350L).map(i => (i + 1000, s"doc number $i"))).toDF("id", "text")
    try {
      Dedup.saveSeen(seen, col("text"), table, buckets = 4)
      val bf = Dedup.seenFilter(spark, table, expectedItems = 200L, fpp = 0.01)
      // exactness against the join-only form, row for row
      val exact = Dedup.dropSeen(batch, col("text"), table)
        .select("id").as[Long].collect().sorted.toSeq
      val fast = Dedup.dropSeenFast(batch, col("text"), table, bf)
        .select("id").as[Long].collect().sorted.toSeq
      assert(fast == exact)
      assert(exact == (1201L to 1350L).toSeq)
      // no false negatives: EVERY seen row is flagged by the filter
      val missed = seen.where(!Dedup.mightBeSeen(col("text"), bf)).count()
      assert(missed == 0)
      // the prefilter is selective: few of the 150 genuinely-new rows are
      // false-positive flagged into the confirm join (fpp 1%, slack 10x)
      val fpFlagged = batch.where(col("id") > 1200L)
        .where(Dedup.mightBeSeen(col("text"), bf)).count()
      assert(fpFlagged <= 15, s"false-positive rate too high: $fpFlagged/150")
      // the freshness contract, demonstrated from both sides after an
      // append the filter has NOT seen: flagged rows still confirm-join
      // against the CURRENT index (removed), but the batch's genuinely
      // new rows — now in the index, unknown to the stale filter — leak
      // through the fast path: dropSeenFast == dropSeen ONLY when the
      // filter covers the index (the scaladoc contract)
      Dedup.saveSeen(batch, col("text"), table, buckets = 4)
      val staleResult = Dedup.dropSeenFast(batch, col("text"), table, bf)
      assert(staleResult.where(Dedup.mightBeSeen(col("text"), bf)).isEmpty)
      assert(Dedup.dropSeen(batch, col("text"), table).isEmpty)
      assert(staleResult.count() > 0) // the documented stale-filter leak
      // rebuilt to cover the index, equality is restored
      val bf2 = Dedup.seenFilter(spark, table, expectedItems = 400L, fpp = 0.01)
      assert(Dedup.dropSeenFast(batch, col("text"), table, bf2).isEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bloom prefilter relation-input forms match the table forms exactly") {
    import graft.dedup.Dedup
    val seen = (1L to 100L).map(i => (i, s"doc number $i")).toDF("id", "text")
    val batch = ((51L to 100L).map(i => (i + 1000, s"doc number $i")) ++
      (101L to 150L).map(i => (i + 1000, s"doc number $i"))).toDF("id", "text")
    val index = seen.select(md5(col("text")).as("content_hash")).distinct()
    val bf = Dedup.seenFilter(index, expectedItems = 100L, fpp = 0.01)
    val exact = Dedup.dropSeen(batch, col("text"), index)
      .select("id").as[Long].collect().sorted.toSeq
    assert(exact == (1101L to 1150L).toSeq)
    val fast = Dedup.dropSeenFast(batch, col("text"), index, bf)
      .select("id").as[Long].collect().sorted.toSeq
    assert(fast == exact)
    assert(seen.where(!Dedup.mightBeSeen(col("text"), bf)).isEmpty)
  }

  test("incremental LSH: new batch pairs against the persisted band index without re-signaturing it") {
    import graft.dedup.Dedup
    val table = "graft_band_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val mk = (id: Long, t: String) => (id, t)
    // near-identical long docs so LSH surfaces the pair; doc 3 unrelated
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val day1 = Seq(mk(1L, base), mk(3L, "completely different unrelated words appear here with nothing shared"))
      .toDF("doc_id", "text")
    val day2 = Seq(mk(10L, base), mk(11L, "still nothing in common with anything previously indexed at all"))
      .toDF("doc_id", "text")
    try {
      Dedup.saveBandIndex(day1, col("text"), col("doc_id"), table, buckets = 4)
      val pairs = Dedup.pairsAgainstIndex(
        day2, col("text"), col("doc_id"), spark.table(table))
      val got = pairs.as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L))) // the duplicate found, nothing else
      // equivalence with the batch form: the same cross pair surfaces in
      // minhashLshPairs over the union (plus any within-day pairs)
      val batch = Dedup.minhashLshPairs(
        day1.unionByName(day2), col("text"), col("doc_id"))
        .as[(Long, Long)].collect().toSet
      assert(batch.contains((1L, 10L)))
      // bucketed index: the only TWO exchanges are the new batch's bucket
      // routing and the output distinct — history never shuffles
      val plan = pairs.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).size <= 2, plan)
      // a RETRIED ingest lands the same batch twice (append is
      // non-idempotent by design): the pair set must not change, and the
      // bucket cap must count DISTINCT docs — a row count would see the
      // doubled rows, breach maxBucket = 1, and silently drop the bucket
      Dedup.saveBandIndex(day1, col("text"), col("doc_id"), table, buckets = 4)
      val afterRetry = Dedup.pairsAgainstIndex(
        day2, col("text"), col("doc_id"), spark.table(table), maxBucket = 1)
        .as[(Long, Long)].collect().toSet
      assert(afterRetry == Set((10L, 1L)))
      // compaction collapses the retry's duplicates WITHOUT shuffling the
      // index — asserted on the REAL plan compaction writes, not a proxy
      val before = spark.table(table).count()
      val compactPlan = Dedup.compactionPlan(spark, table)
        .queryExecution.executedPlan.toString
      assert(!compactPlan.contains("Exchange"), compactPlan)
      Dedup.compactBandIndex(spark, table) // default: preserve bucket count
      val after = spark.table(table).count()
      assert(after < before && after == spark.table(table).distinct().count())
      assert(Dedup.pairsAgainstIndex(day2, col("text"), col("doc_id"), spark.table(table))
        .as[(Long, Long)].collect().toSet == Set((10L, 1L)))
      // the rewrite preserved the original bucket count (4, not the 64
      // a hardcoded default would silently re-layout to)
      val spec = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).bucketSpec
      assert(spec.map(_.numBuckets).contains(4), spec.toString)
      // crash recovery: simulate dying between DROP and RENAME (only the
      // tmp table survives) — a retry must finish the swap, not destroy it
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}__compact")
      // in this half-swapped state an append must FAIL FAST: it would
      // recreate the main table with just its batch, the recovery branch
      // (which requires the table to be missing) would never fire, and
      // the whole index history would be stranded in the tmp table
      val stranded = intercept[IllegalStateException] {
        Dedup.saveBandIndex(day1, col("text"), col("doc_id"), table, buckets = 4)
      }
      assert(stranded.getMessage.contains("compactBandIndex"), stranded.getMessage)
      Dedup.compactBandIndex(spark, table)
      assert(spark.table(table).count() == after)
      assert(Dedup.pairsAgainstIndex(day2, col("text"), col("doc_id"), spark.table(table))
        .as[(Long, Long)].collect().toSet == Set((10L, 1L)))
      // stats surface: the bucket-size histogram is cumulative to 1.0
      val stats = Dedup.bandIndexStats(spark, table, binWidth = 1L)
        .orderBy(org.apache.spark.sql.functions.col("bin_lo")).collect()
      assert(stats.nonEmpty && stats.last.getDouble(2) == 1.0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
    }
  }

  test("band index resolves QUALIFIED table names consistently (parsed, not string-split)") {
    import graft.dedup.Dedup
    // db.tbl through the whole save → compact → query cycle: the old
    // TableIdentifier(wholeString) lookup treated "graft_db.band_q" as a
    // single table name in the current database, so the bucket-spec
    // lookup inside compactBandIndex failed while spark.table/SQL (which
    // parse the dot) succeeded — two views of one name
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    val table = "graft_db.band_q"
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val day1 = Seq((1L, base),
      (3L, "completely different unrelated words appear here with nothing shared"))
      .toDF("doc_id", "text")
    val day2 = Seq((10L, base)).toDF("doc_id", "text")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
    try {
      Dedup.saveBandIndex(day1, col("text"), col("doc_id"), table, buckets = 2)
      Dedup.saveBandIndex(day1, col("text"), col("doc_id"), table, buckets = 2) // retry dup
      Dedup.compactBandIndex(spark, table) // bucket-spec lookup must resolve db.tbl
      val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table)).bucketSpec
      assert(spec.map(_.numBuckets).contains(2), spec.toString)
      assert(spark.table(table).count() == spark.table(table).distinct().count())
      val got = Dedup.pairsAgainstIndex(day2, col("text"), col("doc_id"), spark.table(table))
        .as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
      spark.sql("DROP DATABASE IF EXISTS graft_db")
    }
  }

  test("bloom prefilter: EMPTY index passes the whole batch (bootstrap case, no silent loss)") {
    import graft.dedup.Dedup
    val batch = (1L to 50L).map(i => (i, s"doc number $i")).toDF("id", "text")
    val emptyIndex = batch.where(lit(false)).select(md5(col("text")).as("content_hash"))
    // previously BloomFilterAggregate returned null here and the null
    // predicate dropped EVERY row of the first batch — total silent loss
    val bf = Dedup.seenFilter(emptyIndex, expectedItems = 100L, fpp = 0.01)
    assert(batch.where(Dedup.mightBeSeen(col("text"), bf)).isEmpty)
    val fast = Dedup.dropSeenFast(batch, col("text"), emptyIndex, bf)
      .select("id").as[Long].collect().sorted.toSeq
    val exact = Dedup.dropSeen(batch, col("text"), emptyIndex)
      .select("id").as[Long].collect().sorted.toSeq
    assert(fast == exact && exact == (1L to 50L).toSeq)
  }

  test("bloom prefilter: requested size is honored above the optimizer conf clamp") {
    import graft.dedup.Dedup
    import org.apache.spark.util.sketch.BloomFilter
    val index = (1L to 100L).map(i => (s"h$i")).toDF("content_hash")
    // 20M expected items → optimal ~191.7M bits ≈ 24 MB, far above the
    // BloomFilterAggregate default clamp (4M items / 8 MB). The sketch
    // builder must honor the request bit-for-bit or the realized fpp at a
    // 10⁸⁺-row index goes to 1 and the prefilter stops prefiltering.
    val want = 20L * 1000 * 1000
    val bytes = Dedup.seenFilter(index, expectedItems = want, fpp = 0.01)
    val realized = BloomFilter.readFrom(bytes).bitSize()
    assert(realized == BloomFilter.create(want, 0.01).bitSize(), s"realized $realized bits")
    assert(realized > 8L * 1024 * 1024 * 8, "must exceed the 8 MB conf clamp")
  }

  test("bloom prefilter: incremental OR-merge covers the union; mismatched geometry refuses") {
    import graft.dedup.Dedup
    val half1 = (1L to 100L).map(i => s"doc number $i").toDF("content_hash")
      .select(md5(col("content_hash")).as("content_hash"))
    val half2 = (101L to 200L).map(i => s"doc number $i").toDF("content_hash")
      .select(md5(col("content_hash")).as("content_hash"))
    val bf1 = Dedup.seenFilter(half1, expectedItems = 500L, fpp = 0.01)
    val bf2 = Dedup.seenFilter(half2, expectedItems = 500L, fpp = 0.01)
    val merged = Dedup.mergeSeenFilters(bf1, bf2)
    // no false negatives over the UNION — the standing-filter freshness law
    val all = (1L to 200L).map(i => (i, s"doc number $i")).toDF("id", "text")
    assert(all.where(!Dedup.mightBeSeen(col("text"), merged)).isEmpty)
    // geometry mismatch is loud, not a silent false-negative filter
    val other = Dedup.seenFilter(half2, expectedItems = 5000L, fpp = 0.01)
    intercept[org.apache.spark.util.sketch.IncompatibleMergeException] {
      Dedup.mergeSeenFilters(bf1, other)
    }
  }

  test("bloom prefilter: plan ships a broadcast handle, never the blob as a Literal") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    // range-backed inputs: a Seq-backed LocalRelation gets constant-folded
    // by ConvertToLocalRelation (the optimizer evaluates the predicate at
    // plan time), which would hide the expression we're asserting on
    val seen = spark.range(1, 201)
      .select(col("id"), concat(lit("doc number "), col("id")).as("text"))
    val batch = spark.range(150, 251)
      .select((col("id") + 1000).as("id"), concat(lit("doc number "), col("id")).as("text"))
    val index = seen.select(md5(col("text")).as("content_hash")).distinct()
    val bf = Dedup.seenFilter(index, expectedItems = 1000000L, fpp = 0.01)
    assert(bf.length > 1000000, s"filter blob is ${bf.length} B") // ~1.2 MB serialized
    val fast = Dedup.dropSeenFast(batch, col("text"), index, bf)
    // correctness unchanged
    assert(fast.select("id").as[Long].collect().sorted.toSeq == (1201L to 1250L).toSeq)
    // the blob must NOT appear as a plan Literal (it would ship inside the
    // serialized plan of every task); only the broadcast-backed predicate may
    val binLits = fast.queryExecution.optimizedPlan
      .flatMap(_.expressions.flatMap(_.collect {
        case l: Literal if l.dataType == BinaryType && l.value != null =>
          l.value.asInstanceOf[Array[Byte]].length
      }))
    assert(binLits.forall(_ < 64 * 1024), s"binary literals in plan: $binLits")
    assert(fast.queryExecution.optimizedPlan.toString.contains("graft_bloom_might_contain"))
  }
}
