package graft

import graft.sources.Storage
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-9 additions: incremental compaction (merge only the under-target
  * tail, never rewrite right-sized files) and its crash-recovery contract.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  private def tableLoc(table: String): Path =
    new Path(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location)

  private def fs(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(loc: Path): Map[String, (Long, Long)] =
    fs(loc).listStatus(loc)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime))
      .toMap

  test("compact merges ONLY under-target files; right-sized files are untouched byte-for-byte") {
    val table = "graft_r9_compact_incr"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      // one right-sized file (500 rows) + ~10-file fragmented tail (50 rows)
      spark.range(500).toDF("id").repartition(1)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      spark.range(500, 550).toDF("id").repartition(10)
        .write.mode("append").format("parquet").saveAsTable(table)
      val loc = tableLoc(table)
      val before = dataFiles(loc)
      val bigBefore = before.maxBy(_._2._1) // the 500-row file is the largest
      val smallBytes = before.values.map(_._1).sum - bigBefore._2._1

      val res = Storage.compact(spark, table, targetRowsPerFile = 100)
      assert(res.filesCompacted == before.size - 1, res.toString)
      assert(res.rowsCompacted == 50, res.toString)
      assert(res.filesWritten == 1, res.toString)

      val after = dataFiles(loc)
      assert(after.size == 2, after.keys.toString)
      // the large file survives with identical name, length, and mtime —
      // it was never read, never rewritten
      assert(after.get(bigBefore._1).contains(bigBefore._2),
        s"right-sized file was rewritten: before=$bigBefore after=${after.get(bigBefore._1)}")
      // bytes written ≈ small-file bytes, not table bytes (parquet framing
      // overhead means the merged file is smaller than the originals' sum)
      val mergedBytes = (after - bigBefore._1).values.map(_._1).sum
      assert(mergedBytes <= smallBytes * 2,
        s"merged replacement ($mergedBytes B) is not in the small-tail ballpark ($smallBytes B)")
      // content is exactly preserved
      assert(spark.table(table).count() == 550)
      assert(spark.table(table).agg(sum($"id")).head().getLong(0) == (0L until 550L).sum)
      val stats = Storage.fileStats(spark, table).collect().head
      assert(stats.getAs[Long]("n_files") == 2 && stats.getAs[Long]("n_rows") == 550)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compact no-ops when merging cannot reduce the file count") {
    val table = "graft_r9_compact_noop"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      spark.range(10).toDF("id").repartition(1)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      // one small file: nothing to merge with
      assert(Storage.compact(spark, table, 100) == Storage.CompactResult(0, 0, 0))
      // two small files that would still need two output files: no gain
      spark.range(10, 20).toDF("id").repartition(1)
        .write.mode("append").format("parquet").saveAsTable(table)
      assert(Storage.compact(spark, table, 11) == Storage.CompactResult(0, 0, 0))
      assert(spark.table(table).count() == 20)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compact refuses bucketed tables (the rewrite would drop the bucket layout)") {
    val table = "graft_r9_compact_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      Storage.writeBucketed(spark.range(100).toDF("id"), table, "id", buckets = 4)
      val e = intercept[IllegalArgumentException] { Storage.compact(spark, table, 10) }
      assert(e.getMessage.contains("bucketed"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compact refuses PARTITIONED tables (root-renamed replacements would null the " +
      "partition columns and vanish from partition-aware readers)") {
    val table = "graft_r10_compact_partitioned"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      import spark.implicits._
      (0 until 100).map(i => (i.toLong, i % 4)).toDF("id", "p")
        .write.partitionBy("p").format("parquet").saveAsTable(table)
      val e = intercept[IllegalArgumentException] { Storage.compact(spark, table, 10) }
      assert(e.getMessage.contains("partitioned"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("a crashed swap (staging + manifest) is completed by the next compact; dead staging is discarded") {
    val table = "graft_r9_compact_crash"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      spark.range(100).toDF("id").repartition(4)
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      val loc = tableLoc(table)
      val hfs = fs(loc)
      val staging = new Path(loc.getParent, s".${loc.getName}__graft_compact")

      // dead staging: a partial write that died BEFORE its manifest —
      // must be discarded untouched, then the real compaction proceeds
      hfs.mkdirs(staging)
      val junk = hfs.create(new Path(staging, "part-junk.parquet"))
      junk.write(Array[Byte](1, 2, 3)); junk.close()
      val res = Storage.compact(spark, table, targetRowsPerFile = 200)
      assert(res == Storage.CompactResult(4, 100, 1), res.toString)
      assert(!hfs.exists(staging))
      assert(spark.table(table).count() == 100)

      // crashed swap: stage a complete replacement for the table's (single)
      // file by hand + a manifest naming the original — the next compact
      // call must finish the swap (rename in, delete original) and then
      // see nothing left to merge
      val original = dataFiles(loc).keys.head
      spark.table(table).repartition(1).write.mode("overwrite")
        .parquet(staging.toString)
      spark.sql(s"REFRESH TABLE $table")
      val mf = hfs.create(new Path(staging, "_GRAFT_MANIFEST"), true)
      mf.write(new Path(loc, original).toUri.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      mf.close()
      val res2 = Storage.compact(spark, table, targetRowsPerFile = 200)
      assert(res2 == Storage.CompactResult(0, 0, 0), res2.toString)
      assert(!hfs.exists(staging))
      assert(!dataFiles(loc).contains(original), "manifest original not deleted")
      assert(spark.table(table).count() == 100, "content lost through swap recovery")
      assert(spark.table(table).agg(sum($"id")).head().getLong(0) == 4950L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("q134 gate: content survives compaction and the file count collapses to 2") {
    val df = SparkEntry.queries("q134_compact")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 10) // sf0.001 supplier
    assert(rows.forall(_.getAs[Long]("n_files") == 2L))
  }

  test("intervalAnti: a NULL point id fails LOUDLY instead of leaking or over-dropping") {
    import graft.operators.Joins
    def run(points: org.apache.spark.sql.DataFrame) = {
      val intervals = Seq(
        (10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00"))
      ).toDF("ik", "i_start", "i_end")
      Joins.intervalAnti(points, intervals, "point_id", "k", "ik",
        "p_ts", "i_start", "i_end", bucketMicros = 3600L * 1000000L)
    }
    // clean ids: inside dropped, outside kept
    val clean = run(Seq(
      (Some(1L), 10L, ts("2024-01-01 10:00:00")), // inside → dropped
      (Some(2L), 10L, ts("2024-01-01 20:00:00")), // outside → kept
      (Some(3L), 20L, ts("2024-01-01 10:30:00"))  // no interval on key → kept
    ).toDF("point_id", "k", "p_ts"))
      .select(col("point_id")).collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L), clean.toString)
    // a null id anywhere in points = contract violation, raised loudly
    val err = intercept[Exception] {
      run(Seq(
        (Some(1L), 10L, ts("2024-01-01 10:00:00")),
        (None, 10L, ts("2024-01-01 10:30:00"))
      ).toDF("point_id", "k", "p_ts")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("non-null unique point id")), err.toString)
  }

  test("retention week_offset is calendar-exact across a DST spring-forward") {
    import graft.operators.Sequences
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // US DST starts 2025-03-09: the Mar 3 → Mar 10 week starts are
      // 604800 − 3600 s apart; an epoch div 604800 floors to offset 0
      val df = Seq(
        (1L, ts("2025-03-03 12:00:00")),
        (1L, ts("2025-03-10 12:00:00"))
      ).toDF("user_id", "ts")
      val rows = Sequences.retention(df, col("user_id"), col("ts"))
        .select(col("week_offset"), col("n_users")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((0L, 1L), (1L, 1L)), rows.toString)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("contaminationSpans: positions, repetition counting, and the minShared floor") {
    import graft.dedup.Dedup
    val docs = Seq(
      (0L, "SECRET_PHRASE"),                       // the benchmark item
      (1L, "xx SECRET_PHRASE yy"),                 // one embedded copy
      (2L, "SECRET_PHRASE..SECRET_PHRASE"),        // repeated copy
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationSpans(
      docs, col("text"), col("doc_id"),
      docs.where(col("doc_id") === 0L), col("text"), col("doc_id"),
      n = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // "SECRET_PHRASE" has 13 bytes → 6 grams of 8 bytes
    // doc 1: copy starts at byte 3 → first_byte 3, last gram starts at 8
    // doc 2: two copies (offsets 0 and 15): hit positions 0–5 and 15–20,
    // gap 10 > n=8 → TWO span rows, not one 0–20 hull (the round-9 weak
    // finding: the envelope would excise the clean ".." between them)
    assert(out.contains((0L, 0L, 6L, 0L, 5L)), out.toString)   // self
    assert(out.contains((1L, 0L, 6L, 3L, 8L)), out.toString)
    assert(out.contains((2L, 0L, 6L, 0L, 5L)), out.toString)
    assert(out.contains((2L, 0L, 6L, 15L, 20L)), out.toString)
    assert(out.count(_._1 == 2L) == 2, out.toString)
    assert(!out.exists(_._1 == 3L), out.toString)
    // the floor screens on the PAIR total (12 for doc 2), and a passing
    // pair emits ALL its runs
    val floored = Dedup.contaminationSpans(
      docs, col("text"), col("doc_id"),
      docs.where(col("doc_id") === 0L), col("text"), col("doc_id"),
      n = 8, minShared = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(floored == Set((2L, 6L, 0L, 5L), (2L, 6L, 15L, 20L)), floored.toString)
    // envelope opt-in: runGap = Long.MaxValue reproduces the one-row hull
    val hull = Dedup.contaminationSpans(
      docs, col("text"), col("doc_id"),
      docs.where(col("doc_id") === 0L), col("text"), col("doc_id"),
      n = 8, minShared = 1, runGap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(hull.contains((2L, 12L, 0L, 20L)), hull.toString)
  }

  test("per-run spans + exciseSpans retain the clean text BETWEEN distant collisions") {
    import graft.dedup.Dedup
    // two 13-byte benchmark quotes embedded far apart in a long document:
    // the envelope would have cut the entire middle; per-run surgery must
    // keep it
    val middle = "This long stretch of perfectly clean prose sits between the two quotes."
    val doc = s"SECRET_PHRASE $middle SECRET_PHRASE"
    val docs = Seq((0L, "SECRET_PHRASE"), (10L, doc)).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(
      docs, col("text"), col("doc_id"),
      docs.where(col("doc_id") === 0L), col("text"), col("doc_id"),
      n = 8, minShared = 1)
    val out = Dedup.exciseSpans(
      docs.where(col("doc_id") === 10L), col("text"), col("doc_id"),
      spans.where(col("doc_id") === 10L),
      col("doc_id"), col("first_byte"), col("last_byte") + 8L, pad = 0)
      .select(col("clean_text"), col("n_spans")).collect().head
    assert(out.getString(0).contains(middle.trim), out.toString)
    assert(out.getLong(1) == 2L, out.toString)
  }

  test("exciseSpans: island merge, pad clamp, byte surgery, and the no-span passthrough") {
    import graft.dedup.Dedup
    val docs = Seq(
      (1L, "0123456789ABCDEF"), // two overlapping + one separate span
      (2L, "hello world"),      // no spans → untouched
      (3L, "tiny")              // span past the end → clamped
    ).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2L, 5L),   // pad 1 → [1, 6)
      (1L, 4L, 7L),   // pad 1 → [3, 8)  — overlaps → one island [1, 8)
      (1L, 4L, 7L),   // exact duplicate (two benches) — must not split islands
      (1L, 12L, 14L), // pad 1 → [11, 15) — second island
      (3L, 1L, 99L)   // pad 1 → [0, 100) clamped to the doc
    ).toDF("doc_id", "s", "e")
    val out = Dedup.exciseSpans(docs, col("text"), col("doc_id"),
        spans, col("doc_id"), col("s"), col("e"), pad = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: cut [1,8) and [11,15) from "0123456789ABCDEF" → "0" + "89A" + "F"
    assert(out(1L) == (("089AF", 2L, 11L)), out(1L).toString)
    assert(out(2L) == (("hello world", 0L, 0L)), out(2L).toString)
    assert(out(3L) == (("", 1L, 4L)), out(3L).toString)
  }

  test("repeatedSpans law: exactly the positions whose 8-gram lives in >= minDf distinct docs") {
    import graft.dedup.Dedup
    val texts = Map(
      1L -> "the quick brown fox jumps",
      2L -> "see the quick brown cat",
      3L -> "jumps the shark precisely",
      4L -> "zzzzzzzzzzzz") // self-repeats only — one doc, never flagged
    val docs = texts.toSeq.toDF("doc_id", "text")
    // brute force: per doc, gram positions present in >= 2 docs' gram sets
    val gramDocs = texts.toSeq.flatMap { case (id, t) =>
      t.sliding(8).toSeq.distinct.map(g => (g, id))
    }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val expected = texts.toSeq.flatMap { case (id, t) =>
      t.sliding(8).zipWithIndex.collect {
        case (g, p) if gramDocs(g) >= 2 => (id, p.toLong, p.toLong + 8L)
      }
    }.toSet
    val got = Dedup.repeatedSpans(docs, col("text"), col("doc_id"), n = 8, minDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.exists(_._1 == 1L) && got.exists(_._1 == 2L), got.toString)
    assert(!got.exists(_._1 == 4L), "within-doc repeats must not count toward df")
  }

  test("historize: validity intervals chain per key; a delete closes without emitting") {
    import graft.sources.Storage
    val feed = Seq(
      (1L, 10.0, ts("2024-01-01 00:00:00"), "upsert"),
      (1L, 20.0, ts("2024-01-03 00:00:00"), "upsert"),
      (2L, 5.0, ts("2024-01-02 00:00:00"), "upsert"),
      (2L, 0.0, ts("2024-01-05 00:00:00"), "delete"), // closes key 2, emits none
      (3L, 7.0, ts("2024-01-04 00:00:00"), "delete")  // delete-only key: nothing
    ).toDF("k", "v", "ver", "op")
    val out = Storage.historize(feed, col("k"), col("ver"))
      .select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 10.0, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, 20.0, ts("2024-01-03 00:00:00"), None, true),
      (2L, 5.0, ts("2024-01-02 00:00:00"), Some(ts("2024-01-05 00:00:00")), false)
    ), out.toString)
  }

  test("IngestHistorize: batch replay is a no-op; split feed equals the one-shot historization") {
    import graft.sources.Storage
    val log = "graft_r9_hist_log"
    val table = "graft_r9_hist_view"
    Seq(log, s"${table}__staging", table).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val base = Seq(
        (1L, 10.0, ts("2024-01-01 00:00:00"), "upsert"),
        (2L, 5.0, ts("2024-01-02 00:00:00"), "upsert")
      ).toDF("k", "v", "ver", "op")
      base.write.format("parquet").saveAsTable(log)
      val b1 = Seq((1L, 20.0, ts("2024-01-03 00:00:00"), "upsert"))
        .toDF("k", "v", "ver", "op")
      val b2 = Seq((2L, 0.0, ts("2024-01-05 00:00:00"), "delete"))
        .toDF("k", "v", "ver", "op")
      val loop = new graft.streaming.IngestHistorize("k", "ver", log, table)
      loop(b1, 0L)
      loop(b1, 0L) // redelivered batch: byte-identical rows, distinct'd away
      loop(b2, 1L)
      val got = spark.table(table)
        .select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
      val oneShot = Storage.historize(base.unionByName(b1).unionByName(b2),
          col("k"), col("ver"))
        .select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
      assert(got == oneShot, s"got=$got oneShot=$oneShot")
      assert(got.count(_._5) == 1) // key 1 current; key 2 deleted
    } finally Seq(log, s"${table}__staging", table)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("IngestHistorize: replay converges after a mid-loop crash at EITHER hop " +
      "(after log append; after staging, before the view rewrite)") {
    import graft.sources.Storage
    val log = "graft_r10_hist_log"
    val table = "graft_r10_hist_view"
    Seq(log, s"${table}__staging", table).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val base = Seq((1L, 10.0, ts("2024-01-01 00:00:00"), "upsert"))
        .toDF("k", "v", "ver", "op")
      base.write.format("parquet").saveAsTable(log)
      val loop = new graft.streaming.IngestHistorize("k", "ver", log, table)
      loop(base.limit(0), -1L) // bootstrap the view from the base log
      val b1 = Seq((1L, 20.0, ts("2024-01-03 00:00:00"), "upsert"))
        .toDF("k", "v", "ver", "op")
      // CRASH SHAPE 1: the batch appended to the log, then the process
      // died before deriving — the view is stale. The restarted query
      // redelivers b1: the log gets byte-identical rows (distinct'd at
      // read) and the derive step catches the view up.
      b1.write.mode("append").format("parquet").saveAsTable(log)
      assert(spark.table(table).where(col("v") === 20.0).count() == 0, "view must be stale")
      loop(b1, 0L) // redelivery after restart
      val expected = Storage.historize(base.unionByName(b1), col("k"), col("ver"))
        .select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
      def view() = spark.table(table)
        .select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
      assert(view() == expected, s"crash-1 replay did not converge: ${view()}")
      // CRASH SHAPE 2: a later batch appended AND staged, but the main
      // rewrite never ran — staging holds the new derivation, the view is
      // one batch behind. Redelivery must heal (log append is a no-op
      // through distinct, staging is overwritten, the view catches up).
      val b2 = Seq((1L, 0.0, ts("2024-01-05 00:00:00"), "delete"))
        .toDF("k", "v", "ver", "op")
      b2.write.mode("append").format("parquet").saveAsTable(log)
      Storage.historize(
          spark.table(log).distinct(), col("k"), col("ver"))
        .write.mode("overwrite").format("parquet").saveAsTable(s"${table}__staging")
      assert(view() == expected, "view must still be pre-b2") // crash here
      loop(b2, 1L) // redelivery after restart
      val expected2 = Storage.historize(
          base.unionByName(b1).unionByName(b2), col("k"), col("ver"))
        .select(col("k"), col("v"), col("valid_from"), col("valid_to"), col("is_current"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
      assert(view() == expected2, s"crash-2 replay did not converge: ${view()}")
      assert(view().count(_._5) == 0, "key 1 ends deleted — nothing current")
    } finally Seq(log, s"${table}__staging", table)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("volumeTrend perGroupBounds: a late-starting group carries no leading zeros") {
    import graft.operators.TimeSeries
    // group "a": days 0..4 at constant 2/day (slope 0)
    // group "b": starts day 3, constant 2/day for 2 days (slope 0 while alive)
    val rows = (0 until 5).flatMap(d => Seq.fill(2)(("a", ts(f"2024-01-0${d + 1}%d 01:00:00")))) ++
      (3 until 5).flatMap(d => Seq.fill(2)(("b", ts(f"2024-01-0${d + 1}%d 01:00:00"))))
    val df = rows.toDF("g", "ts")
    def slopes(per: Boolean) =
      TimeSeries.volumeTrend(df, col("g"), col("ts"), perGroupBounds = per)
        .collect().map(r => r.getAs[String]("g") ->
          Option(r.getAs[java.lang.Double]("slope_per_day"))).toMap
    val shared = slopes(per = false)
    val own = slopes(per = true)
    assert(own("a").contains(0.0) && own("b").contains(0.0), own.toString)
    // shared window: b's three leading zero days bias its slope upward
    assert(shared("b").exists(_ > 0.0), shared.toString)
  }
}
