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
}
