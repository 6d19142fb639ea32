package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-13 continuation: the QUANTILE-view IVM shape
  * ([[graft.sources.Storage.mergeQuantileCellsDelta]] +
  * [[graft.sources.Storage.quantilesFromCells]] +
  * [[graft.streaming.IngestQuantileView]]).
  */
class Round13bSpec extends SparkSpec {
  import graft.sources.Storage
  import spark.implicits._

  private def dropAll(tables: Seq[String]): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("mergeQuantileCellsDelta: maintained cell refcounts equal the from-scratch " +
      "cell histogram of the final rows — replace, last-copy delete, new group") {
    // scale 0 → cells 1.0 wide; values straddle cell boundaries and signs
    val base = Seq(
      (1L, 1L, 0.25), (2L, 1L, 0.75), (3L, 1L, 1.5), (4L, 1L, -0.5),
      (5L, 2L, 3.0)).toDF("row_id", "grp", "value")
    val cells = base.groupBy($"grp", Storage.dyadicCell($"value", 0).as("cell"))
      .agg(count(lit(1)).as("rc"))
    // replace row 1 (same id, new cell), delete group 2's only row,
    // open group 3
    val inserts = Seq((1L, 1L, 2.5), (9L, 3L, 7.0)).toDF("row_id", "grp", "value")
    val deleteIds = Seq(1L, 5L).toDF("row_id")
    val got = Storage.mergeQuantileCellsDelta(
        cells, base, inserts, deleteIds, "row_id", "grp", "value", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val finalRows = base.join(deleteIds, Seq("row_id"), "left_anti")
      .join(inserts.select($"row_id"), Seq("row_id"), "left_anti")
      .unionByName(inserts)
    val want = finalRows.groupBy($"grp", Storage.dyadicCell($"value", 0).as("cell"))
      .agg(count(lit(1)).as("rc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"got $got want $want")
    // group 2 drained entirely; group 1 keeps one row per cell −1/0/1/2
    // (row 1's replace moved it from cell 0 to cell 2)
    assert(!got.exists(_._1 == 2L))
    assert(got.contains((1L, 0L, 1L)) && got.contains((1L, 2L, 1L)))
  }

  test("quantilesFromCells equals exactQuantiles: ties, negatives, single-row groups, " +
      "q=1.0, several cell scales") {
    val df = Seq(
      (1L, 5.0), (1L, 5.0), (1L, 5.0), (1L, 1.0), (1L, 9.5), (1L, -3.25), (1L, 100.0),
      (2L, 42.0),
      (3L, 0.5), (3L, 0.5), (3L, 0.5), (3L, 0.5)).toDF("g", "v")
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val want = graft.curation.Quantiles.exactQuantiles(df, $"g", $"v", qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    for (scale <- Seq(-2, 0, 3)) {
      val cells = df.groupBy($"g", Storage.dyadicCell($"v", scale).as("cell"))
        .agg(count(lit(1)).as("rc"))
      val got = Storage.quantilesFromCells(cells, df, "g", "v", scale, qs)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == want, s"scale=$scale: got $got want $want")
    }
  }

  test("quantile view end-to-end: maintain cells through a batch, serve from the " +
      "maintained state + final base, land on exactQuantiles of the final rows") {
    val base = (1L to 200L).map(i => (i, i % 3, (i * 37 % 101).toDouble))
      .toDF("row_id", "grp", "value")
    val scale = 4 // cells 16 wide over [0, 100]
    val cells = base.groupBy($"grp", Storage.dyadicCell($"value", scale).as("cell"))
      .agg(count(lit(1)).as("rc"))
    val inserts = (201L to 260L).map(i => (i, i % 3, (i * 53 % 97).toDouble))
      .toDF("row_id", "grp", "value")
    val deleteIds = (1L to 200L).filter(_ % 7 == 0).toDF("row_id")
    val maintained = Storage.mergeQuantileCellsDelta(
      cells, base, inserts, deleteIds, "row_id", "grp", "value", scale)
    val finalBase = base.join(deleteIds, Seq("row_id"), "left_anti").unionByName(inserts)
    val qs = Seq(0.25, 0.5, 0.99)
    val got = Storage.quantilesFromCells(maintained, finalBase, "grp", "value", scale, qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val want = graft.curation.Quantiles.exactQuantiles(finalBase, $"grp", $"value", qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == want, s"got $got want $want")
  }

  test("columnProfile: null counts, exact distincts, numeric min/max vs string " +
      "length min/max, melt conservation, unknown column throws") {
    import graft.curation.Audit
    val df = Seq(
      (Option(1L), Option("aa")), (Option(2L), Option.empty[String]),
      (Option.empty[Long], Option("bbb")), (Option(2L), Option("aa")))
      .toDF("k", "s")
    val p = Audit.columnProfile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) == 4L && k.getLong(2) == 1L && k.getLong(3) == 2L)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 2.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val s = p("s")
    assert(s.getLong(1) == 4L && s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getLong(6) == 2L && s.getLong(7) == 3L)
    val e = intercept[IllegalArgumentException](
      Audit.columnProfile(df, Seq("k", "nope")))
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("weighted quantile view: unit weights degenerate to the unweighted pair row " +
      "for row; weighted serve equals exactWeightedQuantiles on the final rows") {
    val base = (1L to 150L).map(i => (i, i % 2, (i * 41 % 89).toDouble, i % 5 + 1))
      .toDF("row_id", "grp", "value", "w")
    val scale = 3
    val inserts = (151L to 180L).map(i => (i, i % 2, (i * 17 % 83).toDouble, i % 4 + 1))
      .toDF("row_id", "grp", "value", "w")
    val deleteIds = (1L to 150L).filter(_ % 6 == 0).toDF("row_id")
    val finalBase = base.join(deleteIds, Seq("row_id"), "left_anti").unionByName(inserts)
    val qs = Seq(0.3, 0.5, 0.95)
    import graft.sources.Storage

    // unit weights: the weighted pair IS the unweighted pair
    val unitBase = base.withColumn("w", lit(1L))
    val unitIns = inserts.withColumn("w", lit(1L))
    val cells1 = unitBase.groupBy($"grp", Storage.dyadicCell($"value", scale).as("cell"))
      .agg(sum($"w").cast("long").as("rc"))
    val m1 = Storage.mergeWeightedQuantileCellsDelta(
      cells1, unitBase, unitIns, deleteIds, "row_id", "grp", "value", "w", scale)
    val cellsU = base.groupBy($"grp", Storage.dyadicCell($"value", scale).as("cell"))
      .agg(count(lit(1)).as("rc"))
    val mU = Storage.mergeQuantileCellsDelta(
      cellsU, base, inserts, deleteIds, "row_id", "grp", "value", scale)
    assert(m1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      mU.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    val fin1 = finalBase.withColumn("w", lit(1L))
    val s1 = Storage.weightedQuantilesFromCells(m1, fin1, "grp", "value", "w", scale, qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val sU = Storage.quantilesFromCells(mU, finalBase, "grp", "value", scale, qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(s1 == sU, s"unit-weight serve $s1 != unweighted serve $sU")

    // real weights: maintained state + serve equals exactWeightedQuantiles
    val cellsW = base.groupBy($"grp", Storage.dyadicCell($"value", scale).as("cell"))
      .agg(sum($"w").cast("long").as("rc"))
    val mW = Storage.mergeWeightedQuantileCellsDelta(
      cellsW, base, inserts, deleteIds, "row_id", "grp", "value", "w", scale)
    val got = Storage.weightedQuantilesFromCells(
        mW, finalBase, "grp", "value", "w", scale, qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val want = graft.curation.Quantiles.exactWeightedQuantiles(
        finalBase, $"grp", $"value", $"w", qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == want, s"got $got want $want")
  }

  test("quantileBoundsFromCells: the state-only bracket contains the exact type-1 " +
      "quantile and is exactly one cell wide") {
    import graft.sources.Storage
    val df = (1L to 500L).map(i => (i % 4, (i * 37 % 101).toDouble - 17.0)).toDF("g", "v")
    val scale = 3
    val qs = Seq(0.1, 0.5, 0.9, 1.0)
    val cells = df.groupBy($"g", Storage.dyadicCell($"v", scale).as("cell"))
      .agg(count(lit(1)).as("rc"))
    val exact = Storage.quantilesFromCells(cells, df, "g", "v", scale, qs)
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val bounds = Storage.quantileBoundsFromCells(cells, "g", scale, qs).collect()
    assert(bounds.length == exact.size)
    bounds.foreach { r =>
      val v = exact((r.getLong(0), r.getDouble(1)))
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      assert(lo <= v && v < hi, s"$v not in [$lo, $hi)")
      assert(hi - lo == 8.0, s"width ${hi - lo}")
    }
  }

  test("IngestQuantileView weighted mode: cell mass is Σ weight, replay-guarded, " +
      "serve lands on the weighted rank") {
    import graft.sources.Storage
    val ts = Seq("r13_wqv_base", "r13_wqv_cells",
      "r13_wqv_base__staging", "r13_wqv_cells__staging")
    dropAll(ts)
    try {
      // group "g": 10.0 ×3 mass, 20.0 ×1 mass → W=4
      val base = Seq((1L, "g", 10.0, 3L), (2L, "g", 20.0, 1L))
        .toDF("row_id", "grp", "value", "w")
      base.withColumn("bkt", pmod(hash($"grp"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r13_wqv_base")
      base.groupBy($"grp", Storage.dyadicCell($"value", 3).as("cell"))
        .agg(sum($"w").cast("long").as("rc"))
        .withColumn("__batch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r13_wqv_cells")
      val loop = new graft.streaming.IngestQuantileView(
        "r13_wqv_base", "r13_wqv_cells", buckets = 4, scale = 3, weight = Some("w"))

      // insert 30.0 with mass 4, delete row 1 (10.0 mass 3) → masses {20:1, 30:4}
      val b1 = Seq((3L, "g", 30.0, 4L, "insert"), (1L, "", 0.0, 0L, "delete"))
        .toDF("row_id", "grp", "value", "w", "op")
      loop(b1, 0L)
      def cellsNow() = spark.table("r13_wqv_cells").where($"rc".isNotNull)
        .select($"cell", $"rc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cellsNow() == Set((2L, 1L), (3L, 4L)), cellsNow().toString)
      loop(b1, 0L) // redelivery must not re-apply the signed mass
      assert(cellsNow() == Set((2L, 1L), (3L, 4L)))
      // weighted median: W=5, rank ceil(0.5·5)=3 → cum(20)=1 < 3 ≤ cum(30)=5
      val served = Storage.weightedQuantilesFromCells(
          spark.table("r13_wqv_cells").where($"rc".isNotNull).drop("__batch"),
          spark.table("r13_wqv_base"), "grp", "value", "w", 3, Seq(0.5))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSet
      assert(served == Set((0.5, 30.0)), served.toString)
    } finally dropAll(ts)
  }

  test("mergeJoinView3Delta equals the from-scratch three-way join under every " +
      "collision shape: deltas on one, two, and all three relations at once, " +
      "same-batch delete cascades, bag multiplicities") {
    import graft.sources.Storage
    // A(ka, grp) with a duplicate ka (bag semantics), B bridges, C facts
    val aOld = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L)).toDF("ka", "grp")
    val bOld = Seq((1L, 100L), (1L, 101L), (2L, 100L), (3L, 102L)).toDF("ka", "kb")
    val cOld = Seq((100L, 5L), (101L, 7L), (102L, 2L), (100L, 1L)).toDF("kb", "value")
    // one batch: delete customer 1 AND its bridge (1,100) AND fact (102,2);
    // insert customer 4 with a new bridge and a new fact; add a fact to 101
    val aDelta = Seq((1L, 10L, -1), (1L, 11L, -1), (4L, 12L, 1)).toDF("ka", "grp", "sign")
    val bDelta = Seq((1L, 100L, -1), (4L, 101L, 1)).toDF("ka", "kb", "sign")
    val cDelta = Seq((102L, 2L, -1), (101L, 3L, 1), (103L, 9L, 1)).toDF("kb", "value", "sign")
    val view = aOld.join(bOld, Seq("ka")).join(cOld, Seq("kb"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value".cast("double")).as("total"))
    val got = Storage.mergeJoinView3Delta(
        view, aOld, bOld, cOld.withColumn("value", $"value".cast("double")),
        aDelta, bDelta, cDelta.withColumn("value", $"value".cast("double")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // final relations by applying the signed deltas as sets
    val aFin = Seq((2L, 10L), (3L, 12L), (4L, 12L)).toDF("ka", "grp")
    val bFin = Seq((1L, 101L), (2L, 100L), (3L, 102L), (4L, 101L)).toDF("ka", "kb")
    val cFin = Seq((100L, 5L), (101L, 7L), (100L, 1L), (101L, 3L), (103L, 9L))
      .toDF("kb", "value")
    val want = aFin.join(bFin, Seq("ka")).join(cFin, Seq("kb"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value".cast("double")).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"got $got want $want")
  }

  test("IngestJoinView3: composed delta across three tables in one batch, " +
      "replay-guarded, duplicate insert ids throw, drain keeps the sentinel") {
    import graft.sources.Storage
    val ts = Seq("r13_j3_a", "r13_j3_b", "r13_j3_c", "r13_j3_view").flatMap(t =>
      Seq(t, s"${t}__staging"))
    dropAll(ts)
    try {
      val a = Seq((1L, 1L, 10L)).toDF("row_id", "ka", "grp")
      val b = Seq((101L, 1L, 500L)).toDF("row_id", "ka", "kb")
      val c = Seq((201L, 500L, 7L)).toDF("row_id", "kb", "value")
      a.withColumn("bkt", pmod(hash($"ka"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r13_j3_a")
      b.withColumn("bkt", pmod(hash($"ka"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r13_j3_b")
      c.withColumn("bkt", pmod(hash($"kb"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r13_j3_c")
      a.select($"ka", $"grp").join(b.select($"ka", $"kb"), Seq("ka"))
        .join(c.select($"kb", $"value"), Seq("kb"))
        .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value".cast("double")).as("total"))
        .withColumn("__batch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r13_j3_view")
      val loop = new graft.streaming.IngestJoinView3(
        "r13_j3_a", "r13_j3_b", "r13_j3_c", "r13_j3_view", buckets = 4)

      def chg(rows: Seq[(String, Long, Long, Long, Long, Long, String)]) =
        rows.toDF("side", "row_id", "ka", "kb", "grp", "value", "op")
      val dup = chg(Seq(("c", 9L, 0L, 500L, 0L, 1L, "insert"),
        ("c", 9L, 0L, 500L, 0L, 2L, "insert")))
      val e = intercept[IllegalStateException](loop(dup, 0L))
      assert(e.getMessage.contains("duplicate insert row_id"), e.getMessage)

      // one batch touches all three tables: add a c-fact (+3), add a
      // second bridge to a new fact (+9), delete nothing
      val b1 = chg(Seq(
        ("c", 202L, 0L, 500L, 0L, 3L, "insert"),
        ("b", 102L, 1L, 501L, 0L, 0L, "insert"),
        ("c", 203L, 0L, 501L, 0L, 9L, "insert")))
      loop(b1, 0L)
      def viewNow() = spark.table("r13_j3_view").where($"n".isNotNull)
        .select($"grp", $"n", $"total").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viewNow() == Set((10L, 3L, 19.0)), viewNow().toString)
      loop(b1, 0L) // redelivery must not re-apply
      assert(viewNow() == Set((10L, 3L, 19.0)))
      // drain: delete the one customer — the whole view empties, the
      // sentinel still advances the watermark
      val drain = chg(Seq(("a", 1L, 0L, 0L, 0L, 0L, "delete")))
      loop(drain, 1L)
      assert(viewNow().isEmpty)
      assert(spark.table("r13_j3_view").agg(max($"__batch")).head().getLong(0) == 1L)
      loop(drain, 1L)
      assert(viewNow().isEmpty)
    } finally dropAll(ts)
  }

  test("freshness: staleness against the explicit instant; all-null group reports " +
      "null last_seen, never zero") {
    import graft.curation.Audit
    val df = Seq(
      (1L, Option(ts("2000-01-01 00:00:00"))),
      (1L, Option(ts("2000-01-03 00:00:00"))),
      (2L, Option.empty[java.sql.Timestamp])).toDF("g", "t")
    val asOf = ts("2000-01-04 00:00:00")
    val rows = Audit.freshness(df, $"g", $"t", asOf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 2L)
    assert(rows(1L).getLong(3) == 86400L, rows(1L).toString) // one day stale
    assert(rows(2L).isNullAt(2) && rows(2L).isNullAt(3), rows(2L).toString)
  }

  test("fkOrphans counts null and missing keys as orphans; keyUniqueness profiles " +
      "multiplicity exactly") {
    import graft.curation.Audit
    val child = Seq(Option(1L), Option(1L), Option(3L), Option.empty[Long])
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val fk = Audit.fkOrphans(child, parent, $"fk", $"pk").head()
    // rows 3L and null are orphans; null has no key image in n_orphan_keys
    assert(fk.getLong(0) == 4L && fk.getLong(1) == 2L && fk.getLong(2) == 1L, fk.toString)

    val df = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"), (3L, "f"))
      .toDF("k", "x")
    val u = Audit.keyUniqueness(df, Seq($"k")).head()
    assert(u.getLong(0) == 6L && u.getLong(1) == 3L && u.getLong(2) == 2L &&
      u.getLong(3) == 3L, u.toString)
    val uniq = Audit.keyUniqueness(df, Seq($"k", $"x")).head()
    assert(uniq.getLong(2) == 0L && uniq.getLong(3) == 1L, uniq.toString)
  }

  test("IngestQuantileView: replay-guarded, preexisting live insert id throws, " +
      "drained relation keeps its watermark sentinel") {
    val ts = Seq("r13_qv_base", "r13_qv_cells", "r13_qv_base__staging", "r13_qv_cells__staging")
    dropAll(ts)
    try {
      val base = Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("row_id", "grp", "value")
      base.withColumn("bkt", pmod(hash($"grp"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r13_qv_base")
      base.groupBy($"grp", Storage.dyadicCell($"value", 3).as("cell"))
        .agg(count(lit(1)).as("rc"))
        .withColumn("__batch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r13_qv_cells")
      val loop = new graft.streaming.IngestQuantileView(
        "r13_qv_base", "r13_qv_cells", buckets = 4, scale = 3)

      val reuse = Seq((1L, 1L, 99.0, "insert")).toDF("row_id", "grp", "value", "op")
      val e = intercept[IllegalStateException](loop(reuse, 0L))
      assert(e.getMessage.contains("already live"), e.getMessage)

      val dup = Seq((7L, 1L, 1.0, "insert"), (7L, 1L, 2.0, "insert"))
        .toDF("row_id", "grp", "value", "op")
      val e2 = intercept[IllegalStateException](loop(dup, 0L))
      assert(e2.getMessage.contains("duplicate insert row_id"), e2.getMessage)

      // insert 30.0 (cell 3), delete row 2 (20.0, cell 2)
      val b1 = Seq((3L, 1L, 30.0, "insert"), (2L, 0L, 0.0, "delete"))
        .toDF("row_id", "grp", "value", "op")
      loop(b1, 0L)
      def cellsNow() = spark.table("r13_qv_cells").where($"rc".isNotNull)
        .select($"cell", $"rc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cellsNow() == Set((1L, 1L), (3L, 1L)), cellsNow().toString)
      loop(b1, 0L) // redelivery: refcounts must not double-apply
      assert(cellsNow() == Set((1L, 1L), (3L, 1L)))
      // served quantiles reflect the maintained state + healed base
      val served = Storage.quantilesFromCells(
          spark.table("r13_qv_cells").where($"rc".isNotNull).drop("__batch"),
          spark.table("r13_qv_base"), "grp", "value", 3, Seq(0.5, 1.0))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSet
      assert(served == Set((0.5, 10.0), (1.0, 30.0)), served.toString)
      // drain everything: sentinel keeps the watermark
      val drain = Seq((1L, 0L, 0.0, "delete"), (3L, 0L, 0.0, "delete"))
        .toDF("row_id", "grp", "value", "op")
      loop(drain, 1L)
      assert(cellsNow().isEmpty)
      assert(spark.table("r13_qv_cells").agg(max($"__batch")).head().getLong(0) == 1L)
      loop(drain, 1L) // redelivery against the drained relation: skipped
      assert(cellsNow().isEmpty)
    } finally dropAll(ts)
  }
}
