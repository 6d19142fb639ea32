package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-15 hardening: the [[graft.streaming.IngestTrianglesCdc]]
  * re-insert-survival regression (the round-14 ADVICE high item — the old
  * inlined rebuild anti-joined survivors on the RAW insert feed while
  * re-unioning only the novel subset, so re-inserting a present edge
  * whose u-bucket any other change touched silently dropped the edge
  * from the store), plus the [[graft.sources.Storage.mergeJoinViewNDelta]]
  * widened reserved-name guard.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private def dropAll(tables: Seq[String]): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("IngestTrianglesCdc: re-inserting a PRESENT edge alongside a same-bucket change " +
      "keeps the edge in the store (no-op contract) — insert and delete variants") {
    val ts = Seq("r15_tcdc_edges", "r15_tcdc_count",
      "r15_tcdc_edges__staging", "r15_tcdc_count__staging")
    dropAll(ts)
    try {
      // buckets = 1: EVERY change touches every edge's bucket, the
      // worst case for the re-insert-survival bug
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(1)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_tcdc_edges")
      Seq((0L, -1L)).toDF("n_triangles", "__batch")
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r15_tcdc_count")
      val handler = new graft.streaming.IngestTrianglesCdc(
        "r15_tcdc_edges", "r15_tcdc_count", 1)
      def count(): Long = spark.table("r15_tcdc_count")
        .where($"n_triangles".isNotNull).head().getLong(0)
      def stored(): Set[(Long, Long)] = spark.table("r15_tcdc_edges")
        .select($"u", $"v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")

      handler(b((1L, 2L, "insert"), (2L, 3L, "insert"), (1L, 3L, "insert")), 0L)
      assert(count() == 1L, s"got ${count()}")
      // re-insert present 1-2 (documented no-op) + genuinely insert 3-4,
      // which touches the shared bucket: 1-2 must SURVIVE the rebuild
      handler(b((1L, 2L, "insert"), (3L, 4L, "insert")), 1L)
      assert(count() == 1L, s"got ${count()}")
      assert(stored() == Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), stored().toString)
      // close {2,3,4} and {1,2,4}+{1,3,4} — the latter two exist only if
      // 1-2 and 1-3 survived batch 1, so a desynced store shows up HERE
      // as a wrong count, not just a wrong edge set
      handler(b((2L, 4L, "insert"), (1L, 4L, "insert")), 2L)
      assert(count() == 4L, s"got ${count()}")
      // delete variant: re-insert present 2-3 alongside a same-bucket
      // DELETE of 2-4 (kills {2,3,4} and {1,2,4}); 2-3 must survive
      handler(b((2L, 3L, "insert"), (2L, 4L, "delete")), 3L)
      assert(count() == 2L, s"got ${count()}")
      assert(stored().contains((2L, 3L)), stored().toString)
      // from-scratch sanity over the final store: per-vertex triangle
      // counts sum to 3× the global count
      val e = spark.table("r15_tcdc_edges")
      val scratch = graft.graphs.Graphs.triangleCounts(e, $"u", $"v")
        .agg(coalesce(sum($"triangles"), lit(0L))).head().getLong(0) / 3
      assert(count() == scratch, s"maintained ${count()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestComponentsCdc: non-bridge delete keeps labels, bridge delete splits, " +
      "re-insert re-joins, last-edge delete drops the isolated node; redelivery no-op") {
    val ts = Seq("r15_ccdc_edges", "r15_ccdc_labels",
      "r15_ccdc_edges__staging", "r15_ccdc_labels__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_ccdc_edges")
      Seq.empty[(Long, Long)].toDF("node", "component")
        .withColumn("bkt", pmod(hash($"component"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_ccdc_labels")
      val handler = new graft.streaming.IngestComponentsCdc(
        "r15_ccdc_edges", "r15_ccdc_labels", 4)
      def labels(): Map[Long, Long] = spark.table("r15_ccdc_labels")
        .select($"node", $"component").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")

      // triangle {1,2,3} + bridge 3-4 + separate pair 5-6
      handler(b((1L, 2L, "insert"), (2L, 3L, "insert"), (1L, 3L, "insert"),
        (3L, 4L, "insert"), (5L, 6L, "insert")), 0L)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L),
        labels().toString)
      // NON-bridge delete (1-3 is on the triangle's cycle): no split
      handler(b((1L, 3L, "delete")), 1L)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L),
        labels().toString)
      // BRIDGE delete (2-3 now spans the only path): splits {1,2} | {3,4}
      handler(b((2L, 3L, "delete")), 2L)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L),
        labels().toString)
      // re-join: insert 2-5 merges {1,2} with {5,6}
      handler(b((2L, 5L, "insert")), 3L)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 3L -> 3L, 4L -> 3L),
        labels().toString)
      // last-edge delete: 3 and 4 both lose their only edge → both drop
      // (labels carry exactly the edge-induced vertex set)
      handler(b((3L, 4L, "delete")), 4L)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L), labels().toString)
      // redelivery: net changes recompute empty against the healed store
      handler(b((3L, 4L, "delete")), 4L)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L), labels().toString)
      // same-edge insert+delete in one batch is refused loudly
      val e = intercept[IllegalStateException](
        handler(b((7L, 8L, "insert"), (7L, 8L, "delete")), 5L))
      assert(e.getMessage.contains("inserts AND deletes the same edge"), e.getMessage)
      // from-scratch sanity over the final store
      val stored = spark.table("r15_ccdc_edges")
      val scratch = graft.graphs.Graphs.connectedComponents(stored, $"u", $"v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels() == scratch, s"maintained ${labels()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("closedTriples expands the LOWER-DEGREE endpoint: a probe edge into a hub pays " +
      "the leaf's adjacency, not the hub's (wedge-row count asserted)") {
    // star: hub 0 — leaves 1..100, plus leaf 5 — 7 so the probe has a
    // wedge at all; canonical (0, 5) has the HUB as the smaller id, so
    // min-ID orientation would expand all ~100 hub neighbors
    val star = (1L to 100L).map(i => (0L, i)) :+ (5L, 7L)
    val graph = star.toDF("u", "v")
    val probe = Seq((0L, 5L)).toDF("u", "v")
    val wedges = graft.streaming.IngestTriangles.orientedWedges(probe, graph)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(wedges.toSeq == Seq((5L, 0L, 7L)),
      s"expected the single leaf wedge, got ${wedges.mkString(", ")}")
    val triples = graft.streaming.IngestTriangles.closedTriples(probe, graph)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triples == Set((0L, 5L, 7L)), triples.toString)
    // symmetric case: the hub as the LARGER id still expands the leaf
    val star2 = (0L to 99L).map(i => (i, 100L)) :+ (5L, 7L)
    val wedges2 = graft.streaming.IngestTriangles.orientedWedges(
      Seq((5L, 100L)).toDF("u", "v"), star2.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(wedges2.toSeq == Seq((5L, 100L, 7L)),
      s"expected the single leaf wedge, got ${wedges2.mkString(", ")}")
  }

  test("IngestQuantileView two-store relay: serving through the re-laid Z-layout is " +
      "row-identical to the direct cell serve, with candidate IN-filters pushed") {
    val ts = Seq("r15_qv_base", "r15_qv_cells", "r15_qv_base__staging", "r15_qv_cells__staging")
    dropAll(ts)
    val relay = java.nio.file.Files.createTempDirectory("r15_relay_").toString + "/z"
    try {
      val scale = 0
      val base = (1L to 400L).map(i => (i, i % 5, (i % 97).toDouble)).toDF("row_id", "grp", "value")
      base.withColumn("bkt", pmod(hash($"grp"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_qv_base")
      base.groupBy($"grp", graft.sources.Storage.dyadicCell($"value", scale).as("cell"))
        .agg(count(lit(1)).as("rc")).withColumn("__batch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r15_qv_cells")
      val handler = new graft.streaming.IngestQuantileView(
        "r15_qv_base", "r15_qv_cells", buckets = 4, scale = scale)
      val b = (401L to 500L).map(i => (i, i % 5, (i % 89).toDouble, "insert")) ++
        (1L to 400L by 7).map(i => (i, i % 5, 0.0, "delete"))
      handler(b.toDF("row_id", "grp", "value", "op"), 0L)
      val cells = spark.table("r15_qv_cells").where($"rc".isNotNull).drop("__batch")
      val qs = Seq(0.25, 0.5, 0.9)
      val direct = graft.sources.Storage.quantilesFromCells(
        cells, spark.table("r15_qv_base"), "grp", "value", scale, qs)
        .collect().map(_.toString).sorted.toSeq
      graft.streaming.IngestQuantileView.relayServeLayout(
        spark, "r15_qv_base", "grp", "value", scale,
        grpBuckets = 8, bits = 16, files = 8, path = relay)
      val served = graft.sources.Storage.quantilesFromCellsLayout(
        spark, relay, cells, "grp", "value", scale, qs, grpBuckets = 8)
      assert(served.collect().map(_.toString).sorted.toSeq == direct)
      // the candidate restriction reaches the relay's parquet scan
      // (FormattedMode: the simple plan string truncates scan metadata)
      val plan = served.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("PushedFilters") && plan.contains("In(cell"), plan)
    } finally {
      dropAll(ts)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(relay).getParentFile)
    }
  }

  test("IngestKCoreCdc: single-node demotion, multi-hop demotion cascade, " +
      "demote-then-repromote in ONE mixed batch; redelivery no-op; from-scratch agreement") {
    val ts = Seq("r15_kcc_edges", "r15_kcc_core",
      "r15_kcc_edges__staging", "r15_kcc_core__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_kcc_edges")
      Seq.empty[(Long, Long)].toDF("node", "deg")
        .withColumn("bkt", pmod(hash($"node"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_kcc_core")
      val handler = new graft.streaming.IngestKCoreCdc(
        "r15_kcc_edges", "r15_kcc_core", k = 2, buckets = 4)
      def core(): Map[Long, Long] = spark.table("r15_kcc_core")
        .select($"node", $"deg").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")

      // triangle {1,2,3} + square {4,5,6,7} with chord 5-7: all 2-core
      handler(b((1L, 2L, "insert"), (2L, 3L, "insert"), (1L, 3L, "insert"),
        (4L, 5L, "insert"), (5L, 6L, "insert"), (6L, 7L, "insert"),
        (4L, 7L, "insert"), (5L, 7L, "insert")), 0L)
      assert(core() == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
        4L -> 2L, 5L -> 3L, 6L -> 2L, 7L -> 3L), core().toString)
      // delete 4-5: only 4 drops (7 keeps 5 and 6); neighbor degs follow
      handler(b((4L, 5L, "delete")), 1L)
      assert(core() == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
        5L -> 2L, 6L -> 2L, 7L -> 2L), core().toString)
      // delete 5-6: the whole square remnant cascades out (5 → 7 → 6)
      handler(b((5L, 6L, "delete")), 2L)
      assert(core() == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core().toString)
      // ONE mixed batch: delete 1-3 (cascades the triangle out entirely)
      // AND insert 4-5 back (re-promotes {4,5,7} — 7 via expansion,
      // with ZERO frozen credit since the intermediate core is empty)
      handler(b((1L, 3L, "delete"), (4L, 5L, "insert")), 3L)
      assert(core() == Map(4L -> 2L, 5L -> 2L, 7L -> 2L), core().toString)
      // redelivery: net changes recompute empty against the healed store
      handler(b((1L, 3L, "delete"), (4L, 5L, "insert")), 3L)
      assert(core() == Map(4L -> 2L, 5L -> 2L, 7L -> 2L), core().toString)
      // same-edge insert+delete in one batch is refused loudly
      val e = intercept[IllegalStateException](
        handler(b((8L, 9L, "insert"), (8L, 9L, "delete")), 4L))
      assert(e.getMessage.contains("inserts AND deletes the same edge"), e.getMessage)
      // from-scratch sanity over the final store
      val scratch = graft.graphs.Graphs.kCore(
        spark.table("r15_kcc_edges"), $"u", $"v", k = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(core() == scratch, s"maintained ${core()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestTriangleCountsCdc: per-vertex counts under deletes, gain-AND-lose in one " +
      "mixed batch nets via absolute recompute, zero-count vertices drop; redelivery no-op") {
    val ts = Seq("r15_tc_edges", "r15_tc_counts",
      "r15_tc_edges__staging", "r15_tc_counts__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_tc_edges")
      Seq.empty[(Long, Long)].toDF("node", "triangles")
        .withColumn("bkt", pmod(hash($"node"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_tc_counts")
      val handler = new graft.streaming.IngestTriangleCountsCdc(
        "r15_tc_edges", "r15_tc_counts", 4)
      def counts(): Map[Long, Long] = spark.table("r15_tc_counts")
        .select($"node", $"triangles").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")

      // K4: every vertex is in 3 of the 4 triangles
      handler(b((1L, 2L, "insert"), (1L, 3L, "insert"), (1L, 4L, "insert"),
        (2L, 3L, "insert"), (2L, 4L, "insert"), (3L, 4L, "insert")), 0L)
      assert(counts() == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), counts().toString)
      // delete 1-2: kills {1,2,3} and {1,2,4}
      handler(b((1L, 2L, "delete")), 1L)
      assert(counts() == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L), counts().toString)
      // mixed: re-insert 1-2 AND delete 3-4 — vertex 1 gains {1,2,3},
      // {1,2,4} and loses {1,3,4} in the SAME batch
      handler(b((1L, 2L, "insert"), (3L, 4L, "delete")), 2L)
      assert(counts() == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), counts().toString)
      // from-scratch sanity mid-stream
      val e = spark.table("r15_tc_edges")
      val scratch = graft.graphs.Graphs.triangleCounts(e, $"u", $"v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts() == scratch, s"maintained ${counts()} vs scratch $scratch")
      // delete down to a star: every count hits zero and the rows DROP
      handler(b((2L, 3L, "delete"), (2L, 4L, "delete")), 3L)
      assert(counts() == Map.empty[Long, Long], counts().toString)
      // redelivery: net changes recompute empty
      handler(b((2L, 3L, "delete"), (2L, 4L, "delete")), 3L)
      assert(counts() == Map.empty[Long, Long], counts().toString)
    } finally dropAll(ts)
  }

  test("mergeJoinViewNDelta rejects keys shadowing ANY materialized column " +
      "(side/op/row_id/bkt/n/total/__batch, not just grp/value/sign)") {
    val view = Seq((1L, 1L, 1.0)).toDF("grp", "n", "total")
    val t = Seq((1L, 1L)).toDF("grp", "k")
    for (bad <- Seq("bkt", "row_id", "side", "op", "n", "total", "__batch")) {
      val t2 = Seq((1L, 1.0)).toDF(bad, "value")
        .withColumnRenamed(bad, bad) // keep the name literal
      val e = intercept[IllegalArgumentException] {
        graft.sources.Storage.mergeJoinViewNDelta(
          view,
          olds = Seq(t.withColumnRenamed("k", bad), t2),
          deltas = Seq(
            Seq.empty[(Long, Long, Int)].toDF("grp", bad, "sign"),
            Seq.empty[(Long, Double, Int)].toDF(bad, "value", "sign")),
          keys = Seq(bad))
      }
      assert(e.getMessage.contains("reserved"), s"key '$bad': ${e.getMessage}")
    }
  }
}
