package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The heavier half of the round-15 maintainer tests, split out of
  * [[Round15Spec]] so no single suite dominates the test run's
  * wall-clock (suites run as parallel forked groups — round-16 verdict
  * item 1: the sequential 48-minute run outgrew the verify budget).
  */
class Round15bSpec extends SparkSpec {
  import spark.implicits._

  private def dropAll(tables: Seq[String]): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("IngestKCore: cascading multi-hop promotion, core-core degree bump, " +
      "non-promoting inserts, a detached region promoting with zero frozen credit; " +
      "redelivery no-op; from-scratch agreement") {
    val ts = Seq("r15_kc_edges", "r15_kc_core",
      "r15_kc_edges__staging", "r15_kc_core__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r15_kc_edges")
      Seq.empty[(Long, Long)].toDF("node", "deg")
        .withColumn("bkt", pmod(hash($"node"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_kc_core")
      val handler = new graft.streaming.IngestKCore("r15_kc_edges", "r15_kc_core", k = 2, buckets = 4)
      def core(): Map[Long, Long] = spark.table("r15_kc_core")
        .select($"node", $"deg").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def b(rows: (Long, Long)*) = rows.toDF("u", "v")

      // triangle {1,2,3} (the 2-core) + pendant path 1-4-5 (peels away)
      handler(b((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (4L, 5L)), 0L)
      assert(core() == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core().toString)
      // insert 5-2: Y = {4, 5} is newly feasible — 5 is the only non-core
      // Δ endpoint, 4 joins via EXPANSION (multi-hop promotion); old-core
      // neighbors 1 and 2 gain in-core degree
      handler(b((5L, 2L)), 1L)
      assert(core() == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L, 5L -> 2L), core().toString)
      // core-core insert (3-4): degree bump only, no promotion machinery
      handler(b((3L, 4L)), 2L)
      assert(core() == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L), core().toString)
      // non-promoting insert: 6-7 alone leaves both below k
      handler(b((6L, 7L)), 3L)
      assert(core() == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L), core().toString)
      // redelivery: net-new edges empty, early no-op
      handler(b((6L, 7L)), 3L)
      assert(core() == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L), core().toString)
      // detached triangle completes: {6,7,8} promotes with ZERO frozen
      // core credit (no old-core neighbor anywhere in the region)
      handler(b((6L, 8L), (7L, 8L)), 4L)
      assert(core() == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 2L,
        6L -> 2L, 7L -> 2L, 8L -> 2L), core().toString)
      // from-scratch sanity over the final store
      val scratch = graft.graphs.Graphs.kCore(
        spark.table("r15_kc_edges"), $"u", $"v", k = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(core() == scratch, s"maintained ${core()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestMsfCdc: forest-edge delete finds the replacement from the retained " +
      "store, no-replacement delete splits (labels follow), re-insert re-merges, " +
      "cheaper re-insert replaces and costlier is a no-op; from-scratch agreement") {
    val ts = Seq("r15_msf_edges", "r15_msf_forest", "r15_msf_labels",
      "r15_msf_edges__staging", "r15_msf_forest__staging", "r15_msf_labels__staging")
    dropAll(ts)
    try {
      for (t <- Seq("r15_msf_edges", "r15_msf_forest"))
        Seq.empty[(Long, Long, Long)].toDF("u", "v", "w")
          .withColumn("bkt", pmod(hash($"u"), lit(4)))
          .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet").saveAsTable(t)
      Seq.empty[(Long, Long)].toDF("node", "component")
        .withColumn("bkt", pmod(hash($"component"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_msf_labels")
      val handler = new graft.streaming.IngestMsfCdc(
        "r15_msf_edges", "r15_msf_forest", "r15_msf_labels", 4)
      def forest(): Set[(Long, Long, Long)] = spark.table("r15_msf_forest")
        .select($"u", $"v", $"w").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def labels(): Map[Long, Long] = spark.table("r15_msf_labels")
        .select($"node", $"component").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def b(rows: (Long, Long, Long, String)*) = rows.toDF("u", "v", "w", "op")

      // path 1-2-3 with the heavy chord 1-3, tail 3-4-5
      handler(b((1L, 2L, 1L, "insert"), (2L, 3L, 2L, "insert"), (1L, 3L, 5L, "insert"),
        (3L, 4L, 3L, "insert"), (4L, 5L, 4L, "insert")), 0L)
      assert(forest() == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 4L)),
        forest().toString)
      // forest-edge delete WITH a replacement: the chord re-enters
      handler(b((2L, 3L, 2L, "delete")), 1L)
      assert(forest() == Set((1L, 2L, 1L), (1L, 3L, 5L), (3L, 4L, 3L), (4L, 5L, 4L)),
        forest().toString)
      // forest-edge delete with NO replacement: split, labels follow
      handler(b((1L, 3L, 5L, "delete")), 2L)
      assert(forest() == Set((1L, 2L, 1L), (3L, 4L, 3L), (4L, 5L, 4L)), forest().toString)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L),
        labels().toString)
      // re-insert re-merges
      handler(b((2L, 3L, 2L, "insert")), 3L)
      assert(forest() == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 4L)),
        forest().toString)
      assert(labels() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L),
        labels().toString)
      // cheaper re-insert REPLACES (4-5 drops to 1); costlier is a no-op
      handler(b((4L, 5L, 1L, "insert"), (1L, 2L, 9L, "insert")), 4L)
      assert(forest() == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 1L)),
        forest().toString)
      // redelivery: both rows net to no-ops against the healed store
      handler(b((4L, 5L, 1L, "insert"), (1L, 2L, 9L, "insert")), 4L)
      assert(forest() == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 1L)),
        forest().toString)
      // same-edge insert+delete in one batch is refused loudly
      val e = intercept[IllegalStateException](
        handler(b((7L, 8L, 1L, "insert"), (7L, 8L, 1L, "delete")), 5L))
      assert(e.getMessage.contains("inserts AND deletes the same edge"), e.getMessage)
      // from-scratch sanity over the final store
      val scratch = graft.graphs.Graphs.minimumSpanningForest(
        spark.table("r15_msf_edges"), $"u", $"v", $"w")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(forest() == scratch, s"maintained ${forest()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestEdgeJaccardCdc: a degree-only change re-scores incident edges whose " +
      "triangles never moved (the denominator propagation case); deletes drop rows " +
      "and restore on re-insert; redelivery no-op; from-scratch agreement") {
    val ts = Seq("r15_ej_edges", "r15_ej_view",
      "r15_ej_edges__staging", "r15_ej_view__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_ej_edges")
      Seq.empty[(Long, Long, Long, Double)].toDF("lo", "hi", "common", "jaccard")
        .withColumn("bkt", pmod(hash($"lo"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_ej_view")
      val handler = new graft.streaming.IngestEdgeJaccardCdc(
        "r15_ej_edges", "r15_ej_view", 4)
      def view(): Map[(Long, Long), (Long, Double)] = spark.table("r15_ej_view")
        .select($"lo", $"hi", $"common", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")

      // bare triangle: every edge has one common neighbor, jaccard 1.0
      handler(b((1L, 2L, "insert"), (2L, 3L, "insert"), (1L, 3L, "insert")), 0L)
      assert(view() == Map((1L, 2L) -> ((1L, 1.0)), (1L, 3L) -> ((1L, 1.0)),
        (2L, 3L) -> ((1L, 1.0))), view().toString)
      // PROPAGATION: insert the pendant 1-4 — no triangle through (1,2) or
      // (1,3) changes, but deg(1) does, so both denominators move; (2,3)
      // is untouched and must NOT be rewritten
      handler(b((1L, 4L, "insert")), 1L)
      assert(view() == Map((1L, 2L) -> ((1L, 0.5)), (1L, 3L) -> ((1L, 0.5)),
        (2L, 3L) -> ((1L, 1.0)), (1L, 4L) -> ((0L, 0.0))), view().toString)
      // delete restores the bare triangle; the (1,4) row drops
      handler(b((1L, 4L, "delete")), 2L)
      assert(view() == Map((1L, 2L) -> ((1L, 1.0)), (1L, 3L) -> ((1L, 1.0)),
        (2L, 3L) -> ((1L, 1.0))), view().toString)
      // mixed batch: kill the triangle edge AND add an unrelated edge
      handler(b((2L, 3L, "delete"), (2L, 4L, "insert")), 3L)
      assert(view() == Map((1L, 2L) -> ((0L, 0.0)), (1L, 3L) -> ((0L, 0.0)),
        (2L, 4L) -> ((0L, 0.0))), view().toString)
      // redelivery: net changes recompute empty
      handler(b((2L, 3L, "delete"), (2L, 4L, "insert")), 3L)
      assert(view() == Map((1L, 2L) -> ((0L, 0.0)), (1L, 3L) -> ((0L, 0.0)),
        (2L, 4L) -> ((0L, 0.0))), view().toString)
      // from-scratch sanity over the final store
      val scratch = graft.graphs.Graphs.edgeJaccard(
        spark.table("r15_ej_edges"), $"u", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(view() == scratch, s"maintained ${view()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestSssp: cheaper re-insert propagates level-by-level, the hop cap keeps a " +
      "cheaper-but-longer path OUT (hop-resolved state, not a relaxation fixpoint); " +
      "redelivery no-op; from-scratch agreement") {
    val ts = Seq("r15_sp_edges", "r15_sp_dist",
      "r15_sp_edges__staging", "r15_sp_dist__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
        .withColumn("bkt", pmod(hash($"src"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_sp_edges")
      Seq((1L, 0, 0L)).toDF("node", "h", "dist")
        .withColumn("bkt", pmod(hash($"node"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_sp_dist")
      val handler = new graft.streaming.IngestSssp(
        "r15_sp_edges", "r15_sp_dist", maxHops = 2, buckets = 4)
      def serve(): Map[Long, Long] = spark.table("r15_sp_dist")
        .groupBy($"node").agg(min($"dist").as("dist"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def b(rows: (Long, Long, Long)*) = rows.toDF("src", "dst", "w")

      handler(b((1L, 2L, 5L), (2L, 3L, 4L)), 0L)
      assert(serve() == Map(1L -> 0L, 2L -> 5L, 3L -> 9L), serve().toString)
      // one batch: a cheaper REPLACE of 1→2 (propagates to 3's 2-hop
      // value) and a direct-but-expensive 1→3 (improves nothing)
      handler(b((1L, 2L, 2L), (1L, 3L, 20L)), 1L)
      assert(serve() == Map(1L -> 0L, 2L -> 2L, 3L -> 6L), serve().toString)
      // HOP CAP: 3→4 makes 4 reachable only as 1→3→4 = 21 within 2 hops;
      // the cheaper 1→2→3→4 = 7 is 3 hops and must NOT leak in
      handler(b((3L, 4L, 1L)), 2L)
      assert(serve() == Map(1L -> 0L, 2L -> 2L, 3L -> 6L, 4L -> 21L), serve().toString)
      // redelivery: nothing is absent or cheaper, early no-op
      handler(b((3L, 4L, 1L)), 2L)
      assert(serve() == Map(1L -> 0L, 2L -> 2L, 3L -> 6L, 4L -> 21L), serve().toString)
      // from-scratch sanity over the final store
      val scratch = graft.graphs.Graphs.shortestPaths(
        spark.table("r15_sp_edges"), $"src", $"dst", $"w",
        Seq(1L).toDF("seed"), $"seed", maxHops = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(serve() == scratch, s"maintained ${serve()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestKTrussCdc: one insert promotes a triangle-connected region (expansion + " +
      "frozen-truss-credit peel), a delete cascades support drops, re-insert re-promotes; " +
      "partner supports follow; redelivery no-op; from-scratch agreement") {
    val ts = Seq("r15_kt_edges", "r15_kt_truss",
      "r15_kt_edges__staging", "r15_kt_truss__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_kt_edges")
      Seq.empty[(Long, Long, Long)].toDF("lo", "hi", "support")
        .withColumn("bkt", pmod(hash($"lo"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r15_kt_truss")
      val handler = new graft.streaming.IngestKTrussCdc(
        "r15_kt_edges", "r15_kt_truss", k = 4, buckets = 4)
      def truss(): Map[(Long, Long), Long] = spark.table("r15_kt_truss")
        .select($"lo", $"hi", $"support").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")
      def i(es: (Long, Long)*) = es.map { case (a, c) => (a, c, "insert") }

      // K4 on {1,2,3,4} (every edge in 2 triangles — a 4-truss) plus the
      // pendant triangle {3,4,5}, whose new edges have support 1 and peel
      handler(b(i((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (3L, 5L), (4L, 5L)): _*), 0L)
      assert(truss() == Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
        (2L, 3L) -> 2L, (2L, 4L) -> 2L, (3L, 4L) -> 2L), truss().toString)
      // ONE insert (2-5) makes {2,3,4,5} a wheel: (3,5) and (4,5) promote
      // via triangle-expansion with frozen credit; partner supports rise
      handler(b(i((2L, 5L)): _*), 1L)
      assert(truss() == Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
        (2L, 3L) -> 3L, (2L, 4L) -> 3L, (3L, 4L) -> 3L,
        (2L, 5L) -> 2L, (3L, 5L) -> 2L, (4L, 5L) -> 2L), truss().toString)
      // delete 1-2: (1,3) and (1,4) drop to support 1 and cascade out;
      // (2,3)/(2,4)/(3,4) keep >= 2 through the {2,3,4,5} block
      handler(b((1L, 2L, "delete")), 2L)
      assert(truss() == Map((2L, 3L) -> 2L, (2L, 4L) -> 2L, (3L, 4L) -> 2L,
        (2L, 5L) -> 2L, (3L, 5L) -> 2L, (4L, 5L) -> 2L), truss().toString)
      // re-insert 1-2: {(1,2),(1,3),(1,4)} re-promote together
      handler(b(i((1L, 2L)): _*), 3L)
      assert(truss() == Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
        (2L, 3L) -> 3L, (2L, 4L) -> 3L, (3L, 4L) -> 3L,
        (2L, 5L) -> 2L, (3L, 5L) -> 2L, (4L, 5L) -> 2L), truss().toString)
      // redelivery: net changes recompute empty
      handler(b(i((1L, 2L)): _*), 3L)
      assert(truss().size == 9, truss().toString)
      // from-scratch sanity over the final store
      val scratch = graft.graphs.Graphs.kTruss(
        spark.table("r15_kt_edges"), $"u", $"v", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(truss() == scratch, s"maintained ${truss()} vs scratch $scratch")
    } finally dropAll(ts)
  }

}
