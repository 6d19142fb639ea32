package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-16 hardening: the [[graft.streaming.IngestComponentsCdc]]
  * bulk-batch path (driver `isin` root lists swap to a broadcast
  * semi-join above `IsinRootLimit` — the round-15 verdict's plan-bloat
  * watch item) and the [[graft.streaming.IngestSssp]]
  * non-negative-weight contract (the serve equivalence breaks silently
  * on negative weights; it must break loudly instead).
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private def dropAll(tables: Seq[String]): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("IngestComponentsCdc.affectedSubgraph: the bulk broadcast-semi-join path returns " +
      "the same touched nodes and subgraph as the isin fast path") {
    val tables = Seq("r16_asg_labels")
    dropAll(tables)
    try {
      // 6 components: a 3-chain and five 2-chains
      val edges = Seq((1L, 2L), (2L, 3L), (11L, 12L), (21L, 22L),
        (31L, 32L), (41L, 42L), (51L, 52L))
      val edgesDf = edges.toDF("u", "v")
      graft.graphs.Graphs.connectedComponents(edgesDf, $"u", $"v")
        .withColumn("bkt", pmod(hash($"component"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_asg_labels")
      val newE = Seq((3L, 11L)).toDF("u", "v") // joins 1's and 11's components
      val delE = Seq((21L, 22L)).toDF("u", "v") // splits 21's component
      val post = edgesDf.join(delE, Seq("u", "v"), "left_anti").unionByName(newE)
      def run(limit: Int): (Set[Long], Set[(Long, Long)]) = {
        val (tn, se) = graft.streaming.IngestComponentsCdc.affectedSubgraph(
          spark, "r16_asg_labels", post, newE, delE, isinRootLimit = limit)
        val out = (tn.collect().map(_.getLong(0)).toSet,
          se.select($"u", $"v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
        tn.unpersist()
        out
      }
      val (tnIsin, seIsin) = run(1000) // 3 roots <= 1000: isin path
      val (tnJoin, seJoin) = run(0)    // 3 roots  > 0:    join path
      assert(tnIsin == tnJoin, s"touched: $tnIsin vs $tnJoin")
      assert(seIsin == seJoin, s"subgraph: $seIsin vs $seJoin")
      assert(tnIsin == Set(1L, 2L, 3L, 11L, 12L, 21L, 22L), tnIsin.toString)
      assert(seIsin == Set((1L, 2L), (2L, 3L), (11L, 12L), (3L, 11L)), seIsin.toString)
    } finally dropAll(tables)
  }

  test("IngestComponentsCdc: a bulk batch touching >IsinRootLimit roots (the broadcast " +
      "semi-join path, end-to-end) still lands on the from-scratch labels") {
    val tables = Seq("r16_bulk_edges", "r16_bulk_labels",
      "r16_bulk_edges__staging", "r16_bulk_labels__staging")
    dropAll(tables)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(8)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_bulk_edges")
      Seq.empty[(Long, Long)].toDF("node", "component")
        .withColumn("bkt", pmod(hash($"component"), lit(8)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_bulk_labels")
      val handler = new graft.streaming.IngestComponentsCdc(
        "r16_bulk_edges", "r16_bulk_labels", 8)
      // batch 1: 1500 disjoint edges → 1500 components
      handler((0L until 1500L).map(i => (2 * i, 2 * i + 1, "insert"))
        .toDF("u", "v", "op"), 0L)
      assert(spark.table("r16_bulk_labels").select(countDistinct($"component"))
        .head().getLong(0) == 1500L)
      // batch 2: delete every third edge AND link even-indexed pairs —
      // every one of the 1500 roots is touched (> IsinRootLimit = 1000),
      // components stay small so the re-solve converges in few rounds
      val dels = (0L until 1500L).filter(_ % 3 == 0).map(i => (2 * i, 2 * i + 1, "delete"))
      val links = (0L until 1499L).filter(_ % 2 == 0).map(i => (2 * i + 1, 2 * i + 2, "insert"))
      handler((dels ++ links).toDF("u", "v", "op"), 1L)
      val finalEdges = spark.table("r16_bulk_edges").select($"u", $"v")
      val want = graft.graphs.Graphs.connectedComponents(finalEdges, $"u", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = spark.table("r16_bulk_labels").select($"node", $"component")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"${got.size} maintained vs ${want.size} from-scratch")
    } finally dropAll(tables)
  }

  test("IngestSsspCdc: delete demotion, weight-increase demotion, re-insert relaxation, " +
      "unreachable-node drop — serve matches the from-scratch operator after every batch") {
    val tables = Seq("r16_scdc_edges", "r16_scdc_dist",
      "r16_scdc_edges__staging", "r16_scdc_dist__staging")
    dropAll(tables)
    try {
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
        .withColumn("bkt", pmod(hash($"src"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_scdc_edges")
      Seq((1L, 0, 0L)).toDF("node", "h", "dist")
        .withColumn("bkt", pmod(hash($"node"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_scdc_dist")
      val handler = new graft.streaming.IngestSsspCdc(
        "r16_scdc_edges", "r16_scdc_dist", maxHops = 3, buckets = 4)
      var live = Map.empty[(Int, Int), Int]
      def step(batchId: Long, rows: (Int, Int, Int, String)*): Unit = {
        handler(rows.toDF("src", "dst", "w", "op"), batchId)
        rows.foreach { case (s0, d0, w0, op) =>
          if (op == "insert") live += ((s0, d0) -> w0) else live -= ((s0, d0))
        }
        val edges = live.toSeq.map { case ((a, b), w) => (a, b, w) }
        val want = graft.graphs.Graphs.shortestPaths(
          edges.toDF("src", "dst", "w"), $"src", $"dst", $"w",
          Seq(1L).toDF("seed"), $"seed", maxHops = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = spark.table("r16_scdc_dist")
          .groupBy($"node").agg(min($"dist").as("dist"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"batch $batchId: maintained $got vs from-scratch $want")
      }
      step(0L, (1, 2, 1, "insert"), (2, 3, 1, "insert"), (1, 3, 5, "insert"),
        (3, 4, 1, "insert"))
      // delete the cheap middle hop: 3 demotes to the direct edge, 4 follows
      step(1L, (2, 3, 1, "delete"))
      // weight-increase demotion via upsert on the direct edge
      step(2L, (1, 3, 105, "insert"))
      // re-insert the middle hop: both relax back down
      step(3L, (2, 3, 1, "insert"))
      // delete 4's only in-edge: it must drop out of the dist table entirely
      step(4L, (3, 4, 1, "delete"))
      // deleting an absent edge is a no-op (redelivery shape)
      step(5L, (3, 4, 1, "delete"))
    } finally dropAll(tables)
  }

  test("IngestSssp refuses a batch carrying a negative weight loudly") {
    val tables = Seq("r16_sssp_edges", "r16_sssp_dist",
      "r16_sssp_edges__staging", "r16_sssp_dist__staging")
    dropAll(tables)
    try {
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
        .withColumn("bkt", pmod(hash($"src"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_sssp_edges")
      Seq((1L, 0, 0L)).toDF("node", "h", "dist")
        .withColumn("bkt", pmod(hash($"node"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r16_sssp_dist")
      val handler = new graft.streaming.IngestSssp(
        "r16_sssp_edges", "r16_sssp_dist", maxHops = 3, buckets = 4)
      val ex = intercept[IllegalStateException] {
        handler(Seq((1L, 2L, 5L), (2L, 3L, -1L)).toDF("src", "dst", "w"), 0L)
      }
      assert(ex.getMessage.contains("negative weight"), ex.getMessage)
      // nothing was applied: the store is still empty, the state untouched
      assert(spark.table("r16_sssp_edges").isEmpty)
      assert(spark.table("r16_sssp_dist").count() == 1L)
    } finally dropAll(tables)
  }

  test("PQ.trainCodebooks joint single-pass training is bit-identical to m independent " +
      "Lloyd runs over the vector slices (same seeds, kernels, grids, tie rules)") {
    import graft.similarity.{Clustering, PQ}
    // deterministic pseudo-random 8-dim vectors, enough rows that clusters
    // move across both iterations; includes exact ties (duplicated rows)
    val rows = (0L until 300L).map { i =>
      (i, (0 until 8).map(p => ((i * 37 + p * 101) % 97 - 48) / 7.0))
    }
    val df = (rows ++ rows.take(20).map { case (i, v) => (i + 1000L, v) })
      .toDF("id", "v").repartition(16) // force partial-aggregate merges
    for ((m, k, iters) <- Seq((2, 3, 2), (4, 4, 2), (8, 2, 3))) {
      val joint = PQ.trainCodebooks(df, $"id", $"v", m, k, iters)
      val sub = 8 / m
      val separate = (0 until m).map { j =>
        Clustering.lloydCentroids(
          df.select($"id", slice($"v".cast("array<double>"), j * sub + 1, sub).as("sv")),
          $"id", $"sv", k, iters)
      }
      for (j <- 0 until m; c <- 0 until k)
        assert(joint.books(j)(c).toSeq == separate(j)(c).toSeq,
          s"m=$m k=$k iters=$iters: subspace $j codeword $c diverged: " +
            s"${joint.books(j)(c).toSeq} vs ${separate(j)(c).toSeq}")
    }
  }
}
