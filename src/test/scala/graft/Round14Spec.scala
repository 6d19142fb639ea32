package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-14 hardening: the shared [[graft.streaming.IvmMaintenance]]
  * machinery's full-base row-id reuse probe (a cross-key reuse lands in a
  * different bucket and escaped the old bucket-pruned check),
  * [[graft.operators.Joins.bloomPrunedJoin]]'s single-materialization +
  * auto-sized geometry, the weighted-quantile LONG ≥ 1 weight contract
  * asserted in-scan, and columnProfile's signed-zero distinct collapse.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def dropAll(tables: Seq[String]): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("IngestJoinView row-id contract probes the WHOLE base: an insert reusing a live " +
      "row_id under a DIFFERENT key (different bucket) throws too") {
    val ts = Seq("r14_xk_a", "r14_xk_b", "r14_xk_view",
      "r14_xk_a__staging", "r14_xk_b__staging", "r14_xk_view__staging")
    dropAll(ts)
    try {
      // key 1 and key 2 hash to DIFFERENT buckets at 4 buckets (hash(1)=
      // whatever — assert it below so the test stays honest if hashing
      // changes); b-row 101 lives under key 1
      val a = Seq((1L, 1L, 10L), (2L, 2L, 20L)).toDF("row_id", "key", "grp")
      val b = Seq((101L, 1L, 5L)).toDF("row_id", "key", "value")
      val bkt = (k: Long) => Seq(k).toDF("key")
        .select(pmod(hash($"key"), lit(4))).head().getInt(0)
      assume(bkt(1L) != bkt(2L), "need keys in distinct buckets for this test")
      a.withColumn("bkt", pmod(hash($"key"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r14_xk_a")
      b.withColumn("bkt", pmod(hash($"key"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r14_xk_b")
      a.join(b.select($"key", $"value"), Seq("key"))
        .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value").as("total"))
        .withColumn("__batch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r14_xk_view")
      val handler = new graft.streaming.IngestJoinView(
        "r14_xk_a", "r14_xk_b", "r14_xk_view", 4)

      // reuse live id 101 under key 2 — a bucket-pruned probe keyed on the
      // INSERT's key would scan bucket(2) only and miss the live row in
      // bucket(1); the full-base probe must throw
      val reuse = Seq(("b", 101L, 2L, 0L, 9L, "insert"))
        .toDF("side", "row_id", "key", "grp", "value", "op")
      val e = intercept[IllegalStateException](handler(reuse, 0L))
      assert(e.getMessage.contains("already live"), e.getMessage)
    } finally dropAll(ts)
  }

  test("bloomPrunedJoin auto-sizes its filter from the materialized side (no " +
      "expectedKeys) and stays row-identical to the plain equi join") {
    import graft.operators.Joins
    val large = spark.range(0, 5000).select(($"id" % 500).as("k"), $"id".as("payload"))
    val small = spark.range(0, 50).select(($"id" * 7).as("k"), ($"id" + 100).as("tag"))
    val expected = large.join(small, Seq("k")).collect().map(_.toString).sorted
    val got = Joins.bloomPrunedJoin(large, small, "k").collect().map(_.toString).sorted
    assert(got.sameElements(expected))
    // empty selective side still yields the (empty) plain join
    assert(Joins.bloomPrunedJoin(large, small.where(lit(false)), "k").isEmpty)
  }

  test("mergeWeightedQuantileCellsDelta asserts the LONG >= 1 weight contract in-scan: " +
      "zero, negative, and fractional weights throw instead of corrupting cell mass") {
    import graft.sources.Storage
    val cells = Seq.empty[(Long, Long, Long)].toDF("grp", "cell", "rc")
    val base = Seq.empty[(Long, Long, Double, Long)].toDF("row_id", "grp", "value", "w")
    val dels = Seq.empty[Long].toDF("row_id")
    def run(w: Double): Unit = {
      val ins = Seq((1L, 1L, 10.0, w)).toDF("row_id", "grp", "value", "w")
      Storage.mergeWeightedQuantileCellsDelta(
        cells, base, ins, dels, "row_id", "grp", "value", "w", 8).collect()
      ()
    }
    run(3.0) // valid integral weight passes
    for (bad <- Seq(0.0, -2.0, 1.5)) {
      val e = intercept[Exception](run(bad))
      assert(e.getMessage.contains("must be a LONG >= 1"), s"w=$bad: ${e.getMessage}")
    }
  }

  test("mergeJoinViewNDelta (4-way chain) lands on the from-scratch re-join under " +
      "fan-out multiplicities and same-batch inserts+deletes on every side") {
    import graft.sources.Storage
    // a: 2 groups, fan-out on ka; b: multiple kb per ka; c: multiple kc
    // per kb (duplicate kc values to drive multiplicity); d: values
    val aOld = Seq((1L, 10L), (1L, 10L), (2L, 20L)).toDF("ka", "grp")
    val bOld = Seq((1L, 100L), (1L, 101L), (2L, 102L)).toDF("ka", "kb")
    val cOld = Seq((100L, 7L), (100L, 7L), (101L, 8L), (102L, 7L)).toDF("kb", "kc")
    val dOld = Seq((7L, 5L), (8L, 3L)).toDF("kc", "value")
    // deltas: insert a new a-row for grp 20 AND delete one of the dup
    // a-rows; move kb 101 off b; insert a second d-row for kc 8; delete
    // the kc 7 d-row (wiping every path through it)
    val aDelta = Seq((2L, 20L, 1), (1L, 10L, -1)).toDF("ka", "grp", "sign")
    val bDelta = Seq((1L, 101L, -1), (2L, 103L, 1)).toDF("ka", "kb", "sign")
    val cDelta = Seq((103L, 8L, 1), (100L, 7L, -1)).toDF("kb", "kc", "sign")
    val dDelta = Seq((8L, 4L, 1), (7L, 5L, -1)).toDF("kc", "value", "sign")

    def signedFinal(old: org.apache.spark.sql.DataFrame,
        delta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // apply signed multiset delta exactly: +1 adds a row, -1 removes one
      val cols = old.columns.map(col).toSeq
      val counted = old.select(cols: _*).withColumn("sign", lit(1))
        .unionByName(delta).groupBy(cols: _*).agg(sum($"sign").as("m"))
        .where($"m" > 0)
      counted.select(cols :+ explode(
        org.apache.spark.sql.functions.sequence(lit(1L), $"m")).as("__i"): _*)
        .drop("__i").select(cols: _*)
    }
    val expected = signedFinal(aOld, aDelta)
      .join(signedFinal(bOld, bDelta), Seq("ka"))
      .join(signedFinal(cOld, cDelta), Seq("kb"))
      .join(signedFinal(dOld, dDelta), Seq("kc"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value").cast("double").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val view = aOld.join(bOld, Seq("ka")).join(cOld, Seq("kb")).join(dOld, Seq("kc"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value").cast("double").as("total"))
    val got = Storage.mergeJoinViewNDelta(view,
        Seq(aOld, bOld, cOld, dOld), Seq(aDelta, bDelta, cDelta, dDelta),
        Seq("ka", "kb", "kc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"got $got expected $expected")
  }

  test("mergeJoinViewNDelta at arity 2 matches mergeJoinViewDelta row for row") {
    import graft.sources.Storage
    val aOld = Seq((1L, 10L), (2L, 20L), (2L, 20L)).toDF("key", "grp")
      .withColumnRenamed("key", "k0")
    val bOld = Seq((1L, 5L), (2L, 6L), (2L, 7L)).toDF("key", "value")
      .withColumnRenamed("key", "k0")
    val aDelta = Seq((1L, 10L, -1), (3L, 30L, 1)).toDF("k0", "grp", "sign")
    val bDelta = Seq((3L, 9L, 1), (2L, 6L, -1)).toDF("k0", "value", "sign")
    val view = aOld.join(bOld, Seq("k0"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value").cast("double").as("total"))
    val viaN = Storage.mergeJoinViewNDelta(view, Seq(aOld, bOld),
        Seq(aDelta, bDelta), Seq("k0"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val via2 = Storage.mergeJoinViewDelta(view,
        aOld.withColumnRenamed("k0", "key"), bOld.withColumnRenamed("k0", "key"),
        aDelta.withColumnRenamed("k0", "key"), bDelta.withColumnRenamed("k0", "key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaN == via2, s"N-way $viaN vs 2-way $via2")
  }

  test("IngestComponents folds streamed edges into CC labels: two-batch == from-scratch, " +
      "redelivery is a no-op (labels are a function of the edge-set union), singletons persist") {
    val ts = Seq("r14_cc_labels", "r14_cc_labels__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("node", "component")
        .withColumn("bkt", pmod(hash($"component"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r14_cc_labels")
      val handler = new graft.streaming.IngestComponents("r14_cc_labels", buckets = 4)
      // batch 1: {1-2}, {3-4}, and 9 as a... 9 only appears via self-edge
      // later; components after b1: {1,2}, {3,4}
      handler(Seq((1L, 2L), (3L, 4L)).toDF("src", "dst"), 0L)
      def labels(): Set[(Long, Long)] = spark.table("r14_cc_labels")
        .select($"node", $"component")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(labels() == Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)), labels().toString)
      // batch 2 bridges {1,2} and {3,4} via (2,3), and adds {7,8}
      handler(Seq((2L, 3L), (7L, 8L)).toDF("src", "dst"), 1L)
      val after2 = Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (7L, 7L), (8L, 7L))
      assert(labels() == after2, labels().toString)
      // redelivered batch 2: idempotent — same labeling, byte-identical
      handler(Seq((2L, 3L), (7L, 8L)).toDF("src", "dst"), 1L)
      assert(labels() == after2, labels().toString)
      // a batch not touching {7,8}: that SINGLETON component's root pair
      // persists via the anti-join carry, and from-scratch equivalence
      // holds over the union of all edges
      handler(Seq((4L, 5L)).toDF("src", "dst"), 2L)
      val scratch = graft.graphs.Graphs.connectedComponents(
          Seq((1L, 2L), (3L, 4L), (2L, 3L), (7L, 8L), (4L, 5L)).toDF("src", "dst"),
          col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(labels() == scratch, s"${labels()} vs $scratch")
    } finally dropAll(ts)
  }

  test("IngestJoinViewN (4 sides): replay-guarded view, drained-view sentinel, and the " +
      "full-base id-reuse probe — the IvmMaintenance contract on the generalized maintainer") {
    val ts = Seq("r14_jn_a", "r14_jn_b", "r14_jn_c", "r14_jn_d", "r14_jn_view") ++
      Seq("r14_jn_a", "r14_jn_b", "r14_jn_c", "r14_jn_d", "r14_jn_view").map(_ + "__staging")
    dropAll(ts)
    try {
      // one full chain: a(1)→b(10)→c(100)→d(1000), value 5
      val a = Seq((1L, 1L, 77L)).toDF("row_id", "ka", "grp")
      val b = Seq((10L, 1L, 2L)).toDF("row_id", "ka", "kb")
      val c = Seq((100L, 2L, 3L)).toDF("row_id", "kb", "kc")
      val dd = Seq((1000L, 3L, 5L)).toDF("row_id", "kc", "value")
      def boot(df: org.apache.spark.sql.DataFrame, t: String, k: String): Unit =
        df.withColumn("bkt", pmod(hash(col(k)), lit(4)))
          .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet").saveAsTable(t)
      boot(a, "r14_jn_a", "ka"); boot(b, "r14_jn_b", "ka")
      boot(c, "r14_jn_c", "kb"); boot(dd, "r14_jn_d", "kc")
      Seq((77L, 1L, 5.0)).toDF("grp", "n", "total").withColumn("__batch", lit(-1L))
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r14_jn_view")
      val handler = new graft.streaming.IngestJoinViewN(
        Seq("r14_jn_a", "r14_jn_b", "r14_jn_c", "r14_jn_d"), "r14_jn_view",
        Seq("ka", "kb", "kc"), 4)
      def chg(side: String, rowId: Long, ka: Long, kb: Long, kc: Long, grp: Long,
          value: Long, op: String) = (side, rowId, ka, kb, kc, grp, value, op)
      val cols = Seq("side", "row_id", "ka", "kb", "kc", "grp", "value", "op")
      // batch 0 DRAINS the view (delete the only a-row)
      val drain = Seq(chg("0", 1L, 0L, 0L, 0L, 0L, 0L, "delete"))
        .toDF(cols: _*)
      handler(drain, 0L)
      val view = () => spark.table("r14_jn_view")
      assert(view().where($"n".isNotNull).isEmpty)
      // sentinel kept the watermark — redelivery must skip the math
      assert(view().agg(max($"__batch")).head().getLong(0) == 0L)
      handler(drain, 0L)
      assert(view().where($"n".isNotNull).isEmpty)
      // batch 1 re-inserts the a-row: the view returns
      handler(Seq(chg("0", 1L, 1L, 0L, 0L, 77L, 0L, "insert")).toDF(cols: _*), 1L)
      val rows = view().where($"n".isNotNull)
        .select($"grp", $"n", $"total".cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((77L, 1L, 5L)), rows.toString)
      // batch 2: reusing d-side live id 1000 under a DIFFERENT kc (hence
      // a different bucket) throws — the full-base probe
      val reuse = Seq(chg("3", 1000L, 0L, 0L, 9L, 0L, 6L, "insert")).toDF(cols: _*)
      val e = intercept[IllegalStateException](handler(reuse, 2L))
      assert(e.getMessage.contains("already live"), e.getMessage)
    } finally dropAll(ts)
  }

  test("cusum equals the direct max(0, S + x - target - k) recurrence (the prefix-min " +
      "identity), and the default target is the key's own series mean") {
    import graft.operators.TimeSeries
    val xs = Seq(50.0, 80.0, 90.0, 10.0, 70.0, 200.0, 5.0, 65.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("g", "i", "v")
      .unionByName(Seq(("z", 0L, 100.0), ("z", 1L, 0.0)).toDF("g", "i", "v"))
    def direct(vs: Seq[Double], target: Double, k: Double): Seq[Double] =
      vs.scanLeft(0.0)((s, x) => math.max(0.0, s + x - target - k)).tail
    val got = TimeSeries.cusum(df, $"g", $"i", $"i", $"v", slack = 5.0, target = Some(60.0))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(3))).toMap
    val want = direct(xs, 60.0, 5.0)
    xs.indices.foreach { i =>
      assert(math.abs(got(("k", i.toLong)) - want(i)) < 1e-9,
        s"i=$i got ${got(("k", i.toLong))} want ${want(i)}")
    }
    // per-key mean default: key z's mean is 50 — its series centers itself
    val gz = TimeSeries.cusum(df.where($"g" === "z"), $"g", $"i", $"i", $"v", slack = 0.0)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    val wantZ = direct(Seq(100.0, 0.0), 50.0, 0.0)
    assert(math.abs(gz(0L) - wantZ(0)) < 1e-9 && math.abs(gz(1L) - wantZ(1)) < 1e-9,
      gz.toString)
  }

  test("cusumTWS carries the recurrence across batches and sorts within each batch: " +
      "shuffled in-batch arrival, exact agreement with the direct fold") {
    import graft.streaming.StreamingFlows
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // (key, order, tie, value): batch 1 = orders 0..3 SHUFFLED, batch 2 = 4..6
      val series = Seq(10.0, 90.0, 120.0, 5.0, 60.0, 200.0, 1.0)
      val rows = series.zipWithIndex.map { case (v, i) => ("k", i.toLong, i.toLong, v) }
      val in = MemoryStream[(String, Long, Long, Double)]
      val out = StreamingFlows.cusumTWS[(String, Long, Long, Double), String](
        _._1, r => (r._2, r._3), _._4, target = 50.0, slack = 0.0).apply(in.toDS())
      val q = out.toDF("k", "tie", "score")
        .writeStream.format("memory").queryName("r14_cusum_tws").outputMode("append").start()
      try {
        in.addData(Seq(rows(2), rows(0), rows(3), rows(1)))
        q.processAllAvailable()
        in.addData(Seq(rows(5), rows(4), rows(6)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("r14_cusum_tws")
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
      val want = series.scanLeft(0.0)((s, x) => math.max(0.0, s + x - 50.0)).tail
      series.indices.foreach { i =>
        assert(math.abs(got(i.toLong) - want(i)) < 1e-12, s"i=$i ${got(i.toLong)} vs ${want(i)}")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("IngestMsf: three-batch streamed forest is row-identical to the from-scratch MSF " +
      "(sparsification identity under the strict total order); redelivery is a no-op") {
    val ts = Seq("r14_msf_forest", "r14_msf_forest__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long, Long)].toDF("u", "v", "w")
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r14_msf_forest")
      // a 120-node multigraph with deterministic pseudo-random weights and
      // some parallel edges; 3 batches by edge index mod 3
      val edges = (0 until 600).map { i =>
        val u = (i * 37) % 120L
        val v = (i * 53 + 7) % 120L
        (math.min(u, v), math.max(u, v), (i * 7919) % 1000L)
      }.filter(e => e._1 != e._2)
      val handler = new graft.streaming.IngestMsf("r14_msf_forest")
      (0 until 3).foreach { b =>
        val batch = edges.zipWithIndex.collect { case (e, i) if i % 3 == b => e }
        handler(batch.toDF("u", "v", "w"), b.toLong)
      }
      def forest(): Set[(Long, Long, Long)] = spark.table("r14_msf_forest")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val scratch = graft.graphs.Graphs.minimumSpanningForest(
          edges.toDF("u", "v", "w"), col("u"), col("v"), col("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(forest() == scratch, s"streamed ${forest().size} vs scratch ${scratch.size}")
      // redeliver batch 2: the union is unchanged, so the forest must be too
      val batch2 = edges.zipWithIndex.collect { case (e, i) if i % 3 == 2 => e }
      handler(batch2.toDF("u", "v", "w"), 2L)
      assert(forest() == scratch)
    } finally dropAll(ts)
  }

  test("IngestTriangles: streamed count equals the from-scratch triple enumeration, " +
      "same-batch multi-new-edge triangles count ONCE, redelivery is a no-op") {
    val ts = Seq("r14_tri_edges", "r14_tri_count",
      "r14_tri_edges__staging", "r14_tri_count__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r14_tri_edges")
      Seq((0L, -1L)).toDF("n_triangles", "__batch")
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r14_tri_count")
      val handler = new graft.streaming.IngestTriangles("r14_tri_edges", "r14_tri_count")
      def count(): Long = spark.table("r14_tri_count")
        .where($"n_triangles".isNotNull).head().getLong(0)
      // batch 0: a COMPLETE triangle arrives in one batch (all three edges
      // new — found once per new edge, must count once), plus a dangling edge
      handler(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v"), 0L)
      assert(count() == 1L, s"got ${count()}")
      // batch 1: closes TWO triangles with one new edge (2-4 closes 2-3-4;
      // 1-4 closes 1-3-4 and with 2-4 also 1-2-4)
      handler(Seq((2L, 4L), (1L, 4L)).toDF("u", "v"), 1L)
      assert(count() == 4L, s"got ${count()}")
      // redelivery: replay guard skips the math, count unchanged
      handler(Seq((2L, 4L), (1L, 4L)).toDF("u", "v"), 1L)
      assert(count() == 4L, s"got ${count()}")
      // random-graph equivalence: 3 more batches vs from-scratch triple count
      val more = (0 until 300).map { i =>
        (math.min((i * 37) % 40L, (i * 53 + 7) % 40L),
          math.max((i * 37) % 40L, (i * 53 + 7) % 40L))
      }.filter(e => e._1 != e._2).distinct
      (0 until 3).foreach { b =>
        val batch = more.zipWithIndex.collect { case (e, i) if i % 3 == b => e }
        handler(batch.toDF("u", "v"), (b + 2).toLong)
      }
      val allEdges = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (1L, 4L)) ++
        more).distinct
      val e = allEdges.toDF("u", "v")
      val scratch = e.as("e1")
        .join(e.as("e2"), col("e2.u") === col("e1.u") && col("e2.v") > col("e1.v"))
        .join(e.as("e3"), col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
        .count()
      assert(count() == scratch, s"streamed ${count()} vs scratch $scratch")
    } finally dropAll(ts)
  }

  test("IngestTrianglesCdc: two-probe identity handles destroy-by-delete, the same-batch " +
      "lose-one-gain-one cancel, double-delete subtract-once; same-edge insert+delete throws") {
    val ts = Seq("r14_tcdc_edges", "r14_tcdc_count",
      "r14_tcdc_edges__staging", "r14_tcdc_count__staging")
    dropAll(ts)
    try {
      Seq.empty[(Long, Long)].toDF("u", "v")
        .withColumn("bkt", pmod(hash($"u"), lit(4)))
        .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
        .saveAsTable("r14_tcdc_edges")
      Seq((0L, -1L)).toDF("n_triangles", "__batch")
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable("r14_tcdc_count")
      val handler = new graft.streaming.IngestTrianglesCdc(
        "r14_tcdc_edges", "r14_tcdc_count", 4)
      def count(): Long = spark.table("r14_tcdc_count")
        .where($"n_triangles".isNotNull).head().getLong(0)
      def b(rows: (Long, Long, String)*) = rows.toDF("u", "v", "op")
      // two triangles sharing edge 1-2: {1,2,3} and {1,2,4}
      handler(b((1L, 2L, "insert"), (2L, 3L, "insert"), (1L, 3L, "insert"),
        (2L, 4L, "insert"), (1L, 4L, "insert")), 0L)
      assert(count() == 2L, s"got ${count()}")
      // lose-one-gain-one in ONE batch: delete 1-3 (kills {1,2,3}), insert
      // 3-4 (creates {2,3,4}? needs 2-3,2-4 — yes; and {1,3,4}? needs 1-3
      // gone — no). Net: -1 +1 = 0... plus {3,4,x}: 3-4 with 2-3/2-4 →
      // {2,3,4} gained. So count stays 2.
      handler(b((1L, 3L, "delete"), (3L, 4L, "insert")), 1L)
      assert(count() == 2L, s"got ${count()}")
      // double-delete of {1,2,4}'s two edges in one batch: subtract ONCE
      // (also kills {2,3,4} via 2-4: total -2)
      handler(b((1L, 4L, "delete"), (2L, 4L, "delete")), 2L)
      assert(count() == 0L, s"got ${count()}")
      // redelivery: no-op (guard + idempotent store)
      handler(b((1L, 4L, "delete"), (2L, 4L, "delete")), 2L)
      assert(count() == 0L, s"got ${count()}")
      // same-edge insert+delete in one batch is refused loudly
      val e = intercept[IllegalStateException](
        handler(b((5L, 6L, "insert"), (5L, 6L, "delete")), 3L))
      assert(e.getMessage.contains("inserts AND deletes the same edge"), e.getMessage)
      // surviving edges: 1-2, 2-3, 3-4 — a path, zero triangles; sanity
      // vs from-scratch on the store
      val stored = spark.table("r14_tcdc_edges").select($"u", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored == Set((1L, 2L), (2L, 3L), (3L, 4L)), stored.toString)
    } finally dropAll(ts)
  }

  test("columnProfile counts -0.0 and 0.0 as ONE distinct value (matching " +
      "count(DISTINCT col) semantics), NaN as one") {
    import graft.curation.Audit
    val df = Seq(-0.0, 0.0, 1.0, Double.NaN, Double.NaN).toDF("x")
    val row = Audit.columnProfile(df, Seq("x")).head()
    val nDistinct = row.getAs[Long]("n_distinct")
    assert(nDistinct == 3L, s"expected 3 (0.0, 1.0, NaN), got $nDistinct")
  }
}
