package graft

import org.apache.spark.sql.functions._

/** Round-11 hardening: the IngestAggView emptied-bucket drop, the
  * batch-collision contract shared by [[graft.sources.Storage.mergeAggDelta]]
  * and [[graft.streaming.IngestAggView]], and personalizedPageRank's
  * teleport normalization over seeds ∩ nodes.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  test("IngestAggView: a bucket fully emptied by deletes is dropped — no resurrected rows, " +
      "view key leaves, and a later insert re-creates the bucket") {
    val baseT = "graft_r11_aggv_empty_base"
    val viewT = "graft_r11_aggv_empty_view"
    val all = Seq(baseT, s"${baseT}__staging", viewT, s"${viewT}__staging")
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      // single key => exactly one populated bucket; the batch deletes every
      // row of it, so the rebuilt staging data contains NO row for that
      // bucket and dynamic overwrite alone would leave the stale files
      val base = (0L until 5L).map(i => (i, 3L, (i + 1).toDouble)).toDF("row_id", "key", "value")
      base.withColumn("bkt", pmod(hash($"key"), lit(4)))
        .write.partitionBy("bkt").format("parquet").saveAsTable(baseT)
      base.groupBy($"key")
        .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))
        .withColumn("__batch", lit(-1L))
        .write.format("parquet").saveAsTable(viewT)

      val loop = new graft.streaming.IngestAggView("row_id", "key", "value", baseT, viewT, 4)
      loop((0L until 5L).map(i => (i, 3L, 0.0, "delete")).toDF("row_id", "key", "value", "op"), 0L)

      assert(spark.table(baseT).count() == 0,
        "emptied bucket must be dropped — stale base rows resurrected")
      assert(spark.table(viewT).where($"key" === 3L).isEmpty, "fully-deleted key must leave the view")

      // the dropped partition is re-creatable: a later insert to the same
      // bucket lands and the view re-enters through the normal delta path
      loop(Seq((100L, 3L, 9.0, "insert")).toDF("row_id", "key", "value", "op"), 1L)
      assert(spark.table(baseT).collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
        == Set((100L, 9.0)))
      val v = spark.table(viewT).where($"key" === 3L)
        .select($"n", $"total", $"mx").collect()
      assert(v.length == 1 && v(0) == org.apache.spark.sql.Row(1L, 9.0, 9.0))
    } finally all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("batch collision contract: a rowId in both inserts and deleteIds is a REPLACE, " +
      "and view and base stay consistent under both collision shapes") {
    import graft.sources.Storage
    // base: key 1 holds rows 0 (value 10, the max) and 1 (value 4)
    val base = Seq((0L, 1L, 10.0), (1L, 1L, 4.0)).toDF("row_id", "key", "value")
    val state = base.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))
    // delete-then-reinsert of row 0 (replace 10 -> 6) AND insert-then-delete
    // of never-stored row 7 (value 99) in the SAME batch
    val inserts = Seq((0L, 1L, 6.0), (7L, 1L, 99.0)).toDF("row_id", "key", "value")
    val deleteIds = Seq(0L, 7L).toDF("row_id")

    val got = Storage.mergeAggDelta(state, base, inserts, deleteIds, "row_id", "key", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // insert wins on both collisions: surviving multiset = {6, 4, 99}
    assert(got.toSeq == Seq((1L, 3L, 109.0, 99.0)), got.mkString(","))

    // IngestAggView's base rebuild implements the SAME rule — run the full
    // loop on identical data and assert base content equals the view's model
    val baseT = "graft_r11_collide_base"
    val viewT = "graft_r11_collide_view"
    val all = Seq(baseT, s"${baseT}__staging", viewT, s"${viewT}__staging")
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      base.withColumn("bkt", pmod(hash($"key"), lit(4)))
        .write.partitionBy("bkt").format("parquet").saveAsTable(baseT)
      state.withColumn("__batch", lit(-1L)).write.format("parquet").saveAsTable(viewT)
      val loop = new graft.streaming.IngestAggView("row_id", "key", "value", baseT, viewT, 4)
      loop(Seq((0L, 1L, 6.0, "insert"), (7L, 1L, 99.0, "insert"),
          (0L, 1L, 0.0, "delete"), (7L, 1L, 0.0, "delete"))
        .toDF("row_id", "key", "value", "op"), 0L)

      val baseNow = spark.table(baseT).select($"row_id", $"value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(baseNow == Set((0L, 6.0), (1L, 4.0), (7L, 99.0)), s"base: $baseNow")
      val viewNow = spark.table(viewT).where($"n".isNotNull) // drop watermark sentinel
        .select($"key", $"n", $"total", $"mx").collect()
      assert(viewNow.length == 1 && viewNow(0) == org.apache.spark.sql.Row(1L, 3L, 109.0, 99.0),
        s"view: ${viewNow.mkString}")
    } finally all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("personalizedPageRank: seeds absent from the node set carry no teleport mass — " +
      "normalization uses seeds ∩ nodes, so ranks match the intersected seed set exactly") {
    import graft.graphs.Graphs
    val nodes = (1L to 6L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    val phantom = Seq(1L, 4L, 999L, -7L).toDF("seed") // 999, -7 not in nodes
    val real = Seq(1L, 4L).toDF("seed")

    def run(sd: org.apache.spark.sql.DataFrame) =
      Graphs.personalizedPageRank(nodes, $"node", edges, $"src", $"dst",
          sd, $"seed", iters = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val got = run(phantom)
    assert(got == run(real), "phantom seeds must not dilute the teleport vector")
    // with Σt = 1 restored, total rank stays ~1 (grid rounding aside)
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"rank mass leaked: ${got.values.sum}")

    // no seed present at all => loud failure, not a silent all-zero result
    val boom = intercept[IllegalArgumentException] {
      run(Seq(999L).toDF("seed"))
    }
    assert(boom.getMessage.contains("no seed is present"))
  }

  test("pageRank convergeEarly: bit-identical to fixed iters once the grid fixes, " +
      "and it actually skips the dead rounds (fewer Spark jobs)") {
    import graft.graphs.Graphs
    // coarse grid (scale 3) so the rank vector fixes well before 20 rounds
    val nodes = (1L to 5L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (5L, 1L))
      .toDF("src", "dst")
    def run(early: Boolean) =
      Graphs.pageRank(nodes, $"node", edges, $"src", $"dst",
          iters = 20, scale = 3, convergeEarly = early)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.incrementAndGet()
    }
    def countJobs(f: => Map[Long, Double]): (Map[Long, Double], Int) = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try { val r = f; Thread.sleep(300); (r, jobs.get()) } // drain listener bus
      finally spark.sparkContext.removeSparkListener(listener)
    }
    // whether or not the grid fixes inside 20 rounds, the option must
    // never change the answer
    val fixed = run(early = false)
    val early = run(early = true)
    assert(early == fixed, "early exit must not change the fixed-iters result")

    // a cycle graph fixes IMMEDIATELY (uniform rank is the fixed point):
    // 40 requested rounds must cost ~1 round of jobs, and a fixed-iters
    // run of the same request must cost many times more
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def runCycle(earlyOpt: Boolean) = countJobs {
      Graphs.pageRank((1L to 3L).toDF("node"), $"node", cyc, $"src", $"dst",
          iters = 40, scale = 7, convergeEarly = earlyOpt)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val (cycFixed, jCycFixed) = runCycle(false)
    val (cycEarly, jCycEarly) = runCycle(true)
    assert(cycEarly == cycFixed && cycEarly.values.forall(_ == 0.3333333),
      s"cycle fixed point must be uniform on the 10^-7 grid: $cycEarly")
    assert(jCycEarly * 4 < jCycFixed,
      s"convergeEarly must exit after the first no-op round ($jCycEarly vs $jCycFixed jobs)")
  }

  test("triangleAnalysis: one machinery build feeds BOTH readouts; separate calls pay two; " +
      "results identical either way") {
    import graft.graphs.Graphs
    // K4 plus a pendant and a disjoint edge — triangles and 0-overlap edges
    val raw = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (8L, 9L))
    // the edge relation carries an evaluation counter (the shared-CC spec's
    // convention): triangleMachinery materializes its canonical edges
    // exactly once per build, so the accumulator counts machinery builds
    val acc = spark.sparkContext.longAccumulator("edgeEvals")
    val edges = raw.toDF("a", "b").repartition(1).as[(Long, Long)]
      .mapPartitions { it => acc.add(1); it }.toDF("a", "b")

    acc.reset()
    val viaSeparateCounts = Graphs.triangleCounts(edges, $"a", $"b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSeparateJacc = Graphs.edgeJaccard(edges, $"a", $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(acc.value == 2, "each separate consumer pays its own machinery build")

    acc.reset()
    val (tc, ej) = Graphs.triangleAnalysis(edges, $"a", $"b")
    val sharedCounts = tc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sharedJacc = ej.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(acc.value == 1, "triangleAnalysis must build the machinery exactly once")

    assert(sharedCounts == viaSeparateCounts && sharedJacc == viaSeparateJacc)
    // K4: every vertex in C(3,2)=3 triangles; pendant/disjoint edges absent
    assert(sharedCounts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(sharedJacc((8L, 9L)) == ((0L, 0.0)))
  }

  test("triangle Bloom prefilter: FORCED filter returns exactly the unfiltered result — " +
      "no false negatives — on a graph with hubs, isolated triangles, and open wedges") {
    import graft.graphs.Graphs
    // hub star with two rim edges (each closes a hub triangle), K4, a
    // separate triangle, many open wedges
    val edges = (Seq.tabulate(12)(i => (100L, 200L + i)) ++
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (50L, 51L), (51L, 52L), (52L, 50L), (200L, 201L), (202L, 203L)))
      .toDF("a", "b")
    def counts(mode: String): Map[Long, Long] = {
      val prev = System.getProperty("graft.triangles.bloom")
      try {
        System.setProperty("graft.triangles.bloom", mode)
        Graphs.triangleCounts(edges, $"a", $"b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally {
        if (prev == null) System.clearProperty("graft.triangles.bloom")
        else System.setProperty("graft.triangles.bloom", prev)
      }
    }
    val forced = counts("force")
    val off = counts("off")
    assert(forced == off, s"prefilter changed the result: $forced vs $off")
    assert(forced == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      50L -> 1L, 51L -> 1L, 52L -> 1L, 100L -> 2L,
      200L -> 1L, 201L -> 1L, 202L -> 1L, 203L -> 1L), forced.toString)
  }

  test("frameAHash: declarative codegen pipeline is row-identical to the mapPartitions " +
      "reference — real payloads, null/empty payloads, short tails, everyK strides") {
    import graft.multimodal.Multimodal
    // payloads spanning the edges: multi-frame, exactly one frame, shorter
    // than 48 pixels, empty, null; bytes cover the signed range
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      1L -> Array.tabulate(1300)(i => ((i * 37 + 11) % 256 - 128).toByte),
      2L -> Array.tabulate(256)(i => (i - 128).toByte),
      3L -> Array.tabulate(17)(i => (i * 29).toByte),
      4L -> Array.empty[Byte],
      5L -> null
    )
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map(p => org.apache.spark.sql.Row(p._1, p._2))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType, true))))
    for ((fb, k) <- Seq((256, 1), (256, 2), (64, 3), (1024, 1))) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val got = rows(Multimodal.frameAHash(media, fb, k))
      val want = rows(Multimodal.frameAHashRdd(media, fb, k))
      assert(got == want, s"frameBytes=$fb everyK=$k: $got vs $want")
      assert(got.nonEmpty)
    }
  }
}
