package graft

import graft.graphs.Graphs
import org.apache.spark.sql.functions._

/** Round-10 additions: TrustRank, edge Jaccard, and the streaming
  * aggregate-view loop ([[graft.streaming.IngestAggView]]).
  */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  private def pseudoGraph(n: Int, perNode: Int): Seq[(Long, Long)] =
    (for {
      i <- 0 until n
      j <- 0 until perNode
      d = (i * 7 + j * 13 + 5) % n
      if d != i
    } yield (i.toLong, d.toLong)).distinct

  test("personalizedPageRank: matches a driver-side reference; unreachable nodes hold 0; " +
      "teleport+dangling mass returns to seeds") {
    val es = pseudoGraph(30, 2) :+ (28L -> 29L)
    val nodes = (0L until 32L).toSeq // 30,31 isolated AND non-seed → rank 0
    val seeds = Seq(0L, 5L, 10L)
    val got = Graphs.personalizedPageRank(
      nodes.toDF("node"), $"node", es.toDF("src", "dst"), $"src", $"dst",
      seeds.toDF("node"), $"node", iters = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    def rnd(x: Double) = math.round(x * 1e7) / 1e7
    val out = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    val t = nodes.map(v => v -> (if (seeds.contains(v)) 1.0 / seeds.size else 0.0)).toMap
    var rank = nodes.map(v => v -> rnd(t(v))).toMap
    for (_ <- 1 to 6) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      rank = nodes.map { v =>
        val inflow = es.filter(_._2 == v).map { case (s, _) => rank(s) / out(s).size }.sum
        v -> rnd(0.15 * t(v) + 0.85 * (inflow + t(v) * dangling))
      }.toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v)) < 2e-7, s"node $v: got ${got(v)}, want ${rank(v)}")
    }
    assert(got(30L) == 0.0 && got(31L) == 0.0, "isolated non-seeds carry zero trust")
    assert(seeds.forall(s => got(s) >= 0.15 / 3 - 1e-9), "seeds keep the teleport floor")
  }

  test("edgeJaccard: exact counts and jaccard vs brute force; noise (dups, reversals, " +
      "self-loops) ignored; zero-common and degenerate edges report 0") {
    val base = pseudoGraph(20, 3) ++ Seq((100L, 101L)) // an isolated K2: (deg-1)+(deg-1)=0
    val noisy = base ++ base.take(7).map(_.swap) ++ Seq((4L, 4L))
    val got = Graphs.edgeJaccard(noisy.toDF("src", "dst"), $"src", $"dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    val und = base.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct.toSet
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val want = und.map { case (a, b) =>
      val common = (nbrs(a) & nbrs(b)).size.toLong
      val denom = (nbrs(a).size - 1) + (nbrs(b).size - 1) - common
      val j = if (denom > 0) math.round(common.toDouble / denom * 1e4) / 1e4 else 0.0
      (a, b) -> ((common, j))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
    assert(got((100L, 101L)) == ((0L, 0.0)), "degenerate K2 edge reports 0")
  }

  test("IngestAggView: redelivered batches are no-ops (view guard, idempotent base rebuild); " +
      "a crash between view swap and base rebuild heals on replay") {
    val baseT = "graft_r10b_aggv_base"
    val viewT = "graft_r10b_aggv_view"
    val all = Seq(baseT, s"${baseT}__staging", viewT, s"${viewT}__staging")
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val base = (0L until 100L).map(i => (i, i % 7, (i % 13 + 1).toDouble))
        .toDF("row_id", "key", "value")
      base.withColumn("bkt", pmod(hash($"key"), lit(4)))
        .write.partitionBy("bkt").format("parquet").saveAsTable(baseT)
      base.groupBy($"key")
        .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))
        .withColumn("__batch", lit(-1L))
        .write.format("parquet").saveAsTable(viewT)

      val loop = new graft.streaming.IngestAggView("row_id", "key", "value", baseT, viewT, 4)
      val b1 = Seq((200L, 3L, 99.0, "insert"), (14L, 0L, 0.0, "delete"))
        .toDF("row_id", "key", "value", "op")
      loop(b1, 0L)

      def viewNow() = spark.table(viewT).where($"n".isNotNull) // drop watermark sentinel
        .select($"key", $"n", round($"total", 6).as("t"), $"mx")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      def expect(rows: org.apache.spark.sql.DataFrame) = rows.groupBy($"key")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 6).as("t"), max($"value").as("mx"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet

      val after1 = base.where($"row_id" =!= 14L)
        .unionByName(Seq((200L, 3L, 99.0)).toDF("row_id", "key", "value"))
      assert(viewNow() == expect(after1), "batch 0 applied")

      // at-least-once redelivery of the SAME batch: view guard skips the
      // non-idempotent delta math; base rebuild re-runs harmlessly
      loop(b1, 0L)
      assert(viewNow() == expect(after1), "redelivery must be a no-op")
      assert(spark.table(baseT).count() == 100, "base rebuild idempotent")

      // crash shape: batch 1's VIEW committed (with its __batch stamp),
      // process died before the base rebuild — replay must skip the view
      // and heal the base
      val b2 = Seq((201L, 5L, 50.0, "insert"), (21L, 0L, 0.0, "delete"))
        .toDF("row_id", "key", "value", "op")
      val viewAfter2 = graft.sources.Storage.mergeAggDelta(
          spark.table(viewT).where($"n".isNotNull).drop("__batch"), spark.table(baseT),
          b2.where($"op" === "insert").select($"row_id", $"key", $"value"),
          b2.where($"op" === "delete").select($"row_id"),
          "row_id", "key", "value")
        .withColumn("__batch", lit(1L))
      viewAfter2.write.mode("overwrite").format("parquet").saveAsTable(s"${viewT}__staging")
      spark.table(s"${viewT}__staging")
        .write.mode("overwrite").format("parquet").saveAsTable(viewT)
      spark.sql(s"REFRESH TABLE $viewT")
      assert(spark.table(baseT).count() == 100, "base is stale — crash point")

      loop(b2, 1L) // redelivery after restart
      val after2 = after1.where($"row_id" =!= 21L)
        .unionByName(Seq((201L, 5L, 50.0)).toDF("row_id", "key", "value"))
      assert(viewNow() == expect(after2), "crash replay converged")
      assert(spark.table(baseT).count() == 100, "base healed: -1 delete +1 insert")
      assert(spark.table(baseT).where($"row_id" === 21L).isEmpty)
    } finally all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("leaveOneOutAblation: hand-checked algebra; a whole-corpus group reports null rest") {
    import graft.curation.Corpus
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 40.0), ("b", 60.0), ("b", 50.0))
      .toDF("src", "m")
    val got = Corpus.leaveOneOutAblation(df, $"src", $"m")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // a: in 15, rest (40+60+50)/3 = 50, delta -35; b: in 50, rest 15, delta 35
    assert(got("a") == ((2L, 15.0, 50.0, -35.0)), got.toString)
    assert(got("b") == ((3L, 50.0, 15.0, 35.0)), got.toString)

    val solo = Corpus.leaveOneOutAblation(Seq(("only", 7.0)).toDF("src", "m"), $"src", $"m")
      .collect()(0)
    assert(solo.isNullAt(3) && solo.isNullAt(4), "whole-corpus group has no rest")
  }

  test("kCenter: farthest-point selections match a driver reference; seed is the smallest id; " +
      "selection distances are non-increasing is NOT required but spread is maximal on a line") {
    import graft.similarity.Clustering
    // points on a line: 0, 1, 2, ..., 9, 100 — seed id 0 at x=0; first pick
    // must be x=100, second x≈ the midpoint farthest from {0,100} = 9? no:
    // min-dist to {0,100} maximized at x=9? d(9)=81 vs others smaller? x=5:
    // min(25, 9025)=25; x=9: min(81, 8281)=81 → pick 9; then x=4 or 5...
    val pts = ((0 until 10).map(i => (i.toLong, Array(i.toDouble))) :+ (10L, Array(100.0)))
    val got = Clustering.kCenter(pts.toDF("id", "v"), $"id", $"v", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) == ((0, 0L, 0.0)))
    assert(got(1)._2 == 10L && got(1)._3 == 10000.0)
    assert(got(2)._2 == 9L && got(2)._3 == 81.0)

    // driver reference on pseudo-random vectors
    val dim = 5
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 11 + j * 17) % 19).toDouble / 3.0)))
    val eng = Clustering.kCenter(rows.toDF("id", "v"), $"id", $"v", k = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    def g6(x: Double) = math.round(x * 1e6) / 1e6
    def d2(a: Array[Double], b: Array[Double]) =
      g6(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    var centers = Vector(rows.minBy(_._1))
    var want = Vector((0, rows.head._1, 0.0))
    var mind = rows.map(p => p._1 -> d2(p._2, centers.head._2)).toMap
    for (r <- 1 until 6) {
      val pick = rows.map(p => (p._1, mind(p._1))).maxBy { case (i, dd) => (dd, -i) }
      val pr = rows.find(_._1 == pick._1).get
      want = want :+ ((r, pick._1, pick._2))
      centers = centers :+ pr
      mind = rows.map(p => p._1 -> math.min(mind(p._1), d2(p._2, pr._2))).toMap
    }
    assert(eng == want, s"got $eng\nwant $want")
  }

  test("IngestAggView: untouched base buckets keep their exact file set") {
    val baseT = "graft_r10b_aggv_files"
    val viewT = "graft_r10b_aggv_files_view"
    val all = Seq(baseT, s"${baseT}__staging", viewT, s"${viewT}__staging")
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val base = (0L until 40L).map(i => (i, i % 8, 1.0)).toDF("row_id", "key", "value")
      base.withColumn("bkt", pmod(hash($"key"), lit(4)))
        .write.partitionBy("bkt").format("parquet").saveAsTable(baseT)
      base.groupBy($"key")
        .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))
        .withColumn("__batch", lit(-1L))
        .write.format("parquet").saveAsTable(viewT)

      def loc = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(baseT))
        .location.getPath
      def filesOf(bkt: Int): Set[(String, Long)] = {
        val dir = new java.io.File(loc, s"bkt=$bkt")
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet
      }
      val touchedBkt = spark.range(1).select(pmod(hash(lit(3L)), lit(4))).head().getInt(0)
      val untouched = (0 until 4).filterNot(_ == touchedBkt)
      val before = untouched.map(b => b -> filesOf(b)).toMap

      val loop = new graft.streaming.IngestAggView("row_id", "key", "value", baseT, viewT, 4)
      loop(Seq((99L, 3L, 5.0, "insert")).toDF("row_id", "key", "value", "op"), 0L)

      untouched.foreach { b =>
        assert(filesOf(b) == before(b), s"bucket $b files must be byte-untouched")
      }
      assert(spark.table(baseT).where($"row_id" === 99L).count() == 1)
    } finally all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
