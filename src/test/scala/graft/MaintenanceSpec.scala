package graft

import graft.similarity.Clustering
import graft.sources.Storage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance ([[Storage.mergeAggDelta]]) and
  * deterministic Lloyd k-means ([[Clustering.lloyd]]).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // Pseudo-random but deterministic base rows: (row_id, key, value).
  private def baseRows(n: Int): Seq[(Long, Long, Double)] =
    (0 until n).map(i => (i.toLong, (i * 7 % 13).toLong, ((i * 31 % 97) + 1).toDouble))

  private def view(rows: DataFrame): Map[Long, (Long, Double, Double)] =
    rows.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("mergeAggDelta: matches a from-scratch re-aggregate — inserts, deletes, " +
      "max-row deletion, full-key deletion, and brand-new keys") {
    val base = baseRows(200).toDF("row_id", "key", "value")
    // Deletes include every row of key 5 (the key leaves the view) and the
    // max row of several other keys (forcing the dirty recompute to find
    // the runner-up); inserts add rows to existing keys AND key 99 (new).
    val deleteIds = base.where($"key" === 5 || $"row_id" % 11 === 0).select($"row_id")
    val inserts = Seq((1000L, 3L, 500.0), (1001L, 99L, 7.0), (1002L, 99L, 3.0))
      .toDF("row_id", "key", "value")
    val state = base.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))

    val got = Storage.mergeAggDelta(state, base, inserts, deleteIds, "row_id", "key", "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    val finalRows = base.join(deleteIds, Seq("row_id"), "left_anti").unionByName(inserts)
    val want = view(finalRows)
    assert(got.keySet == want.keySet)
    for ((k, (n, t, m)) <- want) {
      val (gn, gt, gm) = got(k)
      assert(gn == n, s"key $k count")
      assert(math.abs(gt - t) < 1e-9, s"key $k total: $gt vs $t")
      assert(gm == m, s"key $k max: $gm vs $m")
    }
    assert(!got.contains(5L), "fully-deleted key must leave the view")
    assert(got.contains(99L), "insert-only key must enter the view")
  }

  test("mergeAggDelta: insert-only batch raises max via greatest without touching the base") {
    val base = Seq((0L, 1L, 10.0), (1L, 1L, 20.0), (2L, 2L, 5.0)).toDF("row_id", "key", "value")
    val state = base.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"), max($"value").as("mx"))
    val inserts = Seq((10L, 1L, 99.0), (11L, 2L, 1.0)).toDF("row_id", "key", "value")
    val empty = Seq.empty[Long].toDF("row_id")
    val got = Storage.mergeAggDelta(state, base, inserts, empty, "row_id", "key", "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map(1L -> ((3L, 129.0, 99.0)), 2L -> ((2L, 6.0, 5.0))))
  }

  test("lloyd: separates two well-formed blobs; assignment is stable under re-run") {
    // Two tight blobs far apart; ids interleaved so the seed rows (smallest
    // ids) span both blobs.
    val pts = (0 until 40).map { i =>
      val blob = i % 2
      val base = if (blob == 0) 0.0 else 100.0
      (i.toLong, Array(base + (i % 5) * 0.1, base - (i % 3) * 0.1))
    }
    val df = pts.toDF("id", "v")
    val out = Clustering.lloyd(df, $"id", $"v", k = 2, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val c0 = pts.filter(_._1 % 2 == 0).map(p => out(p._1)).toSet
    val c1 = pts.filter(_._1 % 2 == 1).map(p => out(p._1)).toSet
    assert(c0.size == 1 && c1.size == 1 && c0 != c1,
      s"each blob must land in one cluster, got even→$c0 odd→$c1")

    val again = Clustering.lloyd(df, $"id", $"v", k = 2, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == out, "deterministic: identical re-run")
  }

  test("lloyd: matches a driver-side reference with the same grids, argmin tie-break, " +
      "and empty-cluster carry") {
    val dim = 6
    val pts = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 13 + j * 7) % 23).toDouble / 7.0))
    }
    val k = 4; val iters = 3
    val got = Clustering.lloyd(pts.toDF("id", "v"), $"id", $"v", k = k, iters = iters)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy(_._1)

    def g6(x: Double) = math.round(x * 1e6) / 1e6
    var cents = pts.sortBy(_._1).take(k).map(_._2.map(g6))
    def assign(c: Seq[Array[Double]]) = pts.map { case (id, v) =>
      val ds = c.map(cc => g6(v.zip(cc).map { case (a, b) => (a - b) * (a - b) }.sum))
      val cl = ds.zipWithIndex.minBy { case (dd, idx) => (dd, idx) }._2
      (id, cl, ds(cl))
    }
    for (_ <- 1 to iters) {
      val a = assign(cents.toSeq)
      val byC = a.groupBy(_._2)
      cents = Array.tabulate(k) { c =>
        byC.get(c) match {
          case Some(members) =>
            val vs = members.map(m => pts(m._1.toInt)._2)
            Array.tabulate(dim)(j => g6(vs.map(_(j)).sum / vs.size))
          case None => cents(c)
        }
      }
    }
    val want = assign(cents.toSeq).sortBy(_._1)
    assert(got.map(x => (x._1, x._2)).toSeq == want.map(x => (x._1, x._2)).toSeq,
      s"assignments differ:\n got=${got.toSeq}\nwant=${want.toSeq}")
    got.zip(want).foreach { case ((_, _, gd), (_, _, wd)) =>
      assert(math.abs(gd - wd) < 2e-6)
    }
  }

  test("lloyd: duplicate points tie to the lowest cluster; starved clusters keep their seed") {
    // 3 identical points, k=2: both seed centroids coincide, every point
    // ties → cluster 0; cluster 1 never gets members and keeps its seed.
    val df = Seq((0L, Array(1.0, 1.0)), (1L, Array(1.0, 1.0)), (2L, Array(1.0, 1.0)))
      .toDF("id", "v")
    val out = Clustering.lloyd(df, $"id", $"v", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.forall(_._2 == 0), out.mkString(","))
    assert(out.forall(_._3 == 0.0))
  }

  test("mergeJoinViewDelta: signed delta-join algebra — cross term stops double-removal, " +
      "both-side inserts compose, groups draining to n=0 leave the view") {
    import graft.sources.Storage
    // A: orders (key, grp); B: lines (key, value)
    val aOld = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("key", "grp")
    val bOld = Seq((1L, 5L), (1L, 7L), (2L, 11L), (3L, 13L)).toDF("key", "value")
    val view = aOld.join(bOld, Seq("key"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"value").as("total"))
    // batch: delete order 1 AND both its lines (the cross term must add
    // back what both single-side terms removed); delete order 3 (group 20
    // drains to n=0); insert order 4 (grp 30) AND its line in the same
    // batch (pure cross-term contribution); insert a line for order 2
    val aDelta = Seq((1L, 10L, -1), (3L, 20L, -1), (4L, 30L, 1)).toDF("key", "grp", "sign")
    val bDelta = Seq((1L, 5L, -1), (1L, 7L, -1), (4L, 17L, 1), (2L, 19L, 1))
      .toDF("key", "value", "sign")
    val got = Storage.mergeJoinViewDelta(view, aOld, bOld, aDelta, bDelta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: re-join the final row sets from scratch
    // A' = {2->10, 4->30}; B' = {2:[11,19], 4:[17]}
    assert(got == Set((10L, 2L, 30.0), (30L, 1L, 17.0)), got.toString)
  }

  test("gridHalfUp: negative half-ties round AWAY from zero (HALF_UP — the kernel " +
      "and oracle convention), unlike math.round's half-toward-+inf") {
    // the one-ulp divergence the two-conventions hazard produced:
    // math.round(-2.5e6)/1e6 = -2.0 (half-toward-+inf); HALF_UP = -3e-6... scaled:
    assert(Clustering.gridHalfUp(-0.0000025, 6) == -0.000003)
    assert(Clustering.gridHalfUp(0.0000025, 6) == 0.000003)
    assert(Clustering.gridHalfUp(-2.5, 0) == -3.0)
    // and the old convention really did differ on the negative tie
    assert(math.round(-2.5).toDouble == -2.0)
    // NaN/Inf pass through like the kernel and Spark's Round
    assert(Clustering.gridHalfUp(Double.NaN, 6).isNaN)
    assert(Clustering.gridHalfUp(Double.PositiveInfinity, 6).isPosInfinity)
    // same convention as Spark's Round (what the DuckDB oracle replays)
    val viaSpark = Seq((-0.0000025, 0.0000025)).toDF("a", "b")
      .select(round(col("a"), 6), round(col("b"), 6)).collect().head
    assert(viaSpark.getDouble(0) == -0.000003 && viaSpark.getDouble(1) == 0.000003)
  }
}
