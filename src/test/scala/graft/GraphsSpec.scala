package graft

import graft.graphs.Graphs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics ([[graft.graphs.Graphs]]): PageRank invariants,
  * triangle counts vs a brute-force reference, BFS min-dist vs a
  * driver-side Dijkstra-on-unit-weights reference.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(es: Seq[(Long, Long)]): DataFrame = es.toDF("src", "dst")
  private def nodeDf(ns: Seq[Long]): DataFrame = ns.toDF("node")

  // Deterministic pseudo-random digraph: node i → node (i*7+j*13+5) % n.
  private def pseudoGraph(n: Int, perNode: Int): Seq[(Long, Long)] =
    for {
      i <- 0 until n
      j <- 0 until perNode
      d = (i * 7 + j * 13 + 5) % n
      if d != i
    } yield (i.toLong, d.toLong)

  test("pageRank: ranks sum to ~1, teleport floor holds, dangling mass redistributed") {
    // 0→1→2→3, 3 dangling; 4 isolated (rank = teleport + dangling share only)
    val edges = edgeDf(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val out = Graphs.pageRank(nodeDf(0L to 4L), $"node", edges, $"src", $"dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L))
    val total = out.values.sum
    assert(math.abs(total - 1.0) < 1e-3, s"ranks should sum to ~1, got $total")
    val floor = 0.15 / 5
    out.foreach { case (n, r) => assert(r >= floor - 1e-9, s"node $n below teleport floor: $r") }
    // 3 receives a full chain of inflow; 0 and 4 receive none — but 0 (an
    // out-degree-1 node) and 4 (isolated = dangling) share only
    // teleport + dangling mass, so the chain end must dominate.
    assert(out(3L) > out(0L) && out(3L) > out(4L))
  }

  test("pageRank: matches a driver-side reference implementation on a pseudo-random digraph") {
    val es = pseudoGraph(40, 3).distinct
    val nodes = (0L until 40L).toSeq
    val got = Graphs.pageRank(nodeDf(nodes), $"node", edgeDf(es), $"src", $"dst",
      iters = 6, damping = 0.85, scale = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // Reference: same synchronous update, same grid.
    val n = nodes.size.toDouble
    def rnd(x: Double) = math.round(x * 1e7) / 1e7
    val out = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    var rank = nodes.map(_ -> rnd(1.0 / n)).toMap
    for (_ <- 1 to 6) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val inflow = nodes.map { v =>
        v -> es.filter(_._2 == v).map { case (s, _) => rank(s) / out(s).size }.sum
      }.toMap
      rank = nodes.map { v =>
        v -> rnd(0.15 / n + 0.85 * (inflow(v) + dangling / n))
      }.toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - rank(v)) < 2e-7, s"node $v: got ${got(v)}, want ${rank(v)}")
    }
  }

  test("triangleCounts: exact per-node counts vs brute force; direction/dups/self-loops ignored") {
    // Pseudo-random undirected graph with noise: duplicates, reversed
    // copies, and self-loops must not change the answer.
    val base = pseudoGraph(25, 4)
    val noisy = base ++ base.take(10) ++ base.take(15).map(_.swap) ++ Seq((3L, 3L), (7L, 7L))
    val got = Graphs.triangleCounts(edgeDf(noisy), $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val und = base.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.filter(e => e._1 != e._2).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if und((a, b)) && und((b, c)) && und((a, c))
      v <- Seq(a, b, c)
    } brute(v) += 1
    assert(got == brute.toMap, s"got $got\nwant $brute")
    assert(got.nonEmpty) // the pseudo graph actually contains triangles
  }

  test("kHopMinDist: min hop distances match driver BFS; maxHops truncates; early exit on exhaustion") {
    val es = pseudoGraph(30, 2).distinct
    val seeds = Seq(0L, 1L)
    val got = Graphs.kHopMinDist(edgeDf(es), $"src", $"dst", nodeDf(seeds), $"node", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val adj = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil)).distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    assert(got == dist, s"got $got\nwant $dist")

    // A two-node chain exhausts after one hop; asking for 10 must not loop.
    val tiny = Graphs.kHopMinDist(edgeDf(Seq((1L, 2L))), $"src", $"dst",
      nodeDf(Seq(1L)), $"node", maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tiny == Map(1L -> 0, 2L -> 1))
  }

  test("triangleCounts: a complete K5 gives C(4,2)=6 per node; a tree gives none") {
    val k5 = for { a <- 0L until 5L; b <- 0L until 5L if a < b } yield (a, b)
    val got = Graphs.triangleCounts(edgeDf(k5), $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 5L).map(_ -> 6L).toMap)

    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    assert(Graphs.triangleCounts(edgeDf(tree), $"src", $"dst").isEmpty)
  }
}
