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

  test("harmonicCloseness: hand-checked harmonic sums; the hop cap truncates; sinks " +
      "report 0; matches a driver BFS on a pseudo-random digraph") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    def run(edges: Seq[(Long, Long)], h: Int): Map[Long, (Long, Double)] =
      Graphs.harmonicCloseness(edgeDf(edges), $"src", $"dst", maxHops = h)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // from 1: 2@1, 3@1, 4@2 -> 1 + 1 + 0.5; from 4 (sink): zero row present
    assert(run(es, 3) == Map(1L -> (3L, 2.5), 2L -> (2L, 1.5), 3L -> (1L, 1.0), 4L -> (0L, 0.0)))
    assert(run(es, 1) == Map(1L -> (2L, 2.0), 2L -> (1L, 1.0), 3L -> (1L, 1.0), 4L -> (0L, 0.0)))

    // driver reference on the pseudo-random digraph
    val pes = pseudoGraph(50, 2)
    val adj = pes.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val nodes = pes.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map { r =>
      var dist = Map(r -> 0)
      var frontier = Seq(r)
      for (h <- 1 to 3) {
        val nxt = frontier.flatMap(n => adj.getOrElse(n, Nil)).distinct
          .filterNot(dist.contains)
        nxt.foreach(n => dist += n -> h)
        frontier = nxt
      }
      val ds = dist.values.filter(_ > 0).toSeq.sorted
      val harm = ds.groupBy(identity).toSeq.sortBy(_._1)
        .foldLeft(0.0) { case (acc, (d, xs)) => acc + xs.size.toDouble / d }
      r -> (ds.size.toLong, math.BigDecimal(harm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(run(pes, 3) == want)
  }

  test("weightedPageRank: uniform weights reproduce pageRank bit-for-bit; a heavy edge " +
      "pulls rank; zero/negative weights are dropped (source goes dangling)") {
    val nodes = nodeDf(Seq(0L, 1L, 2L, 3L))
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L))
    val uni = es.map { case (a, b) => (a, b, 7L) } // any constant weight
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = ranks(Graphs.pageRank(nodes, $"node", edgeDf(es), $"src", $"dst", iters = 5))
    val wUni = ranks(Graphs.weightedPageRank(nodes, $"node",
      uni.toDF("src", "dst", "w"), $"src", $"dst", $"w", iters = 5))
    assert(wUni == plain, s"uniform weights must reduce to pageRank:\n $wUni\n $plain")

    // 0 hands 99% of its mass to 1: rank(1) must beat the uniform split
    val skew = Seq((0L, 1L, 99L), (0L, 2L, 1L), (1L, 2L, 1L), (2L, 0L, 1L), (3L, 0L, 1L))
    val wSkew = ranks(Graphs.weightedPageRank(nodes, $"node",
      skew.toDF("src", "dst", "w"), $"src", $"dst", $"w", iters = 5))
    assert(wSkew(1L) > wUni(1L) && wSkew(2L) < wUni(2L), s"$wSkew vs $wUni")

    // dropping non-positive weights: node 3's only out-edge has w=0, so 3
    // is DANGLING — identical to pageRank on the graph without that edge
    val zeroed = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L), (2L, 0L, 1L), (3L, 0L, 0L))
    val wZero = ranks(Graphs.weightedPageRank(nodes, $"node",
      zeroed.toDF("src", "dst", "w"), $"src", $"dst", $"w", iters = 5))
    val plainNo3 = ranks(Graphs.pageRank(nodes, $"node",
      edgeDf(es.filterNot(_._1 == 3L)), $"src", $"dst", iters = 5))
    assert(wZero == plainNo3, s"zero-weight edge must be no edge:\n $wZero\n $plainNo3")
  }

  test("shortestPaths: min-plus over a known weighted digraph — a cheap long detour " +
      "beats the direct edge; hop cap truncates it; unreachable nodes absent") {
    // 0 -> 3 direct costs 100; 0->1->2->3 costs 3; 4 unreachable from 0
    val es = Seq((0L, 3L, 100L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (4L, 0L, 5L))
    val seeds = Seq(0L).toDF("s")
    def run(h: Int): Map[Long, Long] =
      Graphs.shortestPaths(es.toDF("src", "dst", "w"), $"src", $"dst", $"w",
        seeds, $"s", maxHops = h)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(3) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // ≤ 2 hops: the detour is out of budget, the direct edge wins
    assert(run(2) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 100L))
    // parallel edges collapse to the cheapest; early exit past the fixpoint
    val dup = Seq((0L, 1L, 9L), (0L, 1L, 2L))
    assert(Graphs.shortestPaths(dup.toDF("src", "dst", "w"), $"src", $"dst", $"w",
      seeds, $"s", maxHops = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(0L -> 0L, 1L -> 2L))
  }

  test("shortestPaths: matches a driver-side Bellman–Ford on a pseudo-random weighted " +
      "digraph, at the hop cap and at the fixpoint") {
    val es = pseudoGraph(40, 3).map { case (a, b) => (a, b, 1L + (a * 3 + b) % 7) }
    val seeds = Seq(0L, 5L).toDF("s")
    def reference(h: Int): Map[Long, Long] = {
      var d = Map(0L -> 0L, 5L -> 0L)
      for (_ <- 1 to h) {
        val relaxed = es.flatMap { case (a, b, w) => d.get(a).map(da => b -> (da + w)) }
          .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).min }
        d = (d.keySet ++ relaxed.keySet).map { n =>
          n -> math.min(d.getOrElse(n, Long.MaxValue), relaxed.getOrElse(n, Long.MaxValue))
        }.toMap
      }
      d
    }
    for (h <- Seq(2, 4, 40)) {
      val got = Graphs.shortestPaths(es.toDF("src", "dst", "w"), $"src", $"dst", $"w",
        seeds, $"s", maxHops = h)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(h), s"maxHops=$h")
    }
  }

  /** Both engine paths: the default bounded-driver Tarjan finish AND the
    * distributed trim/color/sweep loop (threshold forced to 0) — every
    * SCC test asserts they agree, the nearDupClusters equivalence
    * convention.
    */
  private def sccOf(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val local = Graphs.stronglyConnectedComponents(edgeDf(es), $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graphs.stronglyConnectedComponents(edgeDf(es), $"src", $"dst", localEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, s"driver/distributed paths disagree:\n $local\n $dist")
    local
  }

  test("stronglyConnectedComponents: known multi-SCC digraph — cycles, tendrils, " +
      "DAG edges between SCCs; direction matters (CC would merge everything)") {
    // {1,2} 2-cycle -> {3,4,5} 3-cycle via 2->3; tendril 6->1 (no in);
    // sink 7 (no out); {8,9,10} 3-cycle attached nowhere; dup edge + self-loop noise
    val es = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L),
      (6L, 1L), (5L, 7L), (8L, 9L), (9L, 10L), (10L, 8L), (1L, 2L), (4L, 4L))
    val got = sccOf(es)
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L,
      6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 8L, 10L -> 8L)
    assert(got == want, s"got $got")
    // the UNDIRECTED engine would fuse {1..7} into one component — prove
    // the directed decomposition is genuinely finer
    val cc = Graphs.connectedComponents(edgeDf(es), $"src", $"dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.filterKeys(_ <= 7L).values.toSet.size == 1)
  }

  test("stronglyConnectedComponents: a pure DAG trims to all singletons; " +
      "two SCCs sharing one color class need a second peel round") {
    // chain DAG
    assert(sccOf(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // {1,2} and {3,4} both colored by root 1 (1 reaches everything): the
    // backward sweep finds only {1,2} in round 1; {3,4} must be peeled in
    // round 2 — the multi-outer-round path
    assert(sccOf(Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("stronglyConnectedComponents: matches a driver-side Tarjan reference on a " +
      "pseudo-random digraph; maxOuterRounds overrun THROWS rather than truncating") {
    val es = pseudoGraph(60, 2) ++ Seq((7L, 61L), (61L, 62L)) // plus a tendril
    val got = sccOf(es)
    // driver-side reference: iterative Tarjan over the same edge set
    val adj = es.filter(e => e._1 != e._2).distinct.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sorted }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var idx = 0L
    val index = scala.collection.mutable.Map[Long, Long]()
    val low = scala.collection.mutable.Map[Long, Long]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.ArrayBuffer[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    def strongconnect(v0: Long): Unit = {
      // explicit work stack (node, child iterator position)
      val work = scala.collection.mutable.ArrayBuffer[(Long, Int)]((v0, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.last
        if (pi == 0) {
          index(v) = idx; low(v) = idx; idx += 1; stack += v; onStack += v
        }
        val kids = adj.getOrElse(v, Seq.empty)
        var advanced = false
        var i = pi
        while (i < kids.length && !advanced) {
          val w = kids(i)
          if (!index.contains(w)) {
            work(work.length - 1) = (v, i + 1)
            work += ((w, 0))
            advanced = true
          } else {
            if (onStack(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!advanced) {
          if (i >= kids.length) {
            if (low(v) == index(v)) {
              var done = false
              val members = scala.collection.mutable.ArrayBuffer[Long]()
              while (!done) {
                val w = stack.remove(stack.length - 1); onStack -= w
                members += w
                done = w == v
              }
              val label = members.min
              members.foreach(m => comp(m) = label)
            }
            work.remove(work.length - 1)
            if (work.nonEmpty) {
              val (p, _) = work.last
              low(p) = math.min(low(p), low(v))
            }
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongconnect(v))
    assert(got == comp.toMap, s"engine vs Tarjan:\n got=$got\nwant=${comp.toMap}")
    // overrun: 1 outer round cannot finish the two-SCC chain from above
    // (distributed path forced — the driver finish needs no rounds)
    intercept[IllegalStateException] {
      Graphs.stronglyConnectedComponents(
        edgeDf(Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))),
        $"src", $"dst", maxOuterRounds = 1, localEdges = 0L).collect()
    }
  }

  test("minimumSpanningForest equals brute Kruskal on a random weighted graph, " +
      "spans disconnected components, and handles duplicates/self-loops") {
    import org.apache.spark.sql.functions._
    // two components + a self-loop + a parallel edge (worse weight, ignored)
    val rnd = new scala.util.Random(42)
    val edges = (
      // component A: nodes 0-9, random weights
      (for { u <- 0 until 10; v <- (u + 1) until 10 if rnd.nextInt(3) > 0 }
        yield (u.toLong, v.toLong, (rnd.nextInt(50) + 1).toLong)) ++
      // component B: a path 100-104
      (100 until 104).map(i => (i.toLong, i.toLong + 1, 7L)) :+
      (3L, 3L, 1L) :+   // self-loop, ignored
      (0L, 1L, 999L)    // parallel edge, cheaper copy wins
    ).toSeq
    val df = edges.toDF("u", "v", "w")
    val got = Graphs.minimumSpanningForest(df, $"u", $"v", $"w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute Kruskal under the same strict (w, u, v) order
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map { case (k, es) => (k._1, k._2, es.map(_._3).min) }
      .toSeq.sortBy(e => (e._3, e._1, e._2))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    val want = canon.flatMap { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
    }.toSet
    assert(got == want, s"got $got\nwant $want")
    // forest size law: nodes − components (15 nodes, 2 components)
    assert(got.size == 15 - 2)
    // both paths land on the identical unique MSF: default = bounded
    // driver Kruskal (tiny graph), localEdges = 0 forces the full
    // distributed Borůvka loop
    val gotDistributed = Graphs.minimumSpanningForest(
        df, $"u", $"v", $"w", localEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotDistributed == want, s"distributed path: $gotDistributed")

    // single-linkage identity at several thresholds: cutting the MSF
    // equals components of the directly thresholded graph
    for (t <- Seq(5L, 15L, 30L, 60L)) {
      val viaMsf = Graphs.singleLinkageClusters(df, $"u", $"v", $"w", t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val nodes = canon.flatMap(e => Seq(e._1, e._2)).distinct
      val keptE = canon.filter(_._3 <= t)
      val ccDirect = Graphs.connectedComponents(
          keptE.toDF("u", "v", "w"), $"u", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want2 = nodes.map(n => (n, ccDirect.getOrElse(n, n))).toSet
      assert(viaMsf == want2, s"t=$t: $viaMsf vs $want2")
    }
  }
}
