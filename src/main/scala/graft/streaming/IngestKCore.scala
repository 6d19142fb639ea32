package graft.streaming

import graft.Materialize
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of FIXED-k CORE membership under a
  * stream of edge INSERTS — the incremental face of
  * [[graft.graphs.Graphs.kCore]], run as a `foreachBatch` body over
  * batches of undirected edges (`u`, `v`). The view is q174's readout:
  * (node, deg) for every member of the k-core, deg = degree INSIDE the
  * core.
  *
  * Monotonicity does the heavy lifting: inserting edges can only GROW
  * the k-core (the old core stays feasible — every member keeps its ≥ k
  * in-core neighbors), so the maintainer never re-peels the existing
  * core. What it must decide is which NON-core nodes the batch promotes,
  * and the promoted set has structure:
  *
  *  - any maximal newly-feasible set Y decomposes into components
  *    CONNECTED through Y-internal edges, each containing an inserted
  *    edge's endpoint (a component with no Δ-incident member was
  *    feasible before the batch, contradicting the old core's
  *    maximality);
  *  - every member of Y is non-core with post-batch FULL degree ≥ k.
  *
  * So the candidate region X = non-core nodes with post-degree ≥ k
  * reachable from the batch's non-core endpoints through such nodes
  * (a frontier expansion, cost ∝ the affected region, like
  * [[graft.graphs.Graphs.kHopMinDist]]), and the exact promoted set is
  * the PEEL of X with FROZEN CORE CREDIT: credit(x) = |neighbors in the
  * old core| (constant across rounds — computed once) + |surviving
  * neighbors in X| (recomputed per round); peel x with credit < k to
  * the fixpoint. Survivors are promoted. In-core degrees are then
  * recomputed for the TOUCHED nodes only — promoted nodes, inserted
  * edges' in-core endpoints, and old-core neighbors of promoted nodes —
  * and merged through [[IvmMaintenance.rebuildTouchedBuckets]] (bucket
  * key = node).
  *
  * Exactly-once WITHOUT a replay guard: membership and in-core degree
  * are pure functions of the edge-set union (idempotent), computed from
  * the logical post-state (store ∪ new edges) BEFORE the store append —
  * a crash between view and append replays with the same net edges and
  * re-derives the identical view. Edge DELETES are out of scope by
  * design (a delete can demote arbitrary cascades; recompute from
  * scratch when edges retract — the [[IngestComponents]] stance).
  *
  * Bootstrap: the edge table (u, v) canonical u < v (unbucketed — the
  * store is append-only, the [[IngestTriangles]] shape), and the core
  * table (node, deg, bkt = pmod(hash(node), buckets)) — empty (the
  * first batch then degenerates to a from-scratch peel, as it must) or
  * an existing consistent pair.
  *
  * Reference semantics: the fixed-k membership + in-core degree readout
  * matches `Graphs.kCore`'s converged fixpoint (q174's oracle).
  */
final class IngestKCore(
    edgeTable: String,
    coreTable: String,
    k: Int,
    buckets: Int,
    maxRounds: Int = 100
) extends ((DataFrame, Long) => Unit) with Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(edgeTable) && spark.catalog.tableExists(coreTable),
      s"IngestKCore: '$edgeTable' and '$coreTable' must be initialized first")
    val canon = batch
      .select(least(col("u"), col("v")).cast("long").as("u"),
        greatest(col("u"), col("v")).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct().persist()
    var newEdges: DataFrame = null
    val mats = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def mat(df: DataFrame): DataFrame = { val m = Materialize(df); mats += m; m }
    try {
      spark.sql(s"REFRESH TABLE $edgeTable")
      val old = spark.table(edgeTable).select(col("u"), col("v"))
      newEdges = canon.join(old, Seq("u", "v"), "left_anti").persist()
      if (newEdges.isEmpty) return

      spark.sql(s"REFRESH TABLE $coreTable")
      val prev = spark.table(coreTable)
      val core = prev.select(col("node"))
      val post = old.unionByName(newEdges)
      def adjOf(nodes: DataFrame): DataFrame = {
        val n = broadcast(nodes)
        post.join(n.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .select(col("u").as("x"), col("v").as("w"))
          .unionByName(post.join(n.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
            .select(col("v").as("x"), col("u").as("w")))
      }
      // non-core = minus (∩ core): both joins build on the SMALL side
      // (the candidate set), never on the core table
      def nonCore(nodes: DataFrame): DataFrame =
        nodes.join(broadcast(core.join(broadcast(nodes), Seq("node"), "left_semi")),
          Seq("node"), "left_anti")
      // keep only candidates whose post-batch FULL degree reaches k —
      // nodes below it can never join nor carry a promotion path
      def degEnough(nodes: DataFrame): DataFrame =
        adjOf(nodes).groupBy(col("x")).agg(count(lit(1)).as("d"))
          .where(col("d") >= k).select(col("x").as("node"))

      // ---- expansion: the candidate region X ----
      val endpoints = newEdges.select(col("u").as("node"))
        .unionByName(newEdges.select(col("v").as("node"))).distinct()
      var x = mat(degEnough(nonCore(endpoints)))
      var frontier = x
      var round = 0
      while (!frontier.isEmpty) {
        round += 1
        if (round > maxRounds) throw new IllegalStateException(
          s"IngestKCore: candidate expansion exceeded $maxRounds rounds — the batch's " +
            s"affected region keeps growing; raise maxRounds or recompute from scratch")
        val nbrs = adjOf(frontier).select(col("w").as("node")).distinct()
          .join(broadcast(x), Seq("node"), "left_anti")
        frontier = mat(degEnough(nonCore(nbrs)))
        x = mat(x.unionByName(frontier))
      }

      // ---- peel X with frozen core credit ----
      val promoted: DataFrame =
        if (x.isEmpty) x
        else {
          val adjX = mat(adjOf(x))
          val sCredit = mat(adjX
            .join(broadcast(core.join(broadcast(adjX.select(col("w").as("node")).distinct()),
              Seq("node"), "left_semi").withColumnRenamed("node", "w")), Seq("w"), "left_semi")
            .groupBy(col("x")).agg(count(lit(1)).as("sc")))
          var live = x
          var liveCount = live.count()
          var stable = false
          var peelRound = 0
          while (!stable) {
            peelRound += 1
            if (peelRound > maxRounds + liveCount) throw new IllegalStateException(
              s"IngestKCore: peel failed to converge — impossible for a shrinking set; " +
                s"report this as a bug")
            val xCredit = adjX
              .join(broadcast(live.withColumnRenamed("node", "w")), Seq("w"), "left_semi")
              .groupBy(col("x")).agg(count(lit(1)).as("xc"))
            val credit = live.withColumnRenamed("node", "x")
              .join(sCredit, Seq("x"), "left").join(xCredit, Seq("x"), "left")
              .select(col("x").as("node"),
                (coalesce(col("sc"), lit(0L)) + coalesce(col("xc"), lit(0L))).as("c"))
            val next = mat(credit.where(col("c") >= k).select(col("node")))
            val nextCount = next.count()
            stable = nextCount == liveCount
            liveCount = nextCount
            live = next
          }
          live
        }

      // ---- in-core degree recompute, touched nodes only ----
      val newCoreMember = (n: DataFrame) => // membership in S ∪ promoted
        n.join(broadcast(core.join(broadcast(n), Seq("node"), "left_semi")
            .unionByName(promoted.join(broadcast(n), Seq("node"), "left_semi"))),
          Seq("node"), "left_semi")
      val inCoreEndpoints = newCoreMember(endpoints)
      val coreNbrsOfPromoted =
        if (promoted.isEmpty) promoted
        else {
          val adjP = mat(adjOf(promoted).select(col("w").as("node")).distinct())
          core.join(broadcast(adjP), Seq("node"), "left_semi")
        }
      val touched = mat(promoted.unionByName(inCoreEndpoints)
        .unionByName(coreNbrsOfPromoted).distinct())
      if (!touched.isEmpty) {
        val adjT = adjOf(touched)
        val memberW = core.unionByName(promoted)
          .join(broadcast(adjT.select(col("w").as("node")).distinct()), Seq("node"), "left_semi")
        val degs = adjT
          .join(broadcast(memberW.withColumnRenamed("node", "w")), Seq("w"), "left_semi")
          .groupBy(col("x")).agg(count(lit(1)).as("deg"))
          .select(col("x").as("node"), col("deg"))
        IvmMaintenance.rebuildTouchedBuckets(
          spark, coreTable, prev, degs, touched,
          Seq("node"), "node", buckets)
      }

      // idempotent append AFTER the view update (view-first discipline)
      val full = spark.table(edgeTable)
      newEdges.select(full.columns.map(col).toIndexedSeq: _*)
        .write.mode(SaveMode.Append).format("parquet").insertInto(edgeTable)
      spark.sql(s"REFRESH TABLE $edgeTable")
    } finally {
      canon.unpersist()
      if (newEdges != null) newEdges.unpersist()
      mats.foreach(_.unpersist())
      ()
    }
  }
}
