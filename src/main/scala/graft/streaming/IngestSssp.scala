package graft.streaming

import graft.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of HOP-CAPPED weighted shortest
  * paths under a stream of edge INSERTS — the incremental face of
  * [[graft.graphs.Graphs.shortestPaths]] (q183's readout: every node
  * reachable within `maxHops` hops with its capped distance), run as a
  * `foreachBatch` body over directed weighted edges (`src`, `dst`, `w`).
  *
  * The hop cap changes the state shape: capped distances are NOT a
  * fixpoint you can relax into (a cheaper 5-hop path must not beat a
  * 4-hop cap), so the maintained state is the HOP-RESOLVED Bellman–Ford
  * table — (node, h, dist) = the minimum weight over walks of EXACTLY
  * h hops from the seeds, for h ∈ [1, maxHops], seeds at (seed, 0, 0).
  * The serve is `min(dist) GROUP BY node`: with non-negative weights
  * the group-min over exact-hop walk minima equals the cumulative
  * ≤-maxHops relaxation (a walk is never cheaper than the path inside
  * it, and that path uses no more hops), which is q183's readout.
  *
  * Under INSERTS (new pairs, or a cheaper weight REPLACING a stored
  * pair — the batch operator's groupBy-min collapse) every m_h is
  * non-increasing, and a level-h value can only change at
  *
  *  - targets of the batch's new edges whose source carries an m_{h−1}
  *    row, or
  *  - targets of out-edges of nodes whose m_{h−1} CHANGED this batch —
  *
  * so each of the `maxHops` levels recomputes its candidate set
  * ABSOLUTELY (min over ALL in-edges of m_{h−1}+w, the in-edges read
  * with a broadcast semi-join) and passes its changed rows to the next
  * level. Absolute recompute ⇒ idempotent ⇒ no replay guard; all
  * levels' changed rows land in ONE
  * [[IvmMaintenance.rebuildTouchedBuckets]] write (idCols = (node, h),
  * bucket key = node), then the directed edge store rebuilds on the
  * composite (src, dst) identity (bucket key = src). Edge DELETES are
  * out of scope by design (a delete can lengthen arbitrary paths;
  * recompute from scratch when edges retract — the
  * [[IngestComponents]] stance).
  *
  * Bootstrap: edge table (src, dst, w, bkt = pmod(hash(src), buckets))
  * — one row per (src, dst), min weight; dist table (node, h, dist,
  * bkt = pmod(hash(node), buckets)) seeded with (seed, 0, 0) rows.
  */
final class IngestSssp(
    edgeTable: String,
    distTable: String,
    maxHops: Int,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {
  require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(edgeTable) && spark.catalog.tableExists(distTable),
      s"IngestSssp: '$edgeTable' and '$distTable' must be initialized first")
    val canon = batch
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
        col("w").cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst") && col("w").isNotNull)
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w")).persist()
    var newEdges: DataFrame = null
    val mats = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def mat(df: DataFrame): DataFrame = { val m = Materialize(df); mats += m; m }
    try {
      spark.sql(s"REFRESH TABLE $edgeTable")
      val old = spark.table(edgeTable).select(col("src"), col("dst"), col("w"))
      newEdges = canon
        .join(old.select(col("src"), col("dst"), col("w").as("__old_w")),
          Seq("src", "dst"), "left")
        .where(col("__old_w").isNull || col("w") < col("__old_w"))
        .select(col("src"), col("dst"), col("w")).persist()
      if (newEdges.isEmpty) return

      val post = old
        .join(newEdges.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
        .unionByName(newEdges)
      spark.sql(s"REFRESH TABLE $distTable")
      val state = spark.table(distTable)

      val allChanged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var changedPrev: DataFrame = mat(state.select(col("node"), col("dist")).where(lit(false)))
      for (h <- 1 to maxHops) {
        val stored = state.where(col("h") === (h - 1)).select(col("node"), col("dist"))
        val prevEff =
          if (changedPrev.isEmpty) stored
          else stored.join(broadcast(changedPrev.select(col("node"))), Seq("node"), "left_anti")
            .unionByName(changedPrev)
        // candidates: new-edge targets whose source is h−1 reachable, and
        // out-edge targets of nodes whose m_{h−1} changed
        val candNew = newEdges
          .join(prevEff.select(col("node").as("src")), Seq("src"), "left_semi")
          .select(col("dst").as("node"))
        val candProp =
          if (changedPrev.isEmpty) candNew.where(lit(false))
          else post
            .join(broadcast(changedPrev.select(col("node").as("src"))), Seq("src"), "left_semi")
            .select(col("dst").as("node"))
        val cands = mat(candNew.unionByName(candProp).distinct())
        changedPrev =
          if (cands.isEmpty) mat(cands.withColumn("dist", lit(0L)).where(lit(false)))
          else {
            // absolute recompute: min over ALL in-edges of m_{h−1} + w
            val inEdges = post
              .join(broadcast(cands.withColumnRenamed("node", "dst")), Seq("dst"), "left_semi")
            val recomputed = inEdges
              .join(prevEff.select(col("node").as("src"), col("dist").as("__pd")), Seq("src"))
              .groupBy(col("dst").as("node")).agg(min(col("__pd") + col("w")).as("dist"))
            val storedH = state.where(col("h") === h).select(col("node"), col("dist").as("__sd"))
            mat(recomputed.join(storedH, Seq("node"), "left")
              .where(col("__sd").isNull || col("dist") < col("__sd"))
              .select(col("node"), col("dist")))
          }
        if (!changedPrev.isEmpty) allChanged += changedPrev.withColumn("h", lit(h))
      }

      if (allChanged.nonEmpty) {
        val inserts = mat(allChanged.reduce(_ unionByName _)
          .select(col("node"), col("h"), col("dist")))
        IvmMaintenance.rebuildTouchedBuckets(
          spark, distTable, state, inserts, inserts.select(col("node"), col("h")),
          Seq("node", "h"), "node", buckets)
      }

      IvmMaintenance.rebuildTouchedBuckets(
        spark, edgeTable, spark.table(edgeTable), newEdges,
        newEdges.select(col("src"), col("dst")).where(lit(false)),
        Seq("src", "dst"), "src", buckets,
        touchedFromChanges = Some(newEdges.select(col("src"))))
    } finally {
      canon.unpersist()
      if (newEdges != null) newEdges.unpersist()
      mats.foreach(_.unpersist())
      ()
    }
  }
}
