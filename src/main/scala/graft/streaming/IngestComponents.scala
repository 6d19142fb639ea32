package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of CONNECTED-COMPONENT labels under
  * a stream of edge INSERTS — the streaming face of
  * [[graft.graphs.Graphs.connectedComponents]], run as a `foreachBatch`
  * body: each micro-batch of new undirected edges (`src`, `dst`) folds
  * into the label table by the [[graft.dedup.Dedup.mergeClusters]]
  * algebra — prior labels re-enter as STAR edges (node → its component
  * root, a graph with exactly the components of everything seen so far),
  * so the min-label loop's iterative cost scales with how much the NEW
  * edges restructure, not with history's edge count. Prior singletons
  * (self-labeled roots) that no star or new edge mentions are carried
  * over by an anti join.
  *
  * Exactly-once WITHOUT a replay guard, unlike the delta-arithmetic
  * maintainers ([[IngestAggView]] et al.): component labels are a pure
  * function of the edge-set UNION, and unions are idempotent — a
  * redelivered batch merges already-merged components and lands on the
  * byte-identical labeling, so the rebuild simply re-runs. Edge DELETES
  * are out of scope by design (decremental connectivity needs spanning
  * structures the reference has no counterpart for); recompute from
  * scratch when edges retract.
  *
  * The label table is view-sized (one row per vertex) and rewritten per
  * batch through the [[IvmMaintenance]] staging hop — the same
  * full-swap cost every view maintainer here pays; at 100-TB edge scale
  * the vertex relation is the small side by orders of magnitude.
  *
  * Bootstrap the label table (node, component) before the stream starts
  * — empty (zero rows, schema from the catalog) or with an existing
  * labeling.
  */
final class IngestComponents(
    labelsTable: String
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(labelsTable),
      s"IngestComponents: '$labelsTable' must be initialized before the stream starts")
    val edges = batch.select(col("src"), col("dst")).persist()
    try {
      spark.sql(s"REFRESH TABLE $labelsTable")
      val prev = spark.table(labelsTable)
      val stars = prev.where(col("node") =!= col("component"))
        .select(col("node").as("src"), col("component").as("dst"))
      val cc = graft.graphs.Graphs.connectedComponents(
        stars.unionByName(edges), col("src"), col("dst"))
      // carry prior singletons no surviving edge mentions
      val next = cc.unionByName(prev.join(cc, Seq("node"), "left_anti"))
      val staging = s"${labelsTable}__staging"
      next.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
      spark.sql(s"REFRESH TABLE $staging")
      spark.table(staging)
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(labelsTable)
      spark.sql(s"REFRESH TABLE $labelsTable")
    } finally edges.unpersist()
  }
}
