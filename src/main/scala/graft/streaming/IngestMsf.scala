package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a MINIMUM SPANNING FOREST under
  * a stream of edge INSERTS — the streaming face of
  * [[graft.graphs.Graphs.minimumSpanningForest]], run as a `foreachBatch`
  * body over batches of weighted edges (`u`, `v`, `w`), resting on the
  * classic SPARSIFICATION identity:
  *
  * {{{ MSF(G ∪ E′) = MSF(MSF(G) ∪ E′) }}}
  *
  * — an edge outside MSF(G) is the maximum of some cycle in G (the red
  * rule) and stays the maximum of that cycle in G ∪ E′, so it can never
  * re-enter. Each batch therefore recomputes the forest over just
  * `|V|−c` retained edges plus the batch — per-batch cost tracks the
  * VERTEX count and batch size, never the edge history (a 10¹²-edge
  * stream keeps paying ~|V| per batch). Our MSF's strict total order
  * `(w, u, v)` makes the forest UNIQUE, so the identity holds exactly,
  * not merely weight-equivalently — the streamed forest is row-identical
  * to a from-scratch build (q230 gates it against q216's oracle).
  *
  * Exactly-once WITHOUT a replay guard (the [[IngestComponents]]
  * argument): the forest is a pure function of the accumulated edge
  * SET, and a redelivered batch's edges are already in the union —
  * `MSF(F ∪ B) = MSF(G ∪ B ∪ B) = F`. Edge DELETES are out of scope by
  * design (decremental MSF needs replacement-edge structures); recompute
  * from scratch when edges retract.
  *
  * Parallel edges across batches collapse to the cheapest (the
  * underlying operator's contract). Bootstrap the forest table
  * (u, v, w) empty — or with an existing forest — before the stream
  * starts; it is rewritten per batch through the catalog staging hop.
  */
final class IngestMsf(
    forestTable: String
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(forestTable),
      s"IngestMsf: '$forestTable' must be initialized before the stream starts")
    val edges = batch.select(col("u"), col("v"), col("w")).persist()
    try {
      spark.sql(s"REFRESH TABLE $forestTable")
      val prev = spark.table(forestTable)
      val forest = graft.graphs.Graphs.minimumSpanningForest(
        prev.unionByName(edges), col("u"), col("v"), col("w"))
      val staging = s"${forestTable}__staging"
      forest.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(staging)
      spark.sql(s"REFRESH TABLE $staging")
      spark.table(staging)
        .write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(forestTable)
      spark.sql(s"REFRESH TABLE $forestTable")
    } finally edges.unpersist()
  }
}
