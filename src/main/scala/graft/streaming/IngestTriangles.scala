package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of the GLOBAL TRIANGLE COUNT under
  * a stream of edge INSERTS — the incremental face of the triangle
  * machinery ([[graft.graphs.Graphs.triangleCounts]] is the batch
  * per-vertex readout), run as a `foreachBatch` body over batches of
  * undirected edges (`u`, `v`):
  *
  *  1. the batch canonicalizes (least/greatest, self-loops dropped,
  *     distinct) and anti-joins the stored edge set — only genuinely
  *     NEW edges participate;
  *  2. Δtriangles = the number of DISTINCT vertex triples closed by at
  *     least one new edge: each new edge (u, v) wedge-joins the
  *     accumulated adjacency for common neighbors, and the found
  *     triples are deduplicated on their sorted form — a triangle
  *     closed by two or three same-batch edges is found once per new
  *     edge but COUNTED once (the dedup is the multiplicity
  *     correction). Per-batch cost is |Δ|·avg-degree wedge rows plus a
  *     triple-sized distinct, never a rescan of the full wedge space;
  *  3. the running count carries `__batch` with the
  *     [[IvmMaintenance]] replay guard and sentinel (count arithmetic
  *     is NOT idempotent, unlike [[IngestComponents]]/[[IngestMsf]]);
  *     the edge append IS idempotent (anti-joined), so it re-runs
  *     unconditionally after the count swap — the view-first crash
  *     discipline of every maintainer here.
  *
  * Edge DELETES are out of scope by design (the same wedge probe would
  * subtract, but delete feeds also need the edge store rebuilt —
  * compose with a bucketed store when needed); recompute from scratch
  * when edges retract.
  *
  * Bootstrap: the edge table (u, v) canonical — empty or an existing
  * edge set — and the count table (n_triangles, __batch) seeded with
  * the matching count (0 and -1 for empty).
  */
object IngestTriangles {
  /** DISTINCT sorted triples (x < y < z) of `graph` containing at least
    * one `probe` edge: each probe edge (u, v) wedge-joins `graph`'s
    * adjacency for common neighbors, and the found triples dedup on
    * their sorted form — the multiplicity correction that counts a
    * triple reached from two or three probe edges once. `probe` must be
    * a subset of `graph` (a probe edge absent from the graph closes no
    * triple of the graph, but its wedges WOULD — callers intersect
    * first). Cost ∝ |probe|·avg-degree wedge rows + a triple-sized
    * distinct; both canonical (u < v).
    */
  private[streaming] def closedTriples(probe: DataFrame, graph: DataFrame): DataFrame = {
    val adj = graph.select(col("u").as("a"), col("v").as("b"))
      .unionByName(graph.select(col("v").as("a"), col("u").as("b")))
    val wedges = probe
      .join(adj.withColumnRenamed("a", "u").withColumnRenamed("b", "w"), Seq("u"))
      .where(col("w") =!= col("v"))
      .select(col("u"), col("v"), col("w"),
        least(col("v"), col("w")).as("cu"), greatest(col("v"), col("w")).as("cv"))
    wedges
      .join(graph.select(col("u").as("cu"), col("v").as("cv")), Seq("cu", "cv"), "left_semi")
      .select(
        least(col("u"), col("cu")).as("x"),
        when(col("u") < col("cu"), col("cu"))
          .when(col("u") > col("cv"), col("cv")).otherwise(col("u")).as("y"),
        greatest(col("u"), col("cv")).as("z"))
      .distinct()
  }
}

final class IngestTriangles(
    edgeTable: String,
    countTable: String
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(edgeTable) && spark.catalog.tableExists(countTable),
      s"IngestTriangles: '$edgeTable' and '$countTable' must be initialized first")
    val canon = batch
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v")).distinct().persist()
    var newEdges: DataFrame = null
    try {
      spark.sql(s"REFRESH TABLE $edgeTable")
      val old = spark.table(edgeTable)
      newEdges = canon.join(old, Seq("u", "v"), "left_anti").persist()

      spark.sql(s"REFRESH TABLE $countTable")
      val cnt = spark.table(countTable)
      if (batchId > IvmMaintenance.lastApplied(cnt)) {
        val all = old.unionByName(newEdges)
        val delta = IngestTriangles.closedTriples(newEdges, all).count()
        val prevRow = cnt.where(col("n_triangles").isNotNull)
          .agg(coalesce(max(col("n_triangles")), lit(0L))).head().getLong(0)
        val merged = spark.range(1).select(
          lit(prevRow + delta).as("n_triangles"), lit(batchId).as("__batch"))
        IvmMaintenance.swapViewWithSentinel(spark, countTable, merged, batchId)
      }

      // idempotent append AFTER the count swap (view-first discipline)
      if (!newEdges.isEmpty) {
        newEdges.select(old.columns.map(col).toIndexedSeq: _*)
          .write.mode(SaveMode.Append).format("parquet").insertInto(edgeTable)
        spark.sql(s"REFRESH TABLE $edgeTable")
      }
    } finally {
      canon.unpersist()
      if (newEdges != null) { newEdges.unpersist(); () }
    }
  }
}
