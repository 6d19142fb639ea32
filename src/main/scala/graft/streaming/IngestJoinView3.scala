package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a THREE-WAY join view — since
  * round 14 a thin delegator over [[IngestJoinViewN]] (the recursive
  * generalization): the historical `side ∈ a|b|c` CDC convention maps to
  * the generalized 0-based side indices, everything else — the composed
  * signed delta algebra ([[graft.sources.Storage.mergeJoinViewNDelta]],
  * which at n = 3 expands to exactly the seven delta-restricted terms of
  * [[graft.sources.Storage.mergeJoinView3Delta]]), the replay watermark,
  * the drained-view sentinel, the full-base row-id probe, and the
  * touched-bucket rebuilds — is the shared [[IvmMaintenance]]-backed
  * path, no longer a third hand-maintained copy.
  *
  * Side schemas (unchanged): a(row_id, ka, grp), b(row_id, ka, kb),
  * c(row_id, kb, value); bases bucketed on `ka`/`ka`/`kb`, the view
  * bootstrapped with `__batch = -1`.
  */
final class IngestJoinView3(
    aTable: String,
    bTable: String,
    cTable: String,
    viewTable: String,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {

  private val inner = new IngestJoinViewN(
    Seq(aTable, bTable, cTable), viewTable, Seq("ka", "kb"), buckets)

  override def apply(batch: DataFrame, batchId: Long): Unit =
    inner(batch.withColumn("side",
      when(col("side") === "a", "0")
        .when(col("side") === "b", "1")
        .when(col("side") === "c", "2")
        .otherwise(col("side"))), batchId)
}
