package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch streaming maintenance of a two-table JOIN view — since
  * round 14 a thin delegator over [[IngestJoinViewN]] (the recursive
  * generalization): the historical `side ∈ a|b` CDC convention maps to
  * the generalized 0-based side indices, everything else — the signed
  * delta algebra ([[graft.sources.Storage.mergeJoinViewNDelta]], which
  * at n = 2 IS the ΔA⋈B + A⋈ΔB + ΔA⋈ΔB expansion of
  * [[graft.sources.Storage.mergeJoinViewDelta]], equivalence-spec'd),
  * the replay watermark, the drained-view sentinel (a batch that drains
  * the view to zero data rows keeps its `__batch` via the all-null
  * sentinel row; readers filter `n IS NOT NULL`), the full-base row-id
  * probe (duplicate insert ids throw; an insert reusing a live id
  * without a same-batch delete throws, cross-key reuses included;
  * delete+insert of one id is a legal update), and the touched-bucket
  * base rebuilds — is the shared [[IvmMaintenance]]-backed path, no
  * longer a second hand-maintained copy.
  *
  * Side schemas (unchanged): a(row_id, key, grp), b(row_id, key,
  * value); both bases bucketed on `key`, the view bootstrapped with
  * `__batch = -1`.
  */
final class IngestJoinView(
    aTable: String,
    bTable: String,
    viewTable: String,
    buckets: Int
) extends ((DataFrame, Long) => Unit) with Serializable {

  private val inner = new IngestJoinViewN(
    Seq(aTable, bTable), viewTable, Seq("key"), buckets)

  override def apply(batch: DataFrame, batchId: Long): Unit =
    inner(batch.withColumn("side",
      when(col("side") === "a", "0")
        .when(col("side") === "b", "1")
        .otherwise(col("side"))), batchId)
}
