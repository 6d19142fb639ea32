package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching. Spark's own
  * `approx_count_distinct` (HLL++) is the usual answer, but its register
  * layout is engine-private: no other engine can reproduce the estimate,
  * so it can't be cross-checked, persisted for reuse by another stack, or
  * diffed across runs of different engines. The KMV (k-minimum-values)
  * sketch is the engine-portable alternative a shared data platform wants:
  * its state is just the k smallest distinct 48-bit content hashes, so any
  * engine with md5 reproduces it bit-for-bit, and two sketches union by
  * merging hash lists.
  */
object Sketches {

  /** KMV distinct-count estimate of `item` over `df`, as a single row
    * `(k_used, kth_hash, est_distinct)`.
    *
    * Estimator: with the k-th smallest of the distinct hashes at `h_k`
    * (uniform on [0, 2^48)), the distinct count is ≈ (k-1) · 2^48 / h_k —
    * computed in exact integer arithmetic so every engine lands on the
    * same number. When fewer than k distinct hashes exist the sketch is
    * the exact distinct count. Expected relative error ~ 1/sqrt(k-2);
    * k=256 ⇒ ~6%.
    *
    * Scale shape: the explode is collapsed to DISTINCT HASHES with
    * map-side partial aggregation before anything shuffles — the exchange
    * carries O(distinct-per-partition) 8-byte rows, not the corpus — and
    * the global k-smallest runs as `TakeOrderedAndProject` (each task
    * ships its local top-k, never its hash set). The driver touches k
    * longs. At 100 TB the bottleneck is the scan, as it should be.
    */
  def kmvDistinct(df: DataFrame, item: Column, k: Int = 256): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 for a finite estimator, got $k")
    require(k <= (1 << 20), s"KMV k=$k is past any useful accuracy/cost point")
    df.select(Hashing.hash48(item).as("h"))
      .groupBy(col("h")).agg(count(lit(1))) // distinct with partial agg
      .select(col("h"))
      .orderBy(col("h"))
      .limit(k)
      .agg(
        count(lit(1)).as("k_used"),
        max(col("h")).as("kth_hash"))
      .select(
        col("k_used"),
        col("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          // integer division: double would round 2^56-scale numerators
          // differently than DuckDB's `//`
          .otherwise(expr(s"CAST(${(k - 1).toLong << 48}L DIV kth_hash AS BIGINT)"))
          .as("est_distinct"))
  }
}
