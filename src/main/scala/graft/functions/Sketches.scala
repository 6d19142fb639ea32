package graft.functions

import graft.plans.CmsCountGteB
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Deterministic cardinality sketching. Spark's own
  * `approx_count_distinct` (HLL++) is the usual answer, but its register
  * layout is engine-private: no other engine can reproduce the estimate,
  * so it can't be cross-checked, persisted for reuse by another stack, or
  * diffed across runs of different engines. The KMV (k-minimum-values)
  * sketch is the engine-portable alternative a shared data platform wants:
  * its state is just the k smallest distinct 48-bit content hashes
  * ([[kmvState]]), any engine with md5 reproduces it bit-for-bit, and
  * sketches of disjoint shards merge losslessly ([[kmvUnion]]) — compute
  * one sketch per data drop, union them at read time, never rescan.
  */
object Sketches {

  /** Estimator law: with the k-th smallest of the distinct hashes at
    * `h_k` (uniform on [0, 2^48)), distinct ≈ (k-1)·2^48 / h_k — exact
    * integer arithmetic so every engine lands on the same number. Fewer
    * than k distinct hashes ⇒ the count itself, exact. Expected relative
    * error ~ 1/sqrt(k-2); k=256 ⇒ ~6%.
    */
  private def summarize(top: DataFrame, k: Int): DataFrame =
    top.agg(
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

  /** The k smallest DISTINCT values of a hash column named `h`.
    *
    * Scale shape: distinct-by-hash with map-side partial aggregation (the
    * exchange carries O(distinct-per-partition) 8-byte rows, never the
    * corpus), then `TakeOrderedAndProject` — each task ships its local
    * top-k, the driver touches k longs. At 100 TB the bottleneck is the
    * scan, as it should be.
    */
  private def kSmallestDistinct(hashes: DataFrame, k: Int): DataFrame =
    hashes.distinct().orderBy(col("h")).limit(k)

  private def requireK(k: Int): Unit = {
    require(k >= 3, s"KMV needs k >= 3 for a finite estimator, got $k")
    // (k-1) << 48 must stay under 2^63: k-1 < 2^15. Anything near the
    // bound is already absurd accuracy (k=32768 ⇒ ~0.55% error)
    require(k <= (1 << 15),
      s"KMV k=$k would overflow the integer estimator's (k-1)*2^48 numerator; max is 32768")
  }

  /** KMV distinct-count estimate of `item` over `df`, as a single row
    * `(k_used, kth_hash, est_distinct)`.
    */
  def kmvDistinct(df: DataFrame, item: Column, k: Int = 256): DataFrame = {
    requireK(k)
    summarize(kSmallestDistinct(df.select(Hashing.hash48(item).as("h")), k), k)
  }

  /** The sketch STATE: one row holding the k smallest distinct hashes of
    * `item`, ascending. Persist this per shard/partition/day; it is the
    * unit [[kmvUnion]] merges, and it is plain `array<bigint>` — readable
    * by any engine.
    */
  def kmvState(df: DataFrame, item: Column, k: Int = 256): DataFrame = {
    requireK(k)
    kSmallestDistinct(df.select(Hashing.hash48(item).as("h")), k)
      .agg(sort_array(collect_list(col("h"))).as("hashes"))
  }

  /** Per-GROUP KMV distinct-count estimates — the distinct-count CUBE
    * primitive (distinct users per day, distinct tokens per source):
    * one row `(g, k_used, kth_hash, est_distinct)` per group, same
    * estimator law as [[kmvDistinct]], engine-portable like everything
    * KMV here.
    *
    * Scale shape: distinct (group, hash) with map-side combine, then
    * the per-group k-smallest via a rank<=k filter that Catalyst
    * rewrites to WindowGroupLimit — map tasks ship at most k hashes per
    * group into the one group exchange — then a per-group aggregate
    * over ≤ k rows each. Persist the per-group states via
    * [[kmvStateByGroup]] and roll buckets up (day → month) with
    * [[kmvUnion]] per group — sketch once, merge forever.
    */
  def kmvDistinctByGroup(
      df: DataFrame, group: Column, item: Column, k: Int = 256): DataFrame = {
    requireK(k)
    kSmallestDistinctByGroup(df, group, item, k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(
        col("g"), col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(s"CAST(${(k - 1).toLong << 48}L DIV kth_hash AS BIGINT)"))
          .as("est_distinct"))
  }

  /** Per-group sketch STATE (`(g, hashes)` rows) — the persistable,
    * [[kmvUnion]]-mergeable form of [[kmvDistinctByGroup]].
    */
  def kmvStateByGroup(
      df: DataFrame, group: Column, item: Column, k: Int = 256): DataFrame = {
    requireK(k)
    kSmallestDistinctByGroup(df, group, item, k)
      .groupBy(col("g"))
      .agg(sort_array(collect_list(col("h"))).as("hashes"))
  }

  private def kSmallestDistinctByGroup(
      df: DataFrame, group: Column, item: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"))
    df.select(group.as("g"), Hashing.hash48(item).as("h")).distinct()
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Merge sketch states (a DataFrame of `hashes` array rows, any number)
    * into the summary the union of their inputs would have produced:
    * the k smallest distinct hashes of a union are a subset of the union
    * of each side's k smallest, so the merge is LOSSLESS — bit-identical
    * to sketching the concatenated inputs (spec-asserted law). All
    * states must have been built with the same `k` and item hashing.
    */
  def kmvUnion(states: DataFrame, k: Int = 256): DataFrame = {
    requireK(k)
    summarize(kSmallestDistinct(states.select(explode(col("hashes")).as("h")), k), k)
  }

  // --- Count–Min heavy hitters -------------------------------------------

  /** Fixed-memory Count–Min sketch over `xxhash64(item)`, built the same
    * way as [[graft.dedup.Dedup.seenFilter]]'s Bloom filter: per-partition
    * sketches from `mapPartitions` over the column-pruned long hashes,
    * merged up a 2-level `treeReduce` (counter tables add cell-wise). The
    * result is `depth × width × 4` bytes regardless of input size — the
    * whole point at 100 TB, where the exact per-item count relation would
    * itself be a 10⁹-row table.
    */
  def cmsSketch(
      df: DataFrame,
      item: Column,
      depth: Int = 5,
      width: Int = 1 << 18,
      seed: Int = 42
  ): CountMinSketch = {
    require(depth > 0 && width > 0, s"need positive CMS geometry: $depth x $width")
    val hashesDf = df.select(xxhash64(item).as("h"))
    if (hashesDf.isEmpty) CountMinSketch.create(depth, width, seed)
    else hashesDf.queryExecution.toRdd.map(_.getLong(0))
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val cms = CountMinSketch.create(depth, width, seed)
          it.foreach(cms.addLong)
          Iterator.single(cms)
        }
      }
      .treeReduce((a, b) => a.mergeInPlace(b), depth = 2)
  }

  /** EXACT heavy hitters — all items of `df` whose count is ≥ `minCount`,
    * as `(item, cnt)` — via the sketch-prefilter two-pass:
    *
    *   1. build a [[cmsSketch]] (one scan, fixed memory, mergeable);
    *   2. keep rows whose item's CMS estimate reaches `minCount`
    *      ([[graft.plans.CmsCountGteB]] against the broadcast sketch —
    *      NO false negatives, CMS only over-counts);
    *   3. exact-count the survivors and apply the threshold again, which
    *      removes the sketch's false positives.
    *
    * The output is therefore EXACTLY `GROUP BY item HAVING count(*) >=
    * minCount` (spec-asserted law) — but the aggregation exchange carries
    * only candidate rows. At 100 TB with a 10⁹-term vocabulary and a
    * heavy tail of singletons, the plain groupBy shuffles the whole
    * vocabulary to answer a question about its top 10⁻⁶; this shape
    * shuffles the heavy candidates plus the sketch's false-positive
    * residue (bounded by `depth`/`width` choice), and the first pass
    * stays a pure scan.
    */
  def heavyHitters(
      df: DataFrame,
      item: Column,
      minCount: Long,
      depth: Int = 5,
      width: Int = 1 << 18,
      seed: Int = 42
  ): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cmsSketch(df, item, depth, width, seed))
    val candidate = org.apache.spark.sql.GraftBridge.column(
      CmsCountGteB(bc, minCount, org.apache.spark.sql.GraftBridge.expression(xxhash64(item))))
    df.where(candidate)
      .groupBy(item.as("item")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** [[heavyHitters]] with a RELATIVE threshold: items carrying at least
    * `share` of all rows (the φ-heavy-hitter formulation). One extra
    * count scan fixes the absolute threshold `ceil(share * N)`.
    */
  def heavyHittersByShare(
      df: DataFrame,
      item: Column,
      share: Double,
      depth: Int = 5,
      width: Int = 1 << 18,
      seed: Int = 42
  ): DataFrame = {
    require(share > 0 && share <= 1, s"share must be in (0,1], got $share")
    val n = df.count()
    val minCount = math.max(1L, math.ceil(share * n).toLong)
    heavyHitters(df, item, minCount, depth, width, seed)
  }
}
