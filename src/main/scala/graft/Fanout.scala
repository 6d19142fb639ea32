package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Regime-gated fan-out repartition (guide §2.5 synthetic-key spreading,
  * gated so §2.4's "no unconditional exchanges" still holds at scale).
  *
  * The fan-out operators (gram explode, salted cell-join scoring,
  * adjacency intersection, posting-list verification) do per-row work
  * proportional to a downstream EXPANSION, not to their input bytes — so
  * when the upstream relation has collapsed to a handful of partitions
  * (one small parquet file, one checkpoint block: the local/small-SF
  * regime) the whole stage runs at that width and the session's cores
  * idle. The fix is an explicit keyed repartition at the session
  * shuffle-partition count — but ONLY in that regime: on a cluster the
  * same scan has thousands of splits, the join the stage feeds may run
  * broadcast with ZERO movement of the big side, and an unconditional
  * pin would insert a full-relation shuffle (of embedding vectors, of
  * document text) that the broadcast plan never paid (the round-16
  * verdict's "local-mode-conditioned repartitions" finding).
  *
  * The gate reads the PROBE relation's physical partition count and pins
  * only when it is below the session target. The probe must be
  * exchange-free — a scan, a [[Materialize]] checkpoint, or a projection
  * of one — because under AQE `Dataset.rdd` materializes any exchanges
  * in the plan eagerly (`AdaptiveSparkPlanExec.getFinalPhysicalPlan`
  * runs the shuffle stages); probing a scan or checkpoint only plans,
  * never executes. Every call site probes a raw input or a checkpoint:
  * pass the un-derived relation, not the joined/aggregated one.
  */
private[graft] object Fanout {
  /** True when `probe`'s physical partition count is below the session
    * shuffle-partition target — the collapsed regime the pin exists for.
    */
  def isNarrow(probe: DataFrame): Boolean =
    probe.rdd.getNumPartitions <
      probe.sparkSession.sessionState.conf.numShufflePartitions

  /** `df.repartition(sessionShufflePartitions, keys…)` when `probe` is
    * narrower than the session target; `df` unchanged otherwise.
    */
  def repartitionIfNarrow(df: DataFrame, probe: DataFrame, keys: Column*): DataFrame =
    if (!isNarrow(probe)) df
    else df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)

  /** [[repartitionIfNarrow]] probing `df` itself — for call sites where
    * the repartitioned relation is already a checkpoint/scan projection.
    */
  def repartitionSelfIfNarrow(df: DataFrame, keys: Column*): DataFrame =
    repartitionIfNarrow(df, df, keys: _*)

  // ELISION TRAP (round-17 finding, for future pins): a keyed
  // repartition(N, k) whose child already provides the identical STATIC
  // partitioning — e.g. placed right after a groupBy on the same key at
  // the same width — is removed by the planner, and AQE then coalesces
  // the surviving ENSURE_REQUIREMENTS exchange, silently undoing the
  // pin (observed on the coOrderPairs explode and the first q185
  // candidate pin). Pin either a DIFFERENT key set than the child's
  // partitioning, or below an operator that erases partitioning (a
  // checkpoint), and verify REPARTITION_BY_NUM survives in the plan.
}
