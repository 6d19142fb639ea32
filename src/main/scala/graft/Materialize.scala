package graft

import org.apache.spark.sql.Dataset

/** Eager mid-plan materialization with a durability switch.
  *
  * The iterative / multi-reference operators (the connected-component label
  * rounds in [[graft.dedup.Dedup.nearDupClusters]], the bucket-count offset
  * relations in [[graft.curation.Assembly]] and [[graft.curation.Corpus]])
  * must cut lineage and materialize an intermediate result: re-executing the
  * upstream plan per iteration (or once per join side) is exactly the scale
  * bug those operators exist to avoid. HOW they materialize is a durability
  * decision this switch centralizes:
  *
  *  - `localCheckpoint()` (the default): blocks live in executor storage
  *    with NO lineage left to recompute them. Fast — no distributed-FS
  *    round trip — and correct on `local[*]`, but on a real cluster one
  *    lost executor loses its blocks and FAILS the job. For an hours-long
  *    CC run over 100 TB that is the difference between "right plan" and
  *    "runs to completion".
  *  - reliable `checkpoint()`: blocks written to the fault-tolerant
  *    filesystem under the `graft.checkpointDir` session conf (HDFS/S3 on
  *    a real cluster). One write+read round trip per materialization buys
  *    executor-loss safety — a lost node re-reads from the FS instead of
  *    killing the job.
  *
  * Cluster deployments should set
  * `spark.conf.set("graft.checkpointDir", "hdfs://…/graft-ckpt")` before
  * running the iterative operators. Checkpoint files accumulate per run:
  * enable `spark.cleaner.referenceTracking.cleanCheckpoints=true` or clean
  * the directory between runs. With the conf unset nothing changes — the
  * local[*] test/bench profile keeps the zero-IO localCheckpoint path.
  *
  * ONE directory per SparkContext: `graft.checkpointDir` is read from the
  * session conf but `SparkContext.setCheckpointDir` is context-GLOBAL, so
  * two sessions sharing a context with different values would silently
  * re-point each other's checkpoints (e.g. a production run's blocks
  * landing under another session's scratch path — durability lost with no
  * signal). A conf value that CONFLICTS with the one already applied on
  * the context therefore throws instead of re-pointing; a deliberate
  * re-point (scratch → production FS before real work starts) is
  * [[repoint]] + set the conf on every session sharing the context.
  */
private[graft] object Materialize {
  val ConfKey = "graft.checkpointDir"

  // Per-CONTEXT lock objects and applied-dir records, both weak-keyed on
  // the SparkContext itself:
  //  - the read-compare-apply must be atomic per context (two concurrent
  //    first materializations could otherwise interleave setCheckpointDir
  //    calls and record a value the context no longer points at), but the
  //    lock must be PER context — setCheckpointDir does filesystem I/O
  //    (mkdir on HDFS/S3), and one context stalled on a hung endpoint
  //    must not block an unrelated context's materialization behind a
  //    JVM-global monitor (the same driver-stall class the per-session
  //    CC locks avoid);
  //  - weak keys bound the maps in long-lived JVMs that cycle contexts
  //    (notebook kernels, test harnesses): a stopped, unreachable
  //    context's entries are collectable, nothing needs explicit
  //    eviction. The synchronizedMap wrapper makes computeIfAbsent
  //    atomic, and its global mutex is held only for that quick lookup —
  //    never across the FS call.
  private val ctxLocks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, AnyRef]())
  private val appliedDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  private def lockFor(sc: org.apache.spark.SparkContext): AnyRef =
    ctxLocks.computeIfAbsent(sc, _ => new AnyRef)

  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        lockFor(sc).synchronized {
          val prev = appliedDir.get(sc)
          if (prev == null || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            appliedDir.put(sc, dir)
          } else if (prev != dir)
            throw new IllegalStateException(
              s"$ConfKey=$dir conflicts with the checkpoint directory already applied " +
                s"on this SparkContext ($prev). The checkpoint dir is context-global: " +
                "all sessions sharing a SparkContext must agree on one value. To " +
                "deliberately re-point it, call graft.Materialize.repoint(spark) and " +
                "set the same conf on every session sharing the context.")
        }
        ds.checkpoint()
      case None => ds.localCheckpoint()
    }
  }

  /** Forget the directory applied on `spark`'s context, so the next
    * materialization applies the session's current conf value. For
    * DELIBERATE re-points only (the conflict guard in [[apply]] exists
    * precisely so this never happens by accident).
    */
  def repoint(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sc = spark.sparkContext
    lockFor(sc).synchronized { appliedDir.remove(sc); () }
  }
}
