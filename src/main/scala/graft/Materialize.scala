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
  */
private[graft] object Materialize {
  val ConfKey = "graft.checkpointDir"

  // the conf value LAST applied per SparkContext: setCheckpointDir mints a
  // fresh unique subdirectory per call, so it must run once per VALUE, not
  // once per materialization — but it must also re-run when the conf
  // CHANGES (a session reconfigured from a scratch path to the production
  // FS would otherwise keep checkpointing to the stale directory and
  // silently lose the durability the new conf was set to buy)
  private val appliedDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (appliedDir.put(sc.applicationId, dir) != dir || sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(dir)
        ds.checkpoint()
      case None => ds.localCheckpoint()
    }
  }
}
