package graft.streaming

import graft.sources.Storage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Cross-batch streaming CDC maintenance — the streaming face of
  * [[graft.sources.Storage.applyChanges]], run as a `foreachBatch` body:
  * each micro-batch of changes (payload + `op` upsert/delete + a
  * monotone version column) is merged into a persisted snapshot table,
  * latest-wins per key.
  *
  * Multiple changes to one key within a batch are handled by
  * `applyChanges`' rank directly (latest version wins, delete beats
  * upsert on a tie); changes split ACROSS batches converge to the same
  * snapshot as one big batch because a change applied earlier becomes a
  * snapshot row that any later-versioned change still beats — and an
  * EQUAL-versioned replay of it also beats it (change wins version
  * ties), which is what makes batch REPLAY idempotent.
  *
  * Durability contract: the merge writes to a staging table, then
  * rewrites the main table from staging (reading and overwriting one
  * table in a single plan is rejected by Spark — the hop is mandatory,
  * and it is what bounds the failure modes). A crash before the main
  * rewrite leaves the old snapshot intact; the engine redelivers the
  * batch and the staging rewrite is reproduced bit-identically
  * (idempotent replay, spec-proven). A crash DURING the main rewrite is
  * recovered the same way: replay re-runs the merge against whichever
  * snapshot state survived, and latest-wins converges.
  *
  * The snapshot table must exist before the stream starts (bootstrap it
  * with one `saveAsTable` of the initial state) — a missing table here
  * is a wiring error, loudly, not an implicit empty snapshot.
  *
  * Reference semantics: the reference's Aerospike/KV sinks
  * (`aerospike/aerospike.go`, the put shape) are last-write-wins by key;
  * this is that contract lifted to a queryable snapshot TABLE with
  * explicit versions, deletes, and replay safety.
  */
final class IngestUpsert(
    key: String,
    version: String,
    table: String
) extends ((DataFrame, Long) => Unit) with Serializable {

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(table),
      s"IngestUpsert: snapshot table '$table' must be initialized before the stream starts")
    val staging = s"${table}__staging"
    // read snapshots by PATH with a per-batch fresh file listing: a path
    // read builds its own listing at DataFrame creation — exactly "the
    // files as of the start of this batch" — instead of resolving
    // through the session's relation cache, so the loop cannot trip on
    // its own previous rewrite regardless of which session (the
    // micro-batch clone, a restarted query) runs the batch. NOTE for
    // readers in OTHER sessions: per-session relation caches are theirs
    // to refresh (`REFRESH TABLE`) after any rewrite behind their back —
    // the standard Spark contract; the refresh below covers this
    // session's name-based readers only.
    def pathOf(name: String): String =
      spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(name))
        .location.toString
    val next = Storage.applyChanges(
      spark.read.parquet(pathOf(table)), batch, col(key), col(version))
    next.write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.read.parquet(pathOf(staging))
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    // external readers of the NAME still need their caches dropped
    spark.sql(s"REFRESH TABLE $table")
  }
}
