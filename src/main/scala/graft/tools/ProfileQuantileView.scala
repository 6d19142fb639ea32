package graft.tools

import graft.sources.Storage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the quantile-view IVM shape (q204) at synthetic scale: given a
  * maintained base of `n` rows and a small change batch (0.1%), compares
  *
  *  - RECOMPUTE: exact per-group quantiles from scratch over the final
  *    rows ([[graft.curation.Quantiles.exactQuantiles]] — itself already
  *    the one-scan dyadic-seed engine, the strongest honest baseline);
  *  - MAINTAIN+SERVE: [[Storage.mergeQuantileCellsDelta]] (delta
  *    arithmetic on the bounded cell state) followed by
  *    [[Storage.quantilesFromCells]] (rank bracketing on the state, value
  *    resolution over candidate-cell rows only).
  *
  * The IVM claim is NOT that one serve beats one recompute by orders of
  * magnitude at local scale — it is that maintenance cost is ∝ |Δ| + state
  * and the serve reads ~1/|cells| of the base, so the gap widens with
  * base size and with recompute frequency. Prints min-of-3 for each arm
  * plus the candidate-row share the serve actually scanned.
  */
object ProfileQuantileView {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = 16L
    val scale = 10 // cells 1024 wide over a ~1e6 value range → ~1k cells/group
    val qs = Seq(0.5, 0.9, 0.99)

    val base = spark.range(n).select(
      col("id").as("row_id"),
      pmod(col("id"), lit(groups)).as("grp"),
      (col("id") * 2654435761L % 1000003L).cast("double").as("value"))
      .localCheckpoint()
    val cells = base.groupBy(col("grp"), Storage.dyadicCell(col("value"), scale).as("cell"))
      .agg(count(lit(1)).as("rc"))
      .localCheckpoint()
    // the change batch: 0.1% fresh inserts, 0.1% deletes
    val inserts = spark.range(n, n + n / 1000).select(
      col("id").as("row_id"),
      pmod(col("id"), lit(groups)).as("grp"),
      (col("id") * 1327217885L % 999983L).cast("double").as("value"))
      .localCheckpoint()
    val deleteIds = spark.range(0, n, 1000).select(col("id").as("row_id"))
      .localCheckpoint()
    val finalBase = base.join(deleteIds, Seq("row_id"), "left_anti")
      .unionByName(inserts).localCheckpoint()

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; val s = (System.nanoTime() - t0) / 1e9
        (s, c)
      }
      println(f"[qview-bench] $tag: min ${ts.map(_._1).min}%.2f s (rows ${ts.head._2})")
    }

    // the per-batch alternative the IVM shape replaces: re-deriving the
    // quantiles from scratch on EVERY change batch (exactQuantiles is
    // itself the one-scan dyadic-seed engine — the strongest baseline)
    time(s"recompute-per-batch: exactQuantiles over ${n} final rows") {
      graft.curation.Quantiles.exactQuantiles(
        finalBase, col("grp"), col("value"), qs).count()
    }
    // the per-batch IVM cost: pure delta arithmetic on the bounded state
    // (the one base touch is the delete-id semi-join recovering deleted
    // rows' values — bucket-pruned on a production base layout)
    time("maintain-per-batch: mergeQuantileCellsDelta") {
      Storage.mergeQuantileCellsDelta(
        cells, base, inserts, deleteIds, "row_id", "grp", "value", scale).count()
    }
    val maintained = Storage.mergeQuantileCellsDelta(
      cells, base, inserts, deleteIds, "row_id", "grp", "value", scale)
      .localCheckpoint()
    // the per-read serve cost: rank bracketing on the state + ONE base
    // pass whose join keeps only candidate-cell rows before any
    // aggregation (vs the recompute's seed scan + final-pass scan)
    time("serve-per-read: quantilesFromCells from maintained state") {
      Storage.quantilesFromCells(maintained, finalBase, "grp", "value", scale, qs).count()
    }
    val brackets = maintained.count() // state size
    val candRows = finalBase
      .withColumn("cell", Storage.dyadicCell(col("value"), scale))
      .join(
        Storage.quantilesFromCells(maintained, finalBase, "grp", "value", scale, qs)
          .select(col("g").as("grp"), Storage.dyadicCell(col("value"), scale).as("cell"))
          .distinct(),
        Seq("grp", "cell"), "left_semi")
      .count()
    println(f"[qview-bench] state cells $brackets; candidate-cell rows $candRows " +
      f"of ${finalBase.count()} (${candRows.toDouble / finalBase.count() * 100}%.2f%%)")
    spark.stop()
  }
}
