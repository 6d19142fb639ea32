package graft.tools

import graft.sources.Storage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two-store quantile pattern's RELAY CADENCE trade
  * (q235/q241 gate correctness; this harness gates the POLICY): the
  * maintained hash-bucket base is write-optimized, the Z-ordered serve
  * layout ([[Storage.writeQuantileServeLayout]]) is read-optimized, and
  * re-laying costs a full base rewrite. The decision inputs:
  *
  *  - `relay`: wall cost of one re-lay (full base → Z-ordered file set);
  *  - `serve-base`: one exact-quantile serve straight off the hash-bucket
  *    base ([[Storage.quantilesFromCells]] — always available, always
  *    current);
  *  - `serve-layout`: the same serve through the candidate-pruned layout
  *    read ([[Storage.quantilesFromCellsLayout]]).
  *
  * The crossover is serves-per-relay = relay / (serve_base −
  * serve_layout): re-lay after every batch only when at least that many
  * serves land between changes; below it, serve from the base (or re-lay
  * on demand). Prints all three (min-of-3) and the computed crossover.
  *
  * Usage: runMain graft.tools.ProfileQuantileRelay [nRows]
  */
object ProfileQuantileRelay {
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
    val scale = 10
    val grpBuckets = 16
    val bits = 8
    val files = 64
    val qs = Seq(0.5, 0.9, 0.99)
    val scratch = graft.GraftSession.tempDirCleanedOnExit("graft_relay_prof_")

    val base = spark.range(n).select(
      col("id").as("row_id"),
      pmod(col("id"), lit(groups)).as("grp"),
      (col("id") * 2654435761L % 1000003L).cast("double").as("value"))
      .localCheckpoint()
    val cells = base.groupBy(col("grp"), Storage.dyadicCell(col("value"), scale).as("cell"))
      .agg(count(lit(1)).as("rc"))
      .localCheckpoint()

    def time(tag: String)(f: Int => Long): Double = {
      val ts = (1 to 3).map { i =>
        val t0 = System.nanoTime(); val c = f(i); ((System.nanoTime() - t0) / 1e9, c)
      }
      val m = ts.map(_._1).min
      println(f"[relay-bench] $tag%-13s: min $m%.2f s (rows ${ts.head._2})")
      m
    }

    val relay = time("relay") { i =>
      Storage.writeQuantileServeLayout(
        base, "grp", "value", scale, grpBuckets, bits, files, s"$scratch/layout_$i")
      n
    }
    val layoutPath = s"$scratch/layout_1"
    val serveBase = time("serve-base") { _ =>
      Storage.quantilesFromCells(cells, base, "grp", "value", scale, qs).count()
    }
    val serveLayout = time("serve-layout") { _ =>
      Storage.quantilesFromCellsLayout(
        spark, layoutPath, cells, "grp", "value", scale, qs, grpBuckets).count()
    }
    val saving = serveBase - serveLayout
    if (saving > 0)
      println(f"[relay-bench] crossover: relay pays at >= ${relay / saving}%.1f serves per batch " +
        f"(relay $relay%.2f s / saving $saving%.2f s per serve)")
    else
      println(f"[relay-bench] layout serve no faster at this scale (base $serveBase%.2f s, " +
        f"layout $serveLayout%.2f s) — serve from the base, relay on demand")
    spark.stop()
  }
}
