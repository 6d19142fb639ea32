package graft.tools

import graft.sources.Storage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the three-way join-view IVM (q212) at synthetic scale: a
  * star-ish schema (dim A 1/100th of bridge B, facts C 4× B) with a 0.1%
  * change batch on EVERY table, comparing
  *
  *  - RECOMPUTE: the full A⋈B⋈C re-join + re-aggregation over the final
  *    row sets (what a view refresh without delta maintenance costs on
  *    every batch);
  *  - MAINTAIN: [[Storage.mergeJoinView3Delta]] — seven delta-restricted
  *    terms, the one both-base term semi-pruned to ΔC's keys.
  *
  * Prints min-of-3 for both. The claim being measured: maintenance cost
  * scales with |Δ|·fanout while recompute scales with |B ⋈ C|, so the
  * gap widens linearly with base size.
  */
object ProfileJoinView3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    val nB = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nA = nB / 100
    val nC = nB * 4

    val aOld = spark.range(nA).select(col("id").as("ka"),
      pmod(col("id"), lit(50L)).as("grp")).localCheckpoint()
    val bOld = spark.range(nB).select(pmod(col("id"), lit(nA)).as("ka"),
      col("id").as("kb")).localCheckpoint()
    val cOld = spark.range(nC).select(pmod(col("id"), lit(nB)).as("kb"),
      (col("id") % 97).cast("double").as("value")).localCheckpoint()
    val aDelta = spark.range(nA, nA + nA / 1000).select(col("id").as("ka"),
      pmod(col("id"), lit(50L)).as("grp"), lit(1).as("sign"))
      .unionByName(aOld.where(col("ka") % 1000 === 7).withColumn("sign", lit(-1)))
      .localCheckpoint()
    val bDelta = spark.range(nB, nB + nB / 1000).select(pmod(col("id"), lit(nA)).as("ka"),
      col("id").as("kb"), lit(1).as("sign"))
      .unionByName(bOld.where(col("kb") % 1000 === 7).withColumn("sign", lit(-1)))
      .localCheckpoint()
    val cDelta = spark.range(nC, nC + nC / 1000).select(pmod(col("id"), lit(nB)).as("kb"),
      (col("id") % 97).cast("double").as("value"), lit(1).as("sign"))
      .unionByName(cOld.where(col("kb") % 1000 === 13).withColumn("sign", lit(-1)))
      .localCheckpoint()
    val view = aOld.join(bOld, Seq("ka")).join(cOld, Seq("kb"))
      .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .localCheckpoint()

    // the final row sets a refresh-from-scratch would aggregate
    def applied(old: org.apache.spark.sql.DataFrame, delta: org.apache.spark.sql.DataFrame,
        cols: Seq[String]) =
      old.unionByName(delta.where(col("sign") === 1).select(cols.map(col): _*))
        .exceptAll(delta.where(col("sign") === -1).select(cols.map(col): _*))
    val aFin = applied(aOld, aDelta, Seq("ka", "grp")).localCheckpoint()
    val bFin = applied(bOld, bDelta, Seq("ka", "kb")).localCheckpoint()
    val cFin = applied(cOld, cDelta, Seq("kb", "value")).localCheckpoint()

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; val s = (System.nanoTime() - t0) / 1e9
        (s, c)
      }
      println(f"[jv3-bench] $tag: min ${ts.map(_._1).min}%.2f s (rows ${ts.head._2})")
    }
    time(s"recompute-per-batch: re-join A(${nA}) x B(${nB}) x C(${nC})") {
      aFin.join(bFin, Seq("ka")).join(cFin, Seq("kb"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .count()
    }
    time("maintain-per-batch: mergeJoinView3Delta (7 delta-restricted terms)") {
      Storage.mergeJoinView3Delta(view, aOld, bOld, cOld, aDelta, bDelta, cDelta).count()
    }
    spark.stop()
  }
}
