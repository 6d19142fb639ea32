package graft.tools

import graft.sources.Storage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the N-way (here four-table) join-chain IVM (q222) at
  * synthetic scale: dims A (1/100 of B), bridge B, facts C (4× B), and a
  * second dimension D (1/10 of B) with a 0.1% change batch on EVERY
  * table, comparing
  *
  *  - RECOMPUTE: the full A⋈B⋈C⋈D re-join + re-aggregation over the
  *    final row sets;
  *  - MAINTAIN: [[Storage.mergeJoinViewNDelta]] — the recursive fold's
  *    fifteen delta-restricted terms, every prefix restriction walking
  *    the chain with the delta-sized relation broadcast.
  *
  * Prints min-of-3 for both. The claim: maintenance scales with
  * |Δ|·fanout per level while recompute scales with the full chain join
  * — at 100 TB the difference between touching a batch's neighborhood
  * and re-joining four base tables.
  */
object ProfileJoinView4 {
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
    val nD = nB / 10

    val aOld = spark.range(nA).select(col("id").as("ka"),
      pmod(col("id"), lit(50L)).as("grp")).localCheckpoint()
    val bOld = spark.range(nB).select(pmod(col("id"), lit(nA)).as("ka"),
      col("id").as("kb")).localCheckpoint()
    val cOld = spark.range(nC).select(pmod(col("id"), lit(nB)).as("kb"),
      pmod(col("id") * 31L, lit(nD)).as("kc")).localCheckpoint()
    val dOld = spark.range(nD).select(col("id").as("kc"),
      (col("id") % 97).cast("double").as("value")).localCheckpoint()
    def delta(old: org.apache.spark.sql.DataFrame, insertFrom: Long, insertN: Long,
        mk: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column],
        delPred: org.apache.spark.sql.Column) = {
      val ins = spark.range(insertFrom, insertFrom + insertN)
        .select(mk(col("id")) :+ lit(1).as("sign"): _*)
      ins.unionByName(old.where(delPred).withColumn("sign", lit(-1))).localCheckpoint()
    }
    val aDelta = delta(aOld, nA, nA / 1000,
      id => Seq(id.as("ka"), pmod(id, lit(50L)).as("grp")), col("ka") % 1000 === 7)
    val bDelta = delta(bOld, nB, nB / 1000,
      id => Seq(pmod(id, lit(nA)).as("ka"), id.as("kb")), col("kb") % 1000 === 7)
    val cDelta = delta(cOld, nC, nC / 1000,
      id => Seq(pmod(id, lit(nB)).as("kb"), pmod(id * 31L, lit(nD)).as("kc")),
      col("kb") % 1000 === 13)
    val dDelta = delta(dOld, nD, nD / 1000,
      id => Seq(id.as("kc"), (id % 97).cast("double").as("value")), col("kc") % 1000 === 11)

    val view = aOld.join(bOld, Seq("ka")).join(cOld, Seq("kb")).join(dOld, Seq("kc"))
      .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .localCheckpoint()

    def applied(old: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame,
        cols: Seq[String]) =
      old.unionByName(d.where(col("sign") === 1).select(cols.map(col): _*))
        .exceptAll(d.where(col("sign") === -1).select(cols.map(col): _*))
    val aFin = applied(aOld, aDelta, Seq("ka", "grp")).localCheckpoint()
    val bFin = applied(bOld, bDelta, Seq("ka", "kb")).localCheckpoint()
    val cFin = applied(cOld, cDelta, Seq("kb", "kc")).localCheckpoint()
    val dFin = applied(dOld, dDelta, Seq("kc", "value")).localCheckpoint()

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; val s = (System.nanoTime() - t0) / 1e9
        (s, c)
      }
      println(f"[jv4-bench] $tag: min ${ts.map(_._1).min}%.2f s (rows ${ts.head._2})")
    }
    time(s"recompute (A=$nA B=$nB C=$nC D=$nD)") {
      aFin.join(bFin, Seq("ka")).join(cFin, Seq("kb")).join(dFin, Seq("kc"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .count()
    }
    time("maintain (mergeJoinViewNDelta, 0.1% batch on all four)") {
      Storage.mergeJoinViewNDelta(view,
        Seq(aOld, bOld, cOld, dOld), Seq(aDelta, bDelta, cDelta, dDelta),
        Seq("ka", "kb", "kc")).count()
    }
    spark.stop()
  }
}
