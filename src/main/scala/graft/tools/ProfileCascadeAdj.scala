package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the round-15 verdict's cascade-maintainer watch item: k-core /
  * k-truss expansion and peel rounds pay one column-pruned EDGE-STORE scan
  * per round for adjacency ([[graft.streaming.IngestKCore.adjOf]] — two
  * broadcast semi-joins over the full store), where a maintained
  * adjacency-bucketed relation (two oriented rows per edge, hash-bucket
  * partitioned on the endpoint) could partition-prune each probe to the
  * probe nodes' buckets.
  *
  * The harness builds a skewed store (Zipf-ish hub degrees) at a size
  * where the scan is NOT trivially cheap, then times R probe rounds of
  * each shape:
  *
  *  - `full`: `adjOf(store, probe)` — the shipped shape (full scan +
  *    broadcast semi-join, no shuffle);
  *  - `pruned`: oriented adjacency table read with a literal `bkt IN`
  *    filter (probe buckets collected driver-side — bounded by the bucket
  *    count, the [[graft.streaming.IvmMaintenance.rebuildTouchedBuckets]]
  *    discipline) + the same broadcast semi-join.
  *
  * Both produce identical adjacency row sets (asserted once). The decision
  * input is the per-round delta times the cascade's round count, against
  * the adjacency table's write amplification (2× rows per edge-store
  * rebuild).
  *
  * Usage: runMain graft.tools.ProfileCascadeAdj [nEdges] [buckets] [probeSize] [rounds]
  */
object ProfileCascadeAdj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    val nEdges = args.lift(0).map(_.toLong).getOrElse(10000000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val probeSize = args.lift(2).map(_.toInt).getOrElse(200)
    val rounds = args.lift(3).map(_.toInt).getOrElse(10)
    val nNodes = nEdges / 8

    // skewed graph: id-squashing makes low ids hubs (Zipf-ish degrees)
    def node(c: org.apache.spark.sql.Column, salt: Long) =
      pmod(pmod(hash(c * salt), lit(nNodes)) * pmod(hash(c * (salt + 7)), lit(997)), lit(nNodes))
    val raw = spark.range(nEdges).select(
      node(col("id"), 2654435761L).as("u0"), node(col("id"), 1327217885L).as("v0"))
    val edges = raw
      .select(least(col("u0"), col("v0")).as("u"), greatest(col("u0"), col("v0")).as("v"))
      .where(col("u") =!= col("v")).distinct()

    spark.sql("DROP TABLE IF EXISTS prof_cascade_store")
    spark.sql("DROP TABLE IF EXISTS prof_cascade_adj")
    edges.withColumn("bkt", pmod(hash(col("u")), lit(buckets)))
      .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable("prof_cascade_store")
    val store = spark.table("prof_cascade_store").select(col("u"), col("v"))
    store.select(col("u").as("x"), col("v").as("w"))
      .unionByName(store.select(col("v").as("x"), col("u").as("w")))
      .withColumn("bkt", pmod(hash(col("x")), lit(buckets)))
      .write.partitionBy("bkt").mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable("prof_cascade_adj")
    val adj = spark.table("prof_cascade_adj")
    val storedEdges = store.count()
    println(s"[cascade-adj] store: $storedEdges edges, $buckets buckets, " +
      s"probe $probeSize nodes x $rounds rounds")

    def probeOf(round: Int): DataFrame = graft.Materialize(
      spark.range(probeSize)
        .select(pmod(hash(col("id") + round * 1000003L), lit(nNodes)).as("node")).distinct())

    def fullScan(probe: DataFrame): DataFrame =
      graft.streaming.IngestKCore.adjOf(store, probe)
    def pruned(probe: DataFrame): DataFrame = {
      val bkts = probe.select(pmod(hash(col("node")), lit(buckets)).as("bkt"))
        .distinct().collect().map(_.getInt(0)).toSeq
      adj.where(col("bkt").isin(bkts: _*))
        .join(broadcast(probe.withColumnRenamed("node", "x")), Seq("x"), "left_semi")
        .select(col("x"), col("w"))
    }

    // parity check once: identical oriented adjacency row sets
    val p0 = probeOf(0)
    val a = fullScan(p0).groupBy(col("x")).agg(count(lit(1)).as("d"))
    val b = pruned(p0).groupBy(col("x")).agg(count(lit(1)).as("d"))
    require(a.join(b, Seq("x", "d"), "full_outer").where(col("x").isNull).isEmpty &&
      a.count() == b.count(), "full vs pruned adjacency mismatch")
    p0.unpersist()

    def time(label: String, mk: DataFrame => DataFrame): Double = {
      var total = 0.0
      for (r <- 1 to rounds) {
        val probe = probeOf(r)
        val t0 = System.nanoTime()
        mk(probe).write.format("noop").mode("overwrite").save()
        total += (System.nanoTime() - t0) / 1e9
        probe.unpersist()
      }
      val per = total / rounds
      println(f"[cascade-adj] $label%-7s: $per%.3f s/round ($total%.2f s total)")
      per
    }
    val f = time("full", fullScan)
    val p = time("pruned", pruned)
    println(f"[cascade-adj] pruned/full ratio: ${p / f}%.3f")
    spark.stop()
  }
}
