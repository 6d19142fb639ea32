package graft.tools

import graft.graphs.Graphs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runs [[Graphs.minimumSpanningForest]] at synthetic scale — the q216
  * gate's graph has 25 nodes, so this is the evidence the Borůvka loop
  * itself (component-min selection + component-graph contraction per
  * round) converges in the promised O(log n) rounds on a graph that
  * cannot fit a driver: default 1M nodes / 8M random edges. Prints the
  * wall time and the forest-size law check (nodes − components).
  */
object ProfileMsf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    val nodes = args.headOption.map(_.toLong).getOrElse(1000000L)
    val edges = nodes * 8
    // a connected-ish random multigraph: ring edges guarantee one
    // component; random chords carry random weights
    val ring = spark.range(nodes).select(col("id").as("u"),
      ((col("id") + 1) % nodes).as("v"), (col("id") % 1000 + 1000).as("w"))
    val chords = spark.range(edges).select(
      (col("id") * 2654435761L % nodes).as("u"),
      (col("id") * 1327217885L % nodes).as("v"),
      (col("id") % 997).as("w"))
    val e = ring.unionByName(chords).localCheckpoint()

    val t0 = System.nanoTime()
    val forest = Graphs.minimumSpanningForest(e, col("u"), col("v"), col("w"))
    val size = forest.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[msf-bench] $nodes%d nodes / ${edges + nodes}%d edges: " +
      f"forest $size%d edges in $secs%.2f s")
    // the ring guarantees connectivity: forest must be exactly nodes − 1
    require(size == nodes - 1, s"forest size $size != ${nodes - 1}")
    spark.stop()
  }
}
