package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-11 measurement of the triangle-machinery Bloom wedge prefilter
  * (the round-10 verdict's "measure it honestly" item): runs q155/q161
  * with the prefilter ON and OFF (`-Dgraft.triangles.bloom`), reporting
  * wall time AND total shuffle records written per run — the prefilter's
  * claim is precisely "exchange rows ~|wedges| → ~|triangles| + filter
  * build", so the record delta is the direct evidence. Also times the
  * [[graft.graphs.Graphs.triangleAnalysis]] composition to split q161's
  * cost into the shared machinery vs its per-edge rollup + degree joins.
  */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)

    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    })
    def run(label: String)(f: => Unit): Unit = {
      shuffleRecords.set(0)
      val t0 = System.nanoTime()
      f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"$label: $secs%.2f s, shuffle records written = ${shuffleRecords.get()}%,d")
    }

    graft.sources.Tables.lineitem(spark, d).write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.functions.col
    for (mode <- Seq("force", "off"); rep <- 1 to 3) {
      System.setProperty("graft.triangles.bloom", mode)
      run(s"[bloom=$mode rep$rep] q155_triangles") {
        graft.SparkEntry.queries("q155_triangles")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      run(s"[bloom=$mode rep$rep] q161_edge_jaccard") {
        graft.SparkEntry.queries("q161_edge_jaccard")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // The at-scale regime: when the oriented edge relation exceeds the
    // broadcast threshold, the closing semi-join SHUFFLES the wedge
    // relation on (v1, v2) — emulate it by disabling broadcast and
    // measure what the prefilter saves there
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (mode <- Seq("force", "off"); rep <- 1 to 3) {
      System.setProperty("graft.triangles.bloom", mode)
      run(s"[noBcast bloom=$mode rep$rep] q155_triangles") {
        graft.SparkEntry.queries("q155_triangles")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    System.setProperty("graft.triangles.bloom", "auto")

    // q161 anatomy via the shared composition: machinery+materialize once,
    // then each readout priced separately off the cached triangles
    for (rep <- 1 to 2) {
      var tc: org.apache.spark.sql.DataFrame = null
      var ej: org.apache.spark.sql.DataFrame = null
      run(s"[anatomy rep$rep] machinery build + wedge join (materialize)") {
        val (a, b) = graft.graphs.Graphs.triangleAnalysis(
          coEdges(spark, d), col("pa"), col("pb"))
        tc = a; ej = b
      }
      run(s"[anatomy rep$rep] counts readout (cached triangles)") {
        tc.write.format("noop").mode("overwrite").save()
      }
      run(s"[anatomy rep$rep] edge-jaccard readout (cached triangles)") {
        ej.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }

  /** The q155/q161 co-order edge relation (mirrors GraphGates.coOrderPairs). */
  private def coEdges(spark: SparkSession, d: String) = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), greatest(size(col("ps")) - i - 1, lit(0))),
          y => struct(x.as("pa"), y.as("pb"))))))
        .as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
  }
}
