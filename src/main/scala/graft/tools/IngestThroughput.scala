package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Reproducible throughput measurement for the streaming ingest-dedup loop
  * ([[graft.streaming.IngestDedup]]): feeds the SF documents table through
  * the foreachBatch loop in `nBatches` equal micro-batches (each ~50%
  * overlapping the previous one — the duplicate-heavy crawl shape) and
  * prints per-batch wall times plus the novelty counts.
  *
  * Usage: `sbt "runMain graft.tools.IngestThroughput [sfDir] [nBatches]"`.
  * Numbers land in SCALING.md (round-8 section).
  */
object IngestThroughput {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val table = "graft_ingest_throughput_idx"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val n = docs.length
    // overlapping slices: batch i covers [i, i+2) / nBatches+1 of the corpus
    val step = n / (nBatches + 1)
    val slices = (0 until nBatches).map(i => docs.slice(i * step, (i + 2) * step))

    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ingest = graft.streaming.IngestDedup(
      col("text"), table, expectedItems = math.max(n.toLong * 2, 1000L)) {
      (novel, _) => counts += novel.count()
    }
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "text").writeStream.foreachBatch(ingest).start()
    try {
      slices.zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        in.addData(b.toIndexedSeq)
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"INGEST_BATCH=$i rows=${b.length} novel=${counts.last} sec=$dt%.3f")
      }
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    println(s"INGEST_TOTAL_DISTINCT=${counts.sum}")
    spark.stop()
  }
}
