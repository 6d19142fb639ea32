package graft.tools

import graft.functions.Hashing
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures what the AllPairs size-ratio LENGTH FILTER buys
  * [[graft.dedup.Dedup.jaccardJoinSets]]: replays the q175 candidate
  * stage (width-3 shingle hashes, t = 0.5) with and without the
  * `t ≤ sa/sb ≤ 1/t` predicate and prints the prefix-join row count
  * (the `.distinct()` input) and the distinct candidate count for both.
  * The filter is exact (J ≥ t forces the ratio bound), so `with` ⊆
  * `without`; the delta is pure saved verification work.
  */
object ProfileJaccardCand {
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

    val m = 5000 // t = 0.5 as m/10000 — the q175 config
    val docs = Tables.documents(spark, d)
    val dt = graft.Materialize(docs.select(col("doc_id"),
      explode(array_distinct(Hashing.shingleHashSet(col("text"), 3))).as("term")))
    val sizes = dt.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val order = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ceilTs = expr(s"(sz * $m + 9999) div 10000")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("term").asc)
    val prefix = graft.Materialize(dt.join(order, Seq("term"))
      .join(sizes, Seq("doc_id"))
      .withColumn("pos", row_number().over(byDoc))
      .where(col("pos") <= col("sz") - ceilTs + 1)
      .select(col("term"), col("doc_id"), col("sz")))

    def cand(lengthFilter: Boolean) = {
      val base = prefix.select(col("term"), col("doc_id").as("doc_a"), col("sz").as("sa"))
        .join(prefix.select(col("term"), col("doc_id").as("doc_b"), col("sz").as("sb")),
          Seq("term"))
        .where(col("doc_a") < col("doc_b"))
      val cut =
        if (lengthFilter)
          base.where(col("sb") * m <= col("sa") * 10000 && col("sa") * m <= col("sb") * 10000)
        else base
      val pre = cut.count()
      val post = cut.select(col("doc_a"), col("doc_b")).distinct().count()
      (pre, post)
    }
    val (preOff, postOff) = cand(lengthFilter = false)
    val (preOn, postOn) = cand(lengthFilter = true)
    println(s"[jaccard-cand] sf=$d t=0.5 shingle3")
    println(s"[jaccard-cand] length filter OFF: prefix-join rows=$preOff distinct candidates=$postOff")
    println(s"[jaccard-cand] length filter ON : prefix-join rows=$preOn distinct candidates=$postOn")
    println(f"[jaccard-cand] pruned ${100.0 * (postOff - postOn) / math.max(postOff, 1)}%.1f%% of candidates")
    spark.stop()
  }
}
