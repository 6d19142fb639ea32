package graft

import org.apache.spark.sql.functions._

/** Round-17 hardening: the [[Fanout]] regime gate on the six round-16
  * repartition pins (the round-16 verdict's "local-mode-conditioned
  * repartitions" item — the fan-out pin must fire in the collapsed
  * local regime and must NOT insert an exchange when the upstream
  * relation is already at/above the session target width), asserted
  * both at the helper and through the operators that use it.
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private val target = spark.sessionState.conf.numShufflePartitions // 4 in tests

  test("Fanout.repartitionSelfIfNarrow pins a collapsed relation to the session " +
      "target and leaves an already-wide relation untouched (no exchange)") {
    val narrow = spark.range(0, 1000, 1, 1).toDF("id").localCheckpoint()
    val pinned = Fanout.repartitionSelfIfNarrow(narrow, col("id"))
    assert(pinned.rdd.getNumPartitions == target)
    assert(pinned.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"))

    val wide = spark.range(0, 1000, 1, target + 4).toDF("id").localCheckpoint()
    val same = Fanout.repartitionSelfIfNarrow(wide, col("id"))
    assert(same.rdd.getNumPartitions == target + 4)
    assert(!same.queryExecution.executedPlan.toString.contains("Exchange"),
      same.queryExecution.executedPlan.toString)
  }

  test("Dedup.repeatedSpans: the gram-explode pin fires on a collapsed docs scan " +
      "and is absent when docs is already wide; spans identical either way") {
    val docs = (0 until 40).map { i =>
      val boiler = "the quick brown fox jumps over the lazy dog "
      (i.toLong, if (i % 2 == 0) boiler + s"unique tail $i" else s"solo text $i with no repeats at all")
    }
    val narrowDocs = docs.toDF("doc_id", "text").repartition(1).localCheckpoint()
    val wideDocs = docs.toDF("doc_id", "text").repartition(target + 4).localCheckpoint()
    val pNarrow = graft.dedup.Dedup.repeatedSpans(narrowDocs, col("text"), col("doc_id"))
    val pWide = graft.dedup.Dedup.repeatedSpans(wideDocs, col("text"), col("doc_id"))
    assert(pNarrow.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"))
    assert(!pWide.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"),
      pWide.queryExecution.executedPlan.toString)
    // the pin is pure placement: the reported spans must be identical
    val a = pNarrow.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = pWide.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("IVF.joinTopK: the salted-corpus pin fires on a collapsed corpus scan and " +
      "is absent when the corpus is already wide; neighbours identical either way") {
    val cents = graft.similarity.IVF.pretrainedCentroids
    val dim = cents.head.length
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(dim)(j => math.sin(i * 31 + j * 7).toFloat))
    }
    val narrowC = vecs.toDF("vec_id", "embedding").repartition(1).localCheckpoint()
    val wideC = vecs.toDF("vec_id", "embedding").repartition(target + 4).localCheckpoint()
    def run(corpus: org.apache.spark.sql.DataFrame) =
      graft.similarity.IVF.joinTopK(
        corpus, corpus, col("vec_id"), col("embedding"),
        k = 3, nProbe = 2, centroids = cents)
    val pNarrow = run(narrowC)
    val pWide = run(wideC)
    assert(pNarrow.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"))
    assert(!pWide.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"),
      pWide.queryExecution.executedPlan.toString)
    val a = pNarrow.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = pWide.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("triangleCounts: the streamed-side pin fires when the oriented checkpoint " +
      "collapses (local regime) — counts identical with and without wide input") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
      (5L, 6L), (6L, 7L), (5L, 7L))
    val narrowE = edges.toDF("a", "b").repartition(1).localCheckpoint()
    val wideE = edges.toDF("a", "b").repartition(target + 4).localCheckpoint()
    def counts(df: org.apache.spark.sql.DataFrame) =
      graft.graphs.Graphs.triangleCounts(df, col("a"), col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(counts(narrowE) == counts(wideE))
  }
}
