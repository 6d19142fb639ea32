package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: frame sampling and the resize stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaOf(pairs: (Long, String)*) =
    Multimodal.fromDocuments(
      pairs.toSeq.toDF("doc_id", "text").withColumn("source", lit("spec")))

  test("sampleFrames: fixed-size frames, every k-th kept, ragged tail exact") {
    val media = mediaOf((1L, "a" * 25), (2L, "xy"), (3L, ""))
    val out = Multimodal.sampleFrames(media, frameBytes = 10, everyK = 2)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq).toMap
    // doc1: 25 bytes -> frames 0..2 (10,10,5); every 2nd -> 0 and 2
    assert(out(1L) == Seq((0L, 10L), (2L, 5L)))
    // doc2: single short frame 0
    assert(out(2L) == Seq((0L, 2L)))
    // empty payload -> no frames
    assert(!out.contains(3L))
    // frame content hash matches hashing the same slice directly
    val h = Multimodal.sampleFrames(media, 10, 2)
      .where(col("media_id") === 1L && col("frame_idx") === 2L)
      .select("frame_hash").as[Long].head()
    val expect = Seq("a" * 5).toDF("s")
      .select(graft.functions.Hashing.hash48(col("s"))).as[Long].head()
    assert(h == expect)
  }

  test("sampleFrames: the declarative pipeline is row-identical to the mapPartitions " +
      "reference — real payloads plus empty/ragged/stride edges") {
    val media = mediaOf(
      (1L, "a" * 25), (2L, "xy"), (3L, ""), (4L, "z" * 64),
      (5L, (0 until 97).map(i => ('a' + i % 26).toChar).mkString))
    for ((fb, k) <- Seq((10, 2), (7, 1), (64, 3))) {
      val got = Multimodal.sampleFrames(media, fb, k)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val want = Multimodal.sampleFramesRdd(media, fb, k)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"frameBytes=$fb everyK=$k")
    }
  }

  test("resizeStub: byte decimation with metadata kept consistent") {
    val media = mediaOf((1L, "abcdefghij"))
    val out = Multimodal.resizeStub(media, factor = 3)
    val row = out.select(col("media_id"), col("payload"), col("meta.n_bytes"), col("meta.kind")).head()
    val bytes = row.getAs[Array[Byte]](1)
    assert(new String(bytes, "UTF-8") == "adgj") // every 3rd byte
    assert(row.getLong(2) == 4L) // n_bytes tracks the resized payload
    assert(out.schema == Multimodal.mediaSchema) // stays a valid media table
  }
}
