package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.Sequences
import org.apache.spark.sql.functions._

/** Round-10 batch 4: generic hamming blocking, perceptual frame hashes,
  * sequence-dataset construction.
  */
class Round10cSpec extends SparkSpec {
  import spark.implicits._

  test("hammingPairs: equals the all-pairs scan at any radius the blocking covers; " +
      "maxBucket drops pairs and the oversized report names the bucket") {
    // 40 signatures with planted near-pairs: id and id+100 differ in
    // exactly `id % 5` bits
    val sigs = (0 until 40).flatMap { i =>
      val base = (i.toLong * 2654435761L) & ((1L << 48) - 1)
      val mutated = (0 until i % 5).foldLeft(base)((s, b) => s ^ (1L << (b * 7)))
      Seq((i.toLong, base), (i + 100L, mutated))
    }.toDF("id", "sig")

    val got = Dedup.hammingPairs(sigs, $"id", $"sig", bits = 48, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rows = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(want.nonEmpty)

    // all-identical signatures: one bucket of 5 members per chunk; cap 4
    // must drop every pair and report the buckets
    val flat = (0L until 5L).map(i => (i, 12345L)).toDF("id", "sig")
    assert(Dedup.hammingPairs(flat, $"id", $"sig", 48, 3, maxBucket = 4).isEmpty)
    val over = Dedup.hammingOversizedBuckets(flat, $"id", $"sig", 48, 3, maxBucket = 4)
      .collect().map(r => r.getLong(2))
    assert(over.length == 4 && over.forall(_ == 5L), over.mkString(","))
  }

  test("frameAHash: hand-checked bits on a crafted payload; one-byte edits stay within " +
      "a small hamming radius (locality the exact hash lacks)") {
    // payload: 48 bytes, first 24 are 100, last 24 are 10 → mean 55,
    // bits 0..23 set
    val payload = Array.fill(24)(100.toByte) ++ Array.fill(24)(10.toByte)
    val media = Seq((1L, payload)).toDF("media_id", "payload")
    val out = Multimodal.frameAHash(media, frameBytes = 256, everyK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 1)
    assert(out(0) == ((1L, 0L, (1L << 20) + 0L, (1L << 24) - 1)))

    // flip one pixel: hash moves by at most a couple of bits
    val edited = payload.clone(); edited(3) = 10.toByte
    val h2 = Multimodal.frameAHash(Seq((1L, edited)).toDF("media_id", "payload"), 256, 1)
      .collect()(0).getLong(3)
    val moved = java.lang.Long.bitCount(((1L << 24) - 1) ^ h2)
    assert(moved >= 1 && moved <= 2, s"locality: expected a 1-2 bit move, got $moved")

    // frames shorter than 48 bytes zero-fill; empty payload → no frames
    val short = Multimodal.frameAHash(
      Seq((2L, Array.fill(10)(200.toByte))).toDF("media_id", "payload"), 256, 1)
      .collect().map(_.getLong(3))
    assert(short.length == 1) // 10 pixels of 200, 38 zeros → mean 41, bits 0..9
    assert(short(0) == (1L << 10) - 1)
    assert(Multimodal.frameAHash(
      Seq((3L, Array.empty[Byte])).toDF("media_id", "payload"), 256, 1).isEmpty)
  }

  test("nextEventPairs: hand-checked contexts in (ts, tiebreak) order; fewer than " +
      "`history` predecessors emit nothing; ties order by the tiebreak") {
    val rows = Seq(
      // user 1: a b c d e → examples at d (abc→d) and e (bcd→e)
      (1L, 10L, ts("2024-01-01 00:00:01"), "a"),
      (1L, 11L, ts("2024-01-01 00:00:02"), "b"),
      (1L, 12L, ts("2024-01-01 00:00:03"), "c"),
      (1L, 13L, ts("2024-01-01 00:00:04"), "d"),
      (1L, 14L, ts("2024-01-01 00:00:05"), "e"),
      // user 2: only 3 events → no example
      (2L, 20L, ts("2024-01-01 00:00:01"), "x"),
      (2L, 21L, ts("2024-01-01 00:00:02"), "y"),
      (2L, 22L, ts("2024-01-01 00:00:03"), "z"),
      // user 3: same-ts events ordered by id: p q r s → one example pqr→s
      (3L, 31L, ts("2024-01-01 00:00:01"), "p"),
      (3L, 32L, ts("2024-01-01 00:00:01"), "q"),
      (3L, 33L, ts("2024-01-01 00:00:01"), "r"),
      (3L, 34L, ts("2024-01-01 00:00:01"), "s")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Sequences.nextEventPairs(rows, $"user_id", $"ts", $"event_type", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(3), r.getString(4), r.getString(5), r.getString(2))).toSet
    assert(got == Set(
      (1L, 13L, "a", "b", "c", "d"),
      (1L, 14L, "b", "c", "d", "e"),
      (3L, 34L, "p", "q", "r", "s")), got.toString)
  }

  test("saltedEquiJoin: row-multiset-identical to the plain inner join under a hot key; " +
      "degenerate saltBuckets=1; colliding non-key columns rejected") {
    import graft.operators.Joins
    // hot key 7 dominates the large side
    val large = ((0 until 200).map(i => (7L, s"L$i")) ++
      (0 until 30).map(i => (i.toLong % 5, s"S$i"))).toDF("k", "lv")
    val small = Seq((7L, "seven"), (0L, "zero"), (2L, "two"), (99L, "unmatched"))
      .toDF("k", "rv")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"lv", $"rv").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = multiset(large.join(small, Seq("k")))
    assert(multiset(Joins.saltedEquiJoin(large, small, "k", 8)) == plain)
    assert(multiset(Joins.saltedEquiJoin(large, small, "k", 1)) == plain)
    assert(plain.values.sum == 200 + (0 until 30).count(i => Set(0L, 2L)(i % 5)))

    val colliding = small.withColumnRenamed("rv", "lv")
    val err = intercept[IllegalArgumentException] {
      Joins.saltedEquiJoin(large, colliding, "k", 4)
    }
    assert(err.getMessage.contains("lv"))
  }
}
