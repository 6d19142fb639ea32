package graft

import graft.streaming.StreamingFlows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-profile semantics via MemoryStream + memory sink — the
  * deterministic analogue of the reference's channel-harness tests
  * (flow/flow_test.go:62-74 ingestDeferred).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def drain(name: String)(start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val q = start
    try q.processAllAvailable()
    finally q.stop()
  }

  test("text-curation stage runs unchanged on a stream: kernels are stateless row expressions") {
    import graft.functions.{Hashing, TextFunctions}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // quality + langid + fingerprint + simhash + token count — the
    // per-document analysis stage of the batch curation pipeline, verbatim
    // on an unbounded stream (no watermark, no state: all projections —
    // langId via the column decision form, marker counts via LangCountsF)
    val curated = in.toDF().toDF("doc_id", "text")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("fingerprint", Hashing.fingerprint(col("text"), 8))
      .withColumn("simhash", Hashing.simhashDoc(col("text")))
      .withColumn("n_tokens", TextFunctions.wsTokenCount(col("text")))
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
    drain("curate_out") {
      val q = curated.writeStream.format("memory").queryName("curate_out").outputMode("append").start()
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "short"))
      q
    }
    val rows = spark.table("curate_out")
      .select("doc_id", "fingerprint", "simhash", "n_tokens", "lang_pred")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0)._2 == rows(1)._2 && rows(0)._3 == rows(1)._3) // identical docs agree
    assert(rows(2)._2 == Hashing.Prime) // no 8-byte gram -> sentinel
    assert(rows(0)._5 == "en" && rows(2)._5 == "und")
    // streaming values == batch values for the same rows, including the
    // table-form langIdTable (a pure projection since LangCountsF)
    val batch = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val b = batch.select(Hashing.fingerprint(col("text"), 8), Hashing.simhashDoc(col("text")))
      .as[(Long, Long)].head()
    assert((rows(0)._2, rows(0)._3) == b)
    val lid = TextFunctions.langIdTable(batch, col("text"), col("doc_id"))
      .as[(Long, String)].head()
    assert(lid._2 == rows(0)._5)
  }

  test("foldRunning emits the accumulator after every element per key (flow/fold.go:83-90)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val out = StreamingFlows.foldRunning[String, (String, Int), Int](_._1, 0, (acc, v) => acc + v._2)
      .apply(in.toDS()).toDF("key", "acc")
    drain("fold_out") {
      val q = out.writeStream.format("memory").queryName("fold_out").outputMode("append").start()
      in.addData(("a", 1), ("a", 2), ("b", 10))
      q
    }
    val rows = spark.table("fold_out").as[(String, Int)].collect().sorted
    assert(rows.toSeq == Seq(("a", 1), ("a", 3), ("b", 10)))
  }

  test("batchCountOrTime: count trigger closes full batches, remainder stays buffered (flow/batch.go:86-96)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamingFlows.batchCountOrTime[Int, String](_ => 1, maxBatchSize = 4, maxLatencyMs = 60000)
      .apply(in.toDS()).map { case (_, batch) => batch.mkString(",") }.toDF("batch")
    // NOTE: with ProcessingTimeTimeout registered, the engine keeps running
    // empty micro-batches to evaluate timers, so processAllAvailable never
    // settles — poll the sink with a deadline instead.
    val q = out.writeStream.format("memory").queryName("batch_out").outputMode("append").start()
    try {
      in.addData("a", "b", "c", "d", "e", "f", "g", "h", "i")
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("batch_out").count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      // 9 elements, batch=4: two full batches emitted; "i" awaits count-or-timeout
      val rows = spark.table("batch_out").as[String].collect().toSeq.sorted
      assert(rows == Seq("a,b,c,d", "e,f,g,h"))
    } finally q.stop()
  }

  test("batchCountOrTime: time trigger flushes the partial batch (flow/batch.go:89-96)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamingFlows.batchCountOrTime[Int, String](_ => 1, maxBatchSize = 100, maxLatencyMs = 2000)
      .apply(in.toDS()).map { case (_, batch) => batch.mkString(",") }.toDF("batch")
    val q = out.writeStream.format("memory").queryName("batch_time_out").outputMode("append").start()
    try {
      in.addData("x", "y", "z")
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("batch_time_out").count() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val rows = spark.table("batch_time_out").as[String].collect().toSeq
      assert(rows == Seq("x,y,z")) // flushed by the processing-time timer, not count
    } finally q.stop()
  }

  test("event-time tumbling window with watermark closes and drops late data (flow/sliding_window.go:162-165)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = StreamingFlows.tumbling("_1", "1 minute", "30 seconds", Nil,
      Seq(sort_array(collect_list(col("_2"))).as("vs")))(in.toDF())
      .select(col("window.start").cast("long").as("s"), col("vs"))
    val q = agg.writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:40"), "b"))
      q.processAllAvailable()
      // watermark advances past 00:01:00+30s -> first window closes
      in.addData((ts("2024-01-01 00:02:00"), "c"))
      q.processAllAvailable()
      // this event is older than the watermark -> dropped (late data)
      in.addData((ts("2024-01-01 00:00:20"), "late"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:05:00"), "d"))
      q.processAllAvailable()
      val rows = spark.table("win_out").as[(Long, Seq[String])].collect().toMap
      val t0 = ts("2024-01-01 00:00:00").getTime / 1000
      assert(rows(t0) == Seq("a", "b")) // closed window excludes the late event
      assert(rows.contains(t0 + 120))
    } finally q.stop()
  }

  test("throttleDiscard caps elements per key within a period (flow/throttler.go:119-124)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamingFlows.throttleDiscard[Int, String](_ => 1, quota = 3, periodMs = 3600000L)
      .apply(in.toDS()).toDF("v")
    drain("thr_out") {
      val q = out.writeStream.format("memory").queryName("thr_out").outputMode("append").start()
      in.addData("a", "b", "c", "d", "e")
      q
    }
    assert(spark.table("thr_out").count() == 3)
  }

  test("keyedTransformWithState: per-key running count via Spark 4 state API (flow/keyed.go:131-158)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Int)]
      val out = StreamingFlows.keyedTransformWithState[String, (String, Int), Int, (String, Int)](
        _._1, 0, (n, v) => (n + 1, Seq((v._1, n + 1)))
      ).apply(in.toDS()).toDF("key", "seen")
      val q = out.writeStream.format("memory").queryName("tws_out").outputMode("append").start()
      try {
        in.addData(("a", 10), ("a", 20), ("b", 1))
        q.processAllAvailable()
        in.addData(("a", 30)) // state survives across micro-batches
        q.processAllAvailable()
        val rows = spark.table("tws_out").as[(String, Int)].collect().sorted
        assert(rows.toSeq == Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("keyedTransformWithState with TTL: expired state restarts from init (TTLConfig path)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Int)]
      val out = StreamingFlows.keyedTransformWithState[String, (String, Int), Int, (String, Int)](
        _._1, 0, (acc, v) => { val n = acc + v._2; (n, Seq((v._1, n))) },
        ttl = java.time.Duration.ofMillis(1200)
      ).apply(in.toDS()).toDF("key", "acc")
      // NOTE: with TimeMode.ProcessingTime the engine keeps running batches
      // for timer evaluation, so processAllAvailable may never settle —
      // poll the sink with a deadline (cf. batchCountOrTime tests).
      val q = out.writeStream.format("memory").queryName("tws_ttl_out").outputMode("append").start()
      try {
        def accs() = spark.table("tws_ttl_out").as[(String, Int)].collect().map(_._2).toSet
        val deadline = System.currentTimeMillis() + 90000
        in.addData(("a", 5))
        while (!accs().contains(5) && System.currentTimeMillis() < deadline) Thread.sleep(200)
        assert(accs().contains(5))
        var restarted = false
        while (!restarted && System.currentTimeMillis() < deadline) {
          Thread.sleep(2500) // let the value-state TTL lapse
          in.addData(("a", 7))
          val waitUntil = math.min(System.currentTimeMillis() + 10000, deadline)
          while (!restarted && System.currentTimeMillis() < waitUntil) {
            // 7, not 12: state.get() past its TTL reads as absent -> init
            restarted = accs().contains(7)
            if (!restarted) Thread.sleep(200)
          }
        }
        assert(restarted, s"expected TTL restart, got ${accs()}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("throttleDiscardTWS: per-key quota within a period; TTL below the period refused") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      intercept[IllegalArgumentException] {
        StreamingFlows.throttleDiscardTWS[Int, (Int, String)](
          _._1, quota = 3, periodMs = 3600000L,
          stateTtl = java.time.Duration.ofMillis(500))
      }
      val in = MemoryStream[(Int, String)]
      val out = StreamingFlows.throttleDiscardTWS[Int, (Int, String)](
        _._1, quota = 3, periodMs = 3600000L,
        stateTtl = java.time.Duration.ofHours(2)).apply(in.toDS())
      val q = out.toDF("k", "v").writeStream.format("memory")
        .queryName("tws_thr_out").outputMode("append").start()
      try {
        // ProcessingTime mode: NEVER processAllAvailable (it may not
        // settle — the SKILL gotcha); poll the sink with a deadline
        def rows() = spark.table("tws_thr_out").as[(Int, String)].collect()
        val deadline = System.currentTimeMillis() + 90000
        in.addData((1, "a"), (1, "b"), (1, "c"), (1, "d"), (2, "x"))
        while (rows().length < 4 && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        // quota persists ACROSS batches within the hour-long period
        in.addData((1, "e"), (2, "y"))
        while (rows().count(_._1 == 2) < 2 && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        val got = rows()
        assert(got.count(_._1 == 1) == 3, got.toSeq.toString)
        assert(got.count(_._1 == 2) == 2, got.toSeq.toString)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batchCountOrTimeTWS: count trigger flushes inline, the per-key TIMER flushes the partial tail") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // a TTL shorter than the latency would evict a live batch before its
      // time trigger — rejected at construction
      intercept[IllegalArgumentException] {
        StreamingFlows.batchCountOrTimeTWS[Int, (Int, String)](
          _._1, 3, 1000L, stateTtl = java.time.Duration.ofMillis(500))
      }
      val in = MemoryStream[(Int, String)]
      val out = StreamingFlows.batchCountOrTimeTWS[Int, (Int, String)](
        _._1, maxBatchSize = 3, maxLatencyMs = 700L,
        stateTtl = java.time.Duration.ofSeconds(60)).apply(in.toDS())
      val q = out.map { case (k, vs) => (k, vs.map(_._2).mkString) }.toDF("k", "chunk")
        .writeStream.format("memory").queryName("tws_batch_out").outputMode("append").start()
      try {
        def chunks() = spark.table("tws_batch_out").as[(Int, String)].collect().toSet
        // ProcessingTime timers: poll with a deadline, never
        // processAllAvailable (it may not settle — the SKILL gotcha)
        val deadline = System.currentTimeMillis() + 90000
        in.addData((1, "a"), (1, "b"), (1, "c"), (1, "d"))
        // count trigger: "abc" flushes inline within the arrival batch
        while (!chunks().contains((1, "abc")) && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(chunks().contains((1, "abc")), chunks().toString)
        // time trigger: the "d" tail flushes once its 700 ms timer fires —
        // nudge micro-batches on fresh keys give the engine batch cadence
        var nudge = 100
        while (!chunks().contains((1, "d")) && System.currentTimeMillis() < deadline) {
          Thread.sleep(250)
          nudge += 1
          in.addData((nudge, "x"))
        }
        assert(chunks().contains((1, "d")), chunks().toString)
        // never a double flush: "d" appears exactly once
        assert(spark.table("tws_batch_out").where("k = 1").count() == 2)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("session window streaming closes after gap + watermark (flow/session_window.go:102-125)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = StreamingFlows.session("_1", "30 seconds", "10 seconds", Seq(col("_2")),
      Seq(count(lit(1)).as("n")))(in.toDF())
      .select(col("_2").as("u"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 00:00:00"), "u1"), (ts("2024-01-01 00:00:10"), "u1"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:10:00"), "u1")) // advance watermark, close session
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:20:00"), "u1")) // close the second session too
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[(String, Long)].collect().toSeq
      assert(rows.contains(("u1", 2L)))
    } finally q.stop()
  }

  test("streaming transitions: consecutive finalized pairs emit once; session gap breaks; late drops") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)] // (id, key, ts, state)
    val pairs = StreamingFlows.transitions[Long,
        (Long, Long, java.sql.Timestamp, String), (String, String)](
      in.toDS(), _._2, _._3, delay = "10 minutes", gapSeconds = 1800,
      ord = _._1, (a, b) => (a._4, b._4))
    val q = pairs.writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      // batch 1: a→b 10s apart, then c an hour later (gap > 1800 breaks)
      in.addData((1L, 7L, ts("2024-01-01 10:00:00"), "a"),
                 (2L, 7L, ts("2024-01-01 10:00:10"), "b"),
                 (3L, 7L, ts("2024-01-01 11:00:00"), "c"))
      q.processAllAvailable()
      // (the engine may already run a timer-only follow-up batch here —
      // emission timing is its business; content is asserted at the end)
      // batch 2: advance watermark past everything; batch 3 fires timers
      in.addData((90L, 99L, ts("2024-01-01 13:00:00"), "z"))
      q.processAllAvailable()
      in.addData((91L, 99L, ts("2024-01-01 13:01:00"), "z"))
      q.processAllAvailable()
      // the two z sentinels are never watermark-final themselves (wm
      // stops at 12:51), so the only pair is a→b; b→c broke on the gap
      val got = spark.table("trans_out").as[(String, String)].collect().toSeq
      assert(got == Seq(("a", "b")), got.toString)
      // a late event (below the watermark) is dropped, not paired
      in.addData((4L, 7L, ts("2024-01-01 10:00:20"), "late"))
      q.processAllAvailable()
      assert(spark.table("trans_out").count() == 1)
    } finally q.stop()
  }

  test("streaming transitions: pairs form ACROSS finalization rounds via the carried row") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val pairs = StreamingFlows.transitions[Long,
        (Long, Long, java.sql.Timestamp, String), (String, String)](
      in.toDS(), _._2, _._3, delay = "10 minutes", gapSeconds = 1800,
      ord = _._1, (a, b) => (a._4, b._4))
    val q = pairs.writeStream.format("memory").queryName("trans_out2")
      .outputMode("append").start()
    try {
      in.addData((1L, 7L, ts("2024-01-01 10:00:00"), "a"))
      q.processAllAvailable()
      // finalize "a" alone (wm = 10:20 - 10min = 10:10)
      in.addData((90L, 99L, ts("2024-01-01 10:20:00"), "z"))
      q.processAllAvailable()
      in.addData((91L, 99L, ts("2024-01-01 10:21:00"), "z"))
      q.processAllAvailable()
      // "b" 25 min after "a": finalized in a LATER round, still pairs
      // against the carried "a" (gap 1500s <= 1800s)
      in.addData((2L, 7L, ts("2024-01-01 10:25:00"), "b"))
      q.processAllAvailable()
      in.addData((92L, 99L, ts("2024-01-01 10:40:00"), "z"))
      q.processAllAvailable()
      in.addData((93L, 99L, ts("2024-01-01 10:41:00"), "z"))
      q.processAllAvailable()
      val got = spark.table("trans_out2").as[(String, String)].collect().toSeq
      assert(got.count(_ == (("a", "b"))) == 1, got.toString)
    } finally q.stop()
  }

  test("streaming transitions: the carried row evicts once the watermark outruns the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val pairs = StreamingFlows.transitions[Long,
        (Long, Long, java.sql.Timestamp, String), (String, String)](
      in.toDS(), _._2, _._3, delay = "1 minute", gapSeconds = 60,
      ord = _._1, (a, b) => (a._4, b._4))
    val q = pairs.writeStream.format("memory").queryName("trans_out3")
      .outputMode("append").start()
    try {
      in.addData((1L, 7L, ts("2024-01-01 10:00:00"), "a"))
      q.processAllAvailable()
      // push the watermark far past a's gap horizon; a is evicted
      in.addData((90L, 99L, ts("2024-01-01 12:00:00"), "z"))
      q.processAllAvailable()
      in.addData((91L, 99L, ts("2024-01-01 12:01:00"), "z"))
      q.processAllAvailable()
      // even an event spuriously close in SECONDS arithmetic can't pair:
      // the state is gone (and the real gap is huge anyway)
      in.addData((2L, 7L, ts("2024-01-01 12:00:30"), "b"))
      q.processAllAvailable()
      in.addData((92L, 99L, ts("2024-01-01 12:10:00"), "z"))
      q.processAllAvailable()
      in.addData((93L, 99L, ts("2024-01-01 12:11:00"), "z"))
      q.processAllAvailable()
      val got = spark.table("trans_out3").as[(String, String)].collect().toSeq
      assert(!got.contains(("a", "b")), got.toString)
      assert(got.count(_ == (("z", "z"))) >= 1) // sanity: the stream ran
    } finally q.stop()
  }

  test("streaming sessionize: numbering continues across rounds and long idle gaps") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, java.sql.Timestamp)] // (id, key, ts)
    val labeled = StreamingFlows.sessionize[Long,
        (Long, Long, java.sql.Timestamp), (Long, Long)](
      in.toDS(), _._2, _._3, delay = "10 minutes", gapSeconds = 1800,
      ord = _._1, (e, seq) => (e._1, seq))
    val q = labeled.writeStream.format("memory").queryName("sess_lbl")
      .outputMode("append").start()
    try {
      // session 1: two events 10 s apart
      in.addData((1L, 7L, ts("2024-01-01 10:00:00")),
                 (2L, 7L, ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      // finalize them
      in.addData((90L, 99L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      in.addData((91L, 99L, ts("2024-01-01 11:01:00")))
      q.processAllAvailable()
      // session 2: a DAY later — the (ts, seq) pair must have survived
      // the idle gap so this is seq 2, not a restart at 1
      in.addData((3L, 7L, ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      in.addData((92L, 99L, ts("2024-01-02 13:00:00")))
      q.processAllAvailable()
      in.addData((93L, 99L, ts("2024-01-02 13:01:00")))
      q.processAllAvailable()
      val got = spark.table("sess_lbl").as[(Long, Long)].collect().toMap
      assert(got(1L) == 1L && got(2L) == 1L)
      assert(got(3L) == 2L, s"numbering restarted: $got")
    } finally q.stop()
  }

  test("heavyHittersTWS: Misra–Gries decrements on a full table, state stays bounded at " +
      "capacity, and the heavy item survives eviction pressure across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[String]
      // ONE shard: every item shares a counter table of capacity 2, so the
      // uniques ("u1".."u4") repeatedly force the decrement-all step
      val out = StreamingFlows.heavyHittersTWS[String](identity, capacity = 2, shards = 1)
        .apply(in.toDS())
      val q = out.toDF("shard", "item", "cnt").writeStream.format("memory")
        .queryName("tws_mg_out").outputMode("append").start()
      try {
        // batch 1: a=3, b=1, u1, u2 (N=7). capacity 2: after a,a,b the
        // table is {a:2+1=3? walk: a->1, a->2, b->1, u1 decrements both
        // -> {a:2}, u2 joins -> {a:2, u2:1}}
        in.addData("a", "a", "b", "u1", "a", "u2")
        q.processAllAvailable()
        val batch1 = spark.table("tws_mg_out").as[(Int, String, Long)].collect()
        assert(batch1.length <= 2, s"summary exceeds capacity: ${batch1.toSeq}")
        assert(batch1.exists(_._2 == "a"), batch1.toSeq.toString)
        // batch 2: more a's + fresh uniques — counts continue from STATE
        // (not from zero), a must survive and dominate
        in.addData("u3", "a", "a", "u4", "a")
        q.processAllAvailable()
        val all = spark.table("tws_mg_out").as[(Int, String, Long)].collect()
        // final emission = rows of the 2nd batch; per-batch emission ≤ capacity
        assert(all.length - batch1.length <= 2, all.toSeq.toString)
        val finalA = all.drop(batch1.length).find(_._2 == "a")
        assert(finalA.isDefined, s"heavy item evicted: ${all.toSeq}")
        // MG undercount bound: true count 6, error ≤ N/(capacity+1) = 11/3
        assert(finalA.get._3 >= 6 - 11 / 3 && finalA.get._3 <= 6, finalA.toString)
        // candidate-union contract: DISTINCT over every emission contains
        // the heavy item — the q153 readout's exact recount then fixes cnt
        assert(all.map(_._2).distinct.contains("a"))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("lastTouchAttribution: cross-batch carry attributes a later conversion; the carry " +
      "is evicted once the watermark outruns the window; organic conversions emit None") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // base offset keeps every event strictly above the initial watermark
    // (epoch 0); delay 10 min, window 3600 s. Watermark after a batch =
    // max event ts − 10 min; events at-or-under the CURRENT watermark are
    // buffered only if strictly above it, finalized once a later batch's
    // watermark passes them.
    def ts(min: Long) = new java.sql.Timestamp(60000L * (1000 + min))
    // (event_id, key, ts, type)
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val out = StreamingFlows.lastTouchAttribution[
        Long, (Long, Long, java.sql.Timestamp, String), (Long, Option[Long], Option[Long])](
      in.toDS(), _._2, _._3,
      delay = "10 minutes", ord = _._1,
      isTouch = _._4 == "touch",
      isConversion = _._4 == "conv",
      windowSeconds = 3600L, // 60 minutes
      (c, t) => (c._1, t.map(_._1),
        t.map(x => c._3.getTime / 1000L - x._3.getTime / 1000L)))
    val q = out.writeStream.format("memory").queryName("tws_attr_out")
      .outputMode("append").start()
    try {
      def emitted() = spark.table("tws_attr_out").as[(Long, Option[Long], Option[Long])]
        .collect().toSet
      // touch k1 @ +0, organic conv k2 @ +5; sentinels push wm to +10
      // then +30 — both finalize (≤ +10 fires on the +30 batch's timers)
      in.addData((10L, 1L, ts(0), "touch"), (20L, 2L, ts(5), "conv"))
      q.processAllAvailable()
      in.addData((90L, 9L, ts(20), "none")) // wm -> +10
      q.processAllAvailable()
      in.addData((91L, 9L, ts(40), "none")) // wm -> +30; fires ≤ +10
      q.processAllAvailable()
      assert(emitted() == Set((20L, None, None)), s"organic conversion: ${emitted()}")

      // conv k1 @ +35 (above wm +30): the CROSS-BATCH carry (touch @ +0,
      // 2100 s earlier, inside the window) must attribute once finalized
      in.addData((11L, 1L, ts(35), "conv"))
      q.processAllAvailable()
      in.addData((92L, 9L, ts(60), "none")) // wm -> +50
      q.processAllAvailable()
      in.addData((93L, 9L, ts(80), "none")) // wm -> +70; fires ≤ +50
      q.processAllAvailable()
      assert(emitted().contains((11L, Some(10L), Some(2100L))),
        s"cross-batch carry: ${emitted()}")

      // conv k1 @ +80: the touch is 4800 s old — outside the window and
      // past the eviction horizon (wm +70 − touch +0 = 4200 s > 3600)
      in.addData((12L, 1L, ts(80), "conv"))
      q.processAllAvailable()
      in.addData((94L, 9L, ts(120), "none")) // wm -> +110
      q.processAllAvailable()
      in.addData((95L, 9L, ts(160), "none")) // fires ≤ +110
      q.processAllAvailable()
      assert(emitted().contains((12L, None, None)),
        s"stale touch must not attribute: ${emitted()}")
    } finally q.stop()
  }

  test("histogramTWS: histograms accumulate across batches; emissions are touched " +
      "entries only; state is ONE row per group; max-replay = exact final histogram") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(String, Long)]
      val out = StreamingFlows.histogramTWS[(String, Long), String](_._1, _._2.toDouble)
        .apply(in.toDS())
      val q = out.toDF("group", "v", "c").writeStream.format("memory")
        .queryName("tws_hist_out").outputMode("append").start()
      try {
        in.addData(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
        q.processAllAvailable()
        val b1 = spark.table("tws_hist_out").as[(String, Double, Long)].collect().toSet
        assert(b1 == Set(("a", 1.0, 2L), ("a", 2.0, 1L), ("b", 5.0, 1L)), b1)
        // batch 2 touches (a,1), (b,5), (b,7): counts CONTINUE from state,
        // and the untouched (a,2) is NOT re-emitted
        in.addData(("a", 1L), ("b", 5L), ("b", 7L))
        q.processAllAvailable()
        val all = spark.table("tws_hist_out").as[(String, Double, Long)].collect().toSeq
        val batch2 = all.diff(b1.toSeq)
        assert(batch2.toSet == Set(("a", 1.0, 3L), ("b", 5.0, 2L), ("b", 7.0, 1L)), batch2)
        // state = one histogram row per group, not per (group, value)
        assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2L)
        // max-replay reconstructs the exact final histogram
        val replay = all.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
          (k._1, k._2, rs.map(_._3).max) }.toSet
        assert(replay == Set(("a", 1.0, 3L), ("a", 2.0, 1L), ("b", 5.0, 2L), ("b", 7.0, 1L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("topKTWS: heaps continue across batches; untouched groups keep their last " +
      "emission; state is ONE row per group; emitSeq reconstruction is exact") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double, Long)]
      val out = StreamingFlows.topKTWS[(Long, Double, Long), Long](_._1, _._2, _._3, k = 2)
        .apply(in.toDS())
      val q = out.toDF("g", "seq", "rank", "s", "p").writeStream.format("memory")
        .queryName("tws_topk_out").outputMode("append").start()
      try {
        in.addData((1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 6.0, 12L), (2L, 1.0, 20L))
        q.processAllAvailable()
        // batch 2 touches only group 1: a new best arrives, 6.0 falls out
        in.addData((1L, 9.0, 13L))
        q.processAllAvailable()
        val all = spark.table("tws_topk_out").as[(Long, Long, Int, Double, Long)]
          .collect().toSeq
        val latest = all.groupBy(_._1).map { case (g, rs) =>
          val mx = rs.map(_._2).max
          g -> rs.filter(_._2 == mx).map(r => (r._3, r._4, r._5)).sortBy(_._1)
        }
        assert(latest(1L) == Seq((1, 9.0, 13L), (2, 7.0, 11L)), latest(1L).toString)
        assert(latest(2L) == Seq((1, 1.0, 20L)), latest(2L).toString) // untouched, from batch 1
        assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2L)
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("lastTouchAttribution: an IDLE key's carry is evicted by its own timer — " +
      "state leaves the store with no further events on the key") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(60000L * (2000 + min))
    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val out = StreamingFlows.lastTouchAttribution[
        Long, (Long, Long, java.sql.Timestamp, String), (Long, Option[Long], Option[Long])](
      in.toDS(), _._2, _._3,
      delay = "10 minutes", ord = _._1,
      isTouch = _._4 == "touch",
      isConversion = _._4 == "conv",
      windowSeconds = 3600L,
      (c, t) => (c._1, t.map(_._1),
        t.map(x => c._3.getTime / 1000L - x._3.getTime / 1000L)))
    val q = out.writeStream.format("memory").queryName("tws_attr_idle")
      .outputMode("append").start()
    try {
      def stateRows() = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // one touch on k1, then NOTHING more on k1 — each later batch uses a
      // FRESH sentinel key so sentinels drain and only k1's fate is tested
      in.addData((10L, 1L, ts(0), "touch"))
      q.processAllAvailable()
      in.addData((90L, 7L, ts(20), "none")); q.processAllAvailable() // wm -> +10
      in.addData((91L, 8L, ts(40), "none")); q.processAllAvailable() // wm -> +30: k1 finalizes -> carry-only
      // wm -> +70 outruns touch(+0) + window(3600 s) + 1 s: the carry's own
      // timer (set when pending drained) must fire and REMOVE k1's state —
      // without that timer the key is never re-invoked and pins the store
      in.addData((92L, 6L, ts(80), "none")); q.processAllAvailable()
      in.addData((93L, 5L, ts(120), "none")); q.processAllAvailable() // wm -> +110 drains k6 too
      // only the newest sentinel (k5 @ +120, above wm) may remain pending
      assert(stateRows() == 1L, s"idle carry must leave the store: ${stateRows()} state rows")
    } finally q.stop()
  }
}
