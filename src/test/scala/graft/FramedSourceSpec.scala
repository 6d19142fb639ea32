package graft

import java.nio.file.{Files, Paths}

/** DSv2 framed source (ReaderSource analogue, extension/source_reader.go). */
class FramedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("framed").toString
    Files.writeString(Paths.get(dir, name), content)
    dir
  }

  test("reads custom-delimited frames via format(\"graft-framed\")") {
    val dir = writeTemp("a.dat", "one;two;three;")
    val out = spark.read.format("graft-framed").option("delimiter", ";")
      .load(dir).select("value").as[String].collect().sorted
    assert(out.toSeq == Seq("one", "three", "two"))
  }

  test("defaults to newline framing and reports the source file") {
    val dir = writeTemp("b.dat", "x\ny\n\nz")
    val rows = spark.read.format("graft-framed").load(dir)
      .as[(String, String)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("x", "y", "z")) // empty frames dropped
    assert(rows.forall(_._2.endsWith("b.dat")))
  }

  test("one partition per file; multi-file directories parallelize") {
    val dir = Files.createTempDirectory("framed").toString
    Files.writeString(Paths.get(dir, "p1.dat"), "a|b")
    Files.writeString(Paths.get(dir, "p2.dat"), "c|d")
    val df = spark.read.format("graft-framed").option("delimiter", "|").load(dir)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("value").as[String].collect().sorted.toSeq == Seq("a", "b", "c", "d"))
  }

  test("missing path is a clean error") {
    val e = intercept[Exception] {
      spark.read.format("graft-framed").load("/nonexistent/nowhere").collect()
    }
    assert(e != null)
  }

  test("streams multi-chunk files; multi-byte delimiter across chunk boundaries") {
    // frames sized so that the 3-byte delimiter straddles the reader's
    // 64 KiB refill boundary repeatedly; total ~1.3 MB >> one chunk, so the
    // incremental decode path (not a slurp) is what's being exercised
    val delim = "<|>"
    val frames = (0 until 40).map(i => ("f%04d-".format(i)) + ("x" * (32 * 1024 + i - 20)))
    val dir = writeTemp("big.dat", frames.mkString(delim))
    val out = spark.read.format("graft-framed").option("delimiter", delim)
      .load(dir).select("value").as[String].collect()
    assert(out.length == 40)
    assert(out.sorted.toSeq == frames.sorted)
  }

  test("streaming offsets round-trip through their JSON form (checkpoint contract)") {
    import graft.sources.framed.FramedOffset
    val off = FramedOffset(Set("/data/a.dat", "/data/b \"quoted\".dat", "/data/βeta.dat"))
    assert(FramedOffset.fromJson(off.json()) == off)
    assert(FramedOffset.fromJson(FramedOffset(Set.empty).json()) == FramedOffset(Set.empty))
  }

  test("streaming: readStream picks up newly-arriving files incrementally") {
    val dir = Files.createTempDirectory("framed-stream").toString
    Files.writeString(Paths.get(dir, "s1.dat"), "a|b|c")
    val q = spark.readStream.format("graft-framed").option("delimiter", "|")
      .load(dir)
      .writeStream.format("memory").queryName("framed_stream_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("framed_stream_out").count() == 3)
      Files.writeString(Paths.get(dir, "s2.dat"), "d|e")
      q.processAllAvailable()
      val vals = spark.table("framed_stream_out").select("value").as[String].collect().sorted
      assert(vals.toSeq == Seq("a", "b", "c", "d", "e")) // s1 not re-read
    } finally q.stop()
  }

  test("streaming: a not-yet-created directory is an empty stream, not a dead query") {
    val parent = Files.createTempDirectory("framed-late").toString
    val dir = s"$parent/not_yet"
    val q = spark.readStream.format("graft-framed").option("delimiter", "|")
      .load(dir)
      .writeStream.format("memory").queryName("framed_late_out").outputMode("append").start()
    try {
      q.processAllAvailable() // producer hasn't created the dir: zero rows, still alive
      assert(spark.table("framed_late_out").count() == 0)
      assert(q.isActive)
      Files.createDirectory(Paths.get(dir))
      Files.writeString(Paths.get(dir, "late.dat"), "x|y")
      q.processAllAvailable()
      assert(spark.table("framed_late_out").count() == 2)
    } finally q.stop()
  }

  test("streaming: maxTrackedFiles guard fails loudly on a churning directory, batch read unaffected") {
    val dir = Files.createTempDirectory("framed-many").toString
    (1 to 5).foreach(i => Files.writeString(Paths.get(dir, s"f$i.dat"), s"v$i"))
    // batch reads don't track an offset, so the guard does not apply
    assert(spark.read.format("graft-framed").option("maxTrackedFiles", "3").load(dir).count() == 5)
    val q = spark.readStream.format("graft-framed")
      .option("maxTrackedFiles", "3")
      .load(dir)
      .writeStream.format("memory").queryName("framed_guard_out").outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    q.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    val msg = causes(err).map(c => Option(c.getMessage).getOrElse("")).mkString(" ")
    assert(msg.contains("maxTrackedFiles"))
    assert(msg.contains("graft-broker")) // points at the sequence-offset upgrade path
  }

  test("custom ElementReader framing: registered function frames the stream (full source_reader.go generality)") {
    import graft.sources.framed.ElementReaders
    // fixed-width 3-byte frames — a framing neither built-in rule covers
    ElementReaders.register("fixed3", { in =>
      Iterator.continually {
        val buf = new Array[Byte](3)
        var read = 0
        var n = 0
        while (read < 3 && n >= 0) {
          n = in.read(buf, read, 3 - read)
          if (n > 0) read += n
        }
        if (read == 0) null else java.util.Arrays.copyOf(buf, read)
      }.takeWhile(_ != null)
    })
    val dir = writeTemp("fixed.dat", "abcdefgh") // 3 + 3 + 2 tail
    val vals = spark.read.format("graft-framed")
      .option("framing", "custom").option("elementReader", "fixed3")
      .load(dir)
      .select("value").as[String].collect().sorted.toSeq
    assert(vals == Seq("abc", "def", "gh"))
    // streaming uses the same partitions — same framing end-to-end
    val q = spark.readStream.format("graft-framed")
      .option("framing", "custom").option("elementReader", "fixed3")
      .load(dir)
      .writeStream.format("memory").queryName("custom_framed_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("custom_framed_out").count() == 3)
    } finally q.stop()
    // unknown name and missing option both fail loudly at planning
    val e1 = intercept[Exception] {
      spark.read.format("graft-framed")
        .option("framing", "custom").option("elementReader", "nope").load(dir).collect()
    }
    assert(e1.getMessage.contains("nope") && e1.getMessage.contains("fixed3"))
    val e2 = intercept[Exception] {
      spark.read.format("graft-framed").option("framing", "custom").load(dir).collect()
    }
    assert(e2.getMessage.contains("elementReader"))
  }

  test("length-prefixed framing: 4-byte BE prefix, bounds-checked") {
    val dir = Files.createTempDirectory("framed").toString
    val frames = Seq("first", "second frame", "x" * 70000) // last spans chunks
    val bb = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      val b = f.getBytes("UTF-8")
      bb.write(Array[Byte]((b.length >> 24).toByte, (b.length >> 16).toByte,
        (b.length >> 8).toByte, b.length.toByte))
      bb.write(b)
    }
    bb.write(Array[Byte](0, 0, 0, 0)) // zero-length frame: dropped, like delimiter mode
    Files.write(Paths.get(dir, "lp.bin"), bb.toByteArray)
    val out = spark.read.format("graft-framed").option("framing", "length-prefixed")
      .load(dir).select("value").as[String].collect().toSeq
    assert(out.sorted == frames.sorted)
    // corrupt length prefix (beyond maxFrameBytes) is a clean error
    Files.write(Paths.get(dir, "bad.bin"), Array[Byte](0x7f, -1, -1, -1, 0))
    val e = intercept[Exception] {
      spark.read.format("graft-framed").option("framing", "length-prefixed")
        .option("maxFrameBytes", "1024").load(s"$dir/bad.bin").collect()
    }
    assert(e.getMessage != null)
  }

  test("frames larger than one 64 KiB chunk survive intact") {
    val big = "A" * (300 * 1024) // one frame spanning ~5 chunks
    val dir = writeTemp("huge.dat", s"start;$big;end")
    val out = spark.read.format("graft-framed").option("delimiter", ";")
      .load(dir).select("value").as[String].collect().toSeq
    assert(out.map(_.length).sorted == Seq(3, 5, 300 * 1024))
    assert(out.contains(big))
  }

  test("registering an ElementReader that captures non-serializable state fails at register() time") {
    import graft.sources.framed.ElementReaders
    val lock = new Object // not Serializable; would otherwise die later at task serialization
    val err = intercept[IllegalArgumentException] {
      ElementReaders.register("bad-capture", in => { lock.synchronized(()); Iterator.empty })
    }
    assert(err.getMessage.contains("bad-capture"))
    assert(err.getMessage.contains("Serializable"))
  }

}
