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
}
