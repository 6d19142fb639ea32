package graft

import graft.operators.Topology
import org.apache.spark.sql.functions._

/** Topology utilities: Split/FanOut/Merge/RoundRobin/ZipWith
  * (flow/util.go; ZipWith behavior matrix flow/flow_test.go:296-369).
  */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  test("Split partitions by predicate; branches are disjoint and complete (flow/util.go:23-41)") {
    val df = (1 to 10).toDF("v")
    val (t, f) = Topology.split(df, col("v") % 2 === 0)
    assert(t.as[Int].collect().sorted.toSeq == Seq(2, 4, 6, 8, 10))
    assert(f.as[Int].collect().sorted.toSeq == Seq(1, 3, 5, 7, 9))
  }

  test("FanOut copies see the same data (flow/util.go:45-63)") {
    val df = (1 to 5).toDF("v")
    val copies = Topology.fanOut(df, 3)
    assert(copies.size == 3)
    copies.foreach(c => assert(c.as[Int].collect().sorted.toSeq == (1 to 5)))
  }

  test("RoundRobin preserves the multiset (flow/util.go:67-80)") {
    val df = (1 to 100).toDF("v")
    val out = Topology.roundRobin(df, 7)
    assert(out.rdd.getNumPartitions == 7)
    assert(out.as[Int].collect().sorted.toSeq == (1 to 100))
  }

  test("Merge unions all inputs, closes only when all do (flow/util.go:84-105)") {
    val out = Topology.merge(Seq(Seq(1, 2).toDF("v"), Seq(3).toDF("v"), Seq(4, 5).toDF("v")))
    assert(out.as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("ZipWith equal lengths (flow/flow_test.go matrix)") {
    val a = Seq(1, 2, 3).toDF("a")
    val b = Seq(10, 20, 30).toDF("b")
    val out = Topology.zipWith(spark, Seq(
      (a, Seq(col("a")), Map("a" -> lit(0))),
      (b, Seq(col("b")), Map("b" -> lit(0)))
    )).select(col("a") + col("b")).as[Int].collect().sorted
    assert(out.toSeq == Seq(11, 22, 33))
  }

  test("ZipWith zero-fills the shorter stream: [1,2] x [1..5] (flow/flow_test.go:296-345)") {
    val a = Seq(1, 2).toDF("a")
    val b = Seq(1, 2, 3, 4, 5).toDF("b")
    val out = Topology.zipWith(spark, Seq(
      (a, Seq(col("a")), Map("a" -> lit(0))),
      (b, Seq(col("b")), Map("b" -> lit(0)))
    )).orderBy("__idx").select(concat(lit("["), col("a"), lit(" "), col("b"), lit("]")))
      .as[String].collect()
    assert(out.toSeq == Seq("[1 1]", "[2 2]", "[0 3]", "[0 4]", "[0 5]"))
  }

  test("ZipWith requires >= 2 inputs (flow/util.go:118-120)") {
    assertThrows[IllegalArgumentException] {
      Topology.zipWith(spark, Seq((Seq(1).toDF("a"), Seq(col("a")), Map.empty[String, org.apache.spark.sql.Column])))
    }
  }
}
