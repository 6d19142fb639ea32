package graft

import graft.operators.CoreFlows
import org.apache.spark.sql.functions._

/** Golden tests from the reference's own expectations (FIXTURES.md F1/F2).
  * Reference cites: flow/map_test.go:53-54, flow/flow_test.go:41-50,
  * flow/fold_test.go:38-39, flow/reduce.go:80-91, flow/flow_test.go:92-124.
  */
class CoreFlowsSpec extends SparkSpec {
  import spark.implicits._

  test("Map upper: [a,b,c] -> [A,B,C] (flow/map_test.go:53-54)") {
    val out = CoreFlows.map(upper(col("value")).as("value"))(Seq("a", "b", "c").toDF("value"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("A", "B", "C"))
  }

  test("Map typed form") {
    val out = CoreFlows.mapTyped[String, Int](_.length)
      .apply(Seq("a", "bb", "ccc").toDS()).collect().sorted
    assert(out.toSeq == Seq(1, 2, 3))
  }

  test("Filter drops matching (flow/flow_test.go:48-50)") {
    val out = CoreFlows.filter(!col("value").contains("a"))(Seq("a", "b", "c").toDF("value"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("b", "c"))
  }

  test("FlatMap asterisk doubling (flow/flow_test.go:41-46)") {
    val out = CoreFlows.flatMap(
      array(concat(col("value"), lit("*")), concat(col("value"), lit("**"))), "value"
    )(Seq("a", "b").toDF("value")).as[String].collect().sorted
    assert(out.toSeq == Seq("a*", "a**", "b*", "b**"))
  }

  test("Fold prefix concat: [1..5] -> [1,12,123,1234,12345] (flow/fold_test.go:38-39)") {
    val df = Seq(1, 2, 3, 4, 5).toDF("v")
    val out = CoreFlows.foldRunning(
      lit(""), (init, arr) => concat(init, array_join(arr, "")),
      col("v").cast("string"), Seq(lit(1)), Seq(col("v")), "acc"
    )(df).orderBy("v").select("acc").as[String].collect()
    assert(out.toSeq == Seq("1", "12", "123", "1234", "12345"))
  }

  test("Reduce: first element emitted as-is, then accumulates (flow/reduce.go:80-91)") {
    val df = Seq(5, 3, 8, 1).zipWithIndex.toDF("v", "i")
    val out = CoreFlows.reduceRunning(max, col("v"), Nil, Seq(col("i")), "running")(df)
      .orderBy("i").select("running").as[Int].collect()
    assert(out.toSeq == Seq(5, 5, 8, 8))
  }

  test("PassThrough is identity (flow/pass_through.go:21-31)") {
    val df = Seq(1, 2, 3).toDF("v")
    assert(CoreFlows.passThrough(df).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("Flatten: [[1,2,3],[4,5]] -> [1..5] (flow/flow_test.go:264-265)") {
    val df = Seq(Seq(1, 2, 3), Seq(4, 5)).toDF("arr")
    val out = CoreFlows.flatten(col("arr"), "v")(df).as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("complex pipeline: filter->map->flatMap golden [B*,B**,C*,C**] (flow/flow_test.go:92-124)") {
    val src = Seq("a", "b", "c").toDF("value")
    val piped = graft.api.Pipeline.Pipe(src)
      .via(CoreFlows.filter(!col("value").contains("a")))
      .via(CoreFlows.map(upper(col("value")).as("value")))
      .via(CoreFlows.flatMap(
        array(concat(col("value"), lit("*")), concat(col("value"), lit("**"))), "value"))
    val out = piped.df.as[String].collect().sorted
    assert(out.toSeq == Seq("B*", "B**", "C*", "C**"))
  }

  test("invalid batch size throws (flow/batch_test.go:82-89)") {
    assertThrows[IllegalArgumentException] {
      graft.operators.Batching.batchIds(0, Nil, Seq(col("v")))(Seq(1).toDF("v"))
    }
  }

  test("invalid throttler quota throws (flow/throttler_test.go:74-96)") {
    assertThrows[IllegalArgumentException] {
      graft.operators.Batching.throttleDiscard(col("ts"), "1 hour", 0, Seq(col("ts")))(Seq(1).toDF("ts"))
    }
  }

  test("Keyed.chain runs a flow list per key: fresh state per key, stages compose in order") {
    import graft.operators.Keyed
    // (device, seq, reading): the reference's flagship shape — per-device
    // chain of filter -> running fold -> map (flow/keyed.go:36-50)
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, -5.0), ("a", 3L, 20.0),
      ("b", 1L, 1.0), ("b", 2L, 2.0)
    ).toDF("device", "seq", "reading")
    val out = Keyed.chain(Seq(col("device")), Seq(
      Keyed.stateless(graft.operators.CoreFlows.filter(col("reading") > 0)), // drops (a,2)
      Keyed.foldStage(sum, col("reading"), Seq(col("seq")), "running"),
      Keyed.stateless(graft.operators.CoreFlows.map(
        col("device"), col("seq"), col("running") * 2 as "doubled"))
    ))(df)
      .as[(String, Long, Double)].collect().toSet
    // state is FRESH per key: b's fold never sees a's readings, and the
    // filter ran BEFORE the fold (a's running sum skips the -5)
    assert(out == Set(
      ("a", 1L, 20.0), ("a", 3L, 60.0),
      ("b", 1L, 2.0), ("b", 2L, 6.0)))
  }

  test("Keyed.chain: consecutive stateful stages share one key exchange") {
    val df = Seq(("a", 1L, 10.0), ("b", 2L, 2.0)).toDF("device", "seq", "reading")
    import graft.operators.Keyed
    val plan = Keyed.chain(Seq(col("device")), Seq(
      Keyed.foldStage(sum, col("reading"), Seq(col("seq")), "running"),
      Keyed.reduceStage(max, col("running"), Seq(col("seq")), "peak"),
      Keyed.batchStage(2, Seq(col("seq")))
    ))(df).queryExecution.executedPlan.toString
    // three stateful stages, ONE hash exchange on the key — the chain is
    // one plan, not three shuffled sub-jobs
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
