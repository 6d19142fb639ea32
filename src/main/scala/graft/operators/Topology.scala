package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Fan-out / fan-in / combining utilities (SURVEY.md §2.2 #13–18).
  *
  * Reference semantics: `flow/util.go` — Split (`23-41`), FanOut (`45-63`),
  * RoundRobin (`67-80`), Merge (`84-105`), ZipWith (`107-171`).
  *
  * In Spark the topology is the logical plan DAG: a branch is just another
  * DataFrame derived from the same parent (Catalyst reuses the common
  * subplan; `persist()` guards recompute across *actions*), and fan-in is
  * `union`. None of these move data by themselves.
  */
object Topology {

  /** Split (`flow/util.go:23-41`): predicate → (true-branch, false-branch).
    * Null predicate rows belong to neither branch in the reference
    * (a Go bool can't be null); `isTrue`/`isFalse` below replicate that —
    * rows where the predicate is null are dropped from both.
    */
  def split(df: DataFrame, pred: Column): (DataFrame, DataFrame) =
    (df.where(pred <=> lit(true)), df.where(pred <=> lit(false)))

  /** FanOut (`flow/util.go:45-63`): N logical copies of one stream. Batch:
    * the same plan referenced N times (cache if multiple actions will run).
    */
  def fanOut(df: DataFrame, n: Int): Seq[DataFrame] = Seq.fill(n)(df)

  /** RoundRobin (`flow/util.go:67-80`): the reference's competing-consumers
    * load balance is Spark's round-robin repartition — an `Exchange` that
    * spreads rows evenly regardless of key skew.
    */
  def roundRobin(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** Merge (`flow/util.go:84-105`): N→1 interleaved union; Spark's `union`
    * is the same bag semantics (no dedup, no ordering guarantee).
    */
  def merge(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** Deterministically SALTED equijoin for degenerate key skew: scatter the
    * skewed side's rows over `salt` sub-keys (hash of the whole row — no
    * randomness, so re-runs and retries agree) and replicate the other side
    * `salt`×; join on (key, salt); result is row-identical to the plain
    * equijoin. AQE's skew-join split handles MOST skew at runtime
    * (`GraftSession.tune` enables it); explicit salting is for the case AQE
    * cannot subdivide — one hot key whose matching build rows must
    * otherwise sit in a single task. Cost: `salt`× replication of `small`,
    * so keep it dimension-sized.
    */
  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int
  ): DataFrame = {
    require(salt > 0, "salt bucket count must be positive")
    require(!skewed.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name") // silently clobbering it would drop user data
    val allCols = skewed.columns.map(col).toSeq
    val saltedSkewed = skewed.withColumn("__salt", pmod(xxhash64(allCols: _*), lit(salt)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedSkewed.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Positional index column via RDD zipWithIndex after an explicit sort.
    *
    * `zipWithIndex` computes per-partition counts in one lightweight job and
    * assigns offsets — distributed, no single-partition window (the
    * `row_number()`-over-nothing trap). The sort guarantees the index equals
    * the rank by `ord`, which is what makes ZipWith deterministic in batch.
    */
  def withPositionalIndex(df: DataFrame, ord: Seq[Column], as: String = "__idx"): DataFrame = {
    val sorted = df.orderBy(ord: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(as, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** ZipWith (`flow/util.go:107-171`): positional zip of N streams; shorter
    * streams contribute zero values after exhaustion (behavior matrix
    * `flow/flow_test.go:296-369`). Implemented as index-equijoin with
    * zero-fill `coalesce` — the only faithful batch semantics for an
    * order-dependent operator. Streaming ZipWith is intentionally
    * unsupported (arrival-order-dependent; SURVEY.md §7.3).
    *
    * Each input is (df, ordering, zero-value map). Column names across
    * inputs must be disjoint.
    */
  def zipWith(
      spark: SparkSession,
      inputs: Seq[(DataFrame, Seq[Column], Map[String, Column])]
  ): DataFrame = {
    require(inputs.size >= 2, "ZipWith requires at least 2 inputs") // flow/util.go:118-120
    val indexed = inputs.zipWithIndex.map { case ((df, ord, _), i) =>
      withPositionalIndex(df, ord, s"__idx$i")
    }
    val joined = indexed.zipWithIndex
      .map { case (df, i) => df.withColumnRenamed(s"__idx$i", "__idx") }
      .reduce((a, b) => a.join(b, Seq("__idx"), "full_outer"))
    val zeroFilled = inputs.foldLeft(joined) { case (df, (_, _, zeros)) =>
      zeros.foldLeft(df) { case (d, (name, zero)) =>
        d.withColumn(name, coalesce(col(name), zero))
      }
    }
    zeroFilled
  }
}
