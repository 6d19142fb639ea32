package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core 1-in/1-out transformation flows (SURVEY.md §2.1 #1–6, #19).
  *
  * Reference semantics: reugn/go-streams `flow/map.go:38-54`,
  * `flow/flat_map.go:38-54`, `flow/filter.go:42-58`, `flow/fold.go:34-46`,
  * `flow/reduce.go:31-42`, `flow/pass_through.go:21-31`,
  * `flow/util.go:175-179` (Flatten).
  *
  * Spark-first stance: these are *plan constructors*, not executors. A
  * column-expression form (codegen'd, preferred) and a typed-lambda form
  * (for logic that genuinely needs Scala) are both provided. The reference's
  * per-operator `parallelism` knob maps to partition-level parallelism,
  * which Spark already provides; like the reference (`flow/map.go:34-35`),
  * ordering across partitions is not preserved.
  */
object CoreFlows {

  /** Map (1→1). Column form: `select` of expressions — fully codegen'd,
    * column-pruned, and push-down-transparent.
    */
  def map(exprs: Column*): DataFrame => DataFrame = df => df.select(exprs: _*)

  /** Typed Map, for genuine Scala logic (`flow/map.go:11` MapFunction). */
  def mapTyped[T, R: Encoder](f: T => R): Dataset[T] => Dataset[R] = ds => ds.map(f)

  /** FlatMap (1→0..N) over an array-producing expression: `explode` keeps
    * the operator inside codegen; generator output is pruned like any column.
    * (`flow/flat_map.go:11` FlatMapFunction.)
    */
  def flatMap(arrayExpr: Column, as: String, keep: Column*): DataFrame => DataFrame =
    df => df.select(keep :+ explode(arrayExpr).as(as): _*)

  def flatMapTyped[T, R: Encoder](f: T => IterableOnce[R]): Dataset[T] => Dataset[R] =
    ds => ds.flatMap(f)

  /** Filter (`flow/filter.go:11` FilterPredicate): a `where` that Catalyst
    * pushes to the scan (check `PushedFilters` in explain).
    */
  def filter(cond: Column): DataFrame => DataFrame = df => df.where(cond)

  def filterTyped[T](p: T => Boolean): Dataset[T] => Dataset[T] = ds => ds.filter(p)

  /** PassThrough (`flow/pass_through.go:21-31`): the identity plan. */
  def passThrough: DataFrame => DataFrame = identity

  /** Flatten (`flow/util.go:175-179`): `[]T` stream → `T` stream. */
  def flatten(arrayCol: Column, as: String, keep: Column*): DataFrame => DataFrame =
    flatMap(arrayCol, as, keep: _*)

  /** Fold (`flow/fold.go:34-46`): running aggregate WITH an initial value,
    * emitting the accumulator after every element.
    *
    * The reference is strictly sequential over one stream
    * (`flow/fold.go:78-82`). A global sequential fold does not scale, so the
    * engine surfaces the *keyed* running form: within each `partitionKeys`
    * group, elements are ordered by `ord` and the running aggregate is
    * emitted per row — a window frame `rowsBetween(unboundedPreceding,
    * currentRow)`. At 100 TB this shuffles once on `partitionKeys` and
    * sorts within partitions; no global sort, no single-node state.
    * The un-keyed reference behavior is the degenerate single-group case.
    */
  def foldRunning(
      init: Column,
      merge: (Column, Column) => Column,
      valueCol: Column,
      partitionKeys: Seq[Column],
      ord: Seq[Column],
      as: String
  ): DataFrame => DataFrame = { df =>
    val w = (if (partitionKeys.nonEmpty) Window.partitionBy(partitionKeys: _*) else Window.partitionBy())
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, merge(init, collect_list(valueCol).over(w)))
  }

  /** Fold specialised to an associative builtin aggregate (sum/min/max/...):
    * the idiomatic, fastest form — one shuffle, codegen'd window exec.
    */
  def foldRunningAgg(
      agg: Column => Column,
      valueCol: Column,
      partitionKeys: Seq[Column],
      ord: Seq[Column],
      as: String
  ): DataFrame => DataFrame = { df =>
    val base =
      if (partitionKeys.nonEmpty) Window.partitionBy(partitionKeys: _*) else Window.partitionBy()
    val w = base.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, agg(valueCol).over(w))
  }

  /** Reduce (`flow/reduce.go:31-42`): running aggregate WITHOUT an initial
    * value — the first element of each group is emitted as-is and seeds the
    * accumulator (`flow/reduce.go:80-91`). For associative `agg` this is
    * identical to the window running form, which Spark evaluates the same
    * way (the frame of row 1 contains only row 1).
    */
  def reduceRunning(
      agg: Column => Column,
      valueCol: Column,
      partitionKeys: Seq[Column],
      ord: Seq[Column],
      as: String
  ): DataFrame => DataFrame =
    foldRunningAgg(agg, valueCol, partitionKeys, ord, as)
}
