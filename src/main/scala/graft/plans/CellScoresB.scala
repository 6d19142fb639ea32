package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** A fixed centroid matrix shipped to executors ONCE via broadcast, plus
  * the fused scoring kernel [[CellScoresB]] evaluates against it.
  *
  * Scores are `dot(v, c_i) / ‖c_i‖` — bit-identical to the declarative
  * per-centroid form `graft_dot(v, lit(c_i)) / sqrt(graft_dot(c_i, c_i))`
  * ([[DotProductF]]'s left-to-right double accumulation; the norms are
  * precomputed here with the same loop), so the DuckDB oracle parity of
  * every IVF gate is preserved exactly.
  *
  * Null semantics match the `array(...)` of per-centroid divisions it
  * replaces: a null vector or any null element yields an array of k null
  * scores (the array itself is never null); a length mismatch against one
  * centroid nulls only that centroid's score.
  */
final class CentroidBank(val centroids: Array[Array[Float]]) extends Serializable {

  /** ‖c_i‖ via the same left-to-right double accumulation as
    * `sqrt(graft_dot(c_i, c_i))` — last-ulp-identical to the plan-literal
    * form this bank replaces.
    */
  val norms: Array[Double] = centroids.map { c =>
    var acc = 0.0
    var j = 0
    while (j < c.length) { acc += c(j).toDouble * c(j).toDouble; j += 1 }
    math.sqrt(acc)
  }

  def numCells: Int = centroids.length

  /** The single dimensionality shared by EVERY centroid, or -1 if ragged —
    * gates the primitive-output fast path in [[scores]] (a vector of the
    * uniform length can produce no per-centroid nulls).
    */
  private val uniformLen: Int =
    if (centroids.nonEmpty && centroids.forall(_.length == centroids(0).length))
      centroids(0).length
    else -1

  /** k null scores — what a null / null-element vector scores as. */
  def allNullScores(): ArrayData = new GenericArrayData(new Array[Any](centroids.length))

  /** One fused pass: k dot products + divisions per row, no per-centroid
    * Literal and no per-element lambda dispatch. When the vector's length
    * matches a uniform centroid dimensionality (the always-case in
    * practice), the row's floats are bulk-copied ONCE (`toFloatArray` is a
    * single memcpy off UnsafeArrayData) and the result is an UNBOXED
    * `UnsafeArrayData.fromPrimitiveArray` — no per-element `getFloat`
    * dispatch in the k×n hot loop and no k boxed Doubles per row, which
    * was the measured ~15% regression vs the fused-literal form this bank
    * replaced (round-9 verdict). Accumulation order is unchanged —
    * bit-identical to the `graft_dot(v, lit(c)) / ‖c‖` contract.
    */
  def scores(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return allNullScores()
      j += 1
    }
    if (n == uniformLen) return scoresDense(v.toFloatArray())
    val out = new Array[Any](centroids.length)
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      if (c.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { acc += v.getFloat(k).toDouble * c(k).toDouble; k += 1 }
        out(i) = java.lang.Double.valueOf(acc / norms(i))
      } // else: leave null, matching graft_dot's unequal-length null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Primitive-only kernel: every centroid matches `v.length`, so no score
    * is null and the output array is written unboxed.
    */
  private def scoresDense(v: Array[Float]): ArrayData = {
    val out = new Array[Double](centroids.length)
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var acc = 0.0
      var k = 0
      while (k < v.length) { acc += v(k).toDouble * c(k).toDouble; k += 1 }
      out(i) = acc / norms(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object CentroidBank {

  /** One broadcast per (SparkContext, centroid contents): repeated plan
    * builds over the same pretrained matrix — every IVF gate, every CC
    * round — reuse a single executor-resident copy instead of registering
    * a new broadcast (or worse, a new plan Literal) per call. Bounded LRU
    * ([[BankCache]]) so sessions that retrain centroids many times don't
    * pin every generation.
    */
  private val cache = new BankCache[
    (org.apache.spark.SparkContext, Vector[Vector[Float]]), Broadcast[CentroidBank]](64)

  def broadcastFor(
      spark: SparkSession, centroids: Array[Array[Float]]): Broadcast[CentroidBank] = {
    // evict entries whose context has stopped: a long-lived multi-session
    // application otherwise pins every dead context's broadcast (and the
    // context object itself) in driver memory for the JVM lifetime
    cache.evictWhere(_._1.isStopped)
    val key = (spark.sparkContext, centroids.map(_.toVector).toVector)
    cache.getOrCreate(key)(
      spark.sparkContext.broadcast(new CentroidBank(centroids.map(_.clone()))))
  }

  /** Column of per-cell scores `dot(v, c_i) / ‖c_i‖` against a BROADCAST
    * centroid bank — the drop-in replacement for the Literal-shipping
    * `array(graft_dot(vec, lit(c_i)) / ...)` form (the round-8 "6 MiB task
    * binary" finding): the plan carries one broadcast handle however many
    * times the scores appear in it.
    */
  def scoresColumn(vec: Column, centroids: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.GraftBridge
    val bc = broadcastFor(SparkSession.active, centroids)
    GraftBridge.column(CellScoresB(bc, GraftBridge.expression(vec)))
  }
}

/** Per-cell centroid scores against a BROADCAST [[CentroidBank]] — the IVF
  * sibling of [[BloomMightContainB]]: tasks pull the matrix once per
  * executor from the block manager; the serialized plan carries only the
  * broadcast handle. Output is `array<double>` of `dot(v, c_i) / ‖c_i‖`,
  * never null itself (see [[CentroidBank]] for the element-null contract).
  */
case class CellScoresB(bc: Broadcast[CentroidBank], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cell_scores"

  @transient private lazy val bank: CentroidBank = bc.value

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) bank.allNullScores()
    else bank.scores(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "graftCentroidsBc", bc, "org.apache.spark.broadcast.Broadcast")
    val bankVar = ctx.addMutableState(
      "graft.plans.CentroidBank", "graftCentroidBank",
      v => s"$v = (graft.plans.CentroidBank) $bcRef.value();")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  ${childGen.isNull} ? $bankVar.allNullScores() : $bankVar.scores(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CellScoresB =
    copy(child = newChild)
}
