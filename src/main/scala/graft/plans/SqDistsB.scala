package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** A fixed centroid matrix (double precision) shipped to executors ONCE via
  * broadcast, plus the fused squared-L2 kernel [[SqDistsB]] evaluates
  * against it — the clustering sibling of [[CentroidBank]]/[[CellScoresB]].
  *
  * Per row the kernel emits `array<double>` of k grid-rounded squared
  * Euclidean distances, bit-identical to the declarative per-centroid form
  * it replaces in `Clustering.lloyd`/`kCenter`:
  *
  * {{{ round(aggregate(zip_with(v, lit(c), (x,y) => (x-y)*(x-y)),
  *           lit(0.0), (acc,x) => acc + x), scale) }}}
  *
  * — i.e. strict left-to-right double accumulation of `(x_j − c_j)²` then
  * Spark's HALF_UP decimal rounding (`BigDecimal.valueOf(d).setScale(s,
  * HALF_UP)`, the exact DoubleType `Round` code path). The lambda form
  * evaluates one interpreted HOF dispatch per element per centroid per
  * row — the measured-slow pattern this bank family exists to eliminate —
  * while this kernel is one fused primitive loop inside whole-stage
  * codegen.
  *
  * Null semantics match the declarative form: a null vector or any null
  * element nulls every distance (zip_with propagates the null through the
  * aggregate for each centroid); a length mismatch against one centroid
  * nulls only that centroid's distance (zip_with pads with null). The
  * output array itself is never null.
  */
final class DistBank(val centroids: Array[Array[Double]], val scale: Int)
    extends Serializable {

  def numCenters: Int = centroids.length

  private val uniformLen: Int =
    if (centroids.nonEmpty && centroids.forall(_.length == centroids(0).length))
      centroids(0).length
    else -1

  /** k null distances — what a null / null-element vector maps to. */
  def allNullDists(): ArrayData = new GenericArrayData(new Array[Any](centroids.length))

  /** Spark's DoubleType `Round(_, scale)` semantics: decimal HALF_UP, with
    * NaN/Infinity passed through unchanged — `RoundBase` guards on
    * `isNaN || isInfinite` before touching BigDecimal (whose `valueOf`
    * throws NumberFormatException on either), so a NaN embedding element
    * or a +Inf squared sum must PROPAGATE, not crash the kernel.
    */
  private def gridRound(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def dists(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return allNullDists()
      j += 1
    }
    if (n == uniformLen) return distsDense(v.toDoubleArray())
    val out = new Array[Any](centroids.length)
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      if (c.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { val d = v.getDouble(k) - c(k); acc += d * d; k += 1 }
        out(i) = java.lang.Double.valueOf(gridRound(acc))
      } // else: leave null — zip_with's padded-null propagates to the sum
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Primitive-only kernel: every centroid matches `v.length`, so no
    * distance is null and the output array is written unboxed.
    */
  private def distsDense(v: Array[Double]): ArrayData = {
    val out = new Array[Double](centroids.length)
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var acc = 0.0
      var k = 0
      while (k < v.length) { val d = v(k) - c(k); acc += d * d; k += 1 }
      out(i) = gridRound(acc)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object DistBank {

  /** One broadcast per (SparkContext, contents, scale) — same reuse
    * discipline as [[CentroidBank.broadcastFor]]: Lloyd's per-iteration
    * plan rebuilds over an unchanged matrix hit the cache instead of
    * re-registering. Bounded LRU because Lloyd mints a new matrix per
    * iteration — see [[BankCache]] for the eviction/ContextCleaner
    * contract.
    */
  private val cache = new BankCache[
    (org.apache.spark.SparkContext, Vector[Vector[Double]], Int), Broadcast[DistBank]](64)

  def broadcastFor(
      spark: SparkSession,
      centroids: Array[Array[Double]],
      scale: Int): Broadcast[DistBank] = {
    cache.evictWhere(_._1.isStopped)
    val key = (spark.sparkContext, centroids.map(_.toVector).toVector, scale)
    cache.getOrCreate(key)(
      spark.sparkContext.broadcast(new DistBank(centroids.map(_.clone()), scale)))
  }

  /** Column of k grid-rounded squared-L2 distances of `vec`
    * (`array<double>`) to each broadcast centroid — the codegen drop-in for
    * the `array(round(aggregate(zip_with(...)), scale), ...)` lambda form.
    */
  def distsColumn(vec: Column, centroids: Array[Array[Double]], scale: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    val bc = broadcastFor(SparkSession.active, centroids, scale)
    GraftBridge.column(SqDistsB(bc, GraftBridge.expression(vec)))
  }
}

/** Squared-L2 distances to a BROADCAST [[DistBank]]: tasks pull the matrix
  * once per executor from the block manager; the serialized plan carries
  * only the broadcast handle. Output is `array<double>` of k grid-rounded
  * distances, never null itself (see [[DistBank]] for the element-null
  * contract).
  */
case class SqDistsB(bc: Broadcast[DistBank], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got $t")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sq_dists"

  @transient private lazy val bank: DistBank = bc.value

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) bank.allNullDists()
    else bank.dists(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "graftDistBankBc", bc, "org.apache.spark.broadcast.Broadcast")
    val bankVar = ctx.addMutableState(
      "graft.plans.DistBank", "graftDistBank",
      v => s"$v = (graft.plans.DistBank) $bcRef.value();")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  ${childGen.isNull} ? $bankVar.allNullDists() : $bankVar.dists(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistsB =
    copy(child = newChild)
}
