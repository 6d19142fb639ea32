package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** A fixed hyperplane matrix shipped to executors ONCE via broadcast, plus
  * the fused sign-packing kernel [[SignPackB]] — the random-hyperplane-LSH
  * sibling of [[CentroidBank]]/[[CellScoresB]].
  *
  * Bit b of the packed long is set iff `dot(v, plane_b) > 0`, with the dot
  * accumulated left-to-right in double — bit-identical to the per-plane
  * `when(graft_dot(vec, lit(plane_b)) > 0, 1L << b)` sum it replaces
  * ([[graft.functions.VectorFunctions.signRandomProjection]]), so the
  * DuckDB bucket replay is unchanged.
  *
  * Null semantics match the `when(...).otherwise(0)` sum: a null vector,
  * any null element, or a length mismatch yields bucket 0 (never null) —
  * degenerate vectors all land in one bucket, as before.
  */
final class SignBank(val planes: Array[Array[Float]]) extends Serializable {

  def nBits: Int = planes.length

  /** Single dimensionality shared by every plane, or -1 if ragged — gates
    * the bulk-copy fast path (same discipline as CentroidBank).
    */
  private val uniformLen: Int =
    if (planes.nonEmpty && planes.forall(_.length == planes(0).length))
      planes(0).length
    else -1

  def pack(v: ArrayData): Long = {
    val n = v.numElements()
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return 0L
      j += 1
    }
    if (n == uniformLen) return packDense(v.toFloatArray())
    var bits = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      if (p.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) { acc += v.getFloat(k).toDouble * p(k).toDouble; k += 1 }
        if (acc > 0) bits += 1L << b
      } // mismatch: graft_dot yields null, the when() falls to 0 — no bit
      b += 1
    }
    bits
  }

  /** Primitive-only kernel over the one bulk-copied float array: no
    * per-element ArrayData dispatch in the nBits×n hot loop.
    */
  private def packDense(v: Array[Float]): Long = {
    var bits = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var acc = 0.0
      var k = 0
      while (k < v.length) { acc += v(k).toDouble * p(k).toDouble; k += 1 }
      if (acc > 0) bits += 1L << b
      b += 1
    }
    bits
  }
}

object SignBank {

  // bounded LRU — same eviction/ContextCleaner contract as the other
  // banks ([[BankCache]])
  private val cache = new BankCache[
    (org.apache.spark.SparkContext, Vector[Vector[Float]]), Broadcast[SignBank]](64)

  def broadcastFor(spark: SparkSession, planes: Array[Array[Float]]): Broadcast[SignBank] = {
    // evict stopped-context entries — same leak guard as CentroidBank
    cache.evictWhere(_._1.isStopped)
    val key = (spark.sparkContext, planes.map(_.toVector).toVector)
    cache.getOrCreate(key)(
      spark.sparkContext.broadcast(new SignBank(planes.map(_.clone()))))
  }

  /** Packed sign-projection bucket against a BROADCAST plane bank — the
    * drop-in replacement for the per-plane `lit(plane)` sum.
    */
  def packColumn(vec: Column, planes: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.GraftBridge
    val bc = broadcastFor(SparkSession.active, planes)
    GraftBridge.column(SignPackB(bc, GraftBridge.expression(vec)))
  }
}

/** LSH bucket id against a BROADCAST [[SignBank]]: one fused loop over
  * `nBits` hyperplanes per row; the serialized plan carries only the
  * broadcast handle (same shipping discipline as [[BloomMightContainB]]).
  */
case class SignPackB(bc: Broadcast[SignBank], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sign_pack"

  @transient private lazy val bank: SignBank = bc.value

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) java.lang.Long.valueOf(0L)
    else java.lang.Long.valueOf(bank.pack(v.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "graftSignBc", bc, "org.apache.spark.broadcast.Broadcast")
    val bankVar = ctx.addMutableState(
      "graft.plans.SignBank", "graftSignBank",
      v => s"$v = (graft.plans.SignBank) $bcRef.value();")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |long ${ev.value} =
        |  ${childGen.isNull} ? 0L : $bankVar.pack(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignPackB =
    copy(child = newChild)
}
