package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The per-query ASYMMETRIC DISTANCE TABLES of a product-quantization
  * search ([[graft.similarity.PQ]]), shipped to executors ONCE via
  * broadcast, plus the fused lookup kernel [[AdcDistsB]] that evaluates a
  * corpus CODE row against every query.
  *
  * `tables(q)(j)(c)` = grid-rounded squared L2 distance between query
  * `q`'s subspace-`j` slice and codeword `c` of subspace `j`'s codebook —
  * Q·m·k doubles built once, driver-side, from the raw query vectors.
  * Per corpus row the kernel reads the m-element code vector and emits
  * `array<double>` of Q ADC distances, each the j-ascending left-to-right
  * sum `Σ_j tables(q)(j)(code(j))` — the summation ORDER is part of the
  * cross-engine contract (the oracle replays `list_sum(list(d ORDER BY
  * j)))`, fp addition is not associative).
  *
  * This is the m-lookups-per-query inner loop that makes PQ serve at
  * 100 TB: the corpus side scans CODES (m bytes-ish per vector instead of
  * dim floats), never the raw vectors, and the only per-row work is
  * Q·m table reads inside whole-stage codegen.
  *
  * Null semantics: a null code vector, a null code element, a code
  * outside `[0, k)`, or a code length ≠ m nulls EVERY query's distance
  * (the row is undecodable); the output array itself is never null.
  */
final class AdcBank(val tables: Array[Array[Array[Double]]]) extends Serializable {

  def numQueries: Int = tables.length

  /** m — subspace count; uniform across queries by construction. */
  private val m: Int = if (tables.nonEmpty) tables(0).length else 0

  def allNullDists(): ArrayData = new GenericArrayData(new Array[Any](numQueries))

  def dists(code: ArrayData): ArrayData = {
    val n = code.numElements()
    if (n != m) return allNullDists()
    var j = 0
    while (j < n) {
      if (code.isNullAt(j)) return allNullDists()
      val c = code.getInt(j)
      if (c < 0 || (m > 0 && c >= tables(0)(j).length)) return allNullDists()
      j += 1
    }
    val out = new Array[Double](numQueries)
    var q = 0
    while (q < numQueries) {
      val tq = tables(q)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += tq(i)(code.getInt(i)); i += 1 }
      out(q) = acc
      q += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object AdcBank {

  // bounded LRU, the bank-family discipline ([[BankCache]]): a session
  // paging through query batches must not pin every batch's tables
  private val cache = new BankCache[
    (org.apache.spark.SparkContext, Vector[Vector[Vector[Double]]]), Broadcast[AdcBank]](64)

  def broadcastFor(
      spark: SparkSession,
      tables: Array[Array[Array[Double]]]): Broadcast[AdcBank] = {
    cache.evictWhere(_._1.isStopped)
    val key = (spark.sparkContext, tables.map(_.map(_.toVector).toVector).toVector)
    cache.getOrCreate(key)(
      spark.sparkContext.broadcast(new AdcBank(tables.map(_.map(_.clone())))))
  }

  /** Column of Q ADC distances of `code` (`array<int>`, length m) against
    * the broadcast tables.
    */
  def distsColumn(code: Column, tables: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.GraftBridge
    val bc = broadcastFor(SparkSession.active, tables)
    GraftBridge.column(AdcDistsB(bc, GraftBridge.expression(code)))
  }
}

/** ADC distances to a BROADCAST [[AdcBank]] — the plan carries one
  * broadcast handle, not a Q·m·k literal (the round-8 task-binary
  * lesson); output `array<double>` of Q distances, never null itself.
  */
case class AdcDistsB(bc: Broadcast[AdcBank], child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int>, got $t")
    }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_adc_dists"

  @transient private lazy val bank: AdcBank = bc.value

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) bank.allNullDists()
    else bank.dists(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj(
      "graftAdcBankBc", bc, "org.apache.spark.broadcast.Broadcast")
    val bankVar = ctx.addMutableState(
      "graft.plans.AdcBank", "graftAdcBank",
      v => s"$v = (graft.plans.AdcBank) $bcRef.value();")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  ${childGen.isNull} ? $bankVar.allNullDists() : $bankVar.dists(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AdcDistsB =
    copy(child = newChild)
}
