package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native dot product over two `array<float>` columns, accumulating left to
  * right in double — bit-identical to the declarative
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` fold it replaces
  * ([[graft.functions.VectorFunctions.dot]]), so DuckDB-oracle parity is
  * preserved, but evaluated as one fused loop in generated Java instead of
  * per-element lambda dispatch (the fold allocates and virtual-calls per
  * element; measured ~4× on the embedding near-dup join at sf0.1).
  *
  * Null semantics match the fold exactly: null result if either array or
  * any element is null, and null for unequal-length arrays (`zip_with`
  * null-pads the shorter side, so the fold's multiply hits a null) — the
  * length check is what makes [[FuseDotProduct]]'s rewrite safe on ragged
  * input.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  val name = "graft_dot"

  val info: ExpressionInfo = new ExpressionInfo(classOf[DotProductF].getName, name)

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name expects 2 arguments")
    DotProductF(exprs.head, exprs(1))
  }

  /** Session-level registration (SQL: `SELECT graft_dot(a, b)`), idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}

/** SparkSessionExtensions entry point — enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`): injects graft's native
  * functions into every session built from that config. SQL surface:
  *
  *   graft_dot(a, b), graft_hash48(s),
  *   graft_gram_hashes48(s, n), graft_winnow_set48(s, n, w),
  *   graft_simhash48(s), graft_minhash_sig(s, w, k),
  *   graft_rep_stats(s), graft_lang_counts(s), graft_shingle_set(s, w),
  *   graft_byte_entropy(s)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => FuseDotProduct)
  }
}

object GraftExtensions {
  /** Extract a foldable integer argument (SQL literals arrive as
    * expressions; the kernel widths are compile-time Java constants in the
    * generated code, so they must fold at planning).
    */
  private def intLit(e: Expression, name: String): Int = {
    require(e.foldable, s"graft kernel argument '$name' must be a literal")
    val v: Long = e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"graft kernel argument '$name' must be an integer literal, got $other")
    }
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"graft kernel argument '$name' = $v out of int range") // no silent wrap
    v.toInt
  }

  private def strLit(e: Expression, name: String): String = {
    require(e.foldable, s"graft kernel argument '$name' must be a literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"graft kernel argument '$name' must be a string literal, got $other")
    }
  }

  private def info(cls: Class[_], name: String) = new ExpressionInfo(cls.getName, name)

  /** The full native-function surface, shared by the
    * `spark.sql.extensions` path and session-level registration
    * ([[graft.GraftSession.tune]]).
    */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (DotProductF.name, DotProductF.info, DotProductF.builder _),
    (Hash48F.name, Hash48F.info, Hash48F.builder _),
    ("graft_gram_hashes48", info(classOf[GramHashes48F], "graft_gram_hashes48"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_gram_hashes48 expects (string, n)")
        GramHashes48F(exprs.head, intLit(exprs(1), "n"))
      }),
    ("graft_winnow_set48", info(classOf[WinnowSet48F], "graft_winnow_set48"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_winnow_set48 expects (string, n, w)")
        WinnowSet48F(exprs.head, intLit(exprs(1), "n"), intLit(exprs(2), "w"))
      }),
    ("graft_simhash48", info(classOf[SimhashF], "graft_simhash48"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_simhash48 expects (string)")
        SimhashF(exprs.head)
      }),
    ("graft_minhash_sig", info(classOf[MinhashSigF], "graft_minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_minhash_sig expects (string, w, k)")
        MinhashSigF(exprs.head, intLit(exprs(1), "w"), intLit(exprs(2), "k"))
      }),
    ("graft_rep_stats", info(classOf[RepStatsF], "graft_rep_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_rep_stats expects (string)")
        RepStatsF(exprs.head)
      }),
    ("graft_lang_counts", info(classOf[LangCountsF], "graft_lang_counts"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_lang_counts expects (string)")
        LangCountsF(exprs.head)
      }),
    ("graft_shingle_set", info(classOf[ShingleSetF], "graft_shingle_set"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_shingle_set expects (string, w)")
        ShingleSetF(exprs.head, intLit(exprs(1), "w"))
      }),
    ("graft_byte_entropy", info(classOf[ByteEntropyF], "graft_byte_entropy"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_byte_entropy expects (string)")
        ByteEntropyF(exprs.head)
      }),
    ("graft_dedup_segments", info(classOf[DedupSegmentsF], "graft_dedup_segments"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dedup_segments expects (string, delimiter)")
        DedupSegmentsF(exprs.head, strLit(exprs(1), "delimiter"))
      })
  )

  /** Session-level registration of the whole surface (for sessions not
    * built with `spark.sql.extensions`), idempotent.
    */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
