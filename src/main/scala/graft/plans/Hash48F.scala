package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft's portable 48-bit hash as a native expression: md5 of the UTF-8
  * bytes, first 6 digest bytes big-endian as a long.
  *
  * Bit-identical to the declarative form it replaces
  * (`conv(substring(md5(s), 1, 12), 16, 10) :: long` — the first 12 hex
  * chars ARE the first 6 bytes), so the DuckDB oracle reproduction is
  * unchanged — but with no hex-string materialization, no substring, no
  * base-16 string parse. One MessageDigest instance per generated class
  * (digest() resets it; codegen instances are per-task, so no sharing).
  */
case class Hash48F(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash48"

  override def nullSafeEval(v: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.valueOf(Hash48F.first48(md.digest(v.asInstanceOf[UTF8String].getBytes)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState(
      "java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""".stripMargin
    )
    nullSafeCodeGen(ctx, ev, input => {
      val d = ctx.freshName("digest")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      // byte-fold loop rather than a chained shift-or of parenthesized
      // casts: Janino mis-parses `((long)(b & 0xff)) << 32` in operand
      // position ("is not a type"), which silently degraded this whole
      // expression to interpreted eval
      s"""
         |byte[] $d = $md.digest($input.getBytes());
         |long $h = 0L;
         |for (int $i = 0; $i < 6; $i++) { $h = ($h << 8) | (long) ($d[$i] & 0xff); }
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Hash48F =
    copy(child = newChild)
}

object Hash48F {
  val name = "graft_hash48"

  def first48(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)

  val info: ExpressionInfo = new ExpressionInfo(classOf[Hash48F].getName, name)

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"$name expects 1 argument")
    Hash48F(exprs.head)
  }

  /** Session-level registration (SQL: `SELECT graft_hash48(s)`), idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
