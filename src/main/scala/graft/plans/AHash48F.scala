package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 48-bit perceptual aHash of one `frameBytes`-sized frame of a binary
  * payload, as a native codegen kernel — the declarative replacement for
  * the RDD `mapPartitions` loop in
  * [[graft.multimodal.Multimodal.frameAHash]] (kept there as
  * `frameAHashRdd`, the parity-spec'd semantic reference).
  *
  * Semantics (bit-identical to the RDD form): pixel `j` (j < 48) is byte
  * `frameIdx·frameBytes + j` of the payload read unsigned, 0 past the
  * payload end; `mean` is the integer mean (`sum/48` truncating); bit `j`
  * of the result is set iff `px(j) > mean`. With a real codec the pixels
  * would be an 8×6 grayscale downsample of the decoded frame — the codec
  * stays a [[graft.multimodal.Multimodal]] stub; THIS arithmetic is pure
  * and belongs inside whole-stage codegen, not behind `.rdd`.
  *
  * Inputs: payload BINARY, frameIdx LONG (null if either is null).
  * `frameIdx·frameBytes` is computed in 64-bit — payloads larger than an
  * on-heap byte array allows cannot reach here, but the kernel never
  * silently wraps an offset.
  */
case class AHash48F(payload: Expression, frameIdx: Expression, frameBytes: Int)
    extends BinaryExpression {

  require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")

  override def left: Expression = payload
  override def right: Expression = frameIdx

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, frameIdx.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (p, f) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got ($p, $f)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash48"

  override def nullSafeEval(p: Any, f: Any): Any =
    java.lang.Long.valueOf(
      AHash48F.compute(p.asInstanceOf[Array[Byte]], f.asInstanceOf[Long], frameBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one pixel buffer per generated class instance (per task) — no
    // per-row allocation
    val px = ctx.addMutableState("int[]", "graftAhashPx", v => s"$v = new int[48];")
    nullSafeCodeGen(ctx, ev, (p, f) => {
      val lo = ctx.freshName("lo")
      val sum = ctx.freshName("sum")
      val j = ctx.freshName("j")
      val pos = ctx.freshName("pos")
      val mean = ctx.freshName("mean")
      val h = ctx.freshName("h")
      s"""
         |long $lo = $f * ${frameBytes}L;
         |int $sum = 0;
         |for (int $j = 0; $j < 48; $j++) {
         |  long $pos = $lo + $j;
         |  $px[$j] = ($pos >= 0L && $pos < $p.length) ? ($p[(int) $pos] & 0xff) : 0;
         |  $sum += $px[$j];
         |}
         |int $mean = $sum / 48;
         |long $h = 0L;
         |for (int $j = 0; $j < 48; $j++) { if ($px[$j] > $mean) $h |= 1L << $j; }
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AHash48F =
    copy(payload = newLeft, frameIdx = newRight)
}

object AHash48F {

  /** The shared reference arithmetic — interpreted eval calls it; the
    * generated Java inlines the same loops.
    */
  def compute(bytes: Array[Byte], frameIdx: Long, frameBytes: Int): Long = {
    val lo = frameIdx * frameBytes.toLong
    val px = new Array[Int](48)
    var sum = 0
    var j = 0
    while (j < 48) {
      val pos = lo + j
      px(j) = if (pos >= 0L && pos < bytes.length) bytes(pos.toInt) & 0xFF else 0
      sum += px(j)
      j += 1
    }
    val mean = sum / 48
    var h = 0L
    j = 0
    while (j < 48) {
      if (px(j) > mean) h |= 1L << j
      j += 1
    }
    h
  }

  /** Column form: 48-bit aHash of frame `frameIdx` of `payload`. */
  def column(payload: Column, frameIdx: Column, frameBytes: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      AHash48F(GraftBridge.expression(payload), GraftBridge.expression(frameIdx), frameBytes))
  }
}
