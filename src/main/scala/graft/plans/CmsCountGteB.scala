package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.CountMinSketch

/** "Estimated frequency ≥ `minCount`" against a BROADCAST Count–Min
  * sketch — the candidate predicate of the two-pass heavy-hitter
  * ([[graft.functions.Sketches.heavyHitters]]).
  *
  * Same shipping discipline as [[BloomMightContainB]]: the sketch blob is
  * referenced through a `Broadcast`, so the plan carries a handle and each
  * executor pulls the `depth × width` counter table once from the block
  * manager — never inside every task's serialized plan. CMS only ever
  * OVER-estimates, so this predicate has NO false negatives: every item
  * whose true count reaches `minCount` passes. That one-sided error is
  * what lets the caller re-count only the survivors and still be exact.
  *
  * Codegen-friendly: broadcast resolved once per generated-class instance,
  * then each row is one `estimateCount` call (hashing `depth` times into
  * the counter table) and a compare.
  */
case class CmsCountGteB(cms: Broadcast[CountMinSketch], minCount: Long, child: Expression)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a long hash, got $t")
    }

  override def prettyName: String = "graft_cms_count_gte"

  @transient private lazy val sketch: CountMinSketch = cms.value

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(sketch.estimateCount(v.asInstanceOf[Long]) >= minCount)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftCmsBc", cms, "org.apache.spark.broadcast.Broadcast")
    val cmsVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.CountMinSketch", "graftCms",
      v => s"$v = (org.apache.spark.util.sketch.CountMinSketch) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $cmsVar.estimateCount((Object) (Long) $input) >= ${minCount}L;")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsCountGteB =
    copy(child = newChild)
}
