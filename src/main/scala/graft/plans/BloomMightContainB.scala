package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** `mightContainLong` against a BROADCAST Bloom filter.
  *
  * Spark's own `BloomFilterMightContain` takes the serialized filter as a
  * foldable child expression — i.e. a plan `Literal` — which means the full
  * blob travels inside the serialized plan of EVERY task that evaluates the
  * predicate. Fine for the optimizer's auto-injected runtime filters (conf-
  * clamped to ~8 MB), fatal for an honest dedup-index filter (~1.2 GB at
  * 10⁹ hashes / 1% fpp). This variant references the filter through a
  * `Broadcast` instead: tasks pull the blob once per executor from the
  * block manager, and the plan carries only the broadcast handle.
  *
  * Codegen-friendly: the filter is resolved from the broadcast once per
  * generated-class instance (init-time mutable state), then each row is a
  * single virtual call — same hot-path shape as the built-in.
  */
case class BloomMightContainB(bf: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a long hash, got $t")
    }

  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bf.value

  override def nullSafeEval(v: Any): Any =
    java.lang.Boolean.valueOf(filter.mightContainLong(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bf, "org.apache.spark.broadcast.Broadcast")
    val bfVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "graftBloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $bfVar.mightContainLong($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainB =
    copy(child = newChild)
}
