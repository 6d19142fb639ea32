package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** `#{cuts ≤ v}` against a SORTED cut-point array — the binned-CDF
  * position kernel of [[graft.curation.Quantiles.cdfBlend]].
  *
  * Why an expression and not `size(filter(cutsLit, c => c <= v))`: the
  * higher-order form re-evaluates `v` — the SIGNAL expression, possibly a
  * whole tokenizer pass — once per array element (`bins − 1` times per
  * row; profiled at 15 s vs 1 s on the q149 gate at sf0.1), and then
  * materializes a filtered intermediate array just to take its size.
  * Here `v` is evaluated exactly once per row by ordinary expression
  * evaluation, and the count is an upper-bound BINARY SEARCH over the cut
  * array: O(log bins) per row, zero allocation, inside whole-stage
  * codegen.
  *
  * The cut array rides the plan as a reference object (≤ `bins − 1`
  * doubles — ~2 KB at the default 256 bins, 512 KB at the 65536 cap,
  * under the repo's 1 MiB task-shipping rule). Null `v` → null count
  * (the caller's "any null signal ⇒ null composite" contract).
  */
case class SearchSortedCountF(cuts: Array[Double], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a double value, got $t")
    }

  override def prettyName: String = "graft_search_sorted_count"

  override def nullSafeEval(v: Any): Any =
    SearchSortedCountF.countLte(cuts, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("graftCuts", cuts, "double[]")
    nullSafeCodeGen(ctx, ev, input => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      // upper bound: first index whose cut exceeds the value = the count
      // of cuts <= value (ties included — type-1 quantile semantics)
      s"""
         |int $lo = 0;
         |int $hi = $arrRef.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arrRef[$mid] <= $input) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSortedCountF =
    copy(child = newChild)
}

object SearchSortedCountF {
  /** Upper-bound count of `cuts(i) <= v` (interpreted eval twin of the
    * generated loop — kept bit-identical: same comparison, same tie side).
    */
  def countLte(cuts: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
