package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared constants + kernels for the 48-bit ROLLING polynomial gram hash —
  * the classic Karp–Rabin fingerprinting primitive (as used by winnowing,
  * Schleimer et al. SIGMOD'03 §2): over the UTF-8 BYTES b of a string,
  * the hash of the n-byte gram at position p is
  *
  *   H(p) = (Σ_{j<n} b[p+j] · B^{n-1-j}) mod 2^48
  *
  * advanced in O(1) per position by H(p+1) = ((H(p) − b[p]·B^{n-1})·B +
  * b[p+n]) mod 2^48. All arithmetic is exact under 64-bit wrap-around
  * (2^48 divides 2^64, so masking after every step IS mod 2^48), which is
  * what makes the value reproducible in any engine with 64-bit integers —
  * the DuckDB oracle recomputes each gram as the direct weighted byte sum
  * (≤ 8·255·2^48 < 2^63, no overflow) and masks once.
  *
  * Contrast [[Hash48F]] (md5-based): that one hashes arbitrary-length
  * strings one value at a time; this one emits ALL n-gram hashes of a
  * document in one O(len) pass — the difference between ~one md5 call per
  * gram (explode → substr → digest, the dominant cost of the fingerprint /
  * winnowing / contamination family at scale) and a single tight loop per
  * document with no per-gram string materialization at all.
  *
  * Byte semantics, deliberately: grams are n-byte windows of the UTF-8
  * encoding (multi-byte codepoints may split). Positions are byte
  * positions. This is exact and engine-portable for ANY input — the
  * alternative (char windows) forces a per-gram substring materialization,
  * which is the cost this expression exists to remove.
  */
object RollingHash48 {
  /** FNV-1a 64 prime — odd, large, well-mixed multiplier mod 2^48. */
  val B: Long = 1099511628211L
  val Mask: Long = (1L << 48) - 1

  /** B^k mod 2^48 (k in 0..31 — gram widths beyond that are unused). */
  val Pow: Array[Long] = {
    val a = new Array[Long](32)
    a(0) = 1L
    var i = 1
    while (i < a.length) { a(i) = (a(i - 1) * B) & Mask; i += 1 }
    a
  }

  /** All n-gram hashes of `bytes` (empty array when len < n). */
  def gramHashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    if (len < n) return Array.emptyLongArray
    val out = new Array[Long](len - n + 1)
    val w0 = Pow(n - 1)
    var h = 0L
    var i = 0
    while (i < n) { h = (h * B + (bytes(i) & 0xffL)) & Mask; i += 1 }
    out(0) = h
    var p = 1
    while (p <= len - n) {
      h = ((h - ((bytes(p - 1) & 0xffL) * w0)) * B + (bytes(p + n - 1) & 0xffL)) & Mask
      out(p) = h
      p += 1
    }
    out
  }

  /** Distinct sliding-window(-w) minima over the n-gram hashes — the full
    * winnowing fingerprint set of one document in one pass (monotone-deque
    * sliding minimum, O(len)). Docs with fewer than n + w - 1 bytes have
    * no full window and return an empty array. Output order is first
    * occurrence; only the SET is contractual (callers explode + compare
    * sorted).
    */
  def winnowSet(bytes: Array[Byte], n: Int, w: Int): Array[Long] = {
    val hs = gramHashes(bytes, n)
    if (hs.length < w) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](hs.length) // indices, increasing hash values
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < hs.length) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Codegen entry points: wrap the primitive array without boxing. */
  def gramHashesData(s: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(gramHashes(s.getBytes, n))

  def winnowSetData(s: UTF8String, n: Int, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(winnowSet(s.getBytes, n, w))
}

/** Shared string-input contract for the graft kernel expressions (one
  * place to adjust when e.g. collation-aware StringType matching lands).
  */
trait StringKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
    }
}

/** `array<bigint>` of all n-byte-gram rolling hashes of a string — see
  * [[RollingHash48]]. One tight static-call per row from generated code;
  * the array is primitive (UnsafeArrayData), so the downstream
  * `posexplode`/`array_min` never box.
  */
case class GramHashes48F(child: Expression, n: Int) extends StringKernelExpression {
  require(n >= 1 && n < 32, s"gram width $n out of [1, 32)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes48"

  override def nullSafeEval(v: Any): Any =
    RollingHash48.gramHashesData(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.RollingHash48.gramHashesData($input, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes48F =
    copy(child = newChild)
}

/** `array<bigint>` of the DISTINCT winnowing fingerprints (window-min over
  * the rolling gram hashes) of a string — the whole per-document winnowing
  * computation as one map-side expression, no window exchange, no
  * post-aggregation distinct. See [[RollingHash48.winnowSet]].
  */
case class WinnowSet48F(child: Expression, n: Int, w: Int) extends StringKernelExpression {
  require(n >= 1 && n < 32, s"gram width $n out of [1, 32)")
  require(w >= 1, s"window $w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_set48"

  override def nullSafeEval(v: Any): Any =
    RollingHash48.winnowSetData(v.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.RollingHash48.winnowSetData($input, $n, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSet48F =
    copy(child = newChild)
}
