package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text kernels: whitespace tokenization + the md5-based
  * 48-bit token/shingle hashing ([[Hash48F]] semantics), fused into one
  * pass per document.
  *
  * These express what the relational forms in [[graft.dedup.Dedup]] /
  * [[graft.functions.TextFunctions]] compute with an explode + shuffle:
  * simhash votes, minhash signature minima, and token-repetition stats are
  * all PER-DOCUMENT math — associative folds over one row's tokens — so
  * the token explode, the lead() windows, and the wide groupBy aggregates
  * they needed exist only to route per-row data through the engine. Here
  * the whole fold runs inside the row projection: zero exchanges, and the
  * md5 count (the true floor) is unchanged, so every value — and therefore
  * every DuckDB oracle — is bit-identical to the relational form.
  *
  * Tokenization parity: `wsTokens` is `filter(split(lower(text), "\\s+"),
  * len > 0)`. Java's `\s` is exactly the six ASCII bytes
  * `[ \t\n\x0B\f\r]`, and UTF-8 multi-byte sequences never contain ASCII
  * bytes, so scanning the LOWERCASED string's bytes for those six
  * separators reproduces the token byte-slices exactly (lowercasing uses
  * `UTF8String.toLowerCase` — the same kernel Spark's `lower()` runs).
  */
object TextKernel {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** One digest per thread, reset by digest() — per-row
    * `MessageDigest.getInstance` pays a JCA provider lookup + allocation
    * on the hottest path ([[Hash48F]] caches per generated class for the
    * same reason; kernels are called from static context, so thread-local
    * is the equivalent).
    */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (a_j, b_j) universal-hash parameter tables per signature length k. */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()

  private def hashParamTable(k: Int): (Array[Long], Array[Long]) =
    paramCache.computeIfAbsent(k, { _ =>
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var j = 0
      while (j < k) {
        val (a, b) = graft.functions.Hashing.hashParams(j); as(j) = a; bs(j) = b; j += 1
      }
      (as, bs)
    })

  /** (start, end) byte offsets of the whitespace-separated tokens —
    * growable primitive int[] (this runs once per row per kernel; boxing
    * two Integers per token would reintroduce exactly the per-token
    * allocation the kernels exist to remove).
    */
  private def tokenOffsets(bytes: Array[Byte]): Array[Int] = {
    var buf = new Array[Int](32)
    var len = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        if (len + 2 > buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(len) = start; buf(len + 1) = i; len += 2
      }
    }
    if (len == buf.length) buf else java.util.Arrays.copyOf(buf, len)
  }

  /** 48-bit simhash over the tokens, md5 per token with multiplicity —
    * value-identical to [[graft.dedup.Dedup.simhashSignatures]]'s
    * explode + 48-sum-aggregate form (empty/whitespace-only docs → 0).
    */
  def simhash(s: UTF8String): Long = {
    val bytes = s.toLowerCase.getBytes
    val offs = tokenOffsets(bytes)
    val votes = new Array[Int](48)
    val md = mdLocal.get()
    var t = 0
    while (t < offs.length) {
      md.update(bytes, offs(t), offs(t + 1) - offs(t))
      val h = Hash48F.first48(md.digest())
      var b = 0
      while (b < 48) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 2
    }
    var out = 0L
    var b = 0
    while (b < 48) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** MinHash signature: per universal hash j < k, the minimum of
    * `(a_j·hash48(shingle) + b_j) mod Prime` over the width-`w` token
    * shingles (joined with a single space) — value-identical to the
    * lead-window relational form in [[graft.dedup.Dedup]]. Docs with
    * fewer than `w` tokens have no shingles: empty array.
    */
  def minhashSig(s: UTF8String, w: Int, k: Int): Array[Long] = {
    import graft.functions.Hashing
    val bytes = s.toLowerCase.getBytes
    val offs = tokenOffsets(bytes)
    val nTok = offs.length / 2
    if (nTok < w) return Array.emptyLongArray
    val sig = Array.fill(k)(Long.MaxValue)
    val md = mdLocal.get()
    val (as, bs) = hashParamTable(k)
    var j = 0
    var p = 0
    while (p <= nTok - w) {
      var t = 0
      while (t < w) {
        if (t > 0) md.update(0x20.toByte)
        val ti = 2 * (p + t)
        md.update(bytes, offs(ti), offs(ti + 1) - offs(ti))
        t += 1
      }
      val h = Hash48F.first48(md.digest())
      j = 0
      while (j < k) {
        val r = (as(j) * h + bs(j)) % Hashing.Prime
        if (r < sig(j)) sig(j) = r
        j += 1
      }
      p += 1
    }
    sig
  }

  /** The DISTINCT 48-bit hashes of the width-`w` token shingles, sorted
    * ascending — the per-document gram SET for coverage/novelty joins
    * ([[graft.dedup.Dedup.ngramCoverage]]). Same shingle protocol as
    * [[minhashSig]] (space-joined lowercased tokens, one md5 each), so
    * values are identical to `hash48(concat_ws(" ", slice(tokens, …)))`
    * over [[graft.functions.TextFunctions.wsTokens]]; the sort+dedup
    * runs in-row, replacing a relational per-doc DISTINCT (one whole
    * exchange) with O(grams log grams) on ~hundreds of elements. Docs
    * with fewer than `w` tokens: empty array.
    */
  def shingleHashSet(s: UTF8String, w: Int): Array[Long] = {
    val bytes = s.toLowerCase.getBytes
    val offs = tokenOffsets(bytes)
    val nTok = offs.length / 2
    if (nTok < w) return Array.emptyLongArray
    val hs = new Array[Long](nTok - w + 1)
    val md = mdLocal.get()
    var p = 0
    while (p <= nTok - w) {
      var t = 0
      while (t < w) {
        if (t > 0) md.update(0x20.toByte)
        val ti = 2 * (p + t)
        md.update(bytes, offs(ti), offs(ti + 1) - offs(ti))
        t += 1
      }
      hs(p) = Hash48F.first48(md.digest())
      p += 1
    }
    java.util.Arrays.sort(hs)
    var out = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    if (out == hs.length) hs else java.util.Arrays.copyOf(hs, out)
  }

  /** (n_tokens, n_distinct, top_bigram_count) — value-identical to the
    * explode + lead-window + two-groupBy relational form.
    */
  def repStats(s: UTF8String): Array[Long] = {
    val bytes = s.toLowerCase.getBytes
    val offs = tokenOffsets(bytes)
    val nTok = offs.length / 2
    val distinct = new java.util.HashSet[UTF8String]()
    var t = 0
    while (t < offs.length) {
      distinct.add(UTF8String.fromBytes(bytes, offs(t), offs(t + 1) - offs(t)))
      t += 2
    }
    var top = 0L
    if (nTok >= 2) {
      val counts = new java.util.HashMap[UTF8String, Long]()
      var p = 0
      while (p < nTok - 1) {
        // bigram = tok ++ ' ' ++ next — contiguous in the source bytes
        // EXCEPT when separated by >1 whitespace char, so materialize
        val a0 = offs(2 * p); val a1 = offs(2 * p + 1)
        val b0 = offs(2 * p + 2); val b1 = offs(2 * p + 3)
        val bg = new Array[Byte](a1 - a0 + 1 + (b1 - b0))
        System.arraycopy(bytes, a0, bg, 0, a1 - a0)
        bg(a1 - a0) = 0x20
        System.arraycopy(bytes, b0, bg, a1 - a0 + 1, b1 - b0)
        val key = UTF8String.fromBytes(bg)
        val c = counts.merge(key, 1L, (x, y) => x + y)
        if (c > top) top = c
        p += 1
      }
    }
    Array(nTok.toLong, distinct.size.toLong, top)
  }

  /** Marker-stopword hit counts per language
    * ([[graft.functions.TextFunctions.LangMarkers]] order), with
    * multiplicity — value-identical to the per-language
    * `sum(when(tok.isin(markers)))` aggregates.
    */
  def langCounts(s: UTF8String): Array[Long] = {
    val bytes = s.toLowerCase.getBytes
    val offs = tokenOffsets(bytes)
    val out = new Array[Long](LangMarkerSets.length)
    var t = 0
    while (t < offs.length) {
      val tok = UTF8String.fromBytes(bytes, offs(t), offs(t + 1) - offs(t))
      var l = 0
      while (l < LangMarkerSets.length) {
        if (LangMarkerSets(l).contains(tok)) out(l) += 1
        l += 1
      }
      t += 2
    }
    out
  }

  private lazy val LangMarkerSets: Array[java.util.HashSet[UTF8String]] =
    graft.functions.TextFunctions.LangMarkers.map { case (_, markers) =>
      val set = new java.util.HashSet[UTF8String]()
      markers.foreach(m => set.add(UTF8String.fromString(m)))
      set
    }.toArray

  /** Shannon entropy of the raw UTF-8 byte stream in bits per byte, in
    * the exact-integer-core form `log2(n) − Σ c_b·log2(c_b) / n` (so a
    * uniform-byte document is EXACTLY 0 and the only float work runs
    * over ≤ 256 distinct-byte counts). The compressibility axis of a
    * noise filter: base64/binary junk scores near 6–8 bits, natural
    * language near 4–4.5, repeated boilerplate much lower. Empty
    * documents score 0 over 0 bytes.
    */
  def byteEntropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0.0
    val counts = new Array[Long](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val ln2 = 0.6931471805599453
    var acc = 0.0
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 1) acc += c.toDouble * (Math.log(c.toDouble) / ln2)
      b += 1
    }
    Math.log(n.toDouble) / ln2 - acc / n
  }

  /** WITHIN-document segment dedup in one O(n) pass — the kernel form of
    * the declarative `split → filter(array_position == i+1) → concat_ws`
    * (which is O(segments²): an `array_position` scan per element — the
    * q101 gate measured 2.2 s at sf0.1 on it). Split is LITERAL (the
    * declarative form `Pattern.quote`s the delimiter), first occurrences
    * keep their order via a hash set, and the result is byte-identical:
    * trailing/consecutive delimiters produce empty segments exactly like
    * Java's `split(..., -1)`, and the first empty segment survives like
    * any other first occurrence. UTF-8 is self-synchronizing, so literal
    * byte search can't match across a character boundary.
    */
  def dedupSegments(s: UTF8String, delim: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val d = delim.getBytes
    val n = bytes.length
    val m = d.length
    if (m == 0 || n == 0) return s
    // segment [start, end) offsets, leftmost non-overlapping literal split
    var offs = new Array[Int](16)
    var len = 0
    var start = 0
    var i = 0
    def push(a: Int, b: Int): Unit = {
      if (len + 2 > offs.length) offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      offs(len) = a; offs(len + 1) = b; len += 2
    }
    while (i <= n - m) {
      var j = 0
      while (j < m && bytes(i + j) == d(j)) j += 1
      if (j == m) { push(start, i); i += m; start = i }
      else i += 1
    }
    push(start, n)
    if (len == 2) return s // no delimiter hit: the document is one segment
    val seen = new java.util.HashSet[UTF8String](len)
    val kept = new Array[Int](len)
    var keptLen = 0
    var outBytes = 0
    var t = 0
    while (t < len) {
      val seg = UTF8String.fromBytes(bytes, offs(t), offs(t + 1) - offs(t))
      if (seen.add(seg)) {
        kept(keptLen) = offs(t); kept(keptLen + 1) = offs(t + 1); keptLen += 2
        outBytes += offs(t + 1) - offs(t)
      }
      t += 2
    }
    val out = new Array[Byte](outBytes + m * (keptLen / 2 - 1))
    var pos = 0
    t = 0
    while (t < keptLen) {
      if (t > 0) { System.arraycopy(d, 0, out, pos, m); pos += m }
      val l = kept(t + 1) - kept(t)
      System.arraycopy(bytes, kept(t), out, pos, l); pos += l
      t += 2
    }
    UTF8String.fromBytes(out)
  }

  // Codegen entry points --------------------------------------------------

  def minhashSigData(s: UTF8String, w: Int, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(minhashSig(s, w, k))

  def repStatsRow(s: UTF8String): InternalRow = {
    val a = repStats(s)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2)))
  }

  def langCountsData(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(langCounts(s))

  def shingleHashSetData(s: UTF8String, w: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(shingleHashSet(s, w))
}

/** 48-bit simhash of a string as one per-row expression — see
  * [[TextKernel.simhash]].
  */
case class SimhashF(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash48"
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(TextKernel.simhash(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.simhash($input);")
  override protected def withNewChildInternal(newChild: Expression): SimhashF =
    copy(child = newChild)
}

/** MinHash signature (`array<bigint>` of k minima; empty when the doc has
  * fewer than `w` tokens) as one per-row expression — see
  * [[TextKernel.minhashSig]].
  */
case class MinhashSigF(child: Expression, w: Int, k: Int) extends StringKernelExpression {
  require(w >= 1 && k >= 1, "shingle width and signature length must be positive")
  // the kernel reduces with Java '%' (operands provably non-negative), which
  // matches the relational form's pmod only while a_j*h + b_j stays under
  // 2^63: a_j = 2k+3 < 2^14 and h < 2^48 bound the product at 2^62 — so the
  // largest safe signature length is k = 8190 (same bound as Hashing.rehash,
  // whose lit(a)*h would overflow identically before its pmod)
  require(k <= 8190,
    s"graft_minhash_sig: signature length k=$k exceeds 8190, the largest k " +
      "for which the universal-hash product a_j*h cannot overflow a long")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullSafeEval(v: Any): Any =
    TextKernel.minhashSigData(v.asInstanceOf[UTF8String], w, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.minhashSigData($input, $w, $k);")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigF =
    copy(child = newChild)
}

/** Per-language marker-stopword counts (`array<bigint>`, LangMarkers
  * order) as one per-row expression — see [[TextKernel.langCounts]].
  */
case class LangCountsF(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lang_counts"
  override def nullSafeEval(v: Any): Any =
    TextKernel.langCountsData(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.langCountsData($input);")
  override protected def withNewChildInternal(newChild: Expression): LangCountsF =
    copy(child = newChild)
}

/** Distinct sorted width-`w` shingle hashes (`array<bigint>`; empty when
  * the doc has fewer than `w` tokens) as one per-row expression — see
  * [[TextKernel.shingleHashSet]].
  */
case class ShingleSetF(child: Expression, w: Int) extends StringKernelExpression {
  require(w >= 1, "shingle width must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  override def nullSafeEval(v: Any): Any =
    TextKernel.shingleHashSetData(v.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.shingleHashSetData($input, $w);")
  override protected def withNewChildInternal(newChild: Expression): ShingleSetF =
    copy(child = newChild)
}

/** Token repetition stats as one per-row expression — see
  * [[TextKernel.repStats]].
  */
case class RepStatsF(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false)))
  override def prettyName: String = "graft_rep_stats"
  override def nullSafeEval(v: Any): Any =
    TextKernel.repStatsRow(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.repStatsRow($input);")
  override protected def withNewChildInternal(newChild: Expression): RepStatsF =
    copy(child = newChild)
}

/** WITHIN-document segment dedup as one per-row O(n) expression — see
  * [[TextKernel.dedupSegments]]. The delimiter is a plan-time constant
  * (like the kernel widths), shipped to generated code as a reference
  * object so arbitrary delimiter bytes never round-trip through Java
  * source escaping.
  */
case class DedupSegmentsF(child: Expression, delimiter: String)
    extends StringKernelExpression {
  require(delimiter.nonEmpty, "graft_dedup_segments delimiter must be non-empty")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_dedup_segments"
  @transient private lazy val delimU8 = UTF8String.fromString(delimiter)
  override def nullSafeEval(v: Any): Any =
    TextKernel.dedupSegments(v.asInstanceOf[UTF8String], delimU8)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dRef = ctx.addReferenceObj("graftDedupDelim", UTF8String.fromString(delimiter),
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.dedupSegments($input, $dRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): DedupSegmentsF =
    copy(child = newChild)
}

/** UTF-8 byte-stream Shannon entropy (bits per byte) as one per-row
  * expression — see [[TextKernel.byteEntropy]].
  */
case class ByteEntropyF(child: Expression) extends StringKernelExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_byte_entropy"
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.valueOf(TextKernel.byteEntropy(v.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.TextKernel.byteEntropy($input);")
  override protected def withNewChildInternal(newChild: Expression): ByteEntropyF =
    copy(child = newChild)
}
