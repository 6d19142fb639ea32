package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hashing primitives shared by the dedup / fingerprint operators.
  *
  * The core primitive is `hash48`: the first 12 hex chars of md5 interpreted
  * as a 48-bit unsigned integer. 48 bits is chosen deliberately — it is
  * exactly representable in an IEEE double (2^48 < 2^53), so the identical
  * value is computable in any SQL engine (the DuckDB oracle reproduces it
  * with a per-character hex fold), and it is wide enough that collision
  * probability over 10^8 shingles stays ~1e-6 per pair bucket.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (md5 / conv / substring / arithmetic) — no UDFs, so the whole dedup
  * pipeline stays inside WholeStageCodegen.
  *
  * MinHash re-hashing uses universal hashing `(a_i * h + b_i) mod p` on the
  * 48-bit base value instead of k independent md5 calls: one md5 per shingle
  * total, then k cheap integer ops. With a_i < 2^14 and h < 2^48 the product
  * stays under 2^62, so 64-bit signed arithmetic never overflows — the same
  * expression is exact in Spark and DuckDB BIGINT.
  */
object Hashing {

  val HashBits = 48

  /** First 12 hex chars of md5 as a non-negative long (48 bits).
    * Declarative form — reference semantics; [[hash48]] is the native
    * codegen expression with identical values.
    */
  def hash48Decl(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Native form ([[graft.plans.Hash48F]]): one md5 digest, first 6 bytes
    * big-endian — no hex string, no substring, no base-16 parse.
    */
  def hash48(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.Hash48F(org.apache.spark.sql.GraftBridge.expression(c.cast("string")))
    )

  /** Mersenne prime 2^31 - 1; universal-hash modulus. */
  val Prime: Long = 2147483647L

  /** Seed parameters for the k-th universal hash; small odd multipliers keep
    * `a * h` under 2^62 for h < 2^48.
    */
  def hashParams(k: Int): (Long, Long) = (2L * k + 3L, 104729L * (k + 1))

  /** k-th universal hash of a 48-bit base hash column. */
  def rehash(h: Column, k: Int): Column = {
    val (a, b) = hashParams(k)
    pmod(lit(a) * h + lit(b), lit(Prime))
  }

  /** CHARACTER n-grams of a string column as an array of strings (empty
    * when the string is shorter than n). Matches the DuckDB comprehension
    * `[substr(s,i,n) for i in range(1, len(s)-n+2)]`. Note the live gram
    * operators ([[gramHashes]], [[winnowSet]], fingerprints,
    * contamination, Jaccard) window over UTF-8 BYTES, not characters —
    * identical on ASCII, different on multi-byte text; this helper is the
    * char-window form for callers that need the gram STRINGS.
    */
  def charNgrams(c: Column, n: Int): Column =
    when(
      length(c) >= n,
      transform(sequence(lit(1), length(c) - n + 1), i => c.substr(i, lit(n)))
    ).otherwise(array().cast("array<string>"))

  /** Word w-shingles: join every w consecutive tokens with a single space. */
  def wordShingles(tokens: Column, w: Int): Column =
    when(
      size(tokens) >= w,
      transform(
        sequence(lit(0), size(tokens) - w),
        i => concat_ws(" ", slice(tokens, i + 1, lit(w)))
      )
    ).otherwise(array().cast("array<string>"))

  /** MinHash signature (length k) of a string-array column: base-hash each
    * element once with md5, then derive the k minimums through universal
    * re-hashing. Returns `array<bigint>` of length k; null-safe on empty
    * input (signature of an empty set is all `Prime`, an impossible hash).
    */
  def minhashSignature(elems: Column, k: Int): Column = {
    val base = transform(elems, e => hash48(e))
    val sig = (0 until k).map { i =>
      coalesce(array_min(transform(base, h => rehash(h, i))), lit(Prime))
    }
    array(sig: _*)
  }

  /** LSH band keys for a minhash signature: `bands` buckets of `rowsPerBand`
    * signature entries, each band reduced to a single 48-bit key by hashing
    * the joined entries. Two documents that agree on all entries of any band
    * share that band's key — the standard banding amplification of Jaccard
    * similarity (Leskovec et al., Mining of Massive Datasets, ch. 3).
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    val keys = (0 until bands).map { b =>
      val bandSlice = slice(sig, b * rowsPerBand + 1, rowsPerBand)
      hash48(concat_ws(",", transform(bandSlice, _.cast("string"))))
    }
    array(keys: _*)
  }

  /** 48-bit SimHash of a token-array column. Each token is base-hashed once;
    * bit b of the result is 1 iff the sum over tokens of (+1 if bit b of the
    * token hash is set else -1) is strictly positive. Duplicate tokens count
    * with multiplicity (matches the DuckDB oracle's unnest semantics).
    *
    * Column form for composability; the per-bit folds run as interpreted
    * lambdas, so at corpus scale use the value-identical relational form
    * [[graft.dedup.Dedup.simhashSignatures]] (explode + 48 codegen'd sum
    * aggregates — measured 30× at sf0.1).
    */
  def simhash48(tokens: Column): Column = {
    val hashes = transform(tokens, t => hash48(t))
    val bits = (0 until HashBits).map { b =>
      val vote = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
      )
      when(vote > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** All n-byte-gram ROLLING hashes of a string as `array<bigint>` — the
    * Karp–Rabin primitive behind [[fingerprint]], winnowing, and the
    * contamination screen ([[graft.plans.RollingHash48]]: one O(len) pass,
    * 48-bit polynomial mod 2^48, engine-portable exact arithmetic). This
    * replaces the explode→substr→md5-per-gram pipeline those operators
    * used to share: no per-gram string ever materializes.
    */
  def gramHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.GramHashes48F(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string")), n))

  /** The DISTINCT winnowing fingerprint set (window-min over [[gramHashes]],
    * width `w`) as `array<bigint>` — the whole per-document winnowing
    * computation as one map-side expression.
    */
  def winnowSet(text: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.WinnowSet48F(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string")), n, w))

  /** 48-bit simhash of a whole document as ONE per-row expression
    * ([[graft.plans.TextKernel.simhash]]): tokenize + md5-per-token + bit
    * votes fused into the projection — value-identical to [[simhash48]]
    * over `wsTokens` and to the relational explode+aggregate form, with
    * zero exchanges.
    */
  def simhashDoc(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.SimhashF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string"))))

  /** MinHash signature of a whole document as ONE per-row expression
    * ([[graft.plans.TextKernel.minhashSig]]): `array<bigint>` of k minima
    * over width-`w` token shingles. Value-identical to
    * [[minhashSignature]] over [[wordShingles]] for docs WITH shingles;
    * the empty-doc encodings differ deliberately — this returns an EMPTY
    * array when the doc has fewer than `w` tokens (filter on
    * `size(sig) > 0` before banding), where [[minhashSignature]] returns
    * the k-length all-`Prime` sentinel.
    */
  def minhashSigDoc(text: Column, w: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.MinhashSigF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string")), w, k))

  /** The DISTINCT sorted 48-bit width-`w` shingle hashes of a document as
    * ONE per-row expression ([[graft.plans.TextKernel.shingleHashSet]]) —
    * the gram-set feed for coverage/novelty joins. Value-identical to
    * `hash48` over [[wordShingles]] of [[graft.functions.TextFunctions.wsTokens]]
    * with a per-doc distinct, at zero exchanges and one md5 per shingle.
    */
  def shingleHashSet(text: Column, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.ShingleSetF(
        org.apache.spark.sql.GraftBridge.expression(text.cast("string")), w))

  /** Rolling document fingerprint: minimum rolling-gram hash (a 1-element
    * winnowing sketch). Stable under content reordering only at gram
    * granularity — intended as a cheap content-identity key, cf. Schleimer
    * et al., "Winnowing" (SIGMOD'03). Value-identical to the relational
    * [[graft.dedup.Dedup.fingerprints]].
    */
  def fingerprint(text: Column, n: Int): Column =
    coalesce(array_min(gramHashes(text, n)), lit(Prime))
}
