package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * All arithmetic is done in double precision with a strict left-to-right
  * fold (`aggregate`), which both keeps results deterministic across
  * partitionings (the fold is per-row, not distributed) and matches the
  * DuckDB oracle's `list_sum(list_transform(...))` evaluation order.
  *
  * These are pure Catalyst expressions — at 100 TB the dominant cost is the
  * pairwise join that *feeds* them, which is why the scale path buckets
  * candidates first (see [[graft.similarity.KNN]] and
  * [[graft.dedup.EmbeddingDedup]]).
  */
object VectorFunctions {

  /** Left-to-right dot product of two float-array columns, in double.
    *
    * Declarative fold form — kept as the reference semantics and for
    * sessions without graft's expressions; [[dotNative]] is the fused
    * codegen form with bit-identical results.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Native codegen'd dot product ([[graft.plans.DotProductF]]): one fused
    * loop over the two arrays instead of per-element lambda dispatch.
    * Identical accumulation order → identical doubles → oracle-safe.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.DotProductF(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)
      )
    )

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Cosine rounded for oracle-stable comparison. */
  def cosineRounded(a: Column, b: Column, decimals: Int = 4): Column =
    round(cosine(a, b), decimals)

  /** Coarse LSH bucket for cosine similarity: sign bits of the vector's
    * projection onto `nBits` fixed pseudo-random hyperplanes. The planes are
    * derived from the deterministic `Hashing.rehash` stream so the same
    * buckets are computable in the oracle. Random-hyperplane LSH:
    * Charikar, "Similarity estimation techniques from rounding algorithms"
    * (STOC'02).
    */
  def signRandomProjection(vec: Column, nBits: Int, dim: Int): Column = {
    // The ±1 planes depend only on (b, i) — precomputed once at plan-build
    // time and shipped as ONE broadcast bank folded by the fused
    // [[graft.plans.SignPackB]] kernel, instead of nBits float-array plan
    // Literals re-serialized into every task binary. Bit-identical to the
    // per-plane when(dot > 0, 1L << b) sum it replaces: x·(±1.0) is exact
    // in IEEE, same left-to-right double accumulation — so the DuckDB
    // bucket reproduction is unchanged.
    val planes = Array.tabulate(nBits)(b => hyperplaneSigns(b, dim))
    graft.plans.SignBank.packColumn(vec, planes)
  }

  /** The ±1 hyperplane for sign bit `b`: component i is +1 iff
    * `rehash(i + 1000003·(b+1), b)` is even — the same deterministic
    * universal-hash stream the DuckDB oracle replays arithmetically.
    */
  def hyperplaneSigns(b: Int, dim: Int): Array[Float] = {
    val (a, c) = Hashing.hashParams(b)
    Array.tabulate(dim) { i =>
      val h = (a * (i.toLong + 1000003L * (b + 1)) + c) % Hashing.Prime
      if (h % 2 == 0) 1.0f else -1.0f
    }
  }

  // --- int8 quantization --------------------------------------------------

  /** max |x_i| of the vector, in double. */
  def absMax(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Per-vector absmax scale factor for symmetric int8: `max|x| / 127`. */
  def int8Scale(vec: Column): Column = absMax(vec) / lit(127.0)

  /** Symmetric absmax int8 quantization: `q_i = round(x_i / scale)`, with
    * the all-zero vector mapping to all-zero codes (scale would be 0).
    * `|q_i| ≤ 127` by construction — `|x_i| ≤ max|x| = 127·scale` — so the
    * codes fit a signed byte; they are carried as `array<bigint>` because
    * the downstream summary aggregates widen anyway. Pure per-row
    * expression: at 100 TB this fuses into the scan projection, planning
    * zero exchanges, and is how an embedding table drops to ~¼ storage
    * (plus one float scale per vector) before serving.
    *
    * round() is half-away-from-zero in both Spark (BigDecimal HALF_UP on
    * doubles) and DuckDB — the quantized codes are reproducible
    * cross-engine, which the q49 gate asserts corpus-wide.
    */
  def quantizeInt8(vec: Column): Column = quantizeInt8Scaled(vec, int8Scale(vec))

  /** [[quantizeInt8]] against a PRE-STAGED scale column. Always stage the
    * scale (`.withColumn("scale", int8Scale(vec))`) when quantizing more
    * than once per row: a raw `int8Scale(vec)` expression embedded in the
    * per-element lambda re-evaluates the O(dim) absmax for every element —
    * O(dim²) per row (measured 2.5 s vs 0.2 s on the q49 gate). A staged
    * scale is an attribute read inside the lambda: O(dim) total.
    */
  def quantizeInt8Scaled(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale > 0, round(x.cast("double") / scale)).otherwise(lit(0.0))
        .cast("long"))

  /** Inverse of [[quantizeInt8]] up to the quantization error:
    * `x̂_i = q_i · scale`, with `|x̂_i − x_i| ≤ scale / 2`.
    */
  /** Embedding-table QA report, one row: null / wrong-dimension /
    * non-finite / zero-norm counts plus the norm distribution of the
    * valid vectors — the health gate an embedding pipeline runs before
    * ANN indexing or SemDeDup trusts the column (a NaN poisoning a
    * centroid, a truncated array joining nothing, and an unnormalized
    * batch mixing with a normalized one are all silent downstream;
    * this surfaces them as counts).
    *
    * One scalar aggregate over one scan — per-row expressions only,
    * partial-aggregated map-side; nothing corpus-sized moves.
    */
  def embeddingStats(
      df: org.apache.spark.sql.DataFrame,
      vec: Column,
      expectedDim: Int
  ): org.apache.spark.sql.DataFrame = {
    val isNull = vec.isNull
    val dim = size(vec)
    // a null ELEMENT is as poisonous as a NaN (dot products go null) and
    // counts as non-finite; `exists` short-circuits true past null checks
    val nonFinite = exists(vec, x =>
      x.isNull || isnan(x) || abs(x) === lit(Float.PositiveInfinity))
    val nrm = norm2(vec)
    val valid = !isNull && dim === expectedDim && !nonFinite
    val vNorm = when(valid, nrm)
    df.agg(
      count(lit(1)).as("n_vectors"),
      sum(when(isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(!isNull && dim =!= expectedDim, 1L).otherwise(0L)).as("n_wrong_dim"),
      sum(when(!isNull && nonFinite, 1L).otherwise(0L)).as("n_nonfinite"),
      sum(when(valid && nrm === 0.0, 1L).otherwise(0L)).as("n_zero"),
      round(min(vNorm), 4).as("norm_min"),
      round(avg(vNorm), 4).as("norm_avg"),
      round(max(vNorm), 4).as("norm_max"))
  }

  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)
}
