package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-style orthonormal rotation before product quantization — the
  * missing rung between flat PQ (q182) and IVFPQ (q191) on the vector
  * ladder: OPQ rotates the space so the m subspaces decorrelate and the
  * per-subspace codebooks spend their budget evenly, instead of letting
  * one high-variance slice dominate the quantization error.
  *
  * Full OPQ alternates codebook training with an SVD solve for R; this
  * implementation uses the DETERMINISTIC stand-in production systems
  * reach for first — the Walsh–Hadamard rotation (entries ±1/√d), which
  * spreads every input coordinate across every subspace at equal weight.
  * Being a fixed ±1 matrix it is also exactly replayable by the DuckDB
  * oracle (the q182 convention: models as literals both engines
  * evaluate), and the two fp hazards vanish by construction: products
  * against ±1 are exact, and the √d scale is exact when d is a power of
  * 4 (d = 64 → /8).
  *
  * Scale shape: rotation is a fused per-row expression — d dot kernels
  * ([[graft.plans.DotProductF]], codegen) over ONE scan, composing
  * lazily with [[PQ.encode]] so rotate+encode is still a single pass of
  * the corpus; the d×d ±1 matrix rides the plan as d float-array
  * literals (64×64 floats = 16 KiB — nowhere near the round-8 literal-
  * shipping pathology, which was Q·m·k per query).
  */
object OPQ {

  /** Natural-order Walsh–Hadamard rows: `H[i][j] = (−1)^popcount(i AND j)`
    * — mutually orthogonal ±1 rows; `H/√dim` is orthonormal. `dim` must
    * be a power of two.
    */
  def hadamardRows(dim: Int): Array[Array[Float]] = {
    require(dim >= 2 && (dim & (dim - 1)) == 0, s"dim must be a power of two: $dim")
    Array.tabulate(dim, dim)((i, j) =>
      if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0f else -1.0f)
  }

  /** Rotate a float-array embedding column by `H/√dim`:
    * `out[i] = round(graft_dot(v, H[i]) / √dim, roundScale)` — the same
    * left-to-right accumulation + 6-dp rounding contract every PQ oracle
    * already replays. Returns `(vec_id LONG, embedding ARRAY<DOUBLE>)`.
    */
  def rotate(
      df: DataFrame,
      id: Column,
      vec: Column,
      dim: Int,
      roundScale: Int = 6): DataFrame = {
    val rows = hadamardRows(dim)
    val scale = math.sqrt(dim.toDouble)
    val comps = rows.map(r =>
      round(VectorFunctions.dot(vec, lit(r)) / scale, roundScale))
    df.select(id.cast("long").as("vec_id"),
      array(comps.toIndexedSeq: _*).as("embedding"))
  }
}
