package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product quantization for nearest
  * neighbor search"): split the embedding into `m` equal subspaces, train
  * one k-codeword codebook per subspace ([[Clustering.lloydCentroids]] —
  * the deterministic Lloyd with smallest-id seeding and grid-rounded
  * state, so two engines train bit-identical codebooks), ENCODE every
  * vector as its m nearest-codeword indices, and search with ASYMMETRIC
  * distances: the query stays raw, per query a Q·m·k lookup table of
  * query-slice-to-codeword distances is built once, and a corpus row's
  * distance is m table reads off its CODE.
  *
  * The 100-TB vector story past IVF+int8 (q32/q52): the serving scan
  * reads m small ints per vector instead of dim floats (64-dim float →
  * 4 bytes at m=4/k≤256 — a 64× scan shrink), the codebooks and tables
  * ride broadcast banks ([[graft.plans.DistBank]],
  * [[graft.plans.AdcBank]]), and the per-row work is a fused codegen
  * lookup loop, never a HOF dispatch.
  *
  * Determinism contract (what the cross-engine gate leans on): codebooks
  * on the centroid grid, per-subspace distances on the dist grid, ADC
  * totals summed in ascending-j order, argmins tied to the SMALLEST
  * codeword / neighbor id.
  */
object PQ {

  /** Per-subspace codebooks: `books(j)(c)` = codeword `c` of subspace `j`
    * (each of width `subDim`).
    */
  final case class Codebooks(books: Array[Array[Array[Double]]], subDim: Int) {
    def m: Int = books.length
    def k: Int = books.head.length
    require(books.nonEmpty && books.forall(_.length == books.head.length),
      "codebooks must be non-empty with a uniform k")
    require(books.forall(_.forall(_.length == subDim)),
      s"every codeword must have width $subDim")
  }

  /** Train `m` codebooks of `k` codewords each over equal vector slices —
    * value-identical to one deterministic [[Clustering.lloydCentroids]]
    * run per subspace (seeds = the k smallest ids' slices; identical
    * kernels, grids, and tie rules — parity is spec-asserted), but
    * executed JOINTLY: the m per-subspace Lloyd recursions are
    * independent, so each iteration computes every subspace's ASSIGN
    * argmin and per-(subspace, cluster) dimension means in ONE corpus
    * pass (one map-side-combined exchange of m·k rows) instead of m
    * separate runs each rescanning the corpus per iteration. At 100 TB
    * that is `iters` training scans instead of m·iters; at bench scale
    * it cuts the m·(iters+2) driver round-trips to iters+2.
    */
  def trainCodebooks(
      df: DataFrame,
      id: Column,
      vec: Column,
      m: Int,
      k: Int,
      iters: Int,
      distScale: Int = 6,
      centroidScale: Int = 6): Codebooks = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val rows = df.select(id.cast("long").as("id"), vec.cast("array<double>").as("v"))
    val dim = {
      val d = rows.select(size(col("v"))).head().getInt(0)
      require(d >= 1, "trainCodebooks: empty vectors")
      d
    }
    require(dim % m == 0, s"dim $dim must split into m=$m equal subspaces")
    val sub = dim / m
    // Seeds: the k smallest-id FULL vectors collected once and sliced
    // driver-side — elementwise identical to collecting each subspace's
    // sliced relation separately (slice of cast = cast of slice).
    val seedRows = rows.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(seedRows.length == k, s"lloyd: need >= $k rows, got ${seedRows.length}")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      seedRows.map(fv => fv.slice(j * sub, (j + 1) * sub)
        .map(Clustering.gridHalfUp(_, centroidScale)))
    }
    for (_ <- 1 to iters) {
      // ASSIGN per subspace rides the same fused SqDistsB kernel + ties-
      // to-lowest argmin as Clustering.assignTo; UPDATE stacks the m
      // (subspace, cluster, slice) assignments and averages every
      // dimension per (subspace, cluster) — the same value multiset, in
      // the same within-partition row order, as the m independent
      // aggregates.
      val pieces = (0 until m).map { j =>
        val sv = slice(col("v"), j * sub + 1, sub)
        val dArr = graft.plans.DistBank.distsColumn(sv, books(j), distScale)
        struct(lit(j).as("j"),
          (array_position(dArr, array_min(dArr)) - 1).cast("int").as("cluster"),
          sv.as("sv"))
      }
      val dimAvgs = (0 until sub).map(p => avg(element_at(col("sv"), p + 1)).as(s"p$p"))
      val updated = rows
        .select(explode(array(pieces: _*)).as("e"))
        .select(col("e.j").as("j"), col("e.cluster").as("cluster"), col("e.sv").as("sv"))
        .groupBy(col("j"), col("cluster"))
        .agg(dimAvgs.head, dimAvgs.tail: _*)
        .collect()
        .map { r =>
          (r.getInt(0), r.getInt(1)) ->
            Array.tabulate(sub)(p =>
              Clustering.gridHalfUp(r.getDouble(p + 2), centroidScale))
        }.toMap
      // empty clusters keep their previous codeword (standard Lloyd)
      books = Array.tabulate(m)(j =>
        Array.tabulate(k)(c => updated.getOrElse((j, c), books(j)(c))))
    }
    Codebooks(books, sub)
  }

  /** Encode every vector as its m nearest-codeword indices (0-based,
    * ties to the smallest codeword): (id LONG, code ARRAY<INT>[m]).
    * One [[graft.plans.SqDistsB]] kernel evaluation per subspace per row
    * — the compressed representation a 100-TB corpus stores and serves.
    */
  def encode(
      df: DataFrame,
      id: Column,
      vec: Column,
      cb: Codebooks,
      distScale: Int = 6,
      carry: Seq[Column] = Nil): DataFrame = {
    val v = vec.cast("array<double>")
    val codeCols = (0 until cb.m).map { j =>
      val d = graft.plans.DistBank.distsColumn(
        slice(v, j * cb.subDim + 1, cb.subDim), cb.books(j), distScale)
      (array_position(d, array_min(d)) - 1).cast("int")
    }
    df.select(id.cast("long").as("id") +: array(codeCols: _*).as("code") +: carry: _*)
  }

  /** Asymmetric-distance top-k over an ENCODED corpus: per query the
    * Q·m·k distance table is built driver-side from the raw query vector
    * (bounded by `maxQueries`), broadcast once ([[graft.plans.AdcBank]]),
    * and every code row pays Q·m table reads inside codegen — the corpus
    * is scanned once, codes only, never shuffled before the per-query
    * top-k cut. Self-matches (`n_id == q_id`) are excluded, ties break to
    * the smallest neighbor id.
    *
    * @return (q_id LONG, n_id LONG, rank INT from 1, dist DOUBLE — the
    *         j-ordered ADC sum rounded to 10^-distScale)
    */
  def adcTopK(
      codes: DataFrame,
      queries: DataFrame,
      qid: Column,
      qvec: Column,
      cb: Codebooks,
      topK: Int,
      distScale: Int = 6,
      maxQueries: Int = 4096): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val qs = queries.select(qid.cast("long"), qvec.cast("array<double>"))
      .limit(maxQueries + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qs.length <= maxQueries,
      s"adcTopK is a broadcast-table search: more than $maxQueries queries would " +
        "blow the bank — page the query set or raise maxQueries deliberately")
    require(qs.nonEmpty, "adcTopK: empty query set")
    require(qs.forall(_._2.length == cb.m * cb.subDim),
      s"query vectors must have dim ${cb.m * cb.subDim}")

    val tables = adcTables(qs.map(_._2), cb, distScale)
    val qids: Array[Long] = qs.map(_._1)

    val scored = codes
      .select(col("id").as("n_id"),
        posexplode(graft.plans.AdcBank.distsColumn(col("code"), tables)))
      .select(element_at(lit(qids), col("pos") + 1).as("q_id"), col("n_id"),
        round(col("col"), distScale).as("dist"))
      .where(col("n_id") =!= col("q_id") && col("dist").isNotNull)
    perQueryTopKByDist(scored, topK)
  }

  /** Per-query SMALLEST-distance top-k as the bounded aggregate
    * ([[KNN.perQueryTopK]]'s min-dist sibling): greatest struct of
    * (−dist, −n_id) = (dist asc, n_id asc), ≤ k rows per query per
    * mapper across the exchange.
    */
  /** Per-query lookup tables on the SAME grid as encode: table(q)(j)(c) =
    * gridHalfUp(||q_j − books(j)(c)||²) — the j-sliced sq-dist the corpus
    * side saw at encode time. Shared with [[IVFPQ]] (whose "queries" are
    * per-probe residuals).
    */
  private[similarity] def adcTables(
      qvs: Array[Array[Double]],
      cb: Codebooks,
      distScale: Int): Array[Array[Array[Double]]] =
    qvs.map { qv =>
      Array.tabulate(cb.m) { j =>
        val qj = qv.slice(j * cb.subDim, (j + 1) * cb.subDim)
        Array.tabulate(cb.k) { c =>
          val cw = cb.books(j)(c)
          var acc = 0.0
          var i = 0
          while (i < cb.subDim) { val d = qj(i) - cw(i); acc += d * d; i += 1 }
          Clustering.gridHalfUp(acc, distScale)
        }
      }
    }

  private[similarity] def perQueryTopKByDist(scored: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.topKByGroup(scored, Seq(col("q_id")),
        struct((-col("dist")).as("__nd"), (-col("n_id")).as("__ni"),
          col("n_id"), col("dist")), k)
      .select(col("q_id"), col("n_id"), col("rank"), col("dist"))

  /** The PRODUCTION PQ serving shape: ADC shortlist, exact rerank — take
    * the ADC top-`shortlist` per query off the codes (never touching raw
    * vectors), then fetch raw vectors for ONLY those Q·shortlist
    * candidates (a semi-join-restricted scan) and re-rank by exact
    * squared L2. Quantization error caps the shortlist's recall, the
    * rerank removes it from the final ordering — recall@k is then "is the
    * true neighbor in the ADC top-`shortlist`", a far weaker ask than
    * "is it in the ADC top-k" (measured on the spec's isotropic
    * embeddings: 0.46 raw → ~0.9 reranked at shortlist 50).
    *
    * @return (q_id, n_id, rank, dist — EXACT grid-rounded squared L2)
    */
  def adcTopKReranked(
      codes: DataFrame,
      vectors: DataFrame,
      vid: Column,
      vvec: Column,
      queries: DataFrame,
      qid: Column,
      qvec: Column,
      cb: Codebooks,
      topK: Int,
      shortlist: Int,
      distScale: Int = 6,
      maxQueries: Int = 4096): DataFrame = {
    require(shortlist >= topK, s"shortlist $shortlist must be >= topK $topK")
    val short = adcTopK(codes, queries, qid, qvec, cb, shortlist, distScale, maxQueries)
      .select(col("q_id"), col("n_id"))
    val qs = queries.select(qid.cast("long"), qvec.cast("array<double>"))
      .limit(maxQueries).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qids: Array[Long] = qs.map(_._1)
    // exact distances for the shortlist only: the query bank gives every
    // query's distance in one kernel pass; pick the row's own query out
    val dArr = graft.plans.DistBank.distsColumn(
      col("__v").cast("array<double>"), qs.map(_._2), distScale)
    val exact = short
      .join(vectors.select(vid.cast("long").as("n_id"), vvec.as("__v")), Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        element_at(dArr, array_position(lit(qids), col("q_id")).cast("int")).as("dist"))
    perQueryTopKByDist(exact, topK)
  }
}
