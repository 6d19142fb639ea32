package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF + PQ composite — the FAISS IVFPQ shape (Jégou et al. §V): a coarse
  * quantizer partitions the corpus into cells ([[IVF.literalCell]], the
  * same fixed centroids and first-max tie contract as every IVF
  * operator), and PRODUCT QUANTIZATION encodes each vector's RESIDUAL
  * against its cell centroid ([[PQ]]) — residuals concentrate around 0,
  * so the same codebook budget spends its resolution where the data
  * actually is, and serving probes only `nProbe` cells' code lists.
  *
  * The 100-TB serving stack this completes: cell partition prunes the
  * scan to probed cells, codes shrink what's scanned ~dim·4/m bytes per
  * vector, the ADC tables ride one broadcast bank, and the top-k cut is
  * the bounded aggregate — no stage touches more than
  * |probed cells| · codes.
  *
  * Determinism: centroids are exact 1024ths (float → double exact), so
  * residual subtraction is bit-identical cross-engine; codebooks/tables
  * inherit [[PQ]]'s grids and j-order; probe selection reuses the
  * `dot(q,c)/‖c‖` kernel arithmetic the q32 oracle already replays.
  */
object IVFPQ {

  /** The residual relation: (id LONG, cell INT, rv ARRAY<DOUBLE> =
    * v − centroid[cell]) — the training AND encoding input.
    */
  def residuals(
      df: DataFrame,
      id: Column,
      vec: Column,
      cents: Array[Array[Float]]): DataFrame = {
    val centsD: Seq[Seq[Double]] = cents.map(_.map(_.toDouble).toSeq).toSeq
    // the assignment kernel scores FLOAT vectors (the IVF convention —
    // embeddings are stored float); the residual itself is double-exact
    df.select(id.cast("long").as("id"), vec.cast("array<double>").as("v"),
        IVF.literalCell(vec.cast("array<float>"), cents).as("cell"))
      .withColumn("rv",
        zip_with(col("v"), element_at(typedlit(centsD), col("cell") + 1), (a, b) => a - b))
      .select(col("id"), col("cell"), col("rv"))
  }

  /** Train the residual codebooks (ONE codebook set across all cells —
    * the standard IVFPQ layout) and encode: (id, cell, code).
    */
  def trainCodebooks(
      res: DataFrame,
      m: Int,
      k: Int,
      iters: Int,
      distScale: Int = 6,
      centroidScale: Int = 6): PQ.Codebooks =
    PQ.trainCodebooks(res, col("id"), col("rv"), m, k, iters, distScale, centroidScale)

  def encode(res: DataFrame, cb: PQ.Codebooks, distScale: Int = 6): DataFrame =
    PQ.encode(res, col("id"), col("rv"), cb, distScale, carry = Seq(col("cell")))

  /** Asymmetric-distance top-k over the cell-partitioned codes: each
    * query probes its `nProbe` best cells (scores via the SAME
    * [[graft.plans.CellScoresB]] kernel as assignment — the tie contract
    * that makes probes and cells agree), the per-(query, probe) RESIDUAL
    * builds one m·k lookup table, all Q·nProbe tables ride one broadcast
    * [[graft.plans.AdcBank]], and a code row only scores against its own
    * cell's entries. Self-matches excluded; ties to the smallest n_id.
    *
    * @return (q_id, n_id, rank, dist — the j-ordered residual-ADC sum)
    */
  def adcTopK(
      codes: DataFrame,
      queries: DataFrame,
      qid: Column,
      qvec: Column,
      cents: Array[Array[Float]],
      cb: PQ.Codebooks,
      topK: Int,
      nProbe: Int,
      distScale: Int = 6,
      maxQueries: Int = 4096): DataFrame = {
    require(topK >= 1 && nProbe >= 1, s"topK/nProbe must be >= 1: $topK/$nProbe")
    // probe selection through the assignment kernel, then collected:
    // (q_id, cell) pairs plus the raw query vectors for the residuals
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("cell").asc)
    val probeRows = queries
      .select(qid.cast("long").as("q_id"), qvec.cast("array<double>").as("qv"),
        posexplode(graft.plans.CentroidBank.scoresColumn(qvec, cents)).as(Seq("cell", "score")))
      .withColumn("__pr", row_number().over(probeW))
      .where(col("__pr") <= nProbe)
      .select(col("q_id"), col("cell"), col("qv"))
      .limit(maxQueries * nProbe + 1)
      .collect()
    require(probeRows.length <= maxQueries * nProbe,
      s"adcTopK is a broadcast-table search: more than $maxQueries queries would " +
        "blow the bank — page the query set or raise maxQueries deliberately")
    require(probeRows.nonEmpty, "adcTopK: empty query set")
    // dimension contract up front (the PQ.adcTopK discipline): a query
    // vector longer than the centroid width would otherwise surface as an
    // opaque ArrayIndexOutOfBounds in the residual tabulate, and a shorter
    // one as a deeper failure inside PQ.adcTables
    val dim = cents(0).length
    require(dim == cb.m * cb.subDim,
      s"adcTopK: centroid dim $dim != codebook m*subDim = ${cb.m}*${cb.subDim}")

    // per-(query, probe) residual → table; entry axis = Q·nProbe
    val entries = probeRows.map { r =>
      val qv = r.getSeq[Double](2).toArray
      require(qv.length == dim,
        s"adcTopK: query q_id=${r.getLong(0)} has dim ${qv.length}, " +
          s"coarse centroids have dim $dim — the query set must match the index")
      val cell = r.getInt(1)
      val cw = cents(cell)
      val rv = Array.tabulate(qv.length)(i => qv(i) - cw(i))
      (r.getLong(0), cell, rv)
    }
    val tables = PQ.adcTables(entries.map(_._3), cb, distScale)
    val qidArr: Array[Long] = entries.map(_._1)
    val cellArr: Array[Int] = entries.map(_._2)

    val scored = codes
      .select(col("id").as("n_id"), col("cell"),
        posexplode(graft.plans.AdcBank.distsColumn(col("code"), tables)))
      // a code row scores ONLY against its own cell's probe entries
      .where(element_at(lit(cellArr), col("pos") + 1) === col("cell"))
      .select(element_at(lit(qidArr), col("pos") + 1).as("q_id"), col("n_id"),
        round(col("col"), distScale).as("dist"))
      .where(col("n_id") =!= col("q_id") && col("dist").isNotNull)
    PQ.perQueryTopKByDist(scored, topK)
  }
}
