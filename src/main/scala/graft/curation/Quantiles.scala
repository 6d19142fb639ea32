package graft.curation

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** EXACT per-group quantiles at corpus scale, by histogram refinement —
  * the distributed selection algorithm, not a sort.
  *
  * The naive exact form (`row_number` over the group, pick the rank) puts
  * every group in ONE task's sort buffer: with 3 groups over 100 TB that
  * is a 33-TB partition — the canonical scale-killer. Spark's own
  * `percentile_approx` avoids it but is approximate. This operator is
  * both exact and shuffle-light:
  *
  *   1. seeding — ONE scan: per group, a bounded-state EXACT dyadic
  *      histogram ([[graft.plans.DyadicHistAgg]], a
  *      `TypedImperativeAggregate` with ≤ `seedCells` cells: exact
  *      counts, exact per-cell min/max, map-side partial merge). That
  *      single aggregate is simultaneously the group's `n`/`min`/`max`
  *      AND a first refinement round — it replaces the former
  *      count/min/max pass PLUS the first broadcast-histogram pass.
  *      Target rank `r = clamp(ceil(q·n), 1, n)` per (group, quantile) —
  *      the type-1 / discrete quantile definition (the value AT rank r,
  *      no interpolation), so the answer is always an element of the
  *      data and ties make it deterministic regardless of row order. The
  *      driver walk over the ≤ |groups|·seedCells readout re-bases each
  *      rank into its candidate cell `[cmin, cmax]`.
  *   2. refinement rounds (only for cells still holding > `maxFinal`
  *      rows — at 100 TB scale, not at gate scale): bucket each open
  *      (group, q) cell into `buckets` equi-width sub-cells, count rows
  *      per sub-cell (map-combined agg over a BROADCAST of the tiny
  *      state — never a shuffle of the data), walk the cumulative
  *      counts, recurse with the rank re-based. Per-round state is
  *      |groups|·|qs| rows (collected driver-side — the same bounded
  *      readout as IVF's centroid fetch, documented there).
  *   3. final pass: once a (group, q)'s candidate cell holds ≤
  *      `maxFinal` rows (or the cell has collapsed to a single value),
  *      sort JUST those rows per (group, q) and `row_number` out the
  *      answer — a partition bounded by `maxFinal`, not by group size.
  *
  * The seed already resolves ~range/seedCells; one refinement round at
  * the default 8192 buckets then reaches seedCells·8192 ≈ 8.4·10⁶ cells;
  * a 10¹²-row group averages ~10⁵ rows per cell after one round, under
  * the default `maxFinal`. Degenerate distributions (one value
  * dominating a cell) cannot loop forever: a cell whose min == max IS
  * the answer and closes immediately.
  */
object Quantiles {

  /** `(group, q, value)` for every group of `groupCol` and every q in
    * `qs`. `valueCol` must be numeric (cast to double internally; the
    * returned value is the original double).
    */
  def exactQuantiles(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      qs: Seq[Double],
      buckets: Int = 8192,
      maxFinal: Long = 1L << 20,
      maxRounds: Int = 8,
      seedCells: Int = 1024
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val spark = df.sparkSession

    val base = df.select(groupCol.as("g"), valueCol.cast("double").as("v"),
        lit(1L).as("w"))
      .where(col("v").isNotNull)
    seedAndResolve(base, qs, buckets, maxFinal, maxRounds, seedCells)
  }

  /** WEIGHTED exact per-group quantiles: the value at weighted rank
    * `clamp(ceil(q·W), 1, W)` where `W = Σ weight` — i.e. the smallest v
    * whose cumulative weight reaches the rank; with all weights 1 this
    * IS [[exactQuantiles]]'s type-1 definition. The curation use is
    * token-weighted percentiles ("the quality score below which 10% of
    * the CORPUS TOKENS sit", not 10% of documents) — document-weighted
    * and token-weighted cuts diverge exactly when long documents skew
    * the tail, which is when the distinction matters.
    *
    * Same machinery end-to-end: the dyadic seed aggregates exact
    * weighted mass per cell ([[graft.plans.DyadicHistAgg]] with the
    * weight child), refinement rounds aggregate `sum(w)`, and the final
    * pass walks cumulative weight over DISTINCT values. Weights must be
    * LONGs ≥ 1 (exact integer mass — fp weights would re-introduce the
    * associativity hazard the integer algebra exists to avoid); scale
    * fp weights to a fixed grid upstream. `maxFinal` bounds final-sort
    * cells by MASS, a conservative row bound.
    */
  def exactWeightedQuantiles(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      weightCol: Column,
      qs: Seq[Double],
      buckets: Int = 8192,
      maxFinal: Long = 1L << 20,
      maxRounds: Int = 8,
      seedCells: Int = 1024
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val base = df.select(groupCol.as("g"), valueCol.cast("double").as("v"),
        weightCol.cast("long").as("w"))
      .where(col("v").isNotNull)
    seedAndResolve(base, qs, buckets, maxFinal, maxRounds, seedCells)
  }

  /** Shared engine: dyadic-histogram seed scan + rank walk, then
    * [[refineAndResolve]]. `base` carries `(g, v, w)` with w = 1 for the
    * unweighted form.
    */
  private def seedAndResolve(
      base: DataFrame,
      qs: Seq[Double],
      buckets: Int,
      maxFinal: Long,
      maxRounds: Int,
      seedCells: Int): DataFrame = {
    // seed state — ONE scan (scaladoc step 1): per (group, q), the rank
    // re-based into the dyadic cell [cmin, cmax] that contains it
    val state: Array[Row] = base.groupBy(col("g"))
      .agg(graft.plans.DyadicHistAgg.column(col("v"), seedCells, col("w")).as("h"))
      .collect()
      .flatMap { r =>
        val cells = r.getSeq[Row](1)
          .map(c => (c.getLong(0), c.getDouble(1), c.getDouble(2)))
        walkCells(cells, qs).map { case (q, rank, lo, hi, cnt) =>
          Row(r.get(0), q, rank, lo, hi, cnt)
        }
      }
    refineAndResolve(base, state, qs, buckets, maxFinal, maxRounds)
  }

  /** Rank walk over one group's VALUE-ORDERED cells `(cnt, cmin, cmax)`:
    * per q, the type-1 rank `clamp(ceil(q·n), 1, n)` re-based into its
    * containing cell. Returns `(q, rank-in-cell, lo, hi, cnt)` rows —
    * the refinement-state shape. Shared by the batch seed and the
    * streaming snapshot gate.
    */
  private[graft] def walkCells(
      cells: Seq[(Long, Double, Double)],
      qs: Seq[Double]): Seq[(Double, Long, Double, Double, Long)] = {
    val n = cells.iterator.map(_._1).sum
    if (n == 0) Nil
    else qs.map { q =>
      val rank = math.min(n, math.max(1L, math.ceil(q * n).toLong))
      var cum = 0L
      var i = 0
      while (cum + cells(i)._1 < rank) { cum += cells(i)._1; i += 1 }
      val c = cells(i)
      (q, rank - cum, c._2, c._3, c._1)
    }
  }

  /** Steps 2–3 of the scaladoc: equi-width refinement rounds for cells
    * still holding > `maxFinal` mass, then the bounded final pass. Takes
    * `base(g, v, w)` (w = 1 for unweighted) and the seed state as
    * `(g, q, rank, lo, hi, rows_in_range)` rows — produced by the
    * one-scan dyadic aggregate or by a streaming
    * [[graft.plans.DyadicHist]] snapshot. The final pass walks
    * CUMULATIVE WEIGHT over distinct values inside the candidate range
    * (for w = 1 identical to the rank-r row of the sorted multiset, the
    * type-1 answer, with no per-row tie arbitrariness).
    */
  private[graft] def refineAndResolve(
      base: DataFrame,
      seedState: Array[Row],
      qs: Seq[Double],
      buckets: Int,
      maxFinal: Long,
      maxRounds: Int
  ): DataFrame = {
    require(base.columns.toSeq == Seq("g", "v", "w"),
      s"refineAndResolve: base must be (g, v, w), got ${base.columns.mkString(",")}")
    val spark = base.sparkSession
    val stateSchema = StructType(Seq(
      StructField("g", base.schema("g").dataType),
      StructField("q", DoubleType),
      StructField("rank", LongType),
      StructField("lo", DoubleType), StructField("hi", DoubleType),
      StructField("rows_in_range", LongType)))
    var state: Array[Row] = seedState

    var resolved = Vector.empty[(Any, Double, Double)] // (g, q, value)
    var round = 0
    while (state.nonEmpty && round < maxRounds) {
      // cells whose range has collapsed, or is small enough for the final
      // sort, leave the loop
      val (closed, fine) = state.partition(r => r.getDouble(3) == r.getDouble(4))
      resolved ++= closed.map(r => (r.get(0), r.getDouble(1), r.getDouble(3)))
      val (smallEnough, open) = fine.partition(_.getLong(5) <= maxFinal)

      if (smallEnough.nonEmpty) {
        // cells sharing a candidate RANGE share one sort: qs over the
        // same (g, lo, hi) — always true in round 0, where every q of a
        // group spans the full [min, max] — rank out of a single
        // windowed pass instead of re-scanning the base once per q
        // (measured 4.4 s → 1.8 s on the 3-quantile q103 gate at sf0.1)
        val ranges = smallEnough
          .map(r => (r.get(0), r.getDouble(3), r.getDouble(4))).distinct
        val rangesDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            ranges.toIndexedSeq.map(t => Row(t._1, t._2, t._3)), 1),
          StructType(Seq(
            StructField("g", base.schema("g").dataType),
            StructField("lo", DoubleType), StructField("hi", DoubleType))))
        val ranksDf = spark.createDataFrame(
          spark.sparkContext.parallelize(smallEnough.toIndexedSeq, 1), stateSchema)
          .select(col("g"), col("q"), col("rank"), col("lo"), col("hi"))
        // cumulative WEIGHT over distinct values: the bracketing value is
        // the one whose cum first reaches the rank — deterministic under
        // ties by construction (equal values are ONE row here)
        val w = Window.partitionBy(col("g"), col("lo"), col("hi")).orderBy(col("v"))
        resolved ++= base
          .join(broadcast(rangesDf), base("g") === rangesDf("g") &&
            col("v") >= col("lo") && col("v") <= col("hi"))
          .groupBy(base("g").as("g"), col("lo"), col("hi"), col("v"))
          .agg(sum(col("w")).as("wv"))
          .withColumn("cum", sum(col("wv")).over(w))
          .join(broadcast(ranksDf), Seq("g", "lo", "hi"))
          .where(col("cum") >= col("rank") && col("cum") - col("wv") < col("rank"))
          .select(col("g"), col("q"), col("v"))
          .collect()
          .map(r => (r.get(0), r.getDouble(1), r.getDouble(2)))
      }

      state =
        if (open.isEmpty) Array.empty
        else {
          val openDf = spark.createDataFrame(
            spark.sparkContext.parallelize(open.toIndexedSeq, 1), stateSchema)
          // histogram per open (g, q): bucket index within [lo, hi]
          val width = (col("hi") - col("lo")) / buckets
          val cell = least(lit(buckets - 1),
            floor((col("v") - col("lo")) / width).cast("int"))
          val hist = base
            .join(broadcast(openDf), base("g") === openDf("g") &&
              col("v") >= col("lo") && col("v") <= col("hi"))
            .groupBy(base("g").as("g"), col("q"), col("rank"), col("lo"), col("hi"),
              cell.as("cell"))
            .agg(sum(col("w")).as("c"), min(col("v")).as("cmin"), max(col("v")).as("cmax"))
          // walk cumulative counts (≤ buckets rows per (g,q)) to the
          // cell holding the rank; re-base the rank into it
          val ws = Window.partitionBy(col("g"), col("q")).orderBy(col("cell"))
          hist
            .withColumn("cum", sum(col("c")).over(ws))
            .where(col("cum") >= col("rank") && col("cum") - col("c") < col("rank"))
            .select(col("g"), col("q"),
              (col("rank") - (col("cum") - col("c"))).as("rank"),
              col("cmin").as("lo"), col("cmax").as("hi"), col("c").as("rows_in_range"))
            .collect()
        }
      round += 1
    }
    require(state.isEmpty,
      s"quantile refinement did not converge in $maxRounds rounds (${state.length} open cells)")

    // |groups|·|qs| rows by construction — the readout, not data
    val outSchema = StructType(Seq(
      StructField("g", base.schema("g").dataType),
      StructField("q", DoubleType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(resolved.map(t => Row(t._1, t._2, t._3)), 1),
      outSchema)
  }

  /** Equi-depth (quantile) bucketing: per-group counts at each of
    * `nBuckets` value-boundary buckets, with the boundaries the exact
    * type-1 quantiles at k/n — the deterministic feature-binning
    * transform (NTILE splits by RANK and breaks value ties arbitrarily
    * across rows; value-boundary bucketing sends every equal value to
    * the same bucket on every engine and every run, which is what a
    * reproducible feature pipeline needs; the price is that heavy ties
    * make bucket sizes uneven — that is the data telling the truth).
    *
    * `bucket(v) = 1 + |{cuts < v}|` over the n−1 interior cuts: a value
    * EQUAL to a cut lands in the lower bucket. One [[exactQuantiles]]
    * run resolves all cuts (shared refinement), the per-group cut
    * arrays broadcast back (≤ |groups|·(n−1) values), labeling is a
    * pure row expression, and the final count is one map-combined agg.
    */
  def equiDepthBuckets(
      df: DataFrame,
      group: Column,
      value: Column,
      nBuckets: Int
  ): DataFrame = {
    require(nBuckets >= 2, s"need >= 2 buckets: $nBuckets")
    val base = df.select(group.as("g"), value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = exactQuantiles(base, col("g"), col("v"), qs)
      .groupBy(col("g"))
      .agg(array_sort(collect_list(col("value"))).as("cuts"))
    base.join(broadcast(cuts), Seq("g"))
      .select(col("g"),
        (size(filter(col("cuts"), c => c < col("v"))) + 1).as("bucket"))
      .groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Winsorization report: per-group clip points at the `pLo`/`pHi`
    * type-1 quantiles and how many rows each side would clip — the
    * decision readout a pipeline inspects before clamping a reward /
    * quality / length column (clip too little and the tail still
    * dominates the loss; clip too much and the signal flattens).
    *
    * Both cuts come from ONE [[exactQuantiles]] run (two qs share every
    * refinement round), so the cost is the q103 histogram passes plus a
    * final map-combined count; the (group → cuts) relation broadcasts
    * back at ≤ |groups| rows. Cuts are exact DATA values — apply the
    * clamp downstream as `greatest(lo_cut, least(hi_cut, v))` and the
    * result is engine-deterministic with no fp ambiguity.
    */
  def winsorizeReport(
      df: DataFrame,
      group: Column,
      value: Column,
      pLo: Double = 0.01,
      pHi: Double = 0.99
  ): DataFrame = {
    require(pLo > 0 && pLo < pHi && pHi <= 1,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    val base = df.select(group.as("g"), value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val cuts = exactQuantiles(base, col("g"), col("v"), Seq(pLo, pHi))
    val lo = cuts.where(col("q") === pLo).select(col("g"), col("value").as("lo_cut"))
    val hi = cuts.where(col("q") === pHi).select(col("g"), col("value").as("hi_cut"))
    base.join(broadcast(lo), Seq("g")).join(broadcast(hi), Seq("g"))
      .groupBy(col("g"), col("lo_cut"), col("hi_cut"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v") < col("lo_cut"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("hi_cut"), 1L).otherwise(0L)).as("n_hi"))
      .select(col("g"), col("n"), col("lo_cut"), col("hi_cut"),
        col("n_lo"), col("n_hi"))
  }

  /** Robust per-group outlier report: median / MAD (median absolute
    * deviation) / outlier count at `|v − median| > k·MAD` — the
    * quality-score outlier screen that mean/stddev z-scores get wrong on
    * exactly the data that needs screening (a fat tail drags the mean
    * toward itself; the median and MAD are 50%-breakdown estimators, so
    * the flags don't move when the contamination grows).
    *
    * Both medians are EXACT type-1 quantiles via [[exactQuantiles]] —
    * histogram refinement, never a whole-group sort — so the whole report
    * costs a handful of map-combined aggregate scans regardless of group
    * size, and the (group → median/MAD) relations are broadcast back
    * (≤ |groups| rows each; the data never shuffles at all).
    *
    * Degenerate groups behave by the standard MAD convention: a group
    * where > 50% of rows share one value has MAD = 0, and every row not
    * exactly at the median flags as an outlier (`|v−med| > 0`) — loud, by
    * design, because a z-score would silently divide by a near-zero σ.
    */
  def madOutlierReport(
      df: DataFrame,
      group: Column,
      value: Column,
      k: Double = 3.0
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(group.as("g"), value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val med = exactQuantiles(base, col("g"), col("v"), Seq(0.5))
      .select(col("g"), col("value").as("med"))
    val dev = base.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("d"))
    val mad = exactQuantiles(dev, col("g"), col("d"), Seq(0.5))
      .select(col("g"), col("value").as("mad"))
    base.join(broadcast(med), Seq("g")).join(broadcast(mad), Seq("g"))
      .groupBy(col("g"), col("med"), col("mad"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(col("v") - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("g"), col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** ADAPTIVE per-group threshold filter — "keep each domain's rows at or
    * above that domain's own q-quantile of `value`": the per-source
    * quality floor a curation pipeline applies instead of one global
    * cutoff (a global floor empties low-scoring domains and keeps every
    * head-domain row; the adaptive floor trims each domain's own tail).
    * Keeps rows with `value >= quantile_q(value | group)`; rows with a
    * null value, and groups whose values are all null, are dropped (no
    * threshold exists to compare against — a silent keep would defeat the
    * screen). The group's threshold is appended as `threshold`.
    *
    * Scale shape: thresholds come from [[exactQuantiles]] (distributed
    * histogram refinement — never a whole-group sort), yielding a
    * ≤ #groups-row relation that broadcast-joins back onto the corpus —
    * the corpus itself is scanned for the histogram passes and filtered
    * once, with no corpus-side shuffle beyond the quantile aggregation.
    */
  def adaptiveThresholdFilter(
      df: DataFrame,
      group: Column,
      value: Column,
      q: Double
  ): DataFrame = {
    require(q > 0 && q <= 1, s"q must be in (0,1], got $q")
    val thr = exactQuantiles(df, group, value, Seq(q))
      .select(col("g").as("__tg"), col("value").as("threshold"))
    df.withColumn("__g", group).withColumn("__v", value.cast("double"))
      .join(broadcast(thr), col("__g") <=> col("__tg"))
      .where(col("__v") >= col("threshold"))
      .drop("__g", "__v", "__tg")
  }

  /** QUALITY-SIGNAL RANK ENSEMBLE: blend heterogeneous quality signals
    * (length, token count, entropy, model score …) into ONE composite by
    * first rank-normalizing each signal onto [0, 1] and then taking the
    * weighted average — raw signals live on incomparable scales
    * (characters vs nats vs logits), so averaging them directly lets the
    * widest-ranged signal drown the rest; CDF positions are
    * scale-free. This is the signal-combination step quality-filtered
    * corpora document (multiple heuristic scores → one keep/rank score).
    *
    * Rank normalization is the BINNED CDF, not an exact percent_rank:
    * each signal's [[exactQuantiles]] cut points at `j/bins`
    * (j = 1 … bins-1, type-1) are computed by distributed histogram
    * refinement, and a row's position is `#{cuts ≤ v} / bins` — exact to
    * 1/`bins` resolution. The deliberate trade: a true `percent_rank()`
    * is a per-signal GLOBAL sort (single-partition window — the one
    * shape this codebase bans at 100 TB), while the binned form costs
    * the refinement passes plus one map-side expression against a
    * ≤ `bins`-value broadcastable cut array per signal, and a composite
    * that ranks documents is insensitive to sub-1/256 CDF error.
    *
    * Output: the input row (`id` as `doc_id`) + `cdf_i` per signal (4 dp)
    * + `composite` (the weight-normalized blend, 4 dp). Rows where ANY
    * signal is null get a null composite (that signal's CDF is
    * undefined — an arbitrary 0 would silently sink the row's rank).
    */
  def cdfBlend(
      df: DataFrame,
      id: Column,
      signals: Seq[(Column, Double)],
      bins: Int = 256
  ): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    require(signals.forall(_._2 > 0), s"weights must be positive: ${signals.map(_._2)}")
    require(bins >= 2 && bins <= 65536, s"bins out of range: $bins")
    val wTotal = signals.map(_._2).sum
    val qs = (1 until bins).map(_.toDouble / bins)
    val cdfCols = signals.zipWithIndex.map { case ((sig, _), i) =>
      val cuts = exactQuantiles(df, lit(0), sig, qs)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      // binary-search count of cuts <= v ([[graft.plans.SearchSortedCountF]]):
      // evaluates the signal ONCE per row (a HOF filter lambda re-evaluates
      // it per cut — bins−1 tokenizer passes per row, profiled 15× slower)
      // and costs O(log bins), allocation-free, inside codegen
      val v = sig.cast("double")
      (org.apache.spark.sql.GraftBridge.column(
        graft.plans.SearchSortedCountF(
          cuts, org.apache.spark.sql.GraftBridge.expression(v)))
        .cast("double") / bins)
        .as(s"cdf_$i")
    }
    val composite = signals.zipWithIndex
      .map { case ((_, w), i) => col(s"cdf_$i") * (w / wTotal) }
      .reduce(_ + _)
    df.select((id.as("doc_id") +: cdfCols): _*)
      .select(
        (col("doc_id") +:
          signals.indices.map(i => round(col(s"cdf_$i"), 4).as(s"cdf_$i"))) :+
          round(composite, 4).as("composite"): _*)
  }
}
