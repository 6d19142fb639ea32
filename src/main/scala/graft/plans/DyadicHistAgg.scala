package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Mutable dyadic-histogram buffer: exact row counts and exact per-cell
  * min/max over cells of width 2^scale, at most `maxCells` cells.
  *
  * Every operation is EXACT — this is a lossless summary for quantile
  * selection, not a sketch:
  *
  *  - cell assignment is `floor(v / 2^scale)`; scaling by a power of two
  *    only shifts the exponent, so the division itself never rounds
  *    (the one fp corner, gradual underflow to a signed zero, is
  *    corrected to the true floor in [[DyadicHist.idxOf]]) — assignment
  *    is deterministic and MONOTONE in v, which is all rank-walking needs;
  *  - coarsening (scale+1) maps stored indices by arithmetic shift
  *    `idx >> 1` = floor(idx/2), and floor(v/2w) = floor(floor(v/w)/2)
  *    holds exactly for dyadic widths — fine cells NEST in coarse cells,
  *    so counts and min/max merge without error;
  *  - merging two buffers aligns the finer one to the coarser scale the
  *    same way.
  *
  * Capacity: an insert that would exceed `maxCells` distinct cells (or
  * whose index magnitude would overflow the exact-Long range 2^50)
  * coarsens until it fits — state is O(maxCells) regardless of group
  * size, value range, or skew.
  */
final class DyadicHist(val maxCells: Int) {
  import DyadicHist.IdxCap

  var scale: Int = 0
  val cells = new java.util.HashMap[java.lang.Long, DyadicHist.Cell]()
  private var empty = true

  def isEmpty: Boolean = empty

  /** Reconstruction hook (aggregate deserialization, streaming state
    * rebuild): adopt `(scale, cells)` wholesale — the indices are already
    * cell indices at that scale.
    */
  private[graft] def adopt(atScale: Int, entries: Array[(Long, DyadicHist.Cell)]): Unit = {
    scale = atScale
    empty = false
    entries.foreach { case (idx, c) => cells.put(idx, c) }
  }

  def insert(v: Double, cnt: Long = 1L, cmin: Double = Double.NaN,
      cmax: Double = Double.NaN): Unit = {
    require(!v.isNaN && !v.isInfinite,
      "graft_dyadic_hist: values must be finite (a NaN/Infinity has no rank " +
        "position — filter or clamp upstream)")
    if (empty) { scale = DyadicHist.initScale(v); empty = false }
    while (math.abs(Math.scalb(v, -scale)) >= IdxCap) coarsen()
    val idx = DyadicHist.idxOf(v, scale)
    val lo = if (cmin.isNaN) v else cmin
    val hi = if (cmax.isNaN) v else cmax
    val c = cells.get(idx)
    if (c == null) {
      cells.put(idx, new DyadicHist.Cell(cnt, lo, hi))
      while (cells.size > maxCells) coarsen()
    } else c.add(cnt, lo, hi)
  }

  /** Merge `other` in: align scales (coarsen the finer), then add cells. */
  def merge(other: DyadicHist): Unit = {
    if (other.isEmpty) return
    if (empty) { scale = other.scale; empty = false }
    while (scale < other.scale) coarsen()
    while (other.scale < scale) other.coarsen()
    val it = other.cells.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = cells.get(e.getKey)
      if (c == null) cells.put(e.getKey, e.getValue)
      else c.add(e.getValue.cnt, e.getValue.cmin, e.getValue.cmax)
    }
    while (cells.size > maxCells) coarsen()
  }

  /** Halve resolution: every cell folds into its dyadic parent, exactly. */
  def coarsen(): Unit = {
    scale += 1
    if (cells.isEmpty) return
    val old = cells.entrySet().toArray(
      new Array[java.util.Map.Entry[java.lang.Long, DyadicHist.Cell]](cells.size))
    cells.clear()
    var i = 0
    while (i < old.length) {
      val parent = java.lang.Long.valueOf(old(i).getKey.longValue() >> 1)
      val v = old(i).getValue
      val c = cells.get(parent)
      if (c == null) cells.put(parent, v) else c.add(v.cnt, v.cmin, v.cmax)
      i += 1
    }
  }

  /** Cells in ascending index order = ascending VALUE order (assignment
    * is monotone): `(cnt, cmin, cmax)` per cell.
    */
  def sortedCells(): Array[(Long, DyadicHist.Cell)] = {
    val arr = new Array[(Long, DyadicHist.Cell)](cells.size)
    val it = cells.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey.longValue(), e.getValue); i += 1 }
    java.util.Arrays.sort(arr, Ordering.by((t: (Long, DyadicHist.Cell)) => t._1))
    arr
  }
}

object DyadicHist {
  /** Index magnitudes stay below 2^50: exactly representable as doubles
    * with headroom, so `floor(...).toLong` never truncates.
    */
  val IdxCap: Double = Math.scalb(1.0, 50)

  final class Cell(var cnt: Long, var cmin: Double, var cmax: Double) {
    def add(n: Long, lo: Double, hi: Double): Unit = {
      cnt += n
      if (lo < cmin) cmin = lo
      if (hi > cmax) cmax = hi
    }
  }

  /** First-value scale: cell width 2^(exponent(v) − 40) puts the index
    * near 2^40 — fine resolution with 2^10 headroom under [[IdxCap]].
    */
  def initScale(v: Double): Int =
    Math.getExponent(if (v == 0.0) 1.0 else v) - 40

  /** True floor(v / 2^scale). `Math.scalb` is exact except for gradual
    * underflow to a signed zero, where the true floor is 0 (v > 0) or
    * −1 (v < 0); a −0.0 INPUT is normalized to cell 0 like +0.0.
    */
  def idxOf(v: Double, scale: Int): Long = {
    if (v == 0.0) return 0L
    val x = Math.scalb(v, -scale)
    if (x == 0.0) { if (v < 0) -1L else 0L }
    else math.floor(x).toLong
  }
}

/** EXACT per-group dyadic histogram as ONE bounded-state aggregate — the
  * seeding pass of [[graft.curation.Quantiles.exactQuantiles]]: one scan
  * yields, per group, ≤ `maxCells` value-ordered cells with exact counts
  * and exact in-cell min/max, which is simultaneously the group's n,
  * min, max AND a first refinement round — replacing the former
  * count/min/max aggregate PLUS the first broadcast-histogram scan (two
  * full passes) with one. Map-side partials combine before the exchange;
  * the shuffle carries ≤ maxCells cells per group per mapper, never rows.
  *
  * `weight` (LONG ≥ 1, default 1) turns the counts into exact weighted
  * mass — the token-weighted quantile seed
  * ([[graft.curation.Quantiles.exactWeightedQuantiles]]); a null or
  * non-positive weight is a loud error, a null value skips the row.
  *
  * Output: array of `(cnt, cmin, cmax)` structs in ascending value
  * order. Runs on `ObjectHashAggregateExec` (the [[TopKStructs]]
  * execution shape; per-row cost is one hash probe + min/max update).
  */
case class DyadicHistAgg(
    child: Expression,
    weight: Expression,
    maxCells: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DyadicHist]
  with BinaryLike[Expression] {

  require(maxCells >= 2 && maxCells <= (1 << 20),
    s"maxCells out of range [2, 2^20]: $maxCells")

  override def left: Expression = child
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got ($l, $r)")
    }

  override def createAggregationBuffer(): DyadicHist = new DyadicHist(maxCells)

  override def update(buf: DyadicHist, input: InternalRow): DyadicHist = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      require(w != null && w.asInstanceOf[Long] >= 1L,
        s"graft_dyadic_hist: weight must be a non-null LONG >= 1, got $w — " +
          "a zero/negative/null weight has no rank mass; filter upstream")
      buf.insert(v.asInstanceOf[Double], w.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: DyadicHist, b2: DyadicHist): DyadicHist = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: DyadicHist): Any = {
    val cells = buf.sortedCells()
    val out = new Array[Any](cells.length)
    var i = 0
    while (i < cells.length) {
      val c = cells(i)._2
      out(i) = new GenericInternalRow(Array[Any](c.cnt, c.cmin, c.cmax))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: DyadicHist): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.isEmpty)
    out.writeInt(buf.scale)
    out.writeInt(buf.cells.size)
    val it = buf.cells.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue())
      out.writeLong(e.getValue.cnt)
      out.writeDouble(e.getValue.cmin)
      out.writeDouble(e.getValue.cmax)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DyadicHist = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new DyadicHist(maxCells)
    val wasEmpty = in.readBoolean()
    val scale = in.readInt()
    val n = in.readInt()
    if (!wasEmpty) {
      val entries = new Array[(Long, DyadicHist.Cell)](n)
      var i = 0
      while (i < n) {
        entries(i) = (in.readLong(),
          new DyadicHist.Cell(in.readLong(), in.readDouble(), in.readDouble()))
        i += 1
      }
      buf.adopt(scale, entries)
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("cmin", DoubleType, nullable = false),
    StructField("cmax", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dyadic_hist"

  override def withNewMutableAggBufferOffset(newOffset: Int): DyadicHistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DyadicHistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DyadicHistAgg =
    copy(child = newLeft, weight = newRight)
}

object DyadicHistAgg {

  /** Column form: `graft_dyadic_hist(value, weight, maxCells)` — see the
    * class doc; `weight` defaults to 1 per row (the unweighted form).
    */
  def column(value: Column, maxCells: Int, weight: Column = lit(1L)): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      DyadicHistAgg(GraftBridge.expression(value),
        GraftBridge.expression(weight.cast("long")), maxCells).toAggregateExpression())
  }
}
