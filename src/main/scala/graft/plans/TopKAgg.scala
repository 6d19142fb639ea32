package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded TOP-K aggregate: keeps the `k` GREATEST input structs under
  * the struct type's lexicographic field order, as ONE aggregate with
  * O(k) state per group — the scale replacement for the
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k` idiom,
  * which sorts EVERY group's full row set inside each task. Here a group
  * of a billion rows costs one bounded heap: map-side partial top-k
  * combines before the exchange, so the shuffle carries at most k
  * structs per group per mapper, never the group.
  *
  * Ordering contract: the struct's fields compare lexicographically in
  * declaration order — put the ranking keys FIRST (encode "descending"
  * by negating, the SQL-engine norm) and include a UNIQUE tiebreak field
  * so the kept set (and the emitted order) is total and cross-engine
  * deterministic. Null structs are skipped; the result array is sorted
  * GREATEST-first (position = rank − 1). Runs on
  * `ObjectHashAggregateExec` (no codegen — the per-row cost is one heap
  * offer against k elements).
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a struct, got $t")
  }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[InternalRow]]

  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](math.max(k, 1), ordering)

  override def update(
      buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(
      b1: java.util.PriorityQueue[InternalRow],
      b2: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next(), copied = true)
    b1
  }

  /** Min-heap of the current top-k: a newcomer beats the kept set iff it
    * beats the heap head (the smallest keeper).
    */
  private def offer(
      buf: java.util.PriorityQueue[InternalRow],
      row: InternalRow,
      copied: Boolean = false): Unit = {
    if (buf.size < k) {
      buf.offer(if (copied) row else row.copy()); ()
    } else if (ordering.compare(row, buf.peek()) > 0) {
      buf.poll()
      buf.offer(if (copied) row else row.copy()); ()
    }
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, ordering.reverse) // greatest first
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    while (it.hasNext) {
      holder.update(0, it.next())
      val bytes = proj(holder).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val u = new UnsafeRow(1)
      u.pointTo(rowBytes, len)
      buf.offer(u.getStruct(0, structType.size).copy())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}

object TopKStructs {

  /** Column of the k greatest structs (greatest first) — see the class
    * doc for the ordering/tiebreak contract.
    */
  def column(struct: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      TopKStructs(GraftBridge.expression(struct), k).toAggregateExpression())
  }
}
