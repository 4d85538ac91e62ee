package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a native aggregate function — the aggregation-path
  * twin of the plans.TopKPerKey operator: a TypedImperativeAggregate
  * participates in partial aggregation, so each map task ships at most
  * k (value, tie) pairs per group to the exchange (same shuffle bound
  * as the custom physical operator, but usable inside any
  * groupBy.agg alongside other aggregates). Keeps the k largest
  * values, ties broken by the smaller tie id — identical order to a
  * `value DESC, tie ASC` window.
  */
case class TopKValues(valueExpr: Expression, tieExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), "k must be in (0, 2^20]")

  override def prettyName: String = "graft_topk"
  override def left: Expression = valueExpr
  override def right: Expression = tieExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType, nullable = false),
      StructField("tie", LongType, nullable = false))), containsNull = false)

  // Heap max = the WORST kept element (smallest v, then largest tie),
  // i.e. the eviction candidate.
  private val evictOrd: Ordering[(Double, Long)] =
    Ordering.by { case (v, tie) => (-v, tie) }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](evictOrd)

  private def insert(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      elem: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(elem)
    else if (evictOrd.lt(elem, buf.head)) { buf.dequeue(); buf.enqueue(elem) }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val t = tieExpr.eval(input)
    if (v != null && t != null) {
      insert(buf, (v.asInstanceOf[Number].doubleValue(), t.asInstanceOf[Number].longValue()))
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      other: scala.collection.mutable.PriorityQueue[(Double, Long)]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(Ordering.by[(Double, Long), (Double, Long)] {
      case (v, tie) => (-v, tie)
    })
    new GenericArrayData(sorted.map { case (v, tie) =>
      InternalRow(v, tie)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, tie) => bb.putDouble(v); bb.putLong(tie) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKValues =
    copy(valueExpr = newLeft, tieExpr = newRight)
}

object TopKAggFunctions {
  /** topkAgg(value, tie, k): array of the k largest (v, tie) structs,
    * sorted v desc / tie asc.
    */
  def topkAgg(value: Column, tie: Column, k: Int): Column =
    Bridge.column(TopKValues(Bridge.expression(value), Bridge.expression(tie), k)
      .toAggregateExpression())
}
