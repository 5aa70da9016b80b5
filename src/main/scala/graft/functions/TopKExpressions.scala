package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-K-by-score aggregate: keeps the K (score, id) pairs with
  * the highest score (ties broken by lowest id) in a size-K heap.
  *
  * The point is the SHUFFLE BOUND: as a TypedImperativeAggregate it
  * participates in partial aggregation, so each map task ships at most
  * K pairs per group instead of its full candidate list — for top-k
  * ranking (ANN search, per-query retrieval) that turns an
  * O(candidates × queries) shuffle into O(partitions × queries × K),
  * and removes the one-reducer-per-query bottleneck a
  * `Window.partitionBy(query)` ranking has at scale.
  *
  * Output: `array<struct<score double, id bigint>>` sorted best-first —
  * exactly the rows `row_number() over (partition by q order by score
  * desc, id)` ≤ K would keep, so results stay hash-identical to the
  * window formulation and the SQL oracle.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // head of the queue = WORST kept pair (lowest score, then highest id),
  // so trimming to size K is a dequeue
  private def byWorse: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(byWorse)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { p =>
      buf.enqueue(p)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKExpressions {
  /** `topKByScore($"cosine", $"c_id", 10)` → best-first
    * `array<struct<score, id>>`, partial-aggregated (≤ K per map task
    * per group cross the shuffle).
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftShims.column(TopKByScore(
      GraftShims.expression(score.cast("double")),
      GraftShims.expression(id.cast("long")), k).toAggregateExpression())
}
