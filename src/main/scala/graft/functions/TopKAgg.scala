package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a mergeable aggregate:
  * `graft_topk(k, score, id)` keeps a k-element heap per partial
  * buffer and merges heaps — so a per-key top-k costs one partial
  * aggregation pass plus a k-row-per-key shuffle, instead of a
  * window that shuffles and sorts every scored row. This is the
  * scale primitive behind brute-force ANN ranking.
  *
  * Ordering: score descending, id ascending on ties — identical to
  * `row_number() OVER (ORDER BY score DESC, id)`.
  * Output: array<struct<score double, id bigint>> in rank order.
  */
case class TopKAgg(
    kExpr: Expression,
    scoreExpr: Expression,
    idExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(IntegerType, DoubleType, LongType)

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) return base
    if (!kExpr.foldable) {
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_topk: k must be a literal (foldable) integer")
    }
    val kv = kExpr.eval()
    if (kv == null || kv.asInstanceOf[Number].intValue() <= 0) {
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk: k must be a positive integer, got $kv")
    }
    base
  }

  // min-heap: the WORST surviving entry (lowest score; on ties the
  // largest id) sits at the head, ready for eviction
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def children: Seq[Expression] = Seq(kExpr, scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](heapOrd)

  override def update(buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  private def add(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (k <= 0) return // guarded in checkInputDataTypes; belt-and-braces for direct construction
    if (buf.size < k) buf.enqueue(e)
    else {
      val worst = buf.head
      // better = higher score, or equal score with smaller id
      if (e._1 > worst._1 || (e._1 == worst._1 && e._2 < worst._2)) {
        buf.dequeue(); buf.enqueue(e)
      }
    }
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)], b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(add(a, _)); a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) }: Array[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(kExpr = newChildren(0), scoreExpr = newChildren(1), idExpr = newChildren(2))
  override def prettyName: String = "graft_topk"
}
