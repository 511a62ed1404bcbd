package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Exact top-k by score as a bounded-heap aggregate — the SURVEY §7.3
  * candidate realized: `Window.partitionBy(query).orderBy(desc(sim))` must
  * shuffle and sort EVERY scored candidate; this aggregate keeps ≤k
  * candidates per group in each partial (map-side) buffer, so the shuffle
  * moves at most k·partitions rows per group regardless of corpus size —
  * the difference between shipping 100 TB of scores and shipping top-10s.
  *
  * Semantics: best k by (score desc, id asc) — identical ordering and
  * tie-break as the window+row_number formulation, so the same DuckDB
  * oracle verifies both plans. Returns array<struct<id, score>> best-first;
  * posexplode yields (rank-1, struct).
  */
case class TopKByScore(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
                   StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.add(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedBestFirst
    val rows = sorted.map { case (s, i) =>
      InternalRow(i, s)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Bounded "keep the k best (score desc, id asc)" buffer: a min-heap on
  * the betterness order, worst element at the root for O(log k) eviction.
  */
final class TopKBuffer(k: Int) {
  // (score, id); `better(a, b)` ⇔ a ranks above b. Mirrors Spark's double
  // ordering (SQLOrderingUtil.compareDoubles): the `==` check first makes
  // ±0.0 a TIE (raw Double.compare orders 0.0 above -0.0) that falls to
  // the id tie-break, exactly like the window+row_number formulation;
  // otherwise Double.compare gives a total order with NaN above every
  // real — matching Spark's `desc` (NaN greatest), so degenerate
  // zero-norm sims (0/0 = NaN) rank identically too, and a NaN-vs-NaN
  // pair (compare == 0) also falls to the id tie-break.
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  // worst-first priority queue
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
    Ordering.fromLessThan((a, b) => better(a._1, a._2, b._1, b._2)))

  def size: Int = heap.size

  def add(s: Double, i: Long): Unit = {
    if (heap.size < k) heap.enqueue((s, i))
    else {
      val (ws, wi) = heap.head
      if (better(s, i, ws, wi)) { heap.dequeue(); heap.enqueue((s, i)) }
    }
  }

  def foreach(f: (Double, Long) => Unit): Unit = heap.foreach(t => f(t._1, t._2))

  def sortedBestFirst: Seq[(Double, Long)] =
    heap.toSeq.sortWith((a, b) => better(a._1, a._2, b._1, b._2))
}
