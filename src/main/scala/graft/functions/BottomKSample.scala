package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Bottom-k-by-hash VALUE sample: keeps the k (hash, value) pairs with
  * the smallest (hash, value) order among all inputs — i.e. a uniform
  * k-row sample of the values when `hash` is a uniform per-row key
  * (e.g. `splitmix64(event_id)`). The [[KmvSketch]] idea pointed at
  * order statistics instead of cardinality: quantiles of the kept
  * values estimate the population quantiles to O(1/√k) rank error
  * (bottom-k-by-uniform-hash IS a simple random sample; Cohen &
  * Kaplan, "Summarizing data using bottom-k sketches", PODC 2007).
  *
  * Why this beats exact quantiles at 100 TB: `percentile` buffers every
  * value of a group; this buffer is ≤ k pairs per partial, the merge is
  * an ordered union-trim, and the result is order- and partitioning-
  * independent — so a per-group quantile profile costs one map-side
  * pass plus k·partitions pairs of shuffle, and the same bounded buffer
  * is valid Structured-Streaming state (the st25 twin). Unlike KMV,
  * DUPLICATE pairs are kept: selection is by rank over (hash, value),
  * matching the SQL replay `row_number() OVER (ORDER BY h, x) <= k`
  * row for row whenever `hash` is unique per row (ties collapse to the
  * same multiset of values either way, so the sampled VALUES — and
  * hence every downstream statistic — stay replayable even under
  * collisions).
  *
  * Returns array<struct<h: bigint, x: double>> ascending by (h, x):
  * sketches over DISJOINT parts of the data merge exactly (concatenate,
  * re-sort, trim to k — the same operation this aggregate's own merge
  * performs, and the partial-aggregation/streaming-state contract).
  * Unlike KMV's set semantics, OVERLAPPING inputs would double-count
  * the overlap — a multiset sample must see every row exactly once.
  *
  * Reference surface: extension mandate (the reference's `get_stats`
  * profiling endpoint, reference `api.py:71`, generalized to bounded-
  * state distribution telemetry).
  */
case class BottomKPairs(
    hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"bottomk_pairs expects (bigint, double), got ($h, $v)")
    }

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hash.eval(input)
    val x = value.eval(input)
    if (h != null && x != null)
      buf.add(h.asInstanceOf[Long], x.asInstanceOf[Double])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    other.foreach(buf.add)
    buf
  }

  override def eval(buf: BottomKBuffer): Any =
    new GenericArrayData(buf.sortedAscending.map { case (h, x) =>
      InternalRow(h, x)
    }.toArray[Any])

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (h, x) => out.writeLong(h); out.writeDouble(x) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new BottomKBuffer(k)
    var j = 0
    while (j < n) { buf.add(in.readLong(), in.readDouble()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKPairs =
    copy(hash = newChildren(0), value = newChildren(1))
}

/** Bounded multiset of the k (h, x)-smallest pairs, duplicates kept.
  * A max-heap by (h, x) gives O(log k) insert/evict; ≤ k entries by
  * construction, so partial-aggregate memory is constant.
  */
final class BottomKBuffer(k: Int) {
  private val heap = new java.util.PriorityQueue[(Long, Double)](
    math.min(k, 64),
    (a: (Long, Double), b: (Long, Double)) => {
      val c = java.lang.Long.compare(b._1, a._1) // max-heap: reversed
      if (c != 0) c else java.lang.Double.compare(b._2, a._2)
    })

  def size: Int = heap.size

  def add(h: Long, x: Double): Unit = {
    if (heap.size < k) { heap.add((h, x)); () }
    else {
      val top = heap.peek()
      if (h < top._1 || (h == top._1 && x < top._2)) {
        heap.poll(); heap.add((h, x)); ()
      }
    }
  }

  def foreach(f: (Long, Double) => Unit): Unit =
    heap.forEach(p => f(p._1, p._2))

  def sortedAscending: Seq[(Long, Double)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    heap.forEach(p => b += p)
    b.sortInPlace()(Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)).toSeq
  }
}
