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
  * A binary max-heap by (h, x) gives O(log k) insert/evict; ≤ k entries
  * by construction, so partial-aggregate memory is constant.
  *
  * Backed by parallel `long[]`/`double[]` arrays with hand-rolled sift
  * operations: the per-row add/merge hot path allocates NOTHING (the
  * earlier `PriorityQueue[(Long, Double)]` boxed two primitives plus a
  * Tuple2 per update row — the round-15 ADVICE allocation finding).
  * Ties on h break by x via `Double.compare` (total order, NaN-safe),
  * matching the `Double.TotalOrdering` used by [[sortedAscending]].
  */
final class BottomKBuffer(k: Int) {
  private var hs = new Array[Long](math.min(k, 64))
  private var xs = new Array[Double](hs.length)
  private var n = 0

  def size: Int = n

  /** (h1, x1) strictly before (h2, x2) in the bottom-k order. */
  @inline private def lt(h1: Long, x1: Double, h2: Long, x2: Double): Boolean =
    h1 < h2 || (h1 == h2 && java.lang.Double.compare(x1, x2) < 0)

  private def grow(): Unit = {
    val cap = math.min(k, hs.length * 2)
    hs = java.util.Arrays.copyOf(hs, cap)
    xs = java.util.Arrays.copyOf(xs, cap)
  }

  /** Restore the max-heap invariant upward from slot i0. */
  private def siftUp(i0: Int): Unit = {
    var i = i0
    val h = hs(i); val x = xs(i)
    var done = false
    while (!done && i > 0) {
      val p = (i - 1) >>> 1
      if (lt(hs(p), xs(p), h, x)) { hs(i) = hs(p); xs(i) = xs(p); i = p }
      else done = true
    }
    hs(i) = h; xs(i) = x
  }

  /** Restore the max-heap invariant downward from the root. */
  private def siftDown(): Unit = {
    val h = hs(0); val x = xs(0)
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      if (l >= n) done = true
      else {
        val r = l + 1
        val c = if (r < n && lt(hs(l), xs(l), hs(r), xs(r))) r else l
        if (lt(h, x, hs(c), xs(c))) { hs(i) = hs(c); xs(i) = xs(c); i = c }
        else done = true
      }
    }
    hs(i) = h; xs(i) = x
  }

  def add(h: Long, x: Double): Unit = {
    if (n < k) {
      if (n == hs.length) grow()
      hs(n) = h; xs(n) = x; n += 1
      siftUp(n - 1)
    } else if (lt(h, x, hs(0), xs(0))) {
      hs(0) = h; xs(0) = x
      siftDown()
    }
  }

  def foreach(f: (Long, Double) => Unit): Unit = {
    var i = 0
    while (i < n) { f(hs(i), xs(i)); i += 1 }
  }

  def sortedAscending: Seq[(Long, Double)] = {
    val b = Array.tabulate(n)(i => (hs(i), xs(i)))
    b.sortInPlace()(Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)).toSeq
  }
}
