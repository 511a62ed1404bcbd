package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** KMV (k-minimum-values) distinct-count sketch: keeps the k smallest
  * DISTINCT values of an already-hashed long input. With the input
  * uniform on [0, M), the classic estimator (k-1)·M / kth_min recovers
  * the distinct count to ~1/√k relative error (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007).
  *
  * Why this beats `countDistinct` at 100 TB: exact distinct shuffles
  * every distinct key once; this buffer is ≤ k longs per partial, the
  * merge is a set union + trim, and the result is order- and
  * partitioning-independent — so a corpus-wide cardinality costs one
  * map-side pass plus k·partitions longs of shuffle. Unlike HLL
  * (`approx_count_distinct`, whose register layout is
  * implementation-defined), the sketch CONTENT here is a pure set
  * property of the input — the k smallest distinct hashes — so the
  * whole sketch is replayable in ANSI SQL (`SELECT DISTINCT u ORDER BY
  * u LIMIT k`) and the estimate is DuckDB-oracle-checkable to the last
  * bit. Mergeability is the same union-trim the [[MisraGries]] sketch
  * family uses; two sketches over disjoint (or overlapping!) halves
  * merge to EXACTLY the whole-input sketch.
  *
  * Returns array<bigint>: the ≤ k kept values, ascending. The caller
  * derives (n_kept, kth_min, estimate) with plain array functions, and
  * unions sketches by `flatten → array_distinct → array_sort → slice k`
  * — the same operation this aggregate's own merge performs.
  *
  * Reference surface: extension mandate (the reference's `get_stats`
  * row-count endpoint, reference `api.py:71`, generalized to cheap
  * corpus-cardinality telemetry).
  */
case class KmvSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmv_sketch expects bigint, got $t")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.foreach(buf.add)
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.sortedAscending.toArray[Any])

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KmvBuffer(k)
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
}

/** Bounded distinct-min-set: the k smallest distinct longs seen so far.
  * TreeSet gives O(log k) insert/evict and free dedup; ≤ k entries by
  * construction, so partial-aggregate memory is constant.
  */
final class KmvBuffer(k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def size: Int = set.size

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) {
      if (set.add(v)) { set.pollLast(); () }
    }
  }

  def foreach(f: Long => Unit): Unit = set.forEach(v => f(v))

  def sortedAscending: Seq[Long] = {
    val b = Seq.newBuilder[Long]
    set.forEach(v => b += v)
    b.result()
  }
}
