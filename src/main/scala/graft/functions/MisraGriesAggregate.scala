package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Misra–Gries frequent-items sketch as a typed aggregate — the
  * candidate-generation half of the two-pass heavy-hitters pattern
  * ([[graft.ops.TextStats.heavyHitters]]).
  *
  * Why not groupBy+count+filter in one pass? That shuffles the ENTIRE
  * term-frequency table (every distinct term in the corpus) to answer a
  * question about the few terms above a support threshold. This sketch
  * keeps ≤ `capacity` counters per partial buffer — constant memory per
  * partition regardless of corpus size — and the merge is the mergeable-
  * summaries construction (Agarwal et al., PODS'12): sum counters, then
  * subtract the (capacity+1)-th largest count and drop non-positives.
  * Guarantee: any term with true frequency > n/capacity SURVIVES in the
  * merged sketch (its counter underestimates by at most n/capacity).
  * Candidate membership depends on encounter order, and counts are lower
  * bounds — which is why the query's second pass re-counts candidates
  * exactly and filters on the true threshold: the final answer is exact
  * and order-independent as long as capacity > 1/phi.
  *
  * Returns array<struct<term, count_lb>> (count_lb = surviving counter, a
  * lower bound), ordered (count_lb desc, term) for a deterministic array
  * layout.
  */
case class MisraGries(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
                   StructField("count_lb", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"misra_gries expects string, got $t")
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    other.foreach((t, c) => buf.addMerged(t, c))
    buf.truncate()
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val rows = buf.sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (t, c) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MGBuffer(capacity)
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.addMerged(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))
}

/** Bounded counter map. Stream updates use classic Misra–Gries (full map +
  * unseen key → decrement every counter, drop zeros: amortized O(1) per
  * item — each decrement pass is paid for by `capacity` earlier
  * increments). Merges add freely and then [[truncate]] back down.
  */
final class MGBuffer(capacity: Int) {
  private val m = scala.collection.mutable.HashMap.empty[String, Long]

  def size: Int = m.size

  /** Stream-side single-item update. */
  def add(t: String, w: Long): Unit = {
    m.get(t) match {
      case Some(c) => m(t) = c + w
      case None if m.size < capacity => m(t) = w
      case None =>
        // decrement-all by the new item's weight (w=1 in practice);
        // the unseen item itself is absorbed by the same decrement.
        // Snapshot first: mutating while foreachEntry iterates is
        // undefined for mutable.HashMap.
        for ((k, c) <- m.toArray) {
          if (c <= w) m.remove(k) else m(k) = c - w
        }
    }
  }

  /** Merge-side update: add without evicting (truncate() afterwards). */
  def addMerged(t: String, c: Long): Unit =
    m(t) = m.getOrElse(t, 0L) + c

  /** Mergeable-summaries truncation: subtract the (capacity+1)-th largest
    * count from every counter, drop non-positives — back to ≤ capacity
    * entries with the error bound intact.
    */
  def truncate(): Unit = if (m.size > capacity) {
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
    for ((k, c) <- m.toArray) {
      if (c <= cut) m.remove(k) else m(k) = c - cut
    }
  }

  def foreach(f: (String, Long) => Unit): Unit = m.foreachEntry(f)

  def sorted: Seq[(String, Long)] =
    m.toSeq.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
}
