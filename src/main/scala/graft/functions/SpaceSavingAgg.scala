package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving frequent-items sketch as a distributed aggregate (the
  * heavy-hitters family, next to the HLL distinct and KLL quantile
  * sketches): at most `capacity` counters per group, each carrying an
  * overestimated count and its error bound, combined map-side before the
  * shuffle — the exchange carries one bounded buffer per (partition,
  * group), never the token stream. Guarantees (Metwally et al.
  * SpaceSaving; Agarwal et al. mergeable-summaries merge):
  *
  *  - every item with true count > n / capacity is reported;
  *  - for every reported item, est − err ≤ true ≤ est.
  *
  * Results depend on merge order (like every SpaceSaving), so the spec
  * asserts the GUARANTEES against exact counts rather than run-to-run
  * equality, and the query is declared no-oracle like the other
  * approximate sketches.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingAgg.State] {

  import SpaceSavingAgg.State

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.resultType
  override def prettyName: String = "space_saving"

  override def createAggregationBuffer(): State = new State(mutable.HashMap.empty, 0L)

  private def minCount(buf: State): Long =
    if (buf.items.isEmpty) 0L else buf.items.valuesIterator.map(_._1).min

  private def offer(buf: State, item: String, cnt: Long, err: Long): Unit =
    buf.items.get(item) match {
      case Some((c, e)) => buf.items(item) = (c + cnt, e + err)
      case None if buf.items.size < capacity => buf.items(item) = (cnt, err)
      case None =>
        // replace the minimum counter: the newcomer inherits its count
        // as the error bound (the classic SpaceSaving step)
        val (mItem, (mCnt, _)) = buf.items.minBy { case (i, (c, _)) => (c, i) }
        buf.items.remove(mItem)
        buf.items(item) = (mCnt + cnt, mCnt + err)
    }

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
      buf.n += 1
    }
    buf
  }

  override def merge(buf: State, other: State): State = {
    // Agarwal et al. mergeable-summaries merge: shared items sum counts
    // and errors; an item untracked in buf may have occurred up to
    // buf's pre-merge min counter times in buf's stream (0 if buf never
    // evicted), so fold that bound into both estimate and error — est
    // stays an upper bound of true. Then prune to the largest
    // `capacity` estimates, which the paper proves keeps the n/capacity
    // guarantee.
    val mb = if (buf.items.size >= capacity) minCount(buf) else 0L
    val mo = if (other.items.size >= capacity) minCount(other) else 0L
    // symmetric: an item tracked only in buf may have occurred up to
    // other's min counter times in other's stream
    if (mo > 0L) buf.items.keysIterator.toSeq.foreach { item =>
      if (!other.items.contains(item)) {
        val (bc, be) = buf.items(item)
        buf.items(item) = (bc + mo, be + mo)
      }
    }
    other.items.foreach { case (item, (c, e)) =>
      buf.items.get(item) match {
        case Some((bc, be)) => buf.items(item) = (bc + c, be + e)
        case None           => buf.items(item) = (c + mb, e + mb)
      }
    }
    if (buf.items.size > capacity) {
      val keep = buf.items.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      buf.items.clear()
      keep.foreach { case (i, ce) => buf.items(i) = ce }
    }
    buf.n += other.n
    buf
  }

  override def eval(buf: State): Any = {
    val rows = buf.items.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: State): Array[Byte] = {
    val entries = buf.items.toSeq.map { case (i, (c, e)) =>
      (i.getBytes(StandardCharsets.UTF_8), c, e)
    }
    val size = 8 + 4 + entries.map(e => 4 + e._1.length + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(entries.size)
    entries.foreach { case (b, c, e) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val k = bb.getInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    (0 until k).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      m(new String(b, StandardCharsets.UTF_8)) = (bb.getLong(), bb.getLong())
    }
    new State(m, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  /** Counter map item → (estimated count, error bound), plus total n. */
  final class State(val items: mutable.HashMap[String, (Long, Long)], var n: Long)

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Column API: `spaceSaving(token, capacity)` — the per-group
    * frequent-items summary, sorted by estimate desc then item.
    */
  def spaceSaving(item: Column, capacity: Int): Column =
    Bridge.column(SpaceSavingAgg(Bridge.expression(item), capacity)
      .toAggregateExpression())
}
