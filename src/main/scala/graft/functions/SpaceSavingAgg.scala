package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  *
  * The state is ARRAY-backed (parallel item/count/err arrays, linear
  * scan): for the small capacities a heavy-hitters sketch uses (16 here)
  * a 16-slot scan of UTF8String byte-compares beats a hash map, and the
  * hot `update` path allocates NOTHING per token — the previous
  * `HashMap[String,(Long,Long)]` state decoded a String and boxed a
  * tuple per stream element, which at sf1 (~40 M tokens) was the whole
  * cost of `ta_heavy_hitters` (~3.5 s → ~1.5 s with this layout).
  * Items are stored as cloned [[UTF8String]]s; eviction and output
  * tie-breaks compare items by UTF8String binary order (= code-point
  * order), where the old state compared java.lang.String UTF-16 order —
  * the two differ only on supplementary-plane text, and the sketch's
  * contract (law-bounded, merge-order-dependent) never pinned tie-break
  * order to begin with.
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

  override def createAggregationBuffer(): State = new State(capacity)

  /** Index of `item` in the buffer, or -1. Linear scan over the stored
    * 32-bit hashes first (capacity is sketch-small, so this is ~16 int
    * compares); the byte-compare runs only on a hash match — without the
    * prefilter the scan byte-compared every slot per token, which was
    * the aggregate's dominant cost once tokenization left the profile. */
  private def indexOf(buf: State, item: UTF8String, h: Int): Int = {
    var i = 0
    while (i < buf.size) {
      if (buf.hashes(i) == h && buf.items(i).equals(item)) return i
      i += 1
    }
    -1
  }

  /** Index of the minimum counter, ties by item (binary order) — the
    * deterministic victim choice of the classic SpaceSaving step. */
  private def minIndex(buf: State): Int = {
    var m = 0
    var i = 1
    while (i < buf.size) {
      val c = java.lang.Long.compare(buf.counts(i), buf.counts(m))
      if (c < 0 || (c == 0 && buf.items(i).compareTo(buf.items(m)) < 0)) m = i
      i += 1
    }
    m
  }

  private def minCount(buf: State): Long =
    if (buf.size == 0) 0L
    else {
      var m = buf.counts(0)
      var i = 1
      while (i < buf.size) { if (buf.counts(i) < m) m = buf.counts(i); i += 1 }
      m
    }

  /** The SpaceSaving offer: hit → add; room → insert; full → replace the
    * minimum counter, the newcomer inheriting its count as error bound.
    * `item` is CLONED on insert — eval-time UTF8Strings may alias a
    * reused row buffer.
    */
  private def offer(buf: State, item: UTF8String, cnt: Long, err: Long): Unit = {
    val h = item.hashCode()
    val i = indexOf(buf, item, h)
    if (i >= 0) {
      buf.counts(i) += cnt
      buf.errs(i) += err
    } else if (buf.size < capacity) {
      buf.items(buf.size) = item.clone()
      buf.hashes(buf.size) = h
      buf.counts(buf.size) = cnt
      buf.errs(buf.size) = err
      buf.size += 1
    } else {
      val m = minIndex(buf)
      val mCnt = buf.counts(m)
      buf.items(m) = item.clone()
      buf.hashes(m) = h
      buf.counts(m) = mCnt + cnt
      buf.errs(m) = mCnt + err
    }
  }

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      offer(buf, v.asInstanceOf[UTF8String], 1L, 0L)
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
    // guarantee. Merge runs once per (partition, group) buffer pair, so
    // the temporary collection here is off the per-row hot path.
    val mb = if (buf.size >= capacity) minCount(buf) else 0L
    val mo = if (other.size >= capacity) minCount(other) else 0L
    val merged = scala.collection.mutable.ArrayBuffer.empty[(UTF8String, Long, Long)]
    var i = 0
    while (i < buf.size) {
      val j = indexOf(other, buf.items(i), buf.items(i).hashCode())
      if (j >= 0)
        merged += ((buf.items(i), buf.counts(i) + other.counts(j),
          buf.errs(i) + other.errs(j)))
      else
        // symmetric bound: an item tracked only in buf may have occurred
        // up to other's min counter times in other's stream
        merged += ((buf.items(i), buf.counts(i) + mo, buf.errs(i) + mo))
      i += 1
    }
    var j = 0
    while (j < other.size) {
      if (indexOf(buf, other.items(j), other.items(j).hashCode()) < 0)
        merged += ((other.items(j), other.counts(j) + mb, other.errs(j) + mb))
      j += 1
    }
    val keep =
      if (merged.size > capacity)
        merged.sortBy { case (it, c, _) => (-c, it) }.take(capacity)
      else merged
    buf.size = keep.size
    var k = 0
    while (k < keep.size) {
      val (it, c, e) = keep(k)
      buf.items(k) = it
      buf.hashes(k) = it.hashCode()
      buf.counts(k) = c
      buf.errs(k) = e
      k += 1
    }
    buf.n += other.n
    buf
  }

  override def eval(buf: State): Any = {
    val rows = (0 until buf.size)
      .map(i => (buf.items(i), buf.counts(i), buf.errs(i)))
      .sortBy { case (it, c, _) => (-c, it) }
      .map { case (it, c, e) => InternalRow(it, c, e) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: State): Array[Byte] = {
    var size = 8 + 4
    var i = 0
    while (i < buf.size) { size += 4 + buf.items(i).numBytes() + 16; i += 1 }
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      val b = buf.items(i).getBytes
      bb.putInt(b.length); bb.put(b)
      bb.putLong(buf.counts(i)); bb.putLong(buf.errs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new State(capacity)
    st.n = bb.getLong()
    val k = bb.getInt()
    var i = 0
    while (i < k) {
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      st.items(i) = UTF8String.fromBytes(b)
      st.hashes(i) = st.items(i).hashCode()
      st.counts(i) = bb.getLong()
      st.errs(i) = bb.getLong()
      i += 1
    }
    st.size = k
    st
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
  /** Parallel-array counter state: `size` live slots of item/count/err,
    * plus the stream length `n`. Zero allocation per update once full. */
  final class State(capacity: Int) {
    val items = new Array[UTF8String](capacity)
    val hashes = new Array[Int](capacity) // 32-bit prefilter for the scan
    val counts = new Array[Long](capacity)
    val errs = new Array[Long](capacity)
    var size: Int = 0
    var n: Long = 0L
  }

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
