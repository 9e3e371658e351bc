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
  * State layout is built for a CAPACITY-INDEPENDENT hot path — the r11
  * parallel-array form scanned all `capacity` slots per token twice
  * (hash-prefiltered indexOf + minIndex victim scan), which at the exact
  * heavy-hitters face's 4×64-slot sketch was the dominant cost of the
  * whole query at sf10 (O(cap) per TAIL token, and the tail is the
  * stream). Now:
  *
  *  - membership is a hash-CHAIN index (bucket heads + per-slot next,
  *    ~2× slots, expected O(1) probe; token hashes come precomputed from
  *    [[TextOps.foreachWsTokenHashed]]'s byte scan in text mode, so the
  *    token bytes are read exactly once);
  *  - the eviction victim comes from a LAZY min-heap over the slots,
  *    keyed by each slot's count at its last heap fix (always ≤ the live
  *    count, counts only grow): a HIT just increments the count in O(1),
  *    and evict pops heap roots, refreshing stale keys downward, until
  *    the root is fresh — a fresh root's key lower-bounds every live
  *    count, so it IS a minimum-count slot. Amortized O(log cap) per
  *    eviction, each refresh paid for by a past O(1) hit.
  *
  * The victim is A minimum-count slot (all SpaceSaving requires); the
  * r11 form additionally tie-broke equal minima by item order, which no
  * guarantee and no spec pinned (the sketch is merge-order dependent
  * regardless, and the exact face's output determinism comes from its
  * exact pass 2, whose candidate list only needs the superset property).
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    perToken: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingAgg.State] {

  import SpaceSavingAgg.State

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.resultType
  override def prettyName: String = "space_saving"

  override def createAggregationBuffer(): State = new State(capacity)

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      if (perToken) {
        // text mode: the input is a DOCUMENT; offer each whitespace
        // token straight off the byte scan (foreachWsTokenHashed — the
        // wsSplit scanner, so token identity matches the exploded form
        // exactly, with the probe hash computed inside the same scan).
        // No token stream is ever materialized: pass-1 of the
        // heavy-hitters family is one corpus scan. offer() clones on
        // insert, so the zero-copy slices are safe.
        TextOps.foreachWsTokenHashed(v.asInstanceOf[UTF8String], (t, h) => {
          buf.offer(t, h, 1L, 0L); buf.n += 1
        })
      } else {
        val s = v.asInstanceOf[UTF8String]
        buf.offer(s, TextOps.tokenHash(s), 1L, 0L)
        buf.n += 1
      }
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
    val mb = if (buf.size >= capacity) buf.minCount else 0L
    val mo = if (other.size >= capacity) other.minCount else 0L
    val merged =
      scala.collection.mutable.ArrayBuffer.empty[(UTF8String, Int, Long, Long)]
    var i = 0
    while (i < buf.size) {
      val j = other.find(buf.items(i), buf.hashes(i))
      if (j >= 0)
        merged += ((buf.items(i), buf.hashes(i),
          buf.counts(i) + other.counts(j), buf.errs(i) + other.errs(j)))
      else
        // symmetric bound: an item tracked only in buf may have occurred
        // up to other's min counter times in other's stream
        merged += ((buf.items(i), buf.hashes(i),
          buf.counts(i) + mo, buf.errs(i) + mo))
      i += 1
    }
    var j = 0
    while (j < other.size) {
      if (buf.find(other.items(j), other.hashes(j)) < 0)
        merged += ((other.items(j), other.hashes(j),
          other.counts(j) + mb, other.errs(j) + mb))
      j += 1
    }
    val keep =
      if (merged.size > capacity)
        merged.sortBy { case (it, _, c, _) => (-c, it) }.take(capacity)
      else merged
    buf.size = keep.size
    var k = 0
    while (k < keep.size) {
      val (it, h, c, e) = keep(k)
      buf.items(k) = it
      buf.hashes(k) = h
      buf.counts(k) = c
      buf.errs(k) = e
      k += 1
    }
    buf.n += other.n
    buf.rebuildIndex()
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
      st.hashes(i) = TextOps.tokenHash(st.items(i))
      st.counts(i) = bb.getLong()
      st.errs(i) = bb.getLong()
      i += 1
    }
    st.size = k
    st.rebuildIndex()
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
  /** Counter state: parallel item/hash/count/err slots, a hash-chain
    * membership index, and a lazy min-heap for O(log cap) eviction —
    * see the class doc for the invariants. Zero allocation per update
    * except the clone a brand-new item's insertion requires.
    */
  final class State(val capacity: Int) {
    val items = new Array[UTF8String](capacity)
    val hashes = new Array[Int](capacity)
    val counts = new Array[Long](capacity)
    val errs = new Array[Long](capacity)
    var size: Int = 0
    var n: Long = 0L

    // hash-chain index: heads(bucket) / next(slot) hold slot+1, 0 = end
    private val mask: Int =
      (Integer.highestOneBit(math.max(2, capacity) * 2 - 1) << 1) - 1
    private val heads = new Array[Int](mask + 1)
    private val next = new Array[Int](capacity)

    // lazy min-heap over slots: heap(pos) = slot, hpos(slot) = pos,
    // hkey(slot) = counts(slot) at the slot's last heap fix (≤ live)
    private val heap = new Array[Int](capacity)
    private val hpos = new Array[Int](capacity)
    private val hkey = new Array[Long](capacity)

    /** Slot of `item` (probing by precomputed [[TextOps.tokenHash]]),
      * or -1. Expected O(1): chains are ~0.5 load factor. */
    def find(item: UTF8String, h: Int): Int = {
      var e = heads(h & mask)
      while (e != 0) {
        val s = e - 1
        if (hashes(s) == h && items(s).equals(item)) return s
        e = next(s)
      }
      -1
    }

    private def chainInsert(slot: Int): Unit = {
      val b = hashes(slot) & mask
      next(slot) = heads(b)
      heads(b) = slot + 1
    }

    private def chainRemove(slot: Int): Unit = {
      val b = hashes(slot) & mask
      var e = heads(b)
      if (e == slot + 1) { heads(b) = next(slot); return }
      while (e != 0) {
        val s = e - 1
        if (next(s) == slot + 1) { next(s) = next(slot); return }
        e = next(s)
      }
    }

    private def heapSwap(a: Int, b: Int): Unit = {
      val sa = heap(a); val sb = heap(b)
      heap(a) = sb; heap(b) = sa
      hpos(sb) = a; hpos(sa) = b
    }

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0 && hkey(heap((pos - 1) >> 1)) > hkey(heap(pos))) {
        heapSwap(pos, (pos - 1) >> 1)
        pos = (pos - 1) >> 1
      }
    }

    private def siftDown(pos0: Int): Unit = {
      var pos = pos0
      while (true) {
        val l = 2 * pos + 1
        if (l >= size) return
        val r = l + 1
        val c = if (r < size && hkey(heap(r)) < hkey(heap(l))) r else l
        if (hkey(heap(c)) >= hkey(heap(pos))) return
        heapSwap(pos, c)
        pos = c
      }
    }

    /** Heap root refreshed until its key is live — a fresh root's key
      * lower-bounds every live count (hkey ≤ count everywhere), so the
      * returned slot holds a MINIMUM live count. Each refresh is paid
      * for by a past O(1) hit that made the key stale. */
    private def freshMinSlot(): Int = {
      while (true) {
        val s = heap(0)
        if (hkey(s) == counts(s)) return s
        hkey(s) = counts(s)
        siftDown(0)
      }
      -1 // unreachable
    }

    /** The SpaceSaving offer: hit → add (O(1), heap key left stale);
      * room → insert; full → replace a minimum-count slot, the newcomer
      * inheriting its count as error bound. `item` is CLONED on insert —
      * offered UTF8Strings may alias a reused row or scan buffer.
      */
    def offer(item: UTF8String, h: Int, cnt: Long, err: Long): Unit = {
      val i = find(item, h)
      if (i >= 0) {
        counts(i) += cnt
        errs(i) += err
      } else if (size < capacity) {
        val s = size
        items(s) = item.clone()
        hashes(s) = h
        counts(s) = cnt
        errs(s) = err
        hkey(s) = cnt
        heap(s) = s
        hpos(s) = s
        size += 1
        chainInsert(s)
        siftUp(s)
      } else {
        val m = freshMinSlot()
        val mCnt = counts(m)
        chainRemove(m)
        items(m) = item.clone()
        hashes(m) = h
        counts(m) = mCnt + cnt
        errs(m) = mCnt + err
        chainInsert(m)
        hkey(m) = counts(m)
        siftDown(hpos(m))
      }
    }

    /** Minimum live count — O(cap) scan; merge-path only. */
    def minCount: Long = {
      if (size == 0) return 0L
      var m = counts(0)
      var i = 1
      while (i < size) { if (counts(i) < m) m = counts(i); i += 1 }
      m
    }

    /** Rebuild chains + heap from slots 0..size (merge / deserialize). */
    def rebuildIndex(): Unit = {
      java.util.Arrays.fill(heads, 0)
      var i = 0
      while (i < size) {
        chainInsert(i)
        hkey(i) = counts(i)
        heap(i) = i
        hpos(i) = i
        i += 1
      }
      // heapify
      var p = size / 2 - 1
      while (p >= 0) { siftDown(p); p -= 1 }
    }
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

  /** Column API: `spaceSavingText(text, capacity)` — the same sketch fed
    * by every whitespace token of a TEXT column, tokenized inside the
    * aggregate's update (one corpus scan, no exploded token stream).
    * Guarantees and output are those of [[spaceSaving]] over
    * `explode(ws_split(text))` — the token scanner is shared
    * ([[TextOps.foreachWsTokenHashed]] / [[TextOps.wsSplit]]); only the
    * merge ORDER (and hence which borderline items survive) can differ,
    * which the sketch contract never pins.
    */
  def spaceSavingText(text: Column, capacity: Int): Column =
    Bridge.column(SpaceSavingAgg(Bridge.expression(text), capacity,
      perToken = true).toAggregateExpression())
}
