package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a distributed aggregate: per-group bit-majority over
  * pre-hashed token rows. This is the shuffle-scalable formulation of the
  * per-row [[SimHash60]] kernel — when documents are stored exploded
  * (one token per row, the layout a 100 TB corpus actually uses), the
  * sketch state is a 60-counter vector that combines map-side
  * (`merge`) before the shuffle, so the exchange carries one 244-byte
  * buffer per (partition, group), never the tokens.
  *
  * `simhash_agg(token_hash)` over a group == `simhash60(tokens)` over the
  * collected array (same majority rule), which is what the spec asserts.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SimHashAgg.State] {

  import SimHashAgg.State

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): State = new State(new Array[Int](60), 0L)

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 60) { buf.counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: State, other: State): State = {
    var j = 0
    while (j < 60) { buf.counts(j) += other.counts(j); j += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: State): Any = {
    var res = 0L
    var j = 0
    while (j < 60) { if (2L * buf.counts(j) > buf.n) res |= 1L << j; j += 1 }
    res
  }

  override def serialize(buf: State): Array[Byte] = {
    val bb = ByteBuffer.allocate(60 * 4 + 8)
    var j = 0
    while (j < 60) { bb.putInt(buf.counts(j)); j += 1 }
    bb.putLong(buf.n)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val counts = new Array[Int](60)
    var j = 0
    while (j < 60) { counts(j) = bb.getInt(); j += 1 }
    new State(counts, bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Mutable aggregation state: per-bit counts + row count. */
  final class State(val counts: Array[Int], var n: Long)

  /** Column API: `simhash_agg(tokenHash)` — tokenHash must be the 60-bit
    * [[Hashing.md5Long]]-family hash of the token.
    */
  def simhashAgg(tokenHash: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(tokenHash)).toAggregateExpression())
}
