package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distributed prefix sum — the scale-correct form of
  * `Window.orderBy(id)` with no partition key, which Spark executes by
  * moving EVERY row to one partition (fine at 60k rows, dead at 100 TB).
  *
  * Classic two-level scan over ONE physical shuffle:
  *   1. range-partition by the order column and sort within partitions
  *      (partition i holds a contiguous range, rows in order);
  *   2. job A: per-partition weight totals (a #partitions-sized collect
  *      — 32 longs locally, a few thousand on a real cluster);
  *   3. exclusive scan of the totals on the driver → per-partition
  *      offsets, broadcast;
  *   4. job B: a second pass over the SAME shuffled RDD adds offset +
  *      local running sum per row.
  *
  * Both jobs hang off one RDD lineage, so the range exchange's map
  * stage runs exactly once (job B fetches the retained shuffle files —
  * Spark skips the already-computed stage). Partition bounds are
  * therefore fixed by construction: there is no second, independently-
  * sampled repartitionByRange whose bounds could drift from the first,
  * and no reliance on Catalyst's ReuseExchange collapsing two identical
  * subtrees. The earlier windowed form had exactly that hazard — column
  * pruning could specialize one branch and defeat reuse, silently
  * mismatching offsets to rows.
  *
  * Optimization r15: both passes run on `queryExecution.toRdd`
  * (InternalRow) instead of `Dataset.rdd`. The external-Row path
  * deserialized every field of every row to JVM objects in the totals
  * pass (which reads ONE column), rebuilt a `Row.fromSeq(r.toSeq :+
  * run)` per row in the sum pass, and then re-ENCODED every row through
  * `createDataFrame` — three full-width conversions per row that the
  * internal path skips entirely (guide §1.4's rdd-conversion tax, §4's
  * expression-choice rule applied to an operator). The sum pass emits a
  * `JoinedRow(row.copy, [run])` — the copy is required because shuffle/
  * sort iterators reuse their UnsafeRow buffers.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `weightCol` in `orderCol`
    * order, computed with the two-job single-shuffle plan above.
    * Integral weights accumulate in Long (no 2^53 precision cliff),
    * fractional in Double; null weights contribute 0 (the `sum(...)`
    * window semantics this replaces). Ties on `orderCol` receive
    * arbitrary-but-valid relative cum values, as with any non-total
    * ordering.
    */
  def withRunningSum(df: DataFrame, orderCol: String, weightCol: String,
                     cumCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wIdx = df.schema.fieldIndex(weightCol)
    val wType = df.schema(weightCol).dataType
    val integral = wType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case t => throw new IllegalArgumentException(
        s"PrefixSum weight column must be numeric, got $t")
    }
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    // One RDD object shared by both jobs => one shuffle, fixed bounds.
    val rdd = ranged.queryExecution.toRdd

    if (integral) {
      // typed long extractor chosen ONCE (never a per-row type match)
      val getW: InternalRow => Long = wType match {
        case ByteType    => r => if (r.isNullAt(wIdx)) 0L else r.getByte(wIdx).toLong
        case ShortType   => r => if (r.isNullAt(wIdx)) 0L else r.getShort(wIdx).toLong
        case IntegerType => r => if (r.isNullAt(wIdx)) 0L else r.getInt(wIdx).toLong
        case _           => r => if (r.isNullAt(wIdx)) 0L else r.getLong(wIdx)
      }
      val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(r => s += getW(r)); Iterator((pid, s))
      }.collect().toMap
      val offsets = new Array[Long](rdd.getNumPartitions)
      var acc = 0L
      (0 until rdd.getNumPartitions).foreach { pid =>
        offsets(pid) = acc; acc += totals.getOrElse(pid, 0L)
      }
      val bc = spark.sparkContext.broadcast(offsets)
      val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
        var run = bc.value(pid)
        it.map { r =>
          run += getW(r)
          new JoinedRow(r.copy(), new GenericInternalRow(Array[Any](run)))
            : InternalRow
        }
      }
      Bridge.internalCreateDataFrame(spark, outRdd,
        StructType(df.schema.fields :+ StructField(cumCol, LongType, nullable = false)))
    } else {
      val getW: InternalRow => Double = wType match {
        case FloatType => r => if (r.isNullAt(wIdx)) 0.0 else r.getFloat(wIdx).toDouble
        case _         => r => if (r.isNullAt(wIdx)) 0.0 else r.getDouble(wIdx)
      }
      val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0.0; it.foreach(r => s += getW(r)); Iterator((pid, s))
      }.collect().toMap
      val offsets = new Array[Double](rdd.getNumPartitions)
      var acc = 0.0
      (0 until rdd.getNumPartitions).foreach { pid =>
        offsets(pid) = acc; acc += totals.getOrElse(pid, 0.0)
      }
      val bc = spark.sparkContext.broadcast(offsets)
      val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
        var run = bc.value(pid)
        it.map { r =>
          run += getW(r)
          new JoinedRow(r.copy(), new GenericInternalRow(Array[Any](run)))
            : InternalRow
        }
      }
      Bridge.internalCreateDataFrame(spark, outRdd,
        StructType(df.schema.fields :+ StructField(cumCol, DoubleType, nullable = false)))
    }
  }
}
