package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — the scale-correct form of
  * `Window.orderBy(id)` with no partition key, which Spark executes by
  * moving EVERY row to one partition (fine at 60k rows, dead at 100 TB).
  *
  * Classic two-pass shape instead:
  *   1. range-partition by the order column (so partition i holds a
  *      contiguous id range, in order);
  *   2. one tiny job aggregates each partition's weight sum; the driver
  *      prefix-sums those (#partitions values) into per-partition offsets;
  *   3. a per-PARTITION window (parallel — partition id IS the window
  *      key) adds the broadcast offset to the local running sum.
  *
  * Every heavy step is parallel; the only serial work is the
  * #partitions-long scan on the driver.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `weightCol` in `orderCol`
    * order, computed with the two-pass distributed plan above.
    */
  def withRunningSum(df: DataFrame, orderCol: String, weightCol: String,
                     cumCol: String, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      // the window below re-sorts within each partition; persist so the
      // per-partition totals job and the main pass share the range shuffle
      .persist()
    // repartitionByRange assigns partition ids in range order: pid 0
    // holds the lowest orderCol range — accumulate offsets in pid order
    val partSums = ranged.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("w"))
      .collect()
      .sortBy(_.getInt(0))
    var acc = 0L
    val offsets = partSums.map { r =>
      val o = r.getInt(0) -> acc
      acc += (if (r.isNullAt(1)) 0L else r.getAs[Number](1).longValue())
      o
    }.toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged
      .withColumn(cumCol, sum(col(weightCol)).over(w) + offCol)
      .drop("__pid")
    out
  }
}
