package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — the scale-correct form of
  * `Window.orderBy(id)` with no partition key, which Spark executes by
  * moving EVERY row to one partition (fine at 60k rows, dead at 100 TB).
  *
  * Classic two-level shape, expressed as ONE lazy plan:
  *   1. range-partition by the order column (partition i holds a
  *      contiguous range);
  *   2. per-partition totals → exclusive running sum over the
  *      #partitions-row totals table (this tiny window IS single-task,
  *      but over partition COUNT rows, not data rows) → per-partition
  *      offsets;
  *   3. offsets broadcast-join back; a per-PARTITION window (parallel —
  *      the partition id is the window key) adds the offset to the
  *      local running sum.
  *
  * Both uses of the ranged frame contain the identical range Exchange,
  * which Catalyst's ReuseExchange collapses to one shuffle — no
  * persist/unpersist lifecycle, no driver collect, nothing leaked on
  * repeated invocation.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `weightCol` in `orderCol`
    * order, computed with the two-level distributed plan above.
    */
  def withRunningSum(df: DataFrame, orderCol: String, weightCol: String,
                     cumCol: String, numPartitions: Int = 0): DataFrame = {
    // CORRECTNESS depends on both references to `ranged` resolving to the
    // SAME physical exchange (ReuseExchange/AQE stage reuse): two
    // independent executions of repartitionByRange sample with different
    // seeds and may pick different partition bounds, silently mismatching
    // offsets and rows. The subtrees are identical by construction, so
    // reuse is deterministic — but it must not be disabled.
    // OperatorsSpec locks the ReusedExchange into the executed plan.
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse.enabled", "true").toBoolean,
      "PrefixSum.withRunningSum requires spark.sql.exchange.reuse.enabled=true")
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    // exclusive prefix over partition totals: offset(p) = sum of all
    // earlier partitions' weights (repartitionByRange assigns partition
    // ids in range order, so pid order == orderCol order)
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("__w"))
      .withColumn("__off", coalesce(sum(col("__w")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumCol, sum(col(weightCol)).over(wLocal) + col("__off"))
      .drop("__pid", "__off")
  }
}
