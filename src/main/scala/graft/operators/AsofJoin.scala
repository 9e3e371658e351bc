package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row at or before
  * its timestamp, per key. Spark has no built-in as-of operator; rather
  * than a nested-loop range join (O(n·m) and a cross-product shuffle),
  * this composes built-ins the scale-correct way:
  *
  *   union the tagged sides → ONE shuffle on (key) → per-key sort by
  *   (ts, side) → `last(value, ignoreNulls)` over the running window
  *   carries the latest right value forward → keep left rows.
  *
  * Cost: one exchange + one sort — the same shape Catalyst plans for any
  * windowed aggregation, linear in |L|+|R|, no candidate explosion, skew
  * bounded by the hottest key (salt upstream if one key dominates).
  */
object AsofJoin {

  /** @param left      probe side (keeps all its rows)
    * @param right     reference side (its `valueCols` are carried forward)
    * @param keyCols   equality keys
    * @param tsCol     event-time column name (present on both sides)
    * @param valueCols right-side columns to attach to each left row
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows sort BEFORE left rows at an equal timestamp: "at or before"
    val l = valueCols.foldLeft(left.withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val r = leftCols.diff(keyCols :+ tsCol).foldLeft(
      right.select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
        .withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r.select(l.columns.map(col): _*))) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }
}
