package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into `private[sql]` helpers: wrap a Catalyst Expression
  * as a public `Column` and back. Spark 4 made the Column↔Expression
  * boundary internal (`ColumnNode`); this is the sanctioned conversion
  * path (`org.apache.spark.sql.classic.ExpressionUtils`).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The active session's Hadoop configuration (base conf + SQL session
    * overrides via `sessionState.newHadoopConf()`), so user-configured
    * filesystem settings (s3a credentials, defaultFS, …) reach every
    * driver-side `FileSystem.get` in the sources. Falls back to a bare
    * conf when no session is active (e.g. standalone tooling).
    */
  def activeHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.classic.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** [[activeHadoopConf]] wrapped for shipping to tasks (Hadoop's
    * Configuration is not Serializable on its own).
    */
  def serializableConf(): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(activeHadoopConf())

  /** Wrap an `RDD[InternalRow]` as a DataFrame WITHOUT the external-Row
    * round trip (`createDataFrame(RDD[Row], schema)` re-encodes every
    * row). The sanctioned internal path for operators that compute on
    * `queryExecution.toRdd` directly (graft.operators.PrefixSum).
    */
  def internalCreateDataFrame(
      s: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Does this (unresolved) Column contain a DISTINCT aggregate call?
    *
    * Since the Spark 4 Column/ColumnNode split, [[expression]] on an
    * unanalyzed Column returns a leaf `ColumnNodeExpression` wrapper —
    * a Catalyst-tree `exists` never descends into it, so matching on
    * `AggregateExpression.isDistinct` silently answers false for every
    * `countDistinct(...)` built through the public DSL. The truth lives
    * in the ColumnNode tree: walk it for `UnresolvedFunction(isDistinct
    * = true)`, and for nodes wrapping pre-built Catalyst expressions
    * (custom aggregates) fall back to the Catalyst-side check.
    */
  def hasDistinctAggregate(c: Column): Boolean = {
    def catalystDistinct(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.exists {
        case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
          ae.isDistinct
        case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          uf.isDistinct // expr("count(DISTINCT ...)") parses to this
        case _ => false
      }
    c.node.collect {
      case f: org.apache.spark.sql.internal.UnresolvedFunction => f.isDistinct
      case n: org.apache.spark.sql.classic.ExpressionColumnNode =>
        catalystDistinct(n.expression)
      case s: org.apache.spark.sql.internal.SqlExpression => // expr("...")
        catalystDistinct(
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseExpression(s.expression))
    }.exists(identity)
  }
}
