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
}
