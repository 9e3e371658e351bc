package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test corpus
  * (`/root/testdata/sf*`; see TESTDATA.md). At cluster scale these would
  * be catalog tables; the loader keeps scans declarative so Catalyst can
  * push filters/column pruning into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.parquet` has shipped with two `ts` encodings across driver
    * data generations: INT64 TIMESTAMP(NANOS) (which Spark's reader
    * rejects unless nanos are read as long via the legacy conf, then
    * converted with integer division — a double intermediate's 53-bit
    * mantissa cannot hold ~1e18 nanosecond values exactly) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark 4 infers
    * as TIMESTAMP_NTZ). Normalize BOTH to session-local TimestampType so
    * every downstream query/window/oracle sees one type regardless of
    * which generation produced the file (the harness runs in UTC, where
    * the NTZ→TZ cast is value-identical).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
