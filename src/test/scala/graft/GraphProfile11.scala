package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: per-round primitive cost — string-keyed vs long-keyed edge cache,
  * at several widths. Times ONE relaxation round (seeds-join + min agg)
  * and a bare full-scan aggregate over each cache. */
object GraphProfile11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeDF(label: String)(body: => DataFrame): Unit = {
      body.queryExecution.toRdd.count()
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        body.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[gprof11] $label%-44s min=${ts.min}%7.3f")
    }
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    def strEdges(n: Int): DataFrame = {
      val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(concat(lit("S"), col("l_suppkey")).as("src"),
          concat(lit("C"), col("o_custkey")).as("dst"))
        .agg(countDistinct(col("l_orderkey")).as("n"))
        .select(col("src"), col("dst"),
          greatest(lit(1L), lit(10L) - col("n")).as("w"))
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .repartition(n, col("src")).persist()
    }
    def intEdges(n: Int): DataFrame = {
      val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
        .agg(countDistinct(col("l_orderkey")).as("n"))
        .select(col("src"), col("dst"),
          greatest(lit(1L), lit(10L) - col("n")).as("w"))
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .repartition(n, col("src")).persist()
    }
    for (n <- Seq(4, 8)) {
      val se = strEdges(n); se.count()
      val ie = intEdges(n); ie.count()
      timeDF(s"bare agg STR n=$n")(se.groupBy(col("src")).agg(min(col("w"))))
      timeDF(s"bare agg INT n=$n")(ie.groupBy(col("src")).agg(min(col("w"))))
      // one relaxation round: seeds join + union + min agg
      val seedsS = se.filter(col("src").startsWith("S") &&
          substring(col("src"), 2, 18).cast("long") < 10L)
        .select(col("src").as("node")).distinct().withColumn("dist", lit(0L))
        .localCheckpoint()
      val seedsI = ie.filter(col("src") % 2 === 0 && col("src") < 20L)
        .select(col("src").as("node")).distinct().withColumn("dist", lit(0L))
        .localCheckpoint()
      def roundS(d: DataFrame): DataFrame = {
        val relaxed = d.hint("shuffle_hash").join(se, d("node") === se("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        d.select(col("node"), col("dist")).union(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      }
      def roundI(d: DataFrame): DataFrame = {
        val relaxed = d.hint("shuffle_hash").join(ie, d("node") === ie("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        d.select(col("node"), col("dist")).union(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      }
      timeDF(s"one round STR n=$n")(roundS(seedsS))
      timeDF(s"one round INT n=$n")(roundI(seedsI))
      se.unpersist(); ie.unpersist()
    }
    spark.stop()
  }
}
