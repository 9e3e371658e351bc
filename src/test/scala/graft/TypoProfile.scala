package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level cost decomposition of dd_typo_pairs (optimization r14):
  * times each sub-stage of the SymSpell deletion-neighborhood plan in
  * isolation with the noop sink. Not a test — a measurement main.
  *
  * Run: `sbt "test:runMain graft.TypoProfile /root/testdata/sf0.1 3"`
  */
object TypoProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[typo] $label%-28s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val names = Tables.customer(spark, sfDir).select(col("c_name").as("name"))
    def vars0 = names.distinct().select(col("name"), explode(array_distinct(expr(
      """concat(array(name),
        |  transform(sequence(1, length(name)),
        |    i -> concat(substring(name, 1, i - 1),
        |                substring(name, i + 1, length(name)))))""".stripMargin)))
      .as("v"))

    // warm
    vars0.write.format("noop").mode("overwrite").save()

    time("1 vars (distinct+explode)")(vars0)
    val joined = vars0.as("a").join(vars0.as("b"),
      col("a.v") === col("b.v") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    time("2 join")(joined)
    time("3 join+distinct")(joined.distinct())
    time("4 full (lev filter)")(joined.distinct()
      .filter(levenshtein(col("name_a"), col("name_b"), 1) === 1))
    println(joined.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Reused"))
      .mkString("\n"))
    spark.stop()
  }
}
