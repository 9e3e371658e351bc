package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant ladder for the dd_typo_pairs rewrite (optimization r14). */
object TypoProfile2 {
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
      val built = df
      built.write.format("noop").mode("overwrite").save() // warm
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        built.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[typo2] $label%-34s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val names = Tables.customer(spark, sfDir).select(col("c_name").as("name"))

    // current HOF-based variant expression
    val hofVariants = expr(
      """concat(array(name),
        |  transform(sequence(1, length(name)),
        |    i -> concat(substring(name, 1, i - 1),
        |                substring(name, i + 1, length(name)))))""".stripMargin)

    def varsHof = names.distinct().select(col("name"),
      explode(array_distinct(hofVariants)).as("v"))

    // A: posexplode over positions, substring in codegen (no HOF, no array)
    def varsPos = names.distinct()
      .select(col("name"), explode(sequence(lit(0), length(col("name")))).as("i"))
      .select(col("name"),
        when(col("i") === 0, col("name")).otherwise(
          concat(substring(col("name"), lit(1), col("i") - 1),
            expr("substring(name, i + 1, length(name))"))).as("v"))

    time("vars HOF (current)")(varsHof)
    time("vars posexplode")(varsPos)
    time("vars posexplode distinct")(varsPos.distinct())

    def pairsFrom(vars: DataFrame, hashKey: Boolean, levBeforeDistinct: Boolean,
                  noBroadcast: Boolean): DataFrame = {
      val v = if (hashKey) vars.select(col("name"), xxhash64(col("v")).as("v")) else vars
      val vv = if (noBroadcast) v.hint("shuffle_hash") else v
      val j = vv.as("a").join(vv.as("b"),
          col("a.v") === col("b.v") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      if (levBeforeDistinct)
        j.filter(levenshtein(col("name_a"), col("name_b"), 1) === 1).distinct()
      else
        j.distinct().filter(levenshtein(col("name_a"), col("name_b"), 1) === 1)
    }

    time("full current")(pairsFrom(varsHof, false, false, false))
    time("full posexp")(pairsFrom(varsPos, false, false, false))
    time("full posexp+hash")(pairsFrom(varsPos, true, false, false))
    time("full posexp+hash+levfirst")(pairsFrom(varsPos, true, true, false))
    time("full posexp+hash+shj")(pairsFrom(varsPos, true, false, true))
    time("full posexp+hash+levfirst+shj")(pairsFrom(varsPos, true, true, true))
    time("full hof+hash+levfirst")(pairsFrom(varsHof, true, true, false))

    // sanity: identical results between current and candidate
    val cur = pairsFrom(varsHof, false, false, false)
    val cand = pairsFrom(varsPos, true, true, false)
    val d1 = cur.exceptAll(cand).count()
    val d2 = cand.exceptAll(cur).count()
    println(s"[typo2] equivalence exceptAll: $d1 / $d2 (both must be 0)")
    spark.stop()
  }
}
