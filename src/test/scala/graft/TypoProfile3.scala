package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final-form candidate for the dd_typo_pairs rewrite (optimization r14). */
object TypoProfile3 {
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
      built.write.format("noop").mode("overwrite").save()
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        built.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[typo3] $label%-34s min=${ts.min}%7.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val names = Tables.customer(spark, sfDir).select(col("c_name").as("name"))

    // candidate: codegen variant generation, run-end dedup (== array_distinct),
    // 64-bit hashed join key, shuffle-hash self-join, verify before distinct
    def candidate(nms: DataFrame): DataFrame = {
      val vars = nms.distinct()
        .select(col("name"), explode(sequence(lit(0), length(col("name")))).as("i"))
        .filter(col("i") === 0 ||
          expr("substring(name, i, 1) != substring(name, i + 1, 1)") ||
          col("i") === length(col("name")))
        .select(col("name"),
          xxhash64(when(col("i") === 0, col("name")).otherwise(
            concat(substring(col("name"), lit(1), col("i") - 1),
              expr("substring(name, i + 1, length(name))")))).as("v"))
        .hint("shuffle_hash")
      vars.as("a").join(vars.as("b"),
          col("a.v") === col("b.v") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .filter(levenshtein(col("name_a"), col("name_b"), 1) === 1)
        .distinct()
    }

    def current(nms: DataFrame): DataFrame = {
      val vars = nms.distinct().select(col("name"), explode(array_distinct(expr(
        """concat(array(name),
          |  transform(sequence(1, length(name)),
          |    i -> concat(substring(name, 1, i - 1),
          |                substring(name, i + 1, length(name)))))""".stripMargin)))
        .as("v"))
      vars.as("a").join(vars.as("b"),
          col("a.v") === col("b.v") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
        .filter(levenshtein(col("name_a"), col("name_b"), 1) === 1)
    }

    time("current")(current(names))
    time("candidate")(candidate(names))

    val d1 = current(names).exceptAll(candidate(names)).count()
    val d2 = candidate(names).exceptAll(current(names)).count()
    println(s"[typo3] equivalence exceptAll: $d1 / $d2 (both must be 0)")

    // adversarial: runs of equal chars, unicode, empty-adjacent, short names
    import spark.implicits._
    val adv = Seq("", "a", "aa", "aaa", "ab", "ba", "aab", "abb", "aabb",
      "xxxyyy", "xxyxx", "résumé", "résume", "resume", "naïve", "naive",
      "Customer#000000000", "Customer#000000001", "Custmer#000000001",
      "Customer##00000001", "αβγ", "αβ", "ぁあぃ", "ぁあ").toDF("name")
    val a1 = current(adv).exceptAll(candidate(adv)).count()
    val a2 = candidate(adv).exceptAll(current(adv)).count()
    println(s"[typo3] adversarial exceptAll: $a1 / $a2 (both must be 0)")
    spark.stop()
  }
}
