package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The compiled byte-scan kernels must equal the regex formulations they
  * replace — on edge cases including blanks, UTF-8 multibyte chars,
  * underscores (word chars for `\b`), and punctuation-adjacent words.
  */
class TextExprsSpec extends AnyFunSuite {
  import spark.implicits._

  private val cases = Seq(
    "", " ", "\t\n", "the", " the ", "the the the", "a_the the_b",
    "the-and.of,to", "héllo wörld the", "naïve the café", "x the and",
    "THE And of", "123 the 456", "the_", "_the", "tab\tthe\nand",
    "punct!!! ??? the", "mixed héé_the the")

  test("wsTokenCount == regexp_count(\\S+) — maximal non-ws runs") {
    val df = cases.toDF("t")
    val bad = df.filter(
      TextExprs.wsTokenCount($"t") =!= regexp_count($"t", lit("\\S+"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("alpha/punct counts == regexp_count character classes") {
    val df = cases.toDF("t")
    val bad = df.filter(
      TextExprs.alphaCount($"t") =!= regexp_count($"t", lit("[a-zA-Z]")) ||
      TextExprs.punctCount($"t") =!= regexp_count($"t", lit("[^a-zA-Z0-9\\s]"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("wordSetCount == regexp_count(lower, \\b(?:...)\\b)") {
    val words = Seq("the", "and", "of", "to", "in")
    val df = cases.toDF("t")
    val bad = df.filter(
      TextExprs.wordSetCount($"t", words) =!=
        regexp_count(lower($"t"), lit("\\b(?:the|and|of|to|in)\\b"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }
}
