package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}

/** The compiled PII-redaction kernel must be EXACTLY the three-pass
  * regex cascade it replaces (the DuckDB oracle still runs the regex
  * form, so any divergence is an oracle failure): equivalence is pinned
  * on the real corpus and on adversarial generated strings dense in
  * '@', digits, dots and separators — the places backtracking
  * subtleties live.
  */
class PiiRedactSpec extends AnyFunSuite {

  private val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val phone = "\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}"
  private val digits = "[0-9]{9,}"

  private def regexCascade(s: String): (Int, String) = {
    val afterEmail = s.replaceAll(email, "<EMAIL>")
    val n = java.util.regex.Pattern.compile(email).matcher(s).results().count().toInt
    (n, afterEmail.replaceAll(phone, "<PHONE>").replaceAll(digits, "<NUM>"))
  }

  private def kernel(s: String): (Int, String) = {
    val row = TextOps.piiRedact(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (row.getInt(0), row.getUTF8String(1).toString)
  }

  test("kernel == regex cascade on every sf0.001 document") {
    val texts = graft.Tables.documents(spark, sf001)
      .select(col("text")).collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach { t =>
      assert(kernel(t) == regexCascade(t), s"mismatch on corpus doc: ${t.take(120)}")
    }
  }

  test("kernel == regex cascade on targeted edge cases") {
    val cases = Seq(
      "", "@", "a@b.cc", "a@b.c", "a@b", "a@.cc", "@b.cc",
      "123-456-7890", "12-345-6789", "1234-567-8901", "123 456 7890x@y.cc",
      "123456@x.cc789012345", "a@b.cc123-456-7890", "+1-555-123-4567",
      "+12 345 6789", "555.123.4567 ext", "123-456-78901234extra",
      "123-456-7890-", "123-456-7890- ", "12345678", "123456789",
      "1234567890123456", "a.b-c_d%e+f@g-h.i.jj", "x@y.cc.dd-",
      "a@b.cc@d.ee", "a@b.cc123@d.ee", "<EM a@b.cc AIL>", "<EMAIL>",
      "πρό123456789σβα", "日本語123-456-7890テスト", "+@", "++1-234-5678",
      "1-234-567", "1-234-5678", "1 234 5678 9012", "1.234.5678.9012")
    cases.foreach { t =>
      assert(kernel(t) == regexCascade(t), s"mismatch on: '$t'")
    }
  }

  test("kernel == regex cascade on adversarial generated strings") {
    // alphabet dense in the pattern anchors; short lengths explore
    // boundary interactions exhaustively enough at 2000 samples
    val alpha = Gen.frequency(
      (4, Gen.numChar),
      (3, Gen.alphaChar),
      (2, Gen.oneOf('@', '.', '-', ' ', '+')),
      (1, Gen.oneOf('_', '%', '<', '>', 'π')))
    val strGen = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    (0 until 3000).foreach { i =>
      val t = strGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(kernel(t) == regexCascade(t), s"mismatch on: '$t' (seed $i)")
    }
  }

  test("td_redact query matches the regex formulation on sf0.001") {
    val viaKernel = graft.queries.TextQueries.tdRedact(spark, sf001)
    val viaRegex = graft.Tables.documents(spark, sf001).select(
      col("doc_id"),
      regexp_count(col("text"), lit(email)).as("n_emails"),
      regexp_replace(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
        phone, "<PHONE>"), digits, "<NUM>").as("clean_text"))
    assert(viaKernel.exceptAll(viaRegex).isEmpty && viaRegex.exceptAll(viaKernel).isEmpty)
  }
}
