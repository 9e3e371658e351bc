package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}

/** The compiled json_int_key kernel must agree with the Jackson form
  * (`get_json_object(s, "$.k")` + int cast) everywhere the events
  * family can see: the real corpus and the adversarial shapes where a
  * naive substring scanner goes wrong — nested objects carrying the
  * same key, string VALUES containing `"k":`, escapes, whitespace,
  * quoted numbers, overflow. Non-integer values compare against
  * try_cast semantics (NULL), which is what the kernel implements and
  * what the data contract (`{"k": <int>}`) makes unreachable in the
  * queries themselves.
  */
class JsonExprsSpec extends AnyFunSuite {
  import spark.implicits._

  private def kernel(s: String): Any = {
    val r = JsonOps.jsonIntKey(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), "k".getBytes)
    r
  }

  private def jackson(rows: Seq[String]): Seq[Option[Int]] =
    rows.toDF("props")
      .select(get_json_object(col("props"), "$.k").try_cast("int").as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq

  test("kernel == get_json_object($.k)::int on every sf0.001 event") {
    val props = graft.Tables.events(spark, sf001)
      .select(col("props")).collect().map(_.getString(0)).toSeq
    assert(props.nonEmpty)
    val expected = jackson(props)
    props.zip(expected).foreach { case (p, e) =>
      assert(Option(kernel(p)).map(_.asInstanceOf[Int]) == e, s"mismatch on: $p")
    }
  }

  test("kernel == jackson on adversarial shapes") {
    val cases = Seq(
      """{"k": 69}""", """{"k":-7}""", """{ "k" : 12 }""", """{"k": "42"}""",
      """{"j": 1, "k": 2}""", """{"k": 1, "k": 2}""",
      """{"j": {"k": 5}}""", """{"j": [1, {"k": 5}], "k": 9}""",
      """{"s": "\"k\": 8", "k": 3}""", """{"s": "no key here"}""",
      """{"kk": 5}""", """{"K": 5}""", """{"k": 1.5}""", """{"k": true}""",
      """{"k": null}""", """{"k": []}""", """{"k": {}}""",
      """{"k": 2147483647}""", """{"k": -2147483648}""", """{"k": 2147483648}""",
      """{"k": "abc"}""", """{}""", """[1,2]""", """not json""", """""",
      """{"a\"k\":1": 9, "k": 4}""", """  {"k":7}  """,
      // cast-semantics edges for QUOTED values (trim + sign + zeros)
      """{"k": " 42"}""", """{"k": "+42"}""", """{"k": "42 "}""",
      "{\"k\": \"\t42\"}", """{"k": "007"}""", """{"k": "-0"}""",
      // Jackson's bare-number grammar: leading zeros are malformed
      """{"k": 007}""", """{"k": 0}""", """{"k": -0}""",
      // malformed structure BEFORE the key must stay NULL
      """{"a":1 "k":2}""", """{"a":1,,"k":2}""", """{"a" 1, "k": 2}""")
    val expected = jackson(cases)
    cases.zip(expected).foreach { case (p, e) =>
      assert(Option(kernel(p)).map(_.asInstanceOf[Int]) == e, s"mismatch on: $p")
    }
  }

  test("ev_json query via kernel equals the jackson formulation") {
    val viaKernel = graft.queries.StreamQueries.evJson(spark, sf001)
    val viaJackson = graft.Tables.events(spark, sf001)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
    assert(viaKernel.exceptAll(viaJackson).isEmpty &&
      viaJackson.exceptAll(viaKernel).isEmpty)
  }
}
