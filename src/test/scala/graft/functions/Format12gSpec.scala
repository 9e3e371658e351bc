package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens generated with C/python `"%.12g" % x` — the exact float
  * serialization of every reference TSV sink (`float_format="%.12g"`,
  * reference clinical.py:353-358; SURVEY §2.1 K1).
  */
class Format12gSpec extends AnyFunSuite {

  private val goldens = Seq(
    0.1 -> "0.1",
    1.0 / 3 -> "0.333333333333",
    231.0 / 30.44 -> "7.58869908016",
    1e13 -> "1e+13",
    9.999999999999e11 -> "1e+12", // rounds up to 12 sig digits → scientific
    1.23e-5 -> "1.23e-05",
    1e-4 -> "0.0001",
    0.0 -> "0",
    -0.0 -> "-0",
    1.2345678901234568e16 -> "1.23456789012e+16",
    2.5 -> "2.5",
    3.0 -> "3", // integral float renders without ".0" (utils.py:133-153 K2)
    1234.5678 -> "1234.5678",
    -987.654321 -> "-987.654321",
    7.0 / 30.44 -> "0.229960578187"
  )

  test("format_12g matches C %.12g goldens") {
    goldens.foreach { case (in, want) =>
      assert(Format12gUtil.formatString(in) == want, s"input $in")
    }
  }

  test("format_12g specials") {
    assert(Format12gUtil.formatString(Double.NaN) == "nan")
    assert(Format12gUtil.formatString(Double.PositiveInfinity) == "inf")
    assert(Format12gUtil.formatString(Double.NegativeInfinity) == "-inf")
  }

  test("property: round-trips to within 12 significant digits (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(24) - 8)
      val back = Format12gUtil.formatString(d).toDouble
      if (d == 0.0) assert(back == 0.0)
      else assert(math.abs(back - d) <= math.abs(d) * 1e-11, s"input $d")
    }
  }
}
