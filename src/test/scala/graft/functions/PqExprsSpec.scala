package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The compiled PQ kernels must be bit-identical to the reference
  * formulation they replaced: left-associated double sums over the
  * subvector/codeword difference, strict-`<` argmin (first minimum wins
  * ties). The in-spec oracle reimplements that formulation directly on
  * the driver so any codegen drift (sum order, tie break, float→double
  * widening point) fails loudly rather than through a bench-scale hash.
  */
class PqExprsSpec extends AnyFunSuite {
  import spark.implicits._

  private val Sub = 4; private val Cw = 8; private val Dim = 4

  private val rnd = new scala.util.Random(19)
  private val codebook: Array[Array[Double]] =
    Array.fill(Sub * Cw)(Array.fill(Dim)(rnd.nextGaussian()))
  // include exact-tie material: duplicate codewords within a subspace
  // must resolve to the SMALLER code index
  codebook(1 * Cw + 5) = codebook(1 * Cw + 2).clone()
  codebook(3 * Cw + 7) = codebook(3 * Cw + 0).clone()

  private def refEncode(v: Array[Float]): Array[Int] =
    (0 until Sub).map { sp =>
      val ds = (0 until Cw).map { j =>
        val cw = codebook(sp * Cw + j)
        (0 until Dim).foldLeft(0.0d) { (acc, i) =>
          val d = v(sp * Dim + i).toDouble - cw(i); acc + d * d
        }
      }
      ds.indexOf(ds.min) // first minimum = smallest code on ties
    }.toArray

  private def refAdc(q: Array[Float], codes: Array[Int]): Double =
    (0 until Sub).foldLeft(0.0d) { (tot, sp) =>
      val cw = codebook(sp * Cw + codes(sp))
      tot + (0 until Dim).foldLeft(0.0d) { (acc, i) =>
        val d = q(sp * Dim + i).toDouble - cw(i); acc + d * d
      }
    }

  private val vecs: Seq[Array[Float]] =
    Seq.fill(50)(Array.fill(Sub * Dim)(rnd.nextGaussian().toFloat)) ++
      // vectors that ARE codewords: distance exactly 0 in their subspace
      Seq((0 until Sub).flatMap(sp => codebook(sp * Cw + 2).map(_.toFloat)).toArray)

  test("encode kernel == reference argmin incl. duplicate-codeword ties") {
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toDF("id", "v")
    val got = df.select($"id",
        PqExprs.encode($"v", codebook, Sub, Cw, Dim).as("codes"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toArray).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i).sameElements(refEncode(v)), s"vector $i")
    }
  }

  test("adc kernel == reference sum, bit-identical doubles") {
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toDF("id", "v")
      .withColumn("codes", PqExprs.encode($"v", codebook, Sub, Cw, Dim))
    val got = df.select($"id",
        PqExprs.adc($"v", $"codes", codebook, Sub, Cw, Dim).as("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val exact = refAdc(v, refEncode(v))
      assert(got(i) == exact, s"vector $i: ${got(i)} != $exact (must be ==, not ~=)")
    }
  }

  test("self-encoded codeword vector has zero distance in every subspace") {
    val v = (0 until Sub).flatMap(sp => codebook(sp * Cw + 2).map(_.toFloat)).toArray
    assert(refEncode(v).forall(_ == 2),
      "a float-rounded codeword must still encode to its own index")
    val df = Seq((0, v.toSeq)).toDF("id", "v")
      .withColumn("codes", PqExprs.encode($"v", codebook, Sub, Cw, Dim))
      .select(PqExprs.adc($"v", $"codes", codebook, Sub, Cw, Dim))
    // float→double round-trip of the codeword costs a little: the
    // distance is the rounding residual, strictly tiny but not zero
    assert(df.collect().head.getDouble(0) < 1e-12)
  }
}
