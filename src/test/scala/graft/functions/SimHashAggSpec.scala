package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}
import graft.queries.DedupQueries

/** The distributed SimHash aggregate must equal the per-row kernel on
  * every document — partial merge across partitions included.
  */
class SimHashAggSpec extends AnyFunSuite {
  import spark.implicits._

  test("simhash_agg over exploded tokens == simhash60 over the array") {
    val viaKernel = DedupQueries.ddSimhash(spark, sf001)
      .as[(Long, Long)].collect().toMap
    val viaAgg = DedupQueries.ddSimhashAgg(spark, sf001)
      .as[(Long, Long)].collect().toMap
    assert(viaAgg.size == viaKernel.size)
    val mismatches = viaKernel.collect {
      case (id, v) if viaAgg(id) != v => id
    }
    assert(mismatches.isEmpty, s"sketch mismatch for docs: ${mismatches.take(5)}")
  }

  test("merge across repartitioned inputs is order-independent") {
    val toks = Seq.tabulate(500)(i => (i % 7L, s"tok$i")).toDF("g", "tok")
    def run(parts: Int) = toks.repartition(parts)
      .groupBy($"g")
      .agg(SimHashAgg.simhashAgg(Hashing.md5LongSeeded(1, $"tok")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }
}
