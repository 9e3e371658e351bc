package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The mock-service storage behind j5_live_annotate: a Spark-built
  * sorted shard store probed by mmap binary search. The lock here is
  * exactness — every built key resolves to its value, every absent key
  * to None — across shard boundaries, at the extremes, and for the
  * empty store (which is what makes the live-annotate face
  * bit-identical to the broadcast-join face at any scale).
  */
class KeyedStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshDir(): Path = {
    val d = Files.createTempDirectory("keyed-store-spec-")
    d.resolve("store") // build target must not pre-exist
  }

  test("build + lookup: every key exact, misses None, across shards") {
    val n = 5000
    // string-sorted keys ("10" < "9") — the store must agree with
    // Spark's orderBy on the cast key, not numeric order
    val kv = (0 until n).map(i => (i.toLong, s"val-$i"))
    val dir = freshDir()
    // 8 output shards via repartition at build time
    KeyedStore.build(kv.toDF("k", "v").repartition(8), "k", "v", dir)
    val r = KeyedStore.open(dir.toString)
    (0 until n).foreach { i =>
      assert(r.lookup(i.toString) == Some(s"val-$i"), s"key $i")
    }
    assert(r.lookup("-1").isEmpty, "below every shard")
    assert(r.lookup((2L * n).toString).isEmpty)
    assert(r.lookup("").isEmpty, "empty probe key")
    assert(r.lookup("val-7").isEmpty, "a value is not a key")
    // probe keys lexicographically between real keys
    assert(r.lookup("10x").isEmpty)
    assert(r.lookup("099").isEmpty)
  }

  test("empty table -> empty store -> all lookups miss") {
    val dir = freshDir()
    KeyedStore.build(Seq.empty[(Long, String)].toDF("k", "v"), "k", "v", dir)
    val r = KeyedStore.open(dir.toString)
    assert(r.lookup("anything").isEmpty)
  }

  test("null values round-trip as empty string; rebuild is a no-op") {
    val dir = freshDir()
    val df = Seq((1L, "one"), (2L, null.asInstanceOf[String]), (3L, "three"))
      .toDF("k", "v")
    KeyedStore.build(df, "k", "v", dir)
    val r = KeyedStore.open(dir.toString)
    assert(r.lookup("1") == Some("one"))
    assert(r.lookup("2") == Some(""))
    assert(r.lookup("3") == Some("three"))
    // second build against an existing store returns without touching it
    val before = Files.getLastModifiedTime(dir)
    KeyedStore.build(Seq((9L, "nine")).toDF("k", "v"), "k", "v", dir)
    assert(Files.getLastModifiedTime(dir) == before)
    assert(KeyedStore.open(dir.toString).lookup("9").isEmpty)
  }
}
