package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sf001, spark}
import graft.Tables

/** Multimodal plumbing: binary payloads, deterministic fake metadata,
  * generator-based frame sampling, batched mapPartitions embedding.
  */
class MultimodalSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001).limit(50).cache()

  test("mediaTable: binary payload length equals UTF-8 byte length") {
    val bad = Multimodal.mediaTable(docs)
      .where(col("meta.byte_len") =!= length(col("media"))).count()
    assert(bad == 0)
  }

  test("metaQuery: deterministic, fully non-null, dims in declared range") {
    val m = Multimodal.metaQuery(docs).cache()
    assert(m.count() == 50)
    assert(m.where(col("format").isNull || col("width").isNull).count() == 0)
    val row = m.agg(min("width"), max("width"), min("n_frames"), max("n_frames"))
      .as[(Int, Int, Int, Int)].head()
    assert(row._1 >= 64 && row._2 <= 64 + 63 * 8)
    assert(row._3 >= 1 && row._4 <= 120)
    // determinism: two evaluations hash identically
    val h1 = m.agg(sum(hash(col("doc_id"), col("format"), col("width")))).head().getLong(0)
    val h2 = Multimodal.metaQuery(docs)
      .agg(sum(hash(col("doc_id"), col("format"), col("width")))).head().getLong(0)
    assert(h1 == h2)
  }

  test("frameSample: indices evenly spaced, within [0, n_frames)") {
    val f = Multimodal.frameSample(docs).cache()
    assert(f.where(col("frame_idx") < 0 || col("frame_idx") >= col("n_frames")).count() == 0)
    // per doc: step = max(1, floor(n/8)) caps samples at 15 (worst case
    // n=15, step=1); first sampled frame is always 0
    val per = f.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), min("frame_idx").as("first"))
    assert(per.where(col("k") > 15 || col("first") =!= 0).count() == 0)
  }

  test("resizePlan: short side becomes 224, aspect order preserved") {
    val r = Multimodal.resizePlan(docs)
    val bad = r.where(
      (col("width") <= col("height") && col("new_width") =!= 224) ||
      (col("width") > col("height") && col("new_height") =!= 224) ||
      // aspect order: wider-than-tall stays wider-than-tall
      ((col("width") > col("height")) =!= (col("new_width") > col("new_height")) &&
        col("new_width") =!= col("new_height"))).count()
    assert(bad == 0)
  }

  test("embedWithErrors: corrupt/oversized media become error rows in the same pass") {
    import graft.SparkTestBase.spark
    import spark.implicits._
    val mixed = Seq(
      (1L, "a short good doc"),
      (2L, ""), // empty payload → error row
      (3L, "x" * 500), // over the 100-byte cap → error row
      (4L, "another fine one")).toDF("doc_id", "text")
    val r = Multimodal.embedWithErrors(mixed, maxBytes = 100)
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)), Option(x.getString(3)))).toMap
    assert(r.size == 4, "one outcome row per input — nothing dropped, no crash")
    assert(r(1L)._1.isDefined && r(1L)._2.isEmpty)
    assert(r(4L)._1.isDefined && r(4L)._2.isEmpty)
    assert(r(2L)._1.isEmpty && r(2L)._2.exists(_.contains("empty")))
    assert(r(3L)._1.isEmpty && r(3L)._2.exists(_.contains("exceeds cap")))
    // good rows carry the same embeddings the plain path computes
    val plain = Multimodal.embedFeatures(mixed.filter($"doc_id".isin(1L, 4L)))
      .select($"doc_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val good = Multimodal.embedWithErrors(mixed, maxBytes = 100)
      .filter($"error".isNull)
      .select($"doc_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(plain.keys.forall(k => plain(k).sameElements(good(k))))
  }

  test("embedFeatures: fixed dim, deterministic across runs and batch sizes") {
    val e1 = Multimodal.embedFeatures(docs, batchSize = 64)
      .select($"doc_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val e2 = Multimodal.embedFeatures(docs, batchSize = 7)
      .select($"doc_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(e1.size == 50)
    assert(e1.values.forall(_.length == 8))
    // batch size must not change results — per-row determinism
    assert(e1.keys.forall(k => e1(k).sameElements(e2(k))))
  }
}
