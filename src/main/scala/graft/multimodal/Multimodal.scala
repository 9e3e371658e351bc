package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column layer (extension per SURVEY §7; the reference is
  * text/TSV only). Media are opaque `binary` columns with a typed metadata
  * struct alongside; all pipeline plumbing — schema, partitioning, batched
  * per-partition processing — is real and tested, while the codec itself is
  * stubbed (see [[FakeVisionModel]]) because no image/audio libraries exist
  * in this container.
  *
  * Scale design: every transform here is a narrow, shuffle-free map over
  * the binary column — at 100 TB these run at scan throughput with no
  * exchange. Heavy decode work uses `mapPartitions` so a real decoder/model
  * is loaded ONCE per partition (not per row) and rows are processed in
  * fixed-size batches, the same shape a GPU inference stage needs. Frame
  * sampling uses `sequence` + `explode` (codegen'd generator, no UDF).
  */
object Multimodal {

  case class Media(doc_id: Long, media: Array[Byte])
  case class MediaEmbed(doc_id: Long, embedding: Array[Float], model_ver: String)
  /** Decode outcome row: exactly one of (embedding, error) is set. */
  case class MediaResult(doc_id: Long, embedding: Option[Array[Float]],
                         model_ver: String, error: Option[String])

  /** ---- STUB BOUNDARY -------------------------------------------------
    * A real deployment plugs javax.imageio / ffmpeg-JNI / an ONNX session
    * in here. The fake derives all outputs deterministically from the raw
    * bytes so the surrounding plumbing is end-to-end testable; swap the
    * body, keep the signature.
    */
  object FakeVisionModel {
    case class Loaded(version: String) {
      /** Batched "inference": one fixed-width embedding per input. */
      def embedBatch(batch: Seq[Media], dim: Int = 8): Seq[MediaEmbed] =
        batch.map { m =>
          var h = 1125899906842597L // rolling polynomial hash of the bytes
          val acc = new Array[Long](dim)
          var i = 0
          while (i < m.media.length) {
            h = h * 31 + (m.media(i) & 0xff)
            acc(i % dim) += (h & 0xffff)
            i += 1
          }
          MediaEmbed(m.doc_id, acc.map(a => (a % 1000L) / 1000.0f), version)
        }
    }
    /** Heavyweight load (weights, codec contexts) — call once per partition. */
    def load(): Loaded = Loaded("fake-v1")
  }
  /** ---- END STUB BOUNDARY --------------------------------------------- */

  /** The media table: documents' text re-materialized as an opaque binary
    * payload plus a typed metadata struct. Metadata is a deterministic fake
    * of a container-header sniff (byte length drives "format"/dims/frames)
    * — integer arithmetic only, so the DuckDB oracle can mirror it exactly.
    */
  def mediaTable(docs: DataFrame): DataFrame = {
    val bytes = col("text").cast("binary")
    val len = length(bytes) // octet length of the binary payload
    docs.select(
      col("doc_id"),
      bytes.as("media"),
      struct(
        len.as("byte_len"),
        when(pmod(len, lit(3)) === 0, "png")
          .when(pmod(len, lit(3)) === 1, "jpeg")
          .otherwise("webp").as("format"),
        (lit(64) + pmod(len, lit(64)) * 8).as("width"),
        (lit(64) + pmod(len, lit(48)) * 8).as("height"),
        (lit(1) + pmod(len, lit(120))).as("n_frames")).as("meta"))
  }

  /** Flattened metadata projection (the "describe my corpus" scan). */
  def metaQuery(docs: DataFrame): DataFrame =
    mediaTable(docs).select(
      col("doc_id"),
      col("meta.byte_len").as("byte_len"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"))

  /** Frame sampling: up to ~8 evenly-spaced frame indices per video via
    * `sequence` + `explode` — a codegen'd generator, no UDF, no shuffle.
    */
  def frameSample(docs: DataFrame): DataFrame = {
    val n = col("meta.n_frames")
    val step = greatest(lit(1), (n / 8).cast("int"))
    mediaTable(docs)
      .select(col("doc_id"), n.as("n_frames"),
        explode(sequence(lit(0), n - 1, step)).as("frame_idx"))
  }

  /** Resize planning: target short side 224, aspect preserved, integer
    * arithmetic (`div`) so engines agree exactly. The byte-level resample
    * itself sits behind the stub boundary; the plan (output dims) is the
    * Spark-side contract a real kernel consumes.
    */
  def resizePlan(docs: DataFrame, target: Int = 224): DataFrame = {
    val w = col("width")
    val h = col("height")
    metaQuery(docs).select(col("doc_id"), w, h,
      when(w <= h, lit(target)).otherwise(expr(s"width * $target div height")).as("new_width"),
      when(w <= h, expr(s"height * $target div width")).otherwise(lit(target)).as("new_height"))
  }

  /** Feature extraction over the binary column: `mapPartitions` with a
    * once-per-partition model load and fixed-size batches — the production
    * shape for decoder/GPU stages. Deterministic via the stub model.
    */
  def embedFeatures(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs).select(col("doc_id"), col("media")).as[Media]
      .mapPartitions { it =>
        val model = FakeVisionModel.load()
        it.grouped(batchSize).flatMap(model.embedBatch(_))
      }
      .toDF()
  }

  /** Decode with an ERROR CHANNEL — the plumbing a real corpus demands:
    * at 100 TB some fraction of media is always corrupt, and one bad
    * payload must become an error ROW (same J5 error-report shape as the
    * annotation join), never a task failure that kills the stage and
    * retries the whole partition's GPU work. Per-item try/catch inside
    * the batch loop; downstream splits on `error IS NULL` — good rows to
    * the feature store, error rows to the quarantine report. Both come
    * from ONE pass; no second decode.
    */
  def embedWithErrors(docs: DataFrame, batchSize: Int = 64,
                      maxBytes: Long = 1L << 26): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs).select(col("doc_id"), col("media")).as[Media]
      .mapPartitions { it =>
        val model = FakeVisionModel.load()
        it.grouped(batchSize).flatMap { batch =>
          // screen first, then ONE model call for the batch's valid items
          // (the whole point of batching is one GPU/codec invocation per
          // batch); per-item fallback only for attribution when the
          // batched call itself fails
          val (bad, good) = batch.partition(m =>
            m.media == null || m.media.isEmpty || m.media.length > maxBytes)
          val badRows = bad.map { m =>
            val why = if (m.media == null || m.media.isEmpty) "empty payload"
              else s"payload ${m.media.length} bytes exceeds cap $maxBytes"
            MediaResult(m.doc_id, None, model.version, Some(why))
          }
          val goodRows =
            try model.embedBatch(good)
              .map(e => MediaResult(e.doc_id, Some(e.embedding), e.model_ver, None))
            catch {
              case _: Exception => good.map { m =>
                try {
                  val Seq(e) = model.embedBatch(Seq(m))
                  MediaResult(m.doc_id, Some(e.embedding), e.model_ver, None)
                } catch {
                  case ex: Exception =>
                    MediaResult(m.doc_id, None, model.version,
                      Some(s"decode failed: ${ex.getClass.getSimpleName}"))
                }
              }
            }
          badRows ++ goodRows
        }
      }
      .toDF()
  }
}
