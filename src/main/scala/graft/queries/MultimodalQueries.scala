package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Query entries for the multimodal layer (SURVEY §7 extension). The
  * deterministic-fake metadata is pure integer arithmetic over the UTF-8
  * byte length, so DuckDB mirrors it exactly (`octet_length(encode(text))`
  * == Spark `length(cast(text as binary))`). The mapPartitions embedding
  * stage is not SQL-expressible → rows-only check by the driver.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** mm_meta — typed metadata sniffed (deterministically faked) from the
    * binary payload: the "describe my media corpus" scan.
    */
  def mmMeta: Q = (s, dir) => Multimodal.metaQuery(Tables.documents(s, dir))

  /** mm_frames — evenly-spaced frame sampling via sequence+explode. */
  def mmFrames: Q = (s, dir) => Multimodal.frameSample(Tables.documents(s, dir))

  /** mm_resize — aspect-preserving resize plan to short side 224. */
  def mmResize: Q = (s, dir) => Multimodal.resizePlan(Tables.documents(s, dir))

  /** mm_embed_agg — batched per-partition "inference" (stubbed decoder),
    * then an aggregate so the output is small and stable: count + per-dim
    * checksum of the deterministic embeddings. ORACLE-INFEASIBLE by
    * nature: the embedding values come from the JVM-side model stub
    * (in production, a real encoder) — there is no SQL that reproduces a
    * model forward pass, so the driver's rows-only check plus the
    * determinism/shape specs in MultimodalSpec are the correctness
    * surface, as they would be for any inference stage.
    */
  def mmEmbedAgg: Q = (s, dir) =>
    Multimodal.embedFeatures(Tables.documents(s, dir))
      .select(col("doc_id"), col("model_ver"),
        round(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double")), 3).as("embed_sum"))

  /** mm_embed_errors — the decode error channel under a byte cap: one
    * pass yields good rows AND quarantine rows (doc counts + id
    * checksums per outcome). The cap (180 bytes) is chosen to split the
    * corpus both ways at every SF; the outcome condition is pure integer
    * arithmetic, so DuckDB mirrors it.
    */
  def mmEmbedErrors: Q = (s, dir) =>
    Multimodal.embedWithErrors(Tables.documents(s, dir), maxBytes = 180)
      .groupBy(col("error").isNull.as("ok"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).cast("long").as("sum_ids"))

  /** mm_dedup — bit-exact payload dedup over the binary media column
    * (the media-corpus pass that drops re-crawled/re-encoded-identical
    * files BEFORE any decode cost): group by md5 of the RAW bytes —
    * deliberately no normalization, unlike dd_exact's text-level hash —
    * keep the lowest id, count copies. One hash-partitioned groupBy on
    * the 128-bit fingerprint; the payload itself never shuffles (only
    * fp, id, size), which is the point at media scale.
    */
  def mmDedup: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), md5(col("payload")).as("fp"),
        length(col("payload")).cast("long").as("nb"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        max(col("nb")).as("n_bytes"))

  val queries: Map[String, Q] = Map(
    "mm_embed_errors" -> mmEmbedErrors,
    "mm_dedup" -> mmDedup,
    "mm_meta" -> mmMeta,
    "mm_frames" -> mmFrames,
    "mm_resize" -> mmResize,
    "mm_embed_agg" -> mmEmbedAgg)

  // Shared DuckDB fragment: UTF-8 byte length of the text payload.
  private val blen = "octet_length(encode(text))"

  val oracle: Map[String, String] = Map(
    "mm_dedup" ->
      // DuckDB's md5 takes VARCHAR (hashing its UTF-8 bytes) — the
      // same bytes Spark's md5(cast(text AS BINARY)) hashes
      s"""SELECT md5(text) AS fp, min(doc_id) AS keep_id,
         | count(*) AS n_copies, max($blen)::BIGINT AS n_bytes
         | FROM documents GROUP BY 1""".stripMargin,
    "mm_embed_errors" ->
      s"""SELECT $blen <= 180 AND $blen > 0 AS ok,
         | count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         | FROM documents GROUP BY 1""".stripMargin,
    "mm_meta" ->
      s"""SELECT doc_id, $blen AS byte_len,
         | CASE $blen % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
         |   ELSE 'webp' END AS format,
         | 64 + ($blen % 64) * 8 AS width,
         | 64 + ($blen % 48) * 8 AS height,
         | 1 + ($blen % 120) AS n_frames
         | FROM documents""".stripMargin,
    "mm_frames" ->
      s"""WITH m AS (SELECT doc_id, 1 + ($blen % 120) AS n_frames
         |           FROM documents)
         |SELECT doc_id, n_frames,
         |  unnest(range(0, n_frames, greatest(1, n_frames // 8))) AS frame_idx
         |FROM m""".stripMargin,
    "mm_resize" ->
      s"""WITH m AS (SELECT doc_id,
         |  64 + ($blen % 64) * 8 AS width,
         |  64 + ($blen % 48) * 8 AS height FROM documents)
         |SELECT doc_id, width, height,
         |  CASE WHEN width <= height THEN 224
         |       ELSE width * 224 // height END AS new_width,
         |  CASE WHEN width <= height THEN height * 224 // width
         |       ELSE 224 END AS new_height
         |FROM m""".stripMargin)
  // mm_embed_agg: mapPartitions stub model — rows-only check (no oracle).
}
