package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.util.control.NonFatal

/** J5 live mode — batched service enrichment as a distributed operator
  * (reference `maf.py:95-130`: Genome Nexus annotation fanned out over a
  * process pool in ~55 MB chunks). The Spark shape replaces the chunk +
  * pool dance entirely:
  *
  *   - the CLIENT loads once per partition (connection pool / auth
  *     handshake paid once per task, not per row — the
  *     `Multimodal.embedFeatures` once-per-partition-model shape);
  *   - requests leave in FIXED-SIZE batches (the service's contract;
  *     one round-trip per batch, not per variant);
  *   - a failed batch retries `maxRetries` times, then falls back to
  *     PER-ITEM calls so one poisoned key quarantines one row — an
  *     error ROW in the same channel as the join form's unmatched rows
  *     (`Annotation_Status = FAILED`), never a task failure that
  *     retries the whole partition's completed work.
  *
  * Scale: map-only (no shuffle), throughput bounded by the service;
  * partition count = concurrent client sessions, exactly how a real
  * enrichment fleet is sized.
  */
object LiveAnnotator {

  /** A batch annotation service. Returns one entry per input key, in
    * order: Some(values) aligned with `annotationCols`, None when the
    * service has no annotation for that key. Throws on transport
    * failure (the operator retries, then isolates per item).
    * Implementations are built per-partition via a serializable factory.
    */
  trait Client extends Serializable {
    def annotateBatch(keys: Seq[String]): Seq[Option[Seq[String]]]
  }

  /** Composite key serialization: stable, engine-neutral join of the key
    * columns (the genomic-change string a variant service is keyed on).
    */
  def keyString(r: Row, keyIdx: Array[Int]): String =
    keyIdx.map(i => String.valueOf(r.get(i))).mkString("|")

  /** Enrich `df` with `annotationCols` (string-typed) fetched from the
    * client in batches, plus `Annotation_Status` = SUCCESS/FAILED —
    * row-compatible with [[MafPipeline.annotate]]'s join form, so the
    * two modes interchange behind the same downstream pipeline.
    */
  def annotateLive(df: DataFrame, keyCols: Seq[String],
                   annotationCols: Seq[String], clientFactory: () => Client,
                   batchSize: Int = 100, maxRetries: Int = 2): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(maxRetries >= 0, "maxRetries must be non-negative")
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val nAnn = annotationCols.length
    val outSchema = StructType(schema.fields ++
      annotationCols.map(c => StructField(c, StringType, nullable = true)) :+
      StructField("Annotation_Status", StringType, nullable = false))
    val out = df.rdd.mapPartitions { it =>
      val client = clientFactory() // once per partition
      it.grouped(batchSize).flatMap { batch =>
        val keys = batch.map(keyString(_, keyIdx))
        batch.zip(resilientBatch(client, keys, maxRetries)).map { case (r, ann) =>
          val vals: Seq[Any] = ann match {
            case Some(a) => a.map(v => v: Any).padTo(nAnn, null).take(nAnn)
            case None    => Seq.fill[Any](nAnn)(null)
          }
          Row.fromSeq(r.toSeq ++ vals :+ (if (ann.isDefined) "SUCCESS" else "FAILED"))
        }
      }
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }

  /** Batch call with bounded retries; on exhaustion, per-item isolation
    * (each item gets its own retried call; an item that still throws
    * becomes None → a FAILED row, not a task failure).
    */
  private def resilientBatch(client: Client, keys: Seq[String],
                             maxRetries: Int): Seq[Option[Seq[String]]] = {
    def attempt(ks: Seq[String]): Option[Seq[Option[Seq[String]]]] = {
      var tries = 0
      while (true) {
        try return Some(client.annotateBatch(ks))
        catch {
          case NonFatal(_) if tries < maxRetries => tries += 1
          case NonFatal(_)                       => return None
        }
      }
      None // unreachable
    }
    attempt(keys).getOrElse(
      keys.map(k => attempt(Seq(k)).flatMap(_.head)))
  }
}
