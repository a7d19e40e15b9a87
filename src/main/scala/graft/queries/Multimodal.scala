package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.3: m1).
  *
  * Media is carried as an opaque `binary` column plus typed metadata.
  * The decode step is a clearly-marked deterministic STUB (no image /
  * audio codecs in this environment), but the Spark-side plumbing is
  * real: typed Dataset, `mapPartitions` batch processing (the Scala
  * analogue of a pandas-batch UDF), binary payloads, metadata schema.
  * At 100 TB the same shape holds: payload bytes stay columnar, the
  * decode map is narrow (no shuffle), and feature extraction emits a
  * fixed-width schema.
  */
object Multimodal extends QueryModule {
  import Q.t

  /** Input row: payload + metadata for one media object. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte], format: String)

  /** Extracted features for one media object. */
  final case class MediaFeat(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, first_byte: Long, last_byte: Long)

  /** STUB decode: a real deployment would decode `payload` with an
    * image/audio codec here. This stands in with deterministic
    * byte-level features so the pipeline shape is fully testable.
    */
  private def stubDecode(m: MediaIn): MediaFeat = {
    val n = m.payload.length.toLong
    MediaFeat(
      doc_id = m.doc_id,
      n_bytes = n,
      width = 64L + n % 256L,
      height = 64L + (n * 31L) % 256L,
      first_byte = if (n > 0) m.payload.head.toLong & 0xFF else -1L,
      last_byte = if (n > 0) m.payload.last.toLong & 0xFF else -1L)
  }

  def queries: Map[String, Q] = Map(
    // ─── m1: binary media column → batch decode → feature schema ───
    "m1_multimodal" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = t(s, dir, "documents")
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            lit("utf8-text").as("format"))
          .as[MediaIn]
        media
          .mapPartitions(_.map(stubDecode))
          .toDF()
          .orderBy(col("doc_id"))
      },
      // The byte-level stub features are SQL-expressible (ASCII text),
      // so even the stubbed pipeline gets a full oracle.
      Some("""SELECT doc_id,
          octet_length(encode(text)) AS n_bytes,
          64 + octet_length(encode(text)) % 256 AS width,
          64 + (octet_length(encode(text)) * 31) % 256 AS height,
          ascii(substr(text, 1, 1)) AS first_byte,
          ascii(substr(text, length(text), 1)) AS last_byte
        FROM documents
        ORDER BY doc_id"""))
  )
}
