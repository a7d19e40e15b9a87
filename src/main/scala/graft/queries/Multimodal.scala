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

  /** One sampled (and stub-"resized") frame of a payload. */
  final case class Frame(doc_id: Long, frame_idx: Long, f_bytes: Long,
      checksum: Long, ds_checksum: Long)

  /** One overlapping analysis window of an audio-shaped payload. */
  final case class Chunk(doc_id: Long, chunk_idx: Long, start_off: Long,
      energy: Long, peak: Long, silent: Boolean)

  private val FrameBytes = 32
  private val ChunkBytes = 64
  private val ChunkHop = 48

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
        ORDER BY doc_id""")),

    // ─── m2: frame sampling + resize plumbing over binary payloads ───
    // The video-shaped half of the multimodal story: a payload is a
    // sequence of fixed-size frames; sample every 4th full frame and
    // "resize" it (stub: keep every 2nd byte — a real deployment
    // decodes and scales pixels here). One typed flatMap, narrow (no
    // shuffle), emitting a fixed-width row per sampled frame — the
    // exact shape a frame-extraction stage has at 100 TB. Byte
    // arithmetic over the ASCII payload keeps even the stub fully
    // oracled.
    "m2_frame_sample" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = t(s, dir, "documents")
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            lit("utf8-text").as("format"))
          .as[MediaIn]
        media.flatMap { m =>
          val p = m.payload
          val nFrames = p.length / FrameBytes
          Iterator.range(0, nFrames).filter(_ % 4 == 0).map { k =>
            val off = k * FrameBytes
            var sum = 0L
            var ds = 0L
            var i = 0
            while (i < FrameBytes) {
              val b = (p(off + i) & 0xFF).toLong
              sum += b
              if (i % 2 == 0) ds += b
              i += 1
            }
            Frame(m.doc_id, k.toLong, FrameBytes.toLong, sum, ds)
          }
        }.toDF()
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH frames AS (
          SELECT doc_id, k AS frame_idx, substr(text, k * 32 + 1, 32) AS f
          FROM documents,
            unnest(generate_series(0,
              cast(floor(length(text) / 32) as bigint) - 1)) AS t(k)
          WHERE k % 4 = 0)
        SELECT doc_id, frame_idx, cast(32 as bigint) AS f_bytes,
          cast(list_sum(list_transform(generate_series(1, 32),
            i -> ascii(substr(f, i, 1)))) as bigint) AS checksum,
          cast(list_sum(list_transform(generate_series(1, 32),
            i -> CASE WHEN (i - 1) % 2 = 0 THEN ascii(substr(f, i, 1))
                      ELSE 0 END)) as bigint) AS ds_checksum
        FROM frames
        ORDER BY doc_id, frame_idx""")),

    // ─── m3: overlapping-window audio analysis plumbing ───
    // The audio-shaped third of the multimodal story: a payload is a
    // PCM-ish sample stream; slide a 64-byte analysis window at a
    // 48-byte hop (25% overlap — the windowing shape every
    // spectral/VAD stage uses) and emit per-window energy, peak, and
    // a silence flag. A real deployment decodes codec frames and runs
    // an FFT here; the stub computes the same-shaped features from
    // raw bytes so the pipeline stays fully oracled. One typed
    // flatMap, narrow (no shuffle): overlap multiplies output rows by
    // 4/3, never re-reads the payload across partitions — the exact
    // windowing shape at 100 TB.
    // ORACLE COUPLING (m1/m2 too): Spark windows over the UTF-8 BYTES
    // of text.cast(binary) while the DuckDB oracle uses substr/ascii/
    // length over CHARACTERS (code points). The two agree only because
    // the synthetic documents corpus is pure ASCII (1 byte = 1 char =
    // 1 ascii() value); any multibyte character would shift window
    // counts, offsets, energy, and peak. CorpusInvariantSpec asserts
    // the ASCII precondition so a corpus change fails there, not here.
    "m3_audio_window" -> Q(
      (s, dir) => {
        import s.implicits._
        val media = t(s, dir, "documents")
          .select(col("doc_id"),
            col("text").cast("binary").as("payload"),
            lit("pcm-stub").as("format"))
          .as[MediaIn]
        media.flatMap { m =>
          val p = m.payload
          val nChunks =
            if (p.length < ChunkBytes) 0
            else (p.length - ChunkBytes) / ChunkHop + 1
          Iterator.range(0, nChunks).map { k =>
            val off = k * ChunkHop
            var energy = 0L
            var peak = 0L
            var i = 0
            while (i < ChunkBytes) {
              val b = (p(off + i) & 0xFF).toLong
              energy += b * b
              if (b > peak) peak = b
              i += 1
            }
            Chunk(m.doc_id, k.toLong, off.toLong, energy, peak,
              energy < 500000L)
          }
        }.toDF()
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH chunks AS (
          SELECT doc_id, k AS chunk_idx, k * 48 AS start_off,
            substr(text, k * 48 + 1, 64) AS c
          FROM documents,
            unnest(generate_series(0,
              cast(floor((length(text) - 64) / 48) as bigint))) AS t(k)
          WHERE length(text) >= 64)
        SELECT doc_id, chunk_idx, cast(start_off as bigint) AS start_off,
          cast(list_sum(list_transform(generate_series(1, 64),
            i -> ascii(substr(c, i, 1)) * ascii(substr(c, i, 1))))
            as bigint) AS energy,
          cast(list_max(list_transform(generate_series(1, 64),
            i -> ascii(substr(c, i, 1)))) as bigint) AS peak,
          cast(list_sum(list_transform(generate_series(1, 64),
            i -> ascii(substr(c, i, 1)) * ascii(substr(c, i, 1))))
            as bigint) < 500000 AS silent
        FROM chunks
        ORDER BY doc_id, chunk_idx"""))
  )
}
