package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (north-star extension): media payloads
  * as opaque `binary` columns with typed metadata, decoded /
  * feature-extracted by a batched per-partition kernel.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * STUB — [[fakeDecode]] derives deterministic pseudo-metadata from the
  * bytes. Everything around it is the real plumbing: binary column
  * schema, partition-level batching via mapPartitions (the Scala
  * analogue of arrow-batched mapInPandas), typed output schema, and
  * pushdown-friendly metadata columns. Swapping in a real codec
  * changes only the kernel body.
  *
  * Scale posture: decode is a narrow map stage — no shuffle; the
  * binary column should live in its own parquet column chunk so
  * metadata-only queries never read payload bytes (column pruning).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, first_code: Int,
                       fake_width: Int, fake_height: Int)

  /** STUB decode kernel: deterministic pseudo-metadata in place of a
    * real image decode (codecs unavailable in this environment).
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val first = if (n == 0) 0 else payload(0) & 0xFF
    (first, n % 640, (first * 3) % 480)
  }

  /** REAL decode path for one dependency-free container: BMP with a
    * BITMAPINFOHEADER-family DIB header (header size >= 40 at offset
    * 14; the legacy 12-byte BITMAPCOREHEADER stores 16-bit dimensions
    * at different offsets and falls back to the stub rather than
    * reading garbage). Width is the little-endian i32 at 18; height at
    * 22 is NEGATIVE for top-down rows — reported as |height| (the
    * orientation bit is not part of this metadata surface). Pure byte
    * arithmetic, no codec library: the kernel demonstrates the full
    * real-decode shape (magic sniff → header validate → field parse →
    * typed metadata) that a libjpeg/ffmpeg-backed kernel follows.
    * Non-BMP payloads fall back to the deterministic stub. Returns
    * (first_code, width, height). q32 keeps the stub kernel (its
    * oracle states the stub formulas over text payloads — a text that
    * happened to start with "BM" would otherwise diverge); this path
    * is exercised in PipelineSpec over hand-built headers.
    */
  def decodeBmpOrFake(payload: Array[Byte]): (Int, Int, Int) = {
    def le32(off: Int): Int =
      (payload(off) & 0xFF) | ((payload(off + 1) & 0xFF) << 8) |
        ((payload(off + 2) & 0xFF) << 16) | ((payload(off + 3) & 0xFF) << 24)
    val isInfoBmp = payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte &&
      le32(14) >= 40 // BITMAPINFOHEADER or the V4/V5 extensions
    if (isInfoBmp) (payload(0) & 0xFF, le32(18), math.abs(le32(22)))
    else fakeDecode(payload)
  }

  /** Documents' text re-encoded as a binary payload column — the shape
    * a real media table would have: (id, payload binary, metadata...).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** q32 — decode pipeline: binary payloads through the batched
    * per-partition stub kernel to typed metadata.
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (first, w, h) = fakeDecode(r.payload)
        MediaMeta(r.doc_id, r.payload.length, first, w, h)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  case class FrameStats(doc_id: Long, n_frames: Int, n_sampled: Int,
                        sampled_byte_sum: Long)

  /** q40 — frame-sample + resize pipeline over "video" payloads: the
    * payload is treated as fixed-size frames (frameBytes each, tail
    * dropped), every `stride`-th frame is sampled (the usual
    * keyframe-sampling shape), and the stub "resize/feature" kernel
    * reduces each sampled frame to its byte sum. Real codec swap-in
    * changes only the per-frame lambda; the batching, sampling
    * arithmetic, and typed output are the production plumbing.
    */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 32,
                  stride: Int = 4): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val nFrames = r.payload.length / frameBytes
        val sampled = (0 until nFrames).filter(_ % stride == 0)
        var byteSum = 0L
        sampled.foreach { f =>
          var i = f * frameBytes
          val end = i + frameBytes
          while (i < end) { byteSum += r.payload(i) & 0xFF; i += 1 }
        }
        FrameStats(r.doc_id, nFrames, sampled.size, byteSum)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Oracle: frame arithmetic + byte sums restated over the UTF-8 text
    * bytes (ASCII corpus: code units == bytes, so the byte sum of a
    * frame equals the sum of ascii codes of its 32-char window).
    */
  val frameSampleSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, strlen(text) // 32 AS n_frames FROM documents
      |)
      |SELECT doc_id,
      |  CAST(n_frames AS INT) AS n_frames,
      |  CAST((n_frames + 3) // 4 AS INT) AS n_sampled,
      |  CAST(COALESCE(list_sum(flatten(
      |    [[ascii(substr(text, CAST(f AS INT) * 128 + i, 1)) for i in range(1, 33)]
      |     for f in range(0, (n_frames + 3) // 4)])), 0) AS BIGINT) AS sampled_byte_sum
      |FROM base ORDER BY doc_id""".stripMargin

  /** Oracle: the stub formulas restated over the text bytes (ASCII
    * corpus: first UTF-8 byte == first code point).
    */
  val decodeMetaSql: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS INT) AS n_bytes,
      |  CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_code,
      |  CAST(strlen(text) % 640 AS INT) AS fake_width,
      |  CAST((CASE WHEN strlen(text) = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END) * 3 % 480 AS INT) AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin
}
