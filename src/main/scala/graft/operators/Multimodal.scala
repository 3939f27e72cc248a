package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * partition-local batches.
  *
  * The container has no image/audio libraries, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE of the decode kernel; everything
  * around it — the binary payload column, the typed output schema, the
  * mapPartitions batch shape (one decoder init per partition, streamed
  * rows) — is the real 100 TB plumbing: payloads never shuffle, the
  * decode is a narrow map over the scan, and metadata-only consumers
  * prune the binary column away at the parquet reader.
  */
object Multimodal {

  final case class MediaPayload(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                             height: Long, format: String)

  /** Wrap a text column as an opaque binary payload column (the stand-in
    * for real media bytes; schema matches what a real ingest would
    * produce: id + binary + nothing else). */
  def asBinaryPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"))

  final case class ResizedMedia(doc_id: Long, out_w: Long, out_h: Long,
                                out_bytes: Long, checksum: Long)
  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_ts_ms: Long)

  /** RESIZE STUB — deterministic fake of an image resize kernel: fixed
    * target dims, RGB byte count, and a length-derived checksum the
    * DuckDB oracle reproduces from `strlen(text)`. The plumbing is the
    * real part: payloads never shuffle (narrow map over the scan), the
    * resizer would init once per partition, and the binary column is
    * pruned away for metadata-only consumers. */
  def resizeStub(payloads: DataFrame, targetW: Int = 256, targetH: Int = 256): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      // real pipeline: val resizer = Resizer.init(targetW, targetH) — once per partition
      it.map { p =>
        val n = p.payload.length.toLong
        ResizedMedia(p.doc_id, targetW.toLong, targetH.toLong,
          targetW.toLong * targetH * 3, n % 997L)
      }
    }.toDF()
  }

  /** FRAME-SAMPLE STUB — deterministic fake of video frame sampling:
    * the fake container holds one "frame" per 256 payload bytes
    * (minimum one); every `stride`-th frame is emitted with a 25 fps
    * timestamp. One output row per sampled frame — the explode stays
    * narrow (no payload in the output), which is the property that
    * matters at 100 TB. */
  def frameSampleStub(payloads: DataFrame, stride: Int = 4): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      it.flatMap { p =>
        val total = math.max(1L, p.payload.length.toLong / 256L)
        (0L until total by stride.toLong).iterator
          .map(f => FrameSample(p.doc_id, f, f * 40L))
      }
    }.toDF()
  }

  /** DECODE STUB — deterministic fake of the media decode kernel.
    * A real build would link an image/audio decoder here and run it
    * once per partition (decoder init amortized across the batch);
    * the fake derives metadata purely from the byte length so the
    * DuckDB oracle can reproduce it from `length(text)`. */
  def decodeStub(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      // real pipeline: val decoder = Decoder.init() — once per partition
      it.map { p =>
        val n = p.payload.length.toLong
        MediaMeta(p.doc_id, n, width = n % 1024L, height = (n / 1024L) % 1024L,
          format = if (n % 2 == 0) "png" else "jpg")
      }
    }.toDF()
  }
}
