package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * partition-local batches.
  *
  * The image kernels are REAL: payloads are genuine PNG bytes
  * (synthesized deterministically per row via [[asPngPayload]] — the
  * container ships no media fixtures), decoded with headless
  * `javax.imageio` and resized with `java.awt` bilinear drawImage.
  * Determinism contract for the DuckDB oracle: dimensions derive from
  * the text byte length and the fill color from doc_id, so the oracle
  * can predict what a CORRECT decode/resize must output — if the real
  * kernel mis-decoded, the hash check fails. Only the video
  * frame-sampler remains a clearly-marked stub (no video codec in the
  * JDK).
  *
  * Scale shape (100 TB): payloads never shuffle — every kernel is a
  * narrow `mapPartitions` directly over the scan, outputs carry no
  * payload bytes, and metadata-only consumers prune the binary column
  * at the parquet reader.
  */
object Multimodal {

  final case class MediaPayload(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, width: Long, height: Long,
                             format: String, raster_bytes: Long)

  /** Wrap a text column as an opaque binary payload column (raw text
    * bytes; used by the video-frame stub whose fake container length
    * is the oracle contract). */
  def asBinaryPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"))

  /** Synthesize a REAL (decodable) PNG payload per row: width/height
    * derived from the text's UTF-8 byte length, solid RGB fill derived
    * from doc_id. Solid fill is the property that keeps the downstream
    * resize checksum engine-independent: interpolating equal pixels
    * yields the same pixel, so the oracle can predict the resized
    * raster exactly. Encoder inits once per partition (the real-ingest
    * batch shape). */
  def asPngPayload(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        octet_length(col(textCol)).cast("long").as("byte_len"))
      .as[(Long, Long)]
      // the scan of a small fixture file yields 1-2 splits, which
      // would run the CPU-heavy encode/decode/resize chain on 1-2
      // cores; spread the NARROW 2-column frame across the executor
      // width BEFORE synthesis, so the heavy kernels downstream stay
      // payload-colocated (payload bytes themselves never shuffle —
      // the real-ingest property this fixture stands in for)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val buf = new ByteArrayOutputStream(4096)
        it.map { case (docId, byteLen) =>
          val (w, h) = synthDims(byteLen)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val rgb = synthColor(docId)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          buf.reset()
          ImageIO.write(img, "png", buf)
          MediaPayload(docId, buf.toByteArray)
        }
      }.toDF()
  }

  /** Oracle-shared synthesis rules (DuckDB twins in Oracles.scala). */
  private[graft] def synthDims(byteLen: Long): (Int, Int) =
    ((16 + byteLen % 48).toInt, (16 + (byteLen / 48) % 48).toInt)

  private[graft] def synthColor(docId: Long): Int = {
    val r = (docId % 256).toInt
    val g = ((docId * 31) % 256).toInt
    val b = ((docId * 97) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  final case class ResizedMedia(doc_id: Long, out_w: Long, out_h: Long,
                                out_bytes: Long, checksum: Long)
  final case class FrameSample(doc_id: Long, frame_idx: Long, frame_ts_ms: Long)

  /** REAL image decode: `javax.imageio` reads the PNG header + pixels
    * and reports actual width/height/format. Narrow map over the scan;
    * output carries no payload bytes. */
  def decodeImage(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      it.map { p =>
        val in = ImageIO.createImageInputStream(new ByteArrayInputStream(p.payload))
        try {
          val readers = ImageIO.getImageReaders(in)
          require(readers.hasNext, s"undecodable payload for doc ${p.doc_id}")
          val reader = readers.next()
          try {
            reader.setInput(in)
            val fmt = reader.getFormatName.toLowerCase
            val img = reader.read(0) // full pixel decode, not header-only
            MediaMeta(p.doc_id, img.getWidth.toLong, img.getHeight.toLong,
              fmt, img.getWidth.toLong * img.getHeight * 3)
          } finally reader.dispose()
        } finally in.close()
      }
    }.toDF()
  }

  /** REAL image resize: `java.awt` bilinear drawImage onto a
    * targetW×targetH RGB canvas; checksum sums (r+g+b) over every
    * output pixel mod 2^31-1. One Graphics2D pipeline per row, canvas
    * allocation amortizable per partition in a real ingest. */
  def resizeImage(payloads: DataFrame, targetW: Int = 256, targetH: Int = 256): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      // canvas + pixel buffer allocated ONCE per partition (the
      // decoder-init-amortization shape; a per-row 256 KB canvas is
      // pure GC churn at corpus scale)
      val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      val px = new Array[Int](targetW * targetH)
      it.map { p =>
        val src = ImageIO.read(new ByteArrayInputStream(p.payload))
        require(src != null, s"undecodable payload for doc ${p.doc_id}")
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(src, 0, 0, targetW, targetH, null)
        } finally g2.dispose()
        out.getRGB(0, 0, targetW, targetH, px, 0, targetW)
        var sum = 0L
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          i += 1
        }
        ResizedMedia(p.doc_id, targetW.toLong, targetH.toLong,
          targetW.toLong * targetH * 3, sum % 2147483647L)
      }
    }.toDF()
  }

  /** FRAME-SAMPLE STUB — deterministic fake of video frame sampling
    * (the JDK has no video codec): the fake container holds one
    * "frame" per 256 payload bytes (minimum one); every `stride`-th
    * frame is emitted with a 25 fps timestamp. One output row per
    * sampled frame — the explode stays narrow (no payload in the
    * output), which is the property that matters at 100 TB. */
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
}
