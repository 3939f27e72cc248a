package graft.operators

import graft.streaming.SparkSpec

/** Real-image kernels: the synthesized payloads are genuine PNGs,
  * javax.imageio decodes actual pixels, java.awt resizes them, and
  * the outputs match the synthesis contract the DuckDB oracle
  * predicts.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a" * 10),
    (1L, "b" * 100),
    (7L, "hello multimodal world, non-trivial text payload " * 20),
    (255L, "x"),
    (256L, "é" * 25) // 2-byte UTF-8 chars: byte length 50, char length 25
  ).toDF("doc_id", "text")

  test("asPngPayload emits decodable PNG bytes with the PNG magic") {
    val rows = Multimodal.asPngPayload(docs, "text", "doc_id")
      .as[Multimodal.MediaPayload].collect()
    assert(rows.length == 5)
    rows.foreach { p =>
      val magic = p.payload.take(8).map(_ & 0xff)
      assert(magic.sameElements(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)),
        s"doc ${p.doc_id} payload is not a PNG")
    }
  }

  test("decodeImage reports the real decoded dims and format") {
    val meta = Multimodal.decodeImage(
        Multimodal.asPngPayload(docs, "text", "doc_id"))
      .as[Multimodal.MediaMeta].collect().map(m => m.doc_id -> m).toMap
    // byte length drives dims: "a"*10 -> len 10 -> w=26, h=16
    assert(meta(0L) == Multimodal.MediaMeta(0L, 26, 16, "png", 26 * 16 * 3))
    // 2-byte chars: 50 BYTES (not 25 chars) -> w=16+2=18, h=16+1=17
    assert(meta(256L) == Multimodal.MediaMeta(256L, 18, 17, "png", 18 * 17 * 3))
    meta.values.foreach { m =>
      assert(m.format == "png")
      assert(m.width >= 16 && m.width < 64 && m.height >= 16 && m.height < 64)
    }
  }

  test("resizeImage checksums the actual resized raster (solid fill preserved)") {
    val out = Multimodal.resizeImage(
        Multimodal.asPngPayload(docs, "text", "doc_id"))
      .as[Multimodal.ResizedMedia].collect().map(r => r.doc_id -> r).toMap
    def expected(docId: Long): Long = {
      val r = docId % 256; val g = (docId * 31) % 256; val b = (docId * 97) % 256
      (65536L * (r + g + b)) % 2147483647L
    }
    Seq(0L, 1L, 7L, 255L, 256L).foreach { id =>
      val got = out(id)
      assert(got.out_w == 256 && got.out_h == 256 && got.out_bytes == 196608)
      assert(got.checksum == expected(id),
        s"doc $id: real-pixel checksum ${got.checksum} != predicted ${expected(id)}")
    }
  }

  test("frame-sample stub emits every 4th fake frame at 25 fps") {
    val frames = Multimodal.frameSampleStub(
        Multimodal.asBinaryPayload(docs, "text", "doc_id"))
      .as[Multimodal.FrameSample].collect()
    // doc 7: 50-char seed * 20 = 1000 bytes -> 3 frames (0,4 not: 1000/256=3 -> idx 0 only? )
    val byDoc = frames.groupBy(_.doc_id)
    // every doc has at least frame 0 at ts 0
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(byDoc(id).exists(f => f.frame_idx == 0 && f.frame_ts_ms == 0))
    }
    frames.foreach(f => assert(f.frame_idx % 4 == 0 && f.frame_ts_ms == f.frame_idx * 40))
  }
}
