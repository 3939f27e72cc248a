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

  test("asGifPayload emits a real multi-frame GIF (magic + frame count)") {
    val rows = Multimodal.asGifPayload(docs, "text", "doc_id")
      .as[Multimodal.MediaPayload].collect().map(p => p.doc_id -> p).toMap
    rows.values.foreach { p =>
      val magic = new String(p.payload.take(6), "US-ASCII")
      assert(magic == "GIF89a" || magic == "GIF87a",
        s"doc ${p.doc_id} payload is not a GIF")
    }
    // doc 7: 49-byte seed * 20 = 980 bytes -> 30 frames; count them
    // with an independent reader
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(rows(7L).payload))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) == 980 / 32)
    reader.dispose(); in.close()
  }

  test("sampleFrames decodes real per-frame rasters: every 4th frame, 25 fps, per-frame checksum") {
    val frames = Multimodal.sampleFrames(
        Multimodal.asGifPayload(docs, "text", "doc_id"))
      .as[Multimodal.FrameSample].collect()
    val byDoc = frames.groupBy(_.doc_id)
    // every doc has at least frame 0 at ts 0
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(byDoc(id).exists(f => f.frame_idx == 0 && f.frame_ts_ms == 0))
    }
    frames.foreach(f => assert(f.frame_idx % 4 == 0 && f.frame_ts_ms == f.frame_idx * 40))
    // doc 7 (980 bytes): 30 frames -> sampled 0,4,...,28
    assert(byDoc(7L).map(_.frame_idx).sorted.toSeq == (0L to 28L by 4))
    // checksums come from the REAL decoded rasters and must match the
    // synthesis contract w*h*(r+g+b) per frame — distinct across
    // frames (a decoder that re-served frame 0 would fail here)
    def expected(docId: Long, byteLen: Long, f: Long): Long = {
      val w = 16 + byteLen % 48; val h = 16 + (byteLen / 48) % 48
      val c = ((docId + 11 * f) % 256) + ((docId * 31 + 13 * f) % 256) +
        ((docId * 97 + 29 * f) % 256)
      (w * h * c) % 2147483647L
    }
    byDoc(7L).foreach(fr =>
      assert(fr.checksum == expected(7L, 980L, fr.frame_idx),
        s"frame ${fr.frame_idx}: real checksum ${fr.checksum} != predicted"))
    assert(byDoc(7L).map(_.checksum).distinct.length == byDoc(7L).length)
  }

  test("perceptualHash: real-raster aHash bits match the geometric prediction; equal images collide") {
    // docs 1 and 33 share doc_id % 32 = 1; give them equal byte length
    // so their cell-grid images are pixel-identical -> hashes collide;
    // doc 65 shares the palette at DIFFERENT dims -> near (not equal)
    val grid = Seq(
      (1L, "z" * 40), (33L, "w" * 40), (65L, "v" * 45),
      (7L, "hello multimodal " * 10)
    ).toDF("doc_id", "text")
    val got = Multimodal.perceptualHash(
        Multimodal.asCellGridPayload(grid, "text", "doc_id"))
      .as[Multimodal.PHash].collect().map(p => p.doc_id -> p).toMap
    assert(got(1L).phash_hi == got(33L).phash_hi &&
      got(1L).phash_lo == got(33L).phash_lo, "identical images must collide")
    // driver replica of the analytic bit rule: cell mean luma is
    // dimension-independent, so bit b = [luma_b * w*h >= totalSum]
    def predicted(docId: Long, byteLen: Long): (Long, Long) = {
      val w = (16 + byteLen % 48).toInt; val h = (16 + (byteLen / 48) % 48).toInt
      val m = docId % 32
      def luma(v: Long) = (v % 256) + (v * 31 % 256) + (v * 97 % 256)
      val lumas = Array.tabulate(64)(b => luma(m * 977 + b))
      val px = Array.tabulate(64) { b =>
        val i = b % 8; val j = b / 8
        (((i + 1) * w / 8) - (i * w / 8)).toLong *
          (((j + 1) * h / 8) - (j * h / 8))
      }
      val totalSum = (0 until 64).map(b => lumas(b) * px(b)).sum
      val totalPx = w.toLong * h
      var hi = 0L; var lo = 0L
      for (b <- 0 until 64) if (lumas(b) * totalPx >= totalSum) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      (hi, lo)
    }
    Seq(1L -> 40L, 7L -> 170L).foreach { case (id, len) =>
      val (hi, lo) = predicted(id, len)
      assert(got(id).phash_hi == hi && got(id).phash_lo == lo,
        s"doc $id: real decode hash ${got(id)} != predicted ($hi, $lo)")
    }
    // same palette, different dims: small hamming distance, not zero-
    // distance in general, never the cross-palette ~32
    val dist = java.lang.Long.bitCount(got(1L).phash_hi ^ got(65L).phash_hi) +
      java.lang.Long.bitCount(got(1L).phash_lo ^ got(65L).phash_lo)
    assert(dist <= 6, s"same-palette resized image drifted too far: $dist")
    // a genuine grid image is neither all-zeros nor all-ones
    assert(got(7L).phash_lo != 0L || got(7L).phash_hi != 0L)
    assert((got(7L).phash_lo, got(7L).phash_hi) != (0xffffffffL, 0xffffffffL))
  }

  test("audioFingerprint: real-PCM energy bits match the analytic rule; same-bucket audio collides") {
    // docs 2 and 34 share doc_id % 32 = 2 at equal byte length ->
    // identical stepped-amplitude PCM -> identical fingerprints
    val aud = Seq((2L, "q" * 30), (34L, "r" * 30), (9L, "abc " * 60))
      .toDF("doc_id", "text")
    val got = Multimodal.audioFingerprint(
        Multimodal.asWavPayload(aud, "text", "doc_id", seedMod = 32))
      .as[(Long, Long, Long)].collect().map(p => p._1 -> (p._2, p._3)).toMap
    assert(got(2L) == got(34L), "identical audio must collide")
    // analytic replica: e_b = nb * (A_b*128)^2, A_b = (m*977+b*53)%256
    def predicted(docId: Long, byteLen: Long): (Long, Long) = {
      val n = (256 + byteLen % 1024).toInt
      val m = docId % 32
      val nb = Array.tabulate(64)(b => ((b + 1) * n / 64 - b * n / 64).toLong)
      val e = Array.tabulate(64) { b =>
        val a = ((m * 977 + b * 53) % 256) * 128
        nb(b) * a * a
      }
      val te = e.sum
      var hi = 0L; var lo = 0L
      for (b <- 0 until 64) if (e(b) * n >= te * nb(b)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      (hi, lo)
    }
    Seq(2L -> 30L, 9L -> 240L).foreach { case (id, len) =>
      assert(got(id) == predicted(id, len),
        s"doc $id: real fingerprint ${got(id)} != predicted ${predicted(id, len)}")
    }
  }

  test("asWavPayload emits a real RIFF/WAVE container javax.sound decodes") {
    val meta = Multimodal.decodeAudio(
        Multimodal.asWavPayload(docs, "text", "doc_id"))
      .as[Multimodal.AudioMeta].collect().map(m => m.doc_id -> m).toMap
    // "a"*10 -> byte len 10 -> 266 samples; real decode must say so
    assert(meta(0L) == Multimodal.AudioMeta(0L, 1, 8000, 16, 266, 266 * 1000 / 8000))
    // 2-byte chars: 50 BYTES -> 306 samples
    assert(meta(256L).n_samples == 306)
    meta.values.foreach { m =>
      assert(m.channels == 1 && m.sample_rate == 8000 && m.bits == 16)
    }
  }

  test("audioWindows: exact integer energy/peak per full window, partial dropped") {
    val wins = Multimodal.audioWindows(
        Multimodal.asWavPayload(docs, "text", "doc_id"))
      .as[Multimodal.AudioWindow].collect()
    val byDoc = wins.groupBy(_.doc_id)
    // doc 0: 266 samples < 400 -> no full window
    assert(!byDoc.contains(0L))
    // doc 7: 980 bytes -> 256 + 980%1024 = 1236 samples -> 3 full windows
    assert(byDoc(7L).map(_.win_idx).sorted.toSeq == Seq(0L, 1L, 2L))
    // driver replica of the synth rule over the REAL decoded samples
    def predicted(docId: Long, k: Long): (Long, Long) = {
      var energy = 0L; var peak = 0L
      (0 until 400).foreach { i =>
        val s = ((docId * 31 + (k * 400 + i) * 17) % 65536) - 32768
        energy += s * s; peak = math.max(peak, math.abs(s))
      }
      (energy, peak)
    }
    byDoc(7L).foreach { w =>
      val (e, p) = predicted(7L, w.win_idx)
      assert(w.energy == e && w.peak == p,
        s"window ${w.win_idx}: real ($w) != predicted ($e, $p)")
    }
  }
}
