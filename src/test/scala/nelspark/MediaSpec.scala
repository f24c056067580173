package nelspark

import nelspark.media.MediaOps

/** Pure-JVM media header parsers: real byte-level PNG/JPEG/WAV parsing
  * (the only remaining stub is full frame decode). */
class MediaSpec extends SparkSpec {

  private def png(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 0x0D, 'I', 'H', 'D', 'R'))
    bb.putInt(w).putInt(h)
    bb.put(Array[Byte](8, 6, 0, 0, 0, 0, 0, 0, 0))
    bb.array()
  }

  private def jpeg(w: Int, h: Int, appSeg: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xFF.toByte, 0xD8.toByte), 0, 2) // SOI
    if (appSeg) { // APP0 segment before SOF0, as real JFIF files have
      out.write(Array[Byte](0xFF.toByte, 0xE0.toByte, 0x00, 0x06,
        'J', 'F', 'I', 'F'), 0, 8)
    }
    out.write(Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08), 0, 5)
    out.write(Array[Byte](((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte), 0, 4)
    out.write(Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1), 0, 10)
    out.toByteArray
  }

  private def wav(sr: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(36).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("UTF-8")).putInt(0)
    bb.put("WAVEfmt ".getBytes("UTF-8"))
    bb.putInt(16).putShort(1).putShort(1).putInt(sr)
    bb.putInt(0).putShort(2).putShort(16)
    bb.array()
  }

  test("PNG IHDR width/height parse") {
    assert(MediaOps.parsePng(png(1920, 1080)) == Some((1920, 1080)))
    assert(MediaOps.parsePng(png(17, 3000)) == Some((17, 3000)))
    assert(MediaOps.parsePng("not a png at all....".getBytes) == None)
    assert(MediaOps.parsePng(Array[Byte](0x89.toByte, 'P')) == None)
  }

  test("JPEG SOF0 width/height parse, with and without leading APP segments") {
    assert(MediaOps.parseJpeg(jpeg(640, 480, appSeg = false)) == Some((640, 480)))
    assert(MediaOps.parseJpeg(jpeg(31, 22, appSeg = true)) == Some((31, 22)))
    assert(MediaOps.parseJpeg(png(10, 10)) == None)
    assert(MediaOps.parseJpeg(Array[Byte](0xFF.toByte, 0xD8.toByte)) == None)
  }

  test("JPEG skips spec-legal 0xFF fill bytes before markers (JFIF B.1.1.2)") {
    // SOI, then a run of 0xFF fill bytes directly before the SOF0 marker:
    // the byte after the run is the marker code, not another segment
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xFF.toByte, 0xD8.toByte), 0, 2) // SOI
    out.write(Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte), 0, 3) // fill
    out.write(Array[Byte](0xC0.toByte, 0x00, 0x11, 0x08,
      0x00, 0x64, 0x00, 0xC8.toByte), 0, 8) // SOF0: h=100 w=200
    out.write(Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1), 0, 10)
    assert(MediaOps.parseJpeg(out.toByteArray) == Some((200, 100)))
  }

  test("JPEG walk stops at EOI and SOS instead of misparsing trailing bytes") {
    // SOI + EOI followed by SOF-looking garbage: no dimensions before
    // end-of-image -> None, not garbage w/h
    val eoiThenGarbage = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xD9.toByte,
      0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x00)
    assert(MediaOps.parseJpeg(eoiThenGarbage) == None)
    // SOS before any SOF: entropy data follows, stop scanning
    val sosFirst = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xDA.toByte, 0x00, 0x04, 0x01, 0x00,
      0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x00)
    assert(MediaOps.parseJpeg(sosFirst) == None)
  }

  test("nearestCells kernel never returns duplicate cells, even on NaN input") {
    import nelspark.expr.Kernels
    val cent = Array(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f))
    val norms = cent.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
    val ok = Kernels.nearestCells(Array(0.9f, 0.1f), cent, norms, 3)
    assert(ok.toSeq == Seq(0, 1, 2))
    val nan = Kernels.nearestCells(Array(Float.NaN, 1f), cent, norms, 3)
    assert(nan.toSeq.distinct.size == 3, s"duplicate cells: ${nan.toSeq}")
  }

  test("WAV fmt-chunk sample rate parse") {
    assert(MediaOps.parseWavRate(wav(44100)) == Some(44100))
    assert(MediaOps.parseWavRate(wav(8000)) == Some(8000))
    assert(MediaOps.parseWavRate(jpeg(8, 8, appSeg = false)) == None)
  }

  test("decodeMeta uses real parse for recognized headers, stub otherwise") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", png(100, 50)),
      (2L, "image", jpeg(30, 20, appSeg = true)),
      (3L, "audio", wav(16000)),
      (4L, "image", "opaque-unrecognized-bytes".getBytes)
    ).toDF("media_id", "kind", "payload")
    val m = MediaOps.decodeMeta(media).collect().map(x => x.media_id -> x).toMap
    assert((m(1L).width, m(1L).height) == (100, 50))
    assert((m(2L).width, m(2L).height) == (30, 20))
    assert(m(3L).sample_rate == 16000)
    assert(m(4L).width > 0) // stub fallback still deterministic
  }
}
