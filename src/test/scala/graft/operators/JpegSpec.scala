package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the baseline JPEG codec: round-trip fidelity within quantization
  * error for 4:4:4, 4:2:0 and grayscale, exact dimensions, marker-level
  * structure, concatenated-stream walking, and loud rejection of
  * everything outside the baseline envelope.
  */
class JpegSpec extends AnyFunSuite {

  /** Smooth deterministic test card: horizontal R ramp, vertical G ramp,
    * diagonal B ramp — low-frequency content, so quality-75 quantization
    * error stays small and bounded.
    */
  private def ramp(w: Int, h: Int): Bmp.Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      rgb(o) = (x * 255 / math.max(1, w - 1)).toByte
      rgb(o + 1) = (y * 255 / math.max(1, h - 1)).toByte
      rgb(o + 2) = ((x + y) * 255 / math.max(1, w + h - 2)).toByte
    }
    Bmp.Image(w, h, rgb)
  }

  private def meanAbsErr(a: Bmp.Image, b: Bmp.Image): Double = {
    require(a.width == b.width && a.height == b.height)
    a.rgb.indices.map(i => math.abs((a.rgb(i) & 0xff) - (b.rgb(i) & 0xff)))
      .sum.toDouble / a.rgb.length
  }

  test("4:4:4 round trip: exact dims, small quantization error") {
    val img = ramp(37, 23) // deliberately not multiples of 8
    val bytes = Jpeg.encode(img)
    assert(Jpeg.looksLikeJpeg(bytes))
    val (dec, size) = Jpeg.decode(bytes)
    assert(size == bytes.length)
    assert(dec.width == 37 && dec.height == 23)
    val mae = meanAbsErr(img, dec)
    assert(mae < 4.0, s"4:4:4 mean abs error $mae")
  }

  test("4:2:0 round trip: subsampled chroma reconstructs within tolerance") {
    val img = ramp(40, 32)
    val bytes = Jpeg.encode(img, subsample420 = true)
    val (dec, size) = Jpeg.decode(bytes)
    assert(size == bytes.length)
    assert(dec.width == 40 && dec.height == 32)
    val mae = meanAbsErr(img, dec)
    // chroma is quarter-resolution: looser bound than 4:4:4, still tight
    // on a smooth ramp
    assert(mae < 6.0, s"4:2:0 mean abs error $mae")
    // and 4:2:0 genuinely spends fewer bytes than 4:4:4 on the same image
    assert(bytes.length < Jpeg.encode(img).length)
  }

  test("grayscale single-component decode path") {
    val img = ramp(16, 16)
    val bytes = Jpeg.encodeGray(img)
    val (dec, size) = Jpeg.decode(bytes)
    assert(size == bytes.length)
    assert(dec.width == 16 && dec.height == 16)
    // decoded gray replicates to RGB: channels equal
    for (i <- 0 until 16 * 16) {
      assert(dec.rgb(3 * i) == dec.rgb(3 * i + 1) &&
        dec.rgb(3 * i + 1) == dec.rgb(3 * i + 2))
    }
    // luma of the ramp ≈ decoded gray
    val g = img.gray
    val err = (0 until 16 * 16)
      .map(i => math.abs(g(i) - (dec.rgb(3 * i) & 0xff))).sum.toDouble / (16 * 16)
    assert(err < 4.0, s"gray mean abs error $err")
  }

  test("marker structure: SOI first, EOI last, expected segments present") {
    val bytes = Jpeg.encode(ramp(8, 8))
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    assert((bytes(bytes.length - 2) & 0xff) == 0xff &&
      (bytes(bytes.length - 1) & 0xff) == 0xd9)
    def hasMarker(m: Int): Boolean =
      bytes.indices.dropRight(1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)
    assert(hasMarker(0xe0), "missing APP0/JFIF")
    assert(hasMarker(0xdb), "missing DQT")
    assert(hasMarker(0xc0), "missing SOF0")
    assert(hasMarker(0xc4), "missing DHT")
    assert(hasMarker(0xda), "missing SOS")
  }

  test("concatenated streams decode frame by frame") {
    val a = ramp(17, 9); val b = ramp(8, 8); val c = ramp(24, 16)
    val stream = Array.concat(Jpeg.encode(a), Jpeg.encode(b, subsample420 = true),
      Jpeg.encodeGray(c))
    val frames = Jpeg.decodeAll(stream)
    assert(frames.map(f => (f.width, f.height)) ==
      Seq((17, 9), (8, 8), (24, 16)))
  }

  test("loud rejection outside the baseline envelope") {
    val good = Jpeg.encode(ramp(8, 8))
    // progressive: flip SOF0 (0xc0) to SOF2 (0xc2)
    val prog = good.clone()
    val sof = prog.indices.dropRight(1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assertThrows[IllegalArgumentException](Jpeg.decode(prog))
    // truncation inside entropy data
    assertThrows[IllegalArgumentException](
      Jpeg.decode(good.take(good.length - 10)))
    // not a JPEG at all
    assertThrows[IllegalArgumentException](
      Jpeg.decode("definitely text".getBytes("UTF-8")))
  }

  test("spec-legal variations decode: fill bytes, TEM, gray with 2x2 sampling") {
    val base = Jpeg.encodeGray(ramp(16, 16))
    val reference = Jpeg.decode(base)._1
    def findMarker(bs: Array[Byte], m: Int): Int =
      bs.indices.dropRight(1).find(i =>
        (bs(i) & 0xff) == 0xff && (bs(i + 1) & 0xff) == m).get
    def insertAt(bs: Array[Byte], at: Int, ins: Array[Byte]): Array[Byte] =
      bs.take(at) ++ ins ++ bs.drop(at)
    // 0xFF fill bytes before a marker (T.81 B.1.1.2)
    val dht = findMarker(base, 0xc4)
    val filled = insertAt(base, dht, Array(0xff.toByte, 0xff.toByte))
    assert(Jpeg.decode(filled)._1.rgb.sameElements(reference.rgb))
    assert(Jpeg.decode(filled)._2 == filled.length)
    // a stray length-less TEM marker between segments
    val dqt = findMarker(base, 0xdb)
    val temmed = insertAt(base, dqt, Array(0xff.toByte, 0x01.toByte))
    assert(Jpeg.decode(temmed)._1.rgb.sameElements(reference.rgb))
    // grayscale declaring 2x2 sampling: a 1-component scan is
    // NON-interleaved per T.81 A.2.3 — the declared factors must not
    // change the decode (interleaved reading would desync Huffman)
    val sof = findMarker(base, 0xc0)
    val sampOff = sof + 2 + 2 + 6 + 1 // marker, len, prec+dims+nc, comp id
    assert((base(sampOff) & 0xff) == 0x11)
    val gray22 = base.clone()
    gray22(sampOff) = 0x22.toByte
    assert(Jpeg.decode(gray22)._1.rgb.sameElements(reference.rgb))
  }

  test("frame missing its EOI fails loudly instead of eating the next frame") {
    // drop frame A's EOI and concatenate frame B: after A's entropy data
    // the decoder sees B's SOI (FF D8), not EOI (FF D9). Scanning forward
    // to "find" an EOI would silently consume all of B and drop a frame;
    // the codec must throw instead.
    val a = Jpeg.encode(ramp(8, 8))
    val b = Jpeg.encode(ramp(16, 8))
    val glued = Array.concat(a.take(a.length - 2), b)
    val e = intercept[IllegalArgumentException](Jpeg.decodeAll(glued))
    assert(e.getMessage.contains("EOI"), s"unexpected error: ${e.getMessage}")
  }

  test("truncated DQT/DHT tables fail with a descriptive error") {
    def findMarker(bs: Array[Byte], m: Int): Int =
      bs.indices.dropRight(1).find(i =>
        (bs(i) & 0xff) == 0xff && (bs(i + 1) & 0xff) == m).get
    // shrink the DQT segment's declared length so the (single) 65-byte
    // table no longer fits: the multi-table loop must bound-check
    // against segEnd, not read into the following segment
    val good = Jpeg.encode(ramp(8, 8))
    val dqt = findMarker(good, 0xdb)
    val badDqt = good.clone()
    badDqt(dqt + 3) = (badDqt(dqt + 3) - 1).toByte // low byte of segLen
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(badDqt))
    assert(e1.getMessage.contains("DQT"), s"unexpected error: ${e1.getMessage}")
    // same for DHT: shrink so the declared code counts overflow segEnd
    val dht = findMarker(good, 0xc4)
    val badDht = good.clone()
    badDht(dht + 3) = (badDht(dht + 3) - 1).toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(badDht))
    assert(e2.getMessage.contains("DHT"), s"unexpected error: ${e2.getMessage}")
  }

  test("JPEG payloads route through the shared RGB surface like BMP/PNG") {
    val img = ramp(32, 8)
    val viaJpeg = Jpeg.decode(Jpeg.encode(img))._1
    val viaPng = Png.decode(Png.encode(img))._1
    assert(viaJpeg.width == viaPng.width && viaJpeg.height == viaPng.height)
    // PNG is lossless; JPEG must stay close to it
    assert(meanAbsErr(viaJpeg, viaPng) < 4.0)
  }
}
