package graft.operators

/** Minimal pure-JVM baseline JPEG codec — the third real raster codec
  * next to [[Bmp]] and [[Png]], covering the format that dominates real
  * web-crawl image payloads. JDK-only, no native/image libraries.
  *
  * Supported on DECODE: baseline sequential DCT (SOF0), 8-bit samples,
  * 1-component grayscale or 3-component YCbCr with any sampling factors
  * up to 2×2 (4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT per segment,
  * restart intervals (DRI + RSTn). Progressive (SOF2), arithmetic
  * coding, and 12-bit precision fail loudly — a silent fallback would
  * masquerade corrupt media as data.
  *
  * ENCODE writes baseline JFIF at quality 75 (Annex-K tables, IJG
  * scaling): 3-component 4:4:4 or 4:2:0, or single-component grayscale —
  * enough to exercise every decode path (including subsampled chroma
  * reconstruction) without any external encoder in the loop.
  *
  * Like [[Bmp.decode]]/[[Png.decode]], `decode` takes an offset and
  * returns the encoded size, so concatenated-JPEG streams walk frame by
  * frame; the marker structure makes the boundary exact. Everything
  * lands on the shared [[Bmp.Image]] RGB surface.
  *
  * All table data (zigzag order, Annex-K quantization and Huffman
  * specifications) is from the public JPEG standard (ITU-T T.81).
  */
object Jpeg {

  /** True iff `bytes` holds the SOI marker + a following marker prefix. */
  def isJpeg(bytes: Array[Byte], offset: Int = 0): Boolean =
    bytes.length >= offset + 3 &&
      (bytes(offset) & 0xff) == 0xff && (bytes(offset + 1) & 0xff) == 0xd8 &&
      (bytes(offset + 2) & 0xff) == 0xff

  /** Payload-routing sniff (same contract as [[Png.looksLikePng]]):
    * SOI + next marker byte. Three structural bytes are already
    * implausible as accidental text; the strict decoder validates the
    * rest before committing.
    */
  def looksLikeJpeg(bytes: Array[Byte], offset: Int = 0): Boolean =
    isJpeg(bytes, offset)

  // ------------------------------------------------------------ tables

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val BaseQLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val BaseQChr: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** IJG quality scaling at Q=75 (scale factor 50). Natural (row-major)
    * order; zigzagged at emit time.
    */
  private def scaledTable(base: Array[Int]): Array[Int] =
    base.map(q => math.max(1, math.min(255, (q * 50 + 50) / 100)))

  private val QLum: Array[Int] = scaledTable(BaseQLum)
  private val QChr: Array[Int] = scaledTable(BaseQChr)

  // Annex-K Huffman specifications: (bits per code length 1..16, values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman code assignment from a (bits, vals) spec —
    * shared by the encode table and the decode table so both sides are
    * definitionally consistent. Returns (code, length) per value index.
    */
  private def canonicalCodes(bits: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = Array.newBuilder[Int]
    val lens = Array.newBuilder[Int]
    var code = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { codes += code; lens += l; code += 1; i += 1 }
      code <<= 1
      l += 1
    }
    (codes.result(), lens.result())
  }

  /** Encoder-side table: value (huffman symbol) → (code, bit length). */
  private final class EncTable(bits: Array[Int], vals: Array[Byte]) {
    private val (codes, lens) = canonicalCodes(bits)
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    vals.indices.foreach { i =>
      codeOf(vals(i) & 0xff) = codes(i)
      lenOf(vals(i) & 0xff) = lens(i)
    }
  }

  /** Decoder-side table: classic mincode/maxcode/valptr per bit length. */
  private final class DecTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values = vals
    locally {
      var code = 0
      var p = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = p
        minCode(l) = code
        code += bits(l); p += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private val EncDcLum = new EncTable(DcLumBits, DcLumVals)
  private val EncDcChr = new EncTable(DcChrBits, DcChrVals)
  private val EncAcLum = new EncTable(AcLumBits, AcLumVals)
  private val EncAcChr = new EncTable(AcChrBits, AcChrVals)

  // cos((2x+1)·u·π/16) and the C(u) normalization, shared by FDCT/IDCT
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ------------------------------------------------------------ encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s per the standard
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  private def clamp255(v: Double): Int =
    math.max(0, math.min(255, math.round(v).toInt))

  /** Forward DCT + quantization of one level-shifted 8×8 block (natural
    * order in, natural order out).
    */
  private def fdctQuant(block: Array[Double], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) * CosT(x)(u) * CosT(y)(v)
            y += 1
          }
          x += 1
        }
        val f = 0.25 * C(u) * C(v) * s
        out(v * 8 + u) = math.round(f / q(v * 8 + u)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** Magnitude category (bit size) of a DC diff / AC coefficient. */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode one quantized block: DC diff then AC run-lengths. Returns
    * the new DC predictor.
    */
  private def writeBlock(w: BitWriter, coef: Array[Int], dcPred: Int,
                         dc: EncTable, ac: EncTable): Int = {
    val diff = coef(0) - dcPred
    val dcCat = category(diff)
    w.put(dc.codeOf(dcCat), dc.lenOf(dcCat))
    if (dcCat > 0) {
      val bits = if (diff < 0) diff + (1 << dcCat) - 1 else diff
      w.put(bits, dcCat)
    }
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { w.put(ac.codeOf(0xf0), ac.lenOf(0xf0)); run -= 16 }
        val cat = category(v)
        val sym = (run << 4) | cat
        w.put(ac.codeOf(sym), ac.lenOf(sym))
        val bits = if (v < 0) v + (1 << cat) - 1 else v
        w.put(bits, cat)
        run = 0
      }
      k += 1
    }
    if (run > 0) w.put(ac.codeOf(0x00), ac.lenOf(0x00)) // EOB
    coef(0)
  }

  /** Sample an 8×8 block from a component plane with edge replication,
    * level-shifted to [-128, 127].
    */
  private def takeBlock(plane: Array[Int], w: Int, h: Int,
                        x0: Int, y0: Int): Array[Double] = {
    val b = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(h - 1, y0 + y)
      var x = 0
      while (x < 8) {
        val sx = math.min(w - 1, x0 + x)
        b(y * 8 + x) = plane(sy * w + sx) - 128.0
        x += 1
      }
      y += 1
    }
    b
  }

  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }

  private def segment(out: java.io.ByteArrayOutputStream, m: Int,
                      payload: Array[Int]): Unit = {
    marker(out, m)
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    payload.foreach(b => out.write(b & 0xff))
  }

  private def dhtPayload(tc: Int, th: Int, bits: Array[Int],
                         vals: Array[Byte]): Array[Int] =
    Array((tc << 4) | th) ++ (1 to 16).map(bits(_)) ++ vals.map(_ & 0xff)

  /** Encode an RGB image as baseline JFIF (quality 75). `subsample420`
    * selects 4:2:0 chroma (2×2-average downsample) vs 4:4:4.
    */
  def encode(img: Bmp.Image, subsample420: Boolean = false): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0, "empty image")
    val n = w * h
    val yP = new Array[Int](n); val cbP = new Array[Int](n); val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = img.rgb(3 * i) & 0xff
      val g = img.rgb(3 * i + 1) & 0xff
      val b = img.rgb(3 * i + 2) & 0xff
      yP(i) = clamp255(0.299 * r + 0.587 * g + 0.114 * b)
      cbP(i) = clamp255(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
      crP(i) = clamp255(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
      i += 1
    }
    val (cw, ch2, cb2, cr2) =
      if (!subsample420) (w, h, cbP, crP)
      else {
        val cw = (w + 1) / 2; val ch = (h + 1) / 2
        val db = new Array[Int](cw * ch); val dr = new Array[Int](cw * ch)
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            var sb = 0; var sr = 0; var cnt = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val sy = 2 * cy + dy; val sx = 2 * cx + dx
                if (sy < h && sx < w) { sb += cbP(sy * w + sx); sr += crP(sy * w + sx); cnt += 1 }
                dx += 1
              }
              dy += 1
            }
            db(cy * cw + cx) = (sb + cnt / 2) / cnt
            dr(cy * cw + cx) = (sr + cnt / 2) / cnt
            cx += 1
          }
          cy += 1
        }
        (cw, ch, db, dr)
      }

    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    segment(out, 0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    segment(out, 0xdb, Array(0x00) ++ Zigzag.map(QLum(_)))
    segment(out, 0xdb, Array(0x01) ++ Zigzag.map(QChr(_)))
    val hs = if (subsample420) 2 else 1
    segment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 3, 1, (hs << 4) | hs, 0, 2, 0x11, 1, 3, 0x11, 1))
    segment(out, 0xc4, dhtPayload(0, 0, DcLumBits, DcLumVals))
    segment(out, 0xc4, dhtPayload(1, 0, AcLumBits, AcLumVals))
    segment(out, 0xc4, dhtPayload(0, 1, DcChrBits, DcChrVals))
    segment(out, 0xc4, dhtPayload(1, 1, AcChrBits, AcChrVals))
    segment(out, 0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw = new BitWriter(out)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    val mcuPix = 8 * hs
    val mcusX = (w + mcuPix - 1) / mcuPix
    val mcusY = (h + mcuPix - 1) / mcuPix
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < hs) {
          var bx = 0
          while (bx < hs) {
            dcY = writeBlock(bw, fdctQuant(takeBlock(yP, w, h,
              mx * mcuPix + bx * 8, my * mcuPix + by * 8), QLum),
              dcY, EncDcLum, EncAcLum)
            bx += 1
          }
          by += 1
        }
        dcCb = writeBlock(bw, fdctQuant(takeBlock(cb2, cw, ch2,
          mx * 8, my * 8), QChr), dcCb, EncDcChr, EncAcChr)
        dcCr = writeBlock(bw, fdctQuant(takeBlock(cr2, cw, ch2,
          mx * 8, my * 8), QChr), dcCr, EncDcChr, EncAcChr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** Encode as single-component grayscale baseline JFIF (quality 75) —
    * exists chiefly so the 1-component decode path has a self-contained
    * exerciser.
    */
  def encodeGray(img: Bmp.Image): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0, "empty image")
    val g = img.gray
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8)
    segment(out, 0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    segment(out, 0xdb, Array(0x00) ++ Zigzag.map(QLum(_)))
    segment(out, 0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff,
      w & 0xff, 1, 1, 0x11, 0))
    segment(out, 0xc4, dhtPayload(0, 0, DcLumBits, DcLumVals))
    segment(out, 0xc4, dhtPayload(1, 0, AcLumBits, AcLumVals))
    segment(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    var dc = 0
    val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        dc = writeBlock(bw, fdctQuant(takeBlock(g, w, h, mx * 8, my * 8),
          QLum), dc, EncDcLum, EncAcLum)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(out, 0xd9)
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Entropy-segment bit reader: unstuffs 0xFF00, surfaces RSTn, and
    * refuses to run past a true marker.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0

    def readBit(): Int = {
      if (nBits == 0) {
        require(pos < bytes.length, "truncated JPEG entropy data")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated JPEG entropy data")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else {
            // true marker mid-entropy: the stream is damaged
            throw new IllegalArgumentException(
              f"unexpected marker 0xff$m%02x inside entropy data")
          }
          b = 0xff
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nBits = 0
      require(pos + 1 < bytes.length, "truncated JPEG (restart)")
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + expected),
        f"expected RST$expected, got 0x${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      pos += 2
    }

    def align(): Unit = { nBits = 0 }
  }

  private def decodeHuff(br: BitReader, t: DecTable): Int = {
    var code = br.readBit()
    var l = 1
    while (code > t.maxCode(l)) {
      code = (code << 1) | br.readBit()
      l += 1
      require(l <= 16, "invalid Huffman code in JPEG stream")
    }
    t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, tq: Int) {
    var dcTable: DecTable = null
    var acTable: DecTable = null
    var plane: Array[Int] = null // padded to full MCU coverage
    var planeW: Int = 0
    var planeH: Int = 0
    var dcPred: Int = 0
  }

  /** Decode the JPEG starting at `offset`; returns the RGB image and the
    * total encoded size (offset advance for concatenated streams).
    */
  def decode(bytes: Array[Byte], offset: Int = 0): (Bmp.Image, Int) = {
    require(isJpeg(bytes, offset), "not a JPEG (missing SOI)")
    var pos = offset + 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[DecTable](4)
    val acTables = new Array[DecTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var sosSeen = false

    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    while (!sosSeen) {
      require(pos + 2 <= bytes.length, "truncated JPEG (marker)")
      require((bytes(pos) & 0xff) == 0xff,
        f"bad marker alignment at $pos: 0x${bytes(pos) & 0xff}%02x")
      // any number of 0xFF FILL bytes may precede the marker code
      // (T.81 B.1.1.2) — some encoders pad with them
      var mp = pos + 1
      while (mp < bytes.length && (bytes(mp) & 0xff) == 0xff) mp += 1
      require(mp < bytes.length, "truncated JPEG (marker)")
      val m = bytes(mp) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        // length-less markers (TEM, stray RSTn): no segment to read
        pos = mp + 1
      } else {
      require(mp + 3 <= bytes.length, "truncated JPEG (segment length)")
      val segLen = u16(mp + 1)
      val body = mp + 3
      val segEnd = mp + 1 + segLen
      require(segEnd <= bytes.length, f"truncated JPEG segment 0x$m%02x")
      m match {
        case 0xdb => // DQT: one or more tables
          var p = body
          while (p < segEnd) {
            require(p + 65 <= segEnd, "truncated DQT table")
            val pq = (bytes(p) >> 4) & 0x0f
            val tq = bytes(p) & 0x0f
            require(pq == 0, "12/16-bit quantization tables not supported")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
            qTables(tq) = t
            p += 65
          }
        case 0xc0 | 0xc1 => // baseline / extended sequential SOF
          require((bytes(body) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(body + 1); width = u16(body + 3)
          val nc = bytes(body + 5) & 0xff
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.tabulate(nc) { c =>
            val p = body + 6 + 3 * c
            // a SINGLE-component scan is non-interleaved per T.81 A.2.3:
            // its MCU is ONE data unit regardless of the declared
            // sampling factors (they only scale components against each
            // other) — decoding a 2×2-declared grayscale interleaved
            // would desync the Huffman stream on a valid file
            val comp =
              if (nc == 1) Component(bytes(p) & 0xff, 1, 1, bytes(p + 2) & 0x0f)
              else Component(bytes(p) & 0xff,
                (bytes(p + 1) >> 4) & 0x0f, bytes(p + 1) & 0x0f,
                bytes(p + 2) & 0x0f)
            require(comp.hSamp >= 1 && comp.hSamp <= 2 &&
              comp.vSamp >= 1 && comp.vSamp <= 2,
              s"unsupported sampling ${comp.hSamp}x${comp.vSamp}")
            comp
          }
        case 0xc2 =>
          throw new IllegalArgumentException("progressive JPEG not supported")
        case c if c >= 0xc3 && c <= 0xcf && c != 0xc4 && c != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported SOF type 0x$c%02x (baseline only)")
        case 0xc4 => // DHT: one or more tables
          var p = body
          while (p < segEnd) {
            require(p + 17 <= segEnd, "truncated DHT table header")
            val tc = (bytes(p) >> 4) & 0x0f
            val th = bytes(p) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = bytes(p + l) & 0xff; total += bits(l); l += 1 }
            require(p + 17 + total <= segEnd, "truncated DHT table values")
            val vals = new Array[Byte](total)
            System.arraycopy(bytes, p + 17, vals, 0, total)
            val t = new DecTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + total
          }
        case 0xdd =>
          restartInterval = u16(body)
        case 0xd9 =>
          throw new IllegalArgumentException("JPEG ended before SOS")
        case 0xda =>
          val ns = bytes(body) & 0xff
          require(comps != null, "SOS before SOF")
          require(ns == comps.length, "partial scans not supported")
          var c = 0
          while (c < ns) {
            val cid = bytes(body + 1 + 2 * c) & 0xff
            val tsel = bytes(body + 2 + 2 * c) & 0xff
            val comp = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS references unknown component $cid"))
            comp.dcTable = dcTables((tsel >> 4) & 0x0f)
            comp.acTable = acTables(tsel & 0x0f)
            require(comp.dcTable != null && comp.acTable != null,
              "SOS references undefined Huffman table")
            c += 1
          }
          sosSeen = true
        case _ => () // APPn / COM / other ancillary segments skipped
      }
      pos = segEnd // for SOS this lands exactly on the entropy data
      }
    }

    require(width > 0 && height > 0, "bad dimensions")
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.hSamp * 8
      c.planeH = mcusY * c.vSamp * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      require(qTables(c.tq) != null, s"component ${c.id} references undefined DQT ${c.tq}")
    }

    val br = new BitReader(bytes, pos)
    val coef = new Array[Int](64)
    val pixels = new Array[Double](64)
    var rstIndex = 0
    var mcusSinceRestart = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          br.restart(rstIndex)
          rstIndex = (rstIndex + 1) % 8
          mcusSinceRestart = 0
          comps.foreach(_.dcPred = 0)
        }
        comps.foreach { comp =>
          val q = qTables(comp.tq)
          var by = 0
          while (by < comp.vSamp) {
            var bx = 0
            while (bx < comp.hSamp) {
              java.util.Arrays.fill(coef, 0)
              val dcCat = decodeHuff(br, comp.dcTable)
              comp.dcPred += extend(br.receive(dcCat), dcCat)
              coef(0) = comp.dcPred
              var k = 1
              while (k < 64) {
                val sym = decodeHuff(br, comp.acTable)
                if (sym == 0x00) k = 64 // EOB
                else if (sym == 0xf0) k += 16 // ZRL
                else {
                  k += (sym >> 4) & 0x0f
                  require(k < 64, "AC coefficient index overrun")
                  val cat = sym & 0x0f
                  coef(Zigzag(k)) = extend(br.receive(cat), cat)
                  k += 1
                }
              }
              // dequantize + IDCT into the component plane
              var x = 0
              while (x < 8) {
                var y = 0
                while (y < 8) {
                  var s = 0.0
                  var u = 0
                  while (u < 8) {
                    var v = 0
                    while (v < 8) {
                      s += C(u) * C(v) * coef(v * 8 + u) * q(v * 8 + u) *
                        CosT(x)(u) * CosT(y)(v)
                      v += 1
                    }
                    u += 1
                  }
                  pixels(y * 8 + x) = 0.25 * s + 128.0
                  y += 1
                }
                x += 1
              }
              val px0 = (mx * comp.hSamp + bx) * 8
              val py0 = (my * comp.vSamp + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  comp.plane((py0 + yy) * comp.planeW + px0 + xx) =
                    clamp255(pixels(yy * 8 + xx))
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
        }
        mcusSinceRestart += 1
        mx += 1
      }
      my += 1
    }
    br.align()
    pos = br.pos
    // entropy data may be followed only by 0xFF FILL bytes (T.81
    // B.1.1.2) — plus at most one stuffed 0x00 the bit reader left
    // unconsumed — before EOI. Anything else is a corrupt or missing
    // EOI and must fail loudly: skipping arbitrary bytes here would,
    // in a concatenated stream, silently consume the next frame up to
    // ITS EOI and drop a frame.
    if (pos < bytes.length && (bytes(pos) & 0xff) == 0x00) pos += 1
    while (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
      (bytes(pos + 1) & 0xff) == 0xff) pos += 1
    require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
      (bytes(pos + 1) & 0xff) == 0xd9, "missing EOI after entropy data")
    pos += 2

    // reconstruct RGB: upsample chroma by sample replication
    val rgb = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = c.plane(y * c.planeW + x).toByte
          val o = 3 * (y * width + x)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = cy.plane((y * cy.vSamp / vMax) * cy.planeW + (x * cy.hSamp / hMax)).toDouble
          val bv = cb.plane((y * cb.vSamp / vMax) * cb.planeW + (x * cb.hSamp / hMax)) - 128.0
          val rv = cr.plane((y * cr.vSamp / vMax) * cr.planeW + (x * cr.hSamp / hMax)) - 128.0
          val o = 3 * (y * width + x)
          rgb(o) = clamp255(yv + 1.402 * rv).toByte
          rgb(o + 1) = clamp255(yv - 0.344136 * bv - 0.714136 * rv).toByte
          rgb(o + 2) = clamp255(yv + 1.772 * bv).toByte
          x += 1
        }
        y += 1
      }
    }
    (Bmp.Image(width, height, rgb), pos - offset)
  }

  /** Decode every JPEG in a concatenated stream, in order. */
  def decodeAll(bytes: Array[Byte]): Seq[Bmp.Image] = {
    val out = Seq.newBuilder[Bmp.Image]
    var off = 0
    while (off < bytes.length) {
      val (img, size) = decode(bytes, off)
      out += img
      require(size > 0, "zero-length JPEG frame")
      off += size
    }
    out.result()
  }
}
