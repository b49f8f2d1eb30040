package graft.operators

import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal pure-JVM PNG codec — the second real raster codec next to
  * [[Bmp]], covering the format real multimodal corpora are actually
  * dominated by. Everything is JDK-only: zlib via
  * `java.util.zip.{Inflater, Deflater}`, CRCs via `java.util.zip.CRC32`.
  *
  * Supported on DECODE: 8-bit-depth, non-interlaced grayscale (color
  * type 0), truecolor (2), gray+alpha (4) and RGBA (6), with all five
  * scanline filters (None/Sub/Up/Average/Paeth) genuinely unfiltered.
  * Alpha is dropped and gray replicates to RGB, so every decode lands in
  * the same [[Bmp.Image]] RGB surface the rest of the multimodal
  * pipeline operates on. ENCODE writes 8-bit truecolor RGB, filter 0
  * rows, one zlib IDAT. Anything outside that envelope fails loudly —
  * a silent fallback would masquerade corrupt media as data.
  *
  * Like [[Bmp.decode]], `decode` takes an offset and returns the encoded
  * size, so concatenated-PNG streams (the engine's multi-frame stand-in)
  * walk frame by frame; chunk lengths make the frame boundary exact.
  */
object Png {

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** True iff `bytes` holds the 8-byte PNG signature at `offset`. */
  def isPng(bytes: Array[Byte], offset: Int = 0): Boolean =
    bytes.length >= offset + 8 &&
      (0 until 8).forall(i => (bytes(offset + i) & 0xff) == Signature(i))

  /** Full-structure sniff for payload routing (same contract as
    * [[Bmp.looksLikeBmp]]): signature + a well-formed IHDR in the
    * supported envelope. The 8-byte signature alone is already
    * implausible as accidental text, but the dispatcher still validates
    * the header before committing to the strict decoder.
    */
  def looksLikePng(bytes: Array[Byte], offset: Int = 0): Boolean = {
    if (!isPng(bytes, offset) || bytes.length < offset + 8 + 25) return false
    val buf = ByteBuffer.wrap(bytes, offset + 8, 25)
    val len = buf.getInt()
    val typ = new Array[Byte](4); buf.get(typ)
    if (len != 13 || new String(typ, "US-ASCII") != "IHDR") return false
    val width = buf.getInt(); val height = buf.getInt()
    val depth = buf.get() & 0xff; val color = buf.get() & 0xff
    val interlace = { buf.get(); buf.get(); buf.get() & 0xff }
    width > 0 && height > 0 && depth == 8 &&
      (color == 0 || color == 2 || color == 4 || color == 6) &&
      interlace == 0
  }

  private def channels(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 4 => 2
    case 6 => 4
    case c => throw new IllegalArgumentException(
      s"unsupported PNG color type $c (palette/16-bit not supported)")
  }

  /** Decode the PNG starting at `offset`; returns the RGB image and the
    * total encoded size (offset advance for concatenated streams).
    */
  def decode(bytes: Array[Byte], offset: Int = 0): (Bmp.Image, Int) = {
    require(isPng(bytes, offset), "not a PNG (missing signature)")
    var pos = offset + 8
    var width = 0; var height = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= bytes.length, "truncated PNG (chunk header)")
      val buf = ByteBuffer.wrap(bytes, pos, 8)
      val len = buf.getInt()
      require(len >= 0, s"negative chunk length $len")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      require(pos + 12 + len <= bytes.length, s"truncated PNG ($typ data)")
      typ match {
        case "IHDR" =>
          val h = ByteBuffer.wrap(bytes, pos + 8, len)
          width = h.getInt(); height = h.getInt()
          val depth = h.get() & 0xff
          colorType = h.get() & 0xff
          val compression = h.get() & 0xff
          val filterMethod = h.get() & 0xff
          val interlace = h.get() & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require(depth == 8, s"unsupported bit depth $depth (8 only)")
          require(compression == 0 && filterMethod == 0,
            "unsupported compression/filter method")
          require(interlace == 0, "interlaced PNG not supported")
          channels(colorType) // validates the color type
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    require(colorType >= 0, "PNG missing IHDR")
    val ch = channels(colorType)
    val stride = width * ch
    val raw = inflate(idat.toByteArray, (stride + 1) * height)
    // unfilter scanlines in place: each row = 1 filter byte + stride
    val img = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      val out = y * stride
      val prev = out - stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + 1 + x) & 0xff
        val a = if (x >= ch) img(out + x - ch) & 0xff else 0 // left
        val b = if (y > 0) img(prev + x) & 0xff else 0 // up
        val c = if (x >= ch && y > 0) img(prev + x - ch) & 0xff else 0
        val rec = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => cur + paeth(a, b, c)
          case f => throw new IllegalArgumentException(s"bad filter $f")
        }
        img(out + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // to RGB: replicate gray, drop alpha
    val rgb = new Array[Byte](width * height * 3)
    var i = 0
    while (i < width * height) {
      val s = i * ch
      colorType match {
        case 0 | 4 =>
          rgb(3 * i) = img(s); rgb(3 * i + 1) = img(s); rgb(3 * i + 2) = img(s)
        case 2 | 6 =>
          rgb(3 * i) = img(s); rgb(3 * i + 1) = img(s + 1); rgb(3 * i + 2) = img(s + 2)
      }
      i += 1
    }
    (Bmp.Image(width, height, rgb), pos - offset)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      require(n > 0 || inf.finished(),
        "truncated or corrupt PNG pixel stream")
      off += n
    }
    inf.end()
    require(off == expected,
      s"PNG pixel stream: got $off bytes, expected $expected")
    out
  }

  /** Encode an RGB image as an 8-bit truecolor PNG (filter 0 rows, one
    * zlib IDAT). Deterministic for a fixed JDK deflate implementation.
    */
  def encode(img: Bmp.Image): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // filter byte 0 then the row verbatim
      System.arraycopy(img.rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION)
    def_.setInput(raw); def_.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!def_.finished()) zbuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val z = zbuf.toByteArray
    val out = ByteBuffer.allocate(8 + 25 + (12 + z.length) + 12)
    Signature.foreach(b => out.put(b.toByte))
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    putChunk(out, "IHDR", ihdr.array())
    putChunk(out, "IDAT", z)
    putChunk(out, "IEND", Array.emptyByteArray)
    out.array()
  }

  private def putChunk(out: ByteBuffer, typ: String, data: Array[Byte]): Unit = {
    out.putInt(data.length)
    val t = typ.getBytes("US-ASCII")
    out.put(t).put(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.putInt(crc.getValue.toInt)
    ()
  }

  /** Decode every PNG in a concatenated stream, in order. */
  def decodeAll(bytes: Array[Byte]): Seq[Bmp.Image] = {
    val out = Seq.newBuilder[Bmp.Image]
    var off = 0
    while (off < bytes.length) {
      val (img, size) = decode(bytes, off)
      out += img
      require(size > 0, "zero-length PNG frame")
      off += size
    }
    out.result()
  }
}
