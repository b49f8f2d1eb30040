package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM BMP codec: 24-bit uncompressed DIB with the classic
  * BITMAPFILEHEADER + BITMAPINFOHEADER layout — the one raster format that
  * needs no native library, which makes it the honest "real codec" for the
  * multimodal pipeline (no stubbed decode): headers are genuinely parsed,
  * row padding and bottom-up row order genuinely handled.
  *
  * Layout (all little-endian):
  *  - file header (14 B): 'BM', file size, 0, 0, pixel-data offset
  *  - info header (40 B): 40, width, height, 1 plane, 24 bpp, no
  *    compression, image size, 2835 ppm × 2, 0, 0
  *  - pixel rows BOTTOM-UP, each row BGR byte triples padded to a 4-byte
  *    boundary
  *
  * `decode` takes an offset so a byte stream of CONCATENATED BMPs (the
  * engine's stand-in for a multi-frame/video container) can be walked
  * frame by frame: each header carries its own file size, so the next
  * frame starts exactly where the previous one ends.
  */
object Bmp {

  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width x $height x 3")
    /** Grayscale samples, row-major top-down: (r+g+b)/3 per pixel. */
    def gray: Array[Int] = {
      val out = new Array[Int](width * height)
      var i = 0
      while (i < out.length) {
        out(i) = ((rgb(3 * i) & 0xff) + (rgb(3 * i + 1) & 0xff) +
          (rgb(3 * i + 2) & 0xff)) / 3
        i += 1
      }
      out
    }
  }

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40

  private def rowSize(width: Int): Int = ((width * 3) + 3) / 4 * 4

  def encodedSize(width: Int, height: Int): Int =
    FileHeaderSize + InfoHeaderSize + rowSize(width) * height

  /** Encode an RGB image (row-major, top-down) as a 24-bit BMP. */
  def encode(img: Image): Array[Byte] = {
    val rs = rowSize(img.width)
    val size = encodedSize(img.width, img.height)
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(size).putInt(0).putInt(FileHeaderSize + InfoHeaderSize)
    buf.putInt(InfoHeaderSize).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(rs * img.height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // rows bottom-up, pixels BGR, rows padded to 4 bytes
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        buf.put(img.rgb(p + 2)).put(img.rgb(p + 1)).put(img.rgb(p))
        x += 1
      }
      var pad = rs - img.width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** True iff `bytes` holds a BMP magic at `offset`. */
  def isBmp(bytes: Array[Byte], offset: Int = 0): Boolean =
    bytes.length >= offset + 2 && bytes(offset) == 'B'.toByte &&
      bytes(offset + 1) == 'M'.toByte

  /** Full-header sniff for payload ROUTING (vs the 2-byte magic): ordinary
    * text can start with "BM" ("BMW…"), so the dispatcher that chooses
    * real-codec-vs-stub must validate the whole 54-byte header shape —
    * declared sizes in range, 40-byte DIB, positive dims, 24 bpp,
    * uncompressed — before committing to the strict decoder. ~14
    * constrained bytes: an accidental text match is implausible.
    */
  def looksLikeBmp(bytes: Array[Byte], offset: Int = 0): Boolean = {
    if (!isBmp(bytes, offset) ||
        bytes.length < offset + FileHeaderSize + InfoHeaderSize) return false
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.position(buf.position() + 2)
    val fileSize = buf.getInt()
    buf.getInt()
    val dataOffset = buf.getInt()
    val infoSize = buf.getInt()
    val width = buf.getInt()
    val height = buf.getInt()
    buf.getShort()
    val bpp = buf.getShort()
    val compression = buf.getInt()
    infoSize == InfoHeaderSize && bpp == 24 && compression == 0 &&
      width > 0 && height > 0 &&
      dataOffset >= FileHeaderSize + InfoHeaderSize &&
      fileSize > 0 && offset + fileSize <= bytes.length &&
      offset.toLong + dataOffset + rowSize(width).toLong * height <= bytes.length
  }

  /** Decode the BMP starting at `offset`; returns the image and the total
    * encoded size (to advance past in a concatenated stream). Fails loudly
    * on anything but the 24-bit uncompressed layout — a silent fallback
    * would masquerade corrupt media as data.
    */
  def decode(bytes: Array[Byte], offset: Int = 0): (Image, Int) = {
    require(isBmp(bytes, offset), "not a BMP (missing 'BM' magic)")
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.position(buf.position() + 2)
    val fileSize = buf.getInt()
    buf.getInt() // reserved
    val dataOffset = buf.getInt()
    val infoSize = buf.getInt()
    require(infoSize >= InfoHeaderSize, s"unsupported DIB header size $infoSize")
    val width = buf.getInt()
    val height = buf.getInt()
    require(width > 0 && height > 0, s"unsupported dimensions ${width}x$height")
    buf.getShort() // planes
    val bpp = buf.getShort()
    require(bpp == 24, s"unsupported bit depth $bpp (24-bit only)")
    val compression = buf.getInt()
    require(compression == 0, s"unsupported compression $compression")
    val rs = rowSize(width)
    require(offset + dataOffset + rs * height <= bytes.length,
      "truncated BMP pixel data")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      // stored bottom-up: file row y is image row (height-1-y)
      val rowStart = offset + dataOffset + y * rs
      val imgRow = height - 1 - y
      var x = 0
      while (x < width) {
        val s = rowStart + x * 3
        val d = (imgRow * width + x) * 3
        rgb(d) = bytes(s + 2)
        rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    (Image(width, height, rgb), fileSize)
  }

  /** Decode every BMP in a concatenated stream, in order. */
  def decodeAll(bytes: Array[Byte]): Seq[Image] = {
    val out = Seq.newBuilder[Image]
    var off = 0
    while (off < bytes.length) {
      val (img, size) = decode(bytes, off)
      out += img
      require(size > 0, "zero-length BMP frame")
      off += size
    }
    out.result()
  }

  /** Nearest-neighbor resize — the dependency-free resample. */
  def resize(img: Image, targetW: Int, targetH: Int): Image = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val rgb = new Array[Byte](targetW * targetH * 3)
    var y = 0
    while (y < targetH) {
      val sy = y * img.height / targetH
      var x = 0
      while (x < targetW) {
        val sx = x * img.width / targetW
        val s = (sy * img.width + sx) * 3
        val d = (y * targetW + x) * 3
        rgb(d) = img.rgb(s); rgb(d + 1) = img.rgb(s + 1); rgb(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(targetW, targetH, rgb)
  }
}
