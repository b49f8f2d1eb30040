package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM PNG codec: encode/decode round-trip exactness, all five
  * scanline filters on decode, gray/alpha color-type handling,
  * concatenated-stream walking, loud rejection outside the envelope,
  * and the Multimodal PNG↔BMP pipeline equivalence.
  */
class PngSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def img(w: Int, h: Int, seed: Int = 7): Bmp.Image =
    Bmp.Image(w, h, Array.tabulate[Byte](w * h * 3)(i => ((i * seed + 13) % 251).toByte))

  test("encode/decode round-trip is pixel-exact") {
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8), (17, 5))) {
      val src = img(w, h)
      val bytes = Png.encode(src)
      assert(Png.isPng(bytes) && Png.looksLikePng(bytes))
      val (back, size) = Png.decode(bytes)
      assert(size == bytes.length)
      assert(back.width == w && back.height == h)
      assert(back.rgb.sameElements(src.rgb))
    }
  }

  // hand-build a PNG with a chosen per-row filter to exercise unfiltering
  private def buildFiltered(w: Int, h: Int, ch: Int, colorType: Int,
                            filterOf: Int => Int,
                            pix: Array[Byte]): Array[Byte] = {
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    // apply the filter FORWARD (encoder side) so decode must invert it
    val flat = pix.clone()
    var y = 0
    while (y < h) {
      val f = filterOf(y)
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = flat(y * stride + x) & 0xff
        val a = if (x >= ch) flat(y * stride + x - ch) & 0xff else 0
        val b = if (y > 0) flat((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) flat((y - 1) * stride + x - ch) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur - pred
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zb.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zb.toByteArray
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + z.length + 12)
    Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .foreach(b => out.put(b.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val t = typ.getBytes("US-ASCII")
      out.put(t).put(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.putInt(crc.getValue.toInt); ()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array()); chunk("IDAT", z); chunk("IEND", Array.emptyByteArray)
    out.array()
  }

  test("all five scanline filters unfilter correctly") {
    val w = 6; val h = 5
    val pix = Array.tabulate[Byte](w * h * 3)(i => ((i * 31 + 5) % 256).toByte)
    for (f <- 0 to 4) {
      val bytes = buildFiltered(w, h, 3, 2, _ => f, pix)
      val (back, _) = Png.decode(bytes)
      assert(back.rgb.sameElements(pix), s"filter $f")
    }
    // mixed filters per row
    val mixed = buildFiltered(w, h, 3, 2, y => y % 5, pix)
    assert(Png.decode(mixed)._1.rgb.sameElements(pix))
  }

  test("grayscale and alpha color types land on the RGB surface") {
    val w = 4; val h = 3
    val gray = Array.tabulate[Byte](w * h)(i => (i * 20).toByte)
    val (g, _) = Png.decode(buildFiltered(w, h, 1, 0, _ => 0, gray))
    assert((0 until w * h).forall(i =>
      g.rgb(3 * i) == gray(i) && g.rgb(3 * i + 1) == gray(i) &&
        g.rgb(3 * i + 2) == gray(i)))
    // RGBA: alpha byte dropped
    val rgba = Array.tabulate[Byte](w * h * 4)(i => (i * 7).toByte)
    val (c, _) = Png.decode(buildFiltered(w, h, 4, 6, _ => 0, rgba))
    assert((0 until w * h).forall(i =>
      c.rgb(3 * i) == rgba(4 * i) && c.rgb(3 * i + 1) == rgba(4 * i + 1) &&
        c.rgb(3 * i + 2) == rgba(4 * i + 2)))
  }

  test("concatenated PNG stream decodes frame by frame") {
    val frames = Seq(img(3, 2, 3), img(5, 4, 11), img(2, 2, 29))
    val stream = Array.concat(frames.map(Png.encode): _*)
    val back = Png.decodeAll(stream)
    assert(back.map(f => (f.width, f.height)) == Seq((3, 2), (5, 4), (2, 2)))
    back.zip(frames).foreach { case (b, f) => assert(b.rgb.sameElements(f.rgb)) }
  }

  test("rejects junk, truncation, and unsupported shapes loudly") {
    intercept[IllegalArgumentException](Png.decode("not a png at all".getBytes))
    val good = Png.encode(img(4, 4))
    intercept[IllegalArgumentException](Png.decode(good.take(20)))
    assert(!Png.looksLikePng("text payload".getBytes))
    // 16-bit depth must be rejected, not mis-decoded
    val bad16 = good.clone()
    bad16(8 + 8 + 8) = 16.toByte // IHDR bit-depth byte
    intercept[IllegalArgumentException](Png.decode(bad16))
  }

  test("PNG pipeline decodes identically to the BMP pipeline") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(12)
    val viaBmp = Multimodal.decodeFrames(
        Multimodal.withBmpPayload(docs, "doc_id", "text"), "doc_id")
      .orderBy("id", "frame_no").collect().toSeq
    val viaPng = Multimodal.decodeFrames(
        Multimodal.withPngPayload(docs, "doc_id", "text"), "doc_id")
      .orderBy("id", "frame_no").collect().toSeq
    assert(viaPng == viaBmp) // same frames, same pixels, different container
  }

  test("resize preserves the PNG container and refreshes metadata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(8)
    val resized = Multimodal.resizeImages(
      Multimodal.withPngPayload(docs, "doc_id", "text"), "doc_id", 6, 4)
    val mt = resized.select("meta.media_type").distinct().as[String].collect()
    assert(mt.sameElements(Array("image/png;resized=6x4")))
    val back = Multimodal.decodeFrames(resized, "doc_id")
    assert(back.filter(
      org.apache.spark.sql.functions.col("width") =!= 6 ||
        org.apache.spark.sql.functions.col("height") =!= 4).count() == 0)
  }
}
