package graft.operators

/** Minimal pure-JVM NPY (NumPy array format v1.0) codec for float32
  * matrices — the tensor interchange training stacks actually load
  * (`np.load` / memory-mapped readers), implemented from the PUBLIC
  * format spec (numpy/numpy NEP, "The .npy format"): magic
  * `\\x93NUMPY`, version 1.0, a little-endian uint16 header length, an
  * ASCII python-dict header padded with spaces to a 64-byte multiple
  * (terminated by '\n'), then the raw C-order array bytes.
  *
  * Scope: 2-D float32 C-order ('<f4', fortran_order False) — the
  * embedding-matrix case. Decode is strict on what encode produces
  * (plus whitespace tolerance in the header dict) and fails loudly on
  * anything else: this is an exporter's round-trip verifier, not a
  * general NumPy reader.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte,
      'Y'.toByte)

  /** Serialize an n × dim float32 matrix (C order, little endian). */
  def encodeF32(rows: Array[Array[Float]]): Array[Byte] = {
    val n = rows.length
    val dim = if (n == 0) 0 else rows(0).length
    require(rows.forall(_.length == dim), "ragged matrix: all rows must share dim")
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $dim), }"
    // header (magic + version + len + dict + '\n') pads to a 64 multiple
    val base = Magic.length + 2 + 2 + dict.length + 1
    val pad = (64 - base % 64) % 64
    val headerLen = dict.length + pad + 1
    require(headerLen <= 0xffff, s"NPY v1.0 header too large: $headerLen")
    val bytes = java.nio.ByteBuffer
      .allocate(Magic.length + 4 + headerLen + n * dim * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.put(Magic).put(1.toByte).put(0.toByte)
      .putShort(headerLen.toShort)
      .put(dict.getBytes("US-ASCII"))
    var i = 0
    while (i < pad) { bytes.put(' '.toByte); i += 1 }
    bytes.put('\n'.toByte)
    rows.foreach { r =>
      var j = 0
      while (j < dim) { bytes.putFloat(r(j)); j += 1 }
    }
    bytes.array()
  }

  /** Serialize an n × dim uint8 matrix (`'|u1'` — byte-order-free) —
    * the artifact a scalar-quantized corpus ships as (codes from
    * [[Embeddings.scalarQuantizeTrained]]); values must be 0..255.
    */
  def encodeU8(rows: Array[Array[Int]]): Array[Byte] = {
    val n = rows.length
    val dim = if (n == 0) 0 else rows(0).length
    require(rows.forall(_.length == dim), "ragged matrix: all rows must share dim")
    val dict = s"{'descr': '|u1', 'fortran_order': False, 'shape': ($n, $dim), }"
    val base = Magic.length + 2 + 2 + dict.length + 1
    val pad = (64 - base % 64) % 64
    val headerLen = dict.length + pad + 1
    require(headerLen <= 0xffff, s"NPY v1.0 header too large: $headerLen")
    val bytes = java.nio.ByteBuffer
      .allocate(Magic.length + 4 + headerLen + n * dim)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.put(Magic).put(1.toByte).put(0.toByte)
      .putShort(headerLen.toShort)
      .put(dict.getBytes("US-ASCII"))
    var i = 0
    while (i < pad) { bytes.put(' '.toByte); i += 1 }
    bytes.put('\n'.toByte)
    rows.foreach { r =>
      var j = 0
      while (j < dim) {
        require(r(j) >= 0 && r(j) <= 255, s"u8 code out of range: ${r(j)}")
        bytes.put(r(j).toByte); j += 1
      }
    }
    bytes.array()
  }

  /** Parse bytes produced by [[encodeU8]] back into the matrix. */
  def decodeU8(bytes: Array[Byte]): Array[Array[Int]] = {
    require(bytes.length >= 10 &&
      bytes.take(6).sameElements(Magic), "not an NPY stream")
    require(bytes(6) == 1 && bytes(7) == 0,
      s"unsupported NPY version ${bytes(6)}.${bytes(7)}")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    val headerLen = buf.getShort() & 0xffff
    val header = new Array[Byte](headerLen)
    buf.get(header)
    val dict = new String(header, "US-ASCII").trim
    val shapeRe = """'shape':\s*\((\d+),\s*(\d+)\s*,?\s*\)""".r
    require(dict.contains("'descr': '|u1'"), s"unsupported dtype in: $dict")
    require(dict.contains("'fortran_order': False"),
      s"fortran-order arrays unsupported: $dict")
    val (n, dim) = shapeRe.findFirstMatchIn(dict) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None => sys.error(s"no 2-D shape in NPY header: $dict")
    }
    require(buf.remaining() == n * dim,
      s"NPY payload ${buf.remaining()} bytes, expected ${n * dim}")
    Array.fill(n) {
      val r = new Array[Int](dim)
      var j = 0
      while (j < dim) { r(j) = buf.get() & 0xff; j += 1 }
      r
    }
  }

  /** Parse bytes produced by [[encodeF32]] back into the matrix. */
  def decodeF32(bytes: Array[Byte]): Array[Array[Float]] = {
    require(bytes.length >= 10 &&
      bytes.take(6).sameElements(Magic), "not an NPY stream")
    require(bytes(6) == 1 && bytes(7) == 0,
      s"unsupported NPY version ${bytes(6)}.${bytes(7)}")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    val headerLen = buf.getShort() & 0xffff
    val header = new Array[Byte](headerLen)
    buf.get(header)
    val dict = new String(header, "US-ASCII").trim
    val shapeRe = """'shape':\s*\((\d+),\s*(\d+)\s*,?\s*\)""".r
    require(dict.contains("'descr': '<f4'"), s"unsupported dtype in: $dict")
    require(dict.contains("'fortran_order': False"),
      s"fortran-order arrays unsupported: $dict")
    val (n, dim) = shapeRe.findFirstMatchIn(dict) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None => sys.error(s"no 2-D shape in NPY header: $dict")
    }
    require(buf.remaining() == n * dim * 4,
      s"NPY payload ${buf.remaining()} bytes, expected ${n * dim * 4}")
    Array.fill(n) {
      val r = new Array[Float](dim)
      var j = 0
      while (j < dim) { r(j) = buf.getFloat(); j += 1 }
      r
    }
  }
}
