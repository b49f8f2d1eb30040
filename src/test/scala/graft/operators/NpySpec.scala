package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the NPY codec against the public format spec and the sharded
  * exporter's determinism/round-trip contract.
  */
class NpySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("NPY header bytes follow the public v1.0 spec exactly") {
    val bytes = Npy.encodeF32(Array(Array(1.0f, 2.0f, 3.0f),
      Array(4.0f, 5.0f, 6.0f)))
    // magic + version
    assert((bytes(0) & 0xff) == 0x93)
    assert(new String(bytes.slice(1, 6), "US-ASCII") == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0)
    // little-endian header length; total preamble = 64-multiple
    val hlen = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    assert((10 + hlen) % 64 == 0, s"preamble ${10 + hlen} not 64-aligned")
    val header = new String(bytes.slice(10, 10 + hlen), "US-ASCII")
    assert(header.contains("'descr': '<f4'"), header)
    assert(header.contains("'fortran_order': False"), header)
    assert(header.contains("'shape': (2, 3)"), header)
    assert(header.endsWith("\n"), "header must end with newline")
    // payload: 6 little-endian float32s in C order
    assert(bytes.length == 10 + hlen + 24)
    val f = java.nio.ByteBuffer.wrap(bytes, 10 + hlen, 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((1 to 6).map(_ => f.getFloat()) == Seq(1f, 2f, 3f, 4f, 5f, 6f))
  }

  test("codec round trip is bit-exact, including NaN payloads and 0-row edge") {
    val m = Array(
      Array(0.1f, -0.0f, Float.NaN, Float.MaxValue),
      Array(Float.MinPositiveValue, -1e-30f, 42f, Float.NegativeInfinity))
    val back = Npy.decodeF32(Npy.encodeF32(m))
    assert(back.length == 2)
    for (i <- m.indices; j <- m(0).indices)
      assert(java.lang.Float.floatToRawIntBits(back(i)(j)) ==
        java.lang.Float.floatToRawIntBits(m(i)(j)), s"bit drift at ($i,$j)")
    assert(Npy.decodeF32(Npy.encodeF32(Array.empty)).isEmpty)
  }

  test("exportNpy: deterministic report, shards parse back to the full set") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.api.Tables.load(spark, dir, "embeddings")
    val out = "/tmp/graft_test_npy"
    val r1 = Embeddings.exportNpy(emb, "vec_id", "embedding", out, 8)
      .orderBy("shard_no").collect().map(_.toSeq).toSeq
    // different input partitioning → identical files, identical hashes
    val r2 = Embeddings.exportNpy(emb.repartition(13), "vec_id", "embedding",
        out, 8)
      .orderBy("shard_no").collect().map(_.toSeq).toSeq
    assert(r1 == r2, "export not a pure function of the input set")
    assert(r1.map(_(1).asInstanceOf[Long]).sum == emb.count())
    // every shard parses back; total rows match; a manifest join holds:
    // shard row `pos` IS the manifest id's vector
    val manifest = spark.read.parquet(s"$out/manifest")
    val shard0 = Npy.decodeF32(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/shard_00000.npy")))
    val ids = manifest.filter(col("shard") === 0).orderBy("pos")
      .select("id").as[Long].collect()
    assert(shard0.length == ids.length)
    val firstVec = emb.filter(col("vec_id") === ids(0))
      .select("embedding").as[Array[Float]].head()
    assert(java.util.Arrays.equals(shard0(0), firstVec),
      "shard row 0 is not the manifest's first id's vector")
  }

  test("u8 codec round trip is exact over the full 0..255 range") {
    val m = Array(Array(0, 1, 127, 128), Array(254, 255, 17, 99))
    val back = Npy.decodeU8(Npy.encodeU8(m))
    assert(back.map(_.toSeq).toSeq == m.map(_.toSeq).toSeq)
    assert(Npy.decodeU8(Npy.encodeU8(Array.empty)).isEmpty)
    // header declares the byte-order-free uint8 dtype
    val hdr = new String(Npy.encodeU8(m).slice(10, 80), "US-ASCII")
    assert(hdr.contains("'descr': '|u1'"))
    val bad = intercept[IllegalArgumentException] {
      Npy.encodeU8(Array(Array(256)))
    }
    assert(bad.getMessage.contains("out of range"))
  }

  test("exportNpyQuantized: u8 shards dequantize within one grid step") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.api.Tables.load(spark, dir, "embeddings")
    val out = "/tmp/graft_test_npy_u8"
    val r1 = Embeddings.exportNpyQuantized(emb, "vec_id", "embedding", out, 8)
      .orderBy("shard_no").collect().map(_.toSeq).toSeq
    val r2 = Embeddings.exportNpyQuantized(emb.repartition(13),
        "vec_id", "embedding", out, 8)
      .orderBy("shard_no").collect().map(_.toSeq).toSeq
    assert(r1 == r2, "export not a pure function of the input set")
    assert(r1.map(_(1).asInstanceOf[Long]).sum == emb.count())
    // u8 payload: byte_len strictly smaller than the f32 export's would
    // be for the same shard (n·dim vs n·dim·4 + same header shape)
    val shard0 = Npy.decodeU8(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/shard_00000.npy")))
    val manifest = spark.read.parquet(s"$out/manifest")
    val ids = manifest.filter(col("shard") === 0).orderBy("pos")
      .select("id").as[Long].collect()
    assert(shard0.length == ids.length)
    // dequantize row 0 via the persisted grid sidecar: every element
    // lands within one grid step of the original
    val grid = spark.read.parquet(s"$out/grid")
      .orderBy("pos")
      .select("mn", "mx", "levels", "scale_bits")
      .as[(Long, Long, Int, Int)].collect()
    val firstVec = emb.filter(col("vec_id") === ids(0))
      .select("embedding").as[Array[Float]].head()
    val s = math.pow(2.0, grid(0)._4)
    for (j <- firstVec.indices) {
      val (mn, mx, levels, _) = grid(j)
      val deq = (mn.toDouble + shard0(0)(j).toDouble * (mx - mn) / levels) / s
      val step = math.max((mx - mn).toDouble / levels / s, 1.0 / s)
      assert(math.abs(deq - firstVec(j)) <= step + 1.0 / s,
        s"dim $j: dequant $deq vs ${firstVec(j)} exceeds grid step $step")
    }
  }

  test("re-export with fewer shards leaves no stale shard files behind") {
    val emb = graft.api.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").limit(64)
    val out = "/tmp/graft_test_npy_stale"
    Embeddings.exportNpy(emb, "vec_id", "embedding", out, numShards = 8)
    Embeddings.exportNpy(emb, "vec_id", "embedding", out, numShards = 2)
    val shards = new java.io.File(out).listFiles()
      .filter(_.getName.matches("shard_\\d+\\.npy")).map(_.getName).sorted
    assert(shards.toSeq == Seq("shard_00000.npy", "shard_00001.npy"),
      s"stale shards survived the re-export: ${shards.mkString(",")}")
  }

  test("exportNpyQuantized rejects levels that cannot fit uint8, fail-fast") {
    val emb = graft.api.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").limit(8)
    val e = intercept[IllegalArgumentException] {
      Embeddings.exportNpyQuantized(emb, "vec_id", "embedding",
        "/tmp/graft_test_npy_badlevels", levels = 1023)
    }
    assert(e.getMessage.contains("levels"))
    // fail-fast: nothing landed on disk
    assert(!new java.io.File("/tmp/graft_test_npy_badlevels").exists())
  }

  test("scalarQuantizeWithGrid saturates out-of-grid batches at the rails") {
    val base = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("id", "vec")
    val grid = Embeddings.scalarGrid(base, "id", "vec")
    val later = Seq((3L, Array(2.5f, -1.5f))).toDF("id", "vec")
    val codes = Embeddings.scalarQuantizeWithGrid(later, "id", "vec", grid)
      .select("codes").as[Seq[Int]].head()
    assert(codes == Seq(255, 0), s"expected rail saturation, got $codes")
  }

  test("exportJsonl: deterministic report incl. sha; files are valid JSONL") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.api.Tables.load(spark, dir, "documents")
    val esc = replace(replace(col("text"), lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\""))
    val line = concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
      lit(",\"text\":\""), esc, lit("\"}"))
    val in = docs.select(col("doc_id"), line.as("line"))
    val out = "/tmp/graft_test_jsonl"
    val r1 = Curation.exportJsonl(in, "doc_id", "line", out, 4)
      .orderBy("shard_no").collect().map(_.toSeq).toSeq
    val r2 = Curation.exportJsonl(in.repartition(13), "doc_id", "line", out, 4)
      .orderBy("shard_no").collect().map(_.toSeq).toSeq
    assert(r1 == r2, "export not a pure function of the input set")
    assert(r1.map(_(1).asInstanceOf[Long]).sum == docs.count())
    // the written file's bytes hash to the reported sha, and every
    // line round-trips through a real JSON parser to the source doc
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/shard_00000.jsonl"))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map(b => f"$b%02x").mkString
    assert(sha == r1.head(4).asInstanceOf[String], "file sha != report sha")
    val lines = new String(bytes, "UTF-8").split("\n")
    assert(lines.length == r1.head(1).asInstanceOf[Long])
    val parsed = spark.read.json(spark.createDataset(lines.toSeq))
    assert(parsed.columns.sorted.toSeq == Seq("doc_id", "text"))
    assert(parsed.count() == lines.length, "a line failed to parse as JSON")
    val joined = parsed.join(docs, Seq("doc_id"))
    assert(joined.count() == lines.length)
    assert(joined.filter(parsed("text") =!= docs("text")).count() == 0,
      "escaping did not round-trip through a real JSON parser")
  }
}
