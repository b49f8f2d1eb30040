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
}
