package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the generic parquet compaction pass: output file count follows
  * ceil(bytes/target), content survives bit-exactly, degenerate targets
  * are rejected.
  */
class CompactSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))

  test("fragmented input compacts to ceil(bytes/target) files, content intact") {
    val in = "/tmp/graft_test_compact_in"
    val out = "/tmp/graft_test_compact_out"
    val df = (0L until 5000L).map(i => (i, s"row_$i" * 8)).toDF("id", "payload")
    df.repartition(50).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size == 50)
    // huge target → exactly one output file
    Scale.compactParquet(spark, in, out, targetBytes = 1L << 30)
    assert(parquetFiles(out).size == 1)
    val got = spark.read.parquet(out).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == (0L until 5000L).map(i => (i, s"row_$i" * 8)))
    // small target → file count tracks the byte footprint (sized via
    // the SAME Hadoop listing the operator uses — on local FS that
    // includes .crc sidecars, which plain file sums would miss)
    val p = new org.apache.hadoop.fs.Path(in)
    val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    val target = bytes / 4
    Scale.compactParquet(spark, in, out, targetBytes = target)
    val expected = ((bytes + target - 1) / target).toInt
    assert(parquetFiles(out).size == expected,
      s"expected $expected files for $bytes bytes at target $target, " +
        s"got ${parquetFiles(out).size}")
    assert(spark.read.parquet(out).count() == 5000L)
  }

  test("degenerate target is rejected") {
    intercept[IllegalArgumentException] {
      Scale.compactParquet(spark, "/tmp/whatever", "/tmp/whatever2", 0L)
    }
  }
}
