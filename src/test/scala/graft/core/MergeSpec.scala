package graft.core

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  def target: DataFrame =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "s", "v")
  def source: DataFrame =
    Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("k", "s", "v")

  def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.as[(Long, String, Double)].collect().toSet

  test("upsert: source wins on match, unmatched target kept, new keys inserted") {
    assert(rows(Merge.upsert(target, source, "k")) ==
      Set((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("update: matched replaced, no inserts (skip_inserts)") {
    assert(rows(Merge.update(target, source, "k")) ==
      Set((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0)))
  }

  test("insert: unmatched inserted, matched untouched (skip_updates)") {
    assert(rows(Merge.insert(target, source, "k")) ==
      Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("append keeps duplicates; overwrite keeps only source") {
    assert(Merge.append(target, source).count() == 5)
    assert(rows(Merge.overwrite(target, source)) == rows(source))
  }

  test("dedupByKey: deterministic winner for duplicate source keys") {
    val dup = Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "z", 3.0)).toDF("k", "s", "v")
    val got = rows(Merge.dedupByKey(dup, "k"))
    assert(got == Set((1L, "y", 2.0), (2L, "z", 3.0))) // greatest struct wins
    // Stable under different partitionings.
    assert(rows(Merge.dedupByKey(dup.repartition(7), "k")) == got)
  }

  test("mode validation mirrors the reference rules") {
    assert(WriteMode.parse("APPEND") == Right(WriteMode.Append))
    assert(WriteMode.parse("nope").isLeft)
    assert(WriteMode.validate(WriteMode.Upsert, None).isLeft)
    assert(WriteMode.validate(WriteMode.Upsert, Some("k")).isRight)
    assert(WriteMode.validate(WriteMode.Append, None).isRight)
  }
}
