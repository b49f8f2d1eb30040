package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("joinAsOf directions: forward and nearest, distance ties to backward") {
    val left = Seq((1L, "k", 5L), (2L, "k", 6L), (3L, "k", 2L), (4L, "k", 9L))
      .toDF("id", "key", "ts")
    val right = Seq(("k", 3L, 30L), ("k", 7L, 70L)).toDF("key", "rts", "v")
    def run(d: String) =
      AsOfJoin.joinAsOf(left, right, Seq("key"), "ts", "rts", Seq("v"), d)
        .select("id", "asof_v").orderBy("id")
        .as[(Long, Option[Long])].collect().toSeq
    assert(run("backward") === Seq(
      (1L, Some(30L)), (2L, Some(30L)), (3L, None), (4L, Some(70L))))
    assert(run("forward") === Seq(
      (1L, Some(70L)), (2L, Some(70L)), (3L, Some(30L)), (4L, None)))
    // id 1 sits exactly between (|5−3| = |7−5|): the tie goes backward
    assert(run("nearest") === Seq(
      (1L, Some(30L)), (2L, Some(70L)), (3L, Some(30L)), (4L, Some(70L))))
  }

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")),
      (2L, 10L, ts("2024-01-01 00:00:20")),
      (3L, 20L, ts("2024-01-01 00:00:05"))).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:08"), "r1"),
      (10L, ts("2024-01-01 00:00:15"), "r2"),
      (20L, ts("2024-01-01 00:00:99"), "r3")).toDF("k", "ts", "tag")

    val got = AsOfJoin.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("tag"))
      .select("id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(
      1L -> Some("r1"),   // r1 at :08 <= :10 (r2 is in the future)
      2L -> Some("r2"),   // latest of r1/r2
      3L -> None))        // no right row precedes :05
  }

  test("equal timestamps are inclusive (right visible to left at same ts)") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:01:00"))).toDF("id", "k", "ts")
    val right = Seq((5L, ts("2024-01-01 00:01:00"), "same")).toDF("k", "ts", "tag")
    val got = AsOfJoin.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("tag"))
      .select("asof_tag").as[String].head()
    assert(got == "same")
  }

  test("partition-invariant: same result at any parallelism") {
    val left = (1 to 500).map(i =>
      (i.toLong, (i % 7).toLong, ts(f"2024-01-01 00:${i % 60}%02d:00"))).toDF("id", "k", "ts")
    val right = (1 to 100).map(i =>
      ((i % 7).toLong, ts(f"2024-01-01 00:${(i * 3) % 60}%02d:30"), s"r$i")).toDF("k", "ts", "tag")
      .groupBy("k", "ts").agg(org.apache.spark.sql.functions.max("tag").as("tag"))
    val a = AsOfJoin.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("tag"))
      .orderBy("id").collect().toSeq
    val b = AsOfJoin.joinAsOf(left.repartition(13), right.repartition(3),
        Seq("k"), "ts", "ts", Seq("tag"))
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("train/test split is deterministic and append-stable") {
    val df = (1 to 1000).map(i => Tuple1(i.toLong)).toDF("k")
    val s1 = AsOfJoin.trainTestSplit(df, "k", 80)
      .as[(Long, String)].collect().toMap
    // repartitioned + appended data never changes an existing row's split
    val s2 = AsOfJoin.trainTestSplit(df.repartition(17), "k", 80)
      .as[(Long, String)].collect().toMap
    assert(s1 == s2)
    val frac = s1.values.count(_ == "train").toDouble / s1.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("split stays balanced for strided and huge keys") {
    // stride-100 keys: a naive (key*K) mod 100 would put ALL in one split
    val strided = (1 to 1000).map(i => Tuple1(i * 100L)).toDF("k")
    val f1 = AsOfJoin.trainTestSplit(strided, "k", 80)
      .filter($"split" === "train").count().toDouble / 1000
    assert(f1 > 0.7 && f1 < 0.9, s"strided train fraction $f1")
    // snowflake-scale 64-bit ids must not overflow under ANSI mode
    val huge = (1 to 1000).map(i => Tuple1(Long.MaxValue - i * 1000L)).toDF("k")
    val f2 = AsOfJoin.trainTestSplit(huge, "k", 80)
      .filter($"split" === "train").count().toDouble / 1000
    assert(f2 > 0.6 && f2 < 0.95, s"huge-key train fraction $f2")
  }

  test("as-of join never matches on NULL keys") {
    val left = Seq((1L, Some(7L), ts("2024-01-01 00:00:10")),
      (2L, None, ts("2024-01-01 00:00:10"))).toDF("id", "k", "ts")
    val right = Seq((Some(7L), ts("2024-01-01 00:00:05"), "real"),
      (Option.empty[Long], ts("2024-01-01 00:00:05"), "phantom")).toDF("k", "ts", "tag")
    val got = AsOfJoin.joinAsOf(left, right, Seq("k"), "ts", "ts", Seq("tag"))
      .select("id", "asof_tag").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("real"), 2L -> None))
  }

  test("binnedRangeJoin equals the naive inequality join on random fixtures") {
    // deterministic pseudo-random points/intervals, including bin-edge
    // values (multiples of the width) and intervals crossing bins
    val w = 10L
    val pts = (0 until 300)
      .map(i => ((i * 7919L) % 997L, i.toLong)).toDF("pt", "pid")
    val ivs = (0 until 40).map { i =>
      val s = (i * 6007L) % 950L
      (s, s + (i * 13L) % 60L, i.toLong)
    }.toDF("s", "e", "iid")
    val binned = AsOfJoin.binnedRangeJoin(pts, ivs, "pt", "s", "e", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    val naive = pts.join(ivs, col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(binned.nonEmpty && binned == naive,
      s"binned ${binned.size} vs naive ${naive.size}")
  }

  test("binnedRangeJoin: boundary containment is inclusive on both ends") {
    val pts = Seq((10L, 1L), (20L, 2L), (9L, 3L), (21L, 4L)).toDF("pt", "pid")
    val ivs = Seq((10L, 20L, 100L)).toDF("s", "e", "iid")
    val got = AsOfJoin.binnedRangeJoin(pts, ivs, "pt", "s", "e", 7L)
      .select("pid").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L))
  }

  test("binnedRangeJoin guards: negative domain, inverted interval, span cap") {
    val pts = Seq((5L, 1L)).toDF("pt", "pid")
    val ivs = Seq((0L, 9L, 1L)).toDF("s", "e", "iid")
    def boom(f: => org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[Exception](f.collect())
      assert(e.getMessage.contains("binnedRangeJoin"), e.getMessage)
    }
    boom(AsOfJoin.binnedRangeJoin(Seq((-1L, 1L)).toDF("pt", "pid"), ivs,
      "pt", "s", "e", 10L))
    boom(AsOfJoin.binnedRangeJoin(pts, Seq((9L, 3L, 1L)).toDF("s", "e", "iid"),
      "pt", "s", "e", 10L))
    boom(AsOfJoin.binnedRangeJoin(pts, Seq((0L, 1000L, 1L)).toDF("s", "e", "iid"),
      "pt", "s", "e", 10L, maxBinsPerInterval = 4))
    intercept[IllegalArgumentException] {
      AsOfJoin.binnedRangeJoin(pts, ivs, "pt", "s", "e", 0L)
    }
  }
}
