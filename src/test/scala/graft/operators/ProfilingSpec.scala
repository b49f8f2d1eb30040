package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("exactQuantiles matches brute-force order statistics per group") {
    // deliberately skewed + duplicate-heavy values, two groups
    val rows = Seq.tabulate(101)(i => ("a", (i * i % 37).toLong)) ++
      Seq.tabulate(50)(i => ("b", (i % 5).toLong))
    val df = rows.toDF("grp", "v")
    val qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p100", 1, 1))
    val got = Profiling.exactQuantiles(df, "grp", "v", qs)
      .as[(String, String, Long, Long)].collect()
      .map { case (g, l, v, n) => (g, l) -> (v, n) }.toMap
    for (g <- Seq("a", "b")) {
      val vals = rows.filter(_._1 == g).map(_._2).sorted
      val n = vals.length
      for ((label, num, den) <- qs) {
        val target = (num.toLong * n + den - 1) / den // ceil(n·q)
        val expect = vals(target.toInt - 1) // 1-based rank → 0-based index
        assert(got((g, label)) == (expect, n.toLong),
          s"group $g $label: got ${got((g, label))}, want ($expect, $n)")
      }
    }
  }

  test("exactQuantiles rejects null values loudly") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("v")
      .withColumn("grp", lit("g"))
    val ex = intercept[Exception] {
      Profiling.exactQuantiles(df, "grp", "v", Seq(("p50", 1, 2))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("columnProfile: counts, nulls, exact distincts, lexicographic bounds") {
    val df = Seq(
      (1L, Some("x"), Some(10L)),
      (2L, None, Some(10L)),
      (3L, Some("ab"), None),
      (4L, Some("x"), Some(7L))
    ).toDF("id", "s", "w")
    val p = Profiling.columnProfile(df, Seq("id", "s", "w"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") == ("id", 4L, 0L, 4L, "1", "4"))
    // min_repr/max_repr are LEXICOGRAPHIC over renderings: "10" < "7"
    assert(p("w") == ("w", 4L, 1L, 2L, "10", "7"))
    assert(p("s") == ("s", 4L, 1L, 2L, "ab", "x"))
  }

  test("columnProfile approximate mode drops the Expand but keeps counts sane") {
    val df = (1L to 1000L).toDF("id")
    val row = Profiling.columnProfile(df, Seq("id"), exact = false)
      .as[(String, Long, Long, Long, String, String)].head()
    assert(row._2 == 1000L && row._3 == 0L)
    // HLL at default precision on 1000 distinct longs: within 5%
    assert(math.abs(row._4 - 1000L) <= 50, s"approx distinct ${row._4}")
  }
}
