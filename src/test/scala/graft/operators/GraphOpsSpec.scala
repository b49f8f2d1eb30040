package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("labelPropagation separates bridged dense communities that CC merges") {
    // two triangles joined by one bridge edge 3–4: connected components
    // must merge everything; plurality LPA must keep the triangles apart
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val lpa = GraphOps.labelPropagation(edges, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"got $lpa")
    val cc = Dedup.duplicateClusters(
        edges.toDF("a", "b"))
      .select("cluster_id").distinct().count()
    assert(cc == 1L, "CC should merge the bridged triangles into one")
  }

  test("labelPropagation is direction-agnostic (edges symmetrized)") {
    val fwd = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val rev = Seq((2L, 1L), (3L, 2L), (3L, 1L)).toDF("src", "dst")
    val a = GraphOps.labelPropagation(fwd, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.labelPropagation(rev, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("labelPropagation self-loops are dropped, round bounds enforced") {
    val withLoop = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val lpa = GraphOps.labelPropagation(withLoop, "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap
    // pair converges to the smaller id's label
    assert(lpa == Map(1L -> 1L, 2L -> 1L), s"got $lpa")
    intercept[IllegalArgumentException] {
      GraphOps.labelPropagation(withLoop, "src", "dst", rounds = 0)
    }
  }

  private def triRows(edges: org.apache.spark.sql.DataFrame) =
    GraphOps.triangleCount(edges, "src", "dst")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("triangleCount: K4 clique — every node closes every wedge") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    // each node: degree 3, C(3,2)=3 triangles, coefficient 1 (10000)
    assert(triRows(k4) == (1L to 4L).map(n => (n, 3L, 3L, 10000L)))
  }

  test("triangleCount: bridge, star, and path contribute zero triangles") {
    // two triangles bridged at 3–4 (the LPA fixture) + a star at 7 + a
    // pendant path: triangle corners count 1, everything else 0
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L), (7L, 8L), (7L, 9L), (7L, 10L), (10L, 11L)).toDF("src", "dst")
    val rows = triRows(g).map(r => r._1 -> (r._3, r._4)).toMap
    assert(rows(1L) == ((1L, 10000L)) && rows(2L) == ((1L, 10000L)))
    // bridge endpoints keep their one triangle but dilute the coefficient:
    // degree 3 → 2·1·10⁴ // 6 = 3333
    assert(rows(3L) == ((1L, 3333L)) && rows(4L) == ((1L, 3333L)))
    assert(Seq(7L, 8L, 9L, 10L, 11L).forall(rows(_)._1 == 0L),
      s"star/path grew triangles: $rows")
  }

  test("triangleCount: direction, duplication, and self-loops are normalized") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L)).toDF("src", "dst")
    assert(triRows(messy) == Seq((1L, 2L, 1L, 10000L), (2L, 2L, 1L, 10000L),
      (3L, 2L, 1L, 10000L)))
  }
}
