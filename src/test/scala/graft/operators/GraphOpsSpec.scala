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
}
