package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level drill for the k-NN spatial ladder: times the pieces the
  * bench line is made of (layer staging, occupancy probe, ladder vs
  * brute) so a slow headline number attributes to a stage instead of a
  * guess. `runMain graft.tools.ProfileSpatialKnn [sfDir]`.
  */
object ProfileSpatialKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val left = graft.api.Geometry.withPointGeometry(
      cust.select(col("c_custkey").as("id"), col("c_acctbal").as("x"),
        (col("c_custkey") * 0.5).as("y")), "x", "y").select("id", "geometry")
    val right = graft.api.Geometry.withPointGeometry(
      sup.select(col("s_suppkey").as("id"), col("s_acctbal").as("x"),
        (col("s_suppkey") * 0.5).as("y")), "x", "y").select("id", "geometry")
    println(s"[profile] |left|=${left.count()} |right|=${right.count()}")
    (1 to 2).foreach { i =>
      t(s"knn k=3 default (run $i)") {
        graft.operators.Spatial.kNearestNeighbors(left, "id", right, "id",
          3, 50.0).count()
      }
    }
    t("knn k=3 pure ladder (budget 0)") {
      graft.operators.Spatial.kNearestNeighbors(left, "id", right, "id",
        3, 50.0, bruteBudget = 0L).count()
    }
    t("knn k=3 huge budget (brute immediately)") {
      graft.operators.Spatial.kNearestNeighbors(left, "id", right, "id",
        3, 50.0, bruteBudget = Long.MaxValue / 4).count()
    }
    t("nn (k=1 operator)") {
      graft.operators.Spatial.nearestNeighbor(left, "id", right, "id",
        50.0).count()
    }
    // isolate the brute kernel: broadcast left, cross join, rank window
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy("a").orderBy(col("dist2").asc, col("b"))
    val lx = left.select(col("id").as("a"),
      col("geometry.x").as("ax"), col("geometry.y").as("ay"))
    val rx = right.select(col("id").as("b"),
      col("geometry.x").as("bx"), col("geometry.y").as("by"))
    t("brute kernel: cross + window rank<=3") {
      rx.crossJoin(broadcast(lx))
        .select(col("a"), col("b"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
           (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist2"))
        .withColumn("rank", row_number().over(wA))
        .filter(col("rank") <= 3)
        .count()
    }
    t("brute kernel via min_k_pairs (posexplode forces the agg)") {
      rx.crossJoin(broadcast(lx))
        .select(col("a"), col("b"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
           (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist2"))
        .groupBy("a")
        .agg(graft.functions.TopKFunctions
          .min_k_pairs(col("dist2"), col("b"), 3).as("__top"))
        .select(col("a"), posexplode(col("__top")))
        .count()
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "10000000")
    t("brute kernel via min_k_pairs, raised fallback threshold") {
      rx.crossJoin(broadcast(lx))
        .select(col("a"), col("b"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
           (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist2"))
        .groupBy("a")
        .agg(graft.functions.TopKFunctions
          .min_k_pairs(col("dist2"), col("b"), 3).as("__top"))
        .select(col("a"), posexplode(col("__top")))
        .count()
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      "128")
    t("brute kernel via agg min(struct)") {
      rx.crossJoin(broadcast(lx))
        .select(col("a"), col("b"),
          ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
           (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist2"))
        .groupBy("a").agg(min(struct(col("dist2"), col("b"))).as("m"))
        .count()
    }
    spark.stop()
  }
}
