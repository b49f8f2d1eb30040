package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Stage-level timing of the kNN-graph plan at a given dir/nlist — which
  * of assignment / probe selection / cell join+score / rank dominates.
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val nlist = if (args.length > 1) args(1).toInt else 640
    val nprobe = 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val real = graft.operators.Similarity.knnGraph(
      graft.api.Tables.load(spark, dir, "embeddings"),
      "vec_id", "embedding", 5, nlist = nlist, nprobe = 8)
    time("REAL knnGraph run1")(real.count())
    time("REAL knnGraph run2")(real.count())
    // sub-stage costs of the co-group kernel, rebuilt inline
    locally {
      val emb2 = graft.api.Tables.load(spark, dir, "embeddings").repartition(32)
      val cents2 = emb2.select(col("vec_id").cast("long").as("cid"),
          col("embedding").cast("array<double>").as("cvec"),
          vec_norm(col("embedding")).as("cnorm"))
        .filter(col("cnorm") > 0).orderBy("cid").limit(nlist)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      val mat2 = cents2.map(_._2)
      val sc2 = cents2.map(_._3)
      val id2 = cents2.map(_._1)
      val c2 = emb2.filter(col("embedding").isNotNull)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          vec_norm(col("embedding")).as("norm"))
      val cells2 = c2.withColumn("__cd", vec_dot_matrix(col("vec"), mat2))
        .withColumn("cid", vec_arg_max_id(col("__cd"), col("norm"), sc2, id2))
        .drop("__cd")
      val probes2 = c2.select(col("id").as("qid"), col("vec").as("qvec"),
          col("norm").as("qnorm"))
        .withColumn("__cd", vec_dot_matrix(col("qvec"), mat2))
        .withColumn("cid", explode(vec_top_ids(col("__cd"), col("qnorm"), sc2, id2, nprobe)))
        .select("qid", "qvec", "qnorm", "cid")
      val cellsAgg = cells2.groupBy("cid")
        .agg(collect_list(struct(col("id"), col("vec"), col("norm"))).as("ms"))
      val probesAgg = probes2.groupBy("cid")
        .agg(collect_list(struct(col("qid"), col("qvec"), col("qnorm"))).as("qs"))
      time("cellsAgg count")(cellsAgg.count())
      time("probesAgg count")(probesAgg.count())
      time("agg join count")(
        cellsAgg.join(probesAgg.hint("merge"), Seq("cid")).count())
      time("agg join FORCED read")(
        cellsAgg.join(probesAgg.hint("merge"), Seq("cid"))
          .select(expr("size(ms)"), expr("size(qs)"))
          .agg(sum(expr("`size(ms)` + `size(qs)`"))).collect())
      val kernel = cellsAgg.join(probesAgg.hint("merge"), Seq("cid"))
        .select(explode(graft.functions.VectorFunctions.cell_top_k(
          col("ms"), col("qs"), 5)).as("e"))
        .select(col("e.qid").as("qid"), col("e.id").as("id"),
          col("e.cos").as("cosine"))
      time("kernel explode count")(kernel.count())
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cosine").desc, col("id"))
      time("kernel + final window") {
        kernel.withColumn("rank", row_number().over(wq))
          .filter(col("rank") <= 5).count()
      }
      time("probes alone count")(probes2.count())
      time("cells alone count")(cells2.count())
    }
    spark.stop()
    sys.exit(0)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val emb = graft.api.Tables.load(spark, dir, "embeddings").repartition(32)
    val cents = time("collect centroids") {
      emb.select(col("vec_id").cast("long").as("cid"),
          col("embedding").cast("array<double>").as("cvec"),
          vec_norm(col("embedding")).as("cnorm"))
        .filter(col("cnorm") > 0).orderBy("cid").limit(nlist)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    }
    val mat = cents.map(_._2)
    val scales = cents.map(_._3)
    val ids = cents.map(_._1)
    val c = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"),
      vec_norm(col("embedding")).as("norm"))
    val cells = c.withColumn("__cd", vec_dot_matrix(col("vec"), mat))
      .withColumn("cid", vec_arg_max_id(col("__cd"), col("norm"), scales, ids))
      .drop("__cd")
    time("assign cells")(cells.count())
    val probes = c.select(col("id").as("qid"), col("vec").as("qvec"),
        col("norm").as("qnorm"))
      .withColumn("__cd", vec_dot_matrix(col("qvec"), mat))
      .withColumn("cid", explode(vec_top_ids(col("__cd"), col("qnorm"), scales, ids, nprobe)))
      .select("qid", "qvec", "qnorm", "cid")
    time("probe selection")(probes.count())
    val scored = cells.join(probes, Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (vec_dot(col("vec"), col("qvec")) / (col("norm") * col("qnorm"))).as("cosine"))
    time("join+score count")(scored.count())
    time("join+score FORCED eval")(
      scored.agg(sum(col("cosine"))).collect())
    val synth = spark.range(31000000L).select(
      (col("id") % 50000).as("qid"), col("id"),
      (col("id") % 9973).cast("double").as("cosine"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    time("synthetic 31M window top-k") {
      synth.withColumn("rank", row_number().over(ws))
        .filter(col("rank") <= 5).count()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    val ranked = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    ranked.explain("formatted")
    time("rank window top-k")(ranked.count())
    spark.stop()
  }
}
