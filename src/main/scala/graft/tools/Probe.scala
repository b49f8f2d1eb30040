package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (t <- Seq("orders", "events", "lineitem", "embeddings")) {
      val df = spark.read.parquet(s"$d/$t.parquet")
      println(s"== $t: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    spark.read.parquet(s"$d/orders.parquet").selectExpr(
      "min(o_orderdate)", "max(o_orderdate)").show(false)
    spark.read.parquet(s"$d/events.parquet").selectExpr(
      "min(ts)", "max(ts)").show(false)
    spark.stop()
  }
}
