package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators for corpus statistics — the `Aggregator[IN,
  * BUF, OUT]` escape hatch for group-level state the built-in functions
  * don't model. Buffers are tiny fixed-size structures (mergeable,
  * spill-friendly), so these scale like any partial aggregation.
  */
object CorpusAggregators {

  /** Log2-bucketed histogram of a long-valued feature (e.g. document
    * length): buffer = 32 counters, merged by elementwise sum. The shape
    * of a corpus's length distribution in one pass, no sort, no
    * percentile state.
    */
  class Log2Histogram extends Aggregator[Long, Array[Long], Map[Int, Long]] {
    override def zero: Array[Long] = new Array[Long](32)
    override def reduce(b: Array[Long], v: Long): Array[Long] = {
      val bucket = if (v <= 0) 0 else math.min(63 - java.lang.Long.numberOfLeadingZeros(v), 31)
      b(bucket) += 1
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Map[Int, Long] =
      b.zipWithIndex.collect { case (n, i) if n > 0 => i -> n }.toMap
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Map[Int, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()
  }
}
