package graft.udx

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed weighted-average aggregate (SURVEY §2.B udaf_weighted_avg).
  *
  * `Aggregator[(value, weight), (Σ value·weight, Σ weight), Double]` —
  * partial aggregation happens map-side (reduce) and the tiny 2-double
  * buffer merges at the final stage, so the shuffle carries one buffer
  * per group per partition regardless of input size.
  */
object WeightedAvgAggregator extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedAvg {
  private val fn = udaf(WeightedAvgAggregator)

  /** weighted_avg(value, weight) as a Column. */
  def weightedAvg(value: Column, weight: Column): Column = fn(value, weight)
}
