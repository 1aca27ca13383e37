package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface — the user-facing custom-
  * aggregate tier below a raw Catalyst `TypedImperativeAggregate`
  * ([[MinHashAgg]]): encoder-checked, usable via `functions.udaf`.
  *
  * WeightedMean is the canonical example: exact value*weight accumulation
  * with a product-type buffer, mergeable for map-side partial aggregation.
  */
object TypedAggs {

  final case class WSum(sum: Double, weight: Double)

  /** Weighted mean of (value, weight) pairs; empty/zero-weight input -> 0. */
  object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, in: (Double, Double)): WSum =
      WSum(b.sum + in._1 * in._2, b.weight + in._2)
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.sum + b.sum, a.weight + b.weight)
    override def finish(b: WSum): Double =
      if (b.weight == 0.0) 0.0 else b.sum / b.weight
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
