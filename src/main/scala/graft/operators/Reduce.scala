package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One input record of the option-trade reducer demo: (value, type)
  * pairs folded into conditional buckets.
  */
case class BucketIn(value: Double, event_type: String)

/** §2.11 — the reference's user-supplied `initializer`/`reducer` pair
  * as a first-class typed `Aggregator` (ref option_trade_aggs/
  * main.py:85-188: a dict→dict fold per key). Registered with `udaf`
  * it runs inside any groupBy/window aggregation, batch or streaming —
  * the one §2 capability round 2 reported as not implemented.
  *
  * The buffer accumulates `BigDecimal` at scale 6 so the fold is
  * reassociation-proof: Spark's partial/merge order varies with
  * partitioning, and a double buffer would hash-differ from any
  * oracle (same trick as [[graft.functions.dsum]]).
  */
class DictReducer[I](
    zeroFn: () => Map[String, BigDecimal],
    reduceFn: (Map[String, BigDecimal], I) => Map[String, BigDecimal])(
    implicit ienc: Encoder[I])
  extends Aggregator[I, Map[String, BigDecimal], Map[String, Double]] {

  def zero: Map[String, BigDecimal] = zeroFn()
  def reduce(b: Map[String, BigDecimal], a: I): Map[String, BigDecimal] =
    reduceFn(b, a)
  def merge(x: Map[String, BigDecimal], y: Map[String, BigDecimal]): Map[String, BigDecimal] =
    (x.keySet ++ y.keySet).iterator
      .map(k => k -> (x.getOrElse(k, BigDecimal(0)) + y.getOrElse(k, BigDecimal(0))))
      .toMap
  def finish(b: Map[String, BigDecimal]): Map[String, Double] =
    b.map { case (k, v) => k -> v.toDouble }
  def bufferEncoder: Encoder[Map[String, BigDecimal]] =
    ExpressionEncoder[Map[String, BigDecimal]]()
  def outputEncoder: Encoder[Map[String, Double]] =
    ExpressionEncoder[Map[String, Double]]()
}

object Reduce {

  /** Decimal at the same scale as `dsum`'s DECIMAL(30,6) so the fold
    * equals the built-in conditional-sum path bit for bit.
    */
  private def d6(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** The reference's whale/retail × side bucket reducer re-expressed
    * over the events table (the q02 semantics, but through the
    * user-reducer path instead of built-in conditional sums —
    * ref option_trade_aggs/main.py:99-136).
    */
  def eventBucketReducer: DictReducer[BucketIn] = {
    implicit val enc: Encoder[BucketIn] = Encoders.product[BucketIn]
    new DictReducer[BucketIn](
      () => Map.empty,
      (b, r) => {
        val big = r.value > 75.0
        val purchase = r.event_type == "purchase"
        val bucket =
          if (big && purchase) "vol_big_purchase"
          else if (big) "vol_big_other"
          else if (purchase) "vol_small_purchase"
          else "vol_small_other"
        val b1 = b.updated(bucket, b.getOrElse(bucket, BigDecimal(0)) + d6(r.value))
        val b2 =
          if (r.event_type == "error")
            b1.updated("n_error", b1.getOrElse("n_error", BigDecimal(0)) + 1)
          else b1
        b2.updated("n_events", b2.getOrElse("n_events", BigDecimal(0)) + 1)
      })
  }
}
