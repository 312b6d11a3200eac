package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.{BucketIn, Reduce}

/** §2.11 user-reducer Aggregator: the dict-fold path must equal the
  * built-in conditional-sum path exactly, for any partitioning.
  */
class ReduceSpec extends SparkSpec {
  import spark.implicits._

  test("DictReducer equals built-in conditional sums bit-for-bit across partitionings") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextDouble() * 150,
      Seq("purchase", "click", "error")(rnd.nextInt(3)), rnd.nextInt(4)))
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("value", "event_type", "k").repartition(parts)
      val f = udaf(Reduce.eventBucketReducer)
      val viaUdaf = df.groupBy($"k")
        .agg(f($"value", $"event_type").as("m"))
        .select($"k",
          coalesce(element_at($"m", "vol_big_purchase"), lit(0.0)).as("a"),
          coalesce(element_at($"m", "vol_small_other"), lit(0.0)).as("b"),
          coalesce(element_at($"m", "n_error"), lit(0.0)).cast("long").as("c"))
        .orderBy($"k").collect().map(_.toSeq)
      val viaBuiltin = df.groupBy($"k")
        .agg(
          sumWhen($"value" > 75.0 && $"event_type" === "purchase", $"value").as("a"),
          sumWhen($"value" <= 75.0 && $"event_type" =!= "purchase", $"value").as("b"),
          countWhen($"event_type" === "error").as("c"))
        .orderBy($"k").collect().map(_.toSeq)
      viaUdaf.toSeq shouldBe viaBuiltin.toSeq
    }
  }

  test("DictReducer merge handles disjoint and overlapping buckets") {
    val r = Reduce.eventBucketReducer
    val a = Map("x" -> BigDecimal(1), "y" -> BigDecimal(2))
    val b = Map("y" -> BigDecimal(3), "z" -> BigDecimal(4))
    r.merge(a, b) shouldBe Map("x" -> BigDecimal(1), "y" -> BigDecimal(5), "z" -> BigDecimal(4))
    r.merge(r.zero, a) shouldBe a
  }

  test("DictReducer works inside a streaming-style window aggregation") {
    val df = Seq(
      BucketIn(100.0, "purchase"), BucketIn(10.0, "click"), BucketIn(80.0, "error"))
      .toDF("value", "event_type")
    val f = udaf(Reduce.eventBucketReducer)
    val m = df.agg(f($"value", $"event_type").as("m"))
      .select(element_at($"m", "n_events"), element_at($"m", "n_error"),
        element_at($"m", "vol_big_purchase"), element_at($"m", "vol_big_other"))
      .collect()(0)
    m.getDouble(0) shouldBe 3.0
    m.getDouble(1) shouldBe 1.0
    m.getDouble(2) shouldBe 100.0
    m.getDouble(3) shouldBe 80.0
  }
}
