package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Scale techniques: salted skew joins (result-equivalence + scatter)
  * and bucketed co-located joins (no Exchange in the plan).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data and scatters the hot key") {
    // 90% of probe rows share one hot key
    val probe = (1 to 1000).map(i =>
      (if (i <= 900) "HOT" else s"k$i", i.toLong)).toDF("key", "event_id")
    val build = Seq(("HOT", 1.0), ("k901", 2.0), ("k950", 3.0)).toDF("key", "w")

    val plain = probe.join(build, "key")
      .select($"key", $"event_id", $"w")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(probe, build, "key", salts = 8,
        saltFrom = Seq("event_id"))
      .select($"key", $"event_id", $"w")
      .collect().map(_.toSeq).toSet
    salted shouldBe plain
    salted.size shouldBe 902

    // the hot key's probe rows really scatter across multiple salts
    val saltSpread = probe
      .withColumn("__salt", pmod(xxhash64($"event_id"), lit(8)))
      .filter($"key" === "HOT").select($"__salt").distinct().count()
    saltSpread should be > 4L
  }

  test("bucketed tables join without a shuffle (co-located layout)") {
    val left = (1L to 500L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (1L to 500L).map(i => (i, i * 2.0)).toDF("id", "rv")
    Scale.writeBucketed(left, "bkt_left", "id", 4)
    Scale.writeBucketed(right, "bkt_right", "id", 4)
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
      joined.count() shouldBe 500
      val plan = joined.queryExecution.executedPlan.toString
      // co-bucketed layout: the join needs no shuffle of either side
      plan should not include "Exchange hashpartitioning"
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
