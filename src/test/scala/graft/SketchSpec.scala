package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** Count-min sketch invariants: overestimate-only, exact at generous
  * width, total-mass collapse at width 1, partition-order independence.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val keyed = Seq(
    ("alpha", 100L), ("beta", 60L), ("gamma", 30L), ("delta", 10L),
    ("epsilon", 5L), ("zeta", 1L)
  ).toDF("tok", "cnt")

  private def estimates(depth: Int, width: Int,
                        df: org.apache.spark.sql.DataFrame = keyed): Map[String, Long] = {
    val counters = Sketch.cmsCounters(df, "tok", "cnt", depth, width)
    Sketch.cmsEstimate(df, "tok", counters, depth, width)
      .select($"tok", $"cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and are exact when width dwarfs the key set") {
    val exact = keyed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(depth = 4, width = 4096)
    exact.foreach { case (k, v) =>
      withClue(s"$k: ") { est(k) should be >= v }
    }
    // 6 keys into 4 rows x 4096 buckets: collision probability is
    // negligible and the hash is FIXED - assert exact equality
    est shouldBe exact
  }

  test("width 1 collapses every counter to the total mass (the degenerate upper bound)") {
    val total = keyed.agg(sum($"cnt")).head().getLong(0)
    estimates(depth = 3, width = 1).values.foreach(_ shouldBe total)
  }

  test("sketch is partition-order independent (counter sums commute)") {
    estimates(4, 64, keyed.repartition(7)) shouldBe estimates(4, 64, keyed.coalesce(1))
  }

  test("rejects degenerate dimensions") {
    an[IllegalArgumentException] should be thrownBy
      Sketch.cmsCounters(keyed, "tok", "cnt", depth = 0, width = 16)
  }

  test("querying a key the sketch never counted estimates 0 (left join), not a dropped row") {
    val counters = Sketch.cmsCounters(keyed, "tok", "cnt", depth = 4, width = 4096)
    val queries = Seq(("alpha", 0L), ("never-counted-key", 0L)).toDF("tok", "cnt")
    val est = Sketch.cmsEstimate(queries, "tok", counters, 4, 4096)
      .select($"tok", $"cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.size shouldBe 2 // the absent key SURVIVES the join
    est("alpha") shouldBe 100L
    // 6 keys in 4x4096 buckets: the absent key's buckets are empty
    // with near-certainty under the fixed hash — estimate 0
    est("never-counted-key") shouldBe 0L
  }

  test("rejects scratch/output column collisions") {
    val counters = Sketch.cmsCounters(keyed, "tok", "cnt", depth = 2, width = 16)
    an[IllegalArgumentException] should be thrownBy
      Sketch.cmsEstimate(keyed.withColumn("cms_est", lit(1L)), "tok",
        counters, 2, 16)
  }
}
