package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.GapFill

/** Hand-computed golden tests for gap-fill interpolation
  * (ref interpolationType.ts:16: None | Linear | Null | Previous).
  */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** key k1: days 1,3,6 present (2,4,5 missing); k2: single day. */
  private lazy val sparse = Seq(
    ("k1", ts("2024-01-01 00:00:00"), Some(10.0)),
    ("k1", ts("2024-01-03 00:00:00"), Some(30.0)),
    ("k1", ts("2024-01-06 00:00:00"), Some(60.0)),
    ("k2", ts("2024-01-02 00:00:00"), Some(5.0))
  ).toDF("k", "day", "v")

  test("densify: every key gets its own min..max daily spine, values null in gaps") {
    val dense = GapFill.densify(sparse, "k", "day", "INTERVAL 1 DAY")
    dense.count() shouldBe 7 // k1: 6 days, k2: 1 day
    dense.filter($"v".isNull).count() shouldBe 3 // k1 days 2,4,5
    // spine is per-key: k2 has no rows on k1's range
    dense.filter($"k" === "k2").count() shouldBe 1
  }

  test("fillPrevious carries last non-null forward (W3 frame semantics)") {
    val dense = GapFill.densify(sparse, "k", "day", "INTERVAL 1 DAY")
    val out = GapFill.fillPrevious(dense, "k", "day", "v", "filled")
      .filter($"k" === "k1").orderBy($"day")
      .collect().map(_.getDouble(3)).toSeq
    out shouldBe Seq(10.0, 10.0, 30.0, 30.0, 30.0, 60.0)
  }

  test("fillLinear interpolates proportionally between surrounding points") {
    val dense = GapFill.densify(sparse, "k", "day", "INTERVAL 1 DAY")
    val out = GapFill.fillLinear(dense, "k", "day", "v", "filled")
      .filter($"k" === "k1").orderBy($"day")
      .collect().map(_.getDouble(3)).toSeq
    // day2 = 10 + (30-10) * 1/2 = 20; day4 = 30 + (60-30)*1/3 = 40; day5 = 50
    out(0) shouldBe 10.0
    out(1) shouldBe 20.0 +- 1e-9
    out(2) shouldBe 30.0
    out(3) shouldBe 40.0 +- 1e-9
    out(4) shouldBe 50.0 +- 1e-9
    out(5) shouldBe 60.0
  }

  test("fillLinear edge extension: flat beyond first/last known value") {
    val edges = Seq(
      ("e", ts("2024-01-01 00:00:00"), None: Option[Double]),
      ("e", ts("2024-01-02 00:00:00"), Some(7.0)),
      ("e", ts("2024-01-03 00:00:00"), None: Option[Double])
    ).toDF("k", "day", "v")
    val out = GapFill.fillLinear(edges, "k", "day", "v", "filled")
      .orderBy($"day")
      .collect().map(_.getDouble(3)).toSeq
    out shouldBe Seq(7.0, 7.0, 7.0) // left edge takes next, right edge takes prev
  }

  test("densify keeps groups whose key is NULL (null-safe spine join)") {
    // a group-by tag absent from some points is a real group; a plain
    // equi-join would never match null = null and the group's values
    // would all come back null after densification
    val df = Seq(
      (Some("a"), ts("2024-01-01 00:00:00"), Some(1.0)),
      (Some("a"), ts("2024-01-03 00:00:00"), Some(3.0)),
      (None: Option[String], ts("2024-01-01 00:00:00"), Some(10.0)),
      (None: Option[String], ts("2024-01-02 00:00:00"), Some(20.0))
    ).toDF("k", "day", "v")
    val dense = GapFill.densify(df, "k", "day", "INTERVAL 1 DAY")
    // the null-key group survives with its VALUES intact
    val nullGroup = dense.filter($"k".isNull).orderBy($"day")
      .collect().map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    nullGroup.toSeq shouldBe Seq(Some(10.0), Some(20.0))
    // and the named group still densifies its gap
    dense.filter($"k" === "a").count() shouldBe 3
  }
}
