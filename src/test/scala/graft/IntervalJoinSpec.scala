package graft

import java.sql.Timestamp
import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

/** Point-in-interval join: bucketed equi-join must equal the naive
  * range join — [start, end) boundary semantics, 1:N multiplicity with
  * no duplicate pairs, degenerate intervals dropped.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("boundary semantics: start inclusive, end exclusive, keyed, 1:N with no dup pairs") {
    val points = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // == start -> matches w10
      (2L, "u1", ts("2024-01-01 10:30:00")), // inside w10, and w10b (overlap)
      (3L, "u1", ts("2024-01-01 11:00:00")), // == end of w10 -> NOT w10; == start of w11
      (4L, "u2", ts("2024-01-01 10:30:00")), // right time, wrong key
      (5L, "u1", ts("2024-01-01 09:59:59"))  // before everything
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      ("w10",  "u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("w10b", "u1", ts("2024-01-01 10:15:00"), ts("2024-01-01 10:45:00")),
      ("w11",  "u1", ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")),
      ("wdeg", "u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"))
    ).toDF("win_id", "user_id", "w_start", "w_end")

    val out = IntervalJoin.pointInInterval(points, "ts",
        intervals, "w_start", "w_end", Seq("user_id"),
        widthMicros = 10L * 60 * 1000000) // 10 min buckets < interval len
      .select($"event_id", $"win_id").as[(Long, String)]
      .collect().toSet

    out shouldBe Set((1L, "w10"), (2L, "w10"), (2L, "w10b"), (3L, "w11"))
  }

  test("property: equals naive cross-join range filter at widths straddling interval lengths") {
    val rnd = new scala.util.Random(59)
    val base = ts("2024-01-01 00:00:00").getTime
    val points = Seq.tabulate(300)(i => (i.toLong, s"k${rnd.nextInt(5)}",
      new Timestamp(base + rnd.nextInt(86400) * 1000L)))
      .toDF("event_id", "key", "ts")
    val intervals = Seq.tabulate(80) { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      // lengths 0..4h straddle every tested width; 0 => degenerate
      (i.toLong, s"k${rnd.nextInt(5)}", new Timestamp(s),
        new Timestamp(s + rnd.nextInt(5) * 3600L * 1000L))
    }.toDF("win_id", "key", "w_start", "w_end")

    val expected = points.as("p").crossJoin(intervals.as("i"))
      .filter($"p.key" === $"i.key" &&
        $"p.ts" >= $"i.w_start" && $"p.ts" < $"i.w_end")
      .select($"event_id", $"win_id").as[(Long, Long)].collect().toSet

    // widths: far below, at, and far above the typical interval length
    for (widthSec <- Seq(60L, 3600L, 24 * 3600L)) {
      val got = IntervalJoin.pointInInterval(points, "ts",
          intervals, "w_start", "w_end", Seq("key"), widthSec * 1000000L)
        .select($"event_id", $"win_id").as[(Long, Long)].collect()
      withClue(s"width=${widthSec}s: ") {
        got.length shouldBe got.toSet.size // no duplicate pairs, ever
        got.toSet shouldBe expected
      }
    }
  }

  test("plan shape: the range join is an equi-join — no nested loop, no cartesian") {
    val points = Seq((1L, "k", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "key", "ts")
    val intervals = Seq((1L, "k", ts("2024-01-01 10:00:00"),
      ts("2024-01-01 11:00:00"))).toDF("win_id", "key", "w_start", "w_end")
    val plan = IntervalJoin.pointInInterval(points, "ts",
        intervals, "w_start", "w_end", Seq("key"), 60L * 1000000)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("colliding non-key columns are rejected, non-positive width is rejected") {
    val p = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("id", "ts")
    val i = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("id", "ts", "w_end") // "ts" collides
    an[IllegalArgumentException] should be thrownBy
      IntervalJoin.pointInInterval(p, "ts", i, "ts", "w_end", Seq("id"), 1000L)
    val iOk = i.withColumnRenamed("ts", "w_start")
    an[IllegalArgumentException] should be thrownBy
      IntervalJoin.pointInInterval(p, "ts", iOk, "w_start", "w_end", Seq("id"), 0L)
  }
}
