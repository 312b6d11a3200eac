package graft

import java.sql.Timestamp
import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Gap-based sessionization: strictly-greater-than-gap opens a session,
  * exact-gap does not, numbering is per-key and deterministic under
  * equal timestamps via the tie-breaker.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("boundaries: exact gap stays, gap+1us splits, numbering is per-key and 1-based") {
    val gapMicros = 30L * 60 * 1000000
    val rows = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:30:00")),        // exactly 30min -> same
      (3L, "u1", ts("2024-01-01 11:00:00.000001")), // 30min + 1us -> new
      (4L, "u1", ts("2024-01-01 12:00:00")),        // 1h -> new
      (5L, "u2", ts("2024-01-01 10:00:00"))         // other key restarts at 1
    ).toDF("event_id", "user_id", "ts")

    val out = Sessionize.assign(rows, Seq("user_id"), "ts",
        Seq("event_id"), gapMicros)
      .select($"event_id", $"session_seq").as[(Long, Long)]
      .collect().toMap

    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 1L)
  }

  test("equal timestamps order by the tie-breaker: session split lands deterministically") {
    // three rows share one ts; with gap 0, strictly-greater means the
    // duplicates stay in ONE session and the later row opens the next
    val rows = Seq(
      (3L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (4L, ts("2024-01-01 10:00:01"))
    ).toDF("event_id", "ts").withColumn("k", lit("u"))
    val out = Sessionize.assign(rows, Seq("k"), "ts", Seq("event_id"), 0L)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
  }

  test("batch sessions ≡ Spark session_window sessions, INCLUDING the exact-gap boundary") {
    // both conventions split only when the gap is STRICTLY greater:
    // an event at exactly prev+gap merges in session_window (probed:
    // [10:00:00, 10:00:30, +60s] -> sessions of 2 and 1) and stays in
    // Sessionize.assign — so batch and streaming agree everywhere,
    // boundary included
    val rnd = new scala.util.Random(61)
    val base = ts("2024-01-01 00:00:00").getTime
    val gapSec = 30L
    // second-aligned with duplicates and exact-gap deltas guaranteed
    val rows = Seq.tabulate(300)(i => (i.toLong, s"u${rnd.nextInt(4)}",
      new Timestamp(base + rnd.nextInt(240) * gapSec * 500L)))
    val df = rows.toDF("event_id", "key", "ts")

    val batch = Sessionize.assign(df, Seq("key"), "ts", Seq("event_id"),
        gapSec * 1000000L)
      .groupBy($"key", $"session_seq")
      .agg(min($"ts").as("start"), count(lit(1)).as("n"))
      .select($"key", $"start", $"n")
      .as[(String, Timestamp, Long)].collect().toSet

    val streaming = graft.streaming.StreamingOps.sessionAgg(df, "ts", "key",
        s"$gapSec seconds", "1 second", Seq(count(lit(1)).as("n")))
      .select($"key", $"session_start", $"n")
      .as[(String, Timestamp, Long)].collect().toSet

    streaming shouldBe batch
  }

  test("property: session count per key equals 1 + number of over-gap adjacent deltas") {
    val rnd = new scala.util.Random(60)
    val base = ts("2024-01-01 00:00:00").getTime
    val gapMicros = 600L * 1000000 // 10 min
    val rows = Seq.tabulate(400)(i => (i.toLong, s"k${rnd.nextInt(6)}",
      new Timestamp(base + rnd.nextInt(86400) * 1000L)))
    val df = rows.toDF("event_id", "key", "ts")

    val got = Sessionize.assign(df, Seq("key"), "ts", Seq("event_id"), gapMicros)
      .groupBy($"key").agg(max($"session_seq").as("n_sessions"))
      .as[(String, Long)].collect().toMap

    val expected = rows.groupBy(_._2).map { case (k, rs) =>
      val sorted = rs.map(r => (r._3.getTime * 1000L, r._1)).sorted
      k -> (1L + sorted.sliding(2).count {
        case Seq((a, _), (b, _)) => b - a > gapMicros
        case _ => false
      })
    }
    got shouldBe expected
  }
}
