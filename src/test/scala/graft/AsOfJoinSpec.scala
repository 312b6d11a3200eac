package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

/** As-of join semantics: latest right row with ts <= left.ts per key
  * (<= like DuckDB ASOF / pandas merge_asof), null when nothing
  * precedes.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf picks the latest preceding right row per key, equal-ts matches, no-predecessor is null") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:10")),
      (2L, "A", ts("2024-01-01 10:00:20")),
      (3L, "B", ts("2024-01-01 10:00:05")),
      (4L, "B", ts("2024-01-01 10:00:30"))
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100L, 1.0),
      ("A", ts("2024-01-01 10:00:20"), 101L, 2.0),  // equal ts -> matches trade 2
      ("B", ts("2024-01-01 10:00:10"), 200L, 3.0)   // after trade 3 -> trade 3 unmatched
    ).toDF("sym", "ts", "quote_id", "px")

    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts",
        payloadCols = Seq("quote_id", "px"))
      .orderBy($"trade_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))

    out.toSeq shouldBe Seq(
      (1L, 100L, 1.0),  // latest quote at/before 10:00:10 is 10:00:00
      (2L, 101L, 2.0),  // equal timestamp matches (<= semantics)
      (3L, -1L, -1.0),  // no quote precedes
      (4L, 200L, 3.0))
  }

  test("asOf keys are isolated: right rows never leak across keys") {
    val left = Seq(("X", ts("2024-01-01 00:00:10"), 1L)).toDF("k", "ts", "id")
    val right = Seq(("Y", ts("2024-01-01 00:00:00"), 9L)).toDF("k", "ts", "id")
    val out = AsOfJoin.asOf(left, right, "k", "ts", payloadCols = Seq("id"))
    out.count() shouldBe 1
    out.collect()(0).isNullAt(out.columns.indexOf("asof_id")) shouldBe true
  }
}
