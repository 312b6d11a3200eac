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

  test("asOf property: equals brute-force latest-preceding on random data, any partitioning") {
    val rnd = new scala.util.Random(23)
    val keys = Seq("a", "b", "c", "d")
    val leftRows = Seq.fill(120)((keys(rnd.nextInt(4)),
      rnd.nextInt(1000).toLong, rnd.nextLong()))
    val rightRows = Seq.fill(80)((keys(rnd.nextInt(4)),
      rnd.nextInt(1000).toLong, rnd.nextLong()))
    // distinct right (key, ts) so the engine-defined winner on duplicate
    // right timestamps cannot diverge from the reference computation
    val right = rightRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val lDf = leftRows.toDF("k", "ts", "lid").repartition(7)
    val rDf = right.toDF("k", "ts", "rid").repartition(3)
    val got = AsOfJoin.asOf(lDf, rDf, "k", "ts", payloadCols = Seq("rid"))
      .select($"k", $"ts", $"lid", $"asof_rid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    got.length shouldBe 120
    val expected = leftRows.map { case (k, t, lid) =>
      val prev = right.filter(q => q._1 == k && q._2 <= t)
      (k, t, lid, if (prev.isEmpty) None else Some(prev.maxBy(_._2)._3))
    }
    got.sortBy(r => (r._1, r._2, r._3)).toSeq shouldBe
      expected.sortBy(r => (r._1, r._2, r._3))
  }

  test("asOf keys are isolated: right rows never leak across keys") {
    val left = Seq(("X", ts("2024-01-01 00:00:10"), 1L)).toDF("k", "ts", "id")
    val right = Seq(("Y", ts("2024-01-01 00:00:00"), 9L)).toDF("k", "ts", "id")
    val out = AsOfJoin.asOf(left, right, "k", "ts", payloadCols = Seq("id"))
    out.count() shouldBe 1
    out.collect()(0).isNullAt(out.columns.indexOf("asof_id")) shouldBe true
  }
}
