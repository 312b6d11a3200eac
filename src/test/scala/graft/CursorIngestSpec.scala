package graft

import java.nio.file.Files
import graft.sources.CursorIngest

/** Incremental REST-polling emulation (S4/S5): cursor = max(ts)+ in
  * the sink, repeated polls are idempotent, new data ingests
  * incrementally (ref news/main.py:45-95,
  * darkpool_trades/main.py:157-179).
  */
class CursorIngestSpec extends SparkSpec {
  import spark.implicits._

  test("pollOnce ingests all on first run, nothing on re-poll, only new rows after") {
    val sink = Files.createTempDirectory("cursor_sink").toString + "/data"

    // cycle 1: backfill page
    val page1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("ts", "payload")
    CursorIngest.cursor(spark, sink, "ts") shouldBe None
    CursorIngest.pollOnce(spark, page1, sink, "ts") shouldBe 3L
    CursorIngest.cursor(spark, sink, "ts") shouldBe Some(3L)

    // cycle 2: same page again — at-least-once source, exactly-once effect
    CursorIngest.pollOnce(spark, page1, sink, "ts") shouldBe 0L
    spark.read.parquet(sink).count() shouldBe 3

    // cycle 3: overlapping page with 2 new rows
    val page2 = Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("ts", "payload")
    CursorIngest.pollOnce(spark, page2, sink, "ts") shouldBe 2L
    val rows = spark.read.parquet(sink).orderBy($"ts")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    rows.toSeq shouldBe Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
  }

  test("page boundary through cursor-timestamp ties loses no rows") {
    // 6 rows share ts=100; pageLimit 4 cuts through the tie group. The
    // page must extend to the whole tie group (cursor = max(ts) ingested;
    // the next poll filters strictly ts > cursor, so cut-off ties would
    // otherwise be skipped forever).
    val sink = Files.createTempDirectory("cursor_tie").toString + "/data"
    val src = ((1 to 6).map(i => (100L, s"tie$i")) ++
      Seq((200L, "after1"), (300L, "after2"))).toDF("ts", "payload")
    val first = CursorIngest.pollOnce(spark, src, sink, "ts", pageLimit = Some(4))
    first shouldBe 6L // the full tie group, not a truncated 4
    CursorIngest.backfill(spark, src, sink, "ts", pageLimit = 4) shouldBe 2L
    spark.read.parquet(sink).count() shouldBe 8
    // idempotent after drain
    CursorIngest.pollOnce(spark, src, sink, "ts", pageLimit = Some(4)) shouldBe 0L
  }

  test("backfill pages oldest-first with a limit until drained (O3/S5, ref darkpool main.py:157-179)") {
    val sink = Files.createTempDirectory("cursor_bf").toString + "/data"
    val src = (1L to 23L).map(i => (i, s"r$i")).toDF("ts", "payload")
    CursorIngest.backfill(spark, src, sink, "ts", pageLimit = 10) shouldBe 23L
    spark.read.parquet(sink).count() shouldBe 23
    // pages were ordered: cursor after page 1 must be 10 (oldest-first)
    val again = CursorIngest.backfill(spark, src, sink, "ts", pageLimit = 10)
    again shouldBe 0L
  }
}
