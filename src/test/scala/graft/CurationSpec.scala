package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Training-data curation: benchmark decontamination and per-group
  * quota capping.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate drops exact and near matches of the benchmark set, keeps the rest, reports best contaminant") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different text about data pipelines"),
      (4L, "tiny"),                                        // < n tokens: unshingleable, always kept
      (5L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
    ).toDF("doc_id", "text")
    val contam = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bench_id", "bench_text")
    val (kept, dropped) = Curation.decontaminate(docs, "doc_id", "text",
      contam, "bench_id", "bench_text", n = 2, t = 0.5)
    val droppedRows = dropped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    droppedRows.map(_._1).toSeq shouldBe Seq(1L, 2L, 5L)
    droppedRows.foreach(_._2 shouldBe 100L)
    droppedRows(0)._3 shouldBe 1.0                      // exact
    droppedRows(1)._3 shouldBe (7.0 / 9.0) +- 1e-12     // near-dup
    droppedRows(2)._3 shouldBe 1.0                      // exact dup
    kept.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(3L, 4L)
  }

  test("decontaminate ties on jaccard break by contaminant id (duplicate benchmark docs)") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val contam = Seq((9L, "a b c d e"), (7L, "a b c d e"))
      .toDF("bench_id", "bench_text")
    val (_, dropped) = Curation.decontaminate(docs, "doc_id", "text",
      contam, "bench_id", "bench_text", n = 2, t = 0.5)
    val r = dropped.collect()(0)
    r.getLong(1) shouldBe 7L // smaller contaminant id wins the J=1 tie
  }

  test("capPerGroup keeps the deterministic top-quota per group") {
    val docs = Seq(
      ("web", 1L, 0.9), ("web", 2L, 0.8), ("web", 3L, 0.7), ("web", 4L, 0.95),
      ("code", 5L, 0.5), ("code", 6L, 0.6),
      ("math", 7L, 0.3)
    ).toDF("domain", "doc_id", "quality")
    val capped = Curation.capPerGroup(docs, Seq("domain"),
      Seq(col("quality").desc, col("doc_id").asc), quota = 2)
    capped.count() shouldBe 5
    capped.filter($"domain" === "web").select($"doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 4L)
    // working columns are internal only, and their namespace is guarded
    capped.columns.exists(_.startsWith("__cap_")) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      Curation.capPerGroup(docs.withColumn("__cap_pid", lit(1)),
        Seq("domain"), Seq(col("quality").desc), quota = 1)
    // the two-phase pruning is exact regardless of input partitioning:
    // a hot group spread over many partitions yields the same top-N
    val hot = (1 to 500).map(i => ("hot", i.toLong, (i % 97).toDouble))
      .toDF("domain", "doc_id", "quality")
    val expectTop = (1 to 500).map(i => (i.toLong, (i % 97).toDouble))
      .sortBy { case (id, q) => (-q, id) }.take(7).map(_._1).toSet
    Curation.capPerGroup(hot.repartition(13), Seq("domain"),
        Seq(col("quality").desc, col("doc_id").asc), quota = 7)
      .select($"doc_id").collect().map(_.getLong(0)).toSet shouldBe expectTop
    // deterministic on quality ties: id ascending wins
    val tied = Seq(("d", 10L, 0.5), ("d", 11L, 0.5), ("d", 12L, 0.5))
      .toDF("domain", "doc_id", "quality")
    Curation.capPerGroup(tied, Seq("domain"),
        Seq(col("quality").desc, col("doc_id").asc), quota = 2)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(10L, 11L)
  }

  test("capPerGroup's pre-pass actually prunes a skewed group before the global window") {
    // one domain holds 90% of a 20 000-row input spread over 16
    // partitions: the global per-group window must never see the hot
    // group's 18 000 rows — only each sub-partition's local top-quota
    val quota = 10
    val nParts = 16
    val rows = (1 to 20000).map { i =>
      val domain = if (i % 10 == 0) s"cold-${i % 7}" else "hot.com"
      (domain, i.toLong, (i % 9973).toDouble)
    }
    val df = rows.toDF("domain", "doc_id", "quality").repartition(nParts)
    val order = Seq(col("quality").desc, col("doc_id").asc)
    val prePassRows = Curation.capPrePass(df, Seq("domain"), order, quota).count()
    // pruning bound: ≤ quota × partitions per group (8 groups total),
    // i.e. ≤ 1 280 of 20 000 survive — the hot group contributes at
    // most 160 rows to the global sort instead of 18 000
    prePassRows should be <= (quota.toLong * nParts * 8)
    prePassRows should be < 2000L
    // and the capped output is the exact deterministic top-quota
    val got = Curation.capPerGroup(df, Seq("domain"), order, quota)
      .select($"domain", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (d, rs) =>
      rs.sortBy { case (_, id, q) => (-q, id) }.take(quota)
        .map(r => (d, r._2))
    }.toSet
    got shouldBe expect
  }
}
