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

  test("decontaminateSemantic drops by embedding cosine, reports the best contaminant, keeps the dissimilar") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),   // identical to contaminant 100
      (2L, Seq(0.9f, 0.1f, 0.0f)),   // near contaminant 100
      (3L, Seq(0.0f, 0.0f, 1.0f)),   // orthogonal: kept
      (4L, Seq(0.0f, 1.0f, 0.0f))    // orthogonal: kept
    ).toDF("vec_id", "embedding")
    val contam = Seq((100L, Seq(1.0f, 0.0f, 0.0f)))
      .toDF("cid", "cvec")
    val (kept, dropped) = Curation.decontaminateSemantic(
      e, "vec_id", "embedding", contam, "cid", "cvec", t = 0.6)
    val d = dropped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    d.map(_._1).toSeq shouldBe Seq(1L, 2L)
    d.foreach(_._2 shouldBe 100L)
    d(0)._3 shouldBe 1.0 // identical vector clamps to exactly 1.0
    d(1)._3 should (be > 0.9 and be <= 1.0)
    kept.select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
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

  test("sampleStratified: deterministic, layout-independent, nested across rates, exact-rate strata honored") {
    val rows = (1L to 2000L).map(id =>
      (id, if (id % 4 == 0) "hot" else if (id % 4 == 1) "drop" else "rest"))
    val df = rows.toDF("doc_id", "source")
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select($"doc_id").collect().map(_.getLong(0)).toSet
    val sampled = ids(Curation.sampleStratified(df, "doc_id", "source",
      Map("hot" -> 0.25, "drop" -> 0.0), defaultRate = 1.0))
    // rate 0 drops the stratum entirely; rate 1 keeps it entirely
    sampled.count(id => id % 4 == 1) shouldBe 0
    rows.filter(_._2 == "rest").map(_._1).forall(sampled.contains) shouldBe true
    // the 0.25 stratum lands near its rate (binomial on 500 trials)
    val hotKept = sampled.count(id => id % 4 == 0)
    hotKept.toDouble / 500 shouldBe 0.25 +- 0.07
    // layout independence: a different partitioning keeps the SAME rows
    val repartitioned = ids(Curation.sampleStratified(df.repartition(17),
      "doc_id", "source", Map("hot" -> 0.25, "drop" -> 0.0), defaultRate = 1.0))
    repartitioned shouldBe sampled
    // nesting: halving a rate keeps a subset of the higher-rate sample
    val halved = ids(Curation.sampleStratified(df, "doc_id", "source",
      Map("hot" -> 0.125, "drop" -> 0.0), defaultRate = 1.0))
    halved.filter(id => id % 4 == 0)
      .subsetOf(sampled.filter(id => id % 4 == 0)) shouldBe true
  }

  test("perplexityBuckets: tercile thresholds are exact order statistics; buckets partition; rates apply per bucket") {
    // 9 docs: three fluency tiers by construction — repeated common
    // tokens (low NLL), mixed, and unique-token docs (high NLL)
    val docs = (1L to 9L).map { i =>
      val text =
        if (i <= 3) "the the the the the the"          // head: max-freq tokens
        else if (i <= 6) s"the the common word w$i x$i" // middle
        else s"a$i b$i c$i d$i e$i f$i"                 // tail: all-unique
      (i, text)
    }.toDF("doc_id", "text")
    val all = Curation.perplexityBuckets(docs, "doc_id", "text",
      sampleCap = 1000L, // stride 1: every doc in the threshold sample
      rates = Map("head" -> 1.0, "middle" -> 1.0, "tail" -> 1.0))
      .select("id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // rate 1.0 everywhere → the bucketing itself is exposed: with m=9,
    // k1 = ceil(9/3) = 3rd and k2 = 6th smallest NLL → 3/3/3 split
    all.keySet shouldBe (1L to 9L).toSet
    (1L to 3L).foreach(i => all(i) shouldBe "head")
    (4L to 6L).foreach(i => all(i) shouldBe "middle")
    (7L to 9L).foreach(i => all(i) shouldBe "tail")
    // per-bucket rates ride the same md5 coin as sampleStratified: a
    // dropped-tail run keeps head/middle untouched and only thins tail
    val thinned = Curation.perplexityBuckets(docs, "doc_id", "text",
      sampleCap = 1000L,
      rates = Map("head" -> 1.0, "middle" -> 1.0, "tail" -> 0.0))
      .collect().map(_.getLong(0)).toSet
    thinned shouldBe (1L to 6L).toSet
    // the score-once split: perplexityBucketsWith under a caller-owned
    // pre-scored table returns row-for-row what the one-shot entry
    // point returns (the seam consumers' equivalence, pinned at unit
    // scale; the oracle gates pin it at corpus scale)
    val scored = operators.TextAnalysis
      .unigramLogProb(docs, "doc_id", "text")
    val viaWith = Curation.perplexityBucketsWith(scored,
        sampleCap = 1000L,
        rates = Map("head" -> 1.0, "middle" -> 1.0, "tail" -> 1.0))
      .select("id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    viaWith shouldBe all
    // direct unigramLogProb callers own the persisted score table —
    // release it or it leaks into the shared-session suite cache
    scored.unpersist(blocking = false)
  }

  test("plan shapes: sampleStratified adds NO shuffle; packShards adds exactly one (the per-group window)") {
    val df = (1L to 100L).map(id => (id, "s" + (id % 4), 10L))
      .toDF("doc_id", "source", "n_tok")
    def exchanges(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange"))
    // a mixture-sampling pass over 100 TB must stay a pure scan+filter
    exchanges(Curation.sampleStratified(df, "doc_id", "source",
      Map("s0" -> 0.5), 0.25)) shouldBe 0
    // packing shuffles ONCE on the group key; no extra sort/exchange
    exchanges(Curation.packShards(df, "source", "doc_id", "n_tok", 100L)) shouldBe 1
  }

  test("splitByHash: disjoint+exhaustive, layout-independent, prefix-nested, salt-decorrelated, shuffle-free") {
    val df = (1L to 2000L).map(id => (id, s"s${id % 3}")).toDF("doc_id", "source")
    def assign(d: org.apache.spark.sql.DataFrame) =
      d.select($"doc_id", $"split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assign(Curation.splitByHash(df, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)))
    // exhaustive: every row gets exactly one of the declared names
    base.keySet shouldBe (1L to 2000L).toSet
    base.values.toSet shouldBe Set("train", "val", "test")
    // fractions land near their targets (binomial on 2000 trials)
    base.values.count(_ == "train").toDouble / 2000 shouldBe 0.9 +- 0.03
    // layout independence: repartitioning cannot move a row's split
    assign(Curation.splitByHash(df.repartition(17), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))) shouldBe base
    // prefix nesting: growing train only absorbs rows from later splits
    val grown = assign(Curation.splitByHash(df, "doc_id",
      Seq("train" -> 0.95, "val" -> 0.025, "test" -> 0.025)))
    base.filter(_._2 == "train").keySet
      .subsetOf(grown.filter(_._2 == "train").keySet) shouldBe true
    // salted coin: split assignment is independent of the sampling coin
    // (an unsalted coin would make e.g. every sampleStratified-kept row
    // pile into the early splits)
    val sampled = Curation.sampleStratified(df, "doc_id", "source",
      Map.empty, defaultRate = 0.1)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val trainRateInSample =
      sampled.count(id => base(id) == "train").toDouble / sampled.size
    trainRateInSample shouldBe 0.9 +- 0.07
    // scale shape: a pure per-row projection — zero exchanges
    Curation.splitByHash(df, "doc_id", Seq("train" -> 1.0))
      .queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange")) shouldBe 0
  }

  test("splitByHash rejects bad fraction lists and a preexisting split column") {
    val df = Seq((1L, "a")).toDF("doc_id", "source")
    an[IllegalArgumentException] should be thrownBy
      Curation.splitByHash(df, "doc_id", Seq("train" -> 0.5, "val" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      Curation.splitByHash(df, "doc_id", Seq("a" -> 0.5, "a" -> 0.5))
    an[IllegalArgumentException] should be thrownBy
      Curation.splitByHash(df, "doc_id", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Curation.splitByHash(df.withColumn("split", lit("x")), "doc_id",
        Seq("train" -> 1.0))
  }

  test("splitOverlapAudit: per-audit-doc containment matches a driver-side reference; bloom prune keeps exactness") {
    // split assignment is the md5 coin, so derive it first and build
    // the reference from the SAME assignment the operator will compute
    val ids = (1L to 40L)
    val asg = Curation.splitByHash(ids.map(id => (id, "")).toDF("doc_id", "t"),
        "doc_id", Seq("train" -> 0.5, "val" -> 0.5))
      .select($"doc_id", $"split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // two doc shapes: a fully-shared phrase vs a shared prefix plus
    // doc-unique tail → val docs land on distinct overlap rates
    val texts = ids.map { id =>
      (id, if (id % 3 == 0) "a b c d e" else s"a b c u$id v$id")
    }
    def sh2(t: String) = t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val trainSet = texts.filter(t => asg(t._1) == "train")
      .flatMap(t => sh2(t._2)).toSet
    val expected = texts.filter(t => asg(t._1) == "val").map { case (id, t) =>
      val sh = sh2(t); val hit = sh.count(trainSet.contains).toLong
      id -> ((sh.size.toLong, hit, hit.toDouble / sh.size))
    }.toMap
    expected.values.map(_._2).toSet.size should be > 1 // non-degenerate corpus
    val got = Curation.splitOverlapAudit(texts.toDF("doc_id", "text"),
        "doc_id", "text", Seq("train" -> 0.5, "val" -> 0.5), n = 2,
        trainName = "train", auditName = "val")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe expected
  }

  test("epochPlan: temperature shares, budget floors, and the epoch cap match a driver-side reference") {
    val rows = Seq.fill(4)(("a", 2000L)) ++ Seq.fill(2)(("b", 1000L)) ++
      Seq(("c", 10L))
    val out = Curation.epochPlan(rows.toDF("source", "n_tok"),
        "source", "n_tok", alpha = 0.5, budgetTokens = 5000L, maxEpochs = 4.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5)))).toMap
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val masses = Map("a" -> 8000L, "b" -> 2000L, "c" -> 10L)
    val total = masses.values.sum.toDouble
    val wts = masses.map { case (k, t) => k -> r9(math.pow(t / total, 0.5)) }
    val wsum = wts.values
      .map(BigDecimal(_).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    masses.foreach { case (k, t) =>
      val target = math.floor(5000.0 * (wts(k) / wsum)).toLong
      out(k) shouldBe ((if (k == "a") 4L else if (k == "b") 2L else 1L, t,
        wts(k), target, r9(math.min(4.0, target.toDouble / t))))
    }
    out("c")._5 shouldBe 4.0 // the repetition cap engages for the tiny source
    // floors can only under-spend: planned tokens never exceed budget
    out.values.map(_._4).sum should be <= 5000L
  }

  test("sampleStratified rejects rates outside [0,1]") {
    val df = Seq((1L, "a")).toDF("doc_id", "source")
    an[IllegalArgumentException] should be thrownBy
      Curation.sampleStratified(df, "doc_id", "source", Map("a" -> 1.5), 0.5)
    an[IllegalArgumentException] should be thrownBy
      Curation.sampleStratified(df, "doc_id", "source", Map.empty, -0.1)
  }

  test("packShards: exclusive-cumsum packing matches a driver-side greedy pack; oversized docs land alone") {
    val rows = Seq(
      // group g1: 600+600+600 -> shard 0 holds docs 1,2 (1200), doc 3
      // starts at 1200 < 2000 so ALSO shard 0 (overshoot to 1800)
      ("g1", 1L, 600L), ("g1", 2L, 600L), ("g1", 3L, 600L),
      // doc 4 starts at 1800 -> still shard 0; doc 5 at 2300 -> shard 1
      ("g1", 4L, 500L), ("g1", 5L, 100L),
      // group g2: an oversized doc occupies its own shard range
      ("g2", 1L, 5000L), ("g2", 2L, 100L), ("g2", 3L, 100L)
    ).toDF("source", "doc_id", "n_tok")
    val got = Curation.packShards(rows, "source", "doc_id", "n_tok", 2000L)
      .select($"source", $"doc_id", $"shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 0L), ("g1", 4L, 0L),
      ("g1", 5L, 1L),
      ("g2", 1L, 0L), ("g2", 2L, 2L), ("g2", 3L, 2L))
    // shard totals can overshoot by at most the last doc (docs unsplit):
    // g1 shard 0 = 2300 <= 2000 + 600
  }

  test("salted packing (the documented hot-group relaxation) keeps the shard invariants") {
    // the packShards scaladoc claims pre-salting the group key yields
    // valid shards while relaxing which docs share one — pin it: pack
    // under (source, doc_id % 4) and check every doc is assigned once
    // and every (group, salt, shard) stays within budget + its max doc
    val rnd = new scala.util.Random(7)
    val rows = for (id <- 1L to 400L)
      yield ("hot", id, 50L + rnd.nextInt(300).toLong)
    val budget = 1000L
    val salted = rows.toDF("source", "doc_id", "n_tok")
      .withColumn("salted_source",
        concat_ws("#", $"source", $"doc_id" % 4))
    val got = Curation.packShards(salted, "salted_source", "doc_id",
        "n_tok", budget)
      .collect().map(r => (r.getString(3), r.getLong(1), r.getLong(2), r.getLong(4)))
    got.length shouldBe rows.length
    got.groupBy(g => (g._1, g._4)).foreach { case ((grp, shard), docs) =>
      withClue(s"$grp shard $shard: ") {
        docs.map(_._3).sum should be <= (budget + docs.map(_._3).max)
      }
    }
    // and the salt spread the hot group across 4 independent packings
    got.map(_._1).distinct.length shouldBe 4
  }

  test("packShards property: every doc assigned once; shard sums bounded by budget + max doc; shards contiguous in id order") {
    val rnd = new scala.util.Random(42)
    val rows = for (g <- Seq("a", "b"); id <- 1L to 300L)
      yield (g, id, 1L + rnd.nextInt(400).toLong)
    val budget = 1000L
    val got = Curation.packShards(rows.toDF("source", "doc_id", "n_tok"),
        "source", "doc_id", "n_tok", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.length shouldBe rows.length // every doc exactly once
    got.groupBy(g => (g._1, g._4)).foreach { case ((src, shard), docs) =>
      val total = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      withClue(s"$src shard $shard: ") {
        total should be <= (budget + maxDoc)
      }
    }
    // contiguity: within a group, shard index is non-decreasing in id
    for (g <- Seq("a", "b")) {
      val shardsInOrder = got.filter(_._1 == g).sortBy(_._2).map(_._4)
      shardsInOrder.sliding(2).foreach { w =>
        if (w.length == 2) w(0) should be <= w(1)
      }
    }
  }

  test("redactPii: typed placeholders, progressive replacement counts, conservative boundaries") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a.b+c@x-corp.co.uk and b@y.io today"),
      (2L, "server at 192.168.0.1 and 10.0.0.7, but 1234.5.6.7 is not an IP"),
      (3L, "call +44-2079-4600 or +1 555 0142"),
      (4L, "price +99 items, version 1.2.3, id 12345 — nothing to redact"),
      (5L, "mixed: root@10.0.0.1 box, mail me at x@y.org or +1-555-0000"),
      (6L, "ping user@10.1.2.3.example.com now")
    ).toDF("id", "text")
    val got = Curation.redactPii(rows, "text")
      .orderBy("id")
      .select("text", "n_emails", "n_ipv4", "n_phones")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))

    got(0) shouldBe (("mail <EMAIL> and <EMAIL> today", 2, 0, 0))
    // the over-long digit run fails the word boundary — stays put
    got(1) shouldBe (("server at <IP> and <IP>, but 1234.5.6.7 is not an IP", 0, 2, 0))
    got(2) shouldBe (("call <PHONE> or <PHONE>", 0, 0, 2))
    // conservative by contract: bare numbers, versions, ids untouched
    got(3) shouldBe (("price +99 items, version 1.2.3, id 12345 — nothing to redact", 0, 0, 0))
    // "root@10.0.0.1" is NOT an email (host must end alphabetic) — the
    // IP pass picks up the numeric host instead; the real email and
    // the phone are typed independently
    got(4) shouldBe (("mixed: root@<IP> box, mail me at <EMAIL> or <PHONE>",
      1, 1, 1))
    // counts are PROGRESSIVE (exact replacement counts): the
    // IPv4-shaped run inside the email's domain is consumed by the
    // email pass — raw-text counting would report n_ipv4 = 1 here
    // while replacing nothing
    got(5) shouldBe (("ping <EMAIL> now", 1, 0, 0))
  }

  test("chunkDocs: stride windows clip at the end, overlap when stride < chunk, null text drops") {
    val docs = Seq(
      (1L, "a b c d e f g"),     // 7 toks, chunk 4 stride 3 -> 3 chunks
      (2L, "x y"),               // shorter than a chunk -> 1 chunk
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocs(docs, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .orderBy($"doc_id", $"chunk_idx")
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_chunk_tok",
        $"chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    got shouldBe Seq(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 1L, "g"),
      (2L, 0L, 0L, 2L, "x y"))
  }

  test("chunkDocs tokenizes ONCE per document: the explode fan-out must not re-inline the tokenizer") {
    // non-foldable text (a Seq-backed local relation would be folded
    // into a LocalTableScan and hide the tokenizer entirely)
    val docs = spark.range(1, 4).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma "), col("id").cast("string")).as("text"))
    val plan = Curation.chunkDocs(docs, "doc_id", "text", 2, 1)
      .queryExecution.executedPlan.toString
    // the tokenizer lowers the text exactly once; a collapsed plan
    // would inline lower(...) into the slice and the size computations
    plan.sliding("lower(".length).count(_ == "lower(") shouldBe 1
  }

  test("negativePairs: k non-self partners per anchor, uniform skip-self draw, payload joined") {
    val docs = (0L until 40L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val out = Curation.negativePairs(docs, "doc_id", k = 3,
        payloadCols = Seq("source"))
      .select($"doc_id", $"j", $"neg_id", $"neg_source")
      .as[(Long, Int, Long, String)].collect()

    out.length shouldBe 40 * 3                     // exactly k per anchor
    all(out.map(r => r._3 != r._1)) shouldBe true  // never self
    all(out.map(r => r._3 >= 0L && r._3 < 40L)) shouldBe true
    out.map(r => (r._1, r._2)).distinct.length shouldBe 120 // one draw per (i, j)
    // payload is the partner's, not the anchor's
    all(out.map(r => r._4 == s"src${r._3 % 4}")) shouldBe true

    // reference computation: same md5 spec, independently written
    def md5Hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val expected = (for (i <- 0L until 40L; j <- 0 until 3) yield {
      val raw = java.lang.Long.parseLong(md5Hex(s"$i#$j").take(15), 16) % 39L
      (i, j, if (raw >= i) raw + 1 else raw)
    }).toSet
    out.map(r => (r._1, r._2, r._3)).toSet shouldBe expected
  }

  test("sampleTemperature flattens: the hot stratum downsamples hard, the rare one keeps ~all") {
    // 900 hot rows vs 100 rare: alpha=0.5 square-roots the shares
    // (0.9487 vs 0.3162 -> p = 0.75/0.25), budget 50% of 1000 rows
    val df = ((0 until 900).map(i => (i.toLong, "hot")) ++
      (900 until 1000).map(i => (i.toLong, "rare"))).toDF("id", "src")
    val kept = Curation.sampleTemperature(df, "id", "src",
        alpha = 0.5, budgetFraction = 0.5)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    // rare keep_rate = 500*0.25/100 = 1.25, caps at 1.0 -> all survive
    kept("rare") shouldBe 100L
    // hot keep_rate = 500*0.75/900 ~ 0.4167: the md5 coin realizes it
    // within sampling noise
    kept("hot").toDouble shouldBe (900 * 0.4167) +- 60.0
    // deterministic: the same call yields the same row set
    val again = Curation.sampleTemperature(df, "id", "src", 0.5, 0.5)
      .select($"id").as[Long].collect().toSet
    Curation.sampleTemperature(df, "id", "src", 0.5, 0.5)
      .select($"id").as[Long].collect().toSet shouldBe again
    // alpha = 1 is proportional sampling: every stratum keeps ~budget
    val prop = Curation.sampleTemperature(df, "id", "src", 1.0, 0.5)
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    prop("hot").toDouble shouldBe (900 * 0.5) +- 60.0
    prop("rare").toDouble shouldBe (100 * 0.5) +- 25.0
    Curation.sampleTemperature(df, "id", "src", 1.0, 1.0).count() shouldBe 1000L
  }

  test("negativePairs fails fast on a degenerate corpus instead of silently emitting nothing") {
    val one = Seq((0L, "only")).toDF("doc_id", "source")
    val ex = intercept[Exception] {
      Curation.negativePairs(one, "doc_id", k = 1, payloadCols = Seq("source"))
        .collect()
    }
    ex.getMessage should include("at least 2 rows")
    an[IllegalArgumentException] should be thrownBy
      Curation.negativePairs(one, "doc_id", k = 0, payloadCols = Seq("source"))
  }

  test("chunkDocs rejects non-positive chunk or stride") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Curation.chunkDocs(docs, "doc_id", "text", 0, 1)
    an[IllegalArgumentException] should be thrownBy
      Curation.chunkDocs(docs, "doc_id", "text", 4, 0)
  }

  test("gumbelTopK: reference noise values, Gumbel mean, salt-keyed reproducibility") {
    val df = (0L until 2000L).map(i => (i, 0.0)).toDF("id", "w")
    val all = Curation.gumbelTopK(df, "id", "w", k = 2000, salt = "s1")
      .select($"id", $"gumbel").as[(Long, Double)].collect().toMap
    // independent reference for one id: same md5/u/g spec
    def md5Hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val h = java.lang.Long.parseLong(md5Hex("s1#7").take(8), 16)
    val gRef = BigDecimal(-math.log(-math.log((h + 0.5) / 4294967296.0)))
      .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    all(7L) shouldBe gRef +- 1e-12
    // Gumbel(0,1) mean is the Euler–Mascheroni constant ≈ 0.5772
    val mean = all.values.sum / all.size
    mean shouldBe 0.5772 +- 0.1
    // same salt ⇒ same draw; different salt ⇒ a different top-k set
    val a = Curation.gumbelTopK(df, "id", "w", 50, "s1")
      .select($"id").as[Long].collect().toSet
    val b = Curation.gumbelTopK(df, "id", "w", 50, "s1")
      .select($"id").as[Long].collect().toSet
    val c = Curation.gumbelTopK(df, "id", "w", 50, "s2")
      .select($"id").as[Long].collect().toSet
    a shouldBe b
    a should not be c
    an[IllegalArgumentException] should be thrownBy
      Curation.gumbelTopK(df, "id", "w", 0, "s")
  }

  test("importanceWeights matches an independent DSIR reference; target-like docs outrank dissimilar ones") {
    val B = 64
    val rows = Seq(
      (0L, "alpha beta alpha beta", true),  // target
      (1L, "alpha beta gamma", true),       // target
      (2L, "alpha beta alpha", false),      // raw, target-like
      (3L, "zeta eta theta iota", false),   // raw, dissimilar
      (4L, "alpha", false)                  // raw, single token: no bigram
    )
    val docs = rows.toDF("doc_id", "text", "tgt")
    val got = Curation.importanceWeights(docs, "doc_id", "text", $"tgt", B)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // independent reference: same md5 bucket spec + smoothing formula,
    // written from scratch (the negativePairs reference idiom)
    def md5Hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    def bucket(f: String) = java.lang.Long.parseLong(md5Hex(f).take(8), 16) % B
    def feats(t: String): Seq[String] = {
      val toks = t.split(" ").toSeq
      toks ++ (if (toks.size >= 2)
        toks.sliding(2).map(_.mkString(" ")).toSeq else Nil)
    }
    val featRows = rows.flatMap { case (id, txt, tgt) =>
      feats(txt).map(f => (id, tgt, bucket(f))) }
    val cr = featRows.groupBy(_._3).map { case (b, v) => b -> v.size }
    val ct = featRows.filter(_._2).groupBy(_._3)
      .map { case (b, v) => b -> v.size }
    val tr = featRows.size
    val tt = featRows.count(_._2)
    def lp(c: Int, tot: Int): BigDecimal =
      BigDecimal(math.log((c + 1.0) / (tot + B.toDouble)))
        .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
    val expected = rows.map { case (id, txt, _) =>
      id -> feats(txt).map { f =>
        val b = bucket(f)
        lp(ct.getOrElse(b, 0), tt) - lp(cr(b), tr)
      }.sum.toDouble
    }.toMap

    got.keySet shouldBe expected.keySet
    rows.foreach { case (id, txt, _) =>
      got(id)._1 shouldBe feats(txt).size.toLong // nfeat = 2*ntok - 1
      got(id)._2 shouldBe expected(id) +- 1e-9
    }
    // the target-like raw doc scores strictly above the dissimilar one
    got(2L)._2 should be > got(3L)._2
    an[IllegalArgumentException] should be thrownBy
      Curation.importanceWeights(docs, "doc_id", "text", $"tgt", 1)
  }

  test("snapshotDiff: added/removed/changed/unchanged by normalized digest") {
    val v1 = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, " X "),   // normalizes to "x": unchanged despite byte diff
      (2L, "w"),     // changed
      (4L, "n"))     // added; 3 is removed
      .toDF("doc_id", "text")
    val rows = Curation.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows shouldBe Map(
      "added" -> 1L, "changed" -> 1L, "removed" -> 1L, "unchanged" -> 1L)
  }

  test("packPlan: per-shard running offsets, straddle spans, independent shards") {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 200L), ("s1", 3L, 30L),
      ("s2", 7L, 300L), ("s2", 8L, 10L)
    ).toDF("source", "doc_id", "n_tok")
    val got = Curation.packPlan(docs, "source", "doc_id", "n_tok", 256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (shard, doc, start, bin, bin_pos, spans)
    got(0) shouldBe (("s1", 1L, 0L, 0L, 0L, 1L))     // 0..99 in bin 0
    got(1) shouldBe (("s1", 2L, 100L, 0L, 100L, 2L)) // 100..299 straddles
    got(2) shouldBe (("s1", 3L, 300L, 1L, 44L, 1L))  // 300..329 in bin 1
    got(3) shouldBe (("s2", 7L, 0L, 0L, 0L, 2L))     // 0..299 straddles
    got(4) shouldBe (("s2", 8L, 300L, 1L, 44L, 1L))
    an[IllegalArgumentException] should be thrownBy
      Curation.packPlan(docs, "source", "doc_id", "n_tok", 0L)
  }

  test("packPlan is partition-invariant") {
    val docs = (0 until 200).map(i =>
      (s"s${i % 3}", i.toLong, (i % 37 + 1).toLong))
      .toDF("source", "doc_id", "n_tok")
    rowsOf(Curation.packPlan(docs.repartition(7), "source", "doc_id",
      "n_tok", 64L)) shouldBe
      rowsOf(Curation.packPlan(docs.coalesce(1), "source", "doc_id",
        "n_tok", 64L))
  }

  test("packEfficiency: hand-computed bins, padding, fill rate, straddles") {
    val docs = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 200L), ("s1", 3L, 30L), // 330 tok
      ("s2", 7L, 256L)                                     // exact fill
    ).toDF("source", "doc_id", "n_tok")
    val got = Curation.packEfficiency(docs, "source", "doc_id", "n_tok",
        256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7)))
    // s1: 330 tok -> 2 bins (512 slots), 182 pad; doc 2 straddles
    got(0)._1 shouldBe "s1"
    got(0)._2 shouldBe 3L           // n_docs
    got(0)._3 shouldBe 330L         // total_tok
    got(0)._4 shouldBe 1L           // n_straddling (doc 2)
    got(0)._5 shouldBe 2L           // n_bins
    got(0)._6 shouldBe 182L         // pad_tok
    got(0)._7 shouldBe 330.0 / 512.0 +- 1e-9
    got(0)._8 shouldBe 1.0 / 3.0 +- 1e-9
    // s2: one exactly-full bin, zero pad, zero straddle
    got(1) shouldBe (("s2", 1L, 256L, 0L, 1L, 0L, 1.0, 0.0))
  }

  test("splitBalance: shares per split vs corpus, deviations bounded") {
    val docs = (0 until 600).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("doc_id", "source")
    val rows = Curation.splitBalance(docs, "doc_id", "source",
        Seq("train" -> 0.5, "val" -> 0.5))
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // every (split, grp) cell present, obs shares sum to 1 per split
    rows.map(t => (t._2, t._1)).toSet shouldBe
      Set("train" -> "a", "train" -> "b", "val" -> "a", "val" -> "b")
    rows.groupBy(_._2).foreach { case (_, cells) =>
      cells.map(_._4).sum shouldBe 1.0 +- 1e-8
    }
    // exp_share is the corpus mix (200 a / 400 b), same in both splits
    rows.filter(_._1 == "a").foreach(_._5 shouldBe 200.0 / 600.0 +- 1e-9)
    rows.filter(_._1 == "b").foreach(_._5 shouldBe 400.0 / 600.0 +- 1e-9)
    // abs_dev = |obs - exp| recomputed
    rows.foreach(t => t._6 shouldBe math.abs(t._4 - t._5) +- 1e-8)
    // docs conserved across cells
    rows.map(_._3).sum shouldBe 600L
  }

  test("systematicSample: boundary crossings, heavy row picked once, inclusion ∝ weight") {
    // weights 4,4,4,4 with stride 5: cum 4,8,12,16 → picks at
    // boundaries 0? no — floor(cum/5) jumps: 0,1,2,3 vs prev -? ...
    // hand-check: row picked iff floor(cum/5) > floor((cum-w)/5)
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L))
      .toDF("id", "w")
    val got = Curation.systematicSample(df, "id", "w", stride = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // cum: 4(0>0 no), 8(1>0 pick), 12(2>1 pick), 16(3>2 pick)
    got.toSeq shouldBe Seq((2L, 8L, 1L), (3L, 12L, 2L), (4L, 16L, 3L))
    // a row heavier than the stride crosses several boundaries but is
    // emitted once, carrying the LAST boundary index:
    // cum 25 → floor(25/5)=5 vs floor(2/5)=0; row 3 (cum 27) no cross
    val heavy = Seq((1L, 2L), (2L, 23L), (3L, 2L)).toDF("id", "w")
    val h = Curation.systematicSample(heavy, "id", "w", stride = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    h.toSeq shouldBe Seq((2L, 5L))
  }

  test("systematicSample: bucket decomposition is invariant to width and partitioning") {
    val df = (1L to 300L).map(i => (i, 1L + (i * 13) % 97))
      .toDF("id", "w")
    val base = Curation.systematicSample(df, "id", "w", 500L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    for (bw <- Seq(1L, 7L, 64L, 100000L)) {
      Curation.systematicSample(df.repartition(6), "id", "w", 500L, bw)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .toSeq shouldBe base.toSeq
    }
    // sample mass: picks ≈ total/stride (±1 at the tail)
    val total = (1L to 300L).map(i => 1L + (i * 13) % 97).sum
    base.length.toLong should (be >= total / 500L - 1L and
      be <= total / 500L + 1L)
    an[IllegalArgumentException] should be thrownBy
      Curation.systematicSample(df, "id", "w", 0L)
  }
}
