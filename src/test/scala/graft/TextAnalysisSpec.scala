package graft

import graft.operators.TextAnalysis

/** Text-analysis operators: token stats, quality score, language-ID,
  * fingerprints.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: counts, distinct, ratio, mean length on a known sentence") {
    val row = Seq("aa bb aa cc").toDF("text")
      .select(TextAnalysis.tokenStats($"text").as("s"))
      .select($"s.n_tokens", $"s.n_distinct", $"s.type_token_ratio", $"s.mean_token_len")
      .collect()(0)
    row.getInt(0) shouldBe 4
    row.getInt(1) shouldBe 3
    row.getDouble(2) shouldBe 0.75
    row.getDouble(3) shouldBe 2.0
  }

  test("tokenCounts: whitespace vs BPE-ish vs chars/4 estimators") {
    val row = Seq("Hello, world! It's 2024.").toDF("text")
      .select(TextAnalysis.tokenCounts($"text").as("c"))
      .select($"c.n_whitespace", $"c.n_bpeish", $"c.n_chars_div4")
      .collect()(0)
    row.getInt(0) shouldBe 4
    // pieces: Hello , world ! It ' s 2024 . = 9
    row.getInt(1) shouldBe 9
    row.getInt(2) shouldBe 6 // ceil(24/4)
  }

  test("qualityScore in [0,1]; long diverse text scores higher than tiny text") {
    val stop = Seq("the", "a", "of")
    val texts = Seq(
      ("tiny", "word"),
      ("good", (1 to 50).map(i => s"the word$i of").mkString(" ")))
    val scores = texts.toDF("k", "text")
      .select($"k", TextAnalysis.qualityScore($"text", stop).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    all(scores.values.toSeq) should (be >= 0.0 and be <= 1.0)
    scores("good") should be > scores("tiny")
  }

  test("langIdPredict votes by stopword profile (argmax, ties -> earlier profile)") {
    val profiles = Seq(
      "en" -> Seq("the", "and", "of"),
      "es" -> Seq("el", "la", "de"))
    val got = Seq(
      "the cat and the dog", "el gato de la casa", "zzz yyy xxx")
      .toDF("text")
      .select(TextAnalysis.langIdPredict($"text", profiles))
      .collect().map(_.getString(0)).toSeq
    got shouldBe Seq("en", "es", "en") // no votes at all -> first profile
  }

  test("fingerprint is word-order and duplication invariant; rollingHash is order sensitive") {
    val df = Seq(
      ("a", "alpha beta gamma"),
      ("b", "gamma beta alpha alpha"),
      ("c", "alpha beta delta")).toDF("k", "text")
    val fp = df.select($"k", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    fp("a") shouldBe fp("b")
    fp("a") should not be fp("c")
    val rh = df.select($"k", TextAnalysis.rollingHash($"text").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rh("a") should not be rh("b") // order matters
  }

  test("rollingHashPortable: md5 chain matches a reference computation and is order sensitive") {
    val df = Seq(("a", "x y z"), ("b", "z y x")).toDF("k", "text")
    val got = df.select($"k", TextAnalysis.rollingHashPortable($"text").as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // reference: h = md5(h || token), starting from ""
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = Seq("x", "y", "z").foldLeft("")((h, t) => md5Hex(h + t))
    got("a") shouldBe expected
    got("a") should not be got("b") // order matters
  }

  test("repetitionStats: hand-computed dup-ngram rate and top-token ratio, short-doc zero cases") {
    val df = Seq(
      (1L, "a a a a"),        // 3-grams: 2 total, 1 distinct -> dup 0.5; top 'a' 4/4
      (2L, "a b c d"),        // all distinct -> dup 0.0; top 1/4
      (3L, "a b a b a"),      // grams: [aba, bab, aba] -> 3 total 2 distinct -> 1/3; top 'a' 3/5
      (4L, "a b"),            // < n tokens -> dup 0.0 by definition; top 1/2
      (5L, "")                // empty normalizes to one "" token -> top 1.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withRepetitionStats(df, "text", n = 3)
      .select($"doc_id", $"ntok", $"dup_ngram_rate", $"top_token_ratio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    got(0) shouldBe ((1L, 4L, 0.5, 1.0))
    got(1) shouldBe ((2L, 4L, 0.0, 0.25))
    got(2)._3 shouldBe (1.0 / 3.0) +- 1e-15
    got(2)._4 shouldBe 0.6
    got(3) shouldBe ((4L, 2L, 0.0, 0.5))
    got(4) shouldBe ((5L, 1L, 0.0, 1.0))
  }

  test("withRepetitionStats keeps null-text rows and rejects column collisions") {
    val df = Seq((1L, Some("a b c d")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.withRepetitionStats(df, "text", n = 3)
    // the optimizer barrier must be inert: the null-text row SURVIVES
    out.count() shouldBe 2
    val nullRow = out.filter($"doc_id" === 2L).collect().head
    nullRow.isNullAt(nullRow.fieldIndex("ntok")) shouldBe true
    // collision guard, same contract as packShards/capPerGroup
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.withRepetitionStats(
        out.select($"doc_id", $"text", $"ntok"), "text", n = 3)
  }

  test("tokenRarity: TRUE document frequency — intra-doc repetition cannot inflate a token's own df") {
    val docs = Seq(
      (1L, "a a b"),   // 'a' twice HERE but df(a) = 2 docs, df(b) = 2
      (2L, "a b c")    // c is corpus-unique: df = 1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenRarity(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    // doc 1 occurrences: a,a,b -> dfs 2,2,2 -> sum 6, min 2, avg 2.0
    got(0) shouldBe ((1L, 3L, 6L, 2L, 2.0))
    // doc 2 occurrences: a,b,c -> dfs 2,2,1 -> sum 5, min 1 (unique c)
    got(1)._1 shouldBe 2L
    got(1)._2 shouldBe 3L
    got(1)._3 shouldBe 5L
    got(1)._4 shouldBe 1L
    got(1)._5 shouldBe (5.0 / 3.0) +- 1e-15
  }

  test("tfIdfTopK: hand-computed scores, corpus-wide tokens score zero, tok breaks ties") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry banana cherry cherry")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .orderBy($"id", $"rank")
      .select($"id", $"rank", $"tok", $"score")
      .as[(Long, Int, String, Double)].collect().toSeq

    // N=3; df: apple 1, banana 3, cherry 2
    // d1: apple 2*ln(3) = 2.197224577, banana ln(1) = 0
    // d2: cherry ln(1.5) = 0.405465108, banana 0
    // d3: cherry 3*ln(1.5) = 1.216395324, banana 0
    got shouldBe Seq(
      (1L, 1, "apple", 2.197224577),
      (1L, 2, "banana", 0.0),
      (2L, 1, "cherry", 0.405465108),
      (2L, 2, "banana", 0.0),
      (3L, 1, "cherry", 1.216395324),
      (3L, 2, "banana", 0.0))

    // ties (equal score) order by token: doc of two unique tokens
    val tied = TextAnalysis.tfIdfTopK(
        Seq((1L, "zeta alpha"), (2L, "filler")).toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .filter($"id" === 1L).orderBy($"rank")
      .select($"tok").as[String].collect().toSeq
    tied shouldBe Seq("alpha", "zeta")
  }

  test("unigramLogProb: hand-computed corpus-LM scores, decimal sum immune to order") {
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .orderBy($"id")
      .select($"id", $"ntok", $"logprob_sum", $"nll_mean_nano")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // total 4 tokens, count(a)=count(b)=2 -> every token ln(0.5),
    // rounded to 9 dp = -0.693147181; sums are exact decimal multiples
    // and the nano-mean is the all-integer floor((-sum*1e9)/ntok)
    got shouldBe Seq(
      (1L, 3L, -2.079441543, 693147181L),
      (2L, 1L, -0.693147181, 693147181L))

    // rarer tokens score lower: a doc of corpus-common tokens beats a
    // doc containing a hapax
    val mixed = Seq((1L, "x x x x"), (2L, "x rare")).toDF("doc_id", "text")
    val nll = TextAnalysis.unigramLogProb(mixed, "doc_id", "text")
      .orderBy($"id").select($"nll_mean_nano").as[Long].collect()
    nll(0) should be < nll(1) // lower nll = more corpus-typical
  }

  test("corpusManifest and corpusManifestWith agree: the score-once split changes nothing") {
    // the sharedLmScores seam's equivalence at unit scale (the oracle
    // gates pin it at corpus scale): a manifest computed off a
    // caller-owned pre-scored table is row-for-row the one-shot result
    val docs = Seq(
      (1L, "s0", "a a b"), (2L, "s0", "b"),
      (3L, "s1", "a a b"), (4L, "s1", "c c a b")).toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"source", $"n_docs", $"total_tokens", $"n_unique", $"mean_nll_nano")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val oneShot = rows(TextAnalysis.corpusManifest(
      docs, "doc_id", "text", groupCols = Seq("source")))
    val scored = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
    val viaWith = rows(TextAnalysis.corpusManifestWith(
      docs, "doc_id", "text", groupCols = Seq("source"), scored = scored))
    viaWith shouldBe oneShot
    // direct unigramLogProb callers own the persisted score table —
    // release it or it leaks into the shared-session suite cache
    scored.unpersist(blocking = false)
    // and the dedup audit inside it sees through duplicated text:
    // s0 has two distinct texts, s1 has two distinct texts, but doc 3
    // duplicates doc 1's normalized content only within its own group
    oneShot.map(r => (r._1, r._4)) shouldBe Seq(("s0", 2L), ("s1", 2L))
  }

  test("zipfCurve and heapsGrowth: hand-computed ranks and cumulative growth") {
    val docs = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    val z = TextAnalysis.zipfCurve(docs, "text", k = 2)
      .select($"rank", $"tok", $"freq").as[(Long, String, Long)]
      .collect().toSeq
    z shouldBe Seq((1L, "a", 3L), (2L, "b", 2L))
    // 4 docs, 2 buckets: b0 = docs 0-1 (tokens x y x z -> vocab 3),
    // b1 = docs 2-3 (x w y q -> new vocab w q)
    val corpus = Seq((0L, "x y"), (1L, "x z"), (2L, "x w"), (3L, "y q"))
      .toDF("doc_id", "text")
    val h = TextAnalysis.heapsGrowth(corpus, "doc_id", "text", buckets = 2)
      .as[(Int, Long, Long)].collect().toSeq
    h shouldBe Seq((0, 4L, 3L), (1, 8L, 5L))
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.zipfCurve(docs, "text", 0)
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.heapsGrowth(corpus, "doc_id", "text", 0)
  }

  test("stupidBackoffScore: seen bigram, backoff, OOV — hand-computed against the paper's formula") {
    val model = Seq((100L, "a b"), (101L, "a b c")).toDF("doc_id", "text")
    val batch = Seq((1L, "a b z")).toDF("doc_id", "text")
    // model: N=5 tokens, V=3 vocab; c1: a=2 b=2 c=1; c2: (a,b)=2 (b,c)=1
    // doc "a b z": first 'a' -> uni (2+1)/(5+3); (a,b) seen -> 2/2 = 1;
    // (b,z) unseen, z OOV -> 0.4 * ((0+1)/8)
    def lp(x: Double) = BigDecimal(math.log(x))
      .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
    val expected = (lp(3.0 / 8) + lp(1.0) + lp(0.4 * (1.0 / 8))).toDouble
    val got = TextAnalysis.stupidBackoffScore(batch, model, "doc_id", "text")
      .as[(Long, Long, Double, Long)].collect()
    got.length shouldBe 1
    val (id, nf, s, nll) = got.head
    id shouldBe 1L
    nf shouldBe 3L
    s shouldBe expected +- 1e-9
    nll shouldBe (BigDecimal(-expected) * BigDecimal(1000000000))
      .toLong / 3 +- 2
  }

  test("htmlTitle/htmlBodyText: blocks dropped whole, tags stripped, entities decoded in the safe order") {
    val html =
      "<html><head><title>The Page</title><style>p{margin:0}</style>" +
        "<script>if (1<2) { var x = \"</div>\"; }</script></head>" +
        "<body><nav>home | about</nav><p>Hello &amp; goodbye " +
        "&lt;tag&gt; &amp;lt; &#39;q&#39;&nbsp;end</p>" +
        "<div>kept <b>bold</b> text</div><footer>(c) 2026</footer>" +
        "</body></html>"
    val out = Seq((1L, html)).toDF("id", "h")
      .select(TextAnalysis.htmlTitle($"h").as("t"),
        TextAnalysis.htmlBodyText($"h").as("b"))
      .as[(String, String)].head()
    out._1 shouldBe "The Page"
    // script went away wholesale (incl. its '<'), nav/footer dropped,
    // &amp;lt; decodes to the LITERAL &lt; (amp last), nbsp collapses
    out._2 shouldBe "Hello & goodbye <tag> &lt; 'q' end kept bold text"
    // malformed/absent title -> empty string, plain text passes through
    Seq((1L, "no markup at all")).toDF("id", "h")
      .select(TextAnalysis.htmlTitle($"h"), TextAnalysis.htmlBodyText($"h"))
      .as[(String, String)].head() shouldBe ("", "no markup at all")
    // <header> is NOT swallowed by the <head> block pattern
    Seq((1L, "<body><header>site head</header><p>real</p></body>"))
      .toDF("id", "h")
      .select(TextAnalysis.htmlBodyText($"h")).as[String]
      .head() shouldBe "site head real"
  }

  test("noveltyScores: first owner scores 1, partial overlap fractional, exact dup 0, unshingleable absent") {
    val docs = Seq(
      (1L, "a b c d"), // {abc, bcd}: both first seen here -> 1.0
      (2L, "a b c e"), // {abc, bce}: abc owned by 1 -> 0.5
      (3L, "a b c d"), // exact dup of 1 -> 0.0
      (4L, "x y")      // < 3 tokens: unshingleable
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScores(docs, "doc_id", "text", n = 3)
      .orderBy($"id").as[(Long, Long, Long, Double)].collect()
    got shouldBe Array(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0))
  }

  test("linear quality classifier: closed-form weights and scores match the hand-computed formula") {
    import org.apache.spark.sql.functions._
    // seed: one positive doc ("good good"), one negative ("bad bad").
    // features per doc: the token twice + the bigram once (3 each), so
    // tp = tn = 3 and the per-bucket counts are known by hand PROVIDED
    // the 4 distinct features land in 4 distinct buckets — asserted
    // below (md5 is fixed, so this can never flake).
    val B = 512
    val seed = Seq((1L, "good good", true), (2L, "bad bad", false))
      .toDF("doc_id", "text", "pos")
    val usedBuckets = operators.Curation.hashedNgramFeatures(
        seed.select($"doc_id".as("id"), $"text".as("__text")),
        Seq("id"), "__text", B)
      .select("b").distinct().as[Long].collect().toSet
    usedBuckets.size shouldBe 4 // good, bad, "good good", "bad bad"

    val model = TextAnalysis.trainLinearQuality(seed, "doc_id", "text",
      isPositive = $"pos", buckets = B)
    model.count() shouldBe B.toLong // COMPLETE domain, unseen included

    // Spark's round() routes through BigDecimal HALF_UP — replicate
    // (scala BigDecimal(double) = valueOf semantics, the q79 idiom)
    def r9(x: Double): BigDecimal = BigDecimal(x)
      .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
    def lp(c: Long, t: Long): BigDecimal =
      r9(math.log((c + 1.0) / (t + B.toDouble)))
    // bucket("good"): cp=2 of cr=2 -> w = lp(2,3) - lp(0,3)
    // bucket("bad"):  cp=0 of cr=2 -> w = lp(0,3) - lp(2,3)
    // unseen bucket:  w = lp(0,3) - lp(0,3) = 0
    val wGoodExp = lp(2, 3) - lp(0, 3)
    val wBadExp = lp(0, 3) - lp(2, 3)
    val unseenB = (0L until B.toLong).find(b => !usedBuckets.contains(b)).get
    val wMap = model.collect().map(r =>
      r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    wMap(unseenB) shouldBe BigDecimal(0).setScale(9)
    assert(wMap(usedBuckets.head) != BigDecimal(0).setScale(9))

    // score a one-token doc: nfeat=1, s=w(good) -> sigmoid(w)
    val scored = TextAnalysis.scoreLinearQuality(
      Seq((10L, "good"), (11L, "bad")).toDF("doc_id", "text"),
      "doc_id", "text", model, buckets = B)
      .orderBy($"id").collect()
    def sig(w: BigDecimal): Double =
      r9(1.0 / (1.0 + math.exp(-w.toDouble))).toDouble + 0.0
    scored(0).getLong(1) shouldBe 1L
    scored(0).getDouble(2) shouldBe sig(wGoodExp)
    scored(1).getDouble(2) shouldBe sig(wBadExp)
    // the learned gate separates: positive-flavored above 0.5,
    // negative-flavored below
    assert(scored(0).getDouble(2) > 0.5 && scored(1).getDouble(2) < 0.5)

    // zero-feature doc (null text): present, nfeat 0, score sigmoid(0)
    val nullDoc = Seq((20L, Option.empty[String])).toDF("doc_id", "text")
    val z = TextAnalysis.scoreLinearQuality(nullDoc, "doc_id", "text",
      model, buckets = B).collect()(0)
    z.getLong(1) shouldBe 0L
    z.getDouble(2) shouldBe 0.5
  }

  // ---- BPE tokenizer training ----------------------------------------

  /** The classic Sennrich toy corpus: low×5 lower×2 newest×6 widest×3,
    * one doc per word group (word repetition inside the doc carries the
    * multiplicity). */
  private def bpeToyCorpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")

  test("bpePairStats: hand-computed top pairs on the Sennrich toy corpus") {
    val top = TextAnalysis.bpePairStats(bpeToyCorpus, "text", topK = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // count 9 ties broken (a, b) ascending, then the count-8 pair
    top shouldBe Array(
      ("e", "s", 9L), ("s", "t", 9L), ("t", "</w>", 9L), ("w", "e", 8L))
  }

  test("bpeTrain: 6 hand-computed merges on the Sennrich toy corpus") {
    val merges = TextAnalysis.bpeTrain(bpeToyCorpus, "text", numMerges = 6)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    merges shouldBe Array(
      (1, "e", "s", 9L),        // es (ties at 9: (e,s) < (s,t) < (t,</w>))
      (2, "es", "t", 9L),       // est
      (3, "est", "</w>", 9L),   // est</w>
      (4, "l", "o", 7L),        // lo ((l,o) < (o,w) at 7)
      (5, "lo", "w", 7L),       // low
      (6, "e", "w", 6L))        // ew ((e,w) < (n,e) < (w,est</w>) at 6)
  }

  test("bpeTrain: left-to-right non-overlapping merge ('aaa' + (a,a) -> [aa, a])") {
    val merges = TextAnalysis.bpeTrain(
        Seq((1L, "aaa aaa")).toDF("doc_id", "text"), "text", numMerges = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // if the fold overlapped, round 2 would see (aa,a) AND a phantom
    // (a,a); the pinned sequence proves 'a a a </w>' folded to
    // 'aa a </w>' exactly
    merges shouldBe Array(
      (1, "a", "a", 4L),
      (2, "a", "</w>", 2L),     // (a,</w>) beats (aa,a): 'a' < 'aa'
      (3, "aa", "a</w>", 2L))
  }

  test("bpeFertility: subwords-per-word from the trained vocab, per group") {
    val rows = TextAnalysis.bpeFertility(bpeToyCorpus, "text",
        groupCol = "doc_id", numMerges = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // post-merge symbol counts: low=[low,</w>]=2, lower=[low,e,r,</w>]=4,
    // newest=[n,ew,est</w>]=3, widest=[w,i,d,est</w>]=4
    rows shouldBe Array(
      (1L, 5L, 10L, 2.0),
      (2L, 2L, 8L, 4.0),
      (3L, 6L, 18L, 3.0),
      (4L, 3L, 12L, 4.0))
  }

  test("bpeEncode: document-order subwords under the trained vocab") {
    val rows = TextAnalysis.bpeEncode(bpeToyCorpus, "doc_id", "text",
        numMerges = 6, prefixLen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // lower -> [low, e, r, </w>] x2 = 8 subwords; prefix = first 5 in
    // document order
    rows should contain ((2L, 8L, "low e r </w> low"))
    // newest -> [n, ew, est</w>] x6 = 18
    rows should contain ((3L, 18L, "n ew est</w> n ew"))
  }

  test("pre-trained-vocab variants equal the numMerges paths (the train-once seam)") {
    // one trainer run feeding all three ...With consumers must produce
    // exactly what each numMerges variant produces by retraining — the
    // contract sharedBpeVocab (q103/q106/q107/q136) stands on
    val vocab = TextAnalysis.bpeTrainedVocab(bpeToyCorpus, "text",
      numMerges = 6)
    TextAnalysis.bpeFertilityWith(bpeToyCorpus, "text", "doc_id", vocab)
      .collect().toSeq shouldBe
      TextAnalysis.bpeFertility(bpeToyCorpus, "text", "doc_id",
        numMerges = 6).collect().toSeq
    TextAnalysis.bpeEncodeWith(bpeToyCorpus, "doc_id", "text", vocab,
        prefixLen = 5)
      .collect().toSeq shouldBe
      TextAnalysis.bpeEncode(bpeToyCorpus, "doc_id", "text",
        numMerges = 6, prefixLen = 5).collect().toSeq
    TextAnalysis.bpeVocabIntegrityWith(vocab).collect().toSeq shouldBe
      TextAnalysis.bpeVocabIntegrity(bpeToyCorpus, "text",
        numMerges = 6).collect().toSeq
    vocab.unpersist()
  }

  test("bpeTrain: stops early when the vocabulary is fully merged") {
    val merges = TextAnalysis.bpeTrain(
        Seq((1L, "ab")).toDF("doc_id", "text"), "text", numMerges = 10)
      .collect().map(r => (r.getString(1), r.getString(2)))
    merges shouldBe Array(("a", "b"), ("ab", "</w>"))
  }

  test("sourceDivergence: 0 for identical, ln 2 for disjoint, closed-form unshared mass") {
    val docs = Seq(
      (1L, "x y", "A"), (2L, "x y", "B"),   // identical distributions
      (3L, "q q", "C"), (4L, "r", "D"),     // disjoint vocabularies
      (5L, "x y", "E"), (6L, "x z", "F"))   // half-shared mass
      .toDF("doc_id", "text", "source")
    val js = TextAnalysis.sourceDivergence(docs, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    js.size shouldBe 15                      // all 6-choose-2 pairs present
    js(("A", "B")) shouldBe ((2L, 0.0))
    val (nCD, jsCD) = js(("C", "D"))
    nCD shouldBe 0L
    jsCD shouldBe math.log(2.0) +- 1e-12
    // E/F share 'x' (p = 0.5 each side, zero contribution); each side's
    // unshared half contributes 0.5*ln2*0.5
    val (nEF, jsEF) = js(("E", "F"))
    nEF shouldBe 1L
    jsEF shouldBe (0.5 * math.log(2.0)) +- 1e-9
  }

  test("bpeVocabIntegrity: subword sequences concatenate back losslessly") {
    // "ab ab b": merges learn (b,</w>) then (a,b</w>) -> ab=[ab</w>], b=[b</w>]
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeVocabIntegrity(docs, "text", numMerges = 2)
      .collect().head
    r.getLong(0) shouldBe 2L   // vocab: ab, b
    r.getLong(1) shouldBe 2L   // one subword each after the merges
    r.getLong(2) shouldBe 1L
    r.getLong(3) shouldBe 0L   // losslessness
  }

  test("lexicalDiversity: token mass, vocab, hapax, exact ratios") {
    val docs = Seq(
      (1L, "a a b", "A"), (2L, "x y z", "B"))
      .toDF("doc_id", "text", "source")
    val rows = TextAnalysis.lexicalDiversity(docs, "text", "source")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    rows("A") shouldBe ((3L, 2L, 1L, 2.0 / 3.0, 0.5))
    rows("B") shouldBe ((3L, 3L, 3L, 1.0, 1.0))
  }

  test("bigramPmi: hand-checked coefficient, support filter, count-desc order") {
    // unigrams a:3 b:3 c:1 (Nu=7); bigrams (a,b):3 (b,a):1 (b,c):1 (Nb=5)
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val all = TextAnalysis.bigramPmi(docs, "text", minCount = 1L).collect()
    all.map(r => (r.getString(0), r.getString(1), r.getLong(2))) shouldBe
      Seq(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L))
    val pmiAb = all.head.getDouble(3)
    // ln 3 + 2 ln 7 − ln 5 − ln 3 − ln 3 = ln(147/45), round-9'd
    pmiAb shouldBe (math.rint(math.log(147.0 / 45) * 1e9) / 1e9 +- 1e-9)
    // support floor cuts the singleton pairs
    TextAnalysis.bigramPmi(docs, "text", minCount = 2L)
      .collect().map(_.getString(0)) shouldBe Array("a")
    // partitioning-invariant (exact counts, fixed double chain)
    TextAnalysis.bigramPmi(docs.repartition(7), "text", 1L)
      .collect().map(_.getDouble(3)) shouldBe all.map(_.getDouble(3))
  }
}
