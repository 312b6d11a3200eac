package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text analysis for training-data pipelines: token statistics, quality
  * scoring, n-gram language-ID heuristic, document fingerprinting.
  * All pure column expressions over the normalized token array — one
  * narrow projection per document, no shuffle at all until the caller
  * aggregates.
  */
object TextAnalysis {

  /** Per-document token statistics: token count (whitespace tokenizer),
    * distinct-token count, type/token ratio, mean token length.
    */
  def tokenStats(text: Column): Column = {
    val toks = tokens(text)
    val n  = size(toks)
    val nd = size(array_distinct(toks))
    struct(
      n.as("n_tokens"),
      nd.as("n_distinct"),
      (nd.cast("double") / n.cast("double")).as("type_token_ratio"),
      (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / n.cast("double")).as("mean_token_len"))
  }

  /** BPE-ish token counting: the cheap subword-count estimate used for
    * budgeting pretraining corpora without running a real tokenizer —
    * word/number/punctuation pieces from one regex pass, plus the
    * classic chars/4 estimator for comparison. A real BPE count sits
    * between the two for English-like text.
    */
  def tokenCounts(text: Column): Column = {
    val pieces = size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
    struct(
      size(tokens(text)).as("n_whitespace"),
      pieces.as("n_bpeish"),
      ceil(length(text).cast("double") / 4.0).cast("int").as("n_chars_div4"))
  }

  /** Quality score in [0,1]: blend of length band, stopword ratio band
    * and lexical diversity — the shape of heuristic quality filters used
    * for pretraining corpora (length/punct/stopword ratios). Stopword
    * list is a parameter.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / n
    val diversity = size(array_distinct(toks)).cast("double") / n
    val lengthOk = when(size(toks).between(20, 1000), 1.0).otherwise(0.5)
    // fixed-weight blend; each term in [0,1]
    (lengthOk * 0.4 + stopRatio * 0.3 + diversity * 0.3)
  }

  /** Language-ID by stopword-profile voting: score per language =
    * fraction of tokens found in that language's profile; predicted
    * language = argmax (ties broken by profile order). The classic
    * n-gram/stopword heuristic, as a single expression.
    */
  def langIdScores(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val entries = profiles.flatMap { case (lang, words) =>
      Seq(lit(lang),
        size(filter(toks, t => t.isin(words.map(lit): _*))).cast("double") / n)
    }
    map(entries: _*)
  }

  def langIdPredict(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = langIdScores(text, profiles)
    val best = profiles.map { case (lang, _) =>
      struct(element_at(scores, lang).as("score"), lit(lang).as("lang"))
    }.reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
    best.getField("lang")
  }

  /** Canonical content fingerprint: md5 over the sorted distinct token
    * set — robust to word order and duplication, cheap to group on.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling hash over the token stream (order-SENSITIVE, unlike
    * [[fingerprint]]): h = xxhash64(h, token), chained left-to-right.
    * Hash-chaining instead of the classic `h * p ^ hash(t)` polynomial:
    * a raw long multiply overflows — and under ANSI mode THROWS — on
    * any document longer than a few tokens, while the chain is
    * overflow-free and equally order-sensitive.
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** PORTABLE order-sensitive rolling hash: h = md5(h || token),
    * chained left-to-right — reproducible in any engine with md5
    * (DuckDB twin: `list_reduce(list_prepend('', toks),
    * (acc, t) -> md5(acc || t))`), unlike the engine-fast xxhash64
    * [[rollingHash]]. Interpreted HOF fold — fine at one fold per
    * document; prefer [[rollingHash]] on hot paths.
    */
  def rollingHashPortable(text: Column): Column =
    aggregate(tokens(text), lit(""), (acc, t) => md5(concat(acc, t)))

  /** Intra-document repetition statistics — the Gopher/RefinedWeb-class
    * quality signals that catch boilerplate loops and keyword
    * stuffing, which per-document LENGTH heuristics miss entirely:
    *
    *  - `dup_ngram_rate`: 1 − distinct/total word n-grams (0 when the
    *    doc has fewer than n tokens) — near 1 for a document that
    *    repeats one phrase forever;
    *  - `top_token_ratio`: the most frequent token's share of all
    *    tokens — high for stuffed or templated text.
    *
    * Pure per-row expressions (higher-order functions over the token
    * array — no shuffle, no UDF); the DuckDB twin mirrors the exact
    * arithmetic so the q49 gate checks values bit-for-bit.
    *
    * `toks` MUST be a materialized token-array column (use
    * [[withRepetitionStats]]), never an inline `tokens(text)`
    * expression: the gram and fold lambdas reference the array per
    * ELEMENT, and with the tokenizer inlined Spark re-runs the whole
    * regex-normalize+split chain for every element — the same
    * no-CSE-inside-lambdas trap [[graft.operators.Dedup.shingles]]
    * documents (measured 18.6 s vs 1.4 s for q49 at sf0.1).
    */
  def repetitionStats(toks: Column, n: Int): Column = {
    val ntok = size(toks)
    val grams = ntok - (n - 1) // total n-grams when ntok >= n
    val distinctGrams = size(wordShingles(toks, n))
    val dupRate = when(grams > 0,
      lit(1.0) - distinctGrams.cast("double") / grams.cast("double"))
      .otherwise(lit(0.0))
    // max token multiplicity = longest equal-run in the SORTED token
    // array, ONE O(n) fold after a native sort. The obvious
    // `transform(distinct, t -> size(filter(toks, x = t)))` is
    // O(distinct × n) in INTERPRETED lambda steps and allocates a
    // filtered array per distinct token — measured 20 s vs ~2 s for
    // the whole query at sf0.1.
    val topCount = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (a, t) => {
        val run = when(t === a.getField("prev"), a.getField("run") + 1)
          .otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(a.getField("best"), run).as("best"))
      },
      a => a.getField("best"))
    val topTok = when(ntok > 0,
      topCount.cast("double") / ntok.cast("double"))
      .otherwise(lit(0.0))
    struct(
      ntok.cast("long").as("ntok"),
      dupRate.as("dup_ngram_rate"),
      topTok.as("top_token_ratio"))
  }

  /** Corpus-statistical token rarity — the exact-arithmetic cousin of
    * unigram-LM quality scoring: every token OCCURRENCE is scored by
    * its token's TRUE document frequency (the number of distinct
    * documents containing it — the standard IR df, so a token spammed
    * inside one document cannot inflate its own rarity), and each
    * document aggregates sum/avg/min over its occurrences. Low avg →
    * rare-vocabulary document (OCR noise, code, non-target language);
    * min = 1 → the doc holds a token no other document has. Integer
    * sums + one final division keep the numbers bit-reproducible
    * across engines (a log-prob variant would be order-of-summation
    * sensitive and un-hashable), which is why this is the gated
    * formulation.
    *
    * The exploded token table feeds both the df build and the probe
    * side — persisted for the duration of the call and released after
    * the (small, one-row-per-doc) result is materialized, the same
    * caching contract as the Dedup joins. At cluster scale the df
    * table is VOCABULARY-sized — broadcast it (Spark does
    * automatically under the threshold) and the doc-side pass stays
    * shuffle-free.
    */
  def tokenRarity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("tok"))
      .persist()
    val dfreq = tok.select("id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val out = tok.join(dfreq, "tok")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("df")).as("sum_tok_df"),
        min(col("df")).as("min_tok_df"))
      .withColumn("avg_tok_df",
        col("sum_tok_df").cast("double") / col("n_tok").cast("double"))
    Dedup.materializeAndRelease(out, tok)
  }

  /** TF-IDF top-k terms per document — the classic keyword/topic
    * signal a curation pipeline tags documents with. score =
    * tf · ln(N/df), rounded to 9 dp (the q27 cross-engine idiom: both
    * engines' libm agree at that precision) with the token string as
    * the deterministic tie-break.
    *
    * Scale design: tf is ONE hash aggregate over the exploded tokens;
    * df is the same vocabulary-sized table [[tokenRarity]] builds —
    * no broadcast HINT (a web-scale vocabulary must be allowed to
    * shuffle-join; the planner broadcasts it automatically under the
    * threshold, the same contract as tokenRarity); N rides along as a
    * broadcast 1-row cross join (no driver round-trip). The top-k cut
    * is a per-document window — the shuffle key is the document id,
    * never the corpus.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tok = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("tok"))
      .persist()
    val tf = tok.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tok.select("id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("__n_docs"))
    val scored = tf
      .join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("__n_docs").cast("double") / col("df")), 9)
          + lit(0.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("tok"))
    val out = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("tok"), col("tf"), col("df"),
        col("score"))
    Dedup.materializeAndRelease(out, tok)
  }

  /** Unigram language-model score per document — the corpus-LM quality
    * filter (the role a KenLM perplexity gate plays in C4/Gopher-class
    * pipelines, with the corpus itself as the model): each token
    * scores ln(count(tok)/total_tokens), a document reports the sum
    * and the per-token mean. Documents of common well-distributed
    * tokens score high; gibberish and boilerplate-of-rare-junk score
    * low.
    *
    * Scale design: the unigram table is the vocabulary-sized count
    * aggregate (no broadcast hint — the planner broadcasts it under
    * the threshold, a web-scale vocabulary is allowed to shuffle-join),
    * scoring is one join + ONE per-doc aggregate. Cross-engine determinism: each token's log-prob is
    * rounded to 9 dp FIRST (the q27 idiom) and the per-doc sum runs in
    * DECIMAL(30,9) — exact and order-independent, immune to float
    * summation order. The per-token MEAN is deliberately NOT a rounded
    * double: round(sum/ntok, 9) diverges between engines when the
    * quotient lands on a half-way boundary (observed twice at sf0.1 —
    * identical doubles, different half-rounding). Instead the mean
    * ships as `nll_mean_nano`, the nano-scaled negative log-likelihood
    * floor((−sum·10⁹)/ntok) — all-integer, and positive, so SQL
    * truncating division and floor agree in every engine. Lower = more
    * corpus-typical.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    unigramLogProbCore(docs, idCol, tokens(col(textCol)))

  /** [[unigramLogProb]] over an ALREADY-TOKENIZED array column — for
    * pipelines whose upstream stage materialized the token arrays
    * (q71: chunk tokens are slices of the doc's `tokens()` output, and
    * `tokens` is a fixed point on its own output — rejoining with a
    * space and re-tokenizing reproduces the slice exactly, incl. the
    * empty-text [""] edge — so scoring the slice directly is
    * row-identical to re-tokenizing the joined chunk text, pinned by
    * UnigramSeamSpec). Skips a full normText+split pass over the
    * corpus (guide §2.4: remove passes).
    */
  private[graft] def unigramLogProbPreTokenized(docs: DataFrame,
      idCol: String, toksCol: String): DataFrame =
    unigramLogProbCore(docs, idCol, col(toksCol))

  private def unigramLogProbCore(docs: DataFrame, idCol: String,
                                 toksExpr: Column): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), toksExpr.as("__toks"))
      .select(col("id"), explode(col("__toks")).as("tok"))
      .persist()
    // the unigram table is persisted (it feeds BOTH the total and the
    // scoring join — vocabulary-sized, orders of magnitude below the
    // token stream) and the grand total is Σ its counts: the former
    // `tok.select(count(*))` paid a third full scan of the cached
    // explode for one scalar — same long value by definition
    val counts = tok.groupBy("tok").agg(count(lit(1)).as("cnt")).persist()
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val nllScaled = (col("__lp_sum") * lit(-1000000000L)).cast("long")
    val meanNano = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(nllScaled),
        org.apache.spark.sql.GraftColumnBridge.expression(col("ntok"))))
    val out = tok
      .join(counts, "tok")
      .crossJoin(broadcast(total))
      .withColumn("__lp",
        round(log(col("cnt").cast("double") / col("__total").cast("double")), 9)
          .cast("decimal(30,9)"))
      .groupBy("id")
      .agg(count(lit(1)).as("ntok"), sum(col("__lp")).as("__lp_sum"))
      .select(col("id"), col("ntok"),
        col("__lp_sum").cast("double").as("logprob_sum"),
        meanNano.as("nll_mean_nano"))
    Dedup.materializeAndRelease(out, tok, counts)
  }

  /** [[repetitionStats]] with the required two-step projection: the
    * token array is materialized as a column BEFORE the per-element
    * lambdas read it (the Dedup.shingles pattern — the min-size filter
    * between the projections references `__toks`, so PushDownPredicates
    * cannot sink it and CollapseProject cannot re-inline the tokenizer
    * into the lambda bodies; `size >= 0` is always true and exists
    * purely as that barrier). Appends ntok / dup_ngram_rate /
    * top_token_ratio to `df`.
    */
  def withRepetitionStats(df: org.apache.spark.sql.DataFrame,
                          textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val written = Seq("__toks", "ntok", "dup_ngram_rate", "top_token_ratio")
    val clash = df.columns.toSet.intersect(written.toSet)
    require(clash.isEmpty,
      s"withRepetitionStats writes ${written.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")}")
    val cols = df.columns.map(col)
    val r = repetitionStats(col("__toks"), n)
    // the barrier must pass EVERY row: size(NULL) is NULL (or -1 under
    // legacy sizeOfNull), so a bare `size >= 0` would silently DROP
    // null-text rows — coalesce keeps the filter inert while still
    // referencing __toks (which is what blocks the projection collapse)
    df.select(cols :+ tokens(col(textCol)).as("__toks"): _*)
      .filter(coalesce(size(col("__toks")) >= -1, lit(true)))
      .select(cols :+ r.getField("ntok").as("ntok") :+
        r.getField("dup_ngram_rate").as("dup_ngram_rate") :+
        r.getField("top_token_ratio").as("top_token_ratio"): _*)
  }

  /** Zipf curve of the corpus vocabulary: the top-`k` tokens by
    * frequency with their rank and round-9 (ln rank, ln freq)
    * coordinates — the standard corpus-health diagnostic (natural text
    * shows slope ≈ −1; templated/generated corpora bend the curve).
    * The slope fit is left to the consumer: the CURVE is the exact,
    * engine-reproducible artifact; a regression on 1 000 points is
    * trivially downstream. Top-k via orderBy+limit
    * (TakeOrderedAndProject); the rank window runs over k rows only.
    */
  def zipfCurve(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val freq = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("tok").asc)
    freq.orderBy(col("freq").desc, col("tok").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("tok"), col("freq"),
        round(log(col("rank").cast("double")), 9).as("ln_rank"),
        round(log(col("freq").cast("double")), 9).as("ln_freq"))
  }

  /** Heaps'-law vocabulary growth: cumulative (tokens seen, distinct
    * vocabulary) after each of `buckets` equal id-prefix slices of the
    * corpus — "is the vocabulary still growing, or are we re-crawling
    * the same language?" Uses the novelty trick: a token's FIRST
    * bucket is min over its occurrences, so the whole curve comes from
    * two vocabulary-sized aggregates + a 10-row window cumsum — one
    * corpus pass, no per-prefix rescans. `idCol` must be the dense
    * 0..N−1 doc id (the [[Curation.negativePairs]] contract).
    */
  def heapsGrowth(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val n = docs.select(count(lit(1)).as("__n"))
    val occ = docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("tok"))
      .crossJoin(broadcast(n))
      .select(col("tok"),
        least(lit(buckets - 1),
          floor(col("id") * buckets / col("__n"))).cast("int").as("b"))
      .persist()
    val tokPerB = occ.groupBy("b").agg(count(lit(1)).as("n_tok"))
    val vocabPerB = occ.groupBy("tok").agg(min(col("b")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n_new_vocab"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("b")).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = tokPerB.join(vocabPerB, Seq("b"), "left")
      .select(col("b").as("bucket"),
        sum(col("n_tok")).over(w).as("cum_tokens"),
        sum(coalesce(col("n_new_vocab"), lit(0L))).over(w)
          .as("cum_vocab"))
      .orderBy(col("bucket"))
    Dedup.materializeAndRelease(out, occ)
  }

  /** Stupid-Backoff bigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale LM that
    * deliberately skips normalization): score a BATCH of documents
    * under a bigram model counted from a separate MODEL corpus (the
    * incremental split: yesterday's corpus is the model, today's batch
    * gets scored). Per token position:
    *
    *  - first token: add-one unigram (c1(w)+1)/(N+V) — add-one keeps
    *    OOV tokens finite, V = model vocabulary size;
    *  - later tokens: c2(prev,w)/c1(prev) when the bigram was seen in
    *    the model, else 0.4 · ((c1(w)+1)/(N+V)) — the fixed 0.4
    *    backoff weight from the paper, no discounting.
    *
    * Determinism is the q66 idiom: each factor's ln is round-9'd into
    * DECIMAL(30,9) BEFORE the per-document sum; the mean NLL is the
    * all-integer nano-scaled IntegralDivide. Output per batch doc:
    * (id, nfactor, logprob_sum, nll_mean_nano).
    *
    * Scale: the bigram count table is corpus-sized, so it stays a
    * KEYED shuffle join on (prev, cur) — never broadcast; the unigram
    * joins are keyed on the token; N and V ride as broadcast 1-row
    * scalars. All rows are narrow (id, token) pairs.
    */
  /** Adjacent (prev, cur) token pairs of a token array; empty (typed)
    * for <2 tokens — the `sequence(a, b)` guard: a > b would yield a
    * DESCENDING sequence, not an empty one.
    */
  private def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("prev"),
          element_at(toks, i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))

  def stupidBackoffScore(docs: DataFrame, modelDocs: DataFrame,
                         idCol: String, textCol: String): DataFrame = {
    val mtok = modelDocs.select(tokens(col(textCol)).as("__toks"))
      .filter(coalesce(size(col("__toks")) >= -1, lit(true)))
    val uni = mtok.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1")).persist()
    val bi = mtok.select(explode(bigramsOf(col("__toks"))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("c2")).persist()
    val nTot = uni.agg(sum(col("c1")).as("__n"))
    val vSize = uni.agg(count(lit(1)).as("__v"))
    val dtok = docs.select(col(idCol).as("id"),
        tokens(col(textCol)).as("__toks"))
      .filter(coalesce(size(col("__toks")) >= -1, lit(true)))
    // the add-one unigram factor, written with ONE association
    // (0.4·(u)) mirrored exactly in the twin
    def uniProb(c1cur: Column): Column =
      (coalesce(c1cur, lit(0L)) + lit(1L)).cast("double") /
        (col("__n") + col("__v")).cast("double")
    def lp9(x: Column): Column = round(log(x), 9).cast("decimal(30,9)")
    val uniCur = uni.select(col("w").as("cur"), col("c1").as("c1cur"))
    val uniPrev = uni.select(col("w").as("prev"), col("c1").as("c1prev"))
    val f = dtok
      .select(col("id"), element_at(col("__toks"), 1).as("cur"))
      .filter(col("cur").isNotNull)
      .join(uniCur, Seq("cur"), "left")
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(vSize))
      .select(col("id"), lp9(uniProb(col("c1cur"))).as("__lp"))
    val b = dtok
      .select(col("id"), explode(bigramsOf(col("__toks"))).as("bg"))
      .select(col("id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .join(bi, Seq("prev", "cur"), "left")
      .join(uniPrev, Seq("prev"), "left")
      .join(uniCur, Seq("cur"), "left")
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(vSize))
      .select(col("id"),
        when(col("c2").isNotNull,
          lp9(col("c2").cast("double") / col("c1prev").cast("double")))
          .otherwise(lp9(lit(0.4) * uniProb(col("c1cur")))).as("__lp"))
    val nllScaled = (col("__s") * lit(-1000000000L)).cast("long")
    val meanNano = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(nllScaled),
        org.apache.spark.sql.GraftColumnBridge.expression(col("nfactor"))))
    val out = f.union(b).groupBy("id")
      .agg(count(lit(1)).as("nfactor"), sum(col("__lp")).as("__s"))
      .select(col("id"), col("nfactor"),
        col("__s").cast("double").as("logprob_sum"),
        meanNano.as("nll_mean_nano"))
    Dedup.materializeAndRelease(out, uni, bi)
  }

  /** Pointwise mutual information of adjacent token bigrams — the
    * collocation/phrase-detection statistic (Church & Hanks 1990) a
    * tokenizer-vocabulary or phrase-mining pass reads first:
    * PMI(x,y) = ln P(xy) − ln P(x) − ln P(y) with P(xy) = c₂/N_b and
    * P(w) = c₁/N_u, kept support-filtered (c₂ ≥ minCount — PMI is
    * degenerate on rare pairs).
    *
    * Determinism: counts are exact int64; the coefficient is ONE fixed
    * chain of doubles over them — ln c₂ + 2·ln N_u − ln N_b − ln c₁x
    * − ln c₁y, written in that association on both engines — and the
    * result is round-9'd (the q66 ln idiom: JVM `Math.log` and libm
    * `ln` differ by a few ulps on some inputs, so the raw chain is NOT
    * bit-identical cross-engine; at 9 dp it is).
    *
    * Scale shape: unigram and bigram counts are each ONE keyed,
    * map-side-combined aggregate over narrow rows; the c₁ joins are
    * token-keyed (vocabulary-sized table — AQE broadcasts it when
    * small, shuffles when not); N_u/N_b ride as broadcast 1-row
    * scalars. Nothing rescans the corpus.
    */
  def bigramPmi(docs: DataFrame, textCol: String,
                minCount: Long): DataFrame = {
    val toks = docs.select(tokens(col(textCol)).as("__toks"))
    val c1 = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1")).persist()
    val nu = c1.agg(sum(col("c1")).as("nu"))
    val c2 = toks.select(explode(bigramsOf(col("__toks"))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .groupBy("prev", "cur").agg(count(lit(1)).as("n_pair")).persist()
    val nb = c2.agg(sum(col("n_pair")).as("nb"))
    val pmi = log(col("n_pair").cast("double")) +
      lit(2) * log(col("nu").cast("double")) -
      log(col("nb").cast("double")) -
      log(col("c1p").cast("double")) -
      log(col("c1c").cast("double"))
    val out = c2.filter(col("n_pair") >= minCount)
      .join(c1.select(col("w").as("prev"), col("c1").as("c1p")), Seq("prev"))
      .join(c1.select(col("w").as("cur"), col("c1").as("c1c")), Seq("cur"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("prev"), col("cur"), col("n_pair"),
        graft.functions.hashSafeRound(pmi, 9).as("pmi"))
      .orderBy(col("n_pair").desc, col("prev"), col("cur"))
    Dedup.materializeAndRelease(out, c1, c2)
  }

  /** HTML → text extraction, the WET-generation step of a web
    * pipeline (trafilatura-lite): drop whole boilerplate blocks
    * (script/style/nav/footer), strip remaining tags, decode the
    * standard entities, collapse whitespace. Pure per-row regexp —
    * codegen'd, no UDF — and PORTABLE: every pattern avoids
    * backreferences (RE2, hence the DuckDB twin, has none) and uses
    * only (?s) + lazy quantifiers, which Java regex and RE2 share.
    * Documented limits (the honest ones of any regex extractor): a
    * literal `</script>` inside a JS string ends the block early;
    * comments/CDATA are not special-cased.
    */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?s)<title(?:\\s[^>]*)?>(.*?)</title>", 1)

  /** See [[htmlTitle]]. Entity decode order matters: `&amp;` is LAST,
    * so `&amp;lt;` decodes to the literal `&lt;` and not to `<`.
    */
  def htmlBodyText(html: Column): Column = {
    // head first (title/meta are not body text), then the body-level
    // boilerplate blocks — script/style again for inline occurrences.
    // `(\s[^>]*)?` (not `[^>]*`) so <head> cannot swallow a <header>
    // open tag, without the backreference RE2 lacks
    val noBlocks = Seq("head", "script", "style", "nav", "footer")
      .foldLeft(html)((c, tag) =>
        regexp_replace(c, s"(?s)<$tag(\\s[^>]*)?>.*?</$tag>", " "))
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags)((c, kv) => replace(c, lit(kv._1), lit(kv._2)))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** First-occurrence novelty — per document, the fraction of its
    * distinct word n-shingles that NO earlier document (by id order —
    * the corpus's arrival/crawl order) contains: the standing
    * redundancy diagnostic for curation ("is batch k still adding
    * content, or re-crawling what batch k−1 already got?") and the
    * score behind novelty-ordered curricula. A shingle's first owner
    * is its min id; a doc's novelty is |shingles first seen here| /
    * |shingles|. Exact duplicates of earlier docs score 0.
    *
    * Shares [[Dedup.hashedShingles]] (distinct 64-bit-hashed shingles,
    * cache-bounded projection), so the join shuffles narrow (id, hash)
    * longs — never strings; the first-owner table is vocabulary-sized
    * and stays a keyed shuffle join on the hash (NOT broadcast — at
    * corpus scale the shingle vocabulary dwarfs memory). Same
    * collision qualification as the dedup family (P ≈ sz²/2⁶⁵): a
    * colliding shingle could read as seen-before. Docs with < n tokens
    * are unshingleable and absent, the [[Dedup.shingles]] contract.
    */
  def noveltyScores(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val sh = Dedup.hashedShingles(docs, idCol, textCol, n,
      materialize = true)
    val ex = sh.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val firstSeen = ex.groupBy("s").agg(min(col("id")).as("first_id"))
    val out = ex.join(firstSeen, "s")
      .groupBy(col("id"), col("sz"))
      .agg(sum(when(col("first_id") === col("id"), lit(1L))
        .otherwise(lit(0L))).as("n_novel"))
      .select(col("id"), col("sz").cast("long").as("n_shingles"),
        col("n_novel"),
        (col("n_novel").cast("double") / col("sz").cast("double"))
          .as("novelty"))
    Dedup.materializeAndRelease(out, sh)
  }

  // ----------------------------------- linear quality classifier

  /** The "offline" half of a fastText/CCNet-style LINEAR quality
    * classifier: closed-form naive-Bayes log-odds weights over hashed
    * unigram+bigram features (the same hashing trick as DSIR's bucket
    * models, [[Curation.importanceWeights]]) from a SMALL labeled seed
    * set. Naive Bayes IS a linear model in feature space, and the
    * closed form trains in ONE aggregate pass — no iterative
    * optimizer, no ML runtime dependency; swap in externally-trained
    * weights by handing [[scoreLinearQuality]] any (b, w) table.
    *
    * Returns the COMPLETE (b, w) model — every bucket in [0, buckets),
    * unseen buckets carrying the smoothing-only weight — so scoring is
    * a plain inner join with no missing-key coalesce. Weights are
    * round-9 DECIMAL(30,9): the per-document dot product sums in
    * DECIMAL (order-independent), keeping scores engine-exact.
    */
  def trainLinearQuality(docs: DataFrame, idCol: String, textCol: String,
                         isPositive: Column, buckets: Int): DataFrame = {
    val feat = Curation.hashedNgramFeatures(
      docs.select(col(idCol).as("id"), isPositive.as("__pos"),
        col(textCol).as("__text")),
      Seq("id", "__pos"), "__text", buckets)
    // one aggregate pass carries BOTH class counts (q73 idiom)
    val cnt = feat.groupBy("b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__pos"), lit(1L)).otherwise(lit(0L))).as("__cp"))
    val full = docs.sparkSession.range(0, buckets)
      .select(col("id").as("b"))
      .join(cnt, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__cp"), lit(0L)).as("__cp"))
    val tots = full.agg(sum(col("__cp")).as("__tp"),
      (sum(col("__cr")) - sum(col("__cp"))).as("__tn"))
    def lp(c: Column, t: Column): Column =
      round(log((c + lit(1L)).cast("double") /
        (t + lit(buckets.toLong)).cast("double")), 9)
        .cast("decimal(30,9)")
    full.crossJoin(broadcast(tots))
      .select(col("b"),
        (lp(col("__cp"), col("__tp")) -
          lp(col("__cr") - col("__cp"), col("__tn"))).as("w"))
  }

  /** The online half: score every document as the mean-pooled dot
    * product of its hashed features against the broadcast model,
    * squashed by a sigmoid — how a fastText scorer gates quality in
    * CCNet/RefinedWeb-class web pipelines. `buckets` must match the
    * model's training value (the feature hash domain).
    *
    * Scale shape: the model is `buckets` rows (broadcast); the corpus
    * streams ONCE through a feature explode + broadcast join + hash
    * aggregate — nothing corpus-sized shuffles except the narrow
    * (id, bucket) feature rows, and the aggregate partial-combines
    * map-side. Determinism: the DECIMAL dot product is
    * order-independent; the mean + sigmoid is one IEEE chain rounded
    * hash-safe to 9 dp. A document with zero features (null/empty
    * text) scores sigmoid(bias) with nfeat = 0, not a dropped row.
    */
  def scoreLinearQuality(docs: DataFrame, idCol: String, textCol: String,
                         model: DataFrame, buckets: Int,
                         bias: Double = 0.0): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
    val pooled = Curation.hashedNgramFeatures(base, Seq("id"), "__text",
        buckets)
      .join(broadcast(model), "b")
      .groupBy("id")
      .agg(count(lit(1)).as("nfeat"), sum(col("w")).as("__s"))
    base.select(col("id")).join(pooled, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("nfeat"), lit(0L)).as("nfeat"),
        hashSafeRound(
          lit(1.0) / (lit(1.0) + exp(-(lit(bias) +
            coalesce(col("__s").cast("double") / col("nfeat").cast("double"),
              lit(0.0))))), 9).as("score"))
  }

  /** Corpus manifest — the dataset-card aggregate a corpus release
    * publishes, per `groupCols`: doc count, token total, distinct
    * normalized-text digest count (the exact-dup audit), and mean LM
    * NLL ([[unigramLogProb]]; IntegralDivide — exact long arithmetic,
    * engine-portable). One LM pass + one keyed group-by; the distinct
    * count is the only extra shuffle and stays keyed.
    *
    * Scale invariants (pinned by StressBench's manifest_clone10x):
    * under uniform k× corpus cloning, n_docs and total_tokens scale
    * ×k, n_unique is UNCHANGED, and mean_nll_nano is IDENTICAL —
    * P(w) = k·cnt / k·total is scale-free, and
    * floor(k·S / k·N) = floor(S/N) exactly.
    */
  def corpusManifest(docs: DataFrame, idCol: String, textCol: String,
                     groupCols: Seq[String]): DataFrame = {
    val scored = unigramLogProb(docs, idCol, textCol)
    Dedup.materializeAndRelease(
      corpusManifestWith(docs, idCol, textCol, groupCols, scored), scored)
  }

  /** [[corpusManifest]] under PRE-COMPUTED LM scores ([[unigramLogProb]]'s
    * output, which the caller owns and releases) — the report half of
    * the score-once-report-many split: a pipeline that materializes the
    * corpus LM score column runs every card/manifest off that table
    * instead of retraining the LM per report. `scored` must carry
    * (id, ntok, nll_mean_nano) for exactly the rows of `docs`.
    */
  def corpusManifestWith(docs: DataFrame, idCol: String, textCol: String,
                         groupCols: Seq[String],
                         scored: DataFrame): DataFrame = {
    val base = docs.select((Seq(col(idCol)) ++ groupCols.map(col) :+
        sha2(normText(col(textCol)), 256).as("__nt")): _*)
      .join(scored.select(col("id").as(idCol), col("ntok"),
        col("nll_mean_nano")), idCol)
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        countDistinct(col("__nt")).as("n_unique"),
        org.apache.spark.sql.GraftColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.GraftColumnBridge.expression(
              sum(col("nll_mean_nano"))),
            org.apache.spark.sql.GraftColumnBridge.expression(
              count(lit(1))))).as("mean_nll_nano"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Corpus word frequencies — the word-level dictionary every BPE-style
    * tokenizer trainer starts from (ref pipeline's token budgeting is
    * downstream of exactly this table). One wordcount-shaped keyed
    * shuffle with map-side partial aggregation; at 100 TB the output is
    * the DISTINCT-word table (≪ corpus), which is why [[bpeTrain]]'s
    * per-merge passes run over this table and never re-touch the corpus.
    */
  private[graft] def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Adjacent symbol-pair statistics over the character-level corpus
    * vocabulary — round 0 of BPE tokenizer training (Sennrich et al.
    * 2016): each word becomes its character sequence plus a `</w>`
    * end-of-word marker, and every adjacent pair is counted weighted by
    * the word's corpus frequency. Returns the top-`topK` pairs by
    * (count DESC, a ASC, b ASC) — the candidate merge table.
    *
    * Scale shape: ONE corpus-scale wordcount shuffle ([[wordCounts]]),
    * then pair explosion over the distinct-word table only (vocab ×
    * word-length rows), and a final aggregate over a tiny keyspace
    * (observed-alphabet² pairs) that map-side partials collapse almost
    * entirely. No part of this re-reads the corpus after the wordcount.
    */
  def bpePairStats(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val wc = wordCounts(docs, textCol)
    wc.select(explode(transform(sequence(lit(1), length(col("w"))),
        i => struct(col("w").substr(i, lit(1)).as("a"),
          when(i + lit(1) <= length(col("w")),
            col("w").substr(i + lit(1), lit(1)))
            .otherwise(lit("</w>")).as("b")))).as("p"), col("c"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("c")).as("pair_count"))
      .orderBy(desc("pair_count"), asc("a"), asc("b"))
      .limit(topK)
  }

  /** BPE merge training (Sennrich et al. 2016, the word-frequency
    * formulation): starting from each distinct word's character
    * sequence + `</w>`, repeatedly (1) count adjacent symbol pairs
    * weighted by word frequency, (2) take the argmax pair by
    * (count DESC, a ASC, b ASC), (3) merge every left-to-right
    * non-overlapping occurrence of that pair in every word. Returns the
    * ordered merge table `(merge_rank, a, b, pair_count)` — the learned
    * tokenizer, ready for [[tokenCounts]]-style budgeting or encoding.
    *
    * Distribution: the corpus is touched ONCE (the [[wordCounts]]
    * shuffle). Each merge round is a narrow map over the distinct-word
    * vocabulary (the `aggregate` fold below — codegen'd, no UDF) plus a
    * tiny pair aggregate; the only driver traffic is the per-round
    * 1-row argmax read (the same scalar-cursor pattern as the REST
    * cursor sources). Per-round vocab is persisted and the previous
    * round released, so lineage stays O(1) across rounds. At 100 TB the
    * vocabulary is what scales (≈10⁸ distinct words), and every
    * per-round pass is over exactly that table — the classic map-reduce
    * BPE trainer shape.
    *
    * The merge-apply fold is a single left-to-right pass: the
    * accumulator holds the merged prefix; a symbol equal to `b` fuses
    * with a trailing `a` (non-overlapping, so `aaa` under (a,a) yields
    * `[aa, a]` — the standard BPE convention, and bit-identical to the
    * DuckDB twin's string fold).
    */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (merges, vocab) = bpeTrainWithVocab(docs, textCol, numMerges)
    vocab.unpersist()
    merges
  }

  /** Train `numMerges` BPE rounds and return the final vocabulary
    * `(w, s, c)` — each distinct corpus word with its post-merge
    * subword sequence and frequency: the pre-trained dictionary the
    * `...With` variants ([[bpeEncodeWith]] / [[bpeFertilityWith]] /
    * [[bpeVocabIntegrityWith]]) consume. Comes back PERSISTED; the
    * caller owns the release (it is distinct-word-sized, not
    * corpus-sized, so pinning it for a session of reports is cheap).
    * This is the train-once-per-corpus seam: a release report, an
    * encoder, and an integrity audit share ONE trainer run instead of
    * each re-running the 6-round merge loop.
    */
  def bpeTrainedVocab(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame =
    bpeTrainWithVocab(docs, textCol, numMerges)._2

  /** The trainer loop behind [[bpeTrain]]. Returns (merge table, final
    * vocabulary `(w, s, c)` — each distinct word with its post-merge
    * symbol sequence and corpus frequency). The vocabulary comes back
    * PERSISTED; the caller owns the release.
    */
  private[graft] def bpeTrainWithVocab(docs: DataFrame, textCol: String,
      numMerges: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var vocab = wordCounts(docs, textCol)
      .select(col("w"),
        concat(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))), array(lit("</w>"))).as("s"),
        col("c"))
      .persist()
    // lazy per-round materialization: round r's argmax job fills round
    // r's cache, at which point round r-1's blocks are dead — one job
    // per round instead of two (the trailing count() below settles the
    // final round)
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = vocab.filter(size(col("s")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("s")) - 2),
          i => struct(element_at(col("s"), i + lit(1)).as("a"),
            element_at(col("s"), i + lit(2)).as("b")))).as("p"), col("c"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("pc"))
        .orderBy(desc("pc"), asc("a"), asc("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist())
      prev = None
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, a, b, pc))
        val next = vocab.select(col("w"), mergeFold(col("s"), a, b).as("s"),
          col("c")).persist()
        prev = Some(vocab)
        vocab = next
        rank += 1
      }
    }
    if (prev.isDefined) {
      vocab.count() // materialize before releasing the cached parent
      prev.foreach(_.unpersist())
    }
    import spark.implicits._
    (merges.result().toDF("merge_rank", "a", "b", "pair_count"), vocab)
  }

  /** The BPE merge-apply: one left-to-right pass fusing every
    * non-overlapping adjacent (a, b) into `a+b` — a codegen'd
    * `aggregate` fold whose accumulator is the merged prefix. The
    * `size(acc) > 0` guard short-circuits the ANSI `element_at` on the
    * empty accumulator. PropertiesSpec pins this against a driver-side
    * reference fold on randomized symbol sequences.
    */
  private[graft] def mergeFold(s: Column, a: String, b: String): Column =
    aggregate(s, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Reference semantics of [[mergeFold]], driver-side. */
  private[graft] def mergeFoldReference(s: Seq[String], a: String,
      b: String): Seq[String] =
    s.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b)
        acc.init :+ (a + b)
      else acc :+ x
    }

  /** BPE corpus encoding: train `numMerges` merges, then encode every
    * document under the learned vocabulary — per doc, the subword count
    * and the first `prefixLen` subwords in document order (the
    * spot-check window; the count is the full-document audit). Because
    * every corpus word is a key of the trained vocabulary, encoding is
    * the (pos, word) explode joined against the vocab on `w` — a keyed
    * shuffle against a dictionary that is broadcast when small — and a
    * per-document ordered reassembly (`array_sort` on the unique
    * in-document position, then flatten). No per-word re-merging ever
    * runs at encode time. Empty-text docs vanish with the inner join
    * (they have no words), matching the twin.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      numMerges: Int, prefixLen: Int): DataFrame = {
    val (_, vocab) = bpeTrainWithVocab(docs, textCol, numMerges)
    Dedup.materializeAndRelease(
      bpeEncodeWith(docs, idCol, textCol, vocab, prefixLen), vocab)
  }

  /** [[bpeEncode]] under a PRE-TRAINED vocabulary ([[bpeTrainedVocab]]'s
    * `(w, s)` shape) — the train-once seam: no trainer run, no release
    * of the caller's vocab.
    */
  def bpeEncodeWith(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, prefixLen: Int): DataFrame = {
    val words = docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    words.join(vocab.select("w", "s"), "w")
      .groupBy(idCol)
      .agg(sum(size(col("s"))).as("n_subwords"),
        array_join(slice(flatten(transform(
            array_sort(collect_list(struct(col("pos"), col("s")))),
            x => x.getField("s"))), 1, prefixLen), " ").as("prefix"))
      .orderBy(col(idCol))
  }

  /** Tokenizer fertility audit: train `numMerges` BPE merges
    * ([[bpeTrain]]), then measure per-`groupCol` how well the learned
    * vocabulary compresses the corpus — word occurrences, subword
    * tokens after encoding, and fertility (subwords per word, the
    * standard tokenizer-quality metric; 1.0 = every word is one
    * token). Because the trained vocabulary IS the encoding of every
    * distinct corpus word, encoding is a keyed join of the per-group
    * word counts against the vocabulary on `w` — the corpus is never
    * re-tokenized. Both sides of that join are word-keyed aggregates,
    * and the final group-by is |groups| rows; fertility is rounded to
    * 9 decimals ([[graft.functions.hashSafeRound]]) for engine-portable
    * hashing.
    */
  def bpeFertility(docs: DataFrame, textCol: String, groupCol: String,
      numMerges: Int): DataFrame = {
    val (_, vocab) = bpeTrainWithVocab(docs, textCol, numMerges)
    Dedup.materializeAndRelease(
      bpeFertilityWith(docs, textCol, groupCol, vocab), vocab)
  }

  /** [[bpeFertility]] under a PRE-TRAINED vocabulary
    * ([[bpeTrainedVocab]]) — the dataset-card/report path, where one
    * trainer run serves every audit instead of each re-running the
    * merge loop. Does not release the caller's vocab.
    */
  def bpeFertilityWith(docs: DataFrame, textCol: String, groupCol: String,
      vocab: DataFrame): DataFrame = {
    val perGroup = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(groupCol, "w").agg(count(lit(1)).as("c"))
    perGroup
      .join(vocab.select(col("w"), size(col("s")).cast("long").as("n_sub")), "w")
      .groupBy(groupCol)
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_sub")).as("n_subwords"))
      .select(col(groupCol), col("n_words"), col("n_subwords"),
        hashSafeRound(col("n_subwords").cast("double")
          / col("n_words").cast("double"), 9).as("fertility"))
      .orderBy(col(groupCol))
  }

  /** Lexical diversity per group: token mass, vocabulary size, hapax
    * legomena (words seen exactly once), type-token ratio, and the
    * hapax share of the vocabulary — the quick lexical-health read
    * next to the Zipf/Heaps curve fits (q85/q86): templated or
    * machine-generated text shows depressed TTR and hapax rates long
    * before a curve fit converges. One wordcount-shaped shuffle; the
    * per-group fold is over the distinct-word table. Ratios are
    * pinned integer-to-double divisions (no rounding step).
    */
  def lexicalDiversity(docs: DataFrame, textCol: String, groupCol: String)
      : DataFrame = {
    val cnt = docs
      .select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("grp", "tok").agg(count(lit(1)).as("cnt"))
    cnt.groupBy("grp")
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("cnt") === 1, lit(1L)).otherwise(lit(0L))).as("hapax"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("vocab"),
        col("hapax"),
        (col("vocab").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("hapax").cast("double") / col("vocab").cast("double"))
          .as("hapax_ratio"))
      .orderBy(groupCol)
  }

  /** Tokenizer-vocabulary integrity audit: after `numMerges` BPE
    * rounds, every word's subword sequence must concatenate back to
    * the word (+ the `</w>` end marker) — the losslessness property
    * every decode path depends on. Emits one row: vocabulary size,
    * total/max subwords per word, and the violation count (0 on a
    * correct trainer — this query is a standing regression gate on
    * the merge fold, hash-checked against the twin's replayed
    * vocabulary).
    */
  def bpeVocabIntegrity(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val (_, vocab) = bpeTrainWithVocab(docs, textCol, numMerges)
    Dedup.materializeAndRelease(bpeVocabIntegrityWith(vocab), vocab)
  }

  /** [[bpeVocabIntegrity]] over a PRE-TRAINED vocabulary
    * ([[bpeTrainedVocab]]); does not release the caller's vocab.
    */
  def bpeVocabIntegrityWith(vocab: DataFrame): DataFrame =
    vocab.agg(
      count(lit(1)).as("n_words"),
      sum(size(col("s")).cast("long")).as("n_subwords"),
      max(size(col("s"))).cast("long").as("max_subwords"),
      sum(when(concat_ws("", col("s")) =!=
          concat(col("w"), lit("</w>")), lit(1L)).otherwise(lit(0L)))
        .as("n_violations"))

  /** Pairwise corpus drift: the Jensen–Shannon divergence (nats,
    * 0 ≤ JS ≤ ln 2) between every pair of per-`srcCol` unigram
    * distributions — the "did this crawl/source shift vocabulary"
    * audit run when mixing or refreshing corpus sources. A pair near 0
    * is near-identical text; a pair near ln 2 is disjoint vocabulary.
    *
    * The sum is split analytically: tokens PRESENT IN BOTH sources
    * contribute 0.5·(pₐ·ln(pₐ/m) + p_b·ln(p_b/m)) with m the mixture
    * mean, while each source's UNSHARED probability mass contributes
    * exactly 0.5·ln 2·(1 − sharedMass) in closed form (m = p/2 there)
    * — so the only join is the INNER token join between source pairs,
    * never a full outer over the union vocabulary. Per-term doubles
    * follow the q66 cross-engine idiom (round-9 → DECIMAL(30,9), exact
    * order-independent sums); shared masses stay integral; the final
    * three-term combination is one pinned double chain.
    *
    * Scale: the (src, tok) count table is token-keyed; the pair join
    * fans each token over its ≤|sources| carriers with map-side
    * partial aggregation down to |sources|² rows. Source totals are a
    * broadcast. The corpus is tokenized once.
    */
  def sourceDivergence(docs: DataFrame, textCol: String, srcCol: String)
      : DataFrame = {
    val halfLn2 = 0.5 * math.log(2.0)
    val tok = docs.select(col(srcCol).as("src"),
      explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val cnt = tok.groupBy("src", "tok").agg(count(lit(1)).as("cnt"))
      .persist()
    // totals roll up from the already-shuffled count table — the corpus
    // really is tokenized once
    val tot = cnt.groupBy("src").agg(sum(col("cnt")).as("tot"))
    val a = cnt.select(col("src").as("src_a"), col("tok"),
      col("cnt").as("cnt_a"))
    val b = cnt.select(col("src").as("src_b"), col("tok"),
      col("cnt").as("cnt_b"))
    val totA = tot.select(col("src").as("src_a"), col("tot").as("tot_a"))
    val totB = tot.select(col("src").as("src_b"), col("tot").as("tot_b"))
    val pa = col("cnt_a").cast("double") / col("tot_a").cast("double")
    val pb = col("cnt_b").cast("double") / col("tot_b").cast("double")
    val m = (pa + pb) / lit(2)
    val shared = a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
      .join(broadcast(totA), "src_a")
      .join(broadcast(totB), "src_b")
      .withColumn("contrib",
        round(lit(0.5) * (pa * log(pa / m) + pb * log(pb / m)), 9)
          .cast("decimal(30,9)"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"), sum(col("cnt_a")).as("sh_a"),
        sum(col("cnt_b")).as("sh_b"), sum(col("contrib")).as("c"))
    val pairs = broadcast(totA).crossJoin(broadcast(totB))
      .filter(col("src_a") < col("src_b"))
    val out = pairs.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("c"), lit(0).cast("decimal(30,9)")).cast("double") +
          lit(halfLn2) *
            ((col("tot_a") - coalesce(col("sh_a"), lit(0L))).cast("double") /
              col("tot_a").cast("double")) +
          lit(halfLn2) *
            ((col("tot_b") - coalesce(col("sh_b"), lit(0L))).cast("double") /
              col("tot_b").cast("double"))).as("js"))
      .orderBy("src_a", "src_b")
    Dedup.materializeAndRelease(out, cnt)
  }
}
