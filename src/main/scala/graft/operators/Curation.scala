package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond the reference's surface:
  * benchmark decontamination and per-group quota capping — the two
  * standing steps between "deduplicated corpus" and "training mix" in
  * a large-scale LLM data pipeline.
  */
object Curation {

  /** Corpus snapshot diff — the dataset-versioning audit between two
    * versions of a document table: per status (`added`, `removed`,
    * `changed`, `unchanged` — membership by id, change by normalized
    * content digest), the document count. One id-keyed full outer join
    * of two digest projections; the digests make "changed" a content
    * judgment, not a byte comparison, exactly like [[Dedup.exact]].
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def dig(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"id_$side"),
        sha2(graft.functions.normText(col(textCol)), 256).as(s"h_$side"))
    dig(a, "a").join(dig(b, "b"), col("id_a") === col("id_b"), "full_outer")
      .select(when(col("h_a").isNull, lit("added"))
        .when(col("h_b").isNull, lit("removed"))
        .when(col("h_a") === col("h_b"), lit("unchanged"))
        .otherwise(lit("changed")).as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
      .orderBy("status")
  }

  /** Benchmark decontamination: drop every corpus document whose
    * word n-gram Jaccard similarity to ANY document of the (small)
    * contamination set reaches `t` — evaluation material must not leak
    * into training data, and substring/exact matching misses light
    * paraphrase, which shingle overlap catches.
    *
    * Shape: the corpus streams through ONCE; the contamination set
    * (benchmark suites — thousands of docs, not billions) is reduced
    * to a hashed-shingle posting list and the overlap count is a keyed
    * join on the shingle hash, exactly like [[Dedup.verifyJaccard]]'s
    * posting-list intersection — narrow (id, shingle) rows shuffle,
    * never full texts. Overlaps are true Jaccard scores modulo 64-bit
    * shingle-hash collisions (P ≈ sz²/2⁶⁵ per pair, the same
    * qualification as the Dedup joins), so the filter has no false
    * drops in practice; returns (kept corpus, dropped ids with their
    * best-matching contaminant and score).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    contam: DataFrame, contamIdCol: String,
                    contamTextCol: String,
                    n: Int, t: Double): (DataFrame, DataFrame) = {
    // the docs shingle table materializes before the explode: the
    // shared Dedup cache boundary stops the optimizer from inlining
    // the tokenize+gram+hash chain into the generator and join keys
    // (measured 35.4 s → ~5 s at sf0.1 without/with)
    val d = Dedup.hashedShingles(docs, idCol, textCol, n, materialize = true)
    val (kept, dropped) = decontaminatePreShingled(d, docs, idCol,
      contam, contamIdCol, contamTextCol, n, t)
    // dropped is already materialized by the variant, so the docs
    // shingle intermediate can be released here (same caching contract
    // as before the split)
    d.unpersist(blocking = false)
    (kept, dropped)
  }

  /** [[decontaminate]] over a CALLER-OWNED hashed-shingle table for the
    * corpus side (`d` = [[Dedup.hashedShingles]] of `docs` at the same
    * n — the caller persists, shares and releases it; the contamination
    * side is still shingled here, it is benchmark-suite-sized). Output
    * pair row-identical to [[decontaminate]] by construction (the
    * public wrapper delegates here), pinned by ShingleSeamSpec. Exists
    * for the q50 shared-shingle seam: the corpus is tokenized+shingled
    * once for the containment join and this stage derives its rows by
    * id anti-join instead of a second full pass.
    */
  private[graft] def decontaminatePreShingled(d: DataFrame,
      docs: DataFrame, idCol: String,
      contam: DataFrame, contamIdCol: String, contamTextCol: String,
      n: Int, t: Double): (DataFrame, DataFrame) = {
    val c0 = Dedup.hashedShingles(contam, contamIdCol, contamTextCol, n,
      materialize = true)
    val c = c0.select(col("id").as("cid"), col("sh").as("csh"), col("sz").as("csz"))
    val dEx = d.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val cEx = c.select(col("cid"), col("csz"), explode(col("csh")).as("s"))
    val inter = dEx.join(cEx, "s")
      .groupBy(col("id"), col("sz"), col("cid"), col("csz"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz") + col("csz") - col("inter")))
      .filter(col("jaccard") >= t)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("jaccard").desc, col("cid").asc)
    // same caching contract as the Dedup joins: the (small) manifest is
    // materialized into the cache, the corpus-sized shingle
    // intermediates released before returning
    val dropped = Dedup.materializeAndRelease(
      scored
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("id"), col("cid").as("contaminant_id"),
          col("jaccard").as("contaminant_jaccard")),
      c0)
    val kept = docs.join(
      dropped.select(col("id").as(idCol)), Seq(idCol), "left_anti")
    (kept, dropped)
  }

  /** Per-group quota capping (domain balancing): keep at most `quota`
    * rows per group, chosen DETERMINISTICALLY by `orderCols` (pass a
    * quality score descending + an id tie-breaker — "keep the best N
    * per domain", the standard mixing step).
    *
    * Two-phase top-N so a hot group is never sorted on one reducer: a
    * pre-pass windows over (group, input-partition id) — spreading
    * each group across as many reducers as it has input partitions —
    * and keeps each sub-partition's local top-quota; only those
    * ≤ quota × nPartitions survivors reach the final per-group window.
    * The pre-pass is PRUNING-ONLY, so correctness does not depend on
    * the (layout-dependent) partition id: a row outside its
    * sub-partition's top-quota cannot be in the group's true
    * top-quota, whatever the sub-partitioning was; the final window
    * applies the same deterministic total order to the survivors.
    */
  /** The pruning-only pre-pass of [[capPerGroup]], exposed so tests can
    * assert it actually prunes (the hot group's rows drop from
    * |group| to ≤ quota × input-partitions before the global window
    * ever sees them). */
  private[graft] def capPrePass(df: DataFrame, groupCols: Seq[String],
                                orderCols: Seq[org.apache.spark.sql.Column],
                                quota: Int): DataFrame = {
    val localW = Window
      .partitionBy(groupCols.map(col) :+ col("__cap_pid"): _*)
      .orderBy(orderCols: _*)
    df.withColumn("__cap_pid", spark_partition_id())
      .withColumn("__cap_lrk", row_number().over(localW))
      .filter(col("__cap_lrk") <= quota)
      .drop("__cap_pid", "__cap_lrk")
  }

  def capPerGroup(df: DataFrame, groupCols: Seq[String],
                  orderCols: Seq[org.apache.spark.sql.Column],
                  quota: Int): DataFrame = {
    require(!df.columns.exists(_.startsWith("__cap_")),
      "capPerGroup reserves the __cap_ column-name prefix")
    val pruned = capPrePass(df, groupCols, orderCols, quota)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    pruned.withColumn("__cap_rk", row_number().over(w))
      .filter(col("__cap_rk") <= quota)
      .drop("__cap_rk")
  }

  /** The quota=1 case of [[capPerGroup]] as a HASH AGGREGATE: keep,
    * per group, the single row minimizing `tieCol` (same row set as
    * `capPerGroup(groupCols, Seq(tieCol.asc), quota = 1)` whenever
    * `tieCol` is unique within each group — e.g. a primary key).
    * A `groupBy`/`min_by` aggregate gets MAP-SIDE PARTIAL aggregation
    * — each input partition reduces to ≤1 candidate row per local
    * group before anything shuffles — where `row_number().over(window)`
    * must shuffle-and-sort every input row (capPerGroup's local
    * pre-pass prunes per-partition, but is itself a window over
    * (group, partition_id), i.e. a full shuffle of its own). For the
    * content-hash canonicalization step of q44/q50 the groups ARE
    * near-unique (dup rate is small), so the window shape shuffled the
    * whole corpus twice for nothing.
    */
  def canonicalizeBy(df: DataFrame, groupCols: Seq[String],
                     tieCol: org.apache.spark.sql.Column): DataFrame = {
    val dataCols = df.columns.toSeq
    df.groupBy(groupCols.map(col): _*)
      .agg(min_by(struct(dataCols.map(col): _*), tieCol).as("__canon"))
      .select(dataCols.map(c => col("__canon").getField(c).as(c)): _*)
  }

  /** SEMANTIC decontamination — the embedding-space twin of
    * [[decontaminate]]: drop every corpus row whose embedding cosine
    * to ANY contamination-set embedding reaches `t`. n-gram overlap
    * misses heavy paraphrase; embedding similarity is the standard
    * second line. The contamination set is SMALL by definition
    * (benchmark suites), so the scale shape is a BROADCAST threshold
    * join — one corpus pass against an in-memory contam table, the
    * same asymmetry as brute-force top-k — never a corpus×corpus join.
    * Returns (kept, dropped-manifest) with each dropped row's
    * best-matching contaminant (highest cosine, ties to the smaller
    * contaminant id), mirroring [[decontaminate]]'s manifest contract.
    */
  def decontaminateSemantic(emb: DataFrame, idCol: String, vecCol: String,
                            contam: DataFrame, contamIdCol: String,
                            contamVecCol: String,
                            t: Double): (DataFrame, DataFrame) = {
    val c = contam.select(col(contamIdCol).as("cid"),
      col(contamVecCol).as("cvec"))
    val scored = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(c))
      .withColumn("cosine", graft.functions.cosineSim(col("vec"), col("cvec")))
      .filter(col("cosine") >= t)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cosine").desc, col("cid").asc)
    // clamp at 1.0: an IDENTICAL vector's self-cosine lands one ulp
    // ABOVE 1 in this engine and exactly 1.0 in DuckDB (measured
    // 1.0000000000000002 vs 1.0 — the one input class OBSERVED to
    // diverge; general pairs have matched bit-for-bit across
    // q13/q37/q53 at both scale factors, and the clamp additionally
    // bounds any future above-one artifact on either side). A true
    // cosine never exceeds 1, so the clamp loses nothing.
    //
    // materializeAndRelease mirrors the sibling [[decontaminate]]:
    // BOTH returned halves consume the manifest, so without caching it
    // the broadcast cross join + window would execute twice.
    val dropped = Dedup.materializeAndRelease(scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("cid").as("contaminant_id"),
        least(col("cosine"), lit(1.0)).as("contaminant_cosine")))
    val kept = emb.join(dropped.select(col("id").as(idCol)), Seq(idCol),
      "left_anti")
    (kept, dropped)
  }

  /** The 8-hex-digit md5-prefix threshold below which a key is kept at
    * `rate`: floor(rate · 2³²) rendered as zero-padded lowercase hex.
    * Lowercase-hex strings of equal length compare lexicographically
    * exactly as their numeric values, so `substr(md5(key),1,8) <
    * threshold` keeps the rate-fraction of keys in ANY engine whose
    * md5 renders lowercase hex — the cross-engine portability trick
    * (DuckDB twin: the identical substr/CASE expression).
    */
  private[graft] def rateThresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    // rate 1.0 would need 2³² = "100000000" (9 digits), which sorts
    // BELOW 8-digit strings starting with ≥ '2' — use 'g' instead,
    // which sorts above every hex digit, keeping everything.
    if (rate == 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Deterministic per-stratum hash sampling (mixture weighting): keep
    * each row iff the first 8 hex chars of md5(idCol-as-string) fall
    * below the stratum's rate threshold. The standard training-mix
    * step — downsample hot domains, keep rare ones — with three
    * properties a `rand()` sample lacks:
    *
    *   - PURE per-row predicate: no shuffle, no state, scales as the
    *     scan, and partition layout cannot affect which rows survive;
    *   - REPRODUCIBLE across engines and runs (md5 of the id is the
    *     whole coin), so the DuckDB oracle checks the exact row set,
    *     not just counts;
    *   - STABLE under rate changes: lowering a stratum's rate always
    *     keeps a SUBSET of the higher-rate sample (thresholds are
    *     nested), the property that makes ablation corpora comparable.
    *
    * Strata not named in `rates` use `defaultRate`.
    */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(rateThresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(rateThresholdHex(rate)))
          .otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 8) < threshold)
  }

  /** Deterministic hash split into named disjoint partitions — the
    * train/val/test assignment every training pipeline needs before
    * anything is shuffled into shards. `splits` is the ORDERED
    * (name, fraction) list (fractions must sum to 1); row → split is
    * decided by where the md5 coin substr(md5(salt '#' id), 1, 8)
    * falls among the cumulative-fraction thresholds (the
    * [[sampleStratified]] lowercase-hex comparison trick), so:
    *
    *   - the assignment is a PURE per-row predicate — no shuffle, no
    *     state, layout-independent, reproducible across engines (the
    *     DuckDB twin is the identical substr/CASE chain);
    *   - splits are DISJOINT and EXHAUSTIVE by construction (the last
    *     threshold is forced to top-of-range, so float accumulation
    *     can never strand a coin);
    *   - boundaries are PREFIX-NESTED: growing an earlier split's
    *     fraction only MOVES boundary rows from the adjacent split —
    *     train@96% is a superset of train@90% with val/test order
    *     kept, the property that makes held-out sets stable as the
    *     mix evolves;
    *   - the coin is SALTED, so split assignment is independent of
    *     every other md5 coin in the pipeline (sampling, Gumbel,
    *     negative pairs) — a row's survival in [[sampleStratified]]
    *     says nothing about which split it lands in.
    */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0),
      s"split fractions must be non-negative: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct: ${splits.map(_._1)}")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) <= 1e-9,
      s"split fractions must sum to 1, got $total")
    require(!df.columns.contains("split"),
      "splitByHash writes a 'split' column; input already has one")
    val coin = substring(
      md5(concat(lit(s"$salt#"), col(idCol).cast("string"))), 1, 8)
    val cums = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val bounded = splits.map(_._1)
      .zip(cums.init.map(c => rateThresholdHex(math.min(1.0, c))) :+ "g")
    val assign = bounded.init.foldRight(
      lit(bounded.last._1): org.apache.spark.sql.Column) {
      case ((name, thr), acc) => when(coin < lit(thr), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Train-overlap audit of a held-out split — the aggregate
    * containment stat next to q98's pairwise leakage matrix (the
    * GPT-3-appendix-style n-gram overlap analysis): for every document
    * of `auditName` (val/test), the fraction of its DISTINCT word
    * n-gram shingles that occur anywhere in the `trainName` split.
    * A near-1 overlap_rate marks an eval document whose content the
    * model will have seen piecewise even if no single training doc is
    * a near-duplicate — what pairwise-Jaccard leakage checks miss.
    *
    * Scale shape: the audit split is SMALL by construction (its split
    * fraction), so its shingle set drives a bloom that PRUNES the
    * train side ([[Scale.bloomPrunedSemiJoin]]) — train shingles
    * shuffle only the might-match subset (audit-sized + false
    * positives), and the train split is never globally distinct'd.
    * Shingles are the [[Dedup]] 64-bit hashes (same collision
    * qualification as every Dedup join; docs with < n tokens have no
    * shingles and are absent, per the shared shingle contract).
    * Exact output: (doc id, n_grams, n_in_train, overlap_rate) for
    * every audit doc with at least one shingle.
    */
  def splitOverlapAudit(docs: DataFrame, idCol: String, textCol: String,
                        splits: Seq[(String, Double)], n: Int,
                        trainName: String, auditName: String,
                        salt: String = "split"): DataFrame = {
    require(splits.exists(_._1 == trainName) && splits.exists(_._1 == auditName),
      s"trainName/auditName must be declared splits: $splits")
    val shl = Dedup.hashedShingles(docs, idCol, textCol, n, materialize = true)
    val ex = splitByHash(shl, "id", splits, salt)
      .select(col("id"), col("split"), explode(col("sh")).as("g"))
    val auditEx = ex.filter(col("split") === auditName).select(col("id"), col("g"))
    val trainG = ex.filter(col("split") === trainName).select(col("g"))
    val nAudit = auditEx.count() // the small split: one cache-backed count
    val inter = Scale.bloomPrunedSemiJoin(trainG, "g",
        auditEx.select(col("g")), "g",
        expectedKeys = math.max(1L, nAudit), fpp = 0.01)
      .distinct().withColumn("__hit", lit(1L))
    val out = auditEx.join(inter, Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_in_train"))
      .withColumn("overlap_rate",
        col("n_in_train").cast("double") / col("n_grams").cast("double"))
      .select(col("id"), col("n_grams"), col("n_in_train"), col("overlap_rate"))
    Dedup.materializeAndRelease(out, shl)
  }

  /** URL canonicalization + host-blocklist gate — the front gate of
    * every public web-corpus pipeline (C4's bad-domain list,
    * RefinedWeb's URL filtering) run BEFORE content work, so blocked
    * pages never pay tokenization. Appends `canonical_url`
    * ([[graft.functions.canonicalUrl]]) and `host`, drops rows whose
    * host is blocklisted. The blocklist is inlined as an `IN`-list
    * predicate: per-row, shuffle-free, pushdown-eligible — right for
    * the curated lists this step uses (hundreds to a few thousand
    * entries). A million-host blocklist should use a broadcast
    * anti-join on `host` ([[graft.operators.Scale.bloomPrunedAntiJoin]])
    * instead — same semantics, different join shape.
    */
  def filterBlockedHosts(df: DataFrame, urlCol: String,
                         blocked: Seq[String]): DataFrame = {
    val out = df
      .withColumn("canonical_url", graft.functions.canonicalUrl(col(urlCol)))
      .withColumn("host", graft.functions.urlHost(col("canonical_url")))
    if (blocked.isEmpty) out
    else out.filter(!col("host").isin(blocked: _*))
  }

  /** CCNet-style perplexity bucketing + sampling (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data" — the head/middle/tail split every major web corpus
    * pipeline runs after language ID): every document is scored by the
    * corpus unigram LM ([[TextAnalysis.unigramLogProb]] — lower mean
    * NLL = more fluent = "head"), tercile thresholds are derived from
    * the score distribution, each document is bucketed against them,
    * and each bucket keeps rows at its configured rate through the
    * pure md5 coin ([[sampleStratified]] — per-row, shuffle-free,
    * layout-independent).
    *
    * Scale shape: thresholds come from exact order statistics over a
    * FIXED-SIZE deterministic id-stride sample of the scores
    * (`stride = ceil(n/sampleCap)` — the q37 gate pattern), NOT a
    * global sort: the threshold stage is O(sampleCap) at ANY corpus
    * size (CCNet itself fits its thresholds on a held-out sample).
    * The single `Window.orderBy` runs over ≤ sampleCap rows by
    * construction — bounded, never corpus-wide. Scoring and bucketing
    * are one LM pass plus a broadcast of the 1-row threshold frame.
    *
    * Returns kept rows as (id, bucket, nll_mean_nano, ntok);
    * deterministic across engines (nll_mean_nano is exact long
    * arithmetic, thresholds are multiset order statistics — tie order
    * inside row_number cannot change the value at a rank).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        sampleCap: Long,
                        rates: Map[String, Double]): DataFrame = {
    val scored = TextAnalysis.unigramLogProb(docs, idCol, textCol)
    Dedup.materializeAndRelease(
      perplexityBucketsWith(scored, sampleCap, rates), scored)
  }

  /** [[perplexityBuckets]] under PRE-COMPUTED LM scores
    * ([[TextAnalysis.unigramLogProb]]'s output, which the caller owns
    * and releases) — the consumer half of the score-once split: the
    * bucketing/sampling never needed the corpus, only the score table,
    * so a pipeline that materializes the LM score column runs the
    * CCNet split straight off it. `scored` must carry
    * (id, nll_mean_nano) and must be materialized (pinned or
    * persisted) — the two driver-side counts below re-read it.
    */
  def perplexityBucketsWith(scored: DataFrame, sampleCap: Long,
                            rates: Map[String, Double]): DataFrame = {
    val n = scored.count()
    val stride = math.max(1L, (n + sampleCap - 1) / sampleCap)
    val sample = scored.filter(col("id") % stride === 0)
      .select(col("nll_mean_nano"))
    val m = sample.count()
    val k1 = math.max(1L, (m + 2) / 3)     // ceil(m/3)
    val k2 = math.max(1L, (2 * m + 2) / 3) // ceil(2m/3)
    val ranked = sample.withColumn("__r",
      row_number().over(Window.orderBy(col("nll_mean_nano"))))
    val thr = ranked
      .agg(min(when(col("__r") === k1, col("nll_mean_nano"))).as("__t1"),
           min(when(col("__r") === k2, col("nll_mean_nano"))).as("__t2"))
    val bucketed = scored.crossJoin(broadcast(thr))
      .withColumn("bucket",
        when(col("nll_mean_nano") <= col("__t1"), "head")
          .when(col("nll_mean_nano") <= col("__t2"), "middle")
          .otherwise("tail"))
      .drop("__t1", "__t2")
    sampleStratified(bucketed, "id", "bucket", rates, defaultRate = 1.0)
  }

  /** Token-budget shard packing: within each group (source/domain),
    * documents ordered by `idCol` are packed into shards of ~`budget`
    * tokens — shard k holds the docs whose EXCLUSIVE running token sum
    * lands in [k·budget, (k+1)·budget). The step that turns a curated
    * corpus into bounded training shards (sequence-building inputs,
    * per-file token quotas). Deterministic: the packing is a pure
    * function of (group, id order, token counts).
    *
    * A shard's total can overshoot `budget` by at most its last doc's
    * tokens (docs are never split); oversized single docs land alone in
    * their own shard.
    *
    * Scale shape: ONE window per group — a hot group's cumulative sum
    * serializes on one reducer, which is inherent to exact sequential
    * packing. For corpora with a dominant group, pre-split with
    * [[sampleStratified]] or salt the group key upstream: packing each
    * salted sub-group independently still yields valid ≤budget+max-doc
    * shards (shard ids then being (group, salt, k) triples), it only
    * relaxes WHICH docs share a shard.
    */
  def packShards(df: DataFrame, groupCol: String, idCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(!df.columns.contains("shard"),
      "packShards writes a 'shard' column; input already has one")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = coalesce(sum(col(tokensCol)).over(w), lit(0L))
    // INTEGRAL division (long DIV), not floor(double /): the cumulative
    // sum is exact in long arithmetic, and past 2^53 tokens per group a
    // double quotient could mis-round a boundary doc into the wrong
    // shard while the DuckDB twin's `//` stays exact — the same
    // divergence class Scale.epochDay was fixed for
    val shard = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(cum),
        org.apache.spark.sql.catalyst.expressions.Literal(budget)))
    df.withColumn("shard", shard)
  }

  // ------------------------------------------------- context windows

  /** Split each document into fixed-size token windows with a stride —
    * the training-example construction step (context-window chunking
    * with overlap when stride < chunkTokens). Chunks start at
    * 0, stride, 2·stride, … while the start is inside the document;
    * the last chunk simply clips at the end (no padding — padding is
    * the collator's job). Null-text documents produce NO chunks; an
    * empty string follows the tokenizer ([""] — one empty token), the
    * same convention as every other tokens() consumer.
    *
    * Scale design: pure per-row explode — no shuffle, no state; output
    * volume is input·(chunk/stride) overlap factor, stated not hidden.
    * The token array is materialized as a column BEFORE the generate
    * and the per-chunk slice, and — the Dedup.shingles lesson, NOT the
    * filter-barrier variant — no Filter sits between the projections:
    * a size() guard here gets PUSHED below the project with the whole
    * tokenizer inlined per condition (measured 3 copies/row). The
    * multi-reference rule alone keeps __toks materialized, and null
    * text needs no guard at all: sequence(null) explodes to zero rows.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, strideTokens: Int): DataFrame =
    chunkDocsBase(df, idCol, textCol, chunkTokens, strideTokens,
      toks => array_join(toks, " ").as("chunk_text"))

  /** [[chunkDocs]] emitting the raw token-array slice (`chunk_toks`)
    * instead of the space-joined `chunk_text` — for consumers that
    * immediately re-tokenize (q71's LM scoring): `tokens` is a fixed
    * point on its own output, so `tokens(array_join(chunk_toks, " "))
    * == chunk_toks` row-for-row (incl. the empty-text [""] edge) and
    * skipping the join+re-split saves two full string passes over the
    * chunk stream (guide §2.4). Identical rows otherwise; pinned by
    * UnigramSeamSpec.
    */
  private[graft] def chunkDocsToks(df: DataFrame, idCol: String,
      textCol: String, chunkTokens: Int, strideTokens: Int): DataFrame =
    chunkDocsBase(df, idCol, textCol, chunkTokens, strideTokens,
      toks => toks.as("chunk_toks"))

  private def chunkDocsBase(df: DataFrame, idCol: String, textCol: String,
                            chunkTokens: Int, strideTokens: Int,
                            payload: Column => Column): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0, s"strideTokens must be positive: $strideTokens")
    df.select(col(idCol),
        graft.functions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - 1,
          lit(strideTokens))).as("__start"))
      .select(col(idCol),
        (col("__start") / strideTokens).cast("long").as("chunk_idx"),
        col("__start").cast("long").as("start_tok"),
        least(lit(chunkTokens),
          size(col("__toks")) - col("__start")).cast("long")
          .as("n_chunk_tok"),
        payload(slice(col("__toks"), col("__start") + 1,
          lit(chunkTokens))))
  }

  // ------------------------------------------- temperature mixing

  /** Temperature-flattened source mixing — the mT5/LLaMA-style rate
    * computation on top of the [[sampleStratified]] coin: per-stratum
    * keep-rates are DERIVED FROM THE DATA as p_s ∝ (n_s/N)^α (the mT5
    * exponent convention: α < 1 flattens toward uniform, α = 1 is
    * proportional sampling), scaled to a total budget of
    * `budgetFraction`·N rows and capped at 1. The
    * classic fix for web-dominated corpora: hot sources downsample
    * hard, rare sources keep (nearly) everything.
    *
    * Scale design: rates come from ONE stratum-count aggregate
    * (broadcast — strata are few), the sample itself stays the pure
    * per-row md5 predicate (no shuffle, layout-independent,
    * reproducible). Determinism: the transcendental pow rounds to 9 dp
    * (q27 idiom), the weight SUM runs in DECIMAL (order-independent),
    * the remaining arithmetic is one IEEE chain written identically in
    * the twin, and the coin comparison is integer vs
    * floor(rate·2³²) — so the kept ROW SET is engine-exact.
    */
  def sampleTemperature(df: DataFrame, idCol: String, stratumCol: String,
                        alpha: Double,
                        budgetFraction: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    require(budgetFraction > 0.0 && budgetFraction <= 1.0,
      s"budgetFraction must be in (0,1]: $budgetFraction")
    // N = Σ per-stratum counts over the SAME global window the weight
    // normalization already pays — the former separate `df.agg(count)`
    // re-executed df's whole lineage (a join pipeline in q71) for one
    // scalar; identical long value by definition
    val weights = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__tot", sum(col("__n")).over(Window.partitionBy()))
      .withColumn("__w", round(pow(
        col("__n").cast("double") / col("__tot").cast("double"),
        lit(alpha)), 9))
    // global window, not a self-joined aggregate: the strata table is
    // tiny (it IS the stratum list) and the single-partition window
    // avoids the ambiguous self-join lineage. CONTRACT: strata must be
    // driver-scale (sources/domains — thousands, not corpus rows); the
    // single-partition WindowExec is bounded by that cardinality, so
    // the "No Partition Defined" warning is expected and safe here
    val rates = weights
      .withColumn("__wsum", sum(col("__w").cast("decimal(20,9)"))
        .over(Window.partitionBy()))
      .withColumn("__p", col("__w") / col("__wsum").cast("double"))
      .withColumn("keep_rate", least(lit(1.0),
        lit(budgetFraction) * col("__tot").cast("double") * col("__p") /
          col("__n").cast("double")))
      .select(col(stratumCol), col("keep_rate"))
    val coin = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.join(broadcast(rates), stratumCol)
      .filter(coin < floor(col("keep_rate") * lit(4294967296.0)).cast("long"))
      .drop("keep_rate")
  }

  /** Epoch/repetition planner — the RECIPE table [[sampleTemperature]]
    * executes row-wise: given per-stratum token masses, a temperature
    * exponent, a total token budget, and a repetition cap, emit each
    * stratum's planned share and epoch count (how many passes over the
    * source a training run makes — >1 repeats a small high-value
    * source, <1 subsamples a hot one; capped at `maxEpochs` per the
    * standard guidance that many repetitions degrade quality). This is
    * the planning artifact data teams review before launching a run;
    * the sampler enforces its <1 rows, a repeated-reader its >1 rows.
    *
    * Determinism is the q70 idiom verbatim: token-mass shares
    * p_s ∝ (T_s/T)^α with the transcendental pow rounded to 9 dp, the
    * weight sum in DECIMAL (order-independent), target_tokens =
    * floor(budget·p) in exact long, epochs rounded to 9 dp — the whole
    * table is engine-exact and hash-gatable.
    *
    * Scale shape: ONE map-side-combinable aggregate over (stratum,
    * tokens) pairs; the totals ride as a broadcast 1-row frame; the
    * output is |strata| rows. Nothing here grows with corpus size.
    */
  def epochPlan(df: DataFrame, stratumCol: String, tokensCol: String,
                alpha: Double, budgetTokens: Long,
                maxEpochs: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(maxEpochs > 0.0, s"maxEpochs must be positive: $maxEpochs")
    // total token mass = Σ per-stratum masses on the global window the
    // share normalization already pays (the q70 single-pass shape) —
    // the former separate `df.agg(sum)` was a second full pass
    val cnt = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
    cnt.withColumn("__tot", sum(col("n_tokens")).over(Window.partitionBy()))
      .withColumn("weight", round(pow(
        col("n_tokens").cast("double") / col("__tot").cast("double"),
        lit(alpha)), 9))
      .withColumn("__wsum", sum(col("weight").cast("decimal(20,9)"))
        .over(Window.partitionBy()))
      .withColumn("__p", col("weight") / col("__wsum").cast("double"))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * col("__p")).cast("long"))
      .withColumn("epochs", round(least(lit(maxEpochs),
        col("target_tokens").cast("double") / col("n_tokens").cast("double")),
        9))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        col("weight"), col("target_tokens"), col("epochs"))
  }

  // ------------------------------------------ importance weighting

  /** DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw-corpus document by how much more likely its
    * hashed n-gram bag is under a small TARGET corpus's bag-of-buckets
    * model than under the raw corpus's own — the standing method for
    * "make the web crawl look like Wikipedia" selection. Features are
    * word unigrams + bigrams WITH multiplicity (a bag, not a set —
    * unlike [[Dedup.shingles]]' distinct sets), hashed into `buckets`
    * md5 buckets; both models use add-one smoothing, and the document
    * score is log w(x) = Σ_features [ln p_target(b) − ln p_raw(b)].
    * Ranking by it (or thresholding, or Gumbel-perturbing) is the
    * caller's selection policy; this operator computes the weights.
    *
    * `isTarget` is a predicate over `docs` marking the target rows
    * (the common case: a source/quality tag on the same frame); a
    * separate target corpus unions in with the flag set. Target rows
    * contribute to BOTH models — raw = the whole frame, per the paper.
    *
    * Determinism (the q65/q66 idiom): each per-feature log term is
    * round-9'd into DECIMAL(30,9) BEFORE the per-document sum, so the
    * weight is an exact decimal — order-independent, engine-exact, and
    * hash-gatable; `log_weight` is that decimal cast to double.
    *
    * Scale design: feature rows are narrow (id, bucket) pairs —
    * Θ(2 × corpus tokens); the two count tables are ≤ `buckets` rows
    * and broadcast; totals ride as broadcast 1-row scalars; one hash
    * aggregate per document. No all-pairs term anywhere — the whole
    * point of DSIR's hashed features is that the model fits in a
    * broadcast no matter the corpus size.
    */
  /** Hashed unigram+bigram feature rows — the DSIR / fastText hashing
    * trick shared by [[importanceWeights]] (q73/q79) and the linear
    * quality classifier ([[TextAnalysis.trainLinearQuality]] /
    * [[TextAnalysis.scoreLinearQuality]]). The token array is
    * materialized as a column BEFORE the bigram lambda reads it, with
    * the inert filter barrier holding the projections apart (the
    * Dedup.shingles re-inlining trap); features hash to `buckets` via
    * the md5-prefix integer, so the bucket ids are engine-reproducible.
    * Emits one row per (carry columns..., bucket `b`); a null/empty
    * text contributes no rows.
    */
  private[graft] def hashedNgramFeatures(df: DataFrame, carry: Seq[String],
                                         textCol: String,
                                         buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val tok = df
      .select(carry.map(col) :+
        graft.functions.tokens(col(textCol)).as("__toks"): _*)
      .filter(coalesce(size(col("__toks")) >= -1, lit(true)))
    // sequence(1, size-1) would RISE for size=1 (Spark defaults to
    // step -1 when start > stop), hence the explicit size guard
    val bigrams = when(size(col("__toks")) >= 2,
      transform(sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", element_at(col("__toks"), i),
          element_at(col("__toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    tok.select(carry.map(col) :+
        explode(concat(col("__toks"), bigrams)).as("f"): _*)
      .select(carry.map(col) :+
        pmod(conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"): _*)
  }

  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: org.apache.spark.sql.Column,
                        buckets: Int): DataFrame = {
    val feat = hashedNgramFeatures(
      docs.select(col(idCol).as("id"), isTarget.as("__tgt"),
        col(textCol).as("__text")),
      Seq("id", "__tgt"), "__text", buckets)
      .persist()
    // BOTH models in one aggregate pass over the feature rows (ct is
    // the conditional count), and one broadcast join instead of two —
    // measured 3.20 → 2.6 s class at sf0.1 vs the two-pass shape
    val cnt = feat.groupBy("b").agg(count(lit(1)).as("cr"),
      sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val tots = cnt.agg(sum(col("cr")).as("__tr"),
      coalesce(sum(col("ct")), lit(0L)).as("__tt"))
    def lp(cnt: org.apache.spark.sql.Column,
           tot: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(log((cnt + lit(1L)).cast("double") /
        (tot + lit(buckets.toLong)).cast("double")), 9)
        .cast("decimal(30,9)")
    val out = feat
      .join(broadcast(cnt), "b")
      .crossJoin(broadcast(tots))
      .withColumn("__lp",
        lp(col("ct"), col("__tt")) -
          lp(col("cr"), col("__tr")))
      .groupBy("id")
      .agg(count(lit(1)).as("nfeat"), sum(col("__lp")).as("__w"))
      .select(col("id"), col("nfeat"),
        col("__w").cast("double").as("log_weight"))
    Dedup.materializeAndRelease(out, feat)
  }

  /** The sampler half of DSIR — Gumbel-top-k importance RESAMPLING:
    * selecting the k largest (log w(x) + Gumbel(0,1) noise) draws a
    * k-sample WITHOUT replacement from the softmax of the weights (the
    * Gumbel-max trick), which is what the paper actually does with the
    * [[importanceWeights]] scores — plain top-k is its deterministic
    * ablation. The "noise" here is the md5 coin (u = (h32 + 0.5)/2³²
    * ∈ (0,1), g = −ln(−ln u), round-9), so the drawn SET is
    * engine-exact and reproducible: same salt ⇒ same sample, new salt
    * ⇒ fresh draw. One scan + per-partition top-k
    * (TakeOrderedAndProject) — no shuffle of the corpus, no rand().
    */
  def gumbelTopK(df: DataFrame, idCol: String, weightCol: String,
                 k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (conv(substring(md5(concat(lit(s"$salt#"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    df.withColumn("gumbel", round(-log(-log(u)), 9))
      .withColumn("gumbel_score", col(weightCol) + col("gumbel"))
      .orderBy(col("gumbel_score").desc, col(idCol).asc)
      .limit(k)
  }

  // ---------------------------------------------- contrastive pairs

  /** Deterministic negative-pair sampling — the contrastive-training
    * data construction (k random non-self partners per anchor, e.g.
    * for embedding-model training or hard-negative mining baselines).
    * Partner j of anchor i is drawn md5-uniformly from the OTHER n−1
    * ids: raw = md5(i '#' j) mod (n−1), shifted past i when raw ≥ i —
    * the classic skip-self bijection, so partners stay uniform and
    * self-pairs are impossible by construction, not by rejection (a
    * rejection loop would make output SIZE data-dependent).
    *
    * Engine-reproducible (the [[Sketch]] md5 convention) so the
    * sampled pair SET is hash-gatable. No randomness source, no
    * rand(): re-runs, retries, and other engines produce the same
    * pairs.
    *
    * Scale design: n rides along as a broadcast 1-row cross join, the
    * fan-out is a per-row explode, and the partner-payload fetch is
    * ONE equi-join on the partner id — never a cross join of the
    * corpus against itself.
    *
    * CONTRACT: `idCol` must be a dense 0..n−1 long range (what a
    * packing/sharding step emits); sparse ids would silently bias the
    * draw toward gaps. The requirement is cheap to establish and
    * cheaper than the global row_number a rank-based rewrite would
    * serialize on.
    */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
                    payloadCols: Seq[String]): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val n = df.select(count(lit(1)).as("__n"))
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit("#"),
      col("j").cast("string"))), 1, 15), 16, 10).cast("long")
    val partners = df.select(col(idCol)).crossJoin(broadcast(n))
      .select(col(idCol), col("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("__raw", pmod(h, col("__n") - 1))
      // the assert is INSIDE the consumed expression (a standalone
      // guard column would be pruned away unevaluated): with n <= 1
      // there is no non-self partner — pmod(h, 0) would otherwise null
      // out and the final inner join silently emit ZERO rows (or throw
      // mid-job under ANSI), violating the k-per-anchor contract
      .withColumn("neg_id",
        when(assert_true(col("__n") > 1,
            lit("negativePairs requires at least 2 rows")).isNull,
          when(col("__raw") >= col(idCol), col("__raw") + 1)
            .otherwise(col("__raw"))))
      .select(col(idCol), col("j"), col("neg_id"))
    val payload = df.select((col(idCol).as("neg_id") +:
      payloadCols.map(c => col(c).as(s"neg_$c"))): _*)
    partners.join(payload, "neg_id")
      .select((col(idCol) +: col("j") +: col("neg_id") +:
        payloadCols.map(c => col(s"neg_$c"))): _*)
  }

  // ------------------------------------------------------ PII scrub

  /** Conservative PUBLIC-shape PII patterns, deliberately restricted
    * to the regex subset Java and RE2 (DuckDB) evaluate identically —
    * no lookaround, no backrefs — so the redaction is cross-engine
    * reproducible and oracle-checkable. Email is the RFC-adjacent
    * common shape; IPv4 is four 1-3 digit octets on word boundaries
    * (a longer digit run fails the boundary, so "1234.5.6.7" is NOT
    * an address); phone is the internationally-prefixed form
    * (+CC-XXX-XXXX with -/space separators) — the conservative choice
    * that never mangles ordinary numbers, ids, or prices.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}[- ]\\d{3,4}[- ]\\d{3,4}\\b"

  /** PII redaction — the standard pre-training scrub (C4/Dolma-class):
    * emails, IPv4 addresses, and internationally-prefixed phone
    * numbers become typed placeholder tokens, with per-row match
    * counts kept for the curation audit trail. Pure per-row
    * regexp_replace/regexp_count chain — codegen'd, NO shuffle,
    * partition-layout independent, so it composes anywhere in the
    * pipeline at any scale. Replacement order (email → IPv4 → phone)
    * is part of the contract: emails are consumed first so their
    * digit runs can never be re-matched as phones, and the
    * placeholders contain no digits so later passes cannot match
    * inside earlier replacements.
    *
    * The audit counts are PROGRESSIVE — each pattern is counted on
    * the text as it stands when that pattern's replacement runs
    * (emails on the raw text, IPv4 on the email-redacted text, phones
    * on the email+IPv4-redacted text) — so n_emails/n_ipv4/n_phones
    * are exact REPLACEMENT counts: an IPv4- or phone-shaped run
    * inside an email's domain is consumed by the email pass and never
    * inflates the later counters. (Raw-text counting would overstate
    * exactly those nested matches.) Codegen's common-subexpression
    * elimination shares the intermediate replace passes between the
    * counters and the final text.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_ipv4", regexp_count(afterEmail, lit(Ipv4Re)))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRe)))
      .withColumn(textCol, regexp_replace(afterIp, PhoneRe, "<PHONE>"))
  }

  /** Context-window packing plan: concatenation packing of each
    * shard's documents (in deterministic `idCol` order) into
    * fixed-size bins of `binTokens` tokens — the sequence-packing step
    * of a pretraining pipeline, emitted as a PLAN (doc → bin/position
    * assignment) rather than materialized token buffers. A document
    * starts at the running token offset of its shard's stream;
    * `bins_spanned` counts the context windows it straddles.
    *
    * Scale shape: packing is PER SHARD by construction (the realistic
    * contract — shards are the unit a trainer consumes), so the only
    * plan is one spillable window prefix-sum per shard key, never a
    * global single-partition cumsum. All arithmetic is int64
    * (offset // binTokens, offset % binTokens).
    *
    * Defined for n_tok ≥ 1 per document (the whitespace tokenizer
    * emits ≥ 1 token for any text).
    */
  def packPlan(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, binTokens: Long): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive: $binTokens")
    import graft.functions.intDiv
    // window over the RENAMED columns (the select below precedes it)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        col(tokensCol).cast("long").as("n_tok"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("n_tok"), col("start_tok"),
        intDiv(col("start_tok"), lit(binTokens)).as("bin"),
        (col("start_tok") % binTokens).as("bin_pos"),
        (intDiv(col("start_tok") + col("n_tok") - 1, lit(binTokens)) -
          intDiv(col("start_tok"), lit(binTokens)) + 1).as("bins_spanned"))
      .orderBy(col("shard"), col("doc_id"))
  }

  /** Packing-efficiency audit over [[packPlan]]: per shard, how well
    * concatenation packing fills the fixed-size context windows — bins
    * used (= ceil(total_tok / binTokens), exact in int64 as
    * (total_tok − 1) // binTokens + 1, defined because every shard has
    * ≥ 1 token), tail padding, fill rate, and how many documents
    * straddle a window boundary (each straddle is a document a trainer
    * sees split across contexts — the cost concatenation packing pays
    * for zero padding waste). The one-page report read before choosing
    * `binTokens`.
    *
    * Scale shape: [[packPlan]]'s per-shard window prefix sum, then ONE
    * map-side-combinable per-shard aggregate; output is |shards| rows.
    * All counts int64; the two shares are single int64→double
    * divisions rounded to 9 dp (hash-safe).
    */
  def packEfficiency(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, binTokens: Long): DataFrame = {
    import graft.functions.{hashSafeRound, intDiv}
    packPlan(df, shardCol, idCol, tokensCol, binTokens)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tok"),
        sum(when(col("bins_spanned") > 1, 1L).otherwise(0L))
          .as("n_straddling"))
      .withColumn("n_bins",
        intDiv(col("total_tok") - 1, lit(binTokens)) + 1)
      .withColumn("pad_tok",
        col("n_bins") * binTokens - col("total_tok"))
      .withColumn("fill_rate", hashSafeRound(
        col("total_tok").cast("double") /
          (col("n_bins") * binTokens).cast("double"), 9))
      .withColumn("straddle_share", hashSafeRound(
        col("n_straddling").cast("double") / col("n_docs").cast("double"),
        9))
      .orderBy(col("shard"))
  }

  /** Split mix-preservation audit over [[splitByHash]]: per
    * (split, group), the group's observed share of the split's
    * documents next to its share of the WHOLE corpus, with the round-9
    * absolute deviation — the check that a hash split did not skew the
    * source mix (it cannot systematically, the coin is independent of
    * every column; this audit is how that claim is verified on a given
    * corpus rather than assumed). Read before trusting a val/test
    * split to represent the training distribution.
    *
    * Scale shape: split assignment is the per-row salted md5 coin
    * (zero shuffle), then ONE (split, group) aggregate; the per-split
    * and per-group totals ride as broadcast joins on the ≤
    * |splits|·|groups| audit table. Shares are single int64→double
    * divisions; the deviation is one IEEE subtraction of round-9
    * terms, written identically in the twin.
    */
  def splitBalance(df: DataFrame, idCol: String, groupCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    import graft.functions.hashSafeRound
    val assigned = splitByHash(df.select(col(idCol), col(groupCol)),
      idCol, splits)
    val cell = assigned.groupBy(col("split"), col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    val perSplit = cell.groupBy(col("split"))
      .agg(sum(col("n_docs")).as("split_total"))
    val perGrp = cell.groupBy(col("grp"))
      .agg(sum(col("n_docs")).as("grp_total"))
    val corpus = cell.agg(sum(col("n_docs")).as("corpus_total"))
    cell.join(broadcast(perSplit), "split")
      .join(broadcast(perGrp), "grp")
      .crossJoin(broadcast(corpus))
      .select(col("split"), col("grp"), col("n_docs"),
        hashSafeRound(col("n_docs").cast("double") /
          col("split_total").cast("double"), 9).as("obs_share"),
        hashSafeRound(col("grp_total").cast("double") /
          col("corpus_total").cast("double"), 9).as("exp_share"))
      .withColumn("abs_dev", hashSafeRound(
        abs(col("obs_share") - col("exp_share")), 9))
      .orderBy(col("split"), col("grp"))
  }

  /** Deterministic weighted SYSTEMATIC sampling (the particle-filter /
    * survey-sampling classic): lay the corpus out on a weight axis in
    * id order and pick every row whose cumulative-weight interval
    * crosses a `stride` boundary — inclusion probability ∝ weight,
    * zero randomness, reproducible across engines because everything
    * is int64 (weights, prefix sums, floor-division boundary test).
    * A row heavier than `stride` crosses several boundaries but is
    * emitted once (its `pick_index` is the last boundary crossed), so
    * the sample size is ≤ total_weight/stride.
    *
    * Scale shape: the textbook formulation is one global running sum —
    * a single-partition window, dead at 100 TB. Here the prefix sum is
    * two-phase: per-bucket subtotals (`id/bucketWidth`) aggregate
    * map-side, a running offset over the |buckets| subtotal table
    * (tiny: domain/bucketWidth rows), then an id-ordered window WITHIN
    * each bucket adds the broadcast offset — the same decomposition a
    * distributed prefix-scan uses, so no task ever sees more than one
    * bucket's rows. Requires non-negative UNIQUE ids and strictly
    * positive integral weights: ids are the deterministic walk order,
    * so a duplicated id would make "this row's cumulative weight"
    * ill-defined (the in-bucket window is pinned to a ROWS frame so
    * even then each row gets a distinct running value, but WHICH
    * duplicate crosses a boundary would be partition-order dependent
    * — uniqueness is the caller's contract, enforced upstream by the
    * id columns used here being primary keys).
    */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
      stride: Long, bucketWidth: Long = 4096L): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1: $bucketWidth")
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(weightCol).cast("long").as("__w"))
    val wB = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base
      .groupBy(graft.functions.intDiv(col("__id"), lit(bucketWidth))
        .as("__bkt"))
      .agg(sum(col("__w")).as("__bw"))
      .withColumn("__off", coalesce(sum(col("__bw")).over(wB), lit(0L)))
      .select("__bkt", "__off")
    val wIn = Window.partitionBy("__bkt").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("__bkt", graft.functions.intDiv(col("__id"),
        lit(bucketWidth)))
      .join(offsets, "__bkt")
      .withColumn("__cum", col("__off") + sum(col("__w")).over(wIn))
      .filter(graft.functions.intDiv(col("__cum"), lit(stride)) >
        graft.functions.intDiv(col("__cum") - col("__w"), lit(stride)))
      .select(col("__id").as(idCol), col("__w").as(weightCol),
        col("__cum").as("cum_weight"),
        graft.functions.intDiv(col("__cum"), lit(stride))
          .as("pick_index"))
      .orderBy(idCol)
  }
}
