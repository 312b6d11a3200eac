package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic event-stream product analytics over the keyed event tables
  * the reference pipeline emits: funnel completion and cohort
  * retention. Both are single keyed shuffles; neither self-joins the
  * event table per step.
  */
object EventAnalytics {

  /** Funnel analysis with greedy earliest-completion semantics: per
    * entity, advance to step k+1 at the EARLIEST event of the step-k+1
    * type strictly after the step-k timestamp. Equivalent to the
    * chained `min(ts) > prev` formulation (the DuckDB twin) — strict
    * `>` makes tie order irrelevant — but computed in ONE pass: the
    * per-entity event history is sorted and folded through the
    * step-state machine as a codegen'd `aggregate`, so the event table
    * is shuffled ONCE on the entity key instead of once per funnel
    * step. Returns every entity with its reached depth and the
    * per-step completion timestamps (null past the reached depth).
    *
    * Scale: one hash-partitioned aggregate; state per entity is the
    * sorted (ts, type) history — bounded by per-entity activity, the
    * same envelope as Sessionize. A 100 TB event table with millions
    * of entities spreads on the entity key; no step count multiplies
    * the shuffle volume.
    *
    * MEMORY CONTRACT: the per-entity `collect_list` buffer does NOT
    * spill — one degenerate entity (a bot, a test account) with tens
    * of millions of events is a single-task OOM. `maxEventsPerEntity`
    * is the guard: when set, each entity's history is truncated to its
    * EARLIEST `cap` events (deterministic (ts, type) order) through a
    * window-ranked pre-filter — WindowExec's buffer spills to disk, so
    * the rank pass survives the hot entity that the fold alone would
    * not. Semantics under the cap are exact for every entity within it
    * (the greedy machine only ever consumes earliest events); a capped
    * entity is audited over its first `cap` events only — the right
    * read for bot-shaped keys, whose funnel depth past millions of
    * events is noise anyway. Size the cap from the q129 bot audit's
    * activity distribution (e.g. 100× the p99 entity). Default None
    * preserves the uncapped contract.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxStepGapUs: Option[Long] = None,
      maxEventsPerEntity: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val src = maxEventsPerEntity match {
      case None => events
      case Some(cap) =>
        require(cap > 0, s"maxEventsPerEntity must be positive: $cap")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(userCol))
          .orderBy(col(tsCol).asc, col(typeCol).asc)
        events.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    val stepsArr = array(steps.map(lit): _*)
    val evs = sort_array(collect_list(struct(col(tsCol).as("ts"),
      col(typeCol).as("et"))))
    // optional step deadline: advance only if the candidate lands
    // within maxStepGapUs of the previous step. The greedy machine
    // still equals the chained-min twin: the earliest qualifying event
    // is inside the window iff ANY qualifying event is (later ones are
    // later), so first-match == min-within-window.
    def withinDeadline(acc: Column, e: Column): Column =
      maxStepGapUs match {
        case None => lit(true)
        case Some(gap) =>
          unix_micros(e.getField("ts")) <=
            unix_micros(element_at(acc, lit(-1))) + lit(gap)
      }
    val folded = aggregate(evs, array().cast("array<timestamp>"),
      (acc, e) => when(size(acc) < steps.size &&
          e.getField("et") === element_at(stepsArr, size(acc) + 1) &&
          (size(acc) === 0 ||
            (e.getField("ts") > element_at(acc, lit(-1)) &&
              withinDeadline(acc, e))),
        concat(acc, array(e.getField("ts"))))
        .otherwise(acc))
    val stepCols = steps.indices.map { i =>
      when(size(col("__ts")) > i, element_at(col("__ts"), i + 1))
        .as(s"t${i + 1}")
    }
    src.groupBy(col(userCol))
      .agg(folded.as("__ts"))
      .select(col(userCol) +: size(col("__ts")).as("depth") +: stepCols: _*)
      .orderBy(col(userCol))
  }

  /** Rolling engagement: per calendar day, the exact distinct active
    * entities that day (DAU) and over the trailing `windowDays` days
    * (WAU-style). The (day, entity) distinct projection is fanned out
    * over its `windowDays` window anchors (a bounded explode — each
    * activity day serves up to `windowDays` windows) and aggregated
    * with ONE distinct count per anchor; the event table is never
    * rescanned per window. Anchors are restricted to days with
    * activity (inner join with the DAU side). At 100 TB, sliding
    * exact distincts are where the mergeable-HLL register family
    * ([[Sketch]]) takes over; this operator is the exact contract the
    * sketch is audited against.
    */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    val days = events
      .select(to_date(col(tsCol)).as("d"), col(userCol).as("u")).distinct()
    val dau = days.groupBy(col("d"))
      .agg(countDistinct(col("u")).as("dau"))
    val rolling = days
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("d"), col("u"))
      .select(date_add(col("d"), col("off")).as("anchor"), col("u"))
      .groupBy(col("anchor"))
      .agg(countDistinct(col("u")).as(s"wau_${windowDays}d"))
    dau.join(rolling, dau("d") === rolling("anchor"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col(s"wau_${windowDays}d"))
      .orderBy(col("day"))
  }

  /** The mergeable-sketch scale path [[rollingActive]]'s scaladoc
    * promises: trailing-`windowDays` distinct entities per day from
    * per-day HLL registers instead of re-counting (day, entity) pairs.
    * The corpus is touched ONCE — [[Sketch.hllRegistersBy]] grouped by
    * activity day — and everything after walks the register table
    * (days × ≤2^p rows): each register fans out to its `windowDays`
    * window anchors and merges by elementwise max (register
    * set-algebra: the union's register is the pairwise max), then
    * [[Sketch.hllEstimateBy]] reads one estimate per anchor. Where the
    * exact operator shuffles every (day, entity) pair `windowDays`
    * times — at 100 TB the entity domain itself is the shuffle — the
    * register fan-out moves `windowDays` × 2^p fixed-size rows per
    * day, and the SAME register table also serves DAU, MAU, or any
    * other window by re-fanning, with no new corpus scan. Anchors are
    * restricted to observed activity days, mirroring the exact
    * contract. Output: (day, wau_est) — the estimate carries the
    * standard ±1.04/√2^p relative error, audited against
    * [[rollingActive]] by its gate query.
    */
  def rollingActiveHll(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int, p: Int): DataFrame = {
    val du = events.select(to_date(col(tsCol)).as("d"), col(userCol).as("u"))
    val regs = Sketch.hllRegistersBy(du, "u", Seq("d"), p)
    val merged = regs
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("d"), col("bucket"), col("max_rho"))
      .select(date_add(col("d"), col("off")).as("anchor"),
        col("bucket"), col("max_rho"))
      .groupBy(col("anchor"), col("bucket"))
      .agg(max(col("max_rho")).cast("int").as("max_rho"))
    val est = Sketch.hllEstimateBy(merged, Seq("anchor"), p)
    val obs = du.select(col("d")).distinct()
    est.join(obs, est("anchor") === obs("d"))
      .select(date_format(col("anchor"), "yyyy-MM-dd").as("day"),
        col("estimate").as("wau_est"))
      .orderBy(col("day"))
  }

  /** Conversion statistics over [[funnel]]: entity counts, completion
    * rate, and the distribution of time-to-convert (first step → last
    * step) in seconds — exact interpolated percentiles over the
    * converted population (nulls, i.e. non-converters, are excluded by
    * the percentile/max semantics on both engines). The duration is
    * µs-exact long arithmetic divided once into double, so the value
    * is bit-identical across engines before the round-9.
    */
  def conversionStats(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    // time-to-convert is first step -> last step; with one step the
    // select below would project t1 twice and every t1 reference
    // becomes ambiguous
    require(steps.size >= 2,
      s"conversionStats needs at least two steps, got ${steps.size}")
    val f = funnel(events, userCol, tsCol, typeCol, steps)
    val dur = ((unix_micros(col(s"t${steps.size}")) - unix_micros(col("t1")))
      .cast("double") / lit(1000000.0)).as("d")
    f.select(col("t1"), col(s"t${steps.size}"), dur)
      .agg(count(lit(1)).as("n_users"),
        count(col(s"t${steps.size}")).as("n_converted"),
        graft.functions.hashSafeRound(
          count(col(s"t${steps.size}")).cast("double")
            / count(lit(1)).cast("double"), 9).as("conv_rate"),
        graft.functions.hashSafeRound(
          percentile(col("d"), lit(0.5)), 9).as("p50_secs"),
        graft.functions.hashSafeRound(
          percentile(col("d"), lit(0.9)), 9).as("p90_secs"),
        graft.functions.hashSafeRound(max(col("d")), 9).as("max_secs"))
  }

  /** First-order Markov transition matrix of the event stream: for
    * each (state, next-state) pair of event types within an entity's
    * timeline, the transition count and row-normalized probability.
    * One window pass per entity (lead over (ts, tie-break id)) and a
    * tiny keyed aggregate — the |types|² matrix is driver-scale
    * whatever the event volume. Terminal events (no successor) are
    * dropped, so each row of the matrix sums to 1.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(typeCol).as("et"), lead(col(typeCol), 1).over(w).as("net"))
      .filter(col("net").isNotNull)
      .groupBy("et", "net").agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy(col("et"))
    pairs
      .select(col("et"), col("net"), col("n"),
        graft.functions.hashSafeRound(
          col("n").cast("double") / sum(col("n")).over(wr).cast("double"),
          9).as("p"))
      .orderBy(col("et"), col("net"))
  }

  /** Two-step transition reachability — the composed (M²) companion
    * to [[transitionMatrix]]: `n_paths(a, c)` counts the ordered
    * event pairs reachable through ANY middle type in exactly two
    * consecutive steps, i.e. Σ_b n(a,b)·n(b,c) over the bigram
    * counts. The matrix-product formulation runs RELATIONALLY: the
    * (≤ |types|²-row) bigram table self-joins on the middle type —
    * never a timeline self-join, never anything corpus-sized — so the
    * expensive part stays the one entity-keyed window pass the bigram
    * extraction already pays. Path products accumulate in
    * DECIMAL(38,0) (two 100-TB-scale counts multiply past int64 —
    * the second-order-moment rule); the output count is cast to
    * int64 for the gate (documented envelope: Σ n·n′ < 2⁶³ at any
    * realistic |types|; keep the decimal internally past that).
    */
  def twoStepTransitions(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(typeCol).as("et"), lead(col(typeCol), 1).over(w).as("net"))
      .filter(col("net").isNotNull)
      .groupBy("et", "net").agg(count(lit(1)).as("n"))
    val a = pairs.select(col("et").as("et_from"), col("net").as("mid"),
      col("n").as("n1"))
    val b = pairs.select(col("et").as("mid"), col("net").as("et_to"),
      col("n").as("n2"))
    a.join(b, "mid")
      .groupBy("et_from", "et_to")
      .agg(sum(col("n1").cast("decimal(38,0)") * col("n2"))
        .cast("long").as("n_paths"))
      .orderBy("et_from", "et_to")
  }

  /** Hour-of-day activity profile per event type: exact int64 counts
    * per (type, hour) cell plus each cell's share of its type's total
    * — the diurnal-shape audit (bot traffic is flat, human traffic
    * has a day curve). The share is ONE int64/int64 IEEE divide per
    * cell (engine-exact). One map-side-combined aggregate over the
    * corpus into ≤ |types|·24 rows; the per-type total rides a window
    * over that tiny table.
    */
  def hourlyActivityProfile(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = events
      .groupBy(col(typeCol).as("event_type"),
        hour(col(tsCol)).cast("long").as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy("event_type")
    cells
      .select(col("event_type"), col("hour_of_day"), col("n"),
        (col("n").cast("double") /
          sum(col("n")).over(wt).cast("double")).as("share"))
      .orderBy("event_type", "hour_of_day")
  }

  /** Session-level co-occurrence lift per unordered event-type pair:
    * lift(a,b) = P(a,b together in a session) / (P(a)·P(b)) =
    * n_ab·N / (n_a·n_b) over [[Sessionize.assign]]'s sessions — the
    * market-basket audit on the session dimension (lift > 1: the
    * types attract; < 1: they repel), next to [[transitionMatrix]]'s
    * ORDER-sensitive adjacency and q170's token-level PMI. All four
    * counts are exact int64 session counts; the session self-join
    * keys on the (entity, session) pair whose per-session distinct
    * type set is ≤ |types| rows, so the pair fan-out is bounded at
    * |types|²/2 per session — never corpus×corpus. The single double
    * chain per pair divides two int64 products; rounded at 9 (the
    * PMI precedent) so the gate is immune to ulp-level int64→double
    * effects past 2⁵³ at extreme session counts; the count products
    * multiply through DECIMAL(38,0), so past N ≈ 3·10⁹ sessions they
    * stay exact instead of wrapping int64.
    */
  def sessionCooccurrenceLift(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String,
      gapMicros: Long): DataFrame = {
    val sess = Sessionize.assign(
      events.select(col(userCol), col(tsCol), col(tieCol), col(typeCol)),
      Seq(userCol), tsCol, Seq(tieCol), gapMicros)
    val st = sess.select(col(userCol).as("u"), col("session_seq"),
      col(typeCol).as("t")).distinct()
    val total = st.select("u", "session_seq").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val na = st.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val pairs = st.select(col("u"), col("session_seq"), col("t").as("ta"))
      .join(st.select(col("u"), col("session_seq"), col("t").as("tb")),
        Seq("u", "session_seq"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta").as("type_a"), col("tb").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(na.select(col("t").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(na.select(col("t").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        // dsum discipline (ADVICE r11): one DECIMAL(38,0) operand per
        // product, so past the int64 envelope the multiply degrades to
        // an exact decimal instead of a silently-wrapped int64 (values
        // at gate scale sit far below 2⁵³, so the double conversion —
        // and the hash — are unchanged)
        graft.functions.hashSafeRound(
          (col("n_ab").cast("decimal(38,0)") * col("n_sessions"))
            .cast("double") /
            (col("n_a").cast("decimal(38,0)") * col("n_b"))
              .cast("double"), 9).as("lift"))
      .orderBy("type_a", "type_b")
  }

  /** Top event paths: the most common ordered `n`-step event-type
    * sequences across entity timelines (the second-order companion to
    * [[transitionMatrix]]). One window pass chains `n-1` leads per
    * event — still a single entity-keyed shuffle — and the path
    * aggregate is at most |types|ⁿ keys. Ties in the top-k cut break
    * by path string ascending.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2, s"path length must be >= 2: $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val steps = col(typeCol) +:
      (1 until n).map(i => lead(col(typeCol), i).over(w))
    events
      .select(concat_ws(" > ", steps: _*).as("path"),
        steps.last.isNotNull.as("complete"))
      .filter(col("complete"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(k)
  }

  /** Daily-volume anomaly detection: per (event type, day), the event
    * count's z-score against the trailing `windowDays`-day calendar
    * window (current day excluded) — the ops-facing "did ingest spike
    * or stall today" audit. The window is RANGE-based on the epoch-day
    * key, so missing calendar days genuinely shrink the trailing
    * sample instead of silently stretching it. Days with fewer than
    * `minDays` trailing observations emit no judgment (n_days reports
    * the sample), and a zero-variance history yields a null z (flagged
    * false), not a division blow-up.
    *
    * Exactness: counts are longs; the trailing mean and the sample
    * variance numerator n·Σx² − (Σx)² stay integral until one pinned
    * double division chain (and one IEEE sqrt), so z is bit-stable
    * across engines with no rounding step.
    *
    * Scale: one keyed aggregate to the |types| × |days| daily table —
    * calendar-bounded — then windows over that tiny table. The raw
    * event table is touched once.
    */
  def volumeAnomaly(events: DataFrame, tsCol: String, typeCol: String,
      windowDays: Int = 7, minDays: Int = 3, zThreshold: Double = 3.0)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol).as("et"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dnum", unix_date(col("d")).cast("long"))
    val w = Window.partitionBy(col("et")).orderBy(col("dnum"))
      .rangeBetween(-windowDays, -1)
    val stats = daily
      .withColumn("n_days", count(col("n")).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("n_days") >= minDays)
      .withColumn("var_num",
        col("n_days") * col("s2") - col("s1") * col("s1"))
      .withColumn("mean_w",
        col("s1").cast("double") / col("n_days").cast("double"))
      .withColumn("z",
        when(col("var_num") > 0,
          (col("n").cast("double") - col("mean_w")) /
            sqrt(col("var_num").cast("double") /
              (col("n_days") * (col("n_days") - 1)).cast("double"))))
    stats.select(col("et").as("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"), col("n_days"), col("mean_w"), col("z"),
        coalesce(abs(col("z")) > lit(zThreshold), lit(false)).as("spike"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Inter-event cadence: the distribution of gaps between consecutive
    * events of the same type within an entity's timeline — the "how
    * often does a user do X" audit next to [[volumeAnomaly]]'s global
    * volumes. One (entity, type)-keyed window pass computes the µs
    * gaps (deterministic (ts, tie) order); the per-type aggregate
    * reports exact mean (integral µs sum, one pinned division) and
    * interpolated p50/p90/max seconds. Output is |types| rows.
    */
  def interEventGaps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsCol), col(tieCol))
    val gaps = events
      .select(col(typeCol).as("event_type"),
        (unix_micros(col(tsCol)) -
          lag(unix_micros(col(tsCol)), 1).over(w)).as("g"))
      .filter(col("g").isNotNull)
      .withColumn("gs", col("g").cast("double") / lit(1000000.0))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("g")).cast("double") / count(lit(1)).cast("double") /
          lit(1000000.0)).as("mean_s"),
        graft.functions.hashSafeRound(
          percentile(col("gs"), lit(0.5)), 9).as("p50_s"),
        graft.functions.hashSafeRound(
          percentile(col("gs"), lit(0.9)), 9).as("p90_s"),
        max(col("gs")).as("max_s"))
      .orderBy("event_type")
  }

  /** Activity concentration: per event type, how concentrated the
    * volume is across entities — exact Gini coefficient plus the share
    * held by the top decile of entities (the power-user curve
    * summarized to two numbers; the "is this metric driven by a few
    * whales" audit). Per-entity counts are ranked ascending with a
    * pinned (count, entity) tie order; Σ rank·count is widened to
    * DECIMAL before the product so the Gini numerator
    * 2·Σi·xᵢ − (n+1)·Σx stays exact at any entity count, with one
    * pinned double division chain at the end. The top-decile cut is
    * ceil(n/10) entities by the same deterministic order (ties broken
    * identically in both engines, so the cut set — not just its size —
    * is pinned).
    *
    * Scale: one keyed aggregate to (type, entity) counts, then windows
    * partitioned by type over that collapsed table — rank state per
    * type, no self-joins.
    */
  def activityConcentration(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = events
      .groupBy(col(typeCol).as("event_type"), col(userCol).as("u"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x").asc, col("u").asc)
    val wAll = Window.partitionBy(col("event_type"))
    val ranked = perUser
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("ntot", count(lit(1)).over(wAll))
      // ceil(ntot/10) entities from the TOP of the ascending rank order
      .withColumn("topdec",
        col("i") > col("ntot") - expr("(ntot + 9) div 10"))
    // the Gini numerator 2*Sum(i*x) - (n+1)*Sum(x) is non-negative (ranks
    // ascend) but DECIMAL-wide; it exits through the int64 gate (floor-
    // quantize to nano units, then one exact cast — the q121 lesson)
    // rather than a direct wide-DECIMAL->DOUBLE cast
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("n_events"),
        sum(col("i").cast("decimal(38,0)") * col("x")).as("six"),
        sum(when(col("topdec"), col("x")).otherwise(lit(0L))).as("top_cnt"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        (graft.functions.intDiv((lit(2) * col("six") -
            (col("n_users") + 1).cast("decimal(38,0)") * col("n_events")) *
            lit(1000000000L),
          col("n_users").cast("decimal(38,0)") * col("n_events"))
          .cast("double") / lit(1e9)).as("gini"),
        (col("top_cnt").cast("double") / col("n_events").cast("double"))
          .as("top10_share"))
      .orderBy("event_type")
  }

  /** Daily reliability: per calendar day, total events, events of the
    * designated error type, the error rate, and how many distinct
    * entities hit an error — the error-budget table next to
    * [[volumeAnomaly]]'s volume z-scores. One keyed aggregate to the
    * calendar-bounded daily table; the rate is a pinned
    * integer→double division.
    */
  def errorRates(events: DataFrame, tsCol: String, typeCol: String,
      userCol: String, errorType: String = "error"): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col(typeCol) === errorType, lit(1L)).otherwise(lit(0L)))
          .as("n_errors"),
        countDistinct(when(col(typeCol) === errorType, col(userCol)))
          .as("n_error_users"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("n_errors"), col("n_error_users"),
        (col("n_errors").cast("double") / col("n_events").cast("double"))
          .as("error_rate"))
      .orderBy("day")

  /** Funnel drop-off summary over [[funnel]]: one row per step with
    * how many entities reached it, the step-over-step conversion, and
    * the conversion from the step-1 population — the table a funnel
    * chart renders. Entities that never reach step 1 count only in the
    * denominator of step 1's `conv_from_prev` (the full entity
    * population). Steps nobody reached emit 0 with a null conversion
    * once the previous step is also 0.
    *
    * Shape: the funnel's per-entity depths collapse via a bounded
    * explode (depth ≤ |steps| rows per entity) into |steps| counters;
    * everything after the funnel's single entity-keyed shuffle is
    * driver-scale.
    */
  def funnelDropoff(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxStepGapUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = funnel(events, userCol, tsCol, typeCol, steps, maxStepGapUs)
      .select(col(userCol), col("depth")).persist()
    val total = f.agg(count(lit(1)).as("n_total"))
    val reached = f.filter(col("depth") >= 1)
      .select(explode(sequence(lit(1), col("depth"))).as("step"))
      .groupBy("step").agg(count(lit(1)).as("n_reached"))
    val names = array(steps.map(lit): _*)
    val grid = events.sparkSession.range(1, steps.size + 1).toDF("step")
      .select(col("step").cast("int").as("step"))
    val out = grid.join(reached, Seq("step"), "left")
      .crossJoin(broadcast(total))
      .select(col("step").cast("long").as("step"),
        element_at(names, col("step")).as("step_name"),
        coalesce(col("n_reached"), lit(0L)).as("n_reached"),
        col("n_total"))
      .withColumn("prev",
        coalesce(lag(col("n_reached"), 1).over(Window.orderBy(col("step"))),
          col("n_total")))
      .select(col("step"), col("step_name"), col("n_reached"),
        when(col("prev") > 0,
          col("n_reached").cast("double") / col("prev").cast("double"))
          .as("conv_from_prev"),
        when(col("n_total") > 0,
          col("n_reached").cast("double") / col("n_total").cast("double"))
          .as("conv_from_total"))
      .orderBy("step")
    Dedup.materializeAndRelease(out, f)
  }

  /** Session-level engagement distribution: [[Sessionize.assign]]'s
    * sessions collapsed to ONE global row — session count, exact mean
    * and interpolated p50/p90 duration (seconds), mean events per
    * session, and the single-event (bounce) rate. Durations are
    * µs-exact longs divided once into double; mean/rate chains are
    * pinned integer-to-double divisions. One entity-keyed shuffle
    * (the sessionizer's), then a per-session aggregate and a global
    * fold with map-side partials.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    val sess = Sessionize.assign(
        events.select(col(userCol), col(tsCol), col(tieCol)),
        Seq(userCol), tsCol, Seq(tieCol), gapMicros)
      .groupBy(col(userCol), col("session_seq"))
      .agg((max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("dur_us"),
        count(lit(1)).as("n_events"))
      .withColumn("dur_s", col("dur_us").cast("double") / lit(1000000.0))
    sess.agg(count(lit(1)).as("n_sessions"),
        (sum(col("dur_us")).cast("double") / count(lit(1)).cast("double") /
          lit(1000000.0)).as("mean_dur_s"),
        graft.functions.hashSafeRound(
          percentile(col("dur_s"), lit(0.5)), 9).as("p50_dur_s"),
        graft.functions.hashSafeRound(
          percentile(col("dur_s"), lit(0.9)), 9).as("p90_dur_s"),
        (sum(col("n_events")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_events"),
        (sum(when(col("n_events") === 1, lit(1L)).otherwise(lit(0L)))
          .cast("double") / count(lit(1)).cast("double")).as("bounce_rate"))
  }

  /** Peak concurrency per day: how many [[Sessionize.assign]] sessions
    * overlap at once, reported as the daily maximum over the state
    * immediately after each session start/end transition (days with no
    * transition — i.e. fully covered by long sessions — emit no row by
    * definition). The classic interval sweep (+1 at start, −1 at end,
    * running sum), with ends ordered before starts at the same instant
    * so touching sessions never double-count.
    *
    * Scale shape: the sweep is NOT one global window — rows partition
    * by calendar day (parallel, bounded partitions) and each day adds
    * its carry-in: the count of sessions that started on an earlier
    * day and are still open at the day boundary, computed by a bounded
    * explode over each session's spanned days. Day-local prefix sum +
    * carry equals the global sweep exactly; the DuckDB twin runs the
    * single-window global formulation, pinning the equivalence.
    */
  def peakConcurrency(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = Sessionize.assign(
        events.select(col(userCol), col(tsCol), col(tieCol)),
        Seq(userCol), tsCol, Seq(tieCol), gapMicros)
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(unix_micros(col(tsCol))).as("s"),
        max(unix_micros(col(tsCol))).as("e"))
    val sweep = sess.select(explode(array(
        struct(col("s").as("t"), lit(1L).as("d")),
        struct(col("e").as("t"), lit(-1L).as("d")))).as("ev"))
      .select(col("ev.t").as("t"), col("ev.d").as("d"))
      .withColumn("day", to_date(timestamp_micros(col("t"))))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dayMax = sweep.withColumn("run", sum(col("d")).over(w))
      .groupBy("day").agg(max(col("run")).as("mx"))
    // sessions still open at a later day's start: one carry unit for
    // every day in (start_day, end_day]
    // guarded: Spark's sequence(a, b) with a > b yields a DESCENDING
    // sequence, not an empty one — same-day sessions must emit nothing
    // (their null array explodes to zero rows)
    val carry = sess
      .select(explode(when(
        to_date(timestamp_micros(col("e"))) >
          to_date(timestamp_micros(col("s"))),
        sequence(date_add(to_date(timestamp_micros(col("s"))), 1),
          to_date(timestamp_micros(col("e")))))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("carry"))
    dayMax.join(carry, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (coalesce(col("carry"), lit(0L)) + col("mx")).as("peak"))
      .orderBy("day")
  }

  /** Bot-cadence audit: entities whose event stream is too fast and
    * too regular to be human — the curation gate run on event data
    * before any engagement analytics (the behavioral sibling of the
    * document-quality gates). Per entity: event count, exact min and
    * interpolated median inter-event gap across its whole timeline
    * (all types; (ts, tie) order), flagged when the entity has at
    * least `minEvents` events AND its median gap is at or under
    * `maxMedianGapS` seconds. One entity-keyed window pass + one
    * aggregate; output is one row per entity with ≥2 events.
    */
  def botCandidates(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, minEvents: Long = 50,
      maxMedianGapS: Double = 60.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val gaps = events
      .select(col(userCol),
        (unix_micros(col(tsCol)) -
          lag(unix_micros(col(tsCol)), 1).over(w)).as("g"))
    gaps.groupBy(col(userCol))
      // one gaps row per EVENT (g null on each entity's first), so the
      // plain row count is the event count; min/percentile skip nulls
      .agg(count(lit(1)).as("n_events"),
        (min(col("g")).cast("double") / lit(1000000.0)).as("min_gap_s"),
        graft.functions.hashSafeRound(
          percentile(col("g").cast("double") / lit(1000000.0), lit(0.5)), 9)
          .as("median_gap_s"))
      .filter(col("min_gap_s").isNotNull)
      .select(col(userCol), col("n_events"), col("min_gap_s"),
        col("median_gap_s"),
        (col("n_events") >= minEvents &&
          col("median_gap_s") <= lit(maxMedianGapS)).as("bot_flag"))
      .orderBy(col(userCol))
  }

  /** Last-touch attribution: for every conversion event, the most
    * recent PRECEDING non-conversion event type in the same entity's
    * timeline is its credited channel; conversions with no touch
    * before them credit `(none)`. One entity-keyed window pass (the
    * running last non-conversion type over the preceding frame — no
    * per-conversion rescan or self-join) and a |types|-row aggregate
    * with conversion shares.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, tieCol: String, typeCol: String,
      convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val channel = last(
      when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
      .over(w)
    val conv = events
      .withColumn("channel", channel)
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"))
    val total = conv.agg(sum(col("n_conversions")).as("n_total"))
    conv.crossJoin(broadcast(total))
      .select(col("channel"), col("n_conversions"),
        (col("n_conversions").cast("double") / col("n_total").cast("double"))
          .as("share"))
      .orderBy("channel")
  }

  /** Usage heatmap: event volume by (ISO weekday, hour-of-day) with
    * each cell's share of the total — the seasonality read under every
    * volume anomaly. Weekday is pinned cross-engine as Monday=0 (Spark
    * `weekday` ≡ DuckDB `isodow - 1`). One keyed aggregate to ≤ 7×24
    * rows; the share divides against a broadcast 1-row total.
    */
  def usageHeatmap(events: DataFrame, tsCol: String): DataFrame = {
    val cells = events
      .groupBy(weekday(col(tsCol)).cast("long").as("dow"),
        hour(col(tsCol)).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
    val total = cells.agg(sum(col("n")).as("n_total"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hod"), col("n"),
        (col("n").cast("double") / col("n_total").cast("double"))
          .as("share"))
      .orderBy("dow", "hod")
  }

  /** RFM segmentation: every entity scored into terciles of Recency
    * (µs since its last event, ascending — 1 is most recent),
    * Frequency (event count, descending), and Monetary (exact DECIMAL
    * value sum, descending — double summation would be
    * order-dependent and break tercile edges across engines), then
    * counted per (r, f, m) cell — the classic ≤27-segment engagement
    * table. Tie order is pinned by (measure, entity), so the tercile
    * CUTS, not just sizes, are engine-identical.
    *
    * Scale note: ntile is a total order over entities; this exact
    * formulation is the audited contract (one entity-keyed aggregate,
    * then windows over one row per entity). At extreme entity counts
    * the same segmentation runs off percentile THRESHOLDS from an
    * aggregate pass — the q110-style exact-contract-vs-scale-path
    * split.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = events.groupBy(col(userCol).as("u"))
      .agg(max(unix_micros(col(tsCol))).as("last_us"),
        count(lit(1)).as("f"),
        sum(col(valueCol).cast("decimal(30,6)")).as("m"))
    val mx = u.agg(max(col("last_us")).as("max_us"))
    val scored = u.crossJoin(broadcast(mx))
      .withColumn("r_us", col("max_us") - col("last_us"))
      .withColumn("r_t",
        ntile(3).over(Window.orderBy(col("r_us").asc, col("u").asc))
          .cast("long"))
      .withColumn("f_t",
        ntile(3).over(Window.orderBy(col("f").desc, col("u").asc))
          .cast("long"))
      .withColumn("m_t",
        ntile(3).over(Window.orderBy(col("m").desc, col("u").asc))
          .cast("long"))
    scored.groupBy("r_t", "f_t", "m_t")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r_t", "f_t", "m_t")
  }

  /** Cohort retention: each entity's cohort is its first activity day;
    * the cell (cohort_day, k) counts entities of that cohort active
    * exactly k days after it. Two keyed aggregates (first-day, then
    * distinct activity days) joined on the entity key and collapsed to
    * the |cohorts| × |offsets| matrix — output is calendar-bounded
    * whatever the event volume. Days are rendered as strings so the
    * result is engine- and dtype-portable.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val day: Column = to_date(col(tsCol))
    val firstDay = events.groupBy(col(userCol))
      .agg(min(day).as("cohort_d"))
    val activeDays = events.select(col(userCol), day.as("d")).distinct()
    activeDays.join(firstDay, userCol)
      .select(col(userCol), col("cohort_d"),
        datediff(col("d"), col("cohort_d")).as("k"))
      .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"),
        col("k"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .orderBy(col("cohort_day"), col("k"))
  }

  /** Session-level event-type co-occurrence with market-basket
    * metrics: for every unordered type pair (a < b), the number of
    * sessions containing BOTH, plus support = n_ab/n_sessions,
    * confidence(a→b) = n_ab/n_a, and lift = n_ab·n / (n_a·n_b).
    * Sessions come from [[Sessionize.assign]] under `gapMicros`.
    *
    * Scale shape: ONE entity-keyed shuffle builds sessions; distinct
    * types per session are bounded by the type vocabulary, and the
    * pair explode happens INSIDE the per-session aggregate (sorted
    * distinct-type array → in-row combination expansion), so no
    * self-join of the session-type table and no second large shuffle —
    * the pair aggregate has ≤ |types|² keys and map-side-combines.
    * The session count rides a broadcast 1-row frame.
    *
    * Arithmetic: lift's numerator/denominator products stay in int64
    * (exact up to 9.2e18 — the documented gate: n_sessions·n_ab and
    * n_a·n_b must stay below that, true for any corpus whose session
    * count fits in 32 bits even with every session containing every
    * pair) and pass through ONE correctly-rounded double division, so
    * the hash gate holds across engines.
    */
  def cooccurrenceLift(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, gapMicros: Long): DataFrame = {
    val sess = Sessionize.assign(
        events.select(col(userCol), col(tsCol), col(tieCol), col(typeCol)),
        Seq(userCol), tsCol, Seq(tieCol), gapMicros)
      .groupBy(col(userCol), col("session_seq"))
      .agg(sort_array(collect_set(col(typeCol))).as("types"))
    // per-session pair expansion: (types[i], types[j]) for i < j —
    // bounded by |vocabulary|² per row, no self-join
    val pairCol = flatten(transform(col("types"), (a, i) =>
      transform(slice(col("types"), i + lit(2), size(col("types"))),
        b => struct(a.as("type_a"), b.as("type_b")))))
    val pairCnt = sess.select(explode(pairCol).as("p"))
      .select(col("p.type_a"), col("p.type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    val typeCnt = sess.select(explode(col("types")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_t"))
    val nSessions = sess.agg(count(lit(1)).as("n_sessions"))
    pairCnt
      .join(broadcast(typeCnt.select(col("t").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(typeCnt.select(col("t").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nSessions))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        graft.functions.hashSafeRound(col("n_ab").cast("double") /
          col("n_sessions").cast("double"), 9).as("support"),
        graft.functions.hashSafeRound(col("n_ab").cast("double") /
          col("n_a").cast("double"), 9).as("confidence"),
        graft.functions.hashSafeRound(
          (col("n_ab") * col("n_sessions")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 9).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** PageRank over the first-order event-type transition graph (the
    * [[transitionMatrix]] edges), run for a FIXED number of power
    * iterations in exact integer fixed point so the result is
    * bit-stable across engines and partitionings — the q121 k-means
    * recipe applied to a graph walk:
    *
    *  - edge weight w(u→v) = ⌊cnt(u→v)·10⁶ / out(u)⌋  (int64);
    *  - pr₀(v) = ⌊S/N⌋ with S = 10¹², N = |types|;
    *  - prₖ₊₁(v) = ⌊S·(100−D)/(100·N)⌋ +
    *               ⌊D·Σᵤ ⌊prₖ(u)·w(u→v)/10⁶⌋ / 100⌋, damping D = 85.
    *
    * Every product stays below 2^63 by construction (pr ≤ 10¹², w ≤
    * 10⁶ after normalization — INDEPENDENT of corpus size, because
    * weights are normalized per source before ever meeting pr), and
    * integer sums commute, so no float enters until the final
    * pr_fixed/10¹² display division. Dangling nodes (no out-edges)
    * simply contribute nothing — their mass leaks, the standard
    * simplified formulation, identically on both engines.
    *
    * Scale shape: the ONLY corpus-sized work is the edge-count
    * aggregate (one keyed shuffle, |types|² output rows); the power
    * iterations then walk a vocabulary-sized table with broadcast
    * joins. N rides the plan as a broadcast 1-row frame — no driver
    * collect.
    *
    * Output: (node, pr_fixed, pr) ordered by (pr_fixed DESC, node).
    */
  def transitionPageRank(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, iters: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct out of range: $dampingPct")
    val S = 1000000000000L // 10^12 pr scale
    val W = 1000000L       // 10^6 edge-weight scale
    import graft.functions.intDiv
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val edgeCnt = events
      .select(col(typeCol).as("src"), lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val outTot = edgeCnt.groupBy("src").agg(sum(col("cnt")).as("out"))
    val edges = edgeCnt.join(outTot, "src")
      .select(col("src"), col("dst"),
        intDiv(col("cnt") * lit(W), col("out")).as("w"))
    val nodes = events.select(col(typeCol).as("node")).distinct()
    val nRider = nodes.agg(count(lit(1)).as("__n"))
    val base = intDiv(lit(S * (100L - dampingPct)), lit(100L) * col("__n"))
    var pr = nodes.crossJoin(broadcast(nRider))
      .select(col("node"), intDiv(lit(S), col("__n")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst").as("node"),
          intDiv(col("pr") * col("w"), lit(W)).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nRider))
        .select(col("node"),
          (base + intDiv(lit(dampingPct.toLong) *
            coalesce(col("in_mass"), lit(0L)), lit(100L))).as("pr"))
    }
    pr.select(col("node"), col("pr").as("pr_fixed"),
        graft.functions.hashSafeRound(
          col("pr").cast("double") / lit(1.0e12), 9).as("pr"))
      .orderBy(col("pr_fixed").desc, col("node"))
  }

  /** CUSUM changepoint scan over the per-type daily volume series —
    * the "when did this stream's level shift" audit next to
    * [[volumeAnomaly]]'s local spike z-scores: a spike moves one day's
    * z, a level shift moves EVERY cumulative sum after the break, and
    * the day maximizing |Σ_{d'≤d}(n_d' − mean)| is the classic CUSUM
    * changepoint estimate. Kept exact end to end by scaling through
    * the day count: drift_t = n_days·prefix_t − t·total is int64 (the
    * n_days-scaled CUSUM), so the argmax and its tie rule (earliest
    * day on equal |drift|) are engine-exact; the one double division
    * (drift/n_days, the unscaled CUSUM value) happens after selection.
    *
    * Scale: the daily pre-aggregate is the only full-data shuffle
    * (map-side combined on (type, day)); the windows run over
    * |types|×|days| rows. A 100 TB event table with years of history is
    * still ≤ thousands of rows per type after the pre-agg.
    */
  def cusumChangepoint(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.partitionBy("event_type").orderBy("d")
    val wAll = Window.partitionBy("event_type")
    val drift = daily
      .withColumn("t", row_number().over(wOrd))
      .withColumn("prefix", sum(col("n")).over(wOrd))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("drift",
        col("n_days") * col("prefix") - col("t") * col("total"))
    val wPick = Window.partitionBy("event_type")
      .orderBy(abs(col("drift")).desc, col("d"))
    drift.withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_days"),
        col("total").as("total_events"),
        date_format(col("d"), "yyyy-MM-dd").as("cp_day"),
        col("t").as("cp_index"),
        col("drift").as("cp_drift_scaled"),
        (col("drift").cast("double") / col("n_days").cast("double"))
          .as("cp_drift"))
      .orderBy("event_type")
  }

  /** Rolling Pearson correlation between a type's daily event volume
    * and its daily value total — the "does traffic move with spend"
    * drift audit, windowed so a regime change shows up as the day the
    * correlation breaks. Exactness protocol: daily value totals are
    * floor-quantized to int64 `quantUnit`ths BEFORE summing (the int64
    * gate — double sums would be order-dependent, decimal→double casts
    * engine-dependent), so every window sum and variance numerator is
    * exact integer arithmetic; the ONE double chain is the final
    * num/sqrt(var_c·var_v), and int64→double conversion is
    * round-to-nearest-even in both engines. Windows with fewer than
    * `windowDays` observed days or a zero variance are dropped (no
    * NaN/null divergence). Headroom: first-order window sums (sc, sv)
    * stay int64 (bounded by total daily mass); every SECOND-order
    * moment (scc, svv, scv) and the n·Σ − Σ² variance products run in
    * DECIMAL(38,0), so no quantUnit coarsening is needed until the
    * squared window mass approaches 10³⁸.
    *
    * Scale: the daily pre-aggregate (map-side combined) is the only
    * full-data shuffle; the rolling windows run over |types|×|days|
    * rows.
    */
  def rollingCorrelation(events: DataFrame, tsCol: String,
      typeCol: String, valueCol: String, windowDays: Int = 7,
      quantUnit: Long = 1000L): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2: $windowDays")
    require(quantUnit >= 1, s"quantUnit must be >= 1: $quantUnit")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("c"),
        sum(floor(col(valueCol) * lit(quantUnit))).as("vq"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(-(windowDays - 1), 0)
    // Second-order moments in DECIMAL(38,0) (the transitionImpurity /
    // dailyAutocorrelation discipline): c·c wraps int64 at daily
    // volumes ~3e9 and vq·vq far earlier at fine quantUnit — the
    // decimal path keeps the moments exact at any scale.
    daily.select(col("event_type"), col("d"),
        count(lit(1)).over(w).as("nw"),
        sum(col("c")).over(w).as("sc"),
        sum(col("c").cast("decimal(38,0)") * col("c")).over(w).as("scc"),
        sum(col("vq")).over(w).as("sv"),
        sum(col("vq").cast("decimal(38,0)") * col("vq")).over(w).as("svv"),
        sum(col("c").cast("decimal(38,0)") * col("vq")).over(w).as("scv"))
      .filter(col("nw") === windowDays)
      .withColumn("var_c", col("nw").cast("decimal(38,0)") * col("scc") -
        col("sc").cast("decimal(38,0)") * col("sc"))
      .withColumn("var_v", col("nw").cast("decimal(38,0)") * col("svv") -
        col("sv").cast("decimal(38,0)") * col("sv"))
      .filter(col("var_c") > 0 && col("var_v") > 0)
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        ((col("nw").cast("decimal(38,0)") * col("scv") -
          col("sc").cast("decimal(38,0)") * col("sv")).cast("double") /
          sqrt(col("var_c").cast("double") * col("var_v").cast("double")))
          .as("vol_value_r"))
      .orderBy("event_type", "day")
  }

  /** Frequent contiguous event-type trigrams across entity timelines —
    * the sequence-mining companion to [[transitionMatrix]]'s bigrams:
    * support both as raw occurrences and as distinct entities, so a
    * single looping bot can't promote its private pattern. One
    * entity-keyed window pass (deterministic (ts, tie) order) emits
    * each 3-window via two `lead`s — no self-join per position — then
    * one bounded-key aggregate (≤|types|³ groups). Exact int64
    * counts; `minSupport` prunes the tail before the ordered output.
    */
  def eventTrigrams(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, minSupport: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol).as("u"), col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(w).as("e2"),
        lead(col(typeCol), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("u")).as("n_users"))
      .filter(col("n_occurrences") >= minSupport)
      .orderBy(col("n_occurrences").desc, col("e1"), col("e2"),
        col("e3"))
  }

  /** Power-user curve: the distribution of per-entity engagement depth
    * — how many entities were active on exactly `k` distinct calendar
    * days, plus the from-the-top cumulative (`n_users_at_least`: how
    * many were active on ≥ k days), the curve a "power user" threshold
    * is read off. All counts exact int64.
    *
    * Scale: the (entity, day) distinct projection and the per-entity
    * day count are each ONE entity-keyed shuffle; the histogram and
    * its cumulative run over ≤ |calendar days| rows.
    */
  def powerUserCurve(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
      .groupBy("u").agg(count(lit(1)).as("n_active_days"))
    val hist = perUser.groupBy("n_active_days")
      .agg(count(lit(1)).as("n_users"))
    // tiny table (≤ |days| rows): the single-partition cumulative
    // window is deliberate, not a scale hazard
    val wCum = Window.orderBy(col("n_active_days").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("n_users_at_least", sum(col("n_users")).over(wCum))
      .orderBy("n_active_days")
  }

  /** Lag-k autocorrelation of the daily event-volume series per event
    * type, k = 1..`maxLag` — the seasonality/persistence audit (a
    * weekly cycle shows up as a lag-7 peak). Pairs are calendar-exact:
    * (day d, day d−k) contributes only when BOTH days were observed
    * (no zero-fill, no engine-dependent date densification). Daily
    * counts are int64; every second-order moment (Σx², Σxy, and the
    * n·Σx² − (Σx)² variance products) is accumulated in DECIMAL(38,0)
    * — the [[transitionImpurity]] discipline against 100-TB counts: a
    * daily volume of ~5e7 over a decade gives Σx² ≈ 9e18, past int64 —
    * so the moments stay exact at any scale. The ONE double chain per
    * (type, lag) is the final Pearson over those exact decimals — sqrt
    * output, so [[graft.functions.hashSafeRound]] at 9. Windows with
    * < 2 pairs or zero variance are dropped.
    *
    * Scale: the daily pre-aggregate (map-side combined) is the only
    * full-data shuffle; the lag fan-out explodes |types|×|days| rows
    * `maxLag` ways and equi-joins back on (type, day) — no self-join
    * of the raw event table.
    */
  def dailyAutocorrelation(events: DataFrame, tsCol: String,
      typeCol: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("c"))
    val cur = daily
      .select(col("event_type"), col("d"), col("c").as("x"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .withColumn("dp", expr("date_sub(d, lag)"))
    val prev = daily.select(col("event_type"), col("d").as("dp"),
      col("c").as("y"))
    cur.join(prev, Seq("event_type", "dp"))
      .groupBy(col("event_type"), col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
      .withColumn("var_x",
        col("n_pairs").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sx"))
      .withColumn("var_y",
        col("n_pairs").cast("decimal(38,0)") * col("syy") -
          col("sy").cast("decimal(38,0)") * col("sy"))
      .filter(col("n_pairs") >= 2 && col("var_x") > 0 && col("var_y") > 0)
      .select(col("event_type"), col("lag"), col("n_pairs"),
        graft.functions.hashSafeRound(
          (col("n_pairs").cast("decimal(38,0)") * col("sxy") -
            col("sx").cast("decimal(38,0)") * col("sy"))
            .cast("double") /
            sqrt(col("var_x").cast("double") * col("var_y").cast("double")),
          9).as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Per-step funnel latency: for each adjacent step pair of the
    * greedy-earliest funnel ([[funnel]]'s exact semantics — this runs
    * ON its output), the converting-entity count and the min / max /
    * mean step-to-step gap. Gaps are exact int64 microseconds
    * (timestamp subtraction); the ONE double per row is the mean
    * (Σgap/n — int64→double then one IEEE divide, engine-exact).
    *
    * Scale: inherits [[funnel]]'s single entity-keyed shuffle; the
    * latency fold explodes ≤ |steps|−1 rows per entity and aggregates
    * into |steps|−1 output rows.
    */
  def funnelStepLatency(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "funnelStepLatency needs at least two steps")
    val f = funnel(events, userCol, tsCol, typeCol, steps)
    val gaps = steps.indices.dropRight(1).map { i =>
      struct(lit(i + 1).as("step_seq"),
        lit(steps(i)).as("step_from"), lit(steps(i + 1)).as("step_to"),
        (unix_micros(col(s"t${i + 2}")) - unix_micros(col(s"t${i + 1}")))
          .as("gap_us"))
    }
    f.select(explode(array(gaps: _*)).as("g"))
      .select(col("g.step_seq").as("step_seq"),
        col("g.step_from").as("step_from"),
        col("g.step_to").as("step_to"), col("g.gap_us").as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy("step_seq", "step_from", "step_to")
      .agg(count(lit(1)).as("n_converted"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        (sum(col("gap_us")).cast("double") /
          count(lit(1)).cast("double")).as("mean_gap_us"))
      .orderBy("step_seq")
  }

  /** Next-state concentration of the [[transitionMatrix]] rows, as
    * Gini impurity per source state: 1 − Σp² = (N² − Σn²)/N² — "after
    * X, is the next step predictable or uniform". Impurity is chosen
    * over Shannon entropy DELIBERATELY: entropy sums per-cell ln terms
    * in engine-dependent double order (the q168 chi² lesson), while
    * the impurity numerator and denominator are EXACT integer moments
    * (DECIMAL(38,0) against 100-TB counts) with ONE IEEE divide at
    * |types| rows. Terminal events (never followed) are absent.
    *
    * Scale: one entity-keyed window pass for the bigram counts, one
    * |types|²-row aggregate above it.
    */
  def transitionImpurity(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(typeCol).as("et"), lead(col(typeCol), 1).over(w).as("net"))
      .filter(col("net").isNotNull)
      .groupBy("et", "net").agg(count(lit(1)).as("n"))
      .groupBy(col("et").as("event_type"))
      .agg(sum(col("n")).as("n_transitions"),
        count(lit(1)).as("n_next_states"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("__ssq"))
      .select(col("event_type"), col("n_transitions"),
        col("n_next_states"),
        ((col("n_transitions").cast("decimal(38,0)") *
            col("n_transitions") - col("__ssq")).cast("double") /
          (col("n_transitions").cast("decimal(38,0)") *
            col("n_transitions")).cast("double")).as("gini_impurity"))
      .orderBy("event_type")
  }

  /** Session entry→exit matrix: sessionize on `gapMicros` inactivity
    * (the established (ts, tie) ordering), then count sessions per
    * (first event type, last event type) cell, with the single-event
    * diagonal broken out (`n_single_event`) — the landing/bounce table.
    * All counts exact.
    *
    * Scale: one entity-keyed window pass to open sessions (spillable
    * WindowExec state), one (entity, session) aggregate; output is
    * ≤ |types|² rows.
    */
  def sessionEntryExit(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, gapMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val sessioned = events
      .withColumn("__opens",
        when(lag(col(tsCol), 1).over(wOrd).isNull ||
          unix_micros(col(tsCol)) -
            unix_micros(lag(col(tsCol), 1).over(wOrd)) > gapMicros,
          lit(1)).otherwise(lit(0)))
      .withColumn("__sid", sum(col("__opens")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    sessioned
      .groupBy(col(userCol), col("__sid"))
      .agg(min_by(col(typeCol), struct(col(tsCol), col(tieCol)))
          .as("entry_type"),
        max_by(col(typeCol), struct(col(tsCol), col(tieCol)))
          .as("exit_type"),
        count(lit(1)).as("__n"))
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__n") === 1, 1L).otherwise(0L))
          .as("n_single_event"))
      .orderBy("entry_type", "exit_type")
  }
}
