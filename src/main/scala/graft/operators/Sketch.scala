package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column, built as RELATIONAL operators —
  * the formulation that actually scales: the counter table is one
  * map-side-combinable `groupBy (row, bucket)` aggregation producing
  * depth × width rows (a few KB — broadcastable), never a driver-side
  * structure, and estimates are a keyed join against it. The classic
  * use: heavy-hitter token/domain screening over a corpus too large to
  * count exactly per key — the sketch pass shuffles depth×width
  * counters where an exact count shuffles every distinct key.
  *
  * The bucket hash is the first 8 hex chars of md5(row || '#' || key)
  * mod width — the separator keeps the depth rows independent (without
  * it, row 1 + key "0abc" and row 10 + key "abc" share a hash input),
  * and md5 (not xxhash64) is deliberate so ANY engine can rebuild the
  * identical sketch: estimates are deterministic functions of the
  * data, independent of partitioning or merge order (counter sums
  * commute), which makes even this approximate structure hash-gatable
  * against a DuckDB twin (q52).
  *
  * Standard CMS guarantees hold per row: estimate ≥ true count
  * (counters only ever add; an uncounted key estimates 0 via empty
  * buckets), and with width ≫ distinct keys the estimate is exact.
  */
object Sketch {

  /** Bucket of `key` in sketch row `i`: first 8 hex chars of
    * md5(i || '#' || key) as an integer, mod `width`. DuckDB twin:
    * `CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '#' || key), 1, 8))
    * AS BIGINT) % width` — hex-prefix-to-int is order-preserving in
    * both engines.
    */
  def bucket(i: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(i.cast("string"), lit("#"), key)), 1, 8),
      16, 10).cast("long"), lit(width.toLong)).cast("int")

  def bucket(i: Int, key: Column, width: Int): Column =
    bucket(lit(i), key, width)

  /** Build the depth × width counter table from per-key counts:
    * (row, bucket, counter). `keyed` must be (key, cnt) — pre-counted
    * so the sketch build shuffles distinct keys once, not every
    * occurrence. ONE scan of the input: the row index is generated
    * per key with `explode(sequence(...))`, so an unpersisted upstream
    * aggregate is not recomputed once per sketch row.
    */
  def cmsCounters(keyed: DataFrame, keyCol: String, cntCol: String,
                  depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch dims: $depth x $width")
    keyed.select(
        explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col(keyCol).as("__k"), col(cntCol).as("cnt"))
      .select(col("row"), bucket(col("row"), col("__k"), width).as("bucket"),
        col("cnt"))
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("counter"))
  }

  /** Point-estimate counts for the keys in `queries`: min over the
    * sketch rows of the counter each key hashes into. LEFT joins — a
    * key whose bucket holds no counter estimates 0 (the screening use
    * queries keys that may be absent from the corpus; an inner join
    * would silently drop them). One broadcastable join per sketch row.
    */
  def cmsEstimate(queries: DataFrame, keyCol: String,
                  counters: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch dims: $depth x $width")
    val scratch = (0 until depth).flatMap(i => Seq(s"__b$i", s"__c$i")) :+ "cms_est"
    val clash = queries.columns.toSet.intersect(scratch.toSet)
    require(clash.isEmpty,
      s"cmsEstimate writes ${scratch.take(4).mkString(", ")}...cms_est; " +
        s"input already has ${clash.mkString(", ")}")
    val withBuckets = (0 until depth).foldLeft(queries) { (df, i) =>
      df.withColumn(s"__b$i", bucket(i, col(keyCol), width))
    }
    val joined = (0 until depth).foldLeft(withBuckets) { (df, i) =>
      df.join(
        counters.filter(col("row") === i)
          .select(col("bucket").as(s"__b$i"), col("counter").as(s"__c$i")),
        Seq(s"__b$i"), "left")
    }
    val est = least((0 until depth).map(i => coalesce(col(s"__c$i"), lit(0L))): _*)
    joined.withColumn("cms_est", est)
      .drop((0 until depth).flatMap(i => Seq(s"__b$i", s"__c$i")): _*)
  }

  // -------------------------------------------------- HyperLogLog

  /** HyperLogLog register table over a key column, as RELATIONAL
    * operators — the CMS sibling for DISTINCT counting: one map-side-
    * combinable `groupBy bucket → max(rho)` producing 2^p rows (bytes —
    * mergeable across shards by the same max), never a driver-side
    * structure. The classic use: approximate vocabulary / distinct-id
    * counts over a corpus where exact distinct shuffles every key.
    *
    * Engine-reproducible by the same md5 construction as [[bucket]]:
    * a 60-bit hash from the first 15 md5 hex chars (15, not 16 — the
    * 16-char value can exceed Long.MaxValue and overflow the
    * hex-to-int cast differently per engine). bucket = h mod 2^p; the
    * remaining w = h div 2^p has 60−p usable bits and rho (the
    * 1-based position of the leftmost set bit) = (60−p) − floor(log₂ w)
    * … computed EXACTLY as string length: floor(log₂ w) =
    * length(bin(w)) − 1 in both Spark and DuckDB (no leading zeros,
    * "0" for 0), no floating log anywhere. w = 0 (all 60−p bits zero)
    * gets the conventional max rho, 60−p+1.
    */
  def hllRegisters(keys: DataFrame, keyCol: String, p: Int): DataFrame =
    hllRegistersBy(keys, keyCol, Nil, p)

  /** [[hllRegisters]] per group: one register table per distinct
    * `groupCols` value in the SAME single aggregate pass — per-source
    * / per-shard / per-day distinct sketches for the cost of one
    * groupBy, each independently mergeable by elementwise max (sketch
    * set-algebra: the union's registers are the pairwise max, so
    * overlap estimates fall out by inclusion–exclusion with no second
    * corpus pass).
    */
  def hllRegistersBy(keys: DataFrame, keyCol: String,
                     groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val m = 1L << p
    // nulls are excluded, matching COUNT(DISTINCT) — md5(null) would
    // otherwise emit a null-bucket register that hllEstimate counts in
    // n_buckets_set while contributing nothing to the harmonic sum
    val nonNull = keys.filter(col(keyCol).isNotNull)
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(h),
        org.apache.spark.sql.catalyst.expressions.Literal(m)))
    val rho = when(w === 0L, lit(60 - p + 1))
      .otherwise(lit(60 - p) - (length(bin(w)) - 1))
    nonNull.select(groupCols.map(col) :+
        pmod(h, lit(m)).cast("int").as("bucket") :+ rho.as("__rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__rho")).cast("int").as("max_rho"))
  }

  /** Distinct-count estimate from an HLL register table: the standard
    * alpha_m · m² / Σ 2^(−rho_j) harmonic mean (absent buckets count
    * rho = 0), with the small-range linear-counting correction
    * (m · ln(m/V) when zero-valued registers exist and the raw
    * estimate is below 2.5m).
    *
    * Determinism across engines: the harmonic sum is computed in LONG
    * arithmetic — Σ 2^(cap − rho) with cap = 61−p, every term an exact
    * power of two and the sum ≤ m·2^cap < 2^63 — so no float-sum
    * ordering exists to diverge; the final alpha division is one IEEE
    * expression and ln goes through the round-to-9 idiom (q27).
    * Returns one row: (n_buckets_set, harmonic_sum_scaled, estimate).
    */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame =
    hllEstimateBy(registers, Nil, p)

  /** [[hllEstimate]] per group: one estimate row per distinct
    * `groupCols` value of a [[hllRegistersBy]] table (or any merged
    * register table carrying those columns).
    */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String],
                    p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val m = 1L << p
    val cap = 61 - p // max_rho ≤ 61-p ⇒ shift ∈ [0, cap-1] for set buckets
    // shiftleft's Scala binding takes only a literal bit count — the
    // SQL form shifts by a column
    val aggExprs = Seq(
      // coalesce: an EMPTY register table (zero distinct keys) must
      // flow through as sum 0, not null — the correction branch then
      // yields the correct m*ln(m/m) = 0 estimate
      coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $cap - max_rho)")),
        lit(0L)).as("__set_sum"))
    val agg =
      if (groupCols.isEmpty)
        registers.agg(count(lit(1)).as("n_buckets_set"), aggExprs.head)
      else registers.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("n_buckets_set"), aggExprs.head)
    // absent buckets are rho=0 registers: each contributes 2^cap
    val sumScaled = col("__set_sum") +
      (lit(m) - col("n_buckets_set")) * lit(1L << cap)
    // the standard small-m alpha constants; the 0.7213/(1+1.079/m)
    // closed form is the m >= 128 asymptote only
    val alpha = m match {
      case 16L => lit(0.673)
      case 32L => lit(0.697)
      case 64L => lit(0.709)
      case _ => lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    }
    val alphaM2 = alpha * lit(m.toDouble) * lit(m.toDouble)
    val raw = alphaM2 * lit(math.pow(2.0, cap).toDouble) /
      col("__harm").cast("double")
    val zeros = lit(m) - col("n_buckets_set")
    val corrected = when(zeros > 0L && raw < lit(2.5 * m),
        round(lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")), 9))
      .otherwise(round(raw, 9)) + lit(0.0)
    agg.withColumn("__harm", sumScaled)
      .withColumn("estimate", corrected)
      .select(groupCols.map(col) :+ col("n_buckets_set") :+
        col("__harm").as("harmonic_sum_scaled") :+ col("estimate"): _*)
  }

  // ------------------------------------------- exact heavy hitters

  /** EXACT heavy hitters — every item whose count strictly exceeds
    * n/k — via the classic two-pass candidates-then-recount scheme:
    *
    *  1. one Misra–Gries summary pass ([[graft.functions.misraGries]],
    *     `summaryCapacity >= k` counters) whose mergeable undercount
    *     bound guarantees the candidate array is a SUPERSET of the
    *     true heavy hitters;
    *  2. one recount pass that groups the column into (candidate item
    *     | residual-null) buckets — at most `summaryCapacity + 1`
    *     groups, so map-side partial aggregation collapses each
    *     partition to a handful of rows — and keeps candidates with
    *     exact `cnt * k > n` (integer compare; no float threshold).
    *
    * The output is therefore EXACT and independent of Misra–Gries tie
    * behavior/partitioning: false candidates fail the exact recount
    * filter, and no true heavy hitter can be missing from the summary.
    * Scale: neither pass shuffles the item domain — pass 1 moves
    * fixed-size summaries, pass 2 moves ≤ capacity+1 partial rows per
    * partition, where the naive `groupBy(item)` shuffles every
    * distinct key of a 100 TB column. The candidate array rides a
    * broadcast 1-row cross join (no driver collect).
    *
    * Output: (item, cnt, share) sorted by (cnt DESC, item ASC), with
    * share = round(cnt/n, 9).
    */
  def heavyHittersExact(items: DataFrame, itemCol: String, k: Int,
      summaryCapacity: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val cap = summaryCapacity.getOrElse(k)
    require(cap >= k,
      s"summaryCapacity $cap < k $k would void the superset guarantee")
    val src = items.select(col(itemCol).as("__w"))
      .where(col("__w").isNotNull)
    val cands = src
      .agg(graft.functions.misraGries(col("__w"), cap).as("mg"))
      .select(transform(col("mg"), e => e.getField("item")).as("__cands"))
    val counted = src
      .crossJoin(broadcast(cands))
      .groupBy(when(array_contains(col("__cands"), col("__w")), col("__w"))
        .as("item"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy() // ≤ capacity+1 rows total: a safe global frame
    counted.withColumn("__n", sum(col("cnt")).over(w))
      .filter(col("item").isNotNull && col("cnt") * lit(k.toLong) > col("__n"))
      .select(col("item"), col("cnt"),
        round(col("cnt").cast("double") / col("__n").cast("double"), 9)
          .as("share"))
      .orderBy(col("cnt").desc, col("item").asc)
  }
}
