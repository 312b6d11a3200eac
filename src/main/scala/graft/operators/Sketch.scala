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
}
