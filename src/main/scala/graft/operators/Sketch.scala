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
  * The bucket hash is the first 8 hex chars of md5(row_index || key)
  * mod width — deliberately md5 (not xxhash64) so ANY engine can
  * rebuild the identical sketch: estimates are deterministic functions
  * of the data, independent of partitioning or merge order (counter
  * sums commute), which makes even this approximate structure
  * hash-gatable against a DuckDB twin (q52).
  *
  * Standard CMS guarantees hold per row: estimate ≥ true count
  * (counters only ever add), and with width ≫ distinct keys the
  * estimate is exact.
  */
object Sketch {

  /** Bucket of `key` in sketch row `i`: first 8 hex chars of
    * md5(i || key) as an integer, mod `width`. DuckDB twin:
    * `CAST(('0x' || substr(md5(i || key), 1, 8)) AS BIGINT) % width`
    * — hex-prefix-to-int is order-preserving in both engines.
    */
  def bucket(i: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(i.toString), key)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong)).cast("int")

  /** Build the depth × width counter table from per-key counts:
    * (row, bucket, counter). `keyed` must be (key, cnt) — pre-counted
    * so the sketch build shuffles distinct keys once, not every
    * occurrence.
    */
  def cmsCounters(keyed: DataFrame, keyCol: String, cntCol: String,
                  depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch dims: $depth x $width")
    (0 until depth).map { i =>
      keyed.select(lit(i).as("row"),
        bucket(i, col(keyCol), width).as("bucket"),
        col(cntCol).as("cnt"))
    }.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("counter"))
  }

  /** Point-estimate counts for the keys in `queries`: min over the
    * sketch rows of the counter each key hashes into. One broadcastable
    * join per sketch row.
    */
  def cmsEstimate(queries: DataFrame, keyCol: String,
                  counters: DataFrame, depth: Int, width: Int): DataFrame = {
    val withBuckets = (0 until depth).foldLeft(queries) { (df, i) =>
      df.withColumn(s"__b$i", bucket(i, col(keyCol), width))
    }
    val joined = (0 until depth).foldLeft(withBuckets) { (df, i) =>
      df.join(
        counters.filter(col("row") === i)
          .select(col("bucket").as(s"__b$i"), col("counter").as(s"__c$i")),
        Seq(s"__b$i"))
    }
    val est = least((0 until depth).map(i => col(s"__c$i")): _*)
    joined.withColumn("cms_est", est)
      .drop((0 until depth).flatMap(i => Seq(s"__b$i", s"__c$i")): _*)
  }
}
