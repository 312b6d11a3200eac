package graft

import java.sql.Timestamp

import graft.operators.Profile

/** Single-pass table profiler: per-column nulls, exact distincts, and
  * typed min/max.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profileTable: nulls, exact distincts, typed min/max per column family") {
    val df = Seq(
      (1L, Some("b"), Some(2.5), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
      (2L, Some("a"), None, Some(Timestamp.valueOf("2024-06-01 00:00:00"))),
      (2L, None, Some(-1.25), None))
      .toDF("k", "s", "x", "t")
    val rows = Profile.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap

    rows.keySet shouldBe Set("k", "s", "x", "t")
    // every row carries the table row count
    rows.values.foreach(_.getAs[Long]("n_rows") shouldBe 3L)

    val k = rows("k")
    k.getAs[String]("dtype") shouldBe "bigint"
    k.getAs[Long]("n_null") shouldBe 0L
    k.getAs[Long]("n_distinct") shouldBe 2L
    k.getAs[Double]("min_num") shouldBe 1.0
    k.getAs[Double]("max_num") shouldBe 2.0
    assert(k.isNullAt(k.fieldIndex("min_str")))

    val s = rows("s")
    s.getAs[String]("dtype") shouldBe "string"
    s.getAs[Long]("n_null") shouldBe 1L
    s.getAs[Long]("n_distinct") shouldBe 2L // nulls excluded
    s.getAs[String]("min_str") shouldBe "a"
    s.getAs[String]("max_str") shouldBe "b"
    assert(s.isNullAt(s.fieldIndex("min_num")))

    val x = rows("x")
    x.getAs[Long]("n_null") shouldBe 1L
    x.getAs[Double]("min_num") shouldBe -1.25
    x.getAs[Double]("max_num") shouldBe 2.5

    val t = rows("t")
    t.getAs[Long]("n_null") shouldBe 1L
    t.getAs[String]("min_str") shouldBe "2024-01-02 03:04:05"
    t.getAs[String]("max_str") shouldBe "2024-06-01 00:00:00"
  }

  test("profileTable: opaque columns (arrays) profile counts only") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f)))
      .toDF("id", "vec")
    val vec = Profile.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap.apply("vec")
    vec.getAs[Long]("n_null") shouldBe 0L
    vec.getAs[Long]("n_distinct") shouldBe 2L
    assert(vec.isNullAt(vec.fieldIndex("min_num")) &&
      vec.isNullAt(vec.fieldIndex("min_str")))
  }
}
