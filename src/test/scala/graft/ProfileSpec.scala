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

  test("populationStability: bucket grid, null terms for one-sided cells, exact PSI term") {
    def ts(s: String) = Timestamp.valueOf(s)
    // window 00:00..02:00 -> midpoint 01:00; side a holds {0, 0, 5},
    // side b {0, 9, 10}; vmin 0, vmax 10 -> width 1, v=10 caps into 9
    val df = Seq(
      (0.0, ts("2024-01-01 00:00:00")), (0.0, ts("2024-01-01 00:10:00")),
      (5.0, ts("2024-01-01 00:20:00")),
      (0.0, ts("2024-01-01 01:30:00")), (9.0, ts("2024-01-01 01:40:00")),
      (10.0, ts("2024-01-01 02:00:00")))
      .toDF("value", "ts")
    val rows = Profile.populationStability(df, "value", "ts")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    rows.size shouldBe 10                       // full grid, empty cells too
    val expect0 = BigDecimal((2.0 / 3 - 1.0 / 3) *
        math.log((2.0 / 3) / (1.0 / 3)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows(0L) shouldBe ((2L, 1L, Some(expect0))) // shared cell: real term
    rows(5L) shouldBe ((1L, 0L, None))          // a-only cell: null term
    rows(9L) shouldBe ((0L, 2L, None))          // b-only (9 and capped 10)
    rows(1L) shouldBe ((0L, 0L, None))          // empty cell survives
  }

  test("binnedQuantiles: first-bin-reaching-pct bracket, per group") {
    val df = ((0L to 9L).map(("a", _)) :+ (("b", 7L))).toDF("g", "v")
    val q = Profile.binnedQuantiles(df, "g", "v", binWidth = 2L,
        pcts = Seq(50, 90, 99))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // group a: bins 0..4 each hold 2 of 10 rows; p50 is the first bin
    // whose cum*100 >= 50*10 (bin 2 -> [4,5]), p90/p99 land in bin 4
    q(("a", 50)) shouldBe ((2L, 4L, 5L))
    q(("a", 90)) shouldBe ((4L, 8L, 9L))
    q(("a", 99)) shouldBe ((4L, 8L, 9L))
    // a single-row group answers every percentile from its own bin
    Seq(50, 90, 99).foreach(p => q(("b", p)) shouldBe ((3L, 6L, 7L)))
  }

  test("keySkew: top-k heavy keys, shares, skew factor, tie order") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") :+ "c")
      .map(Tuple1(_)).toDF("k")
    val rows = Profile.keySkew(df, "k", topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // mean rows/key = 10/3; skew = n * n_keys / n_rows
    rows.toSeq shouldBe Seq(
      (1L, "a", 6L, 0.6, 6.0 * 3.0 / 10.0),
      (2L, "b", 3L, 0.3, 3.0 * 3.0 / 10.0))
    // count ties break by key ascending
    val tied = Seq("d", "e", "d", "e").map(Tuple1(_)).toDF("k")
    Profile.keySkew(tied, "k", topK = 1).collect().head.getString(1) shouldBe "d"
  }

  test("populationStability: constant column collapses to bucket 0 with zero drift") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (7.0, ts("2024-01-01 00:00:00")), (7.0, ts("2024-01-01 02:00:00")))
      .toDF("value", "ts")
    val r = Profile.populationStability(df, "value", "ts", buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    r.head shouldBe ((0L, 1L, 1L, Some(0.0)))   // width 0 -> all in cell 0
    r.drop(1).forall(t => t._2 == 0L && t._3 == 0L) shouldBe true
  }

  test("referentialAudit: planted nulls and orphans counted per edge; clean edge reports zeros") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(
      Some(1L), Some(1L), Some(2L),          // valid
      None, None,                            // null FKs
      Some(9L), Some(9L), Some(7L)           // orphans: keys {9, 7}
    ).toDF("fk")
    val clean = Seq(Some(3L), Some(2L)).toDF("fk")
    val got = Profile.referentialAudit(Seq(
        ("bad->parent", child, "fk", parent, "pk"),
        ("clean->parent", clean, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    got(0) shouldBe (("bad->parent", 8L, 2L, 3L, 2L))
    got(1) shouldBe (("clean->parent", 2L, 0L, 0L, 0L))
  }

  test("referentialAudit: duplicate parent keys don't double-count children; empty edge list rejected") {
    val parent = Seq(1L, 1L, 1L).toDF("pk") // dup PKs: distinct first
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val r = Profile.referentialAudit(Seq(("e", child, "fk", parent, "pk")))
      .collect().head
    r.getLong(1) shouldBe 3L  // n_child unchanged by parent dups
    r.getLong(3) shouldBe 1L  // one orphan row (fk=2)
    an[IllegalArgumentException] should be thrownBy
      Profile.referentialAudit(Seq.empty)
  }

  test("contingencyChi2: full label cross incl. zero cells, margins, expected, terms") {
    // 2×2 design with one EMPTY cell: (a1,b2) never observed.
    // obs: (a1,b1)=3, (a2,b1)=1, (a2,b2)=2 → total 6
    val df = (Seq.fill(3)(("a1", "b1")) ++ Seq(("a2", "b1")) ++
      Seq.fill(2)(("a2", "b2"))).toDF("lab", "src")
    val got = Profile.contingencyChi2(df, "lab", "src").collect()
    got.length shouldBe 4 // 2 labels × 2 sources, zero cell included
    val byCell = got.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val z = byCell(("a1", "b2"))
    z.getAs[Long]("obs") shouldBe 0L
    z.getAs[Long]("row_margin") shouldBe 3L
    z.getAs[Long]("col_margin") shouldBe 2L
    z.getAs[Double]("expected") shouldBe 1.0 // 3*2/6
    z.getAs[Double]("chi2_term") shouldBe 1.0 // (0-1)²/1
    val c = byCell(("a1", "b1"))
    c.getAs[Long]("obs") shouldBe 3L
    c.getAs[Double]("expected") shouldBe 2.0 // 3*4/6
    c.getAs[Double]("chi2_term") shouldBe 0.5 // (3-2)²/2
    // ordered by (lab, src)
    got.map(r => (r.getString(0), r.getString(1))) shouldBe
      got.map(r => (r.getString(0), r.getString(1))).sorted
  }

  test("correlationMatrix: exact ±1 on linear columns, 0 on orthogonal, n and pair set") {
    val df = Seq(
      (1.0, 2.0, -1.0, 1.0),
      (2.0, 4.0, -2.0, -1.0),
      (3.0, 6.0, -3.0, 1.0),
      (4.0, 8.0, -4.0, -1.0))
      .toDF("a", "b", "c", "d")
    val got = Profile.correlationMatrix(df, Seq("a", "b", "c", "d"))
      .collect()
    got.length shouldBe 6
    val m = got.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("pearson_r")).toMap
    got.foreach(_.getAs[Long]("n") shouldBe 4L)
    m(("a", "b")) shouldBe 1.0 +- 1e-12   // b = 2a
    m(("a", "c")) shouldBe -1.0 +- 1e-12  // c = -a
    m(("b", "c")) shouldBe -1.0 +- 1e-12
    // hand-checked: n=4 Σa=10 Σd=0 Σad=-2 Σa²=30 Σd²=4 →
    // (4·-2 − 0)/√((120−100)(16−0)) = −8/√320 = −1/√5
    m(("a", "d")) shouldBe -math.sqrt(1.0 / 5) +- 1e-12
    // fewer than two columns rejected
    an[IllegalArgumentException] should be thrownBy
      Profile.correlationMatrix(df, Seq("a"))
  }

  test("paretoFrontier: strict dominance, duplicate frontier points survive") {
    val df = Seq(
      (1L, 5L, 1L), (2L, 4L, 3L), (3L, 4L, 2L), (4L, 3L, 3L),
      (5L, 2L, 5L), (6L, 5L, 1L))
      .toDF("id", "x", "y")
    val got = Profile.paretoFrontier(df, "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (5,1)×2 survive (nothing beats x=5), (4,3) beats (4,2) and
    // dominates (3,3); (2,5) has the unmatched y
    got.toSeq shouldBe Seq((1L, 5L, 1L), (6L, 5L, 1L), (2L, 4L, 3L),
      (5L, 2L, 5L))
  }

  test("paretoFrontier is partition-invariant and monotone on the frontier") {
    val df = (0 until 300).map(i =>
      (i.toLong, (i % 17).toLong, ((i * 7) % 23).toLong))
      .toDF("id", "x", "y")
    val a = Profile.paretoFrontier(df.repartition(7), "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Profile.paretoFrontier(df.coalesce(1), "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    a.toSeq shouldBe b.toSeq
    // frontier in x-desc order has strictly increasing y across
    // distinct x (the skyline staircase)
    val stairs = a.map(t => (t._2, t._3)).distinct
    stairs.map(_._1).toSeq shouldBe
      stairs.map(_._1).sorted(Ordering[Long].reverse).toSeq
    stairs.map(_._2).toSeq shouldBe stairs.map(_._2).sorted.toSeq
  }

  test("robustOutliers: interpolated median/MAD, k*MAD cut, whale-proof") {
    val df = ((1 to 9).map(v => ("s", v.toLong)) :+ ("s", 100L))
      .toDF("source", "n_chars")
    val r = Profile.robustOutliers(df, "source", "n_chars", 3.0)
      .collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n") shouldBe 10L
    r.head.getAs[Double]("med") shouldBe 5.5  // (5+6)/2
    r.head.getAs[Double]("mad") shouldBe 2.5  // median of |x-5.5|
    // only the 100 whale exceeds 5.5 + 3*2.5 = 13
    r.head.getAs[Long]("n_outliers") shouldBe 1L
    r.head.getAs[Double]("outlier_frac") shouldBe 0.1
  }

  test("robustOutliers: zero-MAD group flags every off-median row; partition-invariant") {
    val df = (Seq.fill(5)(("a", 7L)) :+ ("a", 8L)) ++
      (1 to 50).map(i => ("b", (i % 10).toLong))
    val d = df.toDF("g", "v")
    val byG = Profile.robustOutliers(d, "g", "v", 3.0)
      .collect().map(r => r.getString(0) -> r).toMap
    // group a: med 7, mad 0 → any |x-7| > 0 is an outlier
    byG("a").getAs[Long]("n_outliers") shouldBe 1L
    rowsOf(Profile.robustOutliers(d.repartition(6), "g", "v", 3.0)) shouldBe
      rowsOf(Profile.robustOutliers(d.coalesce(1), "g", "v", 3.0))
  }

  test("domainQuantiles: rank-threshold semantics on hand data, heavy duplication, validation") {
    // group a: values 1..10 once each — p25 is the smallest v with
    // cum*100 >= n*25, i.e. cum >= 2.5 → v=3; p50 → v=5; p90 → v=9
    val a = (1 to 10).map(v => ("a", v.toLong))
    // group b: 99 copies of 5 and one 100 — every low pct reads 5,
    // p100 would read 100 (not requested); p90 stays 5
    val b = Seq.fill(99)(("b", 5L)) :+ (("b", 100L))
    val d = (a ++ b).toDF("g", "v")
    val rows = rowsOf(Profile.domainQuantiles(d, "g", "v",
      Seq(25, 50, 75, 90)))
    rows shouldBe Seq(
      Seq("a", 10L, 3L, 5L, 8L, 9L),
      Seq("b", 100L, 5L, 5L, 5L, 5L))
    rowsOf(Profile.domainQuantiles(d.repartition(6), "g", "v",
      Seq(50))) shouldBe
      rowsOf(Profile.domainQuantiles(d.coalesce(1), "g", "v", Seq(50)))
    an[IllegalArgumentException] should be thrownBy
      Profile.domainQuantiles(d, "g", "v", Seq(0))
  }
}
