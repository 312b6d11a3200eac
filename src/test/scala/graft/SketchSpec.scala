package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** Count-min sketch invariants: overestimate-only, exact at generous
  * width, total-mass collapse at width 1, partition-order independence.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val keyed = Seq(
    ("alpha", 100L), ("beta", 60L), ("gamma", 30L), ("delta", 10L),
    ("epsilon", 5L), ("zeta", 1L)
  ).toDF("tok", "cnt")

  private def estimates(depth: Int, width: Int,
                        df: org.apache.spark.sql.DataFrame = keyed): Map[String, Long] = {
    val counters = Sketch.cmsCounters(df, "tok", "cnt", depth, width)
    Sketch.cmsEstimate(df, "tok", counters, depth, width)
      .select($"tok", $"cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and are exact when width dwarfs the key set") {
    val exact = keyed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(depth = 4, width = 4096)
    exact.foreach { case (k, v) =>
      withClue(s"$k: ") { est(k) should be >= v }
    }
    // 6 keys into 4 rows x 4096 buckets: collision probability is
    // negligible and the hash is FIXED - assert exact equality
    est shouldBe exact
  }

  test("width 1 collapses every counter to the total mass (the degenerate upper bound)") {
    val total = keyed.agg(sum($"cnt")).head().getLong(0)
    estimates(depth = 3, width = 1).values.foreach(_ shouldBe total)
  }

  test("sketch is partition-order independent (counter sums commute)") {
    estimates(4, 64, keyed.repartition(7)) shouldBe estimates(4, 64, keyed.coalesce(1))
  }

  test("rejects degenerate dimensions") {
    an[IllegalArgumentException] should be thrownBy
      Sketch.cmsCounters(keyed, "tok", "cnt", depth = 0, width = 16)
  }

  test("querying a key the sketch never counted estimates 0 (left join), not a dropped row") {
    val counters = Sketch.cmsCounters(keyed, "tok", "cnt", depth = 4, width = 4096)
    val queries = Seq(("alpha", 0L), ("never-counted-key", 0L)).toDF("tok", "cnt")
    val est = Sketch.cmsEstimate(queries, "tok", counters, 4, 4096)
      .select($"tok", $"cms_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.size shouldBe 2 // the absent key SURVIVES the join
    est("alpha") shouldBe 100L
    // 6 keys in 4x4096 buckets: the absent key's buckets are empty
    // with near-certainty under the fixed hash — estimate 0
    est("never-counted-key") shouldBe 0L
  }

  test("rejects scratch/output column collisions") {
    val counters = Sketch.cmsCounters(keyed, "tok", "cnt", depth = 2, width = 16)
    an[IllegalArgumentException] should be thrownBy
      Sketch.cmsEstimate(keyed.withColumn("cms_est", lit(1L)), "tok",
        counters, 2, 16)
  }

  // -------------------------------------------------- HyperLogLog

  /** Reference register computation: same md5/15-hex/60-bit spec,
    * written independently against java.security.MessageDigest. */
  private def refRegisters(keys: Seq[String], p: Int): Map[Int, Int] = {
    val m = 1L << p
    keys.map { k =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val w = h / m
      val rho = if (w == 0L) 60 - p + 1
      else (60 - p) - (63 - java.lang.Long.numberOfLeadingZeros(w))
      ((h % m).toInt, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
  }

  test("hllRegisters match an independent MessageDigest reference; duplicates change nothing") {
    val rnd = new scala.util.Random(65)
    val keys = Seq.fill(500)("k" + rnd.nextInt(200)) // dups guaranteed
    val got = Sketch.hllRegisters(keys.toDF("k"), "k", p = 6)
      .as[(Int, Int)].collect().toMap
    got shouldBe refRegisters(keys, 6)
    // multiplicity is invisible to a max-register sketch
    val once = Sketch.hllRegisters(keys.distinct.toDF("k"), "k", p = 6)
      .as[(Int, Int)].collect().toMap
    once shouldBe got
  }

  test("hll registers MERGE by elementwise max (the shard-combining property)") {
    val a = (1 to 400).map("a" + _); val b = (1 to 400).map("b" + _)
    val whole = Sketch.hllRegisters((a ++ b).toDF("k"), "k", p = 7)
      .as[(Int, Int)].collect().toMap
    val ra = Sketch.hllRegisters(a.toDF("k"), "k", p = 7)
      .as[(Int, Int)].collect().toMap
    val rb = Sketch.hllRegisters(b.toDF("k"), "k", p = 7)
      .as[(Int, Int)].collect().toMap
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    whole shouldBe merged
  }

  test("hllEstimate lands within the expected error band and is deterministic") {
    val n = 10000
    val keys = (1 to n).map("key" + _).toDF("k")
    val regs = Sketch.hllRegisters(keys, "k", p = 8)
    val est = Sketch.hllEstimate(regs, p = 8)
      .select($"estimate").as[Double].collect().head
    // standard error ~1.04/sqrt(256) = 6.5%; gate at 3 sigma
    est shouldBe n.toDouble +- n * 0.20
    val again = Sketch.hllEstimate(Sketch.hllRegisters(keys, "k", p = 8), 8)
      .select($"estimate").as[Double].collect().head
    again shouldBe est // bit-identical, not approximately
  }

  test("hllEstimate small-range correction: tiny cardinalities use linear counting") {
    val keys = (1 to 5).map("x" + _).toDF("k")
    val row = Sketch.hllEstimate(Sketch.hllRegisters(keys, "k", p = 8), 8)
      .select($"n_buckets_set", $"estimate").as[(Long, Double)]
      .collect().head
    // 5 distinct keys, no bucket collisions expected at m=256
    row._1 shouldBe 5L
    // linear counting m*ln(m/V) is near-exact at this density
    row._2 shouldBe 5.0 +- 0.1
  }

  test("hll ignores null keys (COUNT DISTINCT semantics) and an empty input estimates 0") {
    val withNulls = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val regs = Sketch.hllRegisters(withNulls, "k", p = 8)
      .as[(Int, Int)].collect().toMap
    regs shouldBe Sketch.hllRegisters(Seq("a", "b").toDF("k"), "k", p = 8)
      .as[(Int, Int)].collect().toMap
    regs.keySet should not contain null

    val empty = Sketch.hllEstimate(
        Sketch.hllRegisters(Seq.empty[String].toDF("k"), "k", p = 8), 8)
      .select($"n_buckets_set", $"estimate").as[(Long, Double)]
      .collect().head
    empty shouldBe ((0L, 0.0)) // linear counting: 256*ln(256/256)
  }

  test("hllRegistersBy/hllEstimateBy: per-group sketches equal per-subset global sketches") {
    val df = (1 to 300).map(i => (s"g${i % 3}", s"k${i % 97}")).toDF("g", "k")
    val grouped = Sketch.hllEstimateBy(
        Sketch.hllRegistersBy(df, "k", Seq("g"), p = 7), Seq("g"), p = 7)
      .select($"g", $"n_buckets_set", $"harmonic_sum_scaled", $"estimate")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val expected = Seq("g0", "g1", "g2").map { g =>
      val one = Sketch.hllEstimate(
          Sketch.hllRegisters(df.filter($"g" === g).select($"k"), "k", 7), 7)
        .as[(Long, Long, Double)].collect().head
      (g, one._1, one._2, one._3)
    }
    grouped shouldBe expected
  }

  test("hllRegistersBy is duplicate-insensitive: registers over the distinct table equal registers over the raw stream") {
    // the sharedSourceVocab seam's load-bearing equivalence: q69 reads
    // its HLL registers off the distinct (source, tok) table instead
    // of the raw token stream, which is only sound because max(rho)
    // per bucket cannot change under value duplication
    val raw = (1 to 400).map(i => (s"g${i % 2}", s"k${i % 37}")).toDF("g", "k")
    val regs = Sketch.hllRegistersBy(raw, "k", Seq("g"), p = 7)
      .as[(String, Int, Int)].collect().toSet
    val regsDistinct = Sketch.hllRegistersBy(raw.distinct(), "k", Seq("g"), p = 7)
      .as[(String, Int, Int)].collect().toSet
    regsDistinct shouldBe regs
  }

  test("hll rejects out-of-range precision") {
    val keys = Seq("a").toDF("k")
    an[IllegalArgumentException] should be thrownBy
      Sketch.hllRegisters(keys, "k", 3)
    an[IllegalArgumentException] should be thrownBy
      Sketch.hllEstimate(keys.toDF("bucket"), 17)
  }

  // ---------------------------------------- Misra-Gries heavy hitters

  /** Zipf-ish stream: item_i appears 2^(9-i) times for i in 0..9 plus a
    * long tail of 200 singletons — 1223 items, true counts known.
    */
  private def zipfStream = {
    val heads = (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"h$i"))
    val tail = (0 until 200).map(i => f"t$i%03d")
    (heads ++ tail).toDF("w")
  }
  private val zipfN = (0 until 10).map(i => 1 << (9 - i)).sum + 200 // 1223

  test("misra-gries: capacity below the domain still keeps every item over n/(cap+1), with the undercount bound") {
    val cap = 8 // 1210 distinct items >> 8 counters
    for (parts <- Seq(1, 3, 7)) {
      val mg = zipfStream.repartition(parts)
        .agg(graft.functions.misraGries(col("w"), cap).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.item"), col("e.lb")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      mg.size should be <= cap
      val trueCnt = (0 until 10).map(i => s"h$i" -> (1L << (9 - i))).toMap
        .withDefaultValue(1L)
      // guarantee: true freq > n/(cap+1) => present
      trueCnt.filter(_._2 > zipfN / (cap + 1)).keys.foreach { k =>
        withClue(s"parts=$parts item $k: ") { mg.contains(k) shouldBe true }
      }
      // bound: lb <= true <= lb + n/(cap+1)
      mg.foreach { case (k, lb) =>
        withClue(s"parts=$parts item $k: ") {
          lb should be <= trueCnt(k)
          trueCnt(k) should be <= lb + zipfN / (cap + 1) + 1
        }
      }
    }
  }

  test("heavyHittersExact equals the brute-force groupBy answer and is partition-invariant") {
    for (k <- Seq(4, 16, 64); parts <- Seq(1, 5)) {
      val got = rowsOf(Sketch.heavyHittersExact(
        zipfStream.repartition(parts), "w", k))
      val n = zipfN.toLong
      val brute = zipfStream.groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * k > n)
        .select(col("w").as("item"), col("cnt"),
          round(col("cnt").cast("double") / n, 9).as("share"))
        .orderBy(col("cnt").desc, col("item").asc)
      withClue(s"k=$k parts=$parts: ") { got shouldBe rowsOf(brute) }
    }
  }

  test("heavyHittersExact: extra summary capacity changes nothing; nulls are ignored; guards hold") {
    val withNulls = zipfStream.unionAll(
      Seq.fill(50)(null.asInstanceOf[String]).toDF("w"))
    rowsOf(Sketch.heavyHittersExact(withNulls, "w", 8,
      summaryCapacity = Some(64))) shouldBe
      rowsOf(Sketch.heavyHittersExact(zipfStream, "w", 8))
    an[IllegalArgumentException] should be thrownBy
      Sketch.heavyHittersExact(zipfStream, "w", 8, summaryCapacity = Some(4))
    an[IllegalArgumentException] should be thrownBy
      Sketch.heavyHittersExact(zipfStream, "w", 0)
  }
}
