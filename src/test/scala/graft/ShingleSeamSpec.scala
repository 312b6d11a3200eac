package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{length => sqlLength}
import graft.operators.{Curation, Dedup}

/** Parity pins for the r16 shared-shingle seam (q50): the pre-shingled
  * operator variants must be ROW-IDENTICAL to the r15 formulations,
  * which are replayed here verbatim as the reference implementations
  * (same expressions, same join order — copied from the r15 tree, not
  * re-derived). Also pins the q50 derivation itself: a corpus shingle
  * table filtered by id anti-join equals re-shingling the filtered
  * corpus, because shingling is strictly per-row.
  */
class ShingleSeamSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with real containment structure: 2 is a token-substring of
    * 1 (and of 6), 4 is a substring of 3, 5/7 unrelated, 8 too short
    * to shingle at n=3. Enough shingle overlap that the decontaminate
    * jaccard arithmetic exercises non-trivial values.
    */
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "gamma delta epsilon zeta"),
    (3L, "one two three four five six seven"),
    (4L, "two three four five"),
    (5L, "completely unrelated text about data pipelines at scale"),
    (6L, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
    (7L, "another standalone document with its own words entirely"),
    (8L, "too short")
  ).toDF("doc_id", "text")

  private lazy val contam = Seq(
    (101L, "gamma delta epsilon zeta eta"),
    (102L, "one two three four five six seven"),
    (103L, "benchmark suite text that matches nothing in the corpus")
  ).toDF("doc_id", "text")

  /** r15 Dedup.containmentJoin, replayed verbatim (pre-seam tree). */
  private def containmentJoinR15(docs: DataFrame, idCol: String,
                                 textCol: String, n: Int): DataFrame = {
    val sh = Dedup.hashedShingles(docs, idCol, textCol, n,
      materialize = false)
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val rarest = ex.join(dfreq, "s")
      .groupBy(col("id"))
      .agg(min_by(col("s"), struct(col("df"), col("s"))).as("s"))
    val cand = rarest.as("a").join(ex.as("b"), Seq("s"))
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val nt = docs.select(col(idCol).as("__cid"),
      graft.functions.normText(col(textCol)).as("__nt"))
    val out = cand
      .join(nt.select(col("__cid").as("id_a"), col("__nt").as("nt_a")), "id_a")
      .join(nt.select(col("__cid").as("id_b"), col("__nt").as("nt_b")), "id_b")
      .filter(
        (sqlLength(col("nt_a")) < sqlLength(col("nt_b")) ||
          (sqlLength(col("nt_a")) === sqlLength(col("nt_b")) &&
            col("id_a") < col("id_b"))) &&
        concat(lit(" "), col("nt_b"), lit(" "))
          .contains(concat(lit(" "), col("nt_a"), lit(" "))))
      .select("id_a", "id_b")
    val res = out.persist()
    res.count()
    sh.unpersist(blocking = false)
    res
  }

  /** r15 Curation.decontaminate, replayed verbatim (pre-seam tree). */
  private def decontaminateR15(docs: DataFrame, idCol: String,
                               textCol: String, contam: DataFrame,
                               contamIdCol: String, contamTextCol: String,
                               n: Int, t: Double): (DataFrame, DataFrame) = {
    val d = Dedup.hashedShingles(docs, idCol, textCol, n, materialize = true)
    val c0 = Dedup.hashedShingles(contam, contamIdCol, contamTextCol, n,
      materialize = true)
    val c = c0.select(col("id").as("cid"), col("sh").as("csh"),
      col("sz").as("csz"))
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
    val dropped = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("cid").as("contaminant_id"),
        col("jaccard").as("contaminant_jaccard"))
      .persist()
    dropped.count()
    d.unpersist(blocking = false); c0.unpersist(blocking = false)
    val kept = docs.join(
      dropped.select(col("id").as(idCol)), Seq(idCol), "left_anti")
    (kept, dropped)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("containmentJoin (wrapper over preShingled) is row-identical to the r15 formulation") {
    val now = Dedup.containmentJoin(docs, "doc_id", "text", n = 3)
    val ref = containmentJoinR15(docs, "doc_id", "text", n = 3)
    now.columns.toSeq shouldBe ref.columns.toSeq
    val a = sortedRows(now); val b = sortedRows(ref)
    a should not be empty // the corpus is built to contain real pairs
    a shouldBe b
    now.unpersist(); ref.unpersist()
  }

  test("decontaminate (wrapper over preShingled) is row-identical to the r15 formulation, kept and dropped") {
    val (keptNow, dropNow) =
      Curation.decontaminate(docs, "doc_id", "text",
        contam, "doc_id", "text", n = 3, t = 0.3)
    val (keptRef, dropRef) =
      decontaminateR15(docs, "doc_id", "text",
        contam, "doc_id", "text", n = 3, t = 0.3)
    val dn = sortedRows(dropNow); val dr = sortedRows(dropRef)
    dn should not be empty // contam 101/102 are built to fire
    dn shouldBe dr // includes the double jaccard, bit-compared via ==
    sortedRows(keptNow) shouldBe sortedRows(keptRef)
    dropNow.unpersist(); dropRef.unpersist()
  }

  test("q50 derivation: shingle-table id anti-join equals re-shingling the anti-joined corpus") {
    val canonSh = Dedup.hashedShingles(docs, "doc_id", "text", n = 3,
      materialize = false)
    val contained = Dedup.containmentJoin(docs, "doc_id", "text", n = 3)
      .select(col("id_a").as("doc_id")).distinct().persist()
    contained.count() should be > 0L // seam must be exercised for real
    // the q50 shape: derive the filtered shingle table by id anti-join
    val derived = canonSh.join(
      contained.select(col("doc_id").as("id")), Seq("id"), "left_anti")
    // the r15 shape: re-shingle the filtered corpus from text
    val noExcerpts = docs.join(contained, Seq("doc_id"), "left_anti")
    val reshingled = Dedup.hashedShingles(noExcerpts, "doc_id", "text",
      n = 3, materialize = false)
    derived.columns.toSeq shouldBe reshingled.columns.toSeq
    sortedRows(derived) shouldBe sortedRows(reshingled)
    canonSh.unpersist(); reshingled.unpersist(); contained.unpersist()
  }

  test("decontaminatePreShingled over the derived table matches decontaminate over the filtered corpus") {
    val canonSh = Dedup.hashedShingles(docs, "doc_id", "text", n = 3,
      materialize = false)
    val contained = Dedup.containmentJoin(docs, "doc_id", "text", n = 3)
      .select(col("id_a").as("doc_id")).distinct().persist()
    contained.count()
    val noExcerpts = docs.join(contained, Seq("doc_id"), "left_anti")
    val noExSh = canonSh.join(
      contained.select(col("doc_id").as("id")), Seq("id"), "left_anti")
    val (keptNow, dropNow) = Curation.decontaminatePreShingled(
      noExSh, noExcerpts, "doc_id", contam, "doc_id", "text",
      n = 3, t = 0.3)
    val (keptRef, dropRef) = decontaminateR15(noExcerpts, "doc_id", "text",
      contam, "doc_id", "text", n = 3, t = 0.3)
    sortedRows(dropNow) shouldBe sortedRows(dropRef)
    sortedRows(keptNow) shouldBe sortedRows(keptRef)
    canonSh.unpersist(); contained.unpersist()
    dropNow.unpersist(); dropRef.unpersist()
  }
}
