package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond the reference's surface:
  * benchmark decontamination and per-group quota capping — the two
  * standing steps between "deduplicated corpus" and "training mix" in
  * a large-scale LLM data pipeline.
  */
object Curation {

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
    * never full texts. Exact — every reported overlap is a true
    * Jaccard, so the filter has no false drops; returns (kept corpus,
    * dropped ids with their best-matching contaminant and score).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    contam: DataFrame, contamIdCol: String,
                    contamTextCol: String,
                    n: Int, t: Double): (DataFrame, DataFrame) = {
    // materialize BOTH shingle tables before exploding: without the
    // cache boundary the optimizer inlines the tokenize+gram+hash
    // lambda chain into the generator and the downstream join keys
    // (the same re-inlining measured at 20x in the Dedup pipelines —
    // 35 s → ~2 s here at sf0.1)
    def hashedShingles(df: DataFrame, id: String, text: String) = {
      val sh = Dedup.shingles(df, id, text, n)
        .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("sh"),
          col("sz"))
        .persist()
      sh.count()
      sh
    }
    val d = hashedShingles(docs, idCol, textCol)
    val c0 = hashedShingles(contam, contamIdCol, contamTextCol)
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
    val dropped = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("cid").as("contaminant_id"),
        col("jaccard").as("contaminant_jaccard"))
      .persist()
    dropped.count()
    d.unpersist(blocking = false)
    c0.unpersist(blocking = false)
    val kept = docs.join(
      dropped.select(col("id").as(idCol)), Seq(idCol), "left_anti")
    (kept, dropped)
  }

  /** Per-group quota capping (domain balancing): keep at most `quota`
    * rows per group, chosen DETERMINISTICALLY by `orderCols` (pass a
    * quality score descending + an id tie-breaker — "keep the best N
    * per domain", the standard mixing step). One window, one shuffle on
    * the group key; at scale, heavily-skewed groups are exactly the
    * rows being cut, so the sort is bounded by the group's own size.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
                  orderCols: Seq[org.apache.spark.sql.Column],
                  quota: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }
}
