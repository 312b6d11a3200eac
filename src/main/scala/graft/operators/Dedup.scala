package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Deduplication operators for large-scale text corpora. All variants
  * are hash/bucket-partitioned — no crossJoin anywhere — so candidate
  * generation scales as the inverted index / band buckets, not O(n²).
  *
  * Exact dedup mirrors the reference's content-hash surrogate key idea
  * (ref darkpool_trades/main.py:88-92: SHA-256 over identifying fields).
  */
object Dedup {

  /** Exact dedup: canonical SHA-256 over normalized text; each content
    * group keeps its smallest id. One hash-partitioned aggregate.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(normText(col(textCol)), 256))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Shingle table: (id, sh: array<string>, sz) with distinct word
    * n-grams of the normalized text.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(
        col(idCol).as("id"),
        wordShingles(tokens(col(textCol)), n).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)

  /** Exact n-gram Jaccard similarity self-join with PPJoin-style prefix
    * filtering: shingles are ranked by global document frequency
    * (rarest first); two docs can reach Jaccard >= t only if their
    * rank-sorted prefixes of length |s| - ceil(t*|s|) + 1 share a
    * shingle, so the inverted index is built over prefixes only. The
    * candidate pairs are then verified with the exact intersection.
    * Every stage is a keyed shuffle (shingle / id / pair) — scales as
    * the index, not as n².
    *
    * Returns (id_a, id_b, inter, union_sz, jaccard) for pairs with
    * jaccard >= t, id_a < id_b.
    */
  def jaccardSimilarityJoin(docs: DataFrame, idCol: String, textCol: String,
                            n: Int, t: Double): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)

    // global shingle document-frequency → rarest-first total order
    val dfreq = sh.select(col("id"), explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))

    // per-doc shingles sorted by (df, s); keep the filtering prefix
    val prefixLen = (col("sz") - ceil(lit(t) * col("sz")) + 1).cast("int")
    val ranked = sh.select(col("id"), col("sz"), explode(col("sh")).as("s"))
      .join(dfreq, "s")
      .groupBy(col("id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("sorted"))
      .select(col("id"), col("sz"),
        transform(slice(col("sorted"), lit(1), prefixLen), x => x.getField("s")).as("prefix"))

    // inverted index over prefixes → candidate pairs (+ size filter)
    val idx = ranked.select(col("id"), col("sz"), explode(col("prefix")).as("s"))
    val cand = idx.as("a").join(idx.as("b"), Seq("s"))
      .filter(col("a.id") < col("b.id") &&
        col("b.sz") >= ceil(lit(t) * col("a.sz")) &&
        col("a.sz") >= ceil(lit(t) * col("b.sz")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()

    verifyJaccard(cand, sh, t)
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * the shingle table; emits pairs meeting the threshold.
    */
  def verifyJaccard(cand: DataFrame, sh: DataFrame, t: Double): DataFrame = {
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sz").as("sz_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sz").as("sz_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("union_sz", (col("sz_a") + col("sz_b")).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_sz").cast("double"))
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "inter", "union_sz", "jaccard")
  }

  /** MinHash signatures: k independent hash slots, each the min of a
    * seeded xxhash64 over the doc's shingles. One explode + one grouped
    * aggregate; deterministic (xxhash64 is a fixed function of
    * (seed-slot, shingle)).
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val exploded = sh.select(col("id"), explode(col("sh")).as("s"))
    val slots = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    exploded.groupBy("id").agg(slots.head, slots.tail: _*)
  }

  /** MinHash-LSH near-dup: signatures banded into `bands` groups of
    * `rows` slots; docs colliding on any band hash become candidates
    * (a keyed self-join per band bucket — no crossJoin), then candidates
    * are verified with the EXACT Jaccard so the output has no false
    * positives. Band/row counts tune recall at the target threshold:
    * P(detect) = 1 - (1 - J^rows)^bands.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, t: Double, bands: Int, rows: Int): DataFrame = {
    val sh  = shingles(docs, idCol, textCol, n)
    val sig = minhashSignatures(sh, bands * rows)
    val bandCols = (0 until bands).map { bnd =>
      val slice = (0 until rows).map(r => col(s"h${bnd * rows + r}"))
      xxhash64(lit(bnd) +: slice: _*).as(s"band$bnd")
    }
    val banded = sig.select(col("id") +: bandCols: _*)
    val buckets = banded.select(col("id"),
        posexplode(array((0 until bands).map(bnd => col(s"band$bnd")): _*)))
      .toDF("id", "band_idx", "band_hash")
    val cand = buckets.as("a").join(buckets.as("b"), Seq("band_idx", "band_hash"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    verifyJaccard(cand, sh, t)
  }

  /** 64-bit SimHash over tokens: bit i of the fingerprint is the sign of
    * sum over tokens of ±1 according to bit i of xxhash64(token).
    * Near-dup pairs = fingerprints within `maxHamming` bits, found by
    * the pigeonhole band trick (split 64 bits into maxHamming+1 chunks;
    * any pair within the bound collides on >= 1 chunk) — keyed join on
    * (chunk_idx, chunk_value), then exact hamming via bit_count(xor).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tk"))
      .withColumn("h", xxhash64(col("tk")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val sums = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    sums.select(col("id"), fp.as("simhash"))
  }

  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int): DataFrame = {
    val fp = simhash(docs, idCol, textCol)
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val chunked = fp.select(col("id"), col("simhash"),
        posexplode(array((0 until chunks).map { c =>
          shiftright(col("simhash"), c * width)
            .bitwiseAND(lit((1L << width) - 1))
        }: _*)))
      .toDF("id", "simhash", "chunk_idx", "chunk_val")
    chunked.as("a").join(chunked.as("b"), Seq("chunk_idx", "chunk_val"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("fp_a"), col("b.simhash").as("fp_b")).distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
