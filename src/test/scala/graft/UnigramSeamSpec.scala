package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis}

/** Parity pins for the r16 q71 pre-tokenized LM seam: chunkDocsToks'
  * token-array payload must be exactly what re-tokenizing chunkDocs'
  * space-joined chunk_text yields (tokens is a fixed point on its own
  * output), and the pre-tokenized unigram scorer must be row-identical
  * to scoring the joined text. The corpus deliberately hits the edge
  * tokenization cases: empty text, whitespace-only text (both
  * normalize to the single [""] token), tabs/newlines, multi-space
  * runs, a single-token doc, a doc shorter than one chunk, and a doc
  * spanning several strided chunks.
  */
class UnigramSeamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick  Brown fox\tjumps over\nthe lazy dog and then " +
      "keeps running across the wide field for a very long time " +
      "until it finally rests under a tall tree near the river"),
    (2L, ""),
    (3L, "   \t\n  "),
    (4L, "single"),
    (5L, "  leading and trailing   whitespace \t "),
    (6L, "short doc under one chunk")
  ).toDF("doc_id", "text")

  private val chunkTokens = 8
  private val strideTokens = 5

  test("chunkDocsToks payload == tokens(chunkDocs.chunk_text), all other columns identical") {
    val viaText = Curation.chunkDocs(docs, "doc_id", "text",
      chunkTokens, strideTokens)
    val viaToks = Curation.chunkDocsToks(docs, "doc_id", "text",
      chunkTokens, strideTokens)
    viaToks.columns.toSeq shouldBe
      viaText.columns.toSeq.map(c => if (c == "chunk_text") "chunk_toks" else c)
    val a = viaText
      .withColumn("rt", graft.functions.tokens(col("chunk_text")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_chunk_tok"), col("rt"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = viaToks
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_chunk_tok"), col("chunk_toks"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    a should not be empty
    a shouldBe b
    // and the reverse direction: joining the toks reproduces the text
    val txtA = viaText.select(col("doc_id"), col("chunk_idx"),
        col("chunk_text"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val txtB = viaToks.select(col("doc_id"), col("chunk_idx"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    txtA shouldBe txtB
  }

  test("unigramLogProbPreTokenized over chunk_toks is row-identical to unigramLogProb over chunk_text (the q71 shape)") {
    val viaText = Curation.chunkDocs(docs, "doc_id", "text",
        chunkTokens, strideTokens)
      .withColumn("ckey", col("doc_id") * 1000 + col("chunk_idx"))
    val viaToks = Curation.chunkDocsToks(docs, "doc_id", "text",
        chunkTokens, strideTokens)
      .withColumn("ckey", col("doc_id") * 1000 + col("chunk_idx"))
    val ref = TextAnalysis.unigramLogProb(viaText, "ckey", "chunk_text")
    val now = TextAnalysis.unigramLogProbPreTokenized(viaToks, "ckey",
      "chunk_toks")
    now.columns.toSeq shouldBe ref.columns.toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        // bit-compare the double, exact-compare the long mean
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        r.getLong(3))).sortBy(_._1).toSeq
    val a = rows(ref); val b = rows(now)
    a should not be empty
    a shouldBe b
    ref.unpersist(); now.unpersist()
  }
}
