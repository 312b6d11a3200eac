package graft

/** SQL registration of the native vector expressions: after
  * `GraftExtensions.register`, plain `spark.sql` can call the codegen'd
  * `dot_product`/`cosine_sim` — the same hot path as the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("dot_product and cosine_sim are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs_parallel,
        |  cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS cs_orth
        |""".stripMargin).collect()(0)
    row.getDouble(0) shouldBe 32.0
    row.getDouble(1) shouldBe 1.0 +- 1e-12
    row.getDouble(2) shouldBe 0.0 +- 1e-12
    // registration is idempotent
    GraftExtensions.register(spark)
    spark.sql("SELECT dot_product(array(1.0D), array(2.0D))")
      .collect()(0).getDouble(0) shouldBe 2.0
  }

  test("SQL functions agree with the Column API on float arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftExtensions.register(spark)
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM vecs").collect()(0).getDouble(0)
    val viaApi = df.select(graft.functions.cosineSim(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(viaSql == viaApi) // bit-identical: same expression either way
  }

  test("dedup fingerprints are callable from SQL: simhash + minhash signature") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  simhash_portable64(array('alpha', 'beta')) AS sp,
        |  simhash_xx64(array('alpha', 'beta')) AS sx,
        |  minhash_signature(array('alpha', 'beta'), 4) AS mh
        |""".stripMargin).collect()(0)
    // values equal the Column-API operators on the same tokens
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaApi = graft.operators.Dedup.simhashPortable64(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0).getLong(1)
    row.getLong(0) shouldBe viaApi
    row.getSeq[Long](2).size shouldBe 4
    // k must be a literal
    intercept[Exception](spark.sql(
      "SELECT minhash_signature(array('a'), cast(rand()*4 AS INT))").collect())
  }

  test("wrong arity fails at analysis, wrong types fail the expression's type check") {
    GraftExtensions.register(spark)
    intercept[Exception](spark.sql("SELECT dot_product(array(1.0D))").collect())
    intercept[Exception](spark.sql("SELECT cosine_sim('a', 'b')").collect())
  }
}
