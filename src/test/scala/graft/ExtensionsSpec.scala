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

  test("wrong arity fails at analysis, wrong types fail the expression's type check") {
    GraftExtensions.register(spark)
    intercept[Exception](spark.sql("SELECT dot_product(array(1.0D))").collect())
    intercept[Exception](spark.sql("SELECT cosine_sim('a', 'b')").collect())
  }
}
