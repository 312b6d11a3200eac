package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.expressions.{CosineSimilarity, DotProduct, MinHashSignature, SimHashPortable64, SimHashXx64}

/** SQL registration for the native vector expressions, so `spark.sql`
  * users get the same codegen'd hot path as the Column API
  * ([[graft.functions.cosineSim]]/[[graft.functions.dotProduct]]):
  *
  *  - config path: `spark.sql.extensions=graft.GraftExtensions`
  *    (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  *    the standard Spark extension point;
  *  - imperative path: `GraftExtensions.register(spark)` on an already
  *    running session (useful in notebooks/tests where the session
  *    pre-exists).
  *
  * Both inject the same builders: `dot_product(a, b)` and
  * `cosine_sim(a, b)` over `array<float|double>` columns.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def binary(name: String, clazz: Class[_],
                     make: (Expression, Expression) => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      make(args(0), args(1))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      builder)
  }

  private def unary(name: String, clazz: Class[_],
                    make: Expression => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      make(args(0))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      builder)
  }

  /** The (identifier, info, builder) triples shared by both paths. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    binary("dot_product", classOf[DotProduct], DotProduct.apply),
    binary("cosine_sim", classOf[CosineSimilarity], CosineSimilarity.apply),
    unary("simhash_portable64", classOf[SimHashPortable64], SimHashPortable64.apply),
    unary("simhash_xx64", classOf[SimHashXx64], SimHashXx64.apply),
    // minhash_signature(shingles, k) — k must be a literal int (the
    // slot count shapes the output schema, so it cannot be data)
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"minhash_signature expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature: k must be an integer literal, got $other")
        }
        MinHashSignature(args(0), k)
      }))

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
