package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.Internal
import org.apache.spark.sql.types.DoubleType

import graft.functions.{CosineSimilarity, ExactMedian, ExactQuantile, ExactQuantiles, MinHashSignature, QuantizeInt8, ShingleHashes, SimHash64}
import graft.ops.DedupOps

/** SQL surface for the engine's custom Catalyst expressions: a user who
  * works in `spark.sql(...)` (as the reference does for all its analytics,
  * `(Clone) Pinterest Data Cleaning and Queries.py:111-322`) gets the same
  * operators the DataFrame API exposes. Registered either at session build
  * via [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * or into a live session via [[GraftFunctions.register]] — both paths
  * share the one builder table below, so they cannot drift.
  *
  * Size/seed arguments must be integer literals: they parameterize the
  * expression tree itself (seed schedules, shingle width), not row data.
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be a literal, got non-foldable ${e.sql}")

  private def litIntArray(e: Expression, fn: String, arg: String): Seq[Int] =
    if (e.foldable) e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toObjectArray(e.dataType
            .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
          .toSeq.map {
            case i: java.lang.Integer => i.intValue()
            case l: java.lang.Long => l.intValue()
            case other => throw new IllegalArgumentException(
              s"$fn: $arg elements must be integer literals, got $other")
          }
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer array literal, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be a literal array, got non-foldable ${e.sql}")

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.size != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${es.size}")

  /** (identifier, info, builder) rows, the shape `injectFunction` takes. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => {
        arity("graft_cosine", es, 2)
        CosineSimilarity(es(0), es(1))
      }),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => {
        arity("graft_simhash64", es, 1)
        SimHash64(es(0))
      }),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName,
        "graft_shingle_hashes"),
      (es: Seq[Expression]) => {
        arity("graft_shingle_hashes", es, 2)
        ShingleHashes(es(0), litInt(es(1), "graft_shingle_hashes", "n"))
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (es: Seq[Expression]) => {
        arity("graft_minhash", es, 3)
        val nGram = litInt(es(1), "graft_minhash", "nGram")
        val nHashes = litInt(es(2), "graft_minhash", "nHashes")
        MinHashSignature(es(0), nGram, DedupOps.seeds(nHashes).toArray)
      }),
    (FunctionIdentifier("graft_quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "graft_quantize_int8"),
      (es: Seq[Expression]) => {
        arity("graft_quantize_int8", es, 1)
        QuantizeInt8(es(0))
      }),
    (FunctionIdentifier("graft_exact_median"),
      new ExpressionInfo(classOf[ExactMedian].getName, "graft_exact_median"),
      (es: Seq[Expression]) => {
        arity("graft_exact_median", es, 1)
        ExactMedian(Cast(es(0), DoubleType)).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_exact_quantile"),
      new ExpressionInfo(classOf[ExactQuantile].getName,
        "graft_exact_quantile"),
      (es: Seq[Expression]) => {
        arity("graft_exact_quantile", es, 3)
        ExactQuantile(Cast(es(0), DoubleType),
          litInt(es(1), "graft_exact_quantile", "pctNum"),
          litInt(es(2), "graft_exact_quantile", "pctDen"))
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_exact_quantiles"),
      new ExpressionInfo(classOf[ExactQuantiles].getName,
        "graft_exact_quantiles"),
      (es: Seq[Expression]) => {
        arity("graft_exact_quantiles", es, 3)
        ExactQuantiles(Cast(es(0), DoubleType),
          litIntArray(es(1), "graft_exact_quantiles", "pctNums"),
          litInt(es(2), "graft_exact_quantiles", "pctDen"))
          .toAggregateExpression()
      }))

  /** Install into a live session (tests, notebooks attached to an existing
    * session). Idempotent: re-registration replaces the same identifiers.
    */
  def register(s: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      Internal.registerFunction(s, id, info, builder)
    }
}
