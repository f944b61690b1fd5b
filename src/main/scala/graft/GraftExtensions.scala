package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, LshBuckets, MinHashSigExpr,
  ShingleHashExpr, ShingleStringsExpr, SigAgreement, SimHash64Expr,
  SortedIntersectCount}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions so plain `spark.sql` users get them too.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or programmatically `new GraftExtensions().apply(extensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    // W1 repair: window-aggregate + distinct → aggregation, when provably
    // equivalent (see the rule's scaladoc for the exact conditions)
    ext.injectOptimizerRule(_ => graft.rules.WindowDistinctToAggregate)
  }
}

object GraftExtensions {

  private def lit[T](e: Expression, what: String): T = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[T]
  }

  private def descriptor(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      require(children.length == arity, s"$name takes $arity arguments")
      build(children)
    })

  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptor("graft_dot_product", classOf[DotProduct], 2)(c => DotProduct(c(0), c(1)))

  /** All native expressions as SQL functions. Constant arguments (shingle
    * width, k, seed) must be literals — they become codegen'd constants. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    dotProductDescriptor,
    descriptor("graft_simhash64", classOf[SimHash64Expr], 1)(c => SimHash64Expr(c(0))),
    descriptor("graft_shingle_hashes", classOf[ShingleHashExpr], 2)(c =>
      ShingleHashExpr(c(0), lit[Number](c(1), "shingle width n").intValue())),
    descriptor("graft_shingles", classOf[ShingleStringsExpr], 2)(c =>
      ShingleStringsExpr(c(0), lit[Number](c(1), "shingle width n").intValue())),
    descriptor("graft_minhash_sig", classOf[MinHashSigExpr], 3) { c =>
      val k = lit[Number](c(1), "k").intValue()
      val seed = lit[Number](c(2), "seed").longValue()
      val ab = graft.dedup.Dedup.perms(k, seed)
      MinHashSigExpr(c(0), ab.map(_._1).toArray, ab.map(_._2).toArray)
    },
    descriptor("graft_sorted_intersect_count", classOf[SortedIntersectCount], 2)(c =>
      SortedIntersectCount(c(0), c(1))),
    descriptor("graft_sig_agreement", classOf[SigAgreement], 2)(c =>
      SigAgreement(c(0), c(1))),
    descriptor("graft_lsh_buckets", classOf[LshBuckets], 5) { c =>
      LshBuckets(c(0),
        lit[Number](c(1), "nBits").intValue(),
        lit[Number](c(2), "dim").intValue(),
        lit[Number](c(3), "tables").intValue(),
        lit[Number](c(4), "seed").longValue())
    })

  /** Register into an already-running session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
