package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions so plain `spark.sql` users get them too.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or programmatically `new GraftExtensions().apply(extensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
    // W1 repair: window-aggregate + distinct → aggregation, when provably
    // equivalent (see the rule's scaladoc for the exact conditions)
    ext.injectOptimizerRule(_ => graft.rules.WindowDistinctToAggregate)
  }
}

object GraftExtensions {
  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot_product(a, b) takes two arguments")
      DotProduct(children.head, children(1))
    })

  /** Register into an already-running session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = dotProductDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
