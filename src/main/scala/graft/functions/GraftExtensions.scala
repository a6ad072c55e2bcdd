package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: installs graft's native functions
  * into a session at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * This is the production registration path (survives to every session
  * derived from the builder, works via config on spark-submit);
  * NativeFunctions.register is the imperative per-session fallback the
  * query functions use so they are self-contained under the driver
  * harness, which builds its own plain session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "array_dot takes exactly 2 arguments")
        ArrayDotProduct(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("adc_distance"),
      new ExpressionInfo(classOf[ArrayAdcDistance].getName, "adc_distance"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "adc_distance takes exactly 2 arguments")
        ArrayAdcDistance(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("collect_bounded"),
      new ExpressionInfo(classOf[BoundedCollect].getName, "collect_bounded"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "collect_bounded takes exactly 2 arguments")
        BoundedCollect(exprs.head, exprs(1)).toAggregateExpression()
      }))
    // whole-operator custom plan (graft.plans.AsOfJoin): planner strategy
    // + probe-side predicate pushdown rule
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectOptimizerRule(_ =>
      graft.plans.PushFilterThroughAsOfJoin)
  }
}
