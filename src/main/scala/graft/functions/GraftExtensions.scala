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
    // Spark's native runtime-bloom pair (SPARK-32268), not SQL-registered
    // in 4.1 — mirrored from NativeFunctions.register (round 21)
    extensions.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "bloom_filter_agg"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 3,
          "bloom_filter_agg takes (value, estimatedNumItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
          .toAggregateExpression()
      }))
    extensions.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "might_contain"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "might_contain takes exactly 2 arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      }))
    // whole-operator custom plan (graft.plans.AsOfJoin): planner strategy
    // + probe-side predicate pushdown rule
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectOptimizerRule(_ =>
      graft.plans.PushFilterThroughAsOfJoin)
  }
}
