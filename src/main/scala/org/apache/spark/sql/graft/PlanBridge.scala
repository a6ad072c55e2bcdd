package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway a library-level custom operator needs:
  * wrapping a hand-built [[LogicalPlan]] back into a user-facing
  * DataFrame. `classic.Dataset.ofRows` is `private[sql]`, so this bridge
  * lives under `org.apache.spark.sql` — the standard extension idiom used
  * by Spark-native libraries; everything else in graft.plans sticks to
  * public catalyst/execution APIs. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Neutral predicate tree for TxTable's data-skipping layer
    * (graft.sources.TxTable). Spark 4's Column wraps a `private[sql]`
    * ColumnNode tree, so the walk that normalizes it lives here; the
    * skipping evaluator consumes this ADT and never sees sql.internal.
    * Anything beyond attribute-vs-literal comparisons, AND/OR, and IN
    * collapses to [[Opaque]] — the evaluator's keep-the-file default. */
  sealed trait PredNode
  final case class PredAnd(l: PredNode, r: PredNode) extends PredNode
  final case class PredOr(l: PredNode, r: PredNode) extends PredNode
  /** `col op value` with op ∈ =, <, <=, >, >= (already flipped when the
    * literal was on the left). */
  final case class PredCmp(op: String, col: String, value: Any)
      extends PredNode
  final case class PredIn(col: String, values: Seq[Any]) extends PredNode
  case object Opaque extends PredNode

  def predTree(c: org.apache.spark.sql.Column): PredNode = {
    import org.apache.spark.sql.{internal => ci}
    object Attr {
      def unapply(x: ci.ColumnNode): Option[String] = x match {
        case a: ci.UnresolvedAttribute => Some(a.nameParts.last)
        case _ => None
      }
    }
    def flip(op: String): String = op match {
      case "<" => ">"
      case "<=" => ">="
      case ">" => "<"
      case ">=" => "<="
      case other => other
    }
    def walk(x: ci.ColumnNode): PredNode = x match {
      case f: ci.UnresolvedFunction =>
        (f.functionName, f.arguments) match {
          case ("and", Seq(l, r)) => PredAnd(walk(l), walk(r))
          case ("or", Seq(l, r)) => PredOr(walk(l), walk(r))
          case (op @ ("=" | "<" | "<=" | ">" | ">="),
              Seq(Attr(a), l: ci.Literal)) => PredCmp(op, a, l.value)
          case (op @ ("=" | "<" | "<=" | ">" | ">="),
              Seq(l: ci.Literal, Attr(a))) => PredCmp(flip(op), a, l.value)
          case ("in", Attr(a) +: vs)
              if vs.forall(_.isInstanceOf[ci.Literal]) =>
            PredIn(a, vs.map(_.asInstanceOf[ci.Literal].value))
          case _ => Opaque
        }
      case _ => Opaque
    }
    walk(c.node)
  }
}
