package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * The pairwise-similarity operators (q_dedup_embed, q_sim_topk, …)
  * evaluate a dot product per candidate PAIR — O(pairs · dim). Spark's
  * higher-order `aggregate(zip_with(...))` expression is interpreted (no
  * whole-stage codegen), which made the 2M-pair q_dedup_embed the bench
  * bottleneck (~100 s at sf0.1). This Expression generates a tight Java
  * loop inside the codegen stage instead (~50× less per-pair overhead)
  * while accumulating IN THE SAME left-to-right order as the interpreted
  * form, so results — and the DuckDB-oracle 6dp hashes — are bit-identical.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // array_dot is registered as a public SQL function, so analysis must
  // reject non-double arrays: ArrayData.getDouble reads 8-byte slots and
  // would silently return garbage on e.g. a raw array<float> embedding
  // column. (ImplicitCastInputTypes would auto-coerce, but its
  // AbstractDataType signature is private[sql] — fail fast instead;
  // callers cast explicitly.)
  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArray(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires (array<double>, array<double>) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}) " +
        "— cast(col as array<double>) first")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions: makes `array_dot(a, b)`
  * and `collect_bounded(id, bound)` resolvable in SQL/expr strings on the
  * given session (idempotent). */
object NativeFunctions {
  def register(spark: SparkSession): Unit = {
    // True idempotence: every query fn calls register, so without a
    // guard each of the ~170 bench invocations logs a "replaced a
    // previously registered function" warning per function — hundreds
    // of lines of tail noise per run (VERDICT r13). The builders are
    // stateless, so an existing registration is always current. Guarded
    // PER FUNCTION (ADVICE r14): keying the whole block off array_dot
    // would leave a registry that somehow holds array_dot but not its
    // siblings permanently missing the rest.
    val reg = spark.sessionState.functionRegistry
    def ensure(name: String)(builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
    ensure("array_dot") { exprs =>
      require(exprs.length == 2, "array_dot takes exactly 2 arguments")
      ArrayDotProduct(exprs.head, exprs(1))
    }
    ensure("adc_distance") { exprs =>
      require(exprs.length == 2, "adc_distance takes exactly 2 arguments")
      ArrayAdcDistance(exprs.head, exprs(1))
    }
    ensure("collect_bounded") { exprs =>
      require(exprs.length == 2,
        "collect_bounded takes exactly 2 arguments")
      BoundedCollect(exprs.head, exprs(1)).toAggregateExpression()
    }
    // Spark's own runtime-bloom-join expression pair (SPARK-32268) —
    // codegen'd probe, the exact representation InjectRuntimeFilter
    // plans — exists in catalyst but is not SQL-registered in 4.1, so
    // expose it here for the explicit bloom pre-filter operators
    // (q_filter_bloom, the incremental-dedup manifest probes). The
    // `ensure` guard means a future Spark that registers these natively
    // simply wins.
    ensure("bloom_filter_agg") { exprs =>
      require(exprs.length == 3,
        "bloom_filter_agg takes (value, estimatedNumItems, numBits)")
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
        .toAggregateExpression()
    }
    ensure("might_contain") { exprs =>
      require(exprs.length == 2,
        "might_contain takes exactly 2 arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs.head, exprs(1))
    }
  }
}
