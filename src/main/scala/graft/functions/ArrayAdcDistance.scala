package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd ADC (asymmetric distance computation) lookup-sum:
  * `adc_distance(codes, lut)` = Σ_i lut[i·C + codes[i]], with
  * C = lut.length / codes.length (the per-subspace centroid count —
  * derived, so the expression is parameter-free for any PQ geometry).
  *
  * This is the per-CANDIDATE hot loop of the PQ similarity tier
  * (q_sim_pq / q_sim_ivfpq / q_sim_index_persist / _update): every
  * probed code row costs one ADC evaluation against the query's lookup
  * table. As a Scala UDF each evaluation paid a catalyst→Scala
  * conversion of both arrays (two Seq allocations + boxing per row);
  * this Expression reads the unsafe array buffers in place inside
  * whole-stage codegen. Accumulation is left-to-right over subspaces in
  * the SAME order as the UDF it replaces, so distances — and the pinned
  * ApproxSpec equalities — are bit-identical.
  *
  * Caller contract (matches the PQ encoder by construction): every code
  * must lie in [0, C) and lut.length must be an exact multiple of
  * codes.length. Because adc_distance is also registered as a
  * user-callable SQL function, both eval paths GUARD the contract
  * (ADVICE r13): a non-multiple lut length or an out-of-range code
  * raises IllegalArgumentException instead of reading arbitrary
  * unsafe-buffer memory. Internal PQ callers satisfy the contract by
  * construction, so the per-code branch predicts true and stays out of
  * the hot path's way.
  */
case class ArrayAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def is(dt: DataType, elem: DataType): Boolean = dt match {
      case ArrayType(e, _) => e == elem
      case _ => false
    }
    if (is(left.dataType, IntegerType) && is(right.dataType, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"adc_distance requires (array<int>, array<double>) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "adc_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val nSub = codes.numElements()
    if (nSub == 0) 0.0
    else {
      if (lut.numElements() % nSub != 0) throw new IllegalArgumentException(
        s"adc_distance: lut length ${lut.numElements()} is not a " +
          s"multiple of codes length $nSub")
      val nCent = lut.numElements() / nSub
      var acc = 0.0
      var i = 0
      while (i < nSub) {
        val c = codes.getInt(i)
        if (c < 0 || c >= nCent) throw new IllegalArgumentException(
          s"adc_distance: code $c at position $i out of range [0, $nCent)")
        acc += lut.getDouble(i * nCent + c); i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nSub = ctx.freshName("nSub")
      val nCent = ctx.freshName("nCent")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      s"""
         |int $nSub = $a.numElements();
         |double $acc = 0.0;
         |if ($nSub > 0) {
         |  if ($b.numElements() % $nSub != 0) {
         |    throw new IllegalArgumentException(
         |      "adc_distance: lut length " + $b.numElements() +
         |      " is not a multiple of codes length " + $nSub);
         |  }
         |  int $nCent = $b.numElements() / $nSub;
         |  for (int $i = 0; $i < $nSub; $i++) {
         |    int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $nCent) {
         |      throw new IllegalArgumentException(
         |        "adc_distance: code " + $c + " at position " + $i +
         |        " out of range [0, " + $nCent + ")");
         |    }
         |    $acc += $b.getDouble($i * $nCent + $c);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayAdcDistance =
    copy(left = newLeft, right = newRight)
}
