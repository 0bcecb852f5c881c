package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric array columns, accumulated in DOUBLE in
  * index order — a single fused codegen loop.
  *
  * Why a custom Catalyst Expression (SURVEY §7's "only on measured need"
  * bar): the HOF formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * CodegenFallback — every element round-trips through interpreted lambda
  * evaluation, and it dominated the sf0.1 vector bench
  * (vec_cosine_near_dups 35s, vec_brute_topk 14s — the same
  * interpreted-HOF lesson already measured 25× on MinHashSig). This loop
  * does the identical arithmetic ((double)a_i * (double)b_i added in
  * index order, so results are bit-identical to the HOF and to the DuckDB
  * oracle's list_aggregate) inside whole-stage codegen.
  *
  * Accepts array<float> or array<double> on either side independently
  * (corpus embeddings are float; LSH hyperplanes are double literals).
  * Extra elements of the longer array are ignored — same truncation
  * semantics as `zip_with`-then-multiply where one side runs out (null
  * products are dropped by the sum). In practice callers pass equal-dim
  * vectors. Nulls propagate (BinaryExpression null-intolerance).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (xf, yf) = (isFloat(left.dataType), isFloat(right.dataType))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, dt: DataType, idx: String) =
        if (isFloat(dt)) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left.dataType, i)} * ${get(b, right.dataType, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column API: sum_i a_i*b_i in double, index order. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))
}
