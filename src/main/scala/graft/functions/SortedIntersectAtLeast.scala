package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** |x ∩ y| >= min as a short-circuiting predicate over two SORTED
  * array<long> columns — the threshold form of [[SortedIntersectSize]].
  *
  * Where only the PREDICATE is needed (connected-component edges, any
  * "similar enough?" gate), computing the exact intersection wastes the
  * tail of every merge: the loop here exits TRUE the moment the count
  * reaches the bound and FALSE the moment the remaining shorter side
  * cannot close the gap (count + min(remaining) < min). On threshold-0.8
  * verification most pairs resolve in a fraction of the full merge —
  * accepted pairs after ~overlap·t elements, rejected pairs as soon as
  * the mismatch run is long enough — with bit-identical accept/reject
  * decisions to the exact count (VerifySpec holds the equivalence).
  *
  * Inputs MUST be sorted ascending and duplicate-free, as with
  * [[SortedIntersectSize]]. Nulls propagate.
  */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
                                  third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_intersect_at_least"

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val min = m.asInstanceOf[Int]
    val (xn, yn) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    var res = c >= min // min <= 0 is vacuously true
    var done = res
    while (!done && i < xn && j < yn) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
      if (c >= min) { res = true; done = true }
      else if (c + math.min(xn - i, yn - j) < min) { res = false; done = true }
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val rem = ctx.freshName("rem")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $xn = $a.numElements(), $yn = $b.numElements();
         |${ev.value} = 0 >= $m;
         |while (!${ev.value} && $i < $xn && $j < $yn) {
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; }
         |  else { $j++; }
         |  if ($c >= $m) { ${ev.value} = true; break; }
         |  final int $rem = ($xn - $i < $yn - $j) ? ($xn - $i) : ($yn - $j);
         |  if ($c + $rem < $m) { break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectAtLeast {
  /** Column API: |a ∩ b| >= min for sorted, distinct array<long> columns. */
  def apply(a: Column, b: Column, min: Column): Column =
    GraftShim.column(SortedIntersectAtLeast(
      GraftShim.expression(a), GraftShim.expression(b),
      GraftShim.expression(min)))
}
