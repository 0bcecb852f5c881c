package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** True iff (df, tok) is the FIRST common element of two SORTED,
  * INTERLEAVED (df0, tok0, df1, tok1, ...) array<long> columns
  * (lexicographic (df, tok) element order, distinct elements) — a
  * two-pointer merge over flat longs, zero allocation, inside
  * whole-stage codegen.
  *
  * Powers the distinct-free prefix-filtered set-similarity join: a
  * candidate pair sharing k prefix tokens surfaces k times from the
  * token self-join, and round 2 collapsed the duplicates with a global
  * `distinct()` — 8-10s of the candidate stage at sf0.1 (12.6M
  * pre-distinct rows for 6.1M pairs). Filtering on this predicate keeps
  * each pair only at its earliest shared witness — exactly once by
  * construction. Exactness: the PPJoin positional bound is maximal at
  * the earliest witness (both ranks are minimal there), so if any
  * witness certifies the pair, the earliest one does.
  *
  * Layout note: the elements are (df, tok) pairs flattened into one
  * long array rather than array<struct> because `ArrayData.getStruct`
  * allocates an UnsafeRow wrapper per access — measured at ~4.5s over
  * the 12.6M-row join (≈250M wrappers); `getLong` on a flat long array
  * allocates nothing.
  */
case class IsEarliestWitness(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(first.dataType) && elemOk(second.dataType) &&
        third.dataType == LongType && fourth.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<long> interleaved, array<long> interleaved, " +
        s"long, long), got ${children.map(_.dataType.catalogString).mkString(", ")}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_earliest_witness"

  override protected def nullSafeEval(a: Any, b: Any, dfv: Any, tokv: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xn, yn) = (x.numElements(), y.numElements())
    var i = 0; var j = 0
    while (i < xn && j < yn) {
      var c = java.lang.Long.compare(x.getLong(i), y.getLong(j))
      if (c == 0) c = java.lang.Long.compare(x.getLong(i + 1), y.getLong(j + 1))
      if (c == 0)
        return x.getLong(i) == dfv.asInstanceOf[Long] &&
          x.getLong(i + 1) == tokv.asInstanceOf[Long]
      else if (c < 0) i += 2
      else j += 2
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, dfv, tokv) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
      val c = ctx.freshName("c")
      s"""
         |final int $xn = $a.numElements(), $yn = $b.numElements();
         |int $i = 0, $j = 0;
         |${ev.value} = false;
         |while ($i < $xn && $j < $yn) {
         |  long $c = java.lang.Long.compare($a.getLong($i), $b.getLong($j));
         |  if ($c == 0) $c = java.lang.Long.compare($a.getLong($i + 1), $b.getLong($j + 1));
         |  if ($c == 0) {
         |    ${ev.value} = ($a.getLong($i) == $dfv && $a.getLong($i + 1) == $tokv);
         |    break;
         |  } else if ($c < 0) { $i += 2; } else { $j += 2; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): IsEarliestWitness =
    copy(first = f, second = s, third = t, fourth = q)
}

object IsEarliestWitness {
  /** Column API: is (df, tok) the first common (df, tok) pair of the two
    * sorted interleaved arrays? */
  def apply(a: Column, b: Column, df: Column, tok: Column): Column =
    GraftShim.column(IsEarliestWitness(
      GraftShim.expression(a), GraftShim.expression(b),
      GraftShim.expression(df), GraftShim.expression(tok)))
}
