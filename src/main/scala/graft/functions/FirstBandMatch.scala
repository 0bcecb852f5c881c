package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** First index i where a[i] == b[i] AND both elements are non-null, for
  * two equal-length array<long> columns; -1 when no position matches.
  *
  * The LSH dedup trick this powers: a candidate pair that collides in k
  * of the b bands surfaces k times from the band-bucket self-join, and
  * round 2 collapsed the duplicates with a global `distinct()` — measured
  * as 10.4s of the 13.5s candidate stage at sf0.1 (21.2M pre-distinct
  * rows for 5.7M pairs). Keeping each side's full band-hash array in the
  * join and filtering `FirstBandMatch(bh1, bh2) === band` emits every
  * pair exactly once BY CONSTRUCTION — the shuffle-wide distinct becomes
  * a per-row codegen'd loop over `bands` longs.
  *
  * Null elements mark MASKED bands — positions the maxBucket valve
  * removed from the candidate join (Dedup.maskedSurvivingBands). A
  * masked position never matches, so the "first matching band" is the
  * first band the pair can actually surface from: a pair whose earliest
  * agreeing band was capped is still emitted once, from its first
  * SURVIVING agreeing band (VERDICT r8 item 9).
  */
case class FirstBandMatch(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_band_match"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |${ev.value} = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstBandMatch =
    copy(left = newLeft, right = newRight)
}

object FirstBandMatch {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(FirstBandMatch(GraftShim.expression(a), GraftShim.expression(b)))
}
