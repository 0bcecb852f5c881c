package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character histogram over a FIXED ASCII alphabet, packed
  * into a binary column (one unsigned byte per alphabet slot, clamped at
  * 255). The pack runs once per document; [[BagDistanceLB]] then prunes
  * candidate pairs with a zero-allocation byte loop — the pair-side cost
  * a HOF formulation (zip_with + aggregate over int arrays) pays in
  * per-pair array allocations, measured 1.6x SLOWER than no filter at
  * all on the sf0.1 edit-distance join.
  *
  * Chars outside the alphabet (including all multi-byte UTF-8, whose
  * continuation bytes have the high bit set) are simply not counted;
  * that only WEAKENS the [[BagDistanceLB]] bound, never over-prunes.
  */
case class CharHistogram(child: Expression, alphabet: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(alphabet.nonEmpty && alphabet.length <= 128 && alphabet.forall(_ < 128),
    "alphabet must be non-empty ASCII, at most 128 chars")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "char_histogram"

  // char -> slot + 1; 0 = not counted
  private lazy val lut: Array[Int] = {
    val t = new Array[Int](128)
    alphabet.zipWithIndex.foreach { case (c, i) => t(c) = i + 1 }
    t
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](alphabet.length)
    var k = 0
    while (k < bytes.length) {
      val b = bytes(k)
      if (b >= 0) { // ASCII byte; multi-byte UTF-8 units are negative
        val slot = lut(b)
        if (slot != 0 && (out(slot - 1) & 0xFF) < 255)
          out(slot - 1) = (out(slot - 1) + 1).toByte
      }
      k += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("charHistLut", lut, "int[]")
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      val slot = ctx.freshName("slot")
      s"""
         |byte[] $bytes = $c.getBytes();
         |byte[] $out = new byte[${alphabet.length}];
         |for (int $k = 0; $k < $bytes.length; $k++) {
         |  byte $b = $bytes[$k];
         |  if ($b >= 0) {
         |    int $slot = $lutRef[$b];
         |    if ($slot != 0 && ($out[$slot - 1] & 0xFF) < 255) $out[$slot - 1]++;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharHistogram =
    copy(child = newChild)
}

object CharHistogram {
  def apply(text: Column, alphabet: String): Column =
    GraftShim.column(CharHistogram(GraftShim.expression(text), alphabet))
}

/** Bag-distance lower bound on Levenshtein from two packed
  * [[CharHistogram]] columns: every edit changes at most one counted
  * character occurrence on each side, so
  * levenshtein(a, b) >= max(sum over slots of max(ha-hb, 0),
  *                          sum over slots of max(hb-ha, 0)).
  * Clamped counts and uncounted characters only shrink both sums —
  * the bound stays valid (BagDistanceSpec holds it against a reference
  * Levenshtein on random mutation pairs). Histograms of different
  * lengths treat the missing suffix as zeros. */
case class BagDistanceLB(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bag_distance_lb"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var pos = 0
    var neg = 0
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d > 0) pos += d else neg -= d
      i += 1
    }
    while (i < x.length) { pos += x(i) & 0xFF; i += 1 }
    i = n
    while (i < y.length) { neg += y(i) & 0xFF; i += 1 }
    math.max(pos, neg)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val pos = ctx.freshName("pos")
      val neg = ctx.freshName("neg")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $pos = 0, $neg = 0, $i = 0;
         |for (; $i < $n; $i++) {
         |  int $d = ($a[$i] & 0xFF) - ($b[$i] & 0xFF);
         |  if ($d > 0) $pos += $d; else $neg -= $d;
         |}
         |for (; $i < $a.length; $i++) $pos += $a[$i] & 0xFF;
         |for ($i = $n; $i < $b.length; $i++) $neg += $b[$i] & 0xFF;
         |${ev.value} = java.lang.Math.max($pos, $neg);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BagDistanceLB =
    copy(left = newLeft, right = newRight)
}

object BagDistanceLB {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(BagDistanceLB(GraftShim.expression(a), GraftShim.expression(b)))
}
