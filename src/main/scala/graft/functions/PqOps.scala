package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou, Douze, Schmid, TPAMI'11 —
  * public literature): the memory-bandwidth ANN representation beyond
  * int8. A D-dim vector splits into M subspaces of D/M dims; each
  * subspace is coded as the index of its nearest codebook centroid, so a
  * vector stores in M bytes (16x smaller than float32 at M=8, D=64) and
  * a probe scores a coded vector with M table lookups instead of D
  * multiplies (ADC — asymmetric distance computation).
  *
  * All expressions carry the codebooks as ONE flattened double[] codegen
  * reference object (the MatVec lesson: per-centroid expression trees
  * blow the 64 KB method cap; a constant-shape loop over a reference
  * array keeps the scan side inside whole-stage codegen at any M×K).
  *
  * Codebook layout: cb[(m*K + c)*ds + j] = dim j of centroid c of
  * subspace m, with ds = D/M. Trailing input dims beyond M*ds are
  * ignored by construction (callers pass D divisible by M).
  */
trait PqExpression {
  def m: Int
  def k: Int
  def ds: Int
  def codebooks: Seq[Seq[Seq[Double]]]

  require(m >= 1 && k >= 2 && k <= 256 && ds >= 1,
    s"invalid PQ shape m=$m k=$k ds=$ds (k must fit one byte)")
  require(codebooks.length == m && codebooks.forall(_.length == k)
    && codebooks.forall(_.forall(_.length == ds)),
    "codebooks must be m x k x ds")

  @transient protected lazy val cb: Array[Double] = {
    val out = new Array[Double](m * k * ds)
    var i = 0
    for (sub <- codebooks; cent <- sub; v <- cent) { out(i) = v; i += 1 }
    out
  }
}

/** PQ code of a float/double vector: M bytes, byte m = index of the
  * L2-nearest centroid of subspace m (first-min tie-break). */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]],
                    m: Int, k: Int, ds: Int)
    extends UnaryExpression with PqExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def get(v: ArrayData, i: Int): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        while (j < ds) {
          val idx = sub * ds + j
          val x = if (idx < n) get(v, idx) else 0.0
          val diff = x - cb((sub * k + c) * ds + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    val acc = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val sub = ctx.freshName("sub"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val j = ctx.freshName("j")
      val idx = ctx.freshName("idx"); val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      s"""
         |final int $n = $v.numElements();
         |final byte[] $out = new byte[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $ds; $j++) {
         |      final int $idx = $sub * $ds + $j;
         |      final double $x = ($idx < $n) ? (double) $v.$acc($idx) : 0.0;
         |      final double $diff = $x - $cbRef[($sub * $k + $c) * $ds + $j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$sub] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (m, k, ds) = (codebooks.length, codebooks.head.length, codebooks.head.head.length)
    GraftShim.column(PqEncode(GraftShim.expression(vec), codebooks, m, k, ds))
  }
}

/** Per-probe ADC lookup table: array<double> of length M*K with
  * lut[m*K + c] = dot(probe subvector m, centroid c of subspace m).
  * Computed ONCE per probe; every (probe, code) pair then scores with M
  * lookups ([[PqAdc]]) instead of D multiplies. */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]],
                 m: Int, k: Int, ds: Int)
    extends UnaryExpression with PqExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut needs array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def get(v: ArrayData, i: Int): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](m * k)
    var sub = 0
    while (sub < m) {
      var c = 0
      while (c < k) {
        var dot = 0.0
        var j = 0
        while (j < ds) {
          val idx = sub * ds + j
          val x = if (idx < n) get(v, idx) else 0.0
          dot += x * cb((sub * k + c) * ds + j)
          j += 1
        }
        out(sub * k + c) = dot
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    val acc = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val sub = ctx.freshName("sub"); val c = ctx.freshName("c")
      val dot = ctx.freshName("dot"); val j = ctx.freshName("j")
      val idx = ctx.freshName("idx"); val x = ctx.freshName("x")
      s"""
         |final int $n = $v.numElements();
         |final double[] $out = new double[${m * k}];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $ds; $j++) {
         |      final int $idx = $sub * $ds + $j;
         |      final double $x = ($idx < $n) ? (double) $v.$acc($idx) : 0.0;
         |      $dot += $x * $cbRef[($sub * $k + $c) * $ds + $j];
         |    }
         |    $out[$sub * $k + $c] = $dot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  def apply(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (m, k, ds) = (codebooks.length, codebooks.head.length, codebooks.head.head.length)
    GraftShim.column(PqLut(GraftShim.expression(vec), codebooks, m, k, ds))
  }
}

/** ADC score: sum over subspaces of lut[m*K + code_m] ≈ dot(probe, x).
  * The per-pair hot loop — M array lookups, zero multiplies. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[Array[Byte]]
    var s = 0.0
    var sub = 0
    while (sub < codes.length) {
      s += lut.getDouble(sub * k + (codes(sub) & 0xFF))
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val s = ctx.freshName("s"); val sub = ctx.freshName("sub")
      s"""
         |double $s = 0.0;
         |for (int $sub = 0; $sub < $codes.length; $sub++) {
         |  $s += $lut.getDouble($sub * $k + ($codes[$sub] & 0xFF));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(lut: Column, codes: Column, k: Int): Column =
    GraftShim.column(PqAdc(GraftShim.expression(lut), GraftShim.expression(codes), k))
}

/** Squared norm of the RECONSTRUCTED vector from its PQ code:
  * |x~|^2 = sum_m |centroid_{m, code_m}|^2 (subspaces are orthogonal
  * coordinate blocks). Computed once per coded row; the cosine
  * denominator of the ADC score. Centroid norms precompute driver-side. */
case class PqReconNormSq(child: Expression, codebooks: Seq[Seq[Seq[Double]]],
                         m: Int, k: Int, ds: Int)
    extends UnaryExpression with PqExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_recon_norm_sq"

  @transient private lazy val centNormSq: Array[Double] = {
    val out = new Array[Double](m * k)
    var i = 0
    while (i < m * k) {
      var s = 0.0
      var j = 0
      while (j < ds) { val x = cb(i * ds + j); s += x * x; j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  override protected def nullSafeEval(codesAny: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    var s = 0.0
    var sub = 0
    while (sub < codes.length && sub < m) {
      s += centNormSq(sub * k + (codes(sub) & 0xFF))
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val normsRef = ctx.addReferenceObj("pqCentNormSq", centNormSq, "double[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val s = ctx.freshName("s"); val sub = ctx.freshName("sub")
      val lim = ctx.freshName("lim")
      s"""
         |double $s = 0.0;
         |final int $lim = Math.min($codes.length, $m);
         |for (int $sub = 0; $sub < $lim; $sub++) {
         |  $s += $normsRef[$sub * $k + ($codes[$sub] & 0xFF)];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconNormSq =
    copy(child = newChild)
}

object PqReconNormSq {
  def apply(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val (m, k, ds) = (codebooks.length, codebooks.head.length, codebooks.head.head.length)
    GraftShim.column(PqReconNormSq(GraftShim.expression(codes), codebooks, m, k, ds))
  }
}
