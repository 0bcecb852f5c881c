package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Matrix-versus-vector expressions fused into ONE codegen loop, for the
  * ANN paths that score a row vector against a small driver-side constant
  * matrix (LSH hyperplanes, IVF centroids).
  *
  * Why fused (VERDICT r3 item 1): building these as per-row folds of
  * `VecDot(vec, typedLit(row_i))` inlines one expression tree per matrix
  * row into the generated `doConsume` — 48 trees for 8 LSH tables × 6 bits
  * — which blows the JVM's 64 KB method-bytecode cap ("Code grows beyond
  * 64 KB") and silently drops the whole stage to interpreted evaluation.
  * Here the matrix is a single `double[][]` reference object and the
  * generated code is a fixed three-deep loop: method size is constant in
  * the matrix shape, so bucket assignment — the per-row hot loop of the
  * 100 TB scan side — stays inside whole-stage codegen (gated by
  * PlanSpec's codegen-fallback=false test).
  *
  * Arithmetic is identical to the fold it replaces: dot products
  * accumulate (double)v_i * m_ij in index order (VecDot semantics), row
  * norms are precomputed driver-side with the same sequential loop, and
  * cosine = dot / (|v| * |row|) — bit-reproducible against the previous
  * formulation and the DuckDB oracle's list_aggregate.
  */
abstract class MatVecExpression extends UnaryExpression {

  /** The constant matrix, one row per scored hyperplane/centroid. */
  def rows: Seq[Seq[Double]]

  @transient protected lazy val mat: Array[Array[Double]] =
    rows.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> input, got ${other.catalogString}")
  }

  @transient protected lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def evGet(a: ArrayData, i: Int): Double =
    if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java element accessor for codegen. */
  protected def cgGet(arr: String, idx: String): String =
    if (childIsFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
}

/** All LSH table buckets of a vector in one pass: `planes` holds
  * `tables × bits` hyperplanes (table-major); output element t is the
  * `bits`-bit sign-random-projection bucket of table t
  * (bit i = [dot(vec, planes(t*bits+i)) >= 0]). */
case class LshBuckets(child: Expression, planes: Seq[Seq[Double]], bits: Int)
    extends MatVecExpression {
  require(bits > 0 && planes.nonEmpty && planes.size % bits == 0,
    s"planes (${planes.size}) must be a whole number of $bits-bit tables")

  override def rows: Seq[Seq[Double]] = planes
  private def tables: Int = planes.size / bits
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var b = 0
      var i = 0
      while (i < bits) {
        val p = mat(t * bits + i)
        val m = math.min(n, p.length)
        var dot = 0.0
        var j = 0
        while (j < m) { dot += evGet(v, j) * p(j); j += 1 }
        if (dot >= 0) b |= (1 << i)
        i += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", mat, "double[][]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $v.numElements();
         |final int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $b = 0;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    final double[] $p = $planesRef[$t * $bits + $i];
         |    final int $m = Math.min($n, $p.length);
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      $dot += ${cgGet(v, j)} * $p[$j];
         |    }
         |    if ($dot >= 0) $b |= (1 << $i);
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def apply(vec: Column, planes: Seq[Seq[Double]], bits: Int): Column =
    GraftShim.column(LshBuckets(GraftShim.expression(vec), planes, bits))
}

/** Shared scoring loop for the cosine-vs-matrix expressions: |v| computed
  * ONCE per row, row norms precomputed driver-side. */
abstract class CosineMatExpression extends MatVecExpression {
  @transient protected lazy val rowNorms: Array[Double] = mat.map { r =>
    var s = 0.0; var i = 0
    while (i < r.length) { s += r(i) * r(i); i += 1 }
    math.sqrt(s)
  }

  protected def scoresOf(v: ArrayData): Array[Double] = {
    val n = v.numElements()
    var vv = 0.0
    var j = 0
    while (j < n) { val x = evGet(v, j); vv += x * x; j += 1 }
    val vn = math.sqrt(vv)
    val out = new Array[Double](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      val m = math.min(n, row.length)
      var dot = 0.0
      j = 0
      while (j < m) { dot += evGet(v, j) * row(j); j += 1 }
      out(r) = dot / (vn * rowNorms(r))
      r += 1
    }
    out
  }

  /** Emits Java filling `double[] scoresVar` with the cosine scores. */
  protected def cgScores(ctx: CodegenContext, v: String, scoresVar: String): String = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    val normsRef = ctx.addReferenceObj("rowNorms", rowNorms, "double[]")
    val n = ctx.freshName("n"); val vv = ctx.freshName("vv")
    val vn = ctx.freshName("vn"); val x = ctx.freshName("x")
    val r = ctx.freshName("r"); val row = ctx.freshName("row")
    val m = ctx.freshName("m"); val dot = ctx.freshName("dot")
    val j = ctx.freshName("j")
    s"""
       |final int $n = $v.numElements();
       |double $vv = 0.0;
       |for (int $j = 0; $j < $n; $j++) {
       |  final double $x = ${cgGet(v, j)};
       |  $vv += $x * $x;
       |}
       |final double $vn = Math.sqrt($vv);
       |final double[] $scoresVar = new double[${mat.length}];
       |for (int $r = 0; $r < ${mat.length}; $r++) {
       |  final double[] $row = $matRef[$r];
       |  final int $m = Math.min($n, $row.length);
       |  double $dot = 0.0;
       |  for (int $j = 0; $j < $m; $j++) {
       |    $dot += ${cgGet(v, j)} * $row[$j];
       |  }
       |  $scoresVar[$r] = $dot / ($vn * $normsRef[$r]);
       |}
     """.stripMargin
  }
}

/** Cosine similarity of a vector against every matrix row:
  * `array<double>` of length `rows.size` (element r = cos(vec, row_r)). */
case class CosineScores(child: Expression, rows: Seq[Seq[Double]])
    extends CosineMatExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cosine_scores"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(scoresOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val scores = ctx.freshName("scores")
      s"""
         |${cgScores(ctx, v, scores)}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($scores);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CosineScores =
    copy(child = newChild)
}

object CosineScores {
  def apply(vec: Column, rows: Seq[Seq[Double]]): Column =
    GraftShim.column(CosineScores(GraftShim.expression(vec), rows))
}

/** Index (0-based) of the max-cosine matrix row for a vector; first row
  * wins ties — same first-max semantics as
  * `array_position(scores, array_max(scores)) - 1` it replaces. */
case class NearestCentroid(child: Expression, rows: Seq[Seq[Double]])
    extends CosineMatExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val scores = scoresOf(input.asInstanceOf[ArrayData])
    var best = 0
    var bestScore = Double.NegativeInfinity
    var r = 0
    while (r < scores.length) {
      if (scores(r) > bestScore) { bestScore = scores(r); best = r }
      r += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val scores = ctx.freshName("scores")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      val r = ctx.freshName("r")
      s"""
         |${cgScores(ctx, v, scores)}
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |for (int $r = 0; $r < $scores.length; $r++) {
         |  if ($scores[$r] > $bestScore) { $bestScore = $scores[$r]; $best = $r; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, rows: Seq[Seq[Double]]): Column =
    GraftShim.column(NearestCentroid(GraftShim.expression(vec), rows))
}

/** Squared Euclidean distance of a vector against every matrix row:
  * `array<double>` of length `rows.size` (element r = |vec - row_r|²) —
  * the Euclidean counterpart of [[CosineScores]] for the k-means /
  * diversity-selection paths. Same fused-loop rationale: one
  * `double[][]` reference object, constant generated-code size in the
  * matrix shape, so the per-row assignment loop stays in whole-stage
  * codegen at any k. Accumulation is index-ordered (d += (v_j - m_rj)²),
  * bit-reproducible across eval and codegen modes. */
case class SqDistances(child: Expression, rows: Seq[Seq[Double]])
    extends MatVecExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_distances"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      val m = math.min(n, row.length)
      var d = 0.0
      var j = 0
      while (j < m) { val x = evGet(v, j) - row(j); d += x * x; j += 1 }
      out(r) = d
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val r = ctx.freshName("r"); val row = ctx.freshName("row")
      val m = ctx.freshName("m"); val d = ctx.freshName("d")
      val j = ctx.freshName("j"); val x = ctx.freshName("x")
      s"""
         |final int $n = $v.numElements();
         |final double[] $out = new double[${mat.length}];
         |for (int $r = 0; $r < ${mat.length}; $r++) {
         |  final double[] $row = $matRef[$r];
         |  final int $m = Math.min($n, $row.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    final double $x = ${cgGet(v, j)} - $row[$j];
         |    $d += $x * $x;
         |  }
         |  $out[$r] = $d;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SqDistances =
    copy(child = newChild)
}

object SqDistances {
  def apply(vec: Column, rows: Seq[Seq[Double]]): Column =
    GraftShim.column(SqDistances(GraftShim.expression(vec), rows))
}
