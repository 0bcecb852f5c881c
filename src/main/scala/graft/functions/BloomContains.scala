package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `mightContainLong` probe of a pre-built bloom sketch — a fused
  * codegen expression replacing what used to be the repo's last Scala
  * UDF (the contamination pre-filter's per-row boxed call).
  *
  * Why a custom Expression (SURVEY §7's bar): Catalyst's own
  * `BloomFilterMightContain` is not in the public function registry and
  * expects `bloom_filter_agg`'s binary format, not the sketch
  * `DataFrameStatFunctions.bloomFilter` builds — there is no public-API
  * route from a driver-built sketch to a codegen'd probe.
  *
  * The sketch rides as a FOLDABLE binary child (a literal), the same
  * shape Spark's runtime row-level bloom injection uses: the bytes ship
  * inside the stage's task binary (itself a broadcast — one transfer
  * per executor) and deserialize lazily per task instance. That bounds
  * sensible sketch sizes to a few MB — the contamination caller sizes
  * at ~1.2 B/gram with 1% FPP, and the exact semi-join behind the
  * filter re-verifies every surviving row, so capping
  * `expectedNumItems` on huge corpora only raises the pre-filter's
  * pass-through rate, never correctness. Null value rows probe as null
  * (BinaryExpression null-intolerance); a null/empty sketch is a
  * construction-time error, not a row-time one.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a binary sketch, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a FOLDABLE sketch (a literal) — it is " +
          "deserialized once per task, not per row")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName probes long hashes, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval()
    require(bytes != null, s"$prettyName: the sketch literal is null")
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override protected def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the sketch never evaluates per row: the deserialized filter is a
    // codegen reference object, and only the probed value's code runs
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    val v = right.genCode(ctx)
    ev.copy(code =
      code"""
         |${v.code}
         |boolean ${ev.isNull} = ${v.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) { ${ev.value} = $bf.mightContainLong(${v.value}); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Column API: serialize a driver-built sketch into the plan once. */
  def apply(bloom: BloomFilter, value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    GraftShim.column(BloomContains(
      Literal(bos.toByteArray, BinaryType), GraftShim.expression(value)))
  }
}
