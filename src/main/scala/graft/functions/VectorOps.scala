package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the fused
  * codegen [[VecDot]] expression (SURVEY.md §2b "cosine / dot similarity").
  *
  * Round 2 shipped these as `zip_with`/`aggregate` higher-order functions
  * on the assumption they were codegen'd; they are CodegenFallback
  * (interpreted per element) and dominated the sf0.1 vector bench. VecDot
  * does the identical arithmetic — (double)a_i * (double)b_i accumulated
  * in index order, bit-reproducible against the DuckDB oracle's
  * list_aggregate — inside whole-stage codegen.
  */
object VectorOps {

  /** Dot product: sum(a_i * b_i) in double, sequential in list order. */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  /** Squared L2 norm (identical accumulation to dot(v, v)). */
  def normSq(v: Column): Column = VecDot(v, v)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity dot(a,b) / (|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric int8 quantization: q_i = round(x_i / s), s = max|x_i|/127.
    * 1/4 the bytes of float32 — at 100 TB that factor is scan time,
    * shuffle volume, and executor-memory headroom for the ANN candidate
    * stage. HOF evaluation is fine HERE because quantization runs once
    * per vector at ingest/prep, never inside the pairwise hot loop — the
    * hot loop is [[quantizedCosine]]'s fused integer [[VecDotI8]].
    * All-zero vectors quantize to all zeros (scale clamps to 1 to avoid
    * 0/0 under ANSI arithmetic). */
  def quantizeInt8(v: Column): Column = {
    val scale = quantScale(v)
    transform(v, x => round(x.cast("double") / scale).cast("tinyint"))
  }

  /** The quantization scale max|x_i|/127 (store alongside the quantized
    * vector to dequantize; cancels out of cosine). */
  def quantScale(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
  }

  /** Dequantize: x_i ~ q_i * s (max error s/2 per element). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Cosine over int8-quantized vectors: the per-vector scales cancel,
    * so this is qdot(a,b) / sqrt(qdot(a,a)*qdot(b,b)) in exact integer
    * dot products — deterministic at any parallelism. */
  def quantizedCosine(qa: Column, qb: Column): Column =
    VecDotI8(qa, qb).cast("double") /
      sqrt(VecDotI8(qa, qa).cast("double") * VecDotI8(qb, qb).cast("double"))
}
