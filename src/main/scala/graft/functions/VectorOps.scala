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
}
