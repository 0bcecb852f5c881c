package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, so the whole expression stays inside whole-stage codegen
  * (SURVEY.md §2b "cosine / dot similarity").
  *
  * Everything is computed in DOUBLE after an explicit array cast: float
  * accumulation would drift from the DuckDB oracle; double accumulation in
  * list order is bit-reproducible across engines.
  */
object VectorOps {

  /** Cast an array<float> column to array<double> for stable accumulation. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: sum(a_i * b_i), sequential in list order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (s, v) => s + v)

  /** Squared L2 norm. */
  def normSq(v: Column): Column =
    aggregate(transform(asDouble(v), x => x * x), lit(0.0), (s, x) => s + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity dot(a,b) / (|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
