package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the write-time layout behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, built here from plain Catalyst bit ops (shift /
  * and / or fold — fully codegen'd, no custom expression needed).
  *
  * Why it matters at 100 TB: min/max file and row-group statistics prune
  * scans only when the data is CLUSTERED on the filtered column. A sort
  * on one column gives perfect pruning for that column and none for any
  * other; interleaving the bits of two (or more) columns gives every
  * interleaved column locality ~n^(1/k), so box predicates on ANY of
  * them skip most files. ZOrderSpec demonstrates it end to end: the same
  * predicate reads a fraction of the z-ordered files but nearly all of
  * the linearly-sorted ones.
  *
  * Values are range-scaled to 16-bit grid cells from one bounded min/max
  * aggregate (one row to the driver, never data). Scaling is monotonic
  * per column, so range predicates map to grid boxes; ties inside a grid
  * cell only cost pruning precision, never correctness — the layout
  * changes WHERE rows sit, not WHAT any query returns.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so consecutive bits land 2 apart
    * (0b...dcba -> 0b...0d0c0b0a) — the classic Morton magic-mask fold. */
  private def spread16(x: Column): Column = {
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit grid coordinates into a 32-bit
    * z-value (a gets the even bits, b the odd). */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Monotonic scale of `c` from [min, max] onto the 16-bit grid. */
  def gridCell(c: Column, min: Double, max: Double): Column = {
    val span = if (max > min) max - min else 1.0
    least(greatest(
      floor((c.cast("double") - lit(min)) / lit(span) * 65535.0).cast("long"),
      lit(0L)), lit(65535L))
  }

  /** Re-layout `df` into `numFiles` z-ordered ranges over two columns:
    * one min/max aggregate (bounded, one row), grid-scale both columns,
    * range-partition + locally sort by the z-value. Write the result
    * with one file per partition and min/max stats do the rest. */
  def layoutByZOrder(df: DataFrame, colA: String, colB: String,
                     numFiles: Int): DataFrame = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (r.isNullAt(0)) return df // empty input: nothing to lay out
    val z = zValue(
      gridCell(col(colA), r.getDouble(0), r.getDouble(1)),
      gridCell(col(colB), r.getDouble(2), r.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
