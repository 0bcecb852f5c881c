package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the latest right row whose
  * timestamp is <= the left row's timestamp, per key (left-outer
  * semantics — unmatched left rows keep nulls).
  *
  * Reference: absent (SURVEY.md §2b flags it as the one join Spark lacks).
  *
  * Implementation is the union+window trick, NOT a range join:
  * a range join (`l.ts >= r.ts`) explodes to O(|L|·|R|) per key before the
  * `row_number = 1` prune, which dies at scale. Instead we union both
  * sides, sort within each key by (ts, side), and carry the most recent
  * right payload forward with `last(..., ignoreNulls)` over an unbounded
  * preceding frame. Cost: ONE shuffle on the key + a per-partition sort —
  * the same footprint as any windowed aggregate, linear in |L|+|R|.
  * Skewed keys behave like any window-function skew (AQE does not split
  * window partitions; salt upstream if one key dominates).
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (quote/state) side
    * @param key        equality key column name (present on both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightVals  right columns to attach (emitted as `asof_<name>`)
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right rows sort BEFORE left rows at equal ts (_side 0 < 1), so a
    // right row with ts == left.ts is visible to that left row (>= match).
    val r = right.select(
      (col(key) +: col(rightTs).as("_ts") +:
        struct(rightVals.map(col): _*).as("_rv") +: Nil): _*)
      .withColumn("_side", lit(0))
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_rv", lit(null).cast(r.schema("_rv").dataType))
      .withColumn("_side", lit(1))
      .select((col(key) +: col("_ts") +: col("_rv") +: col("_side") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"_match.$v").as(s"asof_$v")): _*)
  }

  /** Convenience: as-of join where the attached column is the right ts. */
  def asofTs(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String): DataFrame =
    asof(left, right, key, leftTs, rightTs, Seq(rightTs))
}
