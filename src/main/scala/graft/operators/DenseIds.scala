package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global dense-id assignment (1..N by a total order) without
  * the single-partition window `row_number() OVER (ORDER BY ...)` plans
  * to — the classic scale-killer: every row funnels through one task.
  *
  * Two-phase instead, the zipWithIndex shape kept fully declarative:
  *   1. `repartitionByRange` on the order keys — partition i holds keys
  *      strictly before partition i+1's in the requested order, so a
  *      LOCAL rank plus the count of rows in earlier partitions IS the
  *      global rank.
  *   2. `row_number` windowed by `spark_partition_id()` (distributed —
  *      one window partition per range partition, never one global one),
  *      per-partition counts (a ~numPartitions-row aggregate), offsets
  *      via a broadcast triangular self-join, broadcast-joined back.
  *
  * No collect, no driver loop, no `Exchange SinglePartition` anywhere in
  * the plan (PlanSpec gates this). The order keys must be a total order
  * (no ties) for the assignment to be deterministic — callers pass a
  * tie-breaking final column, same contract as `row_number` itself.
  */
object DenseIds {

  /** Adds `idCol` (LongType, 1-based, dense) ordered by `order`. */
  def withDenseId(df: DataFrame, order: Seq[Column], idCol: String): DataFrame = {
    val local = df
      .repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrk", row_number()
        .over(Window.partitionBy(col("_pid")).orderBy(order: _*))
        .cast("long"))
    // per-range-partition row counts: numPartitions rows, cheap
    val parts = local.groupBy(col("_pid")).agg(count(lit(1)).as("_pn"))
    // offset(p) = total rows in partitions before p (triangular join over
    // a tiny table, both sides broadcast-sized)
    val offs = parts
      .join(broadcast(parts.select(col("_pid").as("_qid"), col("_pn").as("_qn"))),
        col("_qid") < col("_pid"), "left")
      .groupBy(col("_pid"))
      .agg(coalesce(sum(col("_qn")), lit(0L)).as("_off"))
    local.join(broadcast(offs), Seq("_pid"))
      .withColumn(idCol, col("_lrk") + col("_off"))
      .drop("_pid", "_lrk", "_off")
  }
}
