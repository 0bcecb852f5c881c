package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file COMPACTION for partitioned parquet tables — the
  * maintenance job every streaming lake needs. Micro-batch sinks write
  * at least one file per trigger per partition (the reference's
  * five-minute flush alone is ~288 objects/partition/day,
  * `main.go:44-48`); at 100 TB the scan cost of such a table is
  * dominated by per-file open/LIST overhead, not bytes, and object-store
  * LIST charges scale with file count.
  *
  * [[compact]] rewrites the partitions matching `predicate` so each
  * holds at most `filesPerPartition` data files:
  *
  *  1. partition-PRUNED read of only the matching partitions,
  *  2. one shuffle keyed by (partition cols, salt) with
  *     salt = hash(row) % filesPerPartition — deterministic, and every
  *     (partition, salt) group lands in exactly one task, so each
  *     partition dir gets at most `filesPerPartition` files,
  *  3. eager materialization, then dynamic partition OVERWRITE of just
  *     the touched partitions (the upsertStream recipe: the write
  *     replaces the very files it read, so the merged frame must be
  *     checkpointed first).
  *
  * Run it the way production compaction runs: per closed partition (a
  * finished day / a cold bucket) via the predicate, so the materialized
  * slice is one partition's data, never the table. Row content is
  * untouched by construction — the rewrite is a repartition, not a
  * transformation; CompactionSpec holds content equality, the file
  * bound, and that non-matching partitions keep their files. */
object Compaction {

  /** Rewrite partitions matching `predicate` (on partition columns) to
    * at most `filesPerPartition` files each. `predicate` defaults to the
    * whole table — prefer per-partition calls at scale. */
  def compact(spark: SparkSession, tableDir: String, partitionCols: Seq[String],
              filesPerPartition: Int, predicate: Column = lit(true)): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val slice = spark.read.parquet(tableDir).filter(predicate)
    val salt = pmod(hash(slice.columns.map(col).toSeq: _*), lit(filesPerPartition))
    slice
      .withColumn("_salt", salt)
      .repartition(partitionCols.map(col) :+ col("_salt"): _*)
      .drop("_salt")
      .localCheckpoint() // eager: the write overwrites what was read
      .write.partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(tableDir)
  }
}
