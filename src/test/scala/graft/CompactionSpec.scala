package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction must be a pure LAYOUT change: same rows, bounded file
  * count in the compacted partitions, untouched files elsewhere. */
class CompactionSpec extends SparkSpec {

  private def filesByPartition(dir: String): Map[String, Long] =
    spark.read.parquet(dir)
      .select(col("event_type"), input_file_name().as("f"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("f")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("compacted partitions hit the file bound; rows and other partitions untouched") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // stage a deliberately fragmented table: 8 writer tasks per partition
    val src = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
    src.repartition(8).write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val before = filesByPartition(dir)
    assert(before.values.forall(_ > 2), s"stage should fragment: $before")
    val rowsBefore = spark.read.parquet(dir)
      .collect().map(_.toSeq).toSet

    Compaction.compact(spark, dir, Seq("event_type"), filesPerPartition = 2,
      predicate = col("event_type").isin("click", "view"))

    val after = filesByPartition(dir)
    assert(after("click") <= 2 && after("view") <= 2,
      s"compacted partitions must respect the bound: $after")
    for (t <- before.keys if t != "click" && t != "view")
      assert(after(t) == before(t), s"$t was not compacted but changed: $before -> $after")
    val rowsAfter = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(rowsAfter == rowsBefore, "compaction must not change content")
  }

  test("compaction is idempotent (re-running changes nothing further)") {
    val dir = java.nio.file.Files.createTempDirectory("compact2").toString
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .repartition(8).write.mode("overwrite").partitionBy("event_type").parquet(dir)
    Compaction.compact(spark, dir, Seq("event_type"), filesPerPartition = 1)
    val once = filesByPartition(dir)
    val rowsOnce = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(once.values.forall(_ == 1), s"nFiles=1 must fully coalesce each partition: $once")
    Compaction.compact(spark, dir, Seq("event_type"), filesPerPartition = 1)
    assert(filesByPartition(dir) == once)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == rowsOnce)
  }
}
