package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: time logicalRemove's in-lease body at sf1 with
  * GRAFT_REMOVE_DEBUG leg prints (50 random singleton-ish victims —
  * the TakedownIngestProfile shape). */
object LogicalLegProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val base = graft.queries.TextPipeline.ensureClusterIndex(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val victims = docs.orderBy(xxhash64(col("doc_id"))).limit(50).localCheckpoint()
    val scratch = System.getProperty("java.io.tmpdir") + "/graft_legprobe"
    val fs = new org.apache.hadoop.fs.Path(scratch).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(base),
      fs, new org.apache.hadoop.fs.Path(scratch), false, conf)
    val t0 = System.nanoTime()
    graft.operators.ClusterIndex.logicalRemove(victims, "doc_id", "text",
      scratch, tag = "probe")
    println(f"[probe] logicalRemove total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
