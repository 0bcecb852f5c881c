package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop single-query runner: time one named SparkEntry query (or a
  * comma list) under the same session config as Bench, without paying
  * for the other ~95. `runMain graft.RunQuery <sfDir> <name[,name...]>
  * [--explain]`. Each query runs twice; the second (warm) time is the
  * comparable number. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // NOTE: driver memory cannot be set here — the JVM is already
      // running by the time the builder executes. Pass it at launch
      // (e.g. sbt -J-Xmx8g or .jvmopts) if a query needs more heap.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[runquery] $name run$i rows=$n $s%.3f s")
      }
    }
    spark.stop()
  }
}
