package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor (not shipped; run with
  * `sbt "Test/runMain graft.ExplainMain q30_right_outer ..."`): executes
  * each named SparkEntry query at sf0.001 and prints the join/exchange/
  * codegen skeleton of the final adaptive plan. */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q30_right_outer")
    for (q <- names) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => Seq("Join", "Exchange", "WholeStageCodegen", "Scan parquet",
          "PushedFilters", "MapPartitions", "Window", "HashAggregate")
          .exists(l.contains))
        .foreach(l => println(l.take(200)))
    }
    spark.stop()
  }
}
