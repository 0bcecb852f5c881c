package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Relational, RtbfE2e, S4Dataflow, Scans, TextPipeline, Vectors}
import graft.multimodal.Multimodal

/** Driver contract (SURVEY.md §7).
  *
  * `queries` is the full operator surface, one named entry per implemented
  * operator from SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent
  * ANSI SQL for every oracle-comparable entry (engine-only operators —
  * LSH, SimHash, approx sketches — are verified by ScalaTest instead and
  * get a rows-only check from the driver).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the S4 flush-window semantics — R7/R8 timed flush re-expressed as a
    * tumbling event-time window (SURVEY.md §7 "minimum slice"). */
  def entry(spark: SparkSession): DataFrame =
    S4Dataflow.flushWindow(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ S4Dataflow.queries ++ TextPipeline.queries ++
      Vectors.queries ++ Multimodal.queries ++ Scans.queries ++
      RtbfE2e.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ S4Dataflow.oracles ++ TextPipeline.oracles ++
      Vectors.oracles ++ Multimodal.oracles ++ Scans.oracles ++
      RtbfE2e.oracles
}
