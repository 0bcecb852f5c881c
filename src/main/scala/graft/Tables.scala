package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated fixture tables (TESTDATA.md / FIXTURES.md §B).
  *
  * The reference (findcoo/S4) has no tables at all — its data model is an
  * unbounded byte-record stream (SURVEY.md §1). The query layer of this
  * engine operates on the driver's TPC-H-ish star schema plus
  * events/documents/embeddings.
  *
  * Scale posture: plain parquet scans so Catalyst column pruning and
  * filter pushdown reach the reader (verify via `.explain`: ReadSchema /
  * PushedFilters). Never cache here — at 100 TB the tables don't fit, and
  * every query should prune to the columns/partitions it needs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which vanilla Spark refuses
    * to read ([PARQUET_TYPE_ILLEGAL]). Read the nanos as a plain long
    * (legacy conf) and truncate to microseconds with integer division —
    * exactly what DuckDB does when it loads the same file as its µs
    * TIMESTAMP, so oracle comparisons see identical values. (`div` is
    * integral division; values are post-1970 so truncation == floor.)
    *
    * The `nanosAsLong` conf must be set by the SESSION BUILDER (Verify,
    * Bench, SparkSpec all do) — a loader silently flipping a session-wide
    * legacy flag as a read side effect is a trap in shared sessions
    * (VERDICT r3 item 4), so this one fails loudly instead: the require
    * below names the missing conf rather than letting the opaque parquet
    * error surface. */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): the session must be built with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (see Tables.events scaladoc)")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
