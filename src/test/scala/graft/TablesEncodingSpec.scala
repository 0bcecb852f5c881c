package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{S4Dataflow, TextPipeline}

/** Regression guard for the fixture `ts` encoding drift (VERDICT r8 item 2).
  *
  * The driver has regenerated `events.parquet` with different physical
  * timestamp encodings across rounds: TIMESTAMP(NANOS) (readable only via
  * `spark.sql.legacy.parquet.nanosAsLong=true`, arriving as BIGINT), then
  * plain `timestamp[us]` with isAdjustedToUTC=false (TIMESTAMP_NTZ). A
  * hard-coded shim for one encoding zeroed 41 queries when the other
  * showed up. This spec writes the SAME tiny events table under every
  * encoding [[Tables.events]] claims to support and proves the loader
  * normalizes all of them to identical TIMESTAMP µs values — and that the
  * two events-only flagship queries (`s4_flush_window`, `ev_asof_join`)
  * return identical rows regardless of the on-disk encoding.
  */
class TablesEncodingSpec extends SparkSpec {

  private def us(dt: LocalDateTime): Long =
    dt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L +
      dt.getNano / 1000L % 1000L

  // six events: two users, signup then purchases, crossing a 5-min boundary
  private val base = LocalDateTime.of(2024, 3, 1, 12, 0, 0)
  private val rows: Seq[(Long, LocalDateTime, Long, String, Double, String)] = Seq(
    (1L, base.plusSeconds(10), 1L, "signup", 0.0, """{"k":"1"}"""),
    (2L, base.plusSeconds(70), 1L, "purchase", 9.5, """{"k":"2"}"""),
    (3L, base.plusSeconds(301), 1L, "purchase", 3.25, "not-json"),
    (4L, base.plusSeconds(20), 2L, "signup", 0.0, """{"k":"3"}"""),
    (5L, base.plusSeconds(400), 2L, "purchase", 7.0, """{"k":"4"}"""),
    (6L, base.plusSeconds(5), 3L, "purchase", 1.0, """{"k":"5"}"""))

  private def schemaWith(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Write the fixture as `<tmp>/events.parquet` with ts in the given
    * encoding; returns the dir Tables expects. */
  private def writeVariant(tsType: DataType): String = {
    val dir = Files.createTempDirectory("graft_enc").toString
    val data = rows.map { case (id, dt, uid, et, v, p) =>
      val ts: Any = tsType match {
        case LongType         => us(dt) * 1000L + 999L // nanos, sub-µs dust to prove truncation
        case TimestampNTZType => dt
        case TimestampType    => Timestamp.from(dt.toInstant(java.time.ZoneOffset.UTC))
      }
      Row(id, ts, uid, et, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schemaWith(tsType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** A GENUINE parquet TIMESTAMP(NANOS) file (VERDICT r9 item 6) — Spark
    * cannot write one, so it is produced with parquet-mr's example API:
    * the exact physical shape the driver's fixture generator shipped in
    * early rounds, not a BIGINT stand-in. Under the suite session's
    * `nanosAsLong=true` it must flow through the LongType branch of
    * [[Tables.events]] end-to-end. */
  private def writeTrueNanos(): String = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val dir = Files.createTempDirectory("graft_enc_nanos").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,true));
        |  required int64 user_id;
        |  required binary event_type (UTF8);
        |  required double value;
        |  required binary props (UTF8);
        |}""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).withConf(conf).build()
    val fac = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, dt, uid, et, v, p) =>
      writer.write(fac.newGroup()
        .append("event_id", id)
        .append("ts", us(dt) * 1000L + 999L) // sub-µs dust: truncation must drop it
        .append("user_id", uid)
        .append("event_type", et)
        .append("value", v)
        .append("props", p))
    } finally writer.close()
    dir
  }

  private lazy val variants: Map[String, String] = Map(
    "true_nanos" -> writeTrueNanos(),
    "long_nanos" -> writeVariant(LongType),
    "ntz_micros" -> writeVariant(TimestampNTZType),
    "utc_micros" -> writeVariant(TimestampType))

  private def collectSorted(df: DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("Tables.events normalizes every supported ts encoding to TIMESTAMP µs") {
    val expectedUs = rows.map { case (id, dt, _, _, _, _) => id -> us(dt) }.toMap
    for ((name, dir) <- variants) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"variant $name")
      val got = ev.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expectedUs, s"variant $name: wall-clock µs drifted")
    }
  }

  test("flushWindow and ev_asof_join are encoding-invariant") {
    val results = variants.map { case (name, dir) =>
      name -> (collectSorted(S4Dataflow.flushWindow(spark, dir)),
        collectSorted(TextPipeline.asofPurchaseSignup(spark, dir)))
    }
    val (refName, ref) = results.head
    assert(ref._1.nonEmpty && ref._2.nonEmpty)
    for ((name, r) <- results.tail) {
      assert(r._1 == ref._1, s"flushWindow: $name != $refName")
      assert(r._2 == ref._2, s"ev_asof_join: $name != $refName")
    }
  }

  test("embeddings element-type drift (float -> double) does not break the vec stack") {
    // same hazard class as the events ts regen: if the driver rewrites
    // embeddings.parquet with array<double>, the custom vector
    // expressions (VecDot/MatVec/PqOps branch on the element type) and
    // the getSeq[Double] driver collects must keep working
    val dir = Files.createTempDirectory("graft_embdbl").toString
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val asDouble = graft.queries.Vectors.norms(spark, dir).collect()
    val asFloat = graft.queries.Vectors.norms(spark, "/root/testdata/sf0.001").collect()
    assert(asDouble.length == asFloat.length && asDouble.nonEmpty)
    asFloat.zip(asDouble).foreach { case (f, d) =>
      assert(f.getLong(0) == d.getLong(0))
      assert(math.abs(f.getDouble(2) - d.getDouble(2)) < 1e-3,
        s"norm drift for vec ${f.getLong(0)}")
    }
    // an ANN query end-to-end on the double encoding
    assert(graft.queries.Vectors.mipsTopK(spark, dir).count() > 0)
  }

  test("a nanos file without the legacy conf fails loudly, naming the fix") {
    // a sibling session with the conf OFF (SQLConf is session-scoped):
    // the PARQUET_TYPE_ILLEGAL refusal must be intercepted by ERROR
    // CONDITION (SparkThrowable.getCondition — r9 item 6 replaced the
    // message-string match) and rethrown naming the conf to set
    val bare = spark.newSession()
    bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = intercept[IllegalStateException](Tables.events(bare, variants("true_nanos")))
    assert(e.getMessage.contains("spark.sql.legacy.parquet.nanosAsLong"))
    assert(Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null).exists {
      case st: org.apache.spark.SparkThrowable => st.getCondition == "PARQUET_TYPE_ILLEGAL"
      case _ => false
    }, s"cause chain should carry the PARQUET_TYPE_ILLEGAL condition: ${e.getCause}")
  }

  test("unsupported ts type fails loudly") {
    val dir = Files.createTempDirectory("graft_enc_bad").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "2024-01-01")), 1),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", StringType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
