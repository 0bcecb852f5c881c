package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomContains

/** BloomContains must agree with the sketch library's own
  * `mightContainLong` in BOTH eval modes (whole-stage codegen and the
  * interpreted fallback), guarantee zero false NEGATIVES (the property
  * the contamination pre-filter's correctness rests on — the exact
  * semi-join only re-verifies rows that SURVIVE the filter), and stay
  * usable from pure SQL via GraftExtensions.
  */
class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  private def buildSketch(members: Seq[Long]) = {
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(members.size.max(1).toLong, 0.01)
    members.foreach(bf.putLong)
    bf
  }

  test("zero false negatives; agrees with the library probe; both eval modes") {
    // members and 35k non-members interleaved in one probe set
    val members = (0L until 5000L).map(_ * 8L)   // multiples of 8 in [0, 40k)
    val bf = buildSketch(members)
    val probes = (0L until 40000L).toDF("h")
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      val got = probes.withColumn("c", BloomContains(bf, col("h")))
        .filter(col("c")).select(col("h")).as[Long].collect().toSet
      // no member may be missed, in either eval mode
      val missed = members.toSet -- got
      assert(missed.isEmpty, s"[$codegen] false negatives: ${missed.take(5)}")
      // row-by-row agreement with the driver-side library call
      val disagree = got.count(h => !bf.mightContainLong(h))
      assert(disagree == 0, s"[$codegen] $disagree rows differ from the library")
      // the 1% FPP sketch must actually filter (not pass everything)
      assert(got.size < 10000, s"[$codegen] pre-filter passed ${got.size}/40000")
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("SQL surface via GraftExtensions; nulls probe as null") {
    graft.plans.GraftExtensions.register(spark)
    val bf = buildSketch(Seq(42L, 99L))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    Seq(Some(42L), Some(43L), None).toDF("h").createOrReplaceTempView("bc_probe")
    spark.sql(
      s"SELECT h, bloom_contains(X'${bos.toByteArray.map("%02X".format(_)).mkString}', h) AS c " +
        "FROM bc_probe ORDER BY h NULLS FIRST").collect() match {
      case Array(nullRow, r42, r43) =>
        assert(nullRow.isNullAt(1), "null hash must probe as null")
        assert(r42.getBoolean(1), "member must flag")
        assert(!r43.getBoolean(1) || bf.mightContainLong(43L))
      case other => fail(s"unexpected rows: ${other.mkString(",")}")
    }
    // a non-foldable sketch is refused at analysis, not probed per row
    val ex = intercept[Exception] {
      spark.sql("SELECT bloom_contains(CAST(CONCAT('x', h) AS BINARY), h) FROM bc_probe")
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("foldable") ||
      ex.getMessage.toLowerCase.contains("datatype mismatch"), ex.getMessage)
  }
}
