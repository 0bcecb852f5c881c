package graft

import org.apache.spark.sql.functions._
import graft.functions.{FirstBandMatch, IsEarliestWitness}

/** Direct semantics of the emit-once candidate predicates (the pipeline
  * specs hold end-to-end exactness; these document the contracts). */
class EmitOncePredicateSpec extends SparkSpec {

  test("FirstBandMatch: first agreeing index, -1 when none, truncates to shorter") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(9L, 2L, 3L)),   // first match at 1
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),   // identical -> 0
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // none -> -1
      (Seq.empty[Long], Seq(1L, 2L)),       // empty -> -1
      (Seq(7L, 8L), Seq(9L, 8L, 7L))        // length mismatch: index 1 within min
    ).toDF("a", "b")
    val got = df.select(FirstBandMatch(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(1, 0, -1, -1, 1))
  }

  test("FirstBandMatch skips masked (null) positions on either side") {
    // masked bands (capped buckets) are nulled out of the signature; a
    // null position must never match, shifting the first match to the
    // first surviving agreeing band
    val df = spark.range(1).select(
      FirstBandMatch(
        expr("array(CAST(NULL AS LONG), 20L, 30L)"),
        expr("array(10L, 20L, 30L)")).as("left_masked"),
      FirstBandMatch(
        expr("array(10L, 20L, 30L)"),
        expr("array(10L, CAST(NULL AS LONG), 30L)")).as("right_masked"),
      FirstBandMatch(
        expr("array(CAST(NULL AS LONG), CAST(NULL AS LONG))"),
        expr("array(CAST(NULL AS LONG), 2L)")).as("all_masked"))
    val r = df.head()
    assert(r.getInt(0) == 1, "null left position must not match")
    assert(r.getInt(1) == 0, "match before the masked position is unaffected")
    assert(r.getInt(2) == -1, "no surviving agreement -> -1")
  }

  test("FirstBandMatch emits each colliding pair exactly once across bands") {
    import spark.implicits._
    // two docs agreeing in bands 1 AND 3: only the band-1 rows pass
    val bh1 = Seq(10L, 20L, 30L, 40L)
    val bh2 = Seq(11L, 20L, 31L, 40L)
    val rows = (0 until 4).map(b => (b, bh1, bh2)).toDF("band", "a", "b")
    val passing = rows.filter(FirstBandMatch(col("a"), col("b")) === col("band"))
      .select("band").collect().map(_.getInt(0))
    assert(passing.toSeq === Seq(1))
  }

  test("IsEarliestWitness over interleaved (df, tok) arrays") {
    import spark.implicits._
    // prefixes: x = [(1,5),(2,9),(3,7)], y = [(2,9),(3,7)] interleaved
    val x = Seq(1L, 5L, 2L, 9L, 3L, 7L)
    val y = Seq(2L, 9L, 3L, 7L)
    val df = Seq(
      (x, y, 2L, 9L, true),   // (2,9) is the first common element
      (x, y, 3L, 7L, false),  // (3,7) is common but not first
      (x, y, 1L, 5L, false),  // (1,5) is only in x -> not common at all
      (x, Seq(9L, 9L), 2L, 9L, false) // no common element
    ).toDF("a", "b", "df", "tok", "want")
    val bad = df.filter(
      IsEarliestWitness(col("a"), col("b"), col("df"), col("tok")) =!= col("want"))
    assert(bad.count() === 0)
  }

  test("predicates stay inside whole-stage codegen") {
    // parquet-backed so ConvertToLocalRelation can't fold the filter away
    val e = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<bigint>").as("a"))
      .withColumn("b", col("a"))
    val plan = e.filter(FirstBandMatch(col("a"), col("b")) === 0)
      .queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"FirstBandMatch fell out of codegen:\n$plan")
  }
}
