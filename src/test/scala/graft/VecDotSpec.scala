package graft

import org.apache.spark.sql.functions._
import graft.functions.{VecDot, VectorOps}

/** VecDot must be ARITHMETICALLY IDENTICAL to the round-2 HOF
  * formulation it replaced (aggregate(zip_with(cast, cast, *), 0d, +)):
  * the DuckDB oracle hashes round(cosine, 4), so even one ULP of drift
  * on a halfway value could flip a hash compare. Bit-equality, not
  * approximate equality, is the contract under test.
  */
class VecDotSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (s, v) => s + v)

  test("bit-identical to the HOF dot on the fixture embeddings (float x float)") {
    val e = Tables.embeddings(spark, sf0001)
    val pairs = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      .crossJoin(e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("id1") < col("id2")).limit(20000)
    val diffs = pairs
      .withColumn("fused", VecDot(col("e1"), col("e2")))
      .withColumn("hof", hofDot(col("e1"), col("e2")))
      .filter(col("fused") =!= col("hof"))   // exact double compare
      .count()
    assert(diffs === 0L)
  }

  test("bit-identical norms (VecDot(v,v) vs HOF sum of squares)") {
    val e = Tables.embeddings(spark, sf0001)
    val diffs = e
      .withColumn("fused", VectorOps.normSq(col("embedding")))
      .withColumn("hof", aggregate(
        transform(col("embedding").cast("array<double>"), x => x * x),
        lit(0.0), (s, x) => s + x))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(diffs === 0L)
  }

  test("mixed float x double-literal inputs (the LSH hyperplane shape)") {
    val e = Tables.embeddings(spark, sf0001).limit(100)
    val plane = Seq.fill(64)(0.25)
    val diffs = e
      .withColumn("fused", VecDot(col("embedding"), typedLit(plane)))
      .withColumn("hof", hofDot(col("embedding"), typedLit(plane)))
      .filter(col("fused") =!= col("hof"))
      .count()
    assert(diffs === 0L)
    // sanity: dot vs a constant 0.25 plane = 0.25 * sum(v)
    val r = e.select(VecDot(col("embedding"), typedLit(plane)).as("d"),
      aggregate(col("embedding").cast("array<double>"), lit(0.0), (s, x) => s + x).as("sum"))
      .filter(abs(col("d") - col("sum") * 0.25) > 1e-9).count()
    assert(r === 0L)
  }

  test("nulls propagate, empty arrays dot to 0.0, unequal dims truncate") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Double])),
      (Some(Seq(2.0f, 5.0f, 9.0f)), Some(Seq(10.0)))
    ).toDF("a", "b")
    val got = df.select(VecDot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq === Seq(11.0, null, 0.0, 20.0))
  }

  test("VecDot is codegen'd, not CodegenFallback") {
    val e = Tables.embeddings(spark, sf0001)
    val plan = e.select(VecDot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan
    // the starred `*(1) Project` prefix = inside a WholeStageCodegenExec span
    val inSpan = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inSpan.nonEmpty, s"no codegen span in:\n$plan")
  }

  test("VecDotI8: integer dot exact in both eval modes; nulls/truncation") {
    import spark.implicits._
    import graft.functions.VecDotI8
    val df = Seq(
      (Some(Seq(1.toByte, -2.toByte, 127.toByte)), Some(Seq(3.toByte, 4.toByte, -128.toByte))),
      (None, Some(Seq(1.toByte))),
      (Some(Seq.empty[Byte]), Some(Seq.empty[Byte])),
      (Some(Seq(100.toByte, 100.toByte)), Some(Seq(100.toByte)))   // truncates
    ).toDF("a", "b")
    val got = df.select(VecDotI8(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0))
    // 1*3 + (-2)*4 + 127*(-128) = 3 - 8 - 16256 = -16261
    assert(got.toSeq === Seq(-16261L, null, 0L, 10000L))
    // interpreted == codegen on fixture-sized quantized vectors
    val e = Tables.embeddings(spark, sf0001).limit(200)
      .withColumn("q", VectorOps.quantizeInt8(col("embedding")))
    val fused = e.select(VecDotI8(col("q"), col("q")).as("d")).collect().map(_.getLong(0))
    val hof = e.select(aggregate(zip_with(col("q").cast("array<long>"),
        col("q").cast("array<long>"), (x, y) => x * y), lit(0L), (s, v) => s + v).as("d"))
      .collect().map(_.getLong(0))
    assert(fused.toSeq === hof.toSeq)
  }
}
