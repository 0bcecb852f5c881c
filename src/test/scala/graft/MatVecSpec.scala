package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineScores, LshBuckets, NearestCentroid, VectorOps}

/** Unit gates for the fused matrix-vs-vector expressions (the ANN hot
  * loops): values must match the per-row fold they replaced, under both
  * interpreted eval and codegen. */
class MatVecSpec extends SparkSpec {

  private val planes = Seq(
    Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),   // table 0: bits x=+, y=+
    Seq(0.0, 0.0, 1.0), Seq(-1.0, 0.0, 0.0))  // table 1: bits z=+, x=-

  test("LshBuckets matches the per-plane sign fold, per table") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(2.0f, 3.0f, -1.0f)),   // t0: x>=0,y>=0 -> 3; t1: z<0, -x<0 -> 0
      (2L, Seq(-1.0f, 0.0f, 5.0f)),   // t0: x<0, y=0>=0 -> 2; t1: z>=0, -x>=0 -> 3
      (3L, Seq(0.0f, 0.0f, 0.0f))     // zero vec: all dots 0 >= 0 -> 3, 3
    ).toDF("id", "v")
    val out = df.select(col("id"), LshBuckets(col("v"), planes, 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) === Seq(3, 0))
    assert(out(2L) === Seq(2, 3))
    assert(out(3L) === Seq(3, 3))
  }

  test("CosineScores equals the VecDot-based cosine fold bit for bit") {
    import spark.implicits._
    val rows = Seq(Seq(0.5, -1.25, 2.0), Seq(3.0, 0.25, -0.75))
    val df = Seq((1L, Seq(1.5f, -2.5f, 0.5f)), (2L, Seq(-0.25f, 4.0f, 1.0f)))
      .toDF("id", "v")
    val fused = df.select(col("id"), CosineScores(col("v"), rows).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val folded = df.select(col("id"),
        array(rows.map(c => VectorOps.cosine(col("v"), typedLit(c))): _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fused === folded, "fused scores must be bit-identical to the fold")
  }

  test("NearestCentroid takes the first max (array_position tie semantics)") {
    import spark.implicits._
    // centroids 0 and 2 are colinear -> identical cosine; first must win
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(2.0, 0.0))
    val df = Seq((1L, Seq(5.0f, 0.0f)), (2L, Seq(0.0f, 2.0f))).toDF("id", "v")
    val out = df.select(col("id"), NearestCentroid(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) === 0, "tie between colinear centroids 0 and 2 -> first")
    assert(out(2L) === 1)
  }

  test("fused expressions agree between codegen and interpreted eval") {
    import spark.implicits._
    val df = Seq((1L, Seq(2.0f, -3.0f, 1.0f)), (2L, Seq(-1.0f, 0.5f, 4.0f)))
      .toDF("id", "v")
    val cents = Seq(Seq(1.0, 1.0, 1.0), Seq(-1.0, 2.0, 0.0))
    def rows(factoryMode: String) = {
      val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.factoryMode", factoryMode)
      try df.select(col("id"),
          LshBuckets(col("v"), planes, 2).as("b"),
          CosineScores(col("v"), cents).as("s"),
          NearestCentroid(col("v"), cents).as("c"))
        .collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
    }
    assert(rows("CODEGEN_ONLY") === rows("NO_CODEGEN"))
  }
}
