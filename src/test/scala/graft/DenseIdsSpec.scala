package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.DenseIds

/** DenseIds must reproduce the global `row_number` exactly while never
  * planning a single-partition exchange. */
class DenseIdsSpec extends SparkSpec {

  test("dense ids equal the global row_number over a total order") {
    import spark.implicits._
    // keys deliberately skewed + duplicated-freq so ordering exercises
    // the tie-break column and range boundaries fall mid-freq-group
    val df = (1 to 10000).map(i => (s"t${i % 3000}_$i", (i % 37).toLong))
      .toDF("term", "freq")
      .repartition(16)
    val got = DenseIds.withDenseId(df, Seq(col("freq").desc, col("term")), "id")
      .select(col("id"), col("term"), col("freq"))
    val want = df.withColumn("id",
      row_number().over(Window.orderBy(col("freq").desc, col("term"))).cast("long"))
      .select(col("id"), col("term"), col("freq"))
    assert(got.count() === 10000L)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("empty input yields empty output, not a crash") {
    import spark.implicits._
    val df = Seq.empty[(String, Long)].toDF("term", "freq")
    assert(DenseIds.withDenseId(df, Seq(col("freq").desc, col("term")), "id").count() === 0L)
  }

  test("ids are dense 1..N with no gaps under heavy duplication of the first key") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (s"w$i", 1L)).toDF("term", "freq")
    val ids = DenseIds.withDenseId(df, Seq(col("freq").desc, col("term")), "id")
      .agg(count(lit(1)), min(col("id")), max(col("id")), countDistinct(col("id")))
      .head()
    assert(ids.getLong(0) === 5000L)
    assert(ids.getLong(1) === 1L)
    assert(ids.getLong(2) === 5000L)
    assert(ids.getLong(3) === 5000L)
  }
}
