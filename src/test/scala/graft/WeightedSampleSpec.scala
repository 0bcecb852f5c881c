package graft

import org.apache.spark.sql.functions._
import graft.operators.WeightedSample

/** Gates for deterministic weighted sampling: exact agreement with a
  * sequential reference on the same keys, run-to-run determinism, the
  * top-n plan shape, and the statistical contract (weightier items are
  * drawn more often across seeds — checked in ONE job via a seed
  * explosion, not a job per seed). */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("equals the sequential reference; deterministic; excludes w <= 0") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble)) :+ (201L, 0.0)
    val df = rows.toDF("id", "w")
    def refKeys(seed: Long): Seq[Long] = rows.filter(_._2 > 0).map { case (id, w) =>
      val h = df.sparkSession.range(1).select(
        WeightedSample.hash01(lit(id), seed)).head().getDouble(0)
      (id, math.pow(h, 1.0 / w))
    }.sortBy { case (id, k) => (-k, id) }.take(10).map(_._1)
    val got = WeightedSample.sample(df, "id", "w", 10, seed = 7L)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(got.sorted == refKeys(7L).sorted)
    val again = WeightedSample.sample(df, "id", "w", 10, seed = 7L)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(got == again)
    assert(!got.contains(201L))
  }

  test("plans as TakeOrderedAndProject (no global sort)") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    val p = WeightedSample.sample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-n plan:\n$p")
  }

  test("inclusion frequency grows with weight across seeds (one job)") {
    // 10 items, weights 1..10; 100 seeds exploded in one DataFrame: the
    // heaviest item must be drawn into the top-3 far more often than the
    // lightest, and overall frequency must be monotone-ish in weight
    val items = (1L to 10L).map(i => (i, i.toDouble))
    val seeds = (1L to 100L)
    val keyed = items.toDF("id", "w")
      .crossJoin(seeds.toDF("seed"))
      .withColumn("u", (shiftrightunsigned(xxhash64(col("id"), col("seed")), 11)
        .cast("double") + 1.0) / 9007199254740992.0)
      .withColumn("k", pow(col("u"), lit(1.0) / col("w")))
    val picked = keyed
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("seed"))
          .orderBy(col("k").desc, col("id"))))
      .filter(col("rn") <= 3)
      .groupBy(col("id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fLight = picked.getOrElse(1L, 0L)
    val fHeavy = picked.getOrElse(10L, 0L)
    assert(fHeavy > fLight * 2,
      s"weight-10 item drawn $fHeavy times vs weight-1 $fLight — not proportional")
  }
}
