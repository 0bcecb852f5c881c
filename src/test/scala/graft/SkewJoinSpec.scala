package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Skew handling: the salted join must be result-identical to the plain
  * join, and AQE must actually split a skewed sort-merge join when the
  * thresholds make the skew visible. */
class SkewJoinSpec extends SparkSpec {

  private def skewedLeft = {
    import spark.implicits._
    // 50k rows of one hot key + a uniform tail
    val hot = spark.range(50000).select(lit(1L).as("k"), col("id").as("payload"))
    val tail = spark.range(5000).select((col("id") % 100 + 2).as("k"), col("id").as("payload"))
    hot.unionAll(tail)
  }

  private def rightDim = {
    import spark.implicits._
    spark.range(102).select(col("id").as("k"), concat(lit("v"), col("id")).as("name"))
  }

  test("salted equi-join == plain equi-join (deterministic fan-out)") {
    val plain = skewedLeft.join(rightDim, "k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    val salted = SkewJoin.saltedEquiJoin(skewedLeft, rightDim, "k", "payload", salts = 8)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    assert(salted.orderBy("k").collect().toSeq === plain.orderBy("k").collect().toSeq)
    // and the hot key genuinely fans out across salts
    val spread = skewedLeft.filter(col("k") === 1)
      .withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .select(countDistinct(col("_salt"))).collect()(0).getLong(0)
    assert(spread === 8L)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val joined = skewedLeft.join(rightDim.hint("merge"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not flag the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
