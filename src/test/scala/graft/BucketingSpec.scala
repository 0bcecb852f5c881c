package graft

import org.apache.spark.sql.functions._

/** Bucketing is the co-located-join lever at 100 TB: two fact tables
  * bucketed by their join key join WITHOUT any shuffle exchange — the
  * sort-merge join reads bucket files pairwise. This spec proves the
  * engine's write/read/join path keeps that property. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))

    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce an exchange: the only allowed
    // exchange is the one for the final groupBy on o_orderpriority
    val joinPart = p.substring(p.indexOf("Join"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey")
      && !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$p")

    // and it must be correct: same result as the plain-parquet join
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq ===
      plain.orderBy("o_orderpriority").collect().toSeq)
  }
}
