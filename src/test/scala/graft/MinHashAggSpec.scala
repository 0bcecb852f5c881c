package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashMerge
import graft.operators.Dedup

/** The typed sketch aggregator must satisfy MinHash's union property:
  * element-wise min over per-doc signatures == the signature of the
  * union of the docs' token sets. That is the whole point of the sketch
  * (group-level signatures without materializing token unions). */
class MinHashAggSpec extends SparkSpec {

  test("min-merged group signature == signature of the token-set union") {
    val n = 64
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), Dedup.hashedTokenSet(col("text")).as("toks"))
      .withColumn("sig", Dedup.minhashSignature(col("toks"), n, seed = 7))

    val merge = udaf(new MinHashMerge(n))
    val merged = docs.groupBy(col("lang")).agg(merge(col("sig")).as("group_sig"))

    val unions = docs.groupBy(col("lang"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("toks"))))).as("u"))
      .select(col("lang"), Dedup.minhashSignature(col("u"), n, seed = 7).as("union_sig"))

    val bad = merged.join(unions, "lang")
      .filter(col("group_sig") =!= col("union_sig"))
    assert(merged.count() > 0)
    assert(bad.count() === 0, "sketch union property violated")
  }
}
