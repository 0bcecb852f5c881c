package graft

import org.apache.spark.sql.functions._
import graft.queries.TextPipeline

/** The prefix-filtered set-similarity join is an EXACT algorithm: its
  * output must be bit-identical to the cross-join brute force. */
class SetSimJoinSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered jaccard == cross-join jaccard on sf0.001") {
    val fast = rows(TextPipeline.jaccardPairs(spark, sf0001))
    val brute = rows(TextPipeline.jaccardPairsBrute(spark, sf0001))
    assert(brute.nonEmpty)
    assert(fast === brute)
  }

  test("edge shapes: empties, singletons, exact dupes, subsets") {
    import spark.implicits._
    import graft.operators.{Dedup, SetSimJoin}
    val docs = Seq(
      (1L, ""), (2L, ""),                     // empty token sets
      (3L, "a"), (4L, "a"),                   // identical singletons -> J=1
      (5L, "a b c d e"), (6L, "a b c d e"),   // exact dupes -> J=1
      (7L, "a b c d"),                        // 4/5 subset of 5/6 -> J=0.8
      (8L, "x y z q r")                       // disjoint tail
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), Dedup.hashedTokenSet(col("text")).as("toks"))
    val fast = SetSimJoin.jaccardSelfJoin(toks, "doc_id", "toks", 0.8)
      .select(col("id1"), col("id2"), round(col("jaccard"), 3).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // empty-set pairs have undefined jaccard and must NOT appear;
    // note split("", " ") yields [""] so "empty" docs are singleton-{""}
    // sets and 1<->2 ARE identical -> J=1, like the other dup pairs
    assert(fast === Set((1L, 2L, 1.0), (3L, 4L, 1.0), (5L, 6L, 1.0),
      (5L, 7L, 0.8), (6L, 7L, 0.8)))
  }
}
