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
}
