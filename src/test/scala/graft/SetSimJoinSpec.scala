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

  test("threshold verify keeps exactly the pairs the exact count keeps (both eval modes)") {
    import spark.implicits._
    import graft.functions.{SortedIntersectAtLeast, SortedIntersectSize}
    // random sorted distinct long arrays + a spread of thresholds,
    // including vacuous (m <= 0) and unreachable bounds
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 400).map { _ =>
      def arr() = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted.toSeq
      (arr(), arr(), rnd.nextInt(14) - 2)
    }
    val df = rows.toDF("a", "b", "m")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        val bad = df.filter(
          SortedIntersectAtLeast(col("a"), col("b"), col("m")) =!=
            (SortedIntersectSize(col("a"), col("b")) >= col("m"))).count()
        assert(bad === 0L, s"$mode: short-circuit disagrees with exact count")
      }
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
  }

  test("score-free edge verification equals the scored verification's accept set") {
    import graft.operators.{Dedup, SetSimJoin}
    val toks = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), Dedup.hashedTokenSet(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .localCheckpoint()
    val cands = SetSimJoin.prefixCandidates(toks, "doc_id", "toks", 0.8)
      .localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scored = pairs(Dedup.jaccardVerifySorted(cands, toks, "doc_id", "toks")
      .filter(col("jaccard") >= 0.8))
    val atLeast = pairs(Dedup.jaccardVerifyAtLeast(cands, toks, "doc_id", "toks", 0.8))
    assert(scored.nonEmpty)
    assert(atLeast === scored)
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
