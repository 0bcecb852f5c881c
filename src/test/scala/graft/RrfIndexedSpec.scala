package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{TermIndex, VectorIndex}

/** `doc_rrf_fusion_indexed` contract (VERDICT r15 item 3): the fusion
  * is exactly the rank-only RRF of its two index-served legs, and at
  * FULL visit fraction (nprobe = nlist) the indexed semantic leg — and
  * therefore the whole fusion — equals the exact brute-cosine leg. The
  * lexical leg needs no visit-fraction caveat: TermIndex.topK is exact
  * BM25 at any scale (`doc_bm25_index_topk == doc_bm25_topk`). */
class RrfIndexedSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join fast table"),
    (2L, "pond data lake"),
    (3L, "spark tuning spark guide"),
    (4L, "join optimizer stats"),
    (5L, "lake data tables"),
    (6L, "nothing much in particular"),
    (7L, "fast scan join"),
    (8L, "pond guide"))
  private val embs = docs.map { case (id, _) =>
    (id, (0 until 4).map(d => math.sin(id * 13 + d * 7).toFloat)) }
  private val probeIds = Seq(1L, 4L)

  private def fuse(lex: DataFrame, sem: DataFrame): Seq[(Long, Int, Long, Double)] =
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("indexed fusion == exact-leg fusion at full visit fraction") {
    val tDir = java.nio.file.Files.createTempDirectory("rrf_t").toString + "/idx"
    val vDir = java.nio.file.Files.createTempDirectory("rrf_v").toString + "/idx"
    TermIndex.build(docs.toDF("doc_id", "text"), "doc_id", "text", tDir)
    val embDf = embs.toDF("vec_id", "embedding")
    VectorIndex.build(embDf, vDir, nlist = 4)

    val lex = TermIndex.topK(spark, tDir,
        docs.filter(d => probeIds.contains(d._1))
          .toDF("query_id", "q"), k = 20, excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank").as("lrank"))
      .localCheckpoint() // one lexical leg, consumed by both fusions

    val probes = embDf.filter(col("vec_id").isInCollection(probeIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // indexed leg visiting EVERY cell
    val semIdx = VectorIndex.topK(spark, vDir, probes, k = 20, nprobe = 4,
        excludeSelf = true)
      .select(col("q_id").as("query_id"), col("vec_id").as("doc_id"),
        col("rn").as("vrank"))
    // exact leg: brute cosine with the identical arithmetic + rounding
    val semBrute = embDf.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(
        graft.functions.VectorOps.dot(col("q_emb"), col("embedding")) /
          (graft.functions.VectorOps.norm(col("q_emb")) *
            graft.functions.VectorOps.norm(col("embedding"))), 4))
      .withColumn("vrank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("vrank") <= 20)
      .select(col("q_id").as("query_id"), col("vec_id").as("doc_id"),
        col("vrank"))

    val idxFused = fuse(lex, semIdx)
    assert(idxFused === fuse(lex, semBrute),
      "full-visit indexed fusion must equal the exact-leg fusion")
    assert(idxFused.nonEmpty && idxFused.map(_._1).toSet ===
      probeIds.toSet, "every probe must retrieve")
    // self exclusion: a probe doc never appears in its own result list
    assert(!idxFused.exists(t => t._1 == t._3),
      "more-like-this must drop the probe doc before ranking")
  }
}
