package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Gates for MIPS: the norm-augmentation reduction must preserve the
  * inner-product ranking exactly (cosine of augmented == dot of
  * original, up to the shared monotone transform), MIPS must differ
  * from cosine ranking where norms vary (the reason it exists), and the
  * ANN path must recall the exact top-k on the planted corpus. */
class MipsSpec extends SparkSpec {

  private def fixtureProbes = Tables.embeddings(spark, sf0001)
    .filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L, 99L, 123L)))
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select(col("q_id").cast("long"), col("vec_id").cast("long"), col("rn").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("augmented-cosine ANN at full visit (nprobe = nlist) equals exact MIPS ranking") {
    // with every cell visited the index prunes nothing, so any ranking
    // difference would be a bug in the reduction itself
    val e = Tables.embeddings(spark, sf0001)
    val exact = hits(Similarity.mipsTopK(e, fixtureProbes, k = 5))
    val viaAug = hits(Similarity.mipsTopKAnn(e, fixtureProbes, k = 5,
      nlist = 8, nprobe = 8))
    assert(viaAug == exact, "norm-augmentation reduction changed the MIPS ranking")
  }

  test("MIPS ranking differs from cosine ranking when corpus norms vary") {
    import spark.implicits._
    // a long vector loosely aligned vs a short one perfectly aligned:
    // cosine prefers the short, inner product the long
    val corpus = Seq(
      (1L, Seq(10f, 1f, 0f, 0f)),
      (2L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val probe = Seq((0L, Seq(1f, 0f, 0f, 0f))).toDF("q_id", "q_emb")
    val mips = Similarity.mipsTopK(corpus, probe, k = 1)
      .select(col("vec_id")).head().getLong(0)
    val cos = Similarity.bruteForceTopK(corpus, probe, k = 1)
      .select(col("vec_id")).head().getLong(0)
    assert(mips == 1L && cos == 2L)
  }

  test("ANN MIPS recall@3 >= 0.9 on the planted-cluster corpus at nprobe = nlist/4") {
    val nClusters = 16
    def unit(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (pmod(h, lit(2000)).cast("double") / 1000.0 - 1.0)
    val corpus = spark.range(0, nClusters * 100L)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (unit(xxhash64(pmod(col("id"), lit(nClusters)), d)) +
            unit(xxhash64(col("id"), d, lit(7))) * 0.05).cast("float"))
          .as("embedding"))
      .localCheckpoint()
    val probes = corpus.filter(col("vec_id").isInCollection(Seq(3L, 117L, 512L, 1000L, 1599L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = ids(Similarity.mipsTopK(corpus, probes, k = 3))
    val found = ids(Similarity.mipsTopKAnn(corpus, probes, k = 3,
      nlist = nClusters, nprobe = nClusters / 4))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9, s"ANN MIPS recall@3 $recall < 0.9")
  }
}
