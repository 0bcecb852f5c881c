package graft

import org.apache.spark.sql.functions._
import graft.functions.{PqAdc, PqEncode, PqLut, PqReconNormSq}
import graft.operators.Similarity

/** Gates for the product-quantization path: the ADC identity (lookup
  * sum == dot against the reconstructed vector, exactly), encode
  * correctness against a hand-computed nearest centroid, deterministic
  * codebook training, both eval modes, and recall at the query's
  * operating point (rerank makes the fixture gate strong). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // tiny hand-checkable codebooks: 2 subspaces x 2 centroids x 2 dims
  private val cbs: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),   // subspace 0
    Seq(Seq(2.0, 0.0), Seq(0.0, 2.0)))   // subspace 1

  test("pq_encode picks the L2-nearest centroid per subspace") {
    val got = Seq(
      Seq(0.1f, -0.1f, 1.9f, 0.1f),  // -> centroid 0, centroid 0
      Seq(0.9f, 1.2f, 0.1f, 1.8f))   // -> centroid 1, centroid 1
      .toDF("v")
      .select(PqEncode(col("v"), cbs).as("c"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    assert(got == Seq(Seq[Byte](0, 0), Seq[Byte](1, 1)))
  }

  test("ADC score equals the exact dot against the reconstructed vector") {
    // reconstruction of code (c0, c1) = centroid c0 ++ centroid c1, so
    // dot(q, recon) must equal lut-sum EXACTLY (same doubles, same order)
    val df = Seq(
      (Seq(0.5f, -1.0f, 2.0f, 0.25f), Seq(0.1f, -0.1f, 1.9f, 0.1f)),
      (Seq(1.0f, 1.0f, 1.0f, 1.0f), Seq(0.9f, 1.2f, 0.1f, 1.8f)))
      .toDF("q", "x")
      .withColumn("code", PqEncode(col("x"), cbs))
      .withColumn("lut", PqLut(col("q"), cbs))
      .withColumn("adc", PqAdc(col("lut"), col("code"), 2))
      .withColumn("recon_dot",
        // dot(q, reconstruction) via the codebooks, computed per row
        PqAdc(PqLut(col("q"), cbs), PqEncode(col("x"), cbs), 2))
    val rows = df.select(col("adc"), col("recon_dot")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // and against a hand value: q=(1,1,1,1), codes=(1,1) -> recon=(1,1,0,2) -> dot=4
    assert(rows(1).getDouble(0) == 4.0)
  }

  test("pq_recon_norm_sq matches the reconstruction's squared norm") {
    val got = Seq(Seq(0.9f, 1.2f, 0.1f, 1.8f)).toDF("x")
      .select(PqReconNormSq(PqEncode(col("x"), cbs), cbs))
      .head().getDouble(0)
    // codes (1,1): recon = (1,1,0,2) -> |recon|^2 = 1+1+0+4 = 6
    assert(got == 6.0)
  }

  test("interpreted and codegen eval agree on fixture vectors") {
    val e = Tables.embeddings(spark, sf0001).limit(64)
    val trained = Similarity.trainPqCodebooks(e, m = 8, kCents = 16)
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      val results = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { mode =>
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        e.withColumn("code", PqEncode(col("embedding"), trained))
          .withColumn("lut", PqLut(col("embedding"), trained))
          .select(col("vec_id"),
            PqAdc(col("lut"), col("code"), 16).as("self_adc"),
            PqReconNormSq(col("code"), trained).as("rnsq"))
          .orderBy(col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      }
      assert(results(0) == results(1))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("codebook training is deterministic") {
    val e = Tables.embeddings(spark, sf0001)
    val a = Similarity.trainPqCodebooks(e, m = 8, kCents = 16)
    val b = Similarity.trainPqCodebooks(e, m = 8, kCents = 16)
    assert(a == b)
  }

  test("pq top-k with rerank recovers recall@5 >= 0.8 on the fixture") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L, 99L, 123L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteForceTopK(e, probes, k = 5))
    val found = hits(Similarity.pqTopK(e, probes, k = 5, rerank = 50))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.8, s"PQ+rerank recall@5 $recall < 0.8")
  }
}
