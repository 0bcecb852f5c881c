package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorOps

/** Recall gates for the approximate similarity paths (VERDICT r1 item 7):
  * ANN top-k vs brute force, and LSH near-dup on planted near-duplicates
  * (the fixture's max pairwise cosine is 0.479 — no natural near-dups —
  * so the near-dup gate plants its own). */
class SimilaritySpec extends SparkSpec {

  test("lsh top-k recall@5 >= 0.8 vs brute force") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L, 99L, 123L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteForceTopK(e, probes, k = 5))
    val found = hits(Similarity.lshTopK(e, probes, k = 5))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.8, s"ANN recall@5 $recall < 0.8")
  }

  test("ivf top-k recall@5 >= 0.8 vs brute force") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L, 99L, 123L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteForceTopK(e, probes, k = 5))
    // nlist pinned to the fixture row's operating point: this corpus has
    // no cluster structure, so recall here IS the visit fraction
    // nprobe/nlist (see the planted-cluster gate below) — the AUTO √N
    // default would just measure a different fraction
    val found = hits(Similarity.ivfTopK(e, probes, k = 5, nlist = 16))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.8, s"IVF recall@5 $recall < 0.8")
  }

  test("ivf on a planted-cluster corpus: recall@5 >= 0.9 at nprobe = nlist/4") {
    // The sf fixture has no cosine cluster structure (max pairwise 0.479),
    // so its IVF gate degenerates to the visit fraction nprobe/nlist —
    // it measures pruning, not the index (VERDICT r5 item 4). This corpus
    // has REAL structure: 16 near-orthogonal centers (pseudo-random in
    // 64-d, pairwise cosine ~0), 100 members each at jitter cosine ~0.99.
    // A working coarse quantizer must then reach high recall while
    // visiting only a quarter of the cells — the claim that makes IVF
    // worth shipping next to LSH.
    import org.apache.spark.sql.DataFrame
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
    def hits(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteForceTopK(corpus, probes, k = 5))
    val found = hits(Similarity.ivfTopK(corpus, probes, k = 5,
      nlist = nClusters, nprobe = nClusters / 4))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9, s"planted-cluster IVF recall@5 $recall < 0.9 at nprobe=nlist/4")
  }

  test("knn join on planted clusters: recall@3 >= 0.9 at nprobe = nlist/4, no self pairs") {
    import org.apache.spark.sql.DataFrame
    // same planted-cluster construction as the IVF gate
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
    val sampleIds = Seq(3L, 117L, 512L, 1000L, 1599L, 40L, 777L, 1234L)
    // ground truth: brute top-3 for the sampled probes, self excluded
    val probes = corpus.filter(col("vec_id").isInCollection(sampleIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def hits(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteForceTopK(
      corpus.alias("c"), probes, k = 4) // k+1: brute includes self at rank 1
      .filter(col("q_id") =!= col("vec_id"))
      .filter(col("rn") <= 4)) // then 3 non-self survivors of the top 4
    val knn = Similarity.knnJoin(corpus, k = 3,
      nlist = nClusters, nprobe = nClusters / 4)
      .localCheckpoint()
    assert(knn.filter(col("q_id") === col("vec_id")).count() == 0L)
    // every corpus row got k neighbors
    assert(knn.count() == nClusters * 100L * 3)
    val found = hits(knn.filter(col("q_id").isInCollection(sampleIds)))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9, s"planted-cluster kNN-join recall@3 $recall < 0.9")
  }

  test("knn join recall holds under the AUTO sqrt-N nlist default (r17 item 3)") {
    import org.apache.spark.sql.DataFrame
    // same planted-cluster corpus as the pinned-nlist gate: 1600 vectors
    // → AUTO resolves to max(16, ceil(sqrt(1600))) = 40 cells, so each
    // planted cluster splits over ~2.5 cells and nprobe=4 must still
    // reach the probe's own cluster — the recall property the auto rule
    // must not break while it flattens the N² candidate fan-out
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
    assert(Similarity.resolveNlist(corpus, Similarity.AutoNlist, "vec_id") == 40)
    val sampleIds = Seq(3L, 117L, 512L, 1000L, 1599L, 40L, 777L, 1234L)
    val probes = corpus.filter(col("vec_id").isInCollection(sampleIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def hits(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(Similarity.bruteForceTopK(corpus, probes, k = 4)
      .filter(col("q_id") =!= col("vec_id"))
      .filter(col("rn") <= 4))
    // nlist NOT passed — the auto default under test
    val knn = Similarity.knnJoin(corpus, k = 3, nprobe = 4).localCheckpoint()
    assert(knn.filter(col("q_id") === col("vec_id")).count() == 0L)
    val found = hits(knn.filter(col("q_id").isInCollection(sampleIds)))
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.9, s"auto-nlist kNN-join recall@3 $recall < 0.9")
    // an explicit pin still wins over auto
    assert(Similarity.resolveNlist(corpus, 16, "vec_id") == 16)
  }

  test("semantic dedup on planted clusters: subset of brute flags, >= 0.9 recovered") {
    import org.apache.spark.sql.DataFrame
    // same planted-cluster construction as the IVF gate: 16 near-orthogonal
    // centers, jittered members at cosine ~0.99 — every non-minimum member
    // is a semantic duplicate under tau = 0.9
    val nClusters = 16
    def unit(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (pmod(h, lit(2000)).cast("double") / 1000.0 - 1.0)
    val corpus = spark.range(0, nClusters * 50L)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (unit(xxhash64(pmod(col("id"), lit(nClusters)), d)) +
            unit(xxhash64(col("id"), d, lit(7))) * 0.05).cast("float"))
          .as("embedding"))
      .localCheckpoint()
    // cell-free brute-force version of the SAME triangular rule
    val n = corpus.select(col("vec_id").as("_id"), col("embedding").as("_e"),
      graft.functions.VectorOps.norm(col("embedding")).as("_n"))
    val bruteFlag = n.select(col("_id").as("_ida"), col("_e").as("_ea"), col("_n").as("_na"))
      .crossJoin(n.select(col("_id").as("_idb"), col("_e").as("_eb"), col("_n").as("_nb")))
      .filter(col("_idb") < col("_ida"))
      .filter(graft.functions.VectorOps.dot(col("_ea"), col("_eb"))
        > lit(0.9) * col("_na") * col("_nb"))
      .select(col("_ida")).distinct()
      .collect().map(_.getLong(0)).toSet
    val got = Similarity.semanticDedup(corpus, tau = 0.9, nlist = nClusters)
    val gotFlag = got.filter(col("is_dup")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(bruteFlag.nonEmpty, "fixture must contain semantic duplicates")
    assert(gotFlag.subsetOf(bruteFlag),
      "every cell-local witness is a true witness — no false flags possible")
    val recovered = gotFlag.size.toDouble / bruteFlag.size
    assert(recovered >= 0.9,
      s"cell-local dedup recovered $recovered < 0.9 of brute-force flags")
    // keepers + dups partition the corpus, and dup_of < vec_id always
    assert(got.count() === nClusters * 50L)
    assert(got.filter(col("is_dup") && (col("dup_of") >= col("vec_id"))).isEmpty)
  }

  test("ivf centroids are deterministic and cover all cells") {
    val e = Tables.embeddings(spark, sf0001)
    val c1 = Similarity.trainCentroids(e, nlist = 8, iters = 1)
    val c2 = Similarity.trainCentroids(e, nlist = 8, iters = 1)
    assert(c1 === c2, "same seed must give identical centroids")
    assert(c1.size === 8)
    assert(c1.forall(_.size === 64))
  }

  test("derived dim matches the fixture") {
    assert(Similarity.dimOf(Tables.embeddings(spark, sf0001), "embedding") === 64)
  }

  test("lsh near-dups recovers >= 0.7 of planted near-duplicate pairs") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    // Plant: for every 5th vector, a jittered copy at id+100000 whose
    // cosine to the original is ~0.999 (deterministic per-position jitter).
    val planted = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(i, lit(7)) - lit(3)).cast("float") * lit(0.001f))
          .as("embedding"))
    val corpus = e.unionByName(planted)
    val truthDf = corpus.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      .crossJoin(corpus.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("id1") < col("id2"))
      .filter(VectorOps.cosine(col("e1"), col("e2")) >= 0.99)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id1").cast("long"), col("id2").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(truthDf)
    assert(truth.size >= 50, s"expected >=50 planted pairs, got ${truth.size}")
    val found = pairs(Similarity.lshNearDups(corpus, threshold = 0.99))
    assert(found.subsetOf(truth), "every reported pair must verify")
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.7, s"LSH near-dup recall $recall < 0.7 (${found.size}/${truth.size})")
  }

  test("int8-quantized top-k recall@5 >= 0.8 and scores within 0.02 of exact") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L, 99L, 123L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val truth = Similarity.bruteForceTopK(e, probes, k = 5)
      .select(col("q_id").cast("long"), col("vec_id").cast("long"), col("cosine"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val got = Similarity.quantizedTopK(e, probes, k = 5)
      .select(col("q_id").cast("long"), col("vec_id").cast("long"), col("qcosine"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recall = (truth.keySet & got.keySet).size.toDouble / truth.size
    assert(recall >= 0.8, s"quantized recall@5 $recall < 0.8")
    // on the overlap, int8 cosine must track full precision closely
    (truth.keySet & got.keySet).foreach { k =>
      assert(math.abs(truth(k) - got(k)) <= 0.02,
        s"pair $k: quantized ${got(k)} vs exact ${truth(k)}")
    }
  }

  test("int8 quantization round-trip error bounded by scale/2 per element") {
    import graft.functions.VectorOps
    val e = Tables.embeddings(spark, sf0001).limit(100)
      .withColumn("_s", VectorOps.quantScale(col("embedding")))
      .withColumn("_deq",
        VectorOps.dequantizeInt8(VectorOps.quantizeInt8(col("embedding")), col("_s")))
    val bad = e.select(
        exists(zip_with(col("embedding"), col("_deq"),
          (x, d) => abs(x.cast("double") - d) > col("_s") * 0.5 + 1e-12), identity)
          .as("viol"))
      .filter(col("viol")).count()
    assert(bad === 0, s"$bad vectors violate the |x - q*s| <= s/2 bound")
  }
}
