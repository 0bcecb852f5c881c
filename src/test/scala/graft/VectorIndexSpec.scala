package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorIndex}

/** The persisted-IVF lifecycle: build once, query many. The query path
  * must return EXACTLY the self-contained ivfTopK answer (training is
  * deterministic in the seed), and the query-time cell restriction must
  * prune the index at the FILE level — that pruning is the reason the
  * index exists. */
class VectorIndexSpec extends SparkSpec {

  test("index query == fresh ivfTopK at the same quantizer (build-once/query-many)") {
    val corpus = Tables.embeddings(spark, sf0001)
    val probes = corpus
      .filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L, 99L, 123L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val dir = java.nio.file.Files.createTempDirectory("vecidx").toString
    VectorIndex.build(corpus, dir, nlist = 8, iters = 2, seed = 42L)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaIndex = rows(VectorIndex.topK(spark, dir, probes, k = 5, nprobe = 2))
    val fresh = rows(Similarity.ivfTopK(corpus, probes, k = 5, nlist = 8,
      nprobe = 2, iters = 2, seed = 42L))
    assert(viaIndex.nonEmpty)
    assert(viaIndex == fresh,
      s"persisted-index query diverged from the fresh IVF answer:\n$viaIndex\nvs\n$fresh")
  }

  test("append assigns new vectors to the frozen quantizer; queries see them immediately") {
    val corpus = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("vecidx3").toString
    VectorIndex.build(corpus, dir, nlist = 8)
    val before = spark.read.parquet(s"$dir/cells").count()
    // delta: a near-copy of vector 7 under a fresh id — it must land in
    // 7's cell and become 7's top neighbor
    val delta = corpus.filter(col("vec_id") === 7L)
      .select(lit(900007L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.0000001f)).as("embedding"),
        col("label"))
    VectorIndex.append(delta, dir)
    assert(spark.read.parquet(s"$dir/cells").count() == before + 1)
    val probes = corpus.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val top = VectorIndex.topK(spark, dir, probes, k = 2, nprobe = 2)
      .orderBy(col("rn")).collect()
    // rank 1 is the probe itself (cosine 1.0), rank 2 the appended copy
    assert(top.map(_.getLong(2)).toSeq == Seq(7L, 900007L),
      s"appended near-copy must surface: ${top.mkString(", ")}")
  }

  test("compact folds accreted cell files; queries, freshness and provenance survive") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.embeddings(spark, sf0001)
    val half = corpus.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val d1 = corpus.filter(col("vec_id") % 4 === 1).localCheckpoint()
    val d2 = corpus.filter(col("vec_id") % 4 === 3).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("vecidxc").toString + "/idx"
    VectorIndex.build(half, dir, nlist = 8, iters = 2, seed = 42L)
    VectorIndex.append(d1, dir, tag = "v0")
    VectorIndex.append(d2, dir, tag = "v1")
    val probes = corpus.filter(col("vec_id").isInCollection(Seq(1L, 7L, 42L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val before = rows(VectorIndex.topK(spark, dir, probes, k = 5, nprobe = 3))
    def filesPerCell: Map[String, Int] = {
      // resolve the live generation root like the operators do
      val live = graft.operators.IndexMaintenance.liveRoot(
        spark.sparkContext.hadoopConfiguration, dir)
      val root = new java.io.File(s"$live/cells")
      root.listFiles().filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    assert(filesPerCell.values.exists(_ > 1),
      "appends must have accreted multiple files in at least one cell dir")
    VectorIndex.compact(spark, dir)
    assert(filesPerCell.values.forall(_ == 1), "one file per cell dir")
    assert(rows(VectorIndex.topK(spark, dir, probes, k = 5, nprobe = 3)) === before,
      "top-k answers must be identical after compaction")
    val live = graft.operators.IndexMaintenance.liveRoot(
      spark.sparkContext.hadoopConfiguration, dir)
    assert(live == s"$dir/g1", s"cutover must move the root: $live")
    val srcs = spark.read.parquet(s"$live/cells").select(col("_src"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(srcs === Set("build", "v0", "v1"), s"provenance lost: $srcs")
    val rec = half.unionByName(d1).unionByName(d2)
    assert(VectorIndex.isFresh(spark, dir, rec))
  }

  test("ensure rebuilds when the corpus is regenerated in place, not otherwise") {
    // the r8 fixture regen: same path, different bytes — a dir-keyed
    // index must notice (VERDICT r8 item 3)
    val srcDir = java.nio.file.Files.createTempDirectory("vecsrc").toString
    val dir = java.nio.file.Files.createTempDirectory("vecidx4").toString
    val all = Tables.embeddings(spark, sf0001)
    all.filter(col("vec_id") < 200L)
      .write.mode("overwrite").parquet(s"$srcDir/embeddings.parquet")
    def corpus = spark.read.parquet(s"$srcDir/embeddings.parquet")
    VectorIndex.ensure(corpus, dir, nlist = 8)
    val meta = new java.io.File(s"$dir/meta/_SUCCESS")
    val built = meta.lastModified()
    assert(VectorIndex.isFresh(spark, dir, corpus))
    VectorIndex.ensure(corpus, dir, nlist = 8) // same bytes: no rebuild
    assert(meta.lastModified() == built, "unchanged corpus must not rebuild")
    // regenerate IN PLACE with different content (drop half the rows)
    all.filter(col("vec_id") < 100L)
      .write.mode("overwrite").parquet(s"$srcDir/embeddings.parquet")
    assert(!VectorIndex.isFresh(spark, dir, corpus), "stale index must be detected")
    VectorIndex.ensure(corpus, dir, nlist = 8)
    assert(meta.lastModified() > built, "regenerated corpus must trigger rebuild")
    assert(spark.read.parquet(s"$dir/cells").count() == corpus.count(),
      "rebuilt index must describe the regenerated corpus")
    assert(VectorIndex.isFresh(spark, dir, corpus))
  }

  test("probeDups == the batch SemDeDup decision rule, partition-pruned") {
    val corpus = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("vecidx6").toString
    VectorIndex.build(corpus, dir, nlist = 8)
    // probes: exact copies of indexed vectors under fresh ids — each must
    // flag with dup_of = its source (the smallest same-cell witness at
    // cosine 1.0 is the source itself unless an even smaller id ties)
    val probes = corpus.filter(col("vec_id").isInCollection(Seq(7L, 42L)))
      .select((col("vec_id") + 800000L).as("vec_id"), col("embedding"))
    val flags = VectorIndex.probeDups(spark, dir, probes, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the fixture has no natural near-dups (max pairwise cosine 0.479),
    // so each copy's only witness above tau is its source
    assert(flags == Map(800007L -> 7L, 800042L -> 42L), s"copies must flag: $flags")
    // a NEGATED corpus vector can't exceed cosine 0.479 against anything
    // (all pairwise cosines are within ±0.479): provably no flag
    val novel = corpus.filter(col("vec_id") === 7L)
      .select(lit(900001L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    assert(VectorIndex.probeDups(spark, dir, novel, tau = 0.99).count() == 0L)
  }

  test("append keeps the staleness fingerprint in step") {
    val corpus = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 100L)
    val delta = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") >= 100L && col("vec_id") < 120L)
    val dir = java.nio.file.Files.createTempDirectory("vecidx5").toString
    VectorIndex.build(corpus, dir, nlist = 8)
    VectorIndex.append(delta, dir)
    assert(!VectorIndex.isFresh(spark, dir, corpus),
      "fingerprint must absorb the appended delta")
    assert(VectorIndex.isFresh(spark, dir, corpus.unionAll(delta)),
      "index == build corpus + appended rows")
  }

  test("replayed append merges the fingerprint once; excludeTag probe is null-safe (ADVICE r9)") {
    import spark.implicits._
    val base = Seq((1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val d1 = Seq((3L, Seq(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("vecidx7").toString
    VectorIndex.build(base, dir, nlist = 2)
    // simulate a pre-provenance index: strip _src from the cell table
    val legacy = spark.read.parquet(s"$dir/cells").drop("_src").localCheckpoint()
    legacy.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    VectorIndex.append(d1, dir, tag = "b1")
    val rec = base.unionAll(d1)
    assert(VectorIndex.isFresh(spark, dir, rec))
    // crash-replay: same (tag, delta) — rows re-append, fingerprint must not
    VectorIndex.append(d1, dir, tag = "b1")
    assert(VectorIndex.isFresh(spark, dir, rec),
      "replayed append must not drift the fingerprint")
    // null-safe exclusion: a re-crawl of legacy vector 1 (_src = null)
    // must still flag against it even when batch b1's own rows are
    // excluded — `=!=` would NULL out the whole pre-upgrade corpus
    val probe = Seq((900L, Seq(0.999f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding")
    val hit = VectorIndex.probeDups(spark, dir, probe, tau = 0.9,
      excludeTag = Some("b1")).collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 1L,
      s"legacy (_src-less) cells must survive excludeTag: ${hit.mkString(",")}")
    // and ensure() treats the (now mixed) index as usable but a FULLY
    // pre-provenance one as stale: rebuild restores _src everywhere
    val legacy2 = spark.read.parquet(s"$dir/cells").drop("_src").localCheckpoint()
    legacy2.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    VectorIndex.ensure(rec, dir, nlist = 2)
    assert(spark.read.parquet(s"$dir/cells").columns.contains("_src"),
      "ensure must rebuild a pre-provenance index")
  }

  test("decision rule at the tau boundary: cosine == tau is kept, in batch, probe, and stream paths") {
    // The rule is STRICT inequality — dot > tau·|a|·|b| — so a pair at
    // cosine EXACTLY tau is kept (not flagged). Pinned here with fully
    // exact float arithmetic (identical unit vectors, tau = 1.0: dot,
    // both norms, and tau·|a|·|b| are all exactly 1.0) so the verdict
    // cannot drift between Similarity.semanticDedup, the persisted-index
    // probe, and the streaming ingest loop that composes it (r9 item 8).
    import spark.implicits._
    val e = Seq(1f, 0f, 0f, 0f)
    val corpus = Seq((1L, e)).toDF("vec_id", "embedding")
    val probe = Seq((2L, e)).toDF("vec_id", "embedding")
    // batch path: union corpus, one cell; id 2's only candidate witness
    // is id 1 at cosine exactly 1.0 == tau -> kept
    val batchVerdict = Similarity
      .semanticDedup(corpus.unionByName(probe), tau = 1.0, nlist = 1)
      .filter(col("vec_id") === 2L).select(col("is_dup")).head().getBoolean(0)
    assert(!batchVerdict, "batch: cosine == tau must be KEPT (strict >)")
    // index-probe path: same tie, same verdict
    val dir = java.nio.file.Files.createTempDirectory("vecidx8").toString
    VectorIndex.build(corpus, dir, nlist = 1)
    assert(VectorIndex.probeDups(spark, dir, probe, tau = 1.0).count() == 0L,
      "probe: cosine == tau must be KEPT (strict >)")
    // ...and strictly-above control on all paths (tau = 0.5 < 1.0): flagged
    assert(Similarity.semanticDedup(corpus.unionByName(probe), tau = 0.5, nlist = 1)
      .filter(col("vec_id") === 2L).head().getBoolean(2), "batch: above tau flags")
    assert(VectorIndex.probeDups(spark, dir, probe, tau = 0.5).count() == 1L,
      "probe: above tau flags")
    // streaming ingest loop at the tie: the at-tau vector is NOVEL —
    // written to the lake and appended to the index
    val lake = java.nio.file.Files.createTempDirectory("vecidx8_lake").toString
    graft.streaming.S4Stream.processIndexedSemanticBatch(probe, 0L,
      "vec_id", "embedding", dir, lake, tau = 1.0, runKey = "tiespec")
    val kept = spark.read.parquet(s"$lake/batch=0")
    assert(kept.count() == 1L && kept.head().getLong(0) == 2L,
      "stream: cosine == tau must be KEPT end-to-end")
    // a non-exact boundary (cos = 24/25 against tau = 0.96): whatever
    // direction FP rounds tau·|a|·|b|, every path must agree on it
    val c2 = Seq((1L, Seq(3f, 4f, 0f, 0f))).toDF("vec_id", "embedding")
    val p2 = Seq((2L, Seq(4f, 3f, 0f, 0f))).toDF("vec_id", "embedding")
    val bat = Similarity.semanticDedup(c2.unionByName(p2), tau = 0.96, nlist = 1)
      .filter(col("vec_id") === 2L).head().getBoolean(2)
    val dir2 = java.nio.file.Files.createTempDirectory("vecidx9").toString
    VectorIndex.build(c2, dir2, nlist = 1)
    val prb = VectorIndex.probeDups(spark, dir2, p2, tau = 0.96).count() == 1L
    assert(bat == prb, s"paths disagree at the FP boundary: batch=$bat probe=$prb")
  }

  test("query-time cell restriction prunes index partitions at the file level") {
    val corpus = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("vecidx2").toString
    VectorIndex.build(corpus, dir, nlist = 8)
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val cells = spark.read.parquet(s"$dir/cells")
    val all = filesTouched(cells)
    val pruned = filesTouched(cells.filter(col("cell").isInCollection(Seq(0, 1))))
    assert(pruned < all, s"partition filter must skip files: touched $pruned of $all")
    // and it must be a PARTITION filter in the scan, not a post-scan row filter
    val p = cells.filter(col("cell") === 0).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"cell restriction did not reach the scan's partition filters:\n$p")
  }

  test("retrain restores recall after distribution drift; state survives the cutover") {
    // VERDICT r12 item 2: the quantizer is the one distribution
    // assumption in the index families. Fixture: 16 near-orthogonal
    // planted clusters (the SimilaritySpec IVF-gate construction);
    // build on clusters 0-7 (nlist=8 — the quantizer learns exactly
    // those centers), then append clusters 8-15 under the FROZEN
    // quantizer. Each appended cluster sits on the MIDPOINT of two
    // UNIT-NORM old centers (the boundary-straddling drift case): a
    // member's frozen argmax flips between the two parent cells on its
    // own tiny jitter, so every drifted cluster splits ~50/50 across
    // two cells and same-visit-fraction recall collapses.
    // retrain(nlist=16) gives the drifted clusters their own cells,
    // from the INDEXED rows alone, and restores it. (A plain
    // far-from-all-centers drift does NOT degrade recall here: the same
    // noise that picks a member's cell also makes it a near neighbor,
    // so mates co-locate — that construction measured 0.92-1.0 and
    // gates nothing. Centers must be unit-norm or norm differences
    // decide the argmax deterministically and nothing splits.)
    import org.apache.spark.sql.DataFrame
    // java.util.Random's first draws CORRELATE across sequential seeds
    // (weak scrambler) — every member would get near-identical jitter
    // and nothing would split; golden-ratio-multiply the seed first
    def rng(seed: Long) =
      new java.util.Random(seed * 0x9E3779B97F4A7C15L + (seed >>> 17))
    def unitCenter(c: Int): Array[Double] = {
      val r = rng(1000L + c)
      val v = Array.fill(64)(r.nextDouble() * 2 - 1)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = (0 until 8).map(unitCenter)
    val fixture = (0L until 1600L).map { id =>
      val m = (id % 16).toInt
      val r = rng(50000L + id)
      val base =
        if (m < 8) centers(m)
        else centers(m - 8).zip(centers((m - 7) % 8))
          .map { case (x, y) => (x + y) / 2 }
      (id, base.map(b => (b + (r.nextDouble() * 2 - 1) * 0.02).toFloat).toSeq)
    }
    import spark.implicits._
    val all = fixture.toDF("vec_id", "embedding").localCheckpoint()
    val oldCorpus = all.filter(pmod(col("vec_id"), lit(16)) < 8)
    val delta = all.filter(pmod(col("vec_id"), lit(16)) >= 8)
    val dir = java.nio.file.Files.createTempDirectory("vecretrain").toString + "/idx"
    VectorIndex.build(oldCorpus, dir, nlist = 8, iters = 2, seed = 42L)
    VectorIndex.append(delta, dir, tag = "drift1")
    val conf = spark.sparkContext.hadoopConfiguration
    val rootBefore = graft.operators.IndexMaintenance.liveRoot(conf, dir)
    // probes from the DRIFTED part of the corpus
    val probes = all.filter(col("vec_id").isInCollection(
        Seq(8L, 137L, 522L, 1005L, 1598L, 44L, 301L, 777L, 1203L, 1444L)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def hits(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // k = half the cluster size: the very nearest mates co-locate with
    // the probe by construction (aligned jitter picks the same side),
    // so recall@small-k survives any quantizer — the drift damage shows
    // where it really lands at scale, in the mates across the boundary
    val truth = hits(Similarity.bruteForceTopK(all, probes, k = 50))
    def recall(nprobe: Int): Double =
      (truth & hits(VectorIndex.topK(spark, dir, probes, k = 50,
        nprobe = nprobe))).size.toDouble / truth.size
    // equal visit FRACTION in both measurements: 1 of 8 cells frozen,
    // 2 of 16 retrained — same work, so the delta is pure quantizer fit
    val degraded = recall(1)
    assert(degraded < 0.8,
      s"fixture must degrade under the frozen quantizer (got $degraded) — " +
        "otherwise this test gates nothing")
    VectorIndex.retrain(spark, dir, nlist = 16)
    val restored = recall(2)
    assert(restored >= 0.8,
      s"retrain must restore recall@50 above 0.8 (degraded $degraded -> $restored)")
    // cutover hygiene: new generation live, the old one retained for
    // in-flight readers (one-generation grace — probes during the
    // retrain keep serving it), replay state + fingerprint survive
    val rootAfter = graft.operators.IndexMaintenance.liveRoot(conf, dir)
    assert(rootAfter != rootBefore, "retrain must cut over a new generation")
    val oldFs = new org.apache.hadoop.fs.Path(rootBefore).getFileSystem(conf)
    assert(oldFs.exists(new org.apache.hadoop.fs.Path(s"$rootBefore/cells")),
      "the retired generation must survive the cutover (reader grace)")
    assert(VectorIndex.isFresh(spark, dir, all),
      "the meta fingerprint must survive the retrain")
    // the append replay record survives too (it lives outside the data
    // generations): a replayed drift batch would still skip its merge
    assert(graft.operators.Fingerprint.wasApplied(conf, dir, "drift1",
      graft.operators.Fingerprint.of(delta, Seq("vec_id", "embedding"))),
      "the append's merge record must survive the retrain cutover")
    // default nlist (-1) keeps the current cell count
    VectorIndex.retrain(spark, dir)
    assert(VectorIndex.loadCentroids(spark, dir).size == 16,
      "retrain without nlist must keep the current cell count")
    assert(recall(4) >= 0.8, "an idempotent re-retrain must not hurt recall")
  }
}
