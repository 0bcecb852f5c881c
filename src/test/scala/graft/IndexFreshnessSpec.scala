package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{ClusterIndex, Fingerprint, TextIndex, VectorIndex}

/** The FS-metadata freshness fast-path (VERDICT r9 item 2): an ensure()
  * against an UNCHANGED corpus must answer "fresh" from file metadata
  * alone — no Spark job, no corpus bytes read — while any drift (regen
  * in place, a different filter over the same files, an in-memory
  * corpus) still reaches the content-hash authority and rebuilds when
  * it must.
  *
  * The no-bytes assertion is synchronous and listener-free: the corpus
  * lives under the registered `mock://` scheme ([[CountingMockFs]])
  * which counts every data `open()`; a Spark job scanning the corpus
  * cannot avoid that method, while `getFileStatus`/`listStatus`
  * metadata calls never enter it. The same scheme doubles as the
  * store-agnosticism gate (VERDICT r9 item 3) in MockStoreSpec.
  */
class IndexFreshnessSpec extends SparkSpec {
  import spark.implicits._

  private def mockDir(prefix: String): String =
    "mock://" + java.nio.file.Files.createTempDirectory(prefix).toString

  private def localPath(mockUri: String): String =
    mockUri.stripPrefix("mock://")

  /** (name, mtime) of every DATA file under a dir — rebuild detector.
    * Recurses via listStatus (listFiles' LocatedFileStatus eagerly loads
    * permissions through java.io.File, which rejects foreign schemes)
    * and skips the `srcstat` bookkeeping file, whose presence tracks the
    * fast-path record, not the indexed data. */
  private def listing(dir: String): Set[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(q: Path): Seq[(String, Long)] =
      fs.listStatus(q).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName == "srcstat") Seq.empty
        else Seq((st.getPath.toUri.getPath, st.getModificationTime))
      }
    if (!fs.exists(p)) Set.empty else walk(p).toSet
  }

  private def vecCorpus(n: Int, dim: Int = 4, shift: Float = 0f) =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(d => math.sin(i * 37 + d).toFloat + shift))
    }.toDF("vec_id", "embedding")

  test("unchanged corpus: ensure() reads ZERO corpus bytes and does not rebuild") {
    CountingMockFs.install(spark)
    val src = mockDir("fresh_src")
    val idx = java.nio.file.Files.createTempDirectory("fresh_idx").toString
    vecCorpus(64).write.mode("overwrite").parquet(s"$src/emb.parquet")
    VectorIndex.ensure(spark.read.parquet(s"$src/emb.parquet"), idx, nlist = 4)
    val built = listing(idx)
    assert(built.nonEmpty)
    // a fresh read models the production query path: schema inference
    // (one driver-side footer read) happens HERE, at session/catalog
    // level — the assertion is about ensure() itself
    val again = spark.read.parquet(s"$src/emb.parquet")
    CountingMockFs.reset()
    VectorIndex.ensure(again, idx, nlist = 4)
    assert(CountingMockFs.opensUnder(localPath(src)) == 0,
      "fast-path freshness must not open any corpus file")
    assert(listing(idx) == built, "unchanged corpus must not rebuild")
    // positive control on the SAME counter: the content-hash path (no
    // status record) does open corpus files — the counter is live
    Fingerprint.clearSourceStatus(spark.sparkContext.hadoopConfiguration, idx)
    CountingMockFs.reset()
    VectorIndex.ensure(spark.read.parquet(s"$src/emb.parquet"), idx, nlist = 4)
    assert(CountingMockFs.opensUnder(localPath(src)) > 0,
      "hash fallback should have scanned the corpus (counter dead?)")
    assert(listing(idx) == built, "hash fallback on same bytes must not rebuild")
  }

  test("in-place regen defeats the fast path and triggers a rebuild") {
    CountingMockFs.install(spark)
    val src = mockDir("regen_src")
    val idx = java.nio.file.Files.createTempDirectory("regen_idx").toString
    vecCorpus(64).write.mode("overwrite").parquet(s"$src/emb.parquet")
    VectorIndex.ensure(spark.read.parquet(s"$src/emb.parquet"), idx, nlist = 4)
    val built = listing(idx)
    // same row count, different bytes — the r8 driver-regen hazard
    vecCorpus(64, shift = 0.25f).write.mode("overwrite").parquet(s"$src/emb.parquet")
    val regen = spark.read.parquet(s"$src/emb.parquet")
    assert(!VectorIndex.isFresh(spark, idx, regen))
    VectorIndex.ensure(regen, idx, nlist = 4)
    assert(listing(idx) != built, "regenerated corpus must rebuild the index")
    assert(VectorIndex.isFresh(spark, idx, regen))
  }

  test("same files through a different filter cannot fast-match (plan hash)") {
    CountingMockFs.install(spark)
    val src = mockDir("filt_src")
    val idx = java.nio.file.Files.createTempDirectory("filt_idx").toString
    vecCorpus(64).write.mode("overwrite").parquet(s"$src/emb.parquet")
    def all = spark.read.parquet(s"$src/emb.parquet")
    VectorIndex.ensure(all.filter(col("vec_id") < 32L), idx, nlist = 4)
    // identical files, different predicate => different corpus content;
    // the status record must NOT answer fresh (clusterIndexProbe-style
    // callers index filtered views of a shared table)
    assert(!Fingerprint.statusFresh(idx, all.filter(col("vec_id") < 48L)),
      "a different filter over the same files must not fast-match")
    assert(Fingerprint.statusFresh(idx, all.filter(col("vec_id") < 32L)),
      "the identical filtered view must fast-match")
    // end to end: ensure() with the wider filter rebuilds to 48 rows
    VectorIndex.ensure(all.filter(col("vec_id") < 48L), idx, nlist = 4)
    assert(spark.read.parquet(s"$idx/cells").count() == 48L)
  }

  test("non-file corpus records no status and stays on the hash authority") {
    val idx = java.nio.file.Files.createTempDirectory("mem_idx").toString
    val mem = vecCorpus(32) // in-memory LocalRelation: no file statuses exist
    assert(Fingerprint.sourceStatus(mem).isEmpty)
    VectorIndex.ensure(mem, idx, nlist = 4)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(!new Path(s"$idx/srcstat").getFileSystem(conf)
      .exists(new Path(s"$idx/srcstat")), "no status record for a non-file corpus")
    val built = listing(idx)
    VectorIndex.ensure(mem, idx, nlist = 4) // hash path: same content, no rebuild
    assert(listing(idx) == built)
    VectorIndex.ensure(vecCorpus(33), idx, nlist = 4) // drift: rebuild
    assert(listing(idx) != built)
  }

  test("append drops the status record; freshness reverts to the hash authority") {
    CountingMockFs.install(spark)
    val src = mockDir("app_src")
    val idx = java.nio.file.Files.createTempDirectory("app_idx").toString
    val docs = (0 until 20)
      .map(i => (i.toLong, s"the quick brown fox $i jumps over the lazy dog"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$src/docs.parquet")
    def corpus = spark.read.parquet(s"$src/docs.parquet")
    TextIndex.ensure(corpus, "doc_id", "text", idx)
    val conf = spark.sparkContext.hadoopConfiguration
    val stat = new Path(s"$idx/srcstat")
    assert(stat.getFileSystem(conf).exists(stat), "build must record the status")
    assert(Fingerprint.statusFresh(idx, corpus))
    val delta = Seq((100L, "an entirely novel delta document about ships"))
      .toDF("doc_id", "text")
    TextIndex.append(delta, "doc_id", "text", idx, tag = "b1")
    assert(!stat.getFileSystem(conf).exists(stat),
      "append must drop the build-time status record")
    // hash authority takes over: index == build corpus + delta
    assert(!TextIndex.isFresh(spark, idx, corpus, "doc_id", "text"))
    assert(TextIndex.isFresh(spark, idx, corpus.unionByName(delta), "doc_id", "text"))
  }

  test("recordCorpusStatus re-arms the fast path after appends and compaction") {
    CountingMockFs.install(spark)
    val src = mockDir("rearm_src")
    val idx = java.nio.file.Files.createTempDirectory("rearm_idx").toString + "/tidx"
    val docs = (0 until 20)
      .map(i => (i.toLong, s"the quick brown fox $i jumps over the lazy dog"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$src/docs.parquet")
    val delta = Seq((100L, "an entirely novel delta document about ships"))
      .toDF("doc_id", "text")
    def corpus = spark.read.parquet(s"$src/docs.parquet")
    TextIndex.ensure(corpus, "doc_id", "text", idx)
    TextIndex.append(delta, "doc_id", "text", idx, tag = "r1") // clears srcstat
    TextIndex.compact(spark, idx) // generation cutover: g1
    // the corpus of record is file-backed: build files + the appended
    // delta persisted beside them
    delta.write.mode("overwrite").parquet(s"$src/delta.parquet")
    // bound once: re-deriving the frame after the reset would re-infer
    // the parquet schema (one footer open) and muddy the zero-bytes count
    val record = spark.read.parquet(s"$src/docs.parquet", s"$src/delta.parquet")
    // a WRONG corpus is refused — recording it would serve stale as fresh
    val ex = intercept[IllegalArgumentException] {
      Fingerprint.recordCorpusStatus(spark, idx, corpus, Seq("doc_id", "text"))
    }
    assert(ex.getMessage.contains("corpus of record"))
    // the true corpus of record records fine (one content-hash scan)...
    Fingerprint.recordCorpusStatus(spark, idx, record, Seq("doc_id", "text"))
    // ...and ensure() is again a zero-corpus-bytes metadata check, with
    // the meta presence resolved through the post-compaction generation
    CountingMockFs.reset()
    TextIndex.ensure(record, "doc_id", "text", idx)
    assert(CountingMockFs.opensUnder(localPath(src)) == 0,
      "re-armed fast path must read no corpus bytes")
    assert(graft.operators.IndexMaintenance.liveRoot(
      spark.sparkContext.hadoopConfiguration, idx) == s"$idx/g1",
      "ensure must not have rebuilt (rebuild writes into the live root)")
  }

  test("a status record cannot answer fresh over a wiped meta table") {
    // srcstat is written LAST, but a manual partial wipe (meta gone,
    // srcstat surviving) must degrade to stale-and-rebuild, never to a
    // false fresh over a gutted index
    CountingMockFs.install(spark)
    val src = mockDir("wipe_src")
    val idx = java.nio.file.Files.createTempDirectory("wipe_idx").toString
    vecCorpus(32).write.mode("overwrite").parquet(s"$src/emb.parquet")
    def corpus = spark.read.parquet(s"$src/emb.parquet")
    VectorIndex.ensure(corpus, idx, nlist = 4)
    assert(Fingerprint.statusFresh(idx, corpus))
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = new Path(s"$idx/meta")
    meta.getFileSystem(conf).delete(meta, true)
    assert(!Fingerprint.statusFresh(idx, corpus),
      "statusFresh must not vouch for an index whose meta is gone")
    VectorIndex.ensure(corpus, idx, nlist = 4) // hash path -> readMeta None -> rebuild
    assert(VectorIndex.isFresh(spark, idx, corpus), "ensure must have rebuilt meta")
  }

  test("cluster index shares the fast path (the CC family's warmup gate)") {
    CountingMockFs.install(spark)
    val src = mockDir("cc_src")
    val idx = java.nio.file.Files.createTempDirectory("cc_idx").toString
    val docs = (0 until 24)
      .map(i => (i.toLong, s"shared prefix tokens alpha beta gamma delta doc $i"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$src/docs.parquet")
    ClusterIndex.ensure(spark.read.parquet(s"$src/docs.parquet"),
      "doc_id", "text", idx)
    val built = listing(s"$idx/assign")
    val again = spark.read.parquet(s"$src/docs.parquet")
    CountingMockFs.reset()
    ClusterIndex.ensure(again, "doc_id", "text", idx)
    assert(CountingMockFs.opensUnder(localPath(src)) == 0,
      "unchanged corpus: the PPJoin+CC guard must cost zero corpus bytes")
    assert(listing(s"$idx/assign") == built)
  }
}
