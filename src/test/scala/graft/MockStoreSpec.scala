package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{TargetedDelete, TextIndex}

/** Store-agnosticism (VERDICT r9 item 3): the lake and index lifecycles
  * must run against a NON-`file:` Hadoop FileSystem scheme — the
  * sandbox's closest approximation of the S3 deployment target. Any
  * `java.io.File` shortcut, hard-coded `file:` scheme, or URI-handling
  * slip (input_file_name returns scheme-qualified URIs) fails here.
  */
class MockStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mockDir(prefix: String): String =
    "mock://" + java.nio.file.Files.createTempDirectory(prefix).toString

  test("targeted delete round-trips on a mock:// lake, preserving untouched files") {
    CountingMockFs.install(spark)
    val lake = mockDir("del_lake") + "/events"
    (1 to 40).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 4 + 1)}", s"payload $i"))
      .toDF("user_id", "day", "body")
      .write.partitionBy("day").mode("overwrite").parquet(lake)
    val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recurse via listStatus: listFiles' LocatedFileStatus eagerly loads
    // permissions through java.io.File, which rejects foreign schemes
    def walk(q: Path): Seq[String] =
      fs.listStatus(q).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st.getPath.toUri.getPath)
      }
    def files(): Set[String] = walk(new Path(lake)).toSet
    val before = files()
    // victims live only in day=2024-01-02 (i % 4 == 1 -> 1,5,...,37)
    val victims = Seq(1L, 5L, 9L).toDF("user_id")
    val rewritten = TargetedDelete.delete(spark, lake, Seq("day"), "user_id", victims)
    assert(rewritten == 1L, s"only one partition holds victims, got $rewritten")
    val after = spark.read.parquet(lake)
    assert(after.filter(col("user_id").isInCollection(Seq(1L, 5L, 9L))).count() == 0)
    assert(after.count() == 37L)
    // untouched partitions keep their very files on the foreign scheme
    val untouchedBefore = before.filter(!_.contains("day=2024-01-02"))
    val untouchedAfter = files().filter(!_.contains("day=2024-01-02"))
    assert(untouchedAfter == untouchedBefore,
      "untouched partitions must keep identical files on mock://")
  }

  test("targeted delete removes a fully-emptied partition dir on mock://") {
    CountingMockFs.install(spark)
    val lake = mockDir("del_lake2") + "/events"
    Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"))
      .toDF("user_id", "day", "body")
      .write.partitionBy("day").mode("overwrite").parquet(lake)
    // day=b's only row is a victim: the dir itself must go, via the FS
    // API on the foreign scheme (the input_file_name URI path)
    TargetedDelete.delete(spark, lake, Seq("day"), "user_id", Seq(3L).toDF("user_id"))
    val fs = new Path(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"${lake.stripPrefix("mock://")}/day=b")) &&
      !fs.exists(new Path(s"$lake/day=b")), "emptied partition dir must be removed")
    assert(spark.read.parquet(lake).count() == 2L)
  }

  test("text index lifecycle (build/probe/append/replay) lives happily on mock://") {
    CountingMockFs.install(spark)
    val src = mockDir("idx_src")
    val idx = mockDir("idx_dir") + "/textindex"
    val docs = (0 until 30)
      .map(i => (i.toLong, s"document number $i with some shared boilerplate text"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$src/docs.parquet")
    def corpus = spark.read.parquet(s"$src/docs.parquet")
    TextIndex.ensure(corpus, "doc_id", "text", idx)
    // near-copy of doc 7 must flag; novel doc must not
    val probes = Seq(
      (900L, "document number 7 with some shared boilerplate text"),
      (901L, "completely unrelated content about oceanic navigation charts"))
      .toDF("doc_id", "text")
    val hits = TextIndex.probe(spark, idx, probes, "doc_id", "text", threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(900L -> 7L), s"mock:// probe drifted: $hits")
    // append the novel doc (tagged), replay the append, re-probe excluding
    // the tag: the full crash-replay loop on the foreign scheme
    val novel = probes.filter(col("doc_id") === 901L)
    TextIndex.append(novel, "doc_id", "text", idx, tag = "b1")
    TextIndex.append(novel, "doc_id", "text", idx, tag = "b1") // crash replay
    assert(TextIndex.isFresh(spark, idx, corpus.unionByName(novel), "doc_id", "text"),
      "replayed append must merge the fingerprint exactly once on mock://")
    val re = TextIndex.probe(spark, idx, novel, "doc_id", "text",
      threshold = 0.8, excludeTag = Some("b1"))
    assert(re.count() == 0L, "a replayed batch must not flag against its own copies")
  }

  test("compaction cutover survives object-store rename semantics (copy+delete)") {
    // naren:// makes EVERY rename a non-atomic recursive copy+delete —
    // the S3A directory-"rename" reality. The pre-r11 two-rename swap
    // would leave the index absent or half-copied for the whole copy
    // window; the generation-pointer cutover must (a) never rename the
    // live tree at all and (b) keep a complete tree resolvable at every
    // moment: the old generation until the one-file pointer flip, the
    // new one after.
    NonAtomicRenameFs.install(spark)
    val idx = "naren://" +
      java.nio.file.Files.createTempDirectory("naren_idx").toString + "/textindex"
    val docs = (0 until 30)
      .map(i => (i.toLong, s"document number $i with some shared boilerplate text"))
      .toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", idx)
    val d1 = Seq((900L, "appended doc alpha with plenty of words to hash"))
      .toDF("doc_id", "text")
    TextIndex.append(d1, "doc_id", "text", idx, tag = "t0")
    val probes = Seq(
      (950L, "document number 7 with some shared boilerplate text"),
      (951L, "appended doc alpha with plenty of words to hash"))
      .toDF("doc_id", "text").localCheckpoint()
    def probeMap(): Map[Long, Long] =
      TextIndex.probe(spark, idx, probes, "doc_id", "text", threshold = 0.8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = probeMap()
    assert(before == Map(950L -> 7L, 951L -> 900L), s"fixture drifted: $before")
    val conf = spark.sparkContext.hadoopConfiguration
    val idxPath = idx.stripPrefix("naren://")
    NonAtomicRenameFs.reset()
    TextIndex.compact(spark, idx)
    // (a) the live tree itself was never the object of a rename: every
    // recorded rename stays inside the STAGED generation (Spark's own
    // commit-protocol moves) — none touches the index root or a live
    // table path as source or destination
    val outside = NonAtomicRenameFs.renames.filter { case (src, dst) =>
      !(src.startsWith(s"$idxPath/g1/") && dst.startsWith(s"$idxPath/g1/"))
    }
    assert(outside.isEmpty,
      s"cutover must not rename outside the staged generation: $outside")
    // (b) the pointer flipped and answers hold; the JUST-retired legacy
    // tables are kept one cycle (GC grace for in-flight lease-free
    // readers) and fall away on the NEXT cutover
    val im = graft.operators.IndexMaintenance
    assert(im.liveRoot(conf, idx) == s"$idx/g1")
    val fs = new Path(idx).getFileSystem(conf)
    Seq("bands", "toks", "meta").foreach(t =>
      assert(fs.exists(new Path(s"$idx/$t")),
        s"just-retired legacy table $t must survive one GC grace cycle"))
    assert(probeMap() == before, "probe answers must survive the cutover")
    // crash-mid-compact: a half-staged NEXT generation (no pointer flip)
    // is inert — readers resolve the live g1 untouched — and the next
    // compact clears the junk and converges
    fs.mkdirs(new Path(s"$idx/g2/bands"))
    fs.create(new Path(s"$idx/g2/bands/part-junk.parquet"), true).close()
    assert(im.liveRoot(conf, idx) == s"$idx/g1", "junk staging must stay inert")
    assert(probeMap() == before, "half-staged tree must not affect readers")
    TextIndex.compact(spark, idx)
    assert(im.liveRoot(conf, idx) == s"$idx/g2")
    // deferred GC: the cut to g2 drops everything OLDER than g1 (the
    // legacy tables) and keeps g1 itself for one more cycle
    Seq("bands", "toks", "meta").foreach(t =>
      assert(!fs.exists(new Path(s"$idx/$t")),
        s"legacy table $t must be GC'd after the grace cycle"))
    assert(fs.exists(new Path(s"$idx/g1")),
      "the just-retired g1 must survive one GC grace cycle")
    assert(probeMap() == before, "answers must survive the second cutover")
    TextIndex.compact(spark, idx)
    assert(im.liveRoot(conf, idx) == s"$idx/g3")
    assert(!fs.exists(new Path(s"$idx/g1")),
      "g1 must be GC'd once its grace cycle passes")
    assert(fs.exists(new Path(s"$idx/g2")), "g2 now holds the grace slot")
    assert(probeMap() == before, "answers must survive the third cutover")
    // replay state survived both cutovers at the top level: a different
    // batch under the used tag still refuses nothing here (append-mode
    // index merges fine), but the recorded (tag, fp) still suppresses a
    // replayed merge
    TextIndex.append(d1, "doc_id", "text", idx, tag = "t0") // crash replay
    assert(TextIndex.isFresh(spark, idx, docs.unionByName(d1), "doc_id", "text"),
      "replayed merge after two cutovers must not drift the fingerprint")
  }
}
