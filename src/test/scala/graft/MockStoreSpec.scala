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
}
