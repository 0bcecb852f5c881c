package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextIndex}

/** The persisted text near-dup index lifecycle: build once, probe every
  * ingest. The probe must return EXACTLY the self-contained asymmetric
  * operator's answer (same hash family via the persisted meta row), the
  * bucket restriction must prune index partitions at the FILE level —
  * the reason the index exists — and append must make later dumps
  * immediately probe-visible. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def split(dir: String) = {
    val docs = Tables.documents(spark, dir)
    (docs.filter(col("source") =!= "src19"),
      docs.filter(col("source") === "src19"))
  }

  test("probe == the self-contained asymmetric near-dup on the same corpus") {
    val (ref, inc) = split(sf0001)
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(ref, "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIndex = rows(TextIndex.probe(spark, dir, inc, "doc_id", "text"))
    val fresh = rows(Dedup.minhashNearDupsAgainst(ref, inc, "doc_id", "text"))
    assert(fresh.nonEmpty, "fixture must contain cross-side near-dups")
    assert(viaIndex == fresh,
      s"indexed probe diverged from the fresh operator:\n$viaIndex\nvs\n$fresh")
  }

  test("compact folds accreted append files; probes, freshness and replay state survive") {
    val (ref, inc) = split(sf0001)
    val dir = java.nio.file.Files.createTempDirectory("textidxc").toString + "/idx"
    TextIndex.build(ref, "doc_id", "text", dir)
    val batch = inc.limit(3).localCheckpoint()
    TextIndex.append(batch, "doc_id", "text", dir, tag = "t0")
    TextIndex.append(inc.limit(5).localCheckpoint(), "doc_id", "text", dir, tag = "t1")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = rows(TextIndex.probe(spark, dir, inc, "doc_id", "text"))
    def filesPerDir(table: String): Map[String, Int] = {
      // resolve the live generation root like the operators do
      val live = graft.operators.IndexMaintenance.liveRoot(
        spark.sparkContext.hadoopConfiguration, dir)
      val root = new java.io.File(s"$live/$table")
      root.listFiles().filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    assert(filesPerDir("bands").values.exists(_ > 1),
      "appends must have accreted multiple files in at least one hb dir")
    TextIndex.compact(spark, dir)
    assert(filesPerDir("bands").values.forall(_ == 1), "one file per hb dir")
    assert(filesPerDir("toks").values.forall(_ == 1), "one file per idb dir")
    assert(rows(TextIndex.probe(spark, dir, inc, "doc_id", "text")) === before,
      "probe answers must be identical after compaction")
    // provenance survives compaction (the _src data column is kept
    // verbatim, so excludeTag replay guards keep working)
    val liveRoot = graft.operators.IndexMaintenance.liveRoot(
      spark.sparkContext.hadoopConfiguration, dir)
    assert(liveRoot == s"$dir/g1", s"cutover must move the root: $liveRoot")
    val srcs = spark.read.parquet(s"$liveRoot/bands").select(col("_src"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(srcs === Set("build", "t0", "t1"), s"provenance lost: $srcs")
    // the fingerprint still matches the corpus of record
    val rec = ref.unionByName(inc.limit(3)).unionByName(inc.limit(5))
    assert(TextIndex.isFresh(spark, dir, rec, "doc_id", "text"))
  }

  test("probe prunes the band table at the file level via its hash buckets") {
    val (ref, _) = split(sf0001)
    val dir = java.nio.file.Files.createTempDirectory("textidx2").toString
    TextIndex.build(ref, "doc_id", "text", dir, nBuckets = 16)
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val bandsT = spark.read.parquet(s"$dir/bands")
    val all = filesTouched(bandsT)
    val pruned = filesTouched(bandsT.filter(col("hb").isin(0L, 1L)))
    assert(pruned < all, s"bucket filter must skip files: touched $pruned of $all")
    val p = bandsT.filter(col("hb") === 0L).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*hb[^\\]]*\\].*"),
      s"bucket restriction did not reach the scan's partition filters:\n$p")
  }

  test("ensure rebuilds when the corpus is regenerated in place, not otherwise") {
    val srcDir = java.nio.file.Files.createTempDirectory("textsrc").toString
    val dir = java.nio.file.Files.createTempDirectory("textidx4").toString
    val all = Tables.documents(spark, sf0001)
    all.filter(col("doc_id") < 200L)
      .write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    def corpus = spark.read.parquet(s"$srcDir/documents.parquet")
    TextIndex.ensure(corpus, "doc_id", "text", dir)
    val meta = new java.io.File(s"$dir/meta/_SUCCESS")
    val built = meta.lastModified()
    TextIndex.ensure(corpus, "doc_id", "text", dir) // same bytes: no rebuild
    assert(meta.lastModified() == built, "unchanged corpus must not rebuild")
    // regenerate IN PLACE with different content
    all.filter(col("doc_id") < 100L)
      .write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    assert(!TextIndex.isFresh(spark, dir, corpus, "doc_id", "text"))
    TextIndex.ensure(corpus, "doc_id", "text", dir)
    assert(meta.lastModified() > built, "regenerated corpus must trigger rebuild")
    assert(TextIndex.isFresh(spark, dir, corpus, "doc_id", "text"))
  }

  test("append under the frozen hash family; later probes find the appended doc") {
    val (ref, _) = split(sf0001)
    val dir = java.nio.file.Files.createTempDirectory("textidx3").toString
    TextIndex.build(ref, "doc_id", "text", dir)
    // a doc UNSEEN by the index: probing it first finds nothing...
    val novel = Seq((700001L, (0 until 25).map(i => s"novel_tok_$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(TextIndex.probe(spark, dir, novel, "doc_id", "text").count() == 0L)
    // ...append it, and a re-crawl of the same text now flags against it
    TextIndex.append(novel, "doc_id", "text", dir)
    val recrawl = novel.select(lit(700002L).as("doc_id"), col("text"))
    val hit = TextIndex.probe(spark, dir, recrawl, "doc_id", "text").collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 700001L
      && hit.head.getDouble(2) == 1.0,
      s"appended doc must be probe-visible: ${hit.mkString(", ")}")
    // and the staleness fingerprint absorbed the delta in step
    assert(!TextIndex.isFresh(spark, dir, ref, "doc_id", "text"))
    assert(TextIndex.isFresh(spark, dir,
      ref.select(col("doc_id"), col("text")).unionAll(novel), "doc_id", "text"))
  }

  /** Strip the ingest-provenance column from the persisted band table —
    * simulates an index written before _src existed. */
  private def stripSrc(dir: String): Unit = {
    val legacy = spark.read.parquet(s"$dir/bands").drop("_src").localCheckpoint()
    legacy.write.mode("overwrite").partitionBy("hb").parquet(s"$dir/bands")
  }

  test("excludeTag probe is null-safe: pre-provenance rows stay visible (ADVICE r9)") {
    def txt(seed: Int) = (0 until 25).map(i => s"ntok${seed}_$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("textidx5").toString
    TextIndex.build(Seq((1L, txt(1))).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    stripSrc(dir) // doc 1's band rows now carry _src = null (or no _src)
    TextIndex.append(Seq((2L, txt(2))).toDF("doc_id", "text"),
      "doc_id", "text", dir, tag = "t2")
    // replaying batch t2 re-crawls doc 1: the legacy copy MUST still flag
    // it — with a null-unsafe `=!=` the _src=null rows evaluate NULL and
    // the whole pre-upgrade corpus silently vanishes from the probe
    val hit = TextIndex.probe(spark, dir,
      Seq((900L, txt(1))).toDF("doc_id", "text"), "doc_id", "text",
      excludeTag = Some("t2")).collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 1L,
      s"legacy (_src-less) index rows must survive excludeTag: ${hit.mkString(",")}")
  }

  test("ensure treats an index without _src as stale and rebuilds it") {
    def txt(seed: Int) = (0 until 25).map(i => s"etok${seed}_$i").mkString(" ")
    val docs = Seq((1L, txt(1)), (2L, txt(2))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("textidx6").toString
    TextIndex.ensure(docs, "doc_id", "text", dir)
    stripSrc(dir)
    assert(!spark.read.parquet(s"$dir/bands").columns.contains("_src"))
    // fingerprint still matches, but the missing provenance column alone
    // must force the rebuild — probe's replay guard can't work without it
    assert(TextIndex.isFresh(spark, dir, docs, "doc_id", "text"))
    TextIndex.ensure(docs, "doc_id", "text", dir)
    assert(spark.read.parquet(s"$dir/bands").columns.contains("_src"),
      "ensure must rebuild a pre-provenance index")
  }

  test("build clears replay bookkeeping: stale applied/ markers and tagfp/ records") {
    def txt(seed: Int) = (0 until 25).map(i => s"ctok${seed}_$i").mkString(" ")
    val docs = Seq((1L, txt(1))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("textidx7").toString
    TextIndex.build(docs, "doc_id", "text", dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // leftover markers from the PREVIOUS build generation: without the
    // clear, a replayed batch would be skipped though its rows were wiped
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/applied/ckX_b0"), true).close()
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/tagfp/ckX_b0"), true).close()
    TextIndex.build(docs, "doc_id", "text", dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/applied")),
      "rebuild must wipe applied/ markers from the previous generation")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tagfp")),
      "rebuild must wipe tagfp/ merge records from the previous generation")
  }

  test("replayed append merges the fingerprint once; a new delta under the same tag still merges") {
    def txt(seed: Int) = (0 until 25).map(i => s"ftok${seed}_$i").mkString(" ")
    val base = Seq((1L, txt(1))).toDF("doc_id", "text")
    val d1 = Seq((2L, txt(2))).toDF("doc_id", "text")
    val d2 = Seq((3L, txt(3))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("textidx8").toString
    TextIndex.build(base, "doc_id", "text", dir)
    TextIndex.append(d1, "doc_id", "text", dir, tag = "b1")
    val rec = base.unionAll(d1)
    assert(TextIndex.isFresh(spark, dir, rec, "doc_id", "text"))
    // crash-replay: same tag, same delta — rows re-append (tolerated) but
    // the fingerprint must NOT merge twice (ADVICE r9: double-merge means
    // meta drifts from the corpus of record and every later ensure()
    // triggers a spurious full rebuild)
    TextIndex.append(d1, "doc_id", "text", dir, tag = "b1")
    assert(TextIndex.isFresh(spark, dir, rec, "doc_id", "text"),
      "replayed append must not drift the fingerprint")
    // but a DIFFERENT delta reusing the tag is a legitimate append
    TextIndex.append(d2, "doc_id", "text", dir, tag = "b1")
    val rec2 = rec.unionAll(d2)
    assert(TextIndex.isFresh(spark, dir, rec2, "doc_id", "text"),
      "a new delta under a reused tag must still merge")
    // crash-replay of the OLDER batch under the reused tag: the tagfp
    // record is a SET, not last-pair-only — d1's fingerprint is still on
    // record, so it must not merge a second time (a last-pair record
    // would see only d2 and drift meta forever)
    TextIndex.append(d1, "doc_id", "text", dir, tag = "b1")
    assert(TextIndex.isFresh(spark, dir, rec2, "doc_id", "text"),
      "replay of an earlier same-tag batch must not re-merge")
  }
}
