package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Single-call RTBF orchestrator (VERDICT r17 item 1): one
  * [[Rtbf.purge]] drives the lake TargetedDelete plus all four index
  * families' physical verbs under ONE batch tag, resumes from any
  * crash boundary, and refuses to call itself COMPLETE while any store
  * still holds a victim. */
class RtbfSpec extends SparkSpec {
  import spark.implicits._

  private def span(a: Int, b: Int): String =
    (a until b).map(i => s"w$i").mkString(" ")

  /** 8 docs: a near-dup chain 1-2-3 (2 is the bridge), pair 4-5,
    * singletons 6/7/8 — enough structure that the cluster family's
    * re-split actually runs. Deterministic 4-dim embeddings. */
  private def fixture(tmpTag: String): (String, RtbfTargets) = {
    val base = java.nio.file.Files.createTempDirectory(tmpTag).toString
    val docs = Seq(
      (1L, span(0, 50)), (2L, span(5, 55)), (3L, span(10, 60)),
      (4L, span(100, 150)), (5L, span(105, 155)),
      (6L, span(200, 260)), (7L, span(300, 360)), (8L, span(400, 460)))
      .toDF("doc_id", "text")
      .withColumn("src", (col("doc_id") % 2).cast("string"))
    val emb = (1L to 8L).map(i => (i,
        Array(i.toFloat, (i * 3 % 7).toFloat, (i * 5 % 11).toFloat, 1.0f),
        (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val lake = s"$base/lake"
    val vecLake = s"$base/veclake"
    docs.write.partitionBy("src").parquet(lake)
    emb.write.partitionBy("label").parquet(vecLake)
    val t = RtbfTargets(
      lakeDir = lake, lakePartitionCols = Seq("src"),
      textIndex = Some(s"$base/textidx"),
      clusterIndex = Some(s"$base/clusteridx"),
      termIndex = Some(s"$base/termidx"),
      vectorIndex = Some(s"$base/vecidx"),
      vecLakeDir = Some(vecLake), vecLakePartitionCols = Seq("label"))
    val docsIdx = docs.select(col("doc_id"), col("text"))
    TextIndex.build(docsIdx, "doc_id", "text", t.textIndex.get)
    ClusterIndex.build(docsIdx, "doc_id", "text", t.clusterIndex.get)
    TermIndex.build(docsIdx, "doc_id", "text", t.termIndex.get)
    VectorIndex.build(emb.select(col("vec_id"), col("embedding")),
      t.vectorIndex.get, nlist = 2)
    (base, t)
  }

  private def victimRows(t: RtbfTargets, s: org.apache.spark.sql.SparkSession,
                         ids: Seq[Long]) = {
    val vic = s.read.parquet(t.lakeDir)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("text")).localCheckpoint()
    val vecVic = s.read.parquet(t.vecLakeDir.get)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    (vic, vecVic)
  }

  private def victimsEverywhere(t: RtbfTargets, ids: Seq[Long]): Map[String, Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def root(d: String) = IndexMaintenance.liveRoot(conf, d)
    Map(
      "lake.doc" -> spark.read.parquet(t.lakeDir)
        .filter(col("doc_id").isin(ids: _*)).count(),
      "lake.vec" -> spark.read.parquet(t.vecLakeDir.get)
        .filter(col("vec_id").isin(ids: _*)).count(),
      "idx.text" -> spark.read.parquet(s"${root(t.textIndex.get)}/bands")
        .filter(col("doc_id").isin(ids: _*)).count(),
      "idx.cluster" -> ClusterIndex.assignments(spark, t.clusterIndex.get, "doc_id")
        .filter(col("doc_id").isin(ids: _*)).count(),
      "idx.term" -> spark.read.parquet(s"${root(t.termIndex.get)}/dl")
        .filter(col("doc_id").isin(ids: _*)).count(),
      "idx.vector" -> spark.read.parquet(s"${root(t.vectorIndex.get)}/cells")
        .filter(col("vec_id").isin(ids: _*)).count(),
    ).filter(_._2 > 0L)
  }

  test("one purge call scrubs all six stores, reports per-store, and replays as a no-op") {
    val (_, t) = fixture("rtbf_happy")
    val victims = Seq(2L, 6L) // 2 = the 1-2-3 bridge: forces a re-split
    val (vic, vecVic) = victimRows(t, spark, victims)
    val r = Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1")
    assert(r.complete && r.nVictims == 2L && r.nVecVictims == 2L, s"$r")
    assert(r.stores.map(_.store) == Seq("idx.text", "idx.cluster",
      "idx.term", "idx.vector", "lake.vec", "lake.doc"), s"$r")
    assert(r.stores.forall(!_.skippedDone), "first run must execute every store")
    assert(victimsEverywhere(t, victims).isEmpty,
      s"leftovers: ${victimsEverywhere(t, victims)}")
    // the bridge removal split 1-2-3: survivors 1 and 3 now separate
    val comp = ClusterIndex.assignments(spark, t.clusterIndex.get, "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(comp(1L) != comp(3L) || comp(1L) == 1L && comp(3L) == 3L,
      s"bridge must split the component: $comp")
    // replay: same (tag, victims) — every store skips on its marker
    val r2 = Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1")
    assert(r2.complete && r2.stores.forall(_.skippedDone), s"$r2")
    // and the console reads it as complete
    val st = Rtbf.status(spark.sparkContext.hadoopConfiguration, t.lakeDir)
    assert(st.map(_.tag) == Seq("gdpr1") && st.head.complete &&
      st.head.incomplete.isEmpty, s"$st")
  }

  test("tag reuse with a different victim batch refuses") {
    val (_, t) = fixture("rtbf_reuse")
    val (vic, vecVic) = victimRows(t, spark, Seq(6L))
    Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1")
    val (vic2, vecVic2) = victimRows(t, spark, Seq(7L))
    val e = intercept[Fingerprint.RemovalRefused] {
      Rtbf.purge(vic2, Some(vecVic2), t, tag = "gdpr1")
    }
    assert(e.getMessage.contains("different victim batch"), e.getMessage)
  }

  test("crash at store k: status names the owed stores, IndexAdmin names the crashed index, resume converges") {
    val (_, t) = fixture("rtbf_crash")
    val conf = spark.sparkContext.hadoopConfiguration
    val victims = Seq(2L, 6L)
    val (vic, vecVic) = victimRows(t, spark, victims)
    // die INSIDE the term verb (after its removal state committed): the
    // other three index verbs run CONCURRENTLY and complete — more
    // done-markers per attempt — term is mid-protocol, and the lakes
    // never start while a serve surface still holds victims
    intercept[FaultInjection.InjectedCrash] {
      FaultInjection.armed("term.remove.state")(
        Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1"))
    }
    val st = Rtbf.status(conf, t.lakeDir)
    assert(st.size == 1 && !st.head.complete, s"$st")
    assert(st.head.done == Set("idx.text", "idx.cluster", "idx.vector"),
      s"$st")
    assert(st.head.incomplete == Seq("idx.term", "lake.vec", "lake.doc"),
      s"the console must name exactly what the purge still owes: $st")
    // the crashed index family names its own pending removal
    assert(IndexAdmin.report(conf, t.termIndex.get).pendingRemovals
      .exists(_.contains("gdpr1")),
      "IndexAdmin on the crashed index must surface the pending removal")
    // lakes untouched so far (they come last by design)
    val mid = victimsEverywhere(t, victims)
    assert(mid.contains("lake.doc") && mid.contains("lake.vec"), s"$mid")
    // resume from the manifest alone — no victim rows re-passed
    val r = Rtbf.resume(spark, t, tag = "gdpr1")
    assert(r.complete, s"$r")
    assert(r.stores.filter(_.skippedDone).map(_.store).toSet ==
      Set("idx.text", "idx.cluster", "idx.vector"), s"$r")
    assert(victimsEverywhere(t, victims).isEmpty,
      s"leftovers after resume: ${victimsEverywhere(t, victims)}")
    assert(Rtbf.status(conf, t.lakeDir).head.complete)
  }

  test("a crash between verb and done-marker replays the verb idempotently") {
    val (_, t) = fixture("rtbf_marker")
    val (vic, vecVic) = victimRows(t, spark, Seq(6L))
    intercept[FaultInjection.InjectedCrash] {
      FaultInjection.armed("rtbf.verb.idx.cluster")(
        Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1"))
    }
    val st0 = Rtbf.status(spark.sparkContext.hadoopConfiguration, t.lakeDir)
    assert(st0.head.done == Set("idx.text", "idx.term", "idx.vector"),
      s"cluster verb ran but its marker must be absent: $st0")
    val r = Rtbf.resume(spark, t, tag = "gdpr1")
    assert(r.complete, s"$r")
    assert(victimsEverywhere(t, Seq(6L)).isEmpty)
  }

  test("logical purge: every serve surface blind, lakes scrubbed, raw index rows remain for compact") {
    val (_, t) = fixture("rtbf_logical")
    val conf = spark.sparkContext.hadoopConfiguration
    def root(d: String) = IndexMaintenance.liveRoot(conf, d)
    val victims = Seq(2L, 6L) // 2 = the 1-2-3 bridge: the serve re-split runs
    val (vic, vecVic) = victimRows(t, spark, victims)
    val r = Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1", logical = true)
    assert(r.complete && r.stores.map(_.store).size == 6, s"$r")
    // serve surfaces blind: each family's overlay-aware read has no victims
    def servedVictims(dir: String, raw: String, idC: String): Long =
      LogicalDelete.hide(spark.read.parquet(s"${root(dir)}/$raw"),
        idC, LogicalDelete.ids(spark, dir))
        .filter(col(idC).isin(victims: _*)).count()
    assert(servedVictims(t.textIndex.get, "bands", "doc_id") == 0L)
    assert(servedVictims(t.termIndex.get, "dl", "doc_id") == 0L)
    assert(servedVictims(t.vectorIndex.get, "cells", "vec_id") == 0L)
    val comp = ClusterIndex.assignments(spark, t.clusterIndex.get, "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(!comp.contains(2L) && !comp.contains(6L), s"$comp")
    assert(comp(1L) != comp(3L) || comp(1L) == 1L && comp(3L) == 3L,
      s"the served map must re-split the bridged component: $comp")
    // lakes scrub PHYSICALLY in both modes (the actual RTBF obligation)
    assert(spark.read.parquet(t.lakeDir)
      .filter(col("doc_id").isin(victims: _*)).count() == 0L)
    assert(spark.read.parquet(t.vecLakeDir.get)
      .filter(col("vec_id").isin(victims: _*)).count() == 0L)
    // ...but the index ROWS remain on disk, awaiting each family's
    // compact — that is what "logical" buys (no rewrite wall)
    assert(spark.read.parquet(s"${root(t.textIndex.get)}/bands")
      .filter(col("doc_id").isin(victims: _*)).count() > 0L,
      "a logical purge must NOT rewrite the text index")
    assert(spark.read.parquet(s"${root(t.termIndex.get)}/dl")
      .filter(col("doc_id").isin(victims: _*)).count() > 0L)
    // replay: same (tag, victims, mode) — every store skips on its marker
    val r2 = Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1", logical = true)
    assert(r2.complete && r2.stores.forall(_.skippedDone), s"$r2")
    // the mode rides the manifest: replaying the tag PHYSICALLY refuses,
    // and the ops console names the mode
    val e = intercept[Fingerprint.RemovalRefused] {
      Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1")
    }
    assert(e.getMessage.contains("planned as a logical purge"), e.getMessage)
    val st = Rtbf.status(conf, t.lakeDir)
    assert(st.size == 1 && st.head.mode == "logical", s"$st")
  }

  test("resume refuses when no manifest committed") {
    val (_, t) = fixture("rtbf_nomanifest")
    val e = intercept[Fingerprint.RemovalRefused] {
      Rtbf.resume(spark, t, tag = "ghost")
    }
    assert(e.getMessage.contains("no committed purge manifest"), e.getMessage)
  }

  test("resume with narrower targets than the manifest planned refuses up front") {
    val (_, t) = fixture("rtbf_narrow")
    val (vic, vecVic) = victimRows(t, spark, Seq(6L))
    intercept[FaultInjection.InjectedCrash] {
      FaultInjection.armed("rtbf.verb.lake.vec")(
        Rtbf.purge(vic, Some(vecVic), t, tag = "gdpr1"))
    }
    val e = intercept[Fingerprint.RemovalRefused] {
      Rtbf.resume(spark, t.copy(vectorIndex = None), tag = "gdpr1")
    }
    assert(e.getMessage.contains("planned against stores"), e.getMessage)
    // the original targets converge as usual
    assert(Rtbf.resume(spark, t, tag = "gdpr1").complete)
  }
}
