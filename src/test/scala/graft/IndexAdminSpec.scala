package graft

import org.apache.hadoop.fs.Path

import graft.operators.{FaultInjection, IndexMaintenance, TextIndex}

/** The read-only ops console must report exactly what the recovery
  * runbooks need: generation + live root, table stats, lease health
  * against the TTL, crashed removals, the recorded-but-unmarkered
  * stream batches (the tombstone-retention decision's input), and the
  * tombstone batch ages. Built on a real TextIndex lifecycle so every
  * field is read from state the REAL operators wrote. */
class IndexAdminSpec extends SparkSpec {

  private def txt(seed: Int) =
    (0 until 20).map(i => s"adm${seed}_$i").mkString(" ")

  test("report tracks a text index through build, append, marker, tombstone, compact, lease, crash, replay") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files
      .createTempDirectory("admidx").toString + "/idx"
    val fs = new Path(dir).getFileSystem(conf)

    TextIndex.build(Seq((1L, txt(1))).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    TextIndex.append(Seq((2L, txt(2))).toDF("doc_id", "text"),
      "doc_id", "text", dir, tag = "ckrun_b0")
    // a DIRECT append whose operator-chosen tag merely starts with "ck"
    // — structurally not a stream batch (no _b<id>), never markered,
    // and must never be flagged as crash-window work
    TextIndex.append(Seq((3L, txt(3))).toDF("doc_id", "text"),
      "doc_id", "text", dir, tag = "ckbackfill")
    // a second stream batch that DID reach its commit point: marker only
    // (the marker file is the commit-point artifact appliedOnce writes)
    fs.mkdirs(new Path(s"$dir/applied"))
    fs.create(new Path(s"$dir/applied/ckrun_b1"), true).close()
    // one takedown batch's tombstones
    graft.streaming.S4Stream.recordTombstones(
      Seq((9L, txt(9))).toDF("doc_id", "text"),
      "doc_id", "text", dir, tag = "td1")

    val r = IndexAdmin.report(conf, dir)
    assert(r.gen.isEmpty && r.liveRoot == IndexMaintenance.normalize(dir),
      s"never-compacted index is the legacy in-place layout: $r")
    assert(r.tables.map(_.name).toSet == Set("bands", "toks", "meta"),
      s"legacy-root table listing must exclude control dirs: ${r.tables}")
    assert(r.tables.forall(t => t.files > 0 && t.bytes > 0))
    assert(r.appendTags.contains("ckrun_b0") && r.appendTags.contains("ckbackfill"))
    assert(r.unmarkeredRecordedTags == Set("ckrun_b0"),
      "b0 recorded its merge but never reached a marker; b1 is markered; " +
        "the ck-prefixed direct append is not a stream batch")
    assert(r.appliedMarkers == Set("ckrun_b1"))
    assert(r.tombstones.map(_._1) == Seq("batch=td1"))
    assert(r.pendingRemovals.isEmpty && r.leases.isEmpty)
    val text = IndexAdmin.render(r)
    assert(text.contains("legacy (in-place)") && text.contains("ckrun_b0")
      && text.contains("batch=td1"), s"render must surface the fields:\n$text")

    // live lease appears un-expired; disappears on release
    val lease = IndexMaintenance.acquireLease(conf, dir, "write")
    val rl = IndexAdmin.report(conf, dir)
    assert(rl.leases.size == 1 && !rl.leases.head._3,
      s"fresh lease must report live: ${rl.leases}")
    IndexMaintenance.releaseLease(conf, lease)
    assert(IndexAdmin.report(conf, dir).leases.isEmpty)

    // generation cutover flips the live root and the table listing moves
    TextIndex.compact(spark, dir)
    val rc = IndexAdmin.report(conf, dir)
    assert(rc.gen.contains(1L) && rc.liveRoot == s"${IndexMaintenance.normalize(dir)}/g1",
      s"post-compact report must follow the pointer: $rc")
    assert(rc.tables.map(_.name).toSet == Set("bands", "toks", "meta"))
    // the FIRST cutover keeps the legacy top-level tables as the
    // one-generation GC-grace copy — the report must explain those bytes
    assert(rc.legacyGraceDirs == Seq("bands", "meta", "toks"),
      s"legacy grace copy must be visible: $rc")
    assert(rc.stagingGens.isEmpty)

    // a removal crashed mid-protocol surfaces as pending; replay clears it
    val victims = Seq((2L, txt(2))).toDF("doc_id", "text")
    intercept[FaultInjection.InjectedCrash] {
      FaultInjection.armed("text.meta")(
        TextIndex.remove(victims, "doc_id", "text", dir, tag = "t9"))
    }
    val rp = IndexAdmin.report(conf, dir)
    assert(rp.pendingRemovals == Set("rm.t9"),
      s"crashed removal must surface: $rp")
    val crashedLine = IndexAdmin.render(rp).linesIterator
      .find(_.contains("CRASHED removals")).get
    // the replay instruction must name the BARE tag — telling the
    // operator to pass "rm.t9" back to remove() would start a NEW
    // removal the pending guard refuses
    assert(crashedLine.contains("t9") && !crashedLine.contains("rm.t9"),
      s"replay instruction must use the bare tag: $crashedLine")
    TextIndex.remove(victims, "doc_id", "text", dir, tag = "t9")
    val rr = IndexAdmin.report(conf, dir)
    assert(rr.pendingRemovals.isEmpty, "completed replay must clear rmstate")
    assert(rr.removalTags.contains("rm.t9"),
      "the removal's merge record is part of the tag ledger")

    // a TAKEDOWN stream batch that crashed after its index remove but
    // before its applied/ marker: the lake scrub is still pending, so
    // the crash-window set must surface it (under the rm. namespace)
    TextIndex.remove(Seq((1L, txt(1))).toDF("doc_id", "text"),
      "doc_id", "text", dir, tag = "ckrun_b7")
    val rt = IndexAdmin.report(conf, dir)
    assert(rt.unmarkeredRecordedTags.contains("rm.ckrun_b7"),
      s"unmarkered takedown batch must surface: ${rt.unmarkeredRecordedTags}")
    fs.create(new Path(s"$dir/applied/ckrun_b7"), true).close()
    assert(!IndexAdmin.report(conf, dir)
      .unmarkeredRecordedTags.contains("rm.ckrun_b7"),
      "the marker closes the takedown's crash window")

    // a reclaimed-but-resurrected lease (stalled holder's renew beat the
    // fence) must report expired: the next acquirer treats it as dead
    val lease2 = IndexMaintenance.acquireLease(conf, dir, "write")
    fs.create(new Path(lease2.getParent,
      lease2.getName + ".reclaimed"), true).close()
    val rlr = IndexAdmin.report(conf, dir)
    assert(rlr.leases.size == 1 && rlr.leases.head._3,
      s"lease with a surviving reclaim marker must report expired: ${rlr.leases}")
    fs.delete(new Path(lease2.getParent, lease2.getName + ".reclaimed"), false)
    IndexMaintenance.releaseLease(conf, lease2)
  }

  test("report is family-agnostic: cluster and vector layouts list their tables, nothing control leaks") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val cdir = java.nio.file.Files
      .createTempDirectory("admcl").toString + "/idx"
    graft.operators.ClusterIndex.build(
      Seq((1L, txt(1)), (2L, txt(2))).toDF("doc_id", "text"),
      "doc_id", "text", cdir)
    val rc = IndexAdmin.report(conf, cdir)
    assert(rc.tables.map(_.name).toSet ==
      Set("assign", "df", "edges", "meta", "postings", "toks"),
      s"cluster-family table listing: ${rc.tables}")
    val vdir = java.nio.file.Files
      .createTempDirectory("admvx").toString + "/idx"
    graft.operators.VectorIndex.build(
      Tables.embeddings(spark, sf0001), vdir, nlist = 4)
    val rv = IndexAdmin.report(conf, vdir)
    assert(rv.tables.map(_.name).toSet == Set("cells", "centroids", "meta"),
      s"vector-family table listing: ${rv.tables}")
    Seq(rc, rv).foreach { r =>
      assert(r.pendingRemovals.isEmpty && r.leases.isEmpty &&
        r.stagingGens.isEmpty && r.tombstones.isEmpty, s"pristine index: $r")
    }
  }

  test("advise: the README cadence table as code (pure-report rules)") {
    // r14: --advise derives read-only recommendations from a report; the
    // rules are pure so they gate without FS setup
    val base = IndexAdmin.Report(
      dir = "/idx", gen = Some(1L), liveRoot = "/idx/g1",
      retiredGens = Nil, legacyGraceDirs = Nil, stagingGens = Nil,
      tables = Nil, leases = Nil, leaseTtlMs = 600000L,
      pendingRemovals = Set.empty, appendTags = Set.empty,
      removalTags = Set.empty, appliedMarkers = Set.empty,
      unmarkeredRecordedTags = Set.empty, tombstones = Nil,
      logicalDeletes = Nil, logicalDeleteAges = Nil,
      sourceStatusPresent = true)
    assert(IndexAdmin.advise(base).isEmpty, "pristine index: all clear")
    // pending logical deletions: within SLA -> scheduled; beyond -> overdue
    val hour = 3600 * 1000L
    val within = base.copy(logicalDeletes = Seq("rm.a"),
      logicalDeleteAges = Seq(("rm.a", 2 * hour)))
    val aWithin = IndexAdmin.advise(within, deletionSlaMs = 24 * hour)
    assert(aWithin.exists(_.contains("compact() recommended within 22.0h")),
      aWithin.mkString("; "))
    val overdue = IndexAdmin.advise(
      within.copy(logicalDeleteAges = Seq(("rm.a", 30 * hour))),
      deletionSlaMs = 24 * hour)
    assert(overdue.exists(_.contains("compact() OVERDUE")),
      overdue.mkString("; "))
    // a crashed removal BLOCKS and suppresses the compact advice (it
    // would refuse anyway); the bare tag is printed, never rm.-prefixed
    val crashed = IndexAdmin.advise(
      within.copy(pendingRemovals = Set("rm.t9")))
    assert(crashed.exists(l => l.contains("BLOCKING") && l.contains("t9")
      && !l.contains("rm.t9")), crashed.mkString("; "))
    assert(!crashed.exists(l => l.contains("compact() recommended") ||
      l.contains("compact() OVERDUE")), crashed.mkString("; "))
    // tombstone pruning: blocked while unmarkered batches pend, eligible
    // once they drain
    val tomb = base.copy(tombstones = Seq(("batch=tk1", 5 * hour)))
    val blocked = IndexAdmin.advise(
      tomb.copy(unmarkeredRecordedTags = Set("ckr_b3")))
    assert(blocked.exists(l => l.contains("do NOT pruneTombstones")
      && l.contains("ckr_b3")), blocked.mkString("; "))
    val eligible = IndexAdmin.advise(tomb)
    assert(eligible.exists(_.contains("pruneTombstones eligible")),
      eligible.mkString("; "))
    // expired lease + absent srcstat are informational
    val info = IndexAdmin.advise(base.copy(
      leases = Seq(("write_x", 900000L, true)), sourceStatusPresent = false))
    assert(info.exists(_.contains("EXPIRED")) &&
      info.exists(_.contains("fast-path record absent")),
      info.mkString("; "))
  }

  test("advise end-to-end: a real index with a pending logical deletion recommends compact") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files
      .createTempDirectory("admadvise").toString + "/idx"
    val docs = (0 until 5)
      .map(i => (i.toLong, s"advise fixture doc $i words")).toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", dir)
    TextIndex.logicalRemove(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") === 1L),
      "doc_id", "text", dir, tag = "adv1")
    val r = IndexAdmin.report(conf, dir)
    assert(r.logicalDeleteAges.map(_._1) == Seq("rm.adv1"),
      s"ages must cover the pending batch: ${r.logicalDeleteAges}")
    val a = IndexAdmin.advise(r)
    assert(a.exists(_.contains("compact() recommended")), a.mkString("; "))
    graft.operators.TextIndex.compact(spark, dir)
    assert(IndexAdmin.advise(IndexAdmin.report(conf, dir))
      .forall(!_.contains("compact()")), "reclaim clears the advice")
  }
}
