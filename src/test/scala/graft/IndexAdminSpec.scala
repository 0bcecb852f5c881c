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
      sourceStatusPresent = true,
      lastFsckAgeMs = Some(3600 * 1000L)) // recently audited clean
    assert(IndexAdmin.advise(base).isEmpty, "pristine index: all clear")
    // fsck cadence (r16): never-audited indexes get the baseline nudge,
    // stale audits get named against the SLA, fresh ones stay silent
    val neverChecked = IndexAdmin.advise(base.copy(lastFsckAgeMs = None))
    assert(neverChecked.exists(_.contains("IndexCheck has never")),
      neverChecked.mkString("; "))
    val staleChecked = IndexAdmin.advise(
      base.copy(lastFsckAgeMs = Some(30 * 3600 * 1000L)),
      deletionSlaMs = 24 * 3600 * 1000L)
    assert(staleChecked.exists(_.contains("IndexCheck STALE")),
      staleChecked.mkString("; "))
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
    // r16: a crashed APPEND commit (ap. namespace) blocks under its own
    // verb — append(), not remove() — with the bare tag
    val crashedAp = IndexAdmin.advise(
      base.copy(pendingRemovals = Set("ap.b7")))
    assert(crashedAp.exists(l => l.contains("append commit")
      && l.contains("b7") && !l.contains("ap.b7")), crashedAp.mkString("; "))
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
    // r16: the post-maintenance fsck nudge stands until a CLEAN
    // IndexCheck pass stamps its recency marker, then clears
    assert(IndexAdmin.advise(IndexAdmin.report(conf, dir))
      .exists(_.contains("IndexCheck has never")), "fsck nudge must stand")
    assert(IndexCheck.check(spark, dir).ok, "post-compact fsck must pass")
    assert(!IndexAdmin.advise(IndexAdmin.report(conf, dir))
      .exists(_.contains("IndexCheck")), "a clean fsck clears the nudge")
  }

  test("--prune: triple-gated tombstone retention — ineligible refuses with the advise reason, eligible prunes only aged batches (r17)") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files
      .createTempDirectory("admprune").toString + "/idx"
    val fs = new Path(dir).getFileSystem(conf)
    val docs = (0 until 6)
      .map(i => (i.toLong, s"prune fixture doc $i words here")).toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", dir)
    graft.streaming.S4Stream.recordTombstones(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") === 1L),
      "doc_id", "text", dir, tag = "tdp")
    val hour = 3600 * 1000L
    def reason(e: Either[String, Int]): String = e.swap.getOrElse("")
    // gate: no clean IndexCheck within the SLA
    val g1 = IndexAdmin.prune(conf, dir, hour)
    assert(reason(g1).contains("IndexCheck"), s"fsck gate: $g1")
    assert(IndexCheck.check(spark, dir).ok)
    // gate: a recorded-but-unmarkered stream batch blocks
    TextIndex.append(Seq((7L, txt(7))).toDF("doc_id", "text"),
      "doc_id", "text", dir, tag = "ckr_b3")
    val g2 = IndexAdmin.prune(conf, dir, hour)
    assert(reason(g2).contains("unmarkered"), s"marker gate: $g2")
    fs.mkdirs(new Path(s"$dir/applied"))
    fs.create(new Path(s"$dir/applied/ckr_b3"), true).close()
    // gate: pending removal/append state blocks
    intercept[FaultInjection.InjectedCrash] {
      FaultInjection.armed("text.meta")(
        TextIndex.remove(Seq((2L, "prune fixture doc 2 words here"))
          .toDF("doc_id", "text"), "doc_id", "text", dir, tag = "pg"))
    }
    val g3 = IndexAdmin.prune(conf, dir, hour)
    assert(reason(g3).contains("pending"), s"rmstate gate: $g3")
    TextIndex.remove(Seq((2L, "prune fixture doc 2 words here"))
      .toDF("doc_id", "text"), "doc_id", "text", dir, tag = "pg")
    // the physical remove dirtied the audit trail? no — prune re-checks
    // fsck RECENCY, which still stands from the clean pass above
    // eligible, but the batch is fresh: retention keeps it
    assert(IndexAdmin.prune(conf, dir, hour) == Right(0),
      "a fresh tombstone batch must survive the retention horizon")
    // age the batch's files past the horizon and prune for real
    val batchDir = new Path(s"$dir/removed/batch=tdp")
    fs.listStatus(batchDir).foreach(st =>
      fs.setTimes(st.getPath, System.currentTimeMillis() - 2 * hour, -1))
    assert(IndexAdmin.prune(conf, dir, hour) == Right(1))
    assert(IndexAdmin.report(conf, dir).tombstones.isEmpty,
      "the pruned batch must leave the report")
  }

  test("report and advise classify an in-flight lease-free removal as healthy, not CRASHED (r17)") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files
      .createTempDirectory("adminflight").toString + "/idx"
    val docs = (0 until 4)
      .map(i => (i.toLong, s"inflight fixture doc $i")).toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", dir)
    // fabricate a pending removal WITH a fresh heartbeat — exactly what
    // ClusterRemoval's lease-free halves maintain while running
    graft.operators.Fingerprint.ensureRemoveState(conf,
      IndexMaintenance.normalize(dir), "rm.fl", (1L, 2L), replay = false,
      oldFp = None, "spec")
    var doneReport: Option[IndexAdmin.Report] = None
    graft.operators.Fingerprint.withInflightBeat(conf,
        IndexMaintenance.normalize(dir), "rm.fl") {
      doneReport = Some(IndexAdmin.report(conf, dir))
    }
    val r = doneReport.get
    assert(r.pendingRemovals == Set("rm.fl") &&
      r.inflightRemovals == Set("rm.fl"), s"in-flight must classify: $r")
    val text = IndexAdmin.render(r)
    assert(text.contains("IN-FLIGHT") && !text.contains("CRASHED"),
      s"render must not cry CRASHED over a healthy half:\n$text")
    val a = IndexAdmin.advise(r)
    assert(a.exists(_.contains("in-flight")) && !a.exists(_.contains("BLOCKING")),
      a.mkString("; "))
    // the beat exited (finally deleted the marker): same state now reads
    // as crashed — the guards and this console agree
    val rAfter = IndexAdmin.report(conf, dir)
    assert(rAfter.pendingRemovals == Set("rm.fl") &&
      rAfter.inflightRemovals.isEmpty,
      s"a dead half must flip back to the crashed verdict: $rAfter")
    assert(IndexAdmin.render(rAfter).contains("CRASHED"))
  }

  test("advise: recall-drift probe flips the retrain line; healthy appends don't (r15)") {
    // VERDICT r14 item 4 — the retrain cadence was the one verb advise()
    // couldn't see ("retrain when recall feels bad"). The fixture is the
    // VectorIndexSpec drift construction at probe scale: build on 8
    // planted unit-norm clusters (the quantizer learns exactly those
    // centers), then (a) a HEALTHY append from the same clusters — the
    // probe must read high and advise nothing — and (b) a DRIFTED append
    // whose clusters straddle old-center midpoints 50/50 — the probe
    // must read below the floor and name retrain().
    import spark.implicits._
    import graft.operators.VectorIndex
    val conf = spark.sparkContext.hadoopConfiguration
    // golden-ratio-scramble seeds: java.util.Random's first draws
    // correlate across sequential seeds (the VectorIndexSpec note)
    def rng(seed: Long) =
      new java.util.Random(seed * 0x9E3779B97F4A7C15L + (seed >>> 17))
    def unitCenter(c: Int): Array[Double] = {
      val r = rng(1000L + c)
      val v = Array.fill(64)(r.nextDouble() * 2 - 1)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = (0 until 8).map(unitCenter)
    // jit: the build/healthy distribution uses tight 0.02 jitter; the
    // drifted batch both straddles midpoints AND spreads wider (0.1) —
    // at 0.02 the Lloyd centroids happen to swallow several midpoint
    // clusters whole (measured split: 3 of 8 clusters single-cell,
    // probe reads 0.83) and the quantizer genuinely half-fits; 0.1 is
    // the honestly-drifted construction (every cluster splits, 0.57)
    def vec(id: Long, jit: Double): Seq[Float] = {
      val m = (id % 16).toInt
      val r = rng(50000L + id)
      val base =
        if (m < 8) centers(m)
        else centers(m - 8).zip(centers((m - 7) % 8))
          .map { case (x, y) => (x + y) / 2 }
      base.map(b => (b + (r.nextDouble() * 2 - 1) * jit).toFloat).toSeq
    }
    val dir = java.nio.file.Files
      .createTempDirectory("admrecall").toString + "/idx"
    val build = (0L until 800L).filter(_ % 16 < 8)
      .map(id => (id, vec(id, 0.02))).toDF("vec_id", "embedding")
    VectorIndex.build(build, dir, nlist = 8, iters = 2, seed = 42L)
    // (a) healthy: same distribution, fresh ids — no drift signal
    val healthy = (1600L until 2400L).filter(_ % 16 < 8)
      .map(id => (id, vec(id, 0.02))).toDF("vec_id", "embedding")
    VectorIndex.append(healthy, dir, tag = "h1")
    val r1 = IndexAdmin.report(conf, dir)
    assert(r1.recallProbes.map(_._1) === Seq("h1"),
      s"one probe per qualifying append: ${r1.recallProbes}")
    assert(r1.recallProbes.head._2 >= 0.9,
      s"a same-distribution append must read high: ${r1.recallProbes}")
    assert(!IndexAdmin.advise(r1).exists(_.contains("retrain")),
      IndexAdmin.advise(r1).mkString("; "))
    // (b) drift: boundary-straddling clusters under the frozen quantizer
    val drifted = (800L until 1600L).filter(_ % 16 >= 8)
      .map(id => (id, vec(id, 0.1))).toDF("vec_id", "embedding")
    VectorIndex.append(drifted, dir, tag = "d1")
    val r2 = IndexAdmin.report(conf, dir)
    assert(r2.recallProbes.map(_._1) === Seq("h1", "d1"),
      s"series must keep append order: ${r2.recallProbes}")
    val drift = r2.recallProbes.last._2
    assert(drift < 0.8,
      s"the planted drift must read below the floor (got $drift) — " +
        "otherwise this test gates nothing")
    val adv = IndexAdmin.advise(r2)
    assert(adv.exists(l => l.contains("retrain") && l.contains("d1")),
      adv.mkString("; "))
    // the floor is a parameter: an operator with a looser SLA sees calm
    assert(!IndexAdmin.advise(r2, retrainRecallFloor = drift / 2)
      .exists(_.contains("retrain")), "floor override must silence the line")
    // retrain clears the series — a stale low reading must not keep
    // advising the retrain that already happened
    VectorIndex.retrain(spark, dir, nlist = 16)
    val r3 = IndexAdmin.report(conf, dir)
    assert(r3.recallProbes.isEmpty, "retrain must clear the probe series")
    assert(!IndexAdmin.advise(r3).exists(_.contains("retrain")),
      IndexAdmin.advise(r3).mkString("; "))
    // the rendered report surfaces the series, not as a data table
    assert(!r2.tables.exists(_.name == "recall"),
      "the probe dir must not list as a data table")
    assert(IndexAdmin.render(r2).contains("self-recall"),
      "render must surface the probe series")
  }

  test("--prune reclaims retired-generation artifacts under the advise gates (r18)") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val hour = 3600 * 1000L
    def reason(e: Either[String, Int]): String = e.swap.getOrElse("")
    val dir = java.nio.file.Files
      .createTempDirectory("admretired").toString + "/idx"
    val docs = (0 until 6)
      .map(i => (i.toLong, txt(i))).toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", dir)
    TextIndex.compact(spark, dir) // g1 live; legacy tables linger as grace
    val r0 = IndexAdmin.report(conf, dir)
    assert(r0.legacyGraceDirs.nonEmpty,
      s"fixture must carry grace artifacts: $r0")
    val owed = r0.retiredGens.size + r0.legacyGraceDirs.size
    // gate: no clean IndexCheck within the SLA — the retired copy is
    // the only rollback, never delete it unaudited
    val g1 = IndexAdmin.pruneRetired(conf, dir, hour)
    assert(reason(g1).contains("IndexCheck"), s"fsck gate: $g1")
    assert(IndexCheck.check(spark, dir).ok)
    // gate: pending removal/append state blocks (fabricated, as the
    // in-flight classification test does)
    graft.operators.Fingerprint.ensureRemoveState(conf,
      IndexMaintenance.normalize(dir), "rm.pg", (1L, 2L), replay = false,
      oldFp = None, "spec")
    val g2 = IndexAdmin.pruneRetired(conf, dir, hour)
    assert(reason(g2).contains("pending"), s"rmstate gate: $g2")
    graft.operators.Fingerprint.clearRemoveState(conf,
      IndexMaintenance.normalize(dir), "rm.pg")
    // eligible: advise names the artifacts, the sweep reclaims them
    val adv = IndexAdmin.advise(IndexAdmin.report(conf, dir))
    assert(adv.exists(_.contains("purgeRetired eligible")),
      adv.mkString("; "))
    assert(IndexAdmin.pruneRetired(conf, dir, hour) == Right(owed))
    val rAfter = IndexAdmin.report(conf, dir)
    assert(rAfter.retiredGens.isEmpty && rAfter.legacyGraceDirs.isEmpty,
      s"grace artifacts must leave the report: $rAfter")
    assert(!IndexAdmin.advise(rAfter).exists(_.contains("purgeRetired")),
      "advise must go quiet once reclaimed")
    // idempotent: a second sweep has nothing to do
    assert(IndexAdmin.pruneRetired(conf, dir, hour) == Right(0))
    // and the live generation still serves: probe survives the reclaim
    assert(TextIndex.probe(spark, dir,
      Seq((99L, txt(0))).toDF("doc_id", "text"), "doc_id", "text")
      .count() >= 0L)
  }
}
