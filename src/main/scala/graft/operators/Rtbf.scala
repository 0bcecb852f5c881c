package graft.operators

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The stores one right-to-be-forgotten purge must reach: the document
  * lake (system of record — the S4 reference ships its stream into
  * exactly such a date-partitioned lake, `lake/lake.go:17-90`), the
  * optional embedding lake beside it, and any of the four persisted
  * index families built over them. Index dirs are optional so a
  * deployment indexes only what it serves; the lake is mandatory —
  * a purge that doesn't reach the system of record isn't a purge. */
final case class RtbfTargets(
    lakeDir: String,
    lakePartitionCols: Seq[String],
    idCol: String = "doc_id",
    textCol: String = "text",
    textIndex: Option[String] = None,
    clusterIndex: Option[String] = None,
    termIndex: Option[String] = None,
    vectorIndex: Option[String] = None,
    vecLakeDir: Option[String] = None,
    vecLakePartitionCols: Seq[String] = Nil,
    vecIdCol: String = "vec_id",
    vecCol: String = "embedding")

final case class RtbfStoreResult(store: String, skippedDone: Boolean,
                                 seconds: Double)

final case class RtbfReport(tag: String, nVictims: Long, nVecVictims: Long,
                            stores: Seq[RtbfStoreResult], complete: Boolean)

/** Ops-console view of one purge's crash-state (consumed by
  * [[graft.IndexAdmin]] when pointed at a lake dir): which stores the
  * manifest planned, which carry done markers, and therefore which an
  * interrupted purge still owes. */
final case class RtbfStatus(tag: String, planned: Seq[String],
                            done: Set[String], complete: Boolean,
                            mode: String = "physical") {
  def incomplete: Seq[String] = planned.filterNot(done)
}

/** Single-call right-to-be-forgotten orchestrator (VERDICT r17 item 1).
  *
  * Every per-store verb has existed since r10–r17 — lake
  * [[TargetedDelete.delete]] plus the four index families' physical
  * `remove()` — but a real takedown request meant calling five of them
  * with five tags and nothing owned "purge id X from EVERYTHING and
  * report completion per store"; a half-completed multi-store purge
  * could hide silently. [[purge]] is that owner:
  *
  *  - ONE batch tag drives every store (each family namespaces it
  *    internally, so the per-index crash-replay contracts are untouched);
  *  - the victim rows are SNAPSHOTTED into a manifest under
  *    `<lakeDir>/_rtbf/<tag>/` BEFORE anything mutates — the one
  *    capture every later step (and every crash replay) reads, so a
  *    purge can never lose its victim set to its own lake scrub;
  *  - the four index verbs run CONCURRENTLY (four different dirs, four
  *    independent leases — the purge wall is max(verb), not sum), then
  *    the lakes strictly after every serve surface is clean (the system
  *    of record outlives its derivations); each store sits behind a
  *    done-marker so a crash resumes exactly the stores it owes, and
  *    each verb is itself crash-replayable under the shared tag;
  *  - after the last store a CROSS-STORE AGREEMENT check reads every
  *    surface back (raw index tables, not serve overlays — post
  *    physical remove the rows must be GONE from disk) and refuses to
  *    mark the purge COMPLETE while any store still holds a victim id —
  *    partial success is never silent.
  *
  * Scale: no step materializes the corpus on the driver. The victim
  * snapshot is one semi-join write of O(victims); each index verb is
  * the family's own bucket-pruned rewrite; the agreement check is six
  * broadcast-semi-join counts over column-pruned scans (id columns
  * only). At 100 TB the check is the priciest read (a full id-column
  * scan per store) — it is the point: a purge certificate must read
  * what is actually on disk.
  *
  * Concurrency: one purge per lake at a time is the supported shape
  * (the per-index leases serialize the verbs anyway; two concurrent
  * purges with different tags would interleave legally but the
  * manifest dirs keep their state apart). */
object Rtbf {

  /** Store names, in execution order. Index families first (serve
    * surfaces stop returning victims before the record of what they
    * were vanishes), the document lake LAST. */
  private val IdxText = "idx.text"
  private val IdxCluster = "idx.cluster"
  private val IdxTerm = "idx.term"
  private val IdxVector = "idx.vector"
  private val LakeVec = "lake.vec"
  private val LakeDoc = "lake.doc"

  private def plannedStores(t: RtbfTargets): Seq[String] =
    t.textIndex.map(_ => IdxText).toSeq ++
      t.clusterIndex.map(_ => IdxCluster) ++
      t.termIndex.map(_ => IdxTerm) ++
      t.vectorIndex.map(_ => IdxVector) ++
      t.vecLakeDir.map(_ => LakeVec) ++
      Seq(LakeDoc)

  private def stateDir(lakeDir: String, tag: String): String =
    s"${IndexMaintenance.normalize(lakeDir)}/_rtbf/${Fingerprint.sanitizeTag(tag)}"

  /** One-shot async helper for independent Spark actions (r18 opt). */
  private def concurrently[T](name: String)(f: => T)
      : java.util.concurrent.Future[T] = {
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try pool.submit(new java.util.concurrent.Callable[T] {
      def call(): T = f
    }) finally pool.shutdown()
  }

  /** Purge `victims` — the EXACT `(id, text)` rows as ingested, the
    * same contract every index family's remove() validates — from all
    * targeted stores under one `tag`. `vecVictims` carries the exact
    * `(vecId, embedding)` rows when a vector index / embedding lake is
    * targeted. Returns the per-store report; throws (without marking
    * COMPLETE) if any surface still holds a victim afterwards.
    *
    * `logical = true` is the continuous-ingest mode (the r13 per-family
    * trade, orchestrated): each index verb becomes the family's
    * `logicalRemove` — a tombstone-overlay write holding the exclusive
    * lease ~2 s instead of the full rewrite wall, with the physical
    * bytes reclaimed at each family's next compact() — while the LAKES
    * still scrub physically (the lake delete is the actual RTBF
    * obligation and is partition-pruned cheap; "logical" only buys
    * cheap leases on the index side, exactly as the per-family logical
    * loops do). The agreement certificate shifts with the mode: a
    * logical purge certifies that every SERVE surface is blind (raw
    * rows anti-joined through the LogicalDelete overlay each family's
    * serve path reads), where a physical purge certifies raw-table
    * absence. The mode RIDES THE MANIFEST — a replay or [[resume]]
    * executes the mode the purge was planned with, and reusing a tag
    * under the other mode refuses. */
  def purge(victims: DataFrame, vecVictims: Option[DataFrame],
            targets: RtbfTargets, tag: String,
            logical: Boolean = false): RtbfReport = {
    val s = victims.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val state = stateDir(targets.lakeDir, tag)
    val fs = new Path(state).getFileSystem(conf)
    require(targets.vectorIndex.isEmpty && targets.vecLakeDir.isEmpty ||
      vecVictims.nonEmpty,
      "Rtbf.purge: a vector index / embedding lake is targeted but no " +
        "vecVictims were passed")

    val vfp = Fingerprint.of(victims, Seq(targets.idCol, targets.textCol))
    val manifest = new Path(s"$state/MANIFEST")
    if (fs.exists(manifest)) {
      val recorded = readManifest(fs, manifest)
      if (recorded.vfp != s"${vfp._1}:${vfp._2}") Fingerprint.refuse(
        s"Rtbf.purge: tag '$tag' was already used by a different victim " +
          s"batch (recorded ${recorded.vfp}, got ${vfp._1}:${vfp._2}) — " +
          "pass a batch-unique tag; the same (tag, victims) pair is the " +
          "legitimate crash-replay and is re-admitted")
      if (recorded.stores != plannedStores(targets)) Fingerprint.refuse(
        s"Rtbf.purge: tag '$tag' was planned against stores " +
          s"${recorded.stores.mkString(", ")} but this call targets " +
          s"${plannedStores(targets).mkString(", ")} — a replay must " +
          "pass the original targets")
      val mode = if (logical) "logical" else "physical"
      if (recorded.mode != mode) Fingerprint.refuse(
        s"Rtbf.purge: tag '$tag' was planned as a ${recorded.mode} purge " +
          s"but this call asks for $mode — a replay executes the mode " +
          "the manifest recorded; use a fresh tag to purge the other way")
    } else {
      // snapshot FIRST, manifest (the commit point) LAST: a crash in
      // between re-stages the snapshot from the caller's rows
      victims.select(col(targets.idCol), col(targets.textCol))
        .write.mode("overwrite").parquet(s"$state/victims")
      vecVictims.foreach(_.select(col(targets.vecIdCol), col(targets.vecCol))
        .write.mode("overwrite").parquet(s"$state/vec_victims"))
      writeManifest(fs, manifest,
        ManifestRec(s"${vfp._1}:${vfp._2}", plannedStores(targets),
          if (logical) "logical" else "physical"))
    }
    runFromManifest(s, targets, tag)
  }

  /** Resume a crashed purge from its manifest alone — the operator
    * story after a driver death: the victim rows live in the snapshot,
    * so the caller no longer needs to reconstruct them (and MUST not
    * try to re-read them from a lake the purge may since have
    * scrubbed). Refuses if no manifest committed (nothing mutated
    * before the manifest lands — just re-run purge()). */
  def resume(s: SparkSession, targets: RtbfTargets, tag: String): RtbfReport = {
    val conf = s.sparkContext.hadoopConfiguration
    val state = stateDir(targets.lakeDir, tag)
    val fs = new Path(state).getFileSystem(conf)
    if (!fs.exists(new Path(s"$state/MANIFEST"))) Fingerprint.refuse(
      s"Rtbf.resume: no committed purge manifest under $state — the " +
        "crash predated the victim snapshot, so nothing was mutated; " +
        "re-run purge() with the victim rows")
    // same plan check as purge(): a resume with narrower targets would
    // otherwise die on a store lookup mid-run instead of refusing here
    val recorded = readManifest(fs, new Path(s"$state/MANIFEST")).stores
    if (recorded != plannedStores(targets)) Fingerprint.refuse(
      s"Rtbf.resume: tag '$tag' was planned against stores " +
        s"${recorded.mkString(", ")} but this call targets " +
        s"${plannedStores(targets).mkString(", ")} — a resume must pass " +
        "the original targets")
    runFromManifest(s, targets, tag)
  }

  private def runFromManifest(s: SparkSession, targets: RtbfTargets,
                              tag: String): RtbfReport = {
    val conf = s.sparkContext.hadoopConfiguration
    val state = stateDir(targets.lakeDir, tag)
    val fs = new Path(state).getFileSystem(conf)
    val rec = readManifest(fs, new Path(s"$state/MANIFEST"))
    val planned = rec.stores
    val logical = rec.mode == "logical"

    // the one authoritative victim capture — every verb reads THIS.
    // Doc and vec snapshots materialize concurrently (r18 opt, guide
    // §2.6 — two independent tiny reads, two fewer serial job walls).
    val vicF = concurrently(s"rtbf.victims") {
      val v = s.read.parquet(s"$state/victims").localCheckpoint()
      (v, v.count())
    }
    val vecF = concurrently(s"rtbf.vec_victims") {
      if (fs.exists(new Path(s"$state/vec_victims"))) {
        val v = s.read.parquet(s"$state/vec_victims").localCheckpoint()
        Some((v, v.count()))
      } else None
    }
    // settle BOTH before rethrowing (ADVICE r18): a raw f.get() on the
    // first future would surface a java.util.concurrent
    // .ExecutionException (changing the error type callers/specs see)
    // and leave the sibling's Spark job running unobserved
    def settle[T](f: java.util.concurrent.Future[T]): scala.util.Try[T] =
      scala.util.Try(f.get()).recoverWith {
        case e: java.util.concurrent.ExecutionException =>
          scala.util.Failure(e.getCause)
      }
    val (vicT, vecT) = (settle(vicF), settle(vecF))
    vicT.failed.toOption.orElse(vecT.failed.toOption).foreach { t =>
      Seq(vicT, vecT).foreach(_.failed.foreach(o =>
        if (o ne t) t.addSuppressed(o)))
      throw t
    }
    val (vic, nV) = vicT.get
    val vecPair = vecT.get
    val vecVic = vecPair.map(_._1)
    val nVec = vecPair.fold(0L)(_._2)

    def done(store: String) = new Path(s"$state/done_$store")
    def execStore(store: String): RtbfStoreResult =
      if (fs.exists(done(store)))
        RtbfStoreResult(store, skippedDone = true, 0.0)
      else {
        val t0 = System.nanoTime()
        runStore(s, store, targets, vic, vecVic, tag, logical)
        // verb done but marker not yet — a crash here replays the verb
        // (idempotent under its own tag) and then lands the marker
        FaultInjection.maybeCrash(s"rtbf.verb.$store")
        fs.create(done(store), true).close()
        FaultInjection.maybeCrash(s"rtbf.done.$store")
        RtbfStoreResult(store, skippedDone = false,
          (System.nanoTime() - t0) / 1e9)
      }
    // The four index verbs hold leases on FOUR DIFFERENT dirs — nothing
    // serializes them but the driver, so run them CONCURRENTLY (at
    // cluster scale each is its own pruned rewrite job set; a serial
    // orchestrator would quadruple the purge wall for no safety). Every
    // store that can complete does — more done-markers per attempt
    // means less replay after a crash — and the first failure is
    // rethrown only after all settle. The LAKES run strictly AFTER all
    // index verbs succeed: the system of record must outlive its
    // derivations, so a failed serve-surface scrub keeps the lake rows
    // (the manifest snapshot, not the lake, feeds the replay anyway).
    val (idxStores, lakeStores) = planned.partition(_.startsWith("idx."))
    val idxResults =
      if (idxStores.size <= 1) idxStores.map(execStore)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(idxStores.size)
        try {
          val futures = idxStores.map(st =>
            st -> pool.submit(new java.util.concurrent.Callable[RtbfStoreResult] {
              def call(): RtbfStoreResult = execStore(st)
            }))
          val settled = futures.map { case (st, f) =>
            st -> (try Right(f.get())
            catch {
              case e: java.util.concurrent.ExecutionException =>
                Left(e.getCause)
            })
          }
          val failures = settled.collect { case (st, Left(t)) => (st, t) }
          failures.headOption.foreach { case (_, first) =>
            failures.drop(1).foreach { case (_, t) =>
              if (t ne first) first.addSuppressed(t) }
            throw first
          }
          settled.collect { case (_, Right(r)) => r }
        } finally pool.shutdown()
      }
    // the LAKES stay sequential and doc-last ON PURPOSE (an r18
    // concurrency attempt was reverted): the doc lake is the system of
    // record and must outlive every derivation — including the
    // embedding lake — and RtbfStreamSpec pins the crash semantics
    // (a cut at the vec lake leaves the doc lake untouched).
    val results = idxResults ++ lakeStores.map(execStore)

    // ---- cross-store agreement: every surface, read from disk, ONE
    // job (the six counts union into a store-labeled aggregate — six
    // sequential count() jobs would pay six job-overheads for the same
    // scans) ----
    val vids = vic.select(col(targets.idCol)).distinct().localCheckpoint()
    val vecIds = vecVic.map(_.select(col(targets.vecIdCol))
      .distinct().localCheckpoint())
    val leftovers = planned
      .map(st => victimRows(s, st, targets, vids, nV, vecIds, nVec, logical))
      .reduce(_ unionByName _)
      .groupBy(col("store")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0L).toSeq.sortBy(_._1)
    if (leftovers.nonEmpty) throw new IllegalStateException(
      s"Rtbf.purge '$tag': stores disagree on survivorship after all " +
        s"verbs ran — victim rows remain in ${leftovers
          .map { case (st, n) => s"$st($n)" }.mkString(", ")}; the purge " +
        "is NOT marked complete — investigate (IndexCheck the index " +
        "families) and re-run to replay")
    fs.create(new Path(s"$state/COMPLETE"), true).close()
    RtbfReport(tag, nV, nVec, results, complete = true)
  }

  private def runStore(s: SparkSession, store: String, t: RtbfTargets,
                       vic: DataFrame, vecVic: Option[DataFrame],
                       tag: String, logical: Boolean): Unit = store match {
    case IdxText =>
      if (logical)
        TextIndex.logicalRemove(vic, t.idCol, t.textCol, t.textIndex.get,
          tag = tag)
      else TextIndex.remove(vic, t.idCol, t.textCol, t.textIndex.get,
        tag = tag)
    case IdxCluster =>
      if (logical)
        ClusterIndex.logicalRemove(vic, t.idCol, t.textCol,
          t.clusterIndex.get, tag = tag)
      else ClusterIndex.remove(vic, t.idCol, t.textCol, t.clusterIndex.get,
        tag = tag)
    case IdxTerm =>
      if (logical)
        TermIndex.logicalRemove(vic, t.idCol, t.textCol, t.termIndex.get,
          tag = tag)
      else TermIndex.remove(vic, t.idCol, t.textCol, t.termIndex.get,
        tag = tag)
    case IdxVector =>
      if (logical)
        VectorIndex.logicalRemove(vecVic.get, t.vectorIndex.get, t.vecIdCol,
          t.vecCol, tag = tag)
      else VectorIndex.remove(vecVic.get, t.vectorIndex.get, t.vecIdCol,
        t.vecCol, tag = tag)
    // the lakes scrub PHYSICALLY in both modes: the system-of-record
    // delete is the actual RTBF obligation (and partition-pruned cheap);
    // logical only buys cheap index-side leases
    case LakeVec =>
      TargetedDelete.delete(s, t.vecLakeDir.get, t.vecLakePartitionCols,
        t.vecIdCol, vecVic.get.select(col(t.vecIdCol)))
    case LakeDoc =>
      TargetedDelete.delete(s, t.lakeDir, t.lakePartitionCols, t.idCol,
        vic.select(col(t.idCol)))
  }

  /** Victim rows still visible in one store, read from what is ON
    * DISK: lakes and index tables are scanned id-column-only and
    * semi-joined against the (broadcast-sized) victim id set, labeled
    * with the store name for the fused agreement aggregate. For a
    * PHYSICAL purge the reads are raw tables on purpose — its
    * certificate must not be satisfied by a tombstone overlay hiding
    * rows that still exist. For a LOGICAL purge the victim rows remain
    * on disk BY DESIGN (reclaimed at each family's next compact), so
    * the certificate reads each family's SERVE surface instead: the raw
    * rows anti-joined through the LogicalDelete overlay the serve paths
    * consult — certifying that every surface is blind, which is what a
    * logical purge promises. The cluster family's [[ClusterIndex
    * .assignments]] IS that overlay-aware serve read in both modes (a
    * physical remove refuses while logical tombstones pend, so its raw
    * table never hides behind one). */
  private def victimRows(s: SparkSession, store: String, t: RtbfTargets,
                         vids: DataFrame, nV: Long,
                         vecIds: Option[DataFrame], nVec: Long,
                         logical: Boolean): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    def root(dir: String) = IndexMaintenance.liveRoot(conf, dir)
    def in(df: DataFrame, c: String, keys: DataFrame, n: Long) =
      df.select(col(c))
        .join(TargetedDelete.maybeBroadcast(keys, n), Seq(c), "left_semi")
        .select(lit(store).as("store"))
    def served(df: DataFrame, c: String, dir: String) =
      if (!logical) df
      else LogicalDelete.hide(df, c, LogicalDelete.ids(s, dir))
    store match {
      case IdxText =>
        in(served(s.read.parquet(s"${root(t.textIndex.get)}/bands"),
          t.idCol, t.textIndex.get), t.idCol, vids, nV)
      case IdxCluster =>
        in(ClusterIndex.assignments(s, t.clusterIndex.get, t.idCol),
          t.idCol, vids, nV)
      case IdxTerm =>
        in(served(s.read.parquet(s"${root(t.termIndex.get)}/dl"),
          t.idCol, t.termIndex.get), t.idCol, vids, nV)
      case IdxVector =>
        in(served(s.read.parquet(s"${root(t.vectorIndex.get)}/cells"),
          t.vecIdCol, t.vectorIndex.get), t.vecIdCol, vecIds.get, nVec)
      case LakeVec =>
        in(s.read.parquet(t.vecLakeDir.get), t.vecIdCol, vecIds.get, nVec)
      case LakeDoc =>
        in(s.read.parquet(t.lakeDir), t.idCol, vids, nV)
    }
  }

  // ---- manifest + ops-console status ----------------------------------

  /** Whether `tag`'s victim snapshot COMMITTED (the manifest landed) —
    * the routing question a replaying caller must ask: committed means
    * the purge may since have scrubbed the lakes, so the victim set
    * must come from [[resume]] (the manifest), never re-resolved from
    * the stores of record. Pure FS metadata; no Spark. */
  def manifestCommitted(conf: org.apache.hadoop.conf.Configuration,
                        lakeDir: String, tag: String): Boolean = {
    val p = new Path(s"${stateDir(lakeDir, tag)}/MANIFEST")
    p.getFileSystem(conf).exists(p)
  }

  /** The committed purge's authoritative victim capture — `(victims,
    * vecVictims)` exactly as snapshotted before anything mutated. For
    * callers that must act on the victim ROWS during a replay (e.g.
    * [[graft.streaming.S4Stream.rtbfPurgeStream]] re-records content
    * tombstones before resuming); refuses when no manifest committed,
    * same as [[resume]]. */
  def manifestVictims(s: SparkSession, lakeDir: String,
                      tag: String): (DataFrame, Option[DataFrame]) = {
    val conf = s.sparkContext.hadoopConfiguration
    val state = stateDir(lakeDir, tag)
    val fs = new Path(state).getFileSystem(conf)
    if (!fs.exists(new Path(s"$state/MANIFEST"))) Fingerprint.refuse(
      s"Rtbf.manifestVictims: no committed purge manifest under $state")
    val vic = s.read.parquet(s"$state/victims")
    val vecVic =
      if (fs.exists(new Path(s"$state/vec_victims")))
        Some(s.read.parquet(s"$state/vec_victims"))
      else None
    (vic, vecVic)
  }

  private final case class ManifestRec(vfp: String, stores: Seq[String],
                                       mode: String = "physical")

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            p: Path, rec: ManifestRec): Unit = {
    val out = fs.create(p, true)
    try out.write(s"${rec.vfp}\n${rec.stores.mkString(",")}\n${rec.mode}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           p: Path): ManifestRec = {
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val lines = txt.linesIterator.toSeq
    ManifestRec(lines.head,
      lines.lift(1).filter(_.nonEmpty).fold(Seq.empty[String])(
        _.split(",").toSeq),
      // pre-r18-logical manifests carry no mode line: physical
      lines.lift(2).filter(_.nonEmpty).getOrElse("physical"))
  }

  /** Every purge's crash-state under a lake dir — the ops-console read
    * [[graft.IndexAdmin]] renders so an interrupted purge NAMES the
    * stores it still owes (VERDICT r17 item 1's "refuses partial
    * success silently" has to be inspectable, not just thrown). Pure FS
    * metadata; no Spark. */
  def status(conf: org.apache.hadoop.conf.Configuration,
             lakeDir: String): Seq[RtbfStatus] = {
    val base = new Path(s"${IndexMaintenance.normalize(lakeDir)}/_rtbf")
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory).flatMap { st =>
      val tagDir = st.getPath
      val manifest = new Path(tagDir, "MANIFEST")
      if (!fs.exists(manifest)) None // pre-commit crash: nothing mutated
      else {
        val rec = readManifest(fs, manifest)
        val done = fs.listStatus(tagDir).map(_.getPath.getName)
          .filter(_.startsWith("done_")).map(_.stripPrefix("done_")).toSet
        Some(RtbfStatus(tagDir.getName, rec.stores, done,
          complete = fs.exists(new Path(tagDir, "COMPLETE")),
          mode = rec.mode))
      }
    }.sortBy(_.tag)
  }
}
