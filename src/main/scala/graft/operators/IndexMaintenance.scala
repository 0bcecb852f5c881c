package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared lifecycle mechanics of the persisted indexes ([[ClusterIndex]],
  * [[TextIndex]], [[VectorIndex]]): generation-pointer layout, compaction
  * cutover, and the write/compact lease that makes racing maintenance
  * fail loudly instead of silently losing rows.
  *
  * == Generation layout ==
  *
  * An index directory has ONE live data root at a time:
  *
  *  - legacy / freshly built: tables directly under `<dir>/` (no pointer)
  *  - after a compaction: tables under `<dir>/g<N>/`, with the one-line
  *    pointer file `<dir>/GEN` naming the live generation `N`
  *
  * [[liveRoot]] resolves a directory to its current data root; every
  * index read and write goes through it. Compaction writes the folded
  * tables into the NEXT generation directory and then flips the pointer
  * with a single small-file write — no directory rename anywhere. On an
  * object store (the deployment north star) a directory rename is a
  * non-atomic O(data) copy+delete, so the previous two-rename swap had a
  * window where the index was absent or half-copied; under the pointer a
  * reader always resolves to a COMPLETE tree: the old generation until
  * the flip, the new one after it. The pointer write itself is a
  * single-object PUT — atomic on object stores; on local/HDFS a reader
  * could glimpse a truncated file, so [[currentGen]] retries briefly
  * before failing loudly (it never silently falls back to the legacy
  * root: a wrong root would serve wrong answers, not an error).
  *
  * Replay/bookkeeping state is NOT generational — `applied/` batch
  * markers, `tagfp/` merge records, the `srcstat` freshness record and
  * `lease/` all live at the top level of `<dir>` and survive cutovers
  * untouched (compaction used to copy them between trees; now nothing
  * moves).
  *
  * == Leases (quiesce enforcement) ==
  *
  * The compaction contract requires a quiesced index. Instead of
  * trusting callers, writers and compactors take LEASES under
  * `<dir>/lease/`: every build/append holds a `write_*` lease for its
  * duration, compact holds a `compact_*` lease. Acquisition creates the
  * own lease FIRST, then checks for conflicts (write conflicts with
  * compact; compact conflicts with everything) — so two racing
  * operations can both abort but can never both proceed. Holders renew
  * their lease at ttl/3 (daemon heartbeat); a crashed holder's lease
  * self-EXPIRES after [[leaseTtlMs]] and the next acquirer clears it —
  * no human runbook needed ([[breakLeases]] remains the force override).
  * A holder that stalled past the TTL and lost its lease is FENCED: its
  * heartbeat notices the reclaim and its completion fails loudly
  * instead of reporting success for writes that may have interleaved
  * with the new holder's. This is a single-writer coordination aid, not
  * a distributed lock manager — it turns the silent-data-loss race into
  * a loud, actionable error.
  */
private[graft] object IndexMaintenance {

  /** Trailing slashes would make derived paths (`<dir>/GEN`,
    * `<dir>/g<N>`) resolve inconsistently between writers and readers. */
  def normalize(indexDir: String): String = indexDir.replaceAll("/+$", "")

  // ---- generation pointer ------------------------------------------------

  private def genPath(indexDir: String) = new Path(s"$indexDir/GEN")

  private def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** The live generation number, or None for the legacy in-place layout
    * (tables directly under `indexDir`). Retries a briefly-unreadable
    * pointer (local-FS create-truncate window) and then FAILS — never
    * guesses a root. */
  def currentGen(conf: Configuration, indexDir0: String): Option[Long] = {
    val indexDir = normalize(indexDir0)
    val p = genPath(indexDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      var attempt = 0
      var txt = readSmallFile(fs, p).trim
      while (!txt.matches("[0-9]+") && attempt < 5) {
        attempt += 1
        Thread.sleep(50L * attempt)
        txt = readSmallFile(fs, p).trim
      }
      if (!txt.matches("[0-9]+"))
        throw new IllegalStateException(
          s"unreadable generation pointer at $p (content: '$txt') — the " +
            "index has a pointer file but no parseable generation; refusing " +
            "to guess a data root")
      Some(txt.toLong)
    }
  }

  /** Resolve an index directory to its current data root — `<dir>` for
    * the legacy layout, `<dir>/g<N>` after a compaction cutover. Every
    * table read and write in the index families goes through this. */
  def liveRoot(conf: Configuration, indexDir0: String): String = {
    val indexDir = normalize(indexDir0)
    currentGen(conf, indexDir).fold(indexDir)(g => s"$indexDir/g$g")
  }

  private def writeGen(conf: Configuration, indexDir: String, gen: Long): Unit = {
    val p = genPath(indexDir)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true) // single small object: PUT-atomic on stores
    try out.write(gen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // ---- leases ------------------------------------------------------------

  private def leaseDir(indexDir: String) = new Path(s"$indexDir/lease")

  private def listLeases(fs: FileSystem, indexDir: String): Seq[String] = {
    val d = leaseDir(indexDir)
    if (!fs.exists(d)) Seq.empty else fs.listStatus(d).map(_.getPath.getName).toSeq
  }

  /** Lease TTL (ms): a lease whose heartbeat is older than this is
    * EXPIRED — a new acquirer clears it and proceeds, turning crashed-
    * holder recovery from a human runbook (breakLeases) into an
    * invariant (VERDICT r11 item 3). Holders renew at ttl/3 via a
    * daemon heartbeat, so a LIVE holder is never expired unless the
    * process is stalled for a full TTL — and a stalled-then-revived
    * holder is FENCED: its renewal discovers the stolen lease and its
    * commit fails loudly ([[withLease]]/[[finishCompact]]). */
  def leaseTtlMs: Long =
    sys.props.get("graft.lease.ttlMs").map(_.toLong).getOrElse(600000L)
  private def heartbeatMs: Long =
    sys.props.get("graft.lease.hbMs").map(_.toLong)
      .getOrElse(math.max(1L, leaseTtlMs / 3))

  /** Renewal = rewriting the lease file; the HEARTBEAT AUTHORITY is the
    * file's mtime, not its content — readers never parse bytes a
    * concurrent rewrite could truncate mid-read (the content is a
    * human-facing hint only). Fencing needs no token either: lease
    * filenames are uuid-unique, so "my file still exists" is exactly
    * "nobody reclaimed my lease". */
  private def writeLeaseFile(fs: FileSystem, p: Path): Unit = {
    val out = fs.create(p, true)
    try out.write(s"hb=${System.currentTimeMillis()}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Heartbeat millis of a lease file (mtime); None when gone. */
  private def leaseHeartbeat(fs: FileSystem, p: Path): Option[Long] =
    try Some(fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** Take a lease of `kind` on the index. Own lease is created FIRST,
    * conflicts checked second — two racers can both abort, never both
    * proceed. Throws (and removes its own lease) on conflict. A
    * conflicting lease whose heartbeat exceeds [[leaseTtlMs]] is a
    * crashed holder's leftover: it is deleted and ignored.
    *
    * Kinds and their conflict rules:
    *  - `write` (build/append): tag-scoped writers never touch each
    *    other's partitions, so write+write is allowed; conflicts with
    *    `compact`, `remove`, and `xwrite`.
    *  - `xwrite` (build/append on a family whose META is read-modify-
    *    written from query-serving state — [[TermIndex]]'s (n_rows,
    *    sum_dl) since r16): EXCLUSIVE among writers too. Two concurrent
    *    tag-scoped appends never touch each other's PARTITIONS, but both
    *    read meta at entry and commit merge(entry-meta, own-delta) — the
    *    later commit silently drops the earlier delta's stats, and for a
    *    stats-serving family that is silent mis-scoring, not just a
    *    spurious rebuild (ADVICE r16). Conflicts with everything.
    *  - `remove` (targeted delete): EXCLUSIVE — a removal rewrites
    *    OTHER generations' partitions (its read-then-overwrite would
    *    silently wipe rows a concurrent append lands between the read
    *    and the write; review-caught), so it conflicts with everything.
    *  - `compact`: EXCLUSIVE — retires the whole generation. */
  def acquireLease(conf: Configuration, indexDir0: String, kind: String): Path = {
    require(kind == "write" || kind == "compact" || kind == "remove" ||
      kind == "xwrite",
      s"unknown lease kind $kind")
    val indexDir = normalize(indexDir0)
    val own = new Path(leaseDir(indexDir),
      s"${kind}_${java.util.UUID.randomUUID().toString.take(12)}")
    val fs = own.getFileSystem(conf)
    writeLeaseFile(fs, own)
    val deadline = System.currentTimeMillis() - leaseTtlMs
    val all = listLeases(fs, indexDir)
    // GC reclaim markers whose lease is gone and which are older than a
    // TTL themselves (the reclaimer's session ended; nothing can race)
    all.filter(_.endsWith(".reclaimed")).foreach { m =>
      val mp = new Path(leaseDir(indexDir), m)
      if (!all.contains(m.stripSuffix(".reclaimed")) &&
          leaseHeartbeat(fs, mp).forall(_ < deadline))
        fs.delete(mp, false)
    }
    val conflicts = all
      .filterNot(_.endsWith(".reclaimed"))
      .filterNot(_ == own.getName)
      .filter(other => kind != "write" ||
        other.startsWith("compact") || other.startsWith("remove") ||
        other.startsWith("xwrite"))
      .filterNot { other =>
        // expired => the holder crashed (a live one renews at ttl/3):
        // mark-then-delete. The MARKER makes the reclaim visible to a
        // stalled-but-alive holder whose renew races this delete (the
        // exists-then-rewrite in renew could otherwise resurrect the
        // file and dodge the fence): renew checks the marker first, and
        // the marker is written before the delete, so by the time the
        // holder's commit-point renew runs it either sees the marker or
        // the missing file — fenced either way.
        val p = new Path(leaseDir(indexDir), other)
        val marker = new Path(leaseDir(indexDir), other + ".reclaimed")
        val alreadyReclaimed = all.contains(marker.getName)
        val expired = alreadyReclaimed ||
          leaseHeartbeat(fs, p).forall(_ < deadline)
        if (expired) {
          if (!alreadyReclaimed) fs.create(marker, true).close()
          fs.delete(p, false)
        }
        expired
      }
    if (conflicts.nonEmpty) {
      fs.delete(own, false)
      throw new LeaseConflictException(
        s"$kind on $indexDir refused: in-flight maintenance holds lease(s) " +
          s"${conflicts.mkString(", ")} under $indexDir/lease/. If the " +
          s"holder crashed, its lease self-expires after ${leaseTtlMs}ms; " +
          "to force, clear stale leases (IndexMaintenance.breakLeases)")
    }
    own
  }

  /** Refused at ACQUIRE — nothing ran yet; a caller that staged
    * compensating state for the operation (the takedown loops'
    * tombstones) can safely roll it back on this type, unlike the
    * post-body fencing failure which shares the IllegalStateException
    * parent. */
  final class LeaseConflictException(msg: String)
    extends IllegalStateException(msg)

  def releaseLease(conf: Configuration, lease: Path): Unit = {
    val fs = lease.getFileSystem(conf)
    fs.delete(lease, false)
  }

  /** Read-only lease listing for ops tooling ([[graft.IndexAdmin]]):
    * `(name, heartbeat-age ms, expired)` per live lease file. Expiry is
    * judged by the same rules acquirers use — mtime-vs-TTL, OR a
    * surviving `<name>.reclaimed` marker (a stalled holder's in-flight
    * renew can resurrect a just-reclaimed file with a fresh mtime; the
    * acquirer's alreadyReclaimed branch still treats it as dead, so
    * this listing must too). "expired=true" means the next acquirer
    * WILL clear it. Purely observational — nothing is deleted. */
  def leaseStatus(conf: Configuration,
                  indexDir0: String): Seq[(String, Long, Boolean)] = {
    val indexDir = normalize(indexDir0)
    val fs = new Path(indexDir).getFileSystem(conf)
    val now = System.currentTimeMillis()
    val names = listLeases(fs, indexDir)
    val reclaimed = names.filter(_.endsWith(".reclaimed"))
      .map(_.stripSuffix(".reclaimed")).toSet
    names
      .filterNot(_.endsWith(".reclaimed"))
      .flatMap { n =>
        leaseHeartbeat(fs, new Path(s"$indexDir/lease/$n")).map { hb =>
          val age = math.max(0L, now - hb)
          (n, age, age > leaseTtlMs || reclaimed(n))
        }
      }
  }

  /** A running lease heartbeat: renews the lease file at ttl/3 and trips
    * `fenced` the moment the file is gone (a new acquirer reclaimed it
    * after expiry — filenames are uuid-unique, so existence is
    * ownership). */
  final class LeaseBeat private[IndexMaintenance] (
      fs: FileSystem, lease: Path) {
    @volatile private[IndexMaintenance] var fenced = false
    private val task: java.util.concurrent.ScheduledFuture[_] =
      IndexMaintenance.heartbeatPool.scheduleAtFixedRate(
        () => renew(), heartbeatMs, heartbeatMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
    /** Check-then-touch; also callable synchronously at a commit point.
      * Fences only on OBSERVED loss (reclaim marker present, or file
      * gone — the acquirer writes the marker BEFORE deleting, closing
      * the race where this rewrite resurrects a just-reclaimed file).
      * A transient probe failure skips the beat instead of latching a
      * false fence that would abort hours of compaction: a truly dead
      * heartbeat still expires the lease, whose reclaim the next
      * successful renew — including assertHeld's synchronous one at
      * the commit point — then observes. The catch also keeps the
      * scheduled task alive (scheduleAtFixedRate suppresses later runs
      * after an uncaught exception). Suppressed failures are LOGGED
      * (rate-limited to one line per TTL) so a permanently failing
      * heartbeat — persistent FS misconfiguration — is visible long
      * before the lease silently expires under a live holder; only
      * NonFatal errors are swallowed, so interrupts and fatal JVM
      * errors propagate to the scheduler instead of beating on. */
    @volatile private var lastRenewWarnMs = 0L
    private[IndexMaintenance] def renew(): Unit = synchronized {
      if (!fenced) {
        try renewOnce()
        catch {
          case scala.util.control.NonFatal(e) =>
            val now = System.currentTimeMillis()
            if (now - lastRenewWarnMs >= leaseTtlMs) {
              lastRenewWarnMs = now
              System.err.println(s"[lease] heartbeat renew failed for " +
                s"$lease (beat skipped; lease expires in <= ${leaseTtlMs}ms " +
                s"without a successful renew): ${e.getClass.getName}: " +
                s"${e.getMessage}")
            }
        }
      }
    }
    /** One probe+touch, errors propagated (assertHeld's strict path). */
    private[IndexMaintenance] def renewOnce(): Unit = synchronized {
      if (!fenced) {
        val marker = new Path(lease.getParent, lease.getName + ".reclaimed")
        if (fs.exists(marker) || !fs.exists(lease)) fenced = true
        else writeLeaseFile(fs, lease)
      }
    }
    /** Loud fencing check for the holder's commit point. Unlike the
      * background beats, this probe is STRICT: a filesystem error here
      * must not silently pass the commit (the "stale holder never
      * reports success" invariant) — it retries twice, then surfaces
      * the probe failure itself. */
    private[IndexMaintenance] def assertHeld(what: String): Unit = {
      var probeErr: Throwable = null
      var ok = false
      var attempts = 0
      while (!ok && !fenced && attempts < 3) {
        attempts += 1
        try { renewOnce(); ok = true }
        catch { case t: Throwable => probeErr = t; Thread.sleep(50L * attempts) }
      }
      if (!ok && !fenced) throw new IllegalStateException(
        s"$what: could not verify lease $lease at the commit point " +
          "(filesystem probe kept failing) — refusing to report success " +
          "unverified", probeErr)
      if (fenced) throw new IllegalStateException(
        s"$what: this holder's lease $lease expired and was reclaimed by " +
          "another maintenance operation (stalled past the " +
          s"${leaseTtlMs}ms TTL) — its writes may interleave with the new " +
          "holder's; verify the index (ensure()/isFresh) before serving")
    }
    private[IndexMaintenance] def stop(): Unit = task.cancel(false)
  }

  private lazy val heartbeatPool = {
    // several threads: concurrent holders on DIFFERENT indexes renew
    // independently, and one hung filesystem call must not starve the
    // other holders' beats past the TTL
    val p = new java.util.concurrent.ScheduledThreadPoolExecutor(4, (r: Runnable) => {
      val t = new Thread(r, "graft-lease-heartbeat"); t.setDaemon(true); t
    })
    p.setRemoveOnCancelPolicy(true)
    p
  }

  /** Start the renewal heartbeat for an acquired lease. */
  private def startBeat(conf: Configuration, lease: Path): LeaseBeat =
    new LeaseBeat(lease.getFileSystem(conf), lease)

  /** Schedule a recurring beat on the shared heartbeat pool — the
    * lease-free removal halves' in-flight markers ride the same
    * renewal cadence as lease files ([[Fingerprint.withInflightBeat]]). */
  private[operators] def scheduleBeat(run: Runnable)
      : java.util.concurrent.ScheduledFuture[_] =
    heartbeatPool.scheduleAtFixedRate(run, heartbeatMs, heartbeatMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)

  /** Run independent, idempotent maintenance legs CONCURRENTLY,
    * surfacing the first failure only after every sibling leg settles —
    * a mid-leg crash (injected or real) must never leave another leg's
    * Spark jobs racing the caller's next move (a replaying remove, a
    * test assertion). Each leg carries its [[FaultInjection]] step id,
    * fired after the leg's work; the replay contract is the caller's:
    * every leg must converge from any completed subset. Shared by
    * ClusterIndex.remove (4 legs) and TextIndex.remove (2 legs). */
  private[operators] def runLegs(legs: Seq[(String, () => Unit)]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(legs.size)
    val outcomes =
      try legs.map { case (step, run) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            // label the leg's jobs (guide §1.5; thread-local, so each
            // concurrent leg names its own jobs in the UI / profilers)
            SparkSession.active.sparkContext.setJobDescription(step)
            run(); FaultInjection.maybeCrash(step)
          }
        })
      }.map(f => scala.util.Try(f.get()))
      finally pool.shutdown()
    outcomes.collectFirst { case scala.util.Failure(t) =>
      throw (t match {
        case e: java.util.concurrent.ExecutionException => e.getCause
        case e => e
      })
    }
    ()
  }

  /** Operator escape hatch: clear ALL leases after independently
    * verifying no maintenance is actually running (a crashed holder
    * cannot clean up after itself). */
  def breakLeases(conf: Configuration, indexDir0: String): Unit = {
    val d = leaseDir(normalize(indexDir0))
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true)
  }

  /** Run `body` under a heartbeat-renewed lease, releasing it on every
    * exit path. If the holder stalled past the TTL and another
    * operation reclaimed the lease, the completed body's SUCCESS is
    * refused (fencing): the exception tells the operator the two
    * holders' writes may have interleaved. The check runs after `body`
    * because these are filesystem-rewrite operations with no single
    * revocable commit call — what fencing buys is that a stale holder
    * can never REPORT success, so the condition is always surfaced. */
  def withLease[T](conf: Configuration, indexDir: String, kind: String)
                  (body: => T): T = {
    val lease = acquireLease(conf, indexDir, kind)
    val beat = startBeat(conf, lease)
    try {
      val r = body
      beat.assertHeld(s"$kind on ${normalize(indexDir)}")
      r
    } finally {
      beat.stop()
      releaseLease(conf, lease)
    }
  }

  // ---- compaction cutover ------------------------------------------------

  /** Everything a family compact() needs: the current data root to read,
    * the staging root to write, and the expected generation for the
    * guarded pointer flip. */
  final case class CompactCtx(indexDir: String, fromRoot: String,
                              fromGen: Option[Long], newGen: Long,
                              stagingRoot: String, lease: Path,
                              private[IndexMaintenance] val beat: LeaseBeat)

  /** Acquire the compact lease and prepare a clean next-generation
    * staging directory. Callers MUST end with [[finishCompact]] or
    * [[abortCompact]]. */
  def beginCompact(conf: Configuration, indexDir0: String): CompactCtx = {
    val indexDir = normalize(indexDir0)
    // polite PRE-lease wait for healthy in-flight removal halves
    // (ADVICE r17: waiting after acquire can starve a staged half that
    // needs write/remove leases — same index, different lease kind, but
    // the guard's wait-then-die pattern is the hazard, not the kind)
    Fingerprint.awaitInflightQuiesce(conf, indexDir, rmTag = "")
    val lease = acquireLease(conf, indexDir, "compact")
    try {
      // a crashed removal's persisted plan references THIS generation's
      // (_src, bucket) partitions; folding would remap _src values and
      // orphan the replay — victims lingering physically while meta
      // already subtracted them. Refuse until each replays to
      // completion under its own tag (r13; previously only the remove
      // family cross-checked itself). Since r17 the shared guard
      // classifies a heartbeat-fresh IN-FLIGHT lease-free removal half
      // as a retryable conflict (brief wait, then
      // LeaseConflictException) instead of a false crashed verdict
      // (ADVICE r16) — its crashed branch keeps the refusal semantics.
      Fingerprint.requireNoOtherPendingRemoval(conf, indexDir, rmTag = "",
        s"compact on $indexDir", callerHoldsLease = true)
      val fromGen = currentGen(conf, indexDir)
      val newGen = fromGen.getOrElse(0L) + 1
      val staging = new Path(s"$indexDir/g$newGen")
      val fs = staging.getFileSystem(conf)
      // a crashed prior compact may have left a partial staging tree —
      // it never became live (no pointer flip), so it is junk to clear
      if (fs.exists(staging)) fs.delete(staging, true)
      CompactCtx(indexDir, liveRoot(conf, indexDir), fromGen, newGen,
        staging.toString, lease, startBeat(conf, lease))
    } catch { case t: Throwable => releaseLease(conf, lease); throw t }
  }

  /** Flip the generation pointer to the staged tree and GC retired
    * roots with ONE-GENERATION GRACE. The flip re-checks the pointer
    * against the generation read at [[beginCompact]] — a concurrent
    * generation change (another compact that ignored the lease
    * discipline) fails loudly instead of clobbering.
    *
    * GC is deferred by one cutover (review-caught): probes hold no
    * lease, so an in-flight reader that resolved the ABOUT-TO-RETIRE
    * root would hit deleted files if it were GC'd immediately. Keeping
    * exactly one retired generation makes the reader-completeness claim
    * true for any read that does not span two compaction cycles (and
    * compaction is a rare offline pass); generations older than the one
    * being retired — including the legacy top-level tables once g2 cuts
    * over — are deleted here. Disk cost: at most one extra generation
    * retained. */
  def finishCompact(conf: Configuration, ctx: CompactCtx,
                    legacyTables: Seq[String]): Unit = {
    try {
      // fencing BEFORE the pointer flip: a holder that stalled past the
      // TTL (lease reclaimed) must not cut its stale staged tree live
      ctx.beat.assertHeld(s"compact on ${ctx.indexDir}")
      val now = currentGen(conf, ctx.indexDir)
      require(now == ctx.fromGen,
        s"compact on ${ctx.indexDir}: generation moved ${ctx.fromGen} -> " +
          s"$now while compacting; aborting the cutover (staged tree at " +
          s"${ctx.stagingRoot} is inert)")
      writeGen(conf, ctx.indexDir, ctx.newGen)
      val fs = new Path(ctx.indexDir).getFileSystem(conf)
      // delete everything OLDER than the root just retired; keep the
      // just-retired root itself for in-flight lease-free readers
      ctx.fromGen.foreach { g =>
        legacyTables.foreach(t =>
          fs.delete(new Path(s"${ctx.indexDir}/$t"), true))
        (1L until g).foreach(old =>
          fs.delete(new Path(s"${ctx.indexDir}/g$old"), true))
      }
    } finally { ctx.beat.stop(); releaseLease(conf, ctx.lease) }
  }

  /** Release the compact lease after a failed fold; the staged tree (if
    * any) is left for the next [[beginCompact]] to clear. */
  def abortCompact(conf: Configuration, ctx: CompactCtx): Unit = {
    ctx.beat.stop()
    releaseLease(conf, ctx.lease)
  }

  /** Delete every RETIRED data generation — the GC-grace copies
    * [[finishCompact]] keeps for lease-free in-flight readers of past
    * cutovers. Called by the remove() family (review-caught): the grace
    * copies hold the victims' rows too, and right-to-be-forgotten beats
    * reader grace; the caller's EXCLUSIVE remove lease is the closest
    * thing to a quiesce point the index has, so this is also the safest
    * moment to drop them. No-op on a never-compacted index. */
  def purgeRetired(conf: Configuration, indexDir0: String,
                   legacyTables: Seq[String]): Unit = {
    val indexDir = normalize(indexDir0)
    currentGen(conf, indexDir).foreach { g =>
      val fs = new Path(indexDir).getFileSystem(conf)
      legacyTables.foreach(t => fs.delete(new Path(s"$indexDir/$t"), true))
      (1L until g).foreach(old =>
        fs.delete(new Path(s"$indexDir/g$old"), true))
    }
  }

  // ---- table rewrite primitives -------------------------------------------

  /** Rewrite one table as one file per partition directory. The read
    * merges every footer: compaction is a rare offline pass, and
    * single-footer inference on a mixed pre-provenance index could
    * sample a legacy file, silently DROP the `_src` data column from
    * the resolved schema, and turn a transient read hazard into
    * permanent provenance loss (the hazard [[TextIndex.probe]] /
    * [[VectorIndex.probeDups]] defend against on the hot path).
    * `remap` lets a caller rewrite columns (e.g. [[ClusterIndex]]'s
    * generation fold) before the repartition. */
  def foldTable(s: SparkSession, fromDir: String, tmpDir: String,
                table: String, partCols: Seq[String],
                remap: Map[String, Column] = Map.empty,
                transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
                  identity): Unit = {
    val base = transform(s.read.option("mergeSchema", "true")
      .parquet(s"$fromDir/$table"))
    val remapped = remap.foldLeft(base) { case (df, (name, expr)) =>
      df.withColumn(name, expr)
    }
    remapped
      .repartition(partCols.map(col): _*) // one task per dir => one file per dir
      .write.mode("overwrite").partitionBy(partCols: _*)
      .parquet(s"$tmpDir/$table")
  }

  /** Copy a small unpartitioned table (meta, centroids) as one file. */
  def copyTable(s: SparkSession, fromDir: String, tmpDir: String,
                table: String): Unit =
    s.read.parquet(s"$fromDir/$table")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmpDir/$table")

  /** The batch tags whose `applied/` marker exists — i.e. the streaming
    * loop's commit point was reached, so that batch can never replay its
    * body again (the marker check runs first). Only these generations
    * are safe to fold away; an appended-but-unmarkered batch is the
    * crash-window replay candidate and must keep its provenance.
    * Markers live at the index top level (outside the data
    * generations), so `indexDir` here is the index dir, not a root. */
  def committedTags(conf: Configuration, indexDir: String): Set[String] = {
    val p = new Path(s"$indexDir/applied")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet
  }
}
