package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The cluster family's REMOVAL protocols — the staged physical
  * [[remove]] (windows A/B/C: brief-lease validation + barrier,
  * lease-free staging, brief-lease flip), its plan-first crash-replay
  * machinery (PLAN_READY / REWRITE_STARTED / plan-validity under
  * interleaved appends), and the RTBF fast-path [[logicalRemove]]
  * (tombstone + persisted serve-overlay). Public surface stays on
  * [[ClusterIndex.remove]] / [[ClusterIndex.logicalRemove]], which
  * delegate here. Split out of the facade in r16 (VERDICT r15
  * item 4) — pure code motion, zero behavior change; every FaultInjection
  * crash point, marker path, and leg name is unchanged, so the
  * IndexRemoveSpec / LogicalDeleteSpec crash matrices gate the move.
  */
private[operators] object ClusterRemoval {

  import ClusterIndex.{idb, tb, rleg}
  import ClusterResplit.{resplitPlan, repairComponents, writeOverlay}

  /** Window walls of the LAST [[remove]] on this driver (VERDICT r16
    * item 2 — the physical takedown's cross-box swing needs sub-leg
    * attribution): `rm_validate` = window A (brief-lease validation +
    * fingerprint commit + barrier), `rm_stage` = window B (lease-free
    * staging), `rm_flip` = window C (brief-lease validate + flip +
    * bookkeeping; also carries the in-place fallback/replay path). The
    * bench's composed-takedown query publishes these inside
    * `takedown_legs`, so a contaminated archive names the stage instead
    * of one conflated index_remove number. Driver-side bench plumbing —
    * remove() itself is single-caller-per-index under its leases, but
    * leases are PER-INDEX: two removals on different indexes are legal
    * concurrently, so the windows are keyed by normalized indexDir
    * (ADVICE r17 — a single global map interleaved their resets and
    * published mixed numbers into takedown_legs). */
  private val lastWindowsByDir =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Double]]()
  private[graft] def lastWindows(indexDir: String): Map[String, Double] =
    lastWindowsByDir.getOrDefault(
      IndexMaintenance.normalize(indexDir), Map.empty)
  private def resetWindows(dir: String): Unit =
    lastWindowsByDir.put(dir,
      Map("rm_validate" -> 0.0, "rm_stage" -> 0.0, "rm_flip" -> 0.0))
  private def timedWindow[T](dir: String, k: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    lastWindowsByDir.compute(dir, (_, m0) => {
      val m = Option(m0).getOrElse(Map.empty[String, Double])
      m + (k -> (m.getOrElse(k, 0.0) + (System.nanoTime() - t0) / 1e9))
    })
    r
  }

  /** Index-side targeted DELETE (VERDICT r10 item 1 — the
    * right-to-be-forgotten contract reaching the persisted index, not
    * just the lake): remove `victims` rows from every table and re-split
    * the components they held together. Deletion is the one maintenance
    * op where the append-side quotient argument (class doc) does NOT
    * apply — removing a doc can disconnect its component — so the
    * component structure is recomputed, but SCOPED: only the victims'
    * own components can change (an inter-component edge would have
    * merged them at build/append time, so no other component's
    * connectivity involves a victim), and the re-split is one PPJoin+CC
    * over those components' SURVIVING members — O(touched components),
    * never the corpus.
    *
    * `victims` must carry the EXACT `(id, text)` rows as ingested (the
    * lake still has them pre-delete — the composed flow reads them out
    * before scrubbing): the meta fingerprint is maintained by exact
    * subtraction ([[Fingerprint.unmerge]]), so after remove the index
    * fingerprint equals a fresh build over the surviving corpus and
    * [[isFresh]] keeps answering correctly. All victim ids must be
    * indexed (checked against `toks` before anything mutates).
    *
    * Crash safety is PLAN-FIRST (ADVICE r11, replacing the r11
    * discover-on-replay protocol whose discovery read the very table
    * the rewrites mutate — a crash inside the per-partition dynamic
    * overwrite could strand survivors of partially-flipped components
    * with mixed old/new ids):
    *
    *  1. DISCOVER the affected components, their survivors, and the
    *     re-split assignment while every table is still pristine, and
    *     PERSIST that plan (`rmstate/<tag>/{newassign,parts,commit}` +
    *     a `PLAN_READY` marker written last) — a replay never
    *     re-discovers from mutated state;
    *  2. COMMIT the fingerprint idempotently: the meta write recomputes
    *     the TARGET fingerprint from the persisted commit record, so
    *     the former crash window between the meta overwrite and the
    *     replay record (which double-subtracted) now converges;
    *  3. REWRITE rows driven from the persisted plan — each rewrite is
    *     an idempotent pruned dynamic overwrite, replayable from any
    *     boundary (postings before toks, since the token-bucket prune
    *     derives from the victims' indexed token sets);
    *  4. CLEAR the plan state LAST; a replay finding no state under an
    *     applied record no-ops through empty discovery.
    *
    * The stale `df` hint is left as-is — the one-sided prefix argument
    * (class doc) needs no accurate df, only SOME k-subset, so an
    * over-counted df can never lose a pair. */
  def remove(victims: DataFrame, idCol: String, textCol: String,
             indexDir: String, tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    val normDir = IndexMaintenance.normalize(indexDir)
    // removes record replay state under their own namespace: an append
    // and a remove of the SAME delta under the same tag are different
    // operations — sharing a record would make the remove read as a
    // replay and skip its fingerprint subtraction forever
    val rmTag = s"rm.$tag"
    val vfp = Fingerprint.of(victims, Seq(idCol, textCol))
    val stateDir = Fingerprint.removeStatePath(normDir, rmTag)
    val planMarker = new org.apache.hadoop.fs.Path(s"$stateDir/PLAN_READY")
    val stateFs = planMarker.getFileSystem(conf)
    val barrierBatch = Fingerprint.sanitizeTag(rmTag)

    // ---- WINDOW A (r15, VERDICT r14 item 6): validation + fingerprint
    // commit + victim BARRIER under a BRIEF exclusive lease — the same
    // work (and the same wall) as logicalRemove. The expensive table
    // rewrites then STAGE lease-free (window B) and FLIP under a second
    // brief lease (window C), so the ingest pause is the two short
    // windows, not the full rewrite wall. The barrier is a LogicalDelete
    // tombstone batch under the removal's own tag: from the moment A
    // returns, probes are blind to the victims, appends refuse their
    // ids, and probe candidate generation excludes them — so no new
    // edge, posting, or assignment involving a victim can form while
    // the staging runs, which is what makes the staged rewrite sound. ----
    var root: String = null
    var thr = 0.0
    var nBuckets = 0
    var vids: DataFrame = null
    var nV = 0L
    var vIdb: Seq[Long] = Seq.empty
    var replay = false
    var planReady = false
    var completedReplay = false
    var stagedPath = false
    resetWindows(normDir)
    // polite pre-lease wait for healthy in-flight halves (ADVICE r17:
    // waiting INSIDE window A's lease starves a staged half that needs
    // to re-acquire write/remove for its windows B/C)
    Fingerprint.awaitInflightQuiesce(conf, normDir, rmTag)
    timedWindow(normDir, "rm_validate")(IndexMaintenance.withLease(conf, indexDir, "remove") {
      root = IndexMaintenance.liveRoot(conf, indexDir)
      val m = s.read.parquet(s"$root/meta").head()
      thr = m.getAs[Double]("threshold")
      nBuckets = m.getAs[Int]("n_buckets")
      val oldFp =
        if (m.schema.fieldNames.contains("n_rows"))
          Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
        else None
      replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
      if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
        s"ClusterIndex.remove: tag '$tag' was already used by a different " +
          "removal batch — pass a batch-unique tag (the same (tag, victims) " +
          "pair is the legitimate crash-replay and is re-admitted)")
      // a DIFFERENT removal's surviving state means half-rewritten tables:
      // discovery would violate the pristine premise and the crashed
      // legs would never replay — refuse until that removal completes
      Fingerprint.requireNoOtherPendingRemoval(
        conf, normDir, rmTag, "ClusterIndex.remove",
        callerHoldsLease = true)
      // pending LOGICAL deletions would read as survivors in the re-split
      // discovery — reclaim them first. Our OWN barrier batch (a replay
      // re-entering after A committed it) is exempt: its ids ARE the
      // victims this removal is erasing.
      LogicalDelete.requireNonePending(conf, indexDir, "ClusterIndex.remove",
        exceptBatch = Some(barrierBatch))
      vids = victims.select(col(idCol)).distinct().localCheckpoint()
      nV = vids.count()
      planReady = stateFs.exists(planMarker)
      // a PLAN_READY marker without its commit record means the state
      // dir was PARTIALLY deleted (a cut cleanup): fabricating fresh
      // state here would re-run the rewrites against whatever the id
      // namespace holds NOW — including a legitimately re-ingested
      // victim id — so refuse loudly (review-restored r15; the pre-r15
      // protocol had exactly this guard)
      if (planReady && Fingerprint.readRemoveState(conf, normDir, rmTag).isEmpty)
        throw new IllegalStateException(
          s"ClusterIndex.remove: $stateDir has PLAN_READY but no commit " +
            "record — the state dir was partially deleted; verify the " +
            "index, clear the rmstate dir, and re-run")
      // Replay of a COMPLETED removal (record exists, state cleaned, no
      // plan): the prior run finished — meta, rows, and barrier cleanup
      // all landed. Re-running discovery would find any POST-reclaim
      // re-ingest of a victim id and wrongly erase the new document
      // while meta keeps its contribution (the physical face of the
      // ADVICE r13 logical fix) — the replay is a no-op.
      completedReplay = replay && !planReady &&
        Fingerprint.readRemoveState(conf, normDir, rmTag).isEmpty
      if (nV > 0L && !completedReplay) {
        def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
        // bounded collect: the victim set's id-hash buckets — a pure
        // function of the victims argument, so replay-stable
        vIdb = vids.select(idb(col(idCol), nBuckets).as("idb"))
          .distinct().collect().map(_.getLong(0)).toSeq
        if (!replay && !planReady) {
          // content-set known-check (r14) — see TextIndex.remove:
          // per victim id, stored token-set hashes must equal the victim
          // rows' (one row per id in this family — but a duplicated or
          // conflicting victim feed still mismatches and refuses).
          // Pristine reads: rewrites only ever start after PLAN_READY.
          // The known-check count and the provenance guard read two
          // DIFFERENT tables and share no state — run them concurrently
          // (r18 opt, guide §2.6; runLegs rethrows the known-check's
          // refusal first on a double failure, preserving message order)
          val vToksA = rleg("vtoks")(s.read.parquet(s"$root/toks")
            .filter(col("idb").isin(vIdb: _*))
            .join(bVids(vids), Seq(idCol), "leftsemi")
            .select(col(idCol), col("_toks"))
            .localCheckpoint(eager = false))
          val vAgg = TargetedDelete.contentSet(victims, idCol,
            xxhash64(Dedup.hashedTokenSet(col(textCol))))
            .withColumnRenamed("_chs", "_vchs")
          IndexMaintenance.runLegs(Seq(
            "rm.known" -> (() => {
              val known = rleg("known-check")(
                TargetedDelete.contentSet(vToksA, idCol,
                  xxhash64(col("_toks")))
                .join(bVids(vAgg), Seq(idCol))
                .filter(col("_chs") === col("_vchs"))
                .count())
              if (known != nV) Fingerprint.refuse(
                s"ClusterIndex.remove: only $known of $nV victim ids are " +
                  "indexed with matching content; the fingerprint subtraction " +
                  "needs exactly the ingested rows — pass the (id, text) rows " +
                  "as they entered the index")
            }),
            // mid-append crash guard (see TextIndex.remove): a victim from
            // an append whose fingerprint merge never recorded must not
            // subtract — its delta was never added. Pruned provenance read,
            // bounded by |tags|.
            "rm.guard" -> (() => if (oldFp.isDefined) {
              val vSrcs = rleg("guard")(s.read.parquet(s"$root/assign")
                .filter(col("idb").isin(vIdb: _*))
                .join(bVids(vids), Seq(idCol), "leftsemi")
                .select(col("_src")).filter(col("_src").isNotNull) // pre-provenance rows = build-era
                .distinct().collect().map(_.getString(0)).toSet)
              Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
                "ClusterIndex.remove")
            })))
        }
        // ---- idempotent fingerprint commit, the logicalRemove shape:
        // target persisted BEFORE the meta overwrite (and the metabase
        // before both — see Fingerprint.writeRemoveMetaBase), so every
        // crash boundary — and every append interleaved across one —
        // replays to the same meta value ----
        Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
          oldFp, "ClusterIndex.remove")
        Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
          "ClusterIndex.remove").foreach { fp =>
          rleg("meta-commit")(Seq((thr, nBuckets, fp._1, fp._2))
            .toDF("threshold", "n_buckets", "n_rows", "content_hash")
            .coalesce(1).write.mode("overwrite").parquet(s"$root/meta"))
        }
        FaultInjection.maybeCrash("cluster.meta")
        if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
        FaultInjection.maybeCrash("cluster.record")
        // staged path: only when no rewrite has started (plan absent —
        // a crash mid-staging/flip replays through the in-lease path
        // below, which re-reads LIVE state) and the index tracks append
        // provenance (legacy pre-fingerprint meta records no merges, so
        // window C could not detect an interleaved append)
        stagedPath = !planReady && oldFp.isDefined
        if (stagedPath && !LogicalDelete.pendingBatches(conf, indexDir)
            .contains(barrierBatch))
          LogicalDelete.write(vids, idCol, normDir, rmTag)
      }
    })
    if (nV > 0L && !completedReplay) {
      if (stagedPath)
        // in-flight heartbeat across the staged half (r17): rmstate pends
        // through the lease-free window B and the two lease gaps; the
        // beat keeps concurrent guards reading this as a retryable
        // in-flight removal, never a false crashed verdict (ADVICE r16)
        Fingerprint.withInflightBeat(conf, normDir, rmTag)(
          removeStaged(s, conf, root, normDir, rmTag, stateDir, planMarker,
            idCol, vids, nV, vIdb, nBuckets))
      else timedWindow(normDir, "rm_flip")(IndexMaintenance.withLease(conf, indexDir, "remove") {
        require(IndexMaintenance.liveRoot(conf, indexDir) == root,
          s"ClusterIndex.remove on $indexDir: the index was compacted to a " +
            "new generation during the removal — re-run it (same tag + " +
            "victims replays idempotently) after verifying no maintenance " +
            "is racing")
        // replay / legacy path: plan (if absent) + commit in place,
        // all under one lease — with the same plan-validity and
        // rewrite-started discipline as the staged path (review-caught
        // r15: a replay after PLAN_READY used to commit a stale plan
        // without validation, folding interleaved appends in wrongly)
        if (!stateFs.exists(planMarker)) {
          persistPlan(s, root, normDir, stateDir, idCol, vids, nV, vIdb, nBuckets)
          stateFs.create(planMarker, true).close()
          FaultInjection.maybeCrash("cluster.plan")
        }
        commitFromPlan(s, conf, root, normDir, stateDir, idCol, vids, nV,
          vIdb, nBuckets)
        finishRemove(s, conf, normDir, rmTag, barrierBatch)
      })
    }
  }

  /** Persist the re-split plan (newassign / parts / vtb / comps) for
    * `vids` from the CURRENT tree — the discovery half of [[remove]],
    * shared by the staged first run (window B, lease-free behind the
    * victim barrier) and the in-lease fallback/replay path. The parquet
    * writes double as the materialization the r11 eager checkpoints
    * provided, and the plan — not the soon-to-be-rewritten assign
    * table — is what a replay reads. */
  // ---- small state files beside the plan (r15 review hardening) ----
  // plantags: the recorded-tag snapshot taken BEFORE discovery began —
  // the plan-validity check's reference point (appends record LAST, so
  // any append whose writes could have been half-seen by the discovery
  // scan is guaranteed to show in the delta). REWRITE_STARTED: written
  // under the lease, after validation, before the first rewrite/flip —
  // its presence tells a replay the tables are no longer pristine (plan
  // is the sole authority; never re-validate or rediscover), and its
  // CONTENT (the tag snapshot at that moment) tells the replay whether
  // appends interleaved after the crash, in which case the completed
  // rewrites get a label-repair pass.
  private def writeTagFile(conf: org.apache.hadoop.conf.Configuration,
                           path: String, tags: Set[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(tags.toSeq.sorted.mkString(",")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readTagFile(conf: org.apache.hadoop.conf.Configuration,
                          path: String): Option[Set[String]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      Some(txt.split(",").filter(_.nonEmpty).toSet)
    }
  }

  /** Is the persisted plan still valid against the CURRENT tree? True
    * when no append recorded since the plan's tag snapshot, or when the
    * interleaved appends provably never touched the affected
    * components: equal member-id sets AND no member row from a
    * post-plan tag (the second clause closes the mid-discovery
    * half-read race where an in-flight append's assign partition was
    * read but its edges partition was not — set equality alone could
    * then pass while newassign splits the new doc from its mates).
    * Must run under the remove lease with NO rewrite started. */
  private def planValid(s: SparkSession, conf: org.apache.hadoop.conf.Configuration,
                        root: String, normDir: String, stateDir: String,
                        idCol: String, vids: DataFrame): Boolean = {
    val tagsNow = Fingerprint.recordedTags(conf, normDir)
    val tagsAtPlan = readTagFile(conf, s"$stateDir/plantags")
      .getOrElse(return false) // no snapshot => cannot prove validity
    if (tagsNow == tagsAtPlan) true
    else rleg("plan-validate") {
      val compsDf = s.read.parquet(s"$stateDir/comps")
      val current = s.read.parquet(s"$root/assign")
        .join(broadcast(compsDf), Seq("component"), "left_semi")
        .select(col(idCol), col("_src"))
        .localCheckpoint(eager = false)
      val planIds = s.read.parquet(s"$stateDir/newassign")
        .select(col(idCol))
        .unionByName(vids.select(col(idCol)))
      val newSrcs = (tagsNow -- tagsAtPlan).map(Fingerprint.sanitizeTag).toSeq
      val touchedByNew =
        if (newSrcs.isEmpty) 0L
        else current.filter(col("_src").isin(newSrcs: _*)).limit(1).count()
      val drifted =
        current.select(col(idCol)).exceptAll(planIds).limit(1).count() +
          planIds.exceptAll(current.select(col(idCol))).limit(1).count()
      touchedByNew == 0L && drifted == 0L
    }
  }

  /** Persist the plan files; returns the collected (parts, vtb) lists
    * so the staged first-run path never re-reads them from parquet
    * (r18 opt — replay paths still read the persisted files, which stay
    * byte-equivalent: the local re-write writes exactly the collected
    * rows). */
  private def persistPlan(s: SparkSession, root: String, normDir: String,
                          stateDir: String,
                          idCol: String, vids: DataFrame, nV: Long,
                          vIdb: Seq[Long], nBuckets: Int,
                          preVtb: Option[Seq[Long]] = None)
      : (Seq[(String, Long)], Seq[Long]) = {
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    // snapshot FIRST (see the plantags comment above)
    writeTagFile(conf, s"$stateDir/plantags",
      Fingerprint.recordedTags(conf, normDir))
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    // the victims' INDEXED token sets drive the postings bucket prune.
    // Read from the CURRENT toks table on purpose: until del-toks runs
    // it is pristine, and a replay after del-toks finds it empty exactly
    // when del-postings already completed — the prune no-ops. The
    // staged first run precomputes the buckets (preVtb) BEFORE its
    // fan-out so stage.postings needn't wait for this plan call's
    // CC-bearing critical path (r19); same expression, same pristine
    // read, the file written below is identical either way.
    lazy val vToks = rleg("vtoks")(s.read.parquet(s"$root/toks")
      .filter(col("idb").isin(vIdb: _*))
      .join(bVids(vids), Seq(idCol), "leftsemi")
      .select(col(idCol), col("_toks"))
      .localCheckpoint(eager = false))
    val (comps, newAssign) = resplitPlan(s, root, idCol, vids, nV, vIdb)
    // the four plan files are independent — write them CONCURRENTLY
    // (r18 opt, guide §2.6 overlap: serial they cost four small-job
    // walls; the shared lazy checkpoints (comps, survivors) are already
    // materialized by the CC pass inside resplitPlan, so the pool never
    // races a first materialization). parts/vtb are driver-small by
    // construction — collect them and write the collected rows, so the
    // caller gets the lists without a parquet round-trip.
    var parts: Seq[(String, Long)] = Seq.empty
    var vTb: Seq[Long] = Seq.empty
    rleg("plan-write")(IndexMaintenance.runLegs(Seq(
      "plan.newassign" -> (() =>
        newAssign.write.mode("overwrite").parquet(s"$stateDir/newassign")),
      // the assign partitions to rewrite: every partition holding a
      // row of an affected component (victims included). Driver-small
      // (<= generations x buckets).
      "plan.parts" -> (() => {
        parts = s.read.parquet(s"$root/assign")
          .join(bVids(comps), Seq("component"), "left_semi")
          .select(col("_src"), col("idb").cast("long").as("idb")).distinct()
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        parts.toDF("_src", "idb")
          .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/parts")
      }),
      // plan-resident postings buckets make all four rewrites order-free
      // — and therefore parallel (r12)
      "plan.vtb" -> (() => {
        vTb = preVtb.getOrElse(
          vToks.select(explode(col("_toks")).as("_tok"))
            .select(tb(col("_tok"), nBuckets).as("tb")).distinct()
            .collect().map(_.getLong(0)).toSeq)
        vTb.toDF("tb")
          .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/vtb")
      }),
      // the affected components themselves — window C's plan-validity
      // membership check reads these (r15)
      "plan.comps" -> (() =>
        comps.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/comps")))))
    (parts, vTb)
  }
  /** The four plan-driven table rewrites, IN PLACE and in PARALLEL —
    * the pre-r15 commit phase, now the replay/fallback path. Every
    * rewrite touches a DISTINCT table, every prune input lives in the
    * persisted plan (never in another rewrite's table), and every
    * rewrite is an idempotent pruned dynamic overwrite — so a replay
    * converges from ANY completed subset, including a crash mid-FLIP of
    * the staged path (flipped partitions pass through keep unchanged:
    * victims already gone, the remap joins by id and is idempotent).
    *
    * edges: adjacency-log hygiene — a removed id MUST leave the log,
    * or a later re-ingest under the same id would inherit the old
    * text's edges and falsely merge clusters. One combined
    * either-endpoint pass through equi semi/anti joins — no collected
    * literal list (ADVICE r11). Dead set nodes keep their set-set
    * rows: consumers drop them at read time via the member-row
    * liveness rule; compaction folds them away. */
  /** The assign-table surgery closures — (mark, keep, prePrune) for the
    * plan-driven combined victim-drop + survivor-remap — shared by the
    * in-place rewrite, the staged rewrite, and the digest-staleness
    * downgrade (one definition; review-caught r15: three copies would
    * drift). */
  private def assignSurgery(s: SparkSession, stateDir: String, idCol: String,
                            vids: DataFrame, nV: Long,
                            parts: Seq[(String, Long)]):
      (DataFrame => DataFrame, DataFrame => DataFrame, Column) = {
    import s.implicits._
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    // A/B-rejected r19: consuming the in-memory newAssign here (saving
    // the tiny parquet re-read) re-runs the CC-tail joins inside the
    // staged write and FRAGMENTS it into more AQE stage-jobs (14 vs 9
    // for stage.assign) — the file read is the cheaper plan.
    val newAssign = s.read.parquet(s"$stateDir/newassign")
    val partsDf = parts.toDF("_psrc", "_pidb")
    (df => df.join(broadcast(partsDf),
        col("_src") === col("_psrc") &&
          col("idb").cast("long") === col("_pidb"), "left_semi"),
      df => df.join(bVids(vids), Seq(idCol), "left_anti")
        .join(newAssign, Seq(idCol), "left")
        .withColumn("component",
          coalesce(col("_newcomp"), col("component")))
        .drop("_newcomp"),
      col("idb").isin(parts.map(_._2).distinct: _*))
  }

  private def rewriteFromPlan(s: SparkSession, conf: org.apache.hadoop.conf.Configuration,
                              root: String, stateDir: String, idCol: String,
                              vids: DataFrame, nV: Long,
                              vIdb: Seq[Long]): Unit = {
    val parts = s.read.parquet(s"$stateDir/parts")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val vTb = s.read.parquet(s"$stateDir/vtb")
      .collect().map(_.getLong(0)).toSeq
    IndexMaintenance.runLegs(Seq(
      "cluster.assign" -> (() => rleg("assign-rewrite")(if (parts.nonEmpty) {
        val (mark, keep, prePrune) = assignSurgery(s, stateDir, idCol, vids, nV, parts)
        TargetedDelete.rewriteWhere(
          s, s"$root/assign", Seq("_src", "idb"), mark, keep, prePrune)
        (): Unit
      })),
      "cluster.postings" -> (() => rleg("del-postings")(if (vTb.nonEmpty) {
        TargetedDelete.delete(s, s"$root/postings",
          Seq("_src", "tb"), idCol, vids, col("tb").isin(vTb: _*))
        (): Unit
      })),
      "cluster.toks" -> (() => rleg("del-toks") {
        TargetedDelete.delete(s, s"$root/toks",
          Seq("_src", "idb"), idCol, vids, col("idb").isin(vIdb: _*))
        (): Unit
      }),
      "cluster.edges" -> (() => rleg("del-edges") {
        TargetedDelete.deleteAnyKey(s, s"$root/edges",
          Seq("_src", "eb"), Seq("u", "v"), idCol, vids)
        (): Unit
      })))
  }

  /** The removal's trailing bookkeeping, shared by both commit paths:
    * freshness fast-path revocation, retired-generation purge (RTBF
    * beats reader grace), barrier-tombstone cleanup, and — LAST — the
    * state cleanup; a replay arriving after this point no-ops through
    * the completed-replay rule under its applied record. */
  private def finishRemove(s: SparkSession, conf: org.apache.hadoop.conf.Configuration,
                           normDir: String, rmTag: String,
                           barrierBatch: String): Unit = {
    Fingerprint.clearSourceStatus(conf, normDir)
    rleg("bookkeeping")(IndexMaintenance.purgeRetired(conf, normDir,
      Seq("assign", "toks", "postings", "df", "edges", "meta")))
    LogicalDelete.clearBatches(conf, normDir, Seq(barrierBatch))
    Fingerprint.clearRemoveState(conf, normDir, rmTag)
  }

  private def deleteStaged(conf: org.apache.hadoop.conf.Configuration,
                           stateDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/staged")
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Commit the persisted plan IN PLACE under the remove lease — the
    * replay / fallback / legacy path, with the r15 review hardening:
    * before the FIRST rewrite ever runs, the plan is validated against
    * interleaved appends exactly like window C (a stale plan
    * rediscovers — nothing has mutated, the tree is pristine again
    * under the lease); once REWRITE_STARTED exists the plan is the sole
    * authority (tables are mid-rewrite — re-validation would read
    * half-applied state), the rewrites complete idempotently after
    * restoring any cut-mid-swap staged partitions, and appends recorded
    * AFTER the rewrites began get a label-repair pass over the affected
    * components. */
  private def commitFromPlan(s: SparkSession, conf: org.apache.hadoop.conf.Configuration,
                             root: String, normDir: String, stateDir: String,
                             idCol: String, vids: DataFrame, nV: Long,
                             vIdb: Seq[Long], nBuckets: Int): Unit = {
    val startedPath = s"$stateDir/REWRITE_STARTED"
    readTagFile(conf, startedPath) match {
      case None =>
        if (!planValid(s, conf, root, normDir, stateDir, idCol, vids)) {
          deleteStaged(conf, stateDir) // stale staging is meaningless now
          persistPlan(s, root, normDir, stateDir, idCol, vids, nV, vIdb, nBuckets)
        }
        writeTagFile(conf, startedPath, Fingerprint.recordedTags(conf, normDir))
        rewriteFromPlan(s, conf, root, stateDir, idCol, vids, nV, vIdb)
      case Some(tagsAtStart) =>
        // a flip may have been cut between a partition's delete and its
        // rename: restore those partitions from their staged copies
        // BEFORE the in-place pass reads the table (review-caught r15 —
        // without this the partition's unrelated survivor rows are lost)
        val staged = s"$stateDir/staged"
        Seq("assign", "postings", "toks", "edges").foreach { t =>
          TargetedDelete.restoreStaged(s, s"$root/$t", s"$staged/$t")
        }
        rewriteFromPlan(s, conf, root, stateDir, idCol, vids, nV, vIdb)
        if (Fingerprint.recordedTags(conf, normDir) != tagsAtStart)
          repairComponents(s, root, stateDir, idCol)
    }
  }

  /** The r15 staged commit path (VERDICT r14 item 6): discovery +
    * staging run LEASE-FREE behind the victim barrier window A wrote —
    * probes are already blind, appends refuse the victim ids, and probe
    * candidate generation excludes them, so nothing involving a victim
    * can form while this runs — then window C takes the remove lease
    * only for plan validation + the partition FLIP + bookkeeping. The
    * ingest pause becomes A + C (~the logicalRemove wall twice) instead
    * of the full rewrite wall (~30 s at sf1, hours at 100 TB).
    *
    * Plan validity under interleaved appends (window C): the plan holds
    * iff the affected components' membership is untouched — equal
    * member-id sets AND no member row from a tag recorded after the
    * plan snapshot (the second clause closes the mid-discovery-scan
    * race where an in-flight append's assign partition was read but its
    * edges partition was not: set equality alone could then pass while
    * newassign splits the new doc from its mates). Any drift falls back
    * to rediscovery + in-place rewrites under the lease — the pre-r15
    * path at the pre-r15 cost, never a wrong answer. Per-partition
    * staleness (an append's bridge amendment landing in a staged ASSIGN
    * partition — the one table appends amend in place) is caught by the
    * manifest digests and downgraded to the in-place assign rewrite
    * alone; toks/postings/edges partitions are only ever appended as
    * NEW partition dirs, which the selective flip never touches. */
  private def removeStaged(s: SparkSession, conf: org.apache.hadoop.conf.Configuration,
                           root: String, normDir: String, rmTag: String,
                           stateDir: String, planMarker: org.apache.hadoop.fs.Path,
                           idCol: String, vids: DataFrame,
                           nV: Long, vIdb: Seq[Long], nBuckets: Int): Unit = {
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    val stateFs = planMarker.getFileSystem(conf)
    val staged = s"$stateDir/staged"
    var parts: Seq[(String, Long)] = Seq.empty
    var vTb: Seq[Long] = Seq.empty
    // ---- WINDOW B: discovery + plan + staging, under a WRITE lease —
    // appends coexist (write+write is allowed; the victim barrier keeps
    // them away from anything this removal touches), while a concurrent
    // remove/logicalRemove/compact gets the RETRYABLE
    // LeaseConflictException at its own acquire instead of reading this
    // healthy in-flight removal's rmstate as "crashed ... never
    // completed" (review-caught r15: the takedown streams retry the
    // former and die on the latter) ----
    timedWindow(normDir, "rm_stage")(IndexMaintenance.withLease(conf, normDir, "write") {
      import s.implicits._
      // the postings bucket prune, derived UP FRONT (pristine toks read
      // — same expression persistPlan would run) so the plan call's
      // CC-bearing critical path no longer gates stage.postings
      val vToksPre = rleg("vtoks")(s.read.parquet(s"$root/toks")
        .filter(col("idb").isin(vIdb: _*))
        .join(bVids(vids), Seq(idCol), "leftsemi")
        .select(col(idCol), col("_toks")))
      vTb = rleg("vtb")(vToksPre.select(explode(col("_toks")).as("_tok"))
        .select(tb(col("_tok"), nBuckets).as("tb")).distinct()
        .collect().map(_.getLong(0)).toSeq)
      // OVERLAP the CC-bearing plan (and the assign staging that needs
      // its newassign/parts output) with the three victim-only staged
      // rewrites (r19, guide §2.6): staging never mutates the live
      // tree, so a crash anywhere in this fan-out replays exactly as
      // before — PLAN_READY present => in-place commitFromPlan (stale
      // staged dirs are overwritten or cleared), absent => rediscovery
      // over the still-pristine tables re-stages from scratch. The
      // IndexRemoveSpec crash matrix gates both boundaries.
      IndexMaintenance.runLegs(Seq(
        "stage.plan" -> (() => {
          val planLists = persistPlan(s, root, normDir, stateDir, idCol,
            vids, nV, vIdb, nBuckets, preVtb = Some(vTb))
          stateFs.create(planMarker, true).close() // plan commit point
          FaultInjection.maybeCrash("cluster.plan")
          parts = planLists._1
          // nested single leg keeps the stage.assign crash point and
          // leg name exactly where the matrix arms them
          IndexMaintenance.runLegs(Seq(
            "stage.assign" -> (() => rleg("stage-assign")(if (parts.nonEmpty) {
              val (mark, keep, prePrune) =
                assignSurgery(s, stateDir, idCol, vids, nV, parts)
              TargetedDelete.stageRewrite(
                s, s"$root/assign", s"$staged/assign", Seq("_src", "idb"),
                mark, keep, prePrune,
                captureStatus = true) // assign is the one append-amendable table
            }))))
        }),
        "stage.postings" -> (() => rleg("stage-postings")(if (vTb.nonEmpty) {
          TargetedDelete.stageRewrite(
            s, s"$root/postings", s"$staged/postings", Seq("_src", "tb"),
            mark = df => df.join(bVids(vids), Seq(idCol), "left_semi"),
            keep = df => df.join(bVids(vids), Seq(idCol), "left_anti"),
            prePrune = col("tb").isin(vTb: _*))
        })),
        "stage.toks" -> (() => rleg("stage-toks") {
          TargetedDelete.stageRewrite(
            s, s"$root/toks", s"$staged/toks", Seq("_src", "idb"),
            mark = df => df.join(bVids(vids), Seq(idCol), "left_semi"),
            keep = df => df.join(bVids(vids), Seq(idCol), "left_anti"),
            prePrune = col("idb").isin(vIdb: _*))
        }),
        "stage.edges" -> (() => rleg("stage-edges") {
          def keysAs(c: String) =
            TargetedDelete.maybeBroadcast(vids.select(col(idCol).as(c)), nV)
          TargetedDelete.stageRewrite(
            s, s"$root/edges", s"$staged/edges", Seq("_src", "eb"),
            mark = df => Seq("u", "v")
              .map(c => df.join(keysAs(c), Seq(c), "left_semi"))
              .reduce(_ unionByName _),
            keep = df => Seq("u", "v").foldLeft(df)((d, c) =>
              d.join(keysAs(c), Seq(c), "left_anti")))
        })))
    })
    FaultInjection.maybeCrash("cluster.stage")
    // ---- WINDOW C: validate + flip under the remove lease ----
    timedWindow(normDir, "rm_flip")(IndexMaintenance.withLease(conf, normDir, "remove") {
      require(IndexMaintenance.liveRoot(conf, normDir) == root,
        s"ClusterIndex.remove on $normDir: the index was compacted to a " +
          "new generation during the removal — re-run it (same tag + " +
          "victims replays idempotently) after verifying no maintenance " +
          "is racing")
      if (!planValid(s, conf, root, normDir, stateDir, idCol, vids)) {
        // interleaved appends touched the affected components: the plan
        // is stale. Rediscover under the lease — appends are excluded
        // now and no rewrite has run, so the tree is pristine again —
        // and commit in place: correctness first, pre-r15 cost.
        deleteStaged(conf, stateDir)
        persistPlan(s, root, normDir, stateDir, idCol, vids, nV, vIdb, nBuckets)
        writeTagFile(conf, s"$stateDir/REWRITE_STARTED",
          Fingerprint.recordedTags(conf, normDir))
        rewriteFromPlan(s, conf, root, stateDir, idCol, vids, nV, vIdb)
      } else {
        // the flip is about to mutate tables: from here a replay must
        // never re-validate or rediscover (commitFromPlan's rule)
        writeTagFile(conf, s"$stateDir/REWRITE_STARTED",
          Fingerprint.recordedTags(conf, normDir))
        IndexMaintenance.runLegs(Seq(
          // flip legs keep the pre-r15 leg names: the crash matrix arms
          // them, and a crash after any flip replays through
          // commitFromPlan (plan present => fallback), which restores
          // cut-mid-swap partitions and re-reads LIVE state
          "cluster.assign" -> (() => rleg("flip-assign")(if (parts.nonEmpty) {
            if (!TargetedDelete.applyStaged(s, s"$root/assign", s"$staged/assign")) {
              // an append amended a staged assign partition (digest
              // drift): in-place assign rewrite reads current rows
              val (mark, keep, prePrune) =
                assignSurgery(s, stateDir, idCol, vids, nV, parts)
              TargetedDelete.rewriteWhere(
                s, s"$root/assign", Seq("_src", "idb"), mark, keep, prePrune)
              (): Unit
            }
          })),
          "cluster.postings" -> (() => rleg("flip-postings")(if (vTb.nonEmpty) {
            TargetedDelete.applyStaged(s, s"$root/postings", s"$staged/postings")
            (): Unit
          })),
          "cluster.toks" -> (() => rleg("flip-toks") {
            TargetedDelete.applyStaged(s, s"$root/toks", s"$staged/toks")
            (): Unit
          }),
          "cluster.edges" -> (() => rleg("flip-edges") {
            TargetedDelete.applyStaged(s, s"$root/edges", s"$staged/edges")
            (): Unit
          })))
      }
      finishRemove(s, conf, normDir, rmTag,
        Fingerprint.sanitizeTag(rmTag))
    })
  }

  /** LOGICAL targeted delete (VERDICT r12 item 1) — the RTBF fast path:
    * same validation and the same idempotent fingerprint subtraction as
    * [[remove]], but the mutations are one small tombstone-batch write
    * under `<indexDir>/deleted/` plus the serve-overlay (the victims'
    * component re-split, persisted so reads don't recompute it) — both
    * bounded by the victims' components, no index table rewritten.
    * Probes, [[assignments]], and [[knownIds]] are
    * blind to the victims the moment this returns; the rows are
    * physically reclaimed — and the component structure reconciled —
    * by the next [[compact]] (see [[LogicalDelete]] for the interim
    * semantics: tombstoned ids are dead to appends until reclaim, and
    * a component a victim bridged stays unsplit until reclaim).
    * `victims` must carry the EXACT `(id, text)` rows as ingested,
    * like [[remove]]; tags share the remove namespace (a tag can never
    * be reused across a logical and a physical removal). */
  def logicalRemove(victims: DataFrame, idCol: String, textCol: String,
                    indexDir: String, tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    // set inside the lease when the mutating half ran; consumed by the
    // LEASE-FREE overlay half below (r16 — see the comment there)
    var overlayArgs: Option[(String, Int, DataFrame, Long, Seq[Long],
      Option[(Long, Long)], String)] = None
    // polite pre-lease wait for healthy in-flight halves (ADVICE r17)
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val m = s.read.parquet(s"$root/meta").head()
    val thr = m.getAs[Double]("threshold")
    val nBuckets = m.getAs[Int]("n_buckets")
    val oldFp =
      if (m.schema.fieldNames.contains("n_rows"))
        Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
      else None
    val rmTag = s"rm.$tag" // shared namespace with remove(), on purpose
    val vfp = Fingerprint.of(victims, Seq(idCol, textCol))
    val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
    if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
      s"ClusterIndex.logicalRemove: tag '$tag' was already used by a " +
        "different removal batch — pass a batch-unique tag")
    val normDir = IndexMaintenance.normalize(indexDir)
    Fingerprint.requireNoOtherPendingRemoval(
      conf, normDir, rmTag, "ClusterIndex.logicalRemove",
      callerHoldsLease = true)
    val vids = victims.select(col(idCol)).distinct().localCheckpoint()
    val nV = vids.count()
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    // Replay of a COMPLETED run: the applied record exists but no removal
    // state pends — the prior invocation ran through its state cleanup
    // (the last step), so meta, record, and tombstone all landed and a
    // later compact() may already have reclaimed the batch. Re-writing
    // the tombstone here would re-hide ids legitimately re-ingested
    // after that reclaim (ADVICE r13) — the replay is a no-op.
    val completedReplay = replay &&
      Fingerprint.readRemoveState(conf, normDir, rmTag).isEmpty
    if (nV > 0L && !completedReplay) {
      // a pre-r11 index has no adjacency log: compact's reclaim re-split
      // reads it, so refusing HERE — nothing mutated yet — beats a
      // tombstone that bricks every later compact (review-caught r13;
      // same edgesOk rule as ensure())
      val edgesDir = new org.apache.hadoop.fs.Path(s"$root/edges")
      val edgesFs = edgesDir.getFileSystem(conf)
      if (!edgesFs.exists(edgesDir) || edgesFs.listStatus(edgesDir).isEmpty)
        Fingerprint.refuse(
          "ClusterIndex.logicalRemove: this index has no adjacency log " +
            "(pre-r11 layout) — rebuild it (ensure()) first; compact's " +
            "reclaim needs the log to re-split the victims' components")
      val vIdb = vids.select(idb(col(idCol), nBuckets).as("idb"))
        .distinct().collect().map(_.getLong(0)).toSeq
      if (!replay) {
        // a second logical delete of the same id would double-subtract
        LogicalDelete.requireNotTombstoned(s, indexDir, vids, idCol,
          "ClusterIndex.logicalRemove")
        // victims indexed WITH matching content set (the
        // fingerprint subtraction needs exactly the ingested rows) —
        // same pruned read as remove()'s known-check (r14); known-check
        // and provenance guard run concurrently like remove()'s (r18)
        val vAgg = TargetedDelete.contentSet(victims, idCol,
          xxhash64(Dedup.hashedTokenSet(col(textCol))))
          .withColumnRenamed("_chs", "_vchs")
        IndexMaintenance.runLegs(Seq(
          "lrm.known" -> (() => {
            val known = rleg("known-check")(
              TargetedDelete.contentSet(
                s.read.parquet(s"$root/toks")
                  .filter(col("idb").isin(vIdb: _*))
                  .join(bVids(vids), Seq(idCol), "leftsemi"),
                idCol, xxhash64(col("_toks")))
              .join(bVids(vAgg), Seq(idCol))
              .filter(col("_chs") === col("_vchs"))
              .count())
            if (known != nV) Fingerprint.refuse(
              s"ClusterIndex.logicalRemove: only $known of $nV victim ids " +
                "are indexed with matching content; the fingerprint " +
                "subtraction needs exactly the ingested rows — pass the " +
                "(id, text) rows as they entered the index")
          }),
          // mid-append crash guard, same as remove()
          "lrm.guard" -> (() => if (oldFp.isDefined) {
            val vSrcs = rleg("guard")(s.read.parquet(s"$root/assign")
              .filter(col("idb").isin(vIdb: _*))
              .join(bVids(vids), Seq(idCol), "leftsemi")
              .select(col("_src")).filter(col("_src").isNotNull)
              .distinct().collect().map(_.getString(0)).toSet)
            Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
              "ClusterIndex.logicalRemove")
          })))
      }
      // idempotent fingerprint commit — the same protocol shape as the
      // physical families: metabase, then target, then the meta
      // overwrite, so every crash boundary — and appends interleaved
      // across one — replays to the same meta value (r15:
      // Fingerprint.resolveRemovalMeta's reconstruction)
      Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
        oldFp, "ClusterIndex.logicalRemove")
      FaultInjection.maybeCrash("cluster.logical.state")
      val resolvedFp = Fingerprint.resolveRemovalMeta(conf, normDir, rmTag,
        oldFp, "ClusterIndex.logicalRemove")
      resolvedFp.foreach { fp =>
        Seq((thr, nBuckets, fp._1, fp._2))
          .toDF("threshold", "n_buckets", "n_rows", "content_hash")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      }
      FaultInjection.maybeCrash("cluster.logical.meta")
      if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
      FaultInjection.maybeCrash("cluster.logical.record")
      // the one correctness-bearing "leg": the tombstone batch
      // (idempotent overwrite) — probes are blind from here
      LogicalDelete.write(vids, idCol, normDir, rmTag)
      overlayArgs = Some((root, nBuckets, vids, nV, vIdb, resolvedFp, normDir))
    }
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"ClusterIndex.logicalRemove on $indexDir: the index was compacted " +
        "during the removal — re-run it after verifying no maintenance " +
        "is racing")
    }
    // ---- LEASE-FREE overlay half (r16): the serve-overlay write is
    // the expensive leg of the logical takedown (the victims\' component
    // re-split over the edge log — ~19 s of a ~24 s call at sf1 when a
    // victim hits a large family) and it is ADVISORY: readers validate
    // (root, fingerprint, batch list, and since r16 the identity
    // embedded in the pinned payload) and fall back to the live
    // recompute on ANY mismatch. Holding the globally-exclusive remove
    // lease across it made every concurrent ingest append wait out the
    // re-split (TakedownIngestProfile: ~13.5 s blocked at sf1 vs the
    // staged physical remove\'s ~1.8 s) for zero correctness benefit —
    // the lease-free write has exactly the live recompute\'s read
    // exposure (snapshot-less parquet reads under in-flight appends),
    // and anything an interleaved append or compact changes invalidates
    // the overlay at read time (fingerprint/root drift), never serves
    // it. Protocol order is unchanged: the crash point stays between
    // the tombstone write and the overlay, state clears LAST, so a
    // crash anywhere in this half leaves rmstate pending and the replay
    // re-runs the overlay idempotently (LogicalDeleteSpec case 2). A
    // concurrent removal cannot start meanwhile (rmstate pends), and a
    // concurrent append merely invalidates the artifact it raced.
    overlayArgs.foreach { case (root, nBuckets, vids, nV, vIdb,
        resolvedFp, normDir) =>
      val rmTag = s"rm.$tag"
      // in-flight heartbeat (r17, ADVICE r16): rmstate legitimately
      // pends for this half's whole wall on every HEALTHY call — the
      // beat keeps concurrent compact()/removal/ensure() guards reading
      // it as a retryable in-flight removal (brief wait, then
      // LeaseConflictException) instead of a false "crashed ... never
      // completed" verdict; a real crash stops the beat and the verdict
      // flips back within one lease TTL.
      Fingerprint.withInflightBeat(conf, normDir, rmTag) {
        FaultInjection.maybeCrash("cluster.logical.overlay")
        // BEST-EFFORT (review-caught r15): a transient failure must not
        // leave rmstate pending and wedge later removals over an artifact
        // whose absence costs one extra per-read recompute.
        try rleg("overlay")(writeOverlay(s, root, normDir, idCol, nBuckets,
          curBatch = rmTag, curVids = (vids, nV, vIdb), newFp = resolvedFp))
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println("[ClusterIndex.logicalRemove] serve-overlay " +
              s"write failed — serves fall back to the live re-split: $e")
        }
        Fingerprint.clearSourceStatus(conf, indexDir)
        // state cleanup LAST — every step above replays from the record
        Fingerprint.clearRemoveState(conf, normDir, rmTag)
      }
    }
  }
}
