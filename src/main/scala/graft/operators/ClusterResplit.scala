package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The victim-scoped component RE-SPLIT machinery shared by every
  * consumer that must answer "what do the affected components look
  * like without these docs" — [[ClusterIndex.assignments]]'s
  * serve-time bridge-split, [[ClusterIndex.compact]]'s tombstone
  * reclaim, [[ClusterRemoval]]'s physical remove plan and its
  * crash-window label repair, and the persisted serve-overlay
  * [[ClusterRemoval.logicalRemove]] writes. Split out of the
  * ClusterIndex facade in r16 (VERDICT r15 item 4) — pure code motion,
  * zero behavior change; the protocol docs live on the members.
  */
private[operators] object ClusterResplit {

  import ClusterIndex.{idb, rleg, readFingerprint}

  // ---- tombstone serve-overlay (r15, this round): the bridge-split as a
  // persisted artifact instead of a per-read recompute -------------------
  //
  // logicalRemove computes the victim re-split ONCE (it is already
  // bounded by the victims' components) and persists it under the
  // tombstone dir; every assignments() read until the next compact then
  // pays one tiny parquet read instead of an adjacency-log traversal.
  // Validity is pinned by three recorded facts — the data root (a
  // compact flips it), the corpus fingerprint (any append or removal
  // moves it), and the exact pending-batch list (a crash between the
  // tombstone write and the overlay write leaves them out of step) —
  // any mismatch, or any read error from a concurrent overwrite, falls
  // back to the live recompute, so a WRONG overlay can never be served:
  // the fingerprint is captured BEFORE the payload tables are read, so
  // an append interleaving anywhere in the window makes the recorded
  // value trail meta and the overlay conservatively invalid.
  private def overlayDir(indexDir: String): String =
    LogicalDelete.overlayDir(indexDir)
  private def overlayMetaDir(indexDir: String): String =
    LogicalDelete.overlayMetaDir(indexDir)

  /** Persist the union-pending re-split; called by logicalRemove's
    * LEASE-FREE half, AFTER the remove lease releases (r16 — write and
    * remove leases conflict, so holding the lease across this ~19 s
    * re-split blocked every concurrent ingest append for zero
    * correctness benefit). Safe lease-free because the artifact is
    * advisory: readers validate the payload-embedded identity
    * (root/fingerprint/batch list) on pinned rows after checkpointing
    * and fall back to the live recompute on ANY mismatch, so whatever a
    * concurrent append or compact changes invalidates the overlay at
    * read time rather than serving it. The caller keeps rmstate pending
    * (with an in-flight heartbeat since r17) across this half, so a
    * concurrent removal cannot start meanwhile. Skips legacy
    * fingerprint-less metas — there is nothing to validate against, so
    * serves recompute live.
    *
    * `curBatch`/`curVids` reuse the caller's already-checkpointed state
    * for the overwhelmingly common single-pending-batch case — the
    * overlay then adds only the re-split itself plus two small writes
    * to the takedown wall, no re-derivation jobs. `newFp` is the
    * fingerprint the caller just committed (re-read only on the replay
    * path where it didn't write one). */
  private[operators] def writeOverlay(s: SparkSession, root: String, normDir: String,
                           idCol: String, nBuckets: Int,
                           curBatch: String,
                           curVids: (DataFrame, Long, Seq[Long]),
                           newFp: Option[(Long, Long)]): Unit = {
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    newFp.orElse(readFingerprint(s, root)).foreach { fp =>
      val batches = LogicalDelete.pendingBatches(conf, normDir)
      val union: Option[(DataFrame, Long, Seq[Long])] =
        if (batches == Seq(Fingerprint.sanitizeTag(curBatch))) Some(curVids)
        else LogicalDelete.idsOf(s, normDir, batches).map { t =>
          val allVids = t.select(col(LogicalDelete.idColOf(t)).as(idCol))
            .localCheckpoint()
          val vIdb = allVids.select(idb(col(idCol), nBuckets).as("idb"))
            .distinct().collect().map(_.getLong(0)).toSeq
          (allVids, allVids.count(), vIdb)
        }
      union.foreach { case (allVids, nAll, vIdb) =>
        val (_, newAssign) = resplitPlan(s, root, idCol, allVids, nAll, vIdb)
        // the payload EMBEDS its own identity (constant columns — they
        // compress to nothing in parquet): a reader validates them on
        // the PINNED rows after checkpointing, so a concurrent
        // overwrite of payload+meta between a reader's meta check and
        // its payload read can never serve a re-split belonging to a
        // newer tombstone union than the reader's snapshot (ADVICE r15)
        newAssign
          .withColumn("_ov_root", lit(root))
          .withColumn("_ov_n", lit(fp._1))
          .withColumn("_ov_hash", lit(fp._2))
          .withColumn("_ov_batches", lit(batches.mkString(",")))
          .write.mode("overwrite").parquet(overlayDir(normDir))
        // meta row LAST: its presence commits the overlay (a crash
        // between the two writes leaves no meta => serves recompute)
        Seq((root, fp._1, fp._2, batches.mkString(",")))
          .toDF("root", "n_rows", "content_hash", "batches")
          .coalesce(1).write.mode("overwrite")
          .parquet(overlayMetaDir(normDir))
      }
    }
  }

  /** The persisted re-split, iff its identity (root, fingerprint,
    * batch list) matches the live index — eagerly checkpointed inside
    * the try so a concurrent overwrite surfaces HERE and falls back,
    * never mid-consumer-query.
    *
    * Two validation layers (ADVICE r15): the meta row is the cheap
    * commit marker, but meta and payload are two files a concurrent
    * [[logicalRemove]] can overwrite BETWEEN this reader's meta head()
    * and its payload read — the meta check alone could admit a newer
    * union's re-split under an older snapshot's validation (victims of
    * the new batch keeping stale labels while their components'
    * survivors are remapped). The authoritative check is therefore on
    * the identity columns EMBEDDED in the payload itself, evaluated on
    * the pinned (checkpointed) rows — atomic with the data by
    * construction. A pre-r16 overlay without the embedded columns (or
    * an empty one) falls back to the live recompute and self-heals at
    * the next takedown's rewrite. */
  private[operators] def readOverlay(s: SparkSession, root: String, indexDir: String,
                          idCol: String,
                          batches: Seq[String]): Option[DataFrame] =
    try {
      val om = s.read.parquet(overlayMetaDir(indexDir)).head()
      val valid = om.getAs[String]("root") == root &&
        om.getAs[String]("batches") == batches.mkString(",") &&
        readFingerprint(s, root).contains(
          (om.getAs[Long]("n_rows"), om.getAs[Long]("content_hash")))
      if (!valid) None
      else {
        val payload = s.read.parquet(overlayDir(indexDir)).localCheckpoint()
        val src = payload.columns
          .filterNot(c => c == "_newcomp" || c.startsWith("_ov_")).head
        // head() throws on a missing column or empty payload -> None
        val emb = payload.select(col("_ov_root"), col("_ov_n"),
          col("_ov_hash"), col("_ov_batches")).head()
        val embOk = emb.getString(0) == root &&
          emb.getString(3) == batches.mkString(",") &&
          readFingerprint(s, root).contains((emb.getLong(1), emb.getLong(2)))
        if (!embOk) None
        else Some(payload.select(col(src).as(idCol), col("_newcomp")))
      }
    } catch { case scala.util.control.NonFatal(_) => None }


  /** Victim-scoped component re-split plan, shared by the physical
    * [[remove]] and [[compact]]'s tombstone reclaim: the components the
    * victims belong to, and the survivor re-assignment `(idCol,
    * _newcomp)` recomputed over the survivor subgraph of the persisted
    * adjacency log. PURE READ — O(affected components' edges) I/O,
    * never a similarity join (pre-r11 this re-ran PPJoin over the
    * members: deleting a handful of docs from a 3.7k-member cluster
    * cost ~a full corpus pass). The log stores build/delta connectivity
    * in the deletion-safe set-node form (negative ids = virtual
    * per-token-set nodes; see [[SetSimJoin.jaccardEdgesSetForm]]) plus
    * append-time doc-doc pairs. Survivor subgraph rules: a doc vertex
    * survives iff the doc survives; a SET node survives iff >= 1 of its
    * member docs survives (its member rows define that); set-set edges
    * hold iff both set nodes survive — exactly when the true pairwise
    * doc graph retains those paths, because J(S,T) >= t links every
    * member of S to every member of T directly. */
  private[operators] def resplitPlan(s: SparkSession, root: String, idCol: String,
                          vids: DataFrame, nV: Long,
                          vIdb: Seq[Long]): (DataFrame, DataFrame) = {
    import s.implicits._
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    // ONE assign relation for both reads below (r18 opt: each
    // s.read.parquet resolves the 64-dir file index anew — pure driver
    // overhead when repeated within one call)
    val assign = s.read.parquet(s"$root/assign")
    val comps = rleg("comps")(assign
      .filter(col("idb").isin(vIdb: _*))
      .join(bVids(vids), Seq(idCol), "leftsemi")
      .select(col("component")).distinct().localCheckpoint(eager = false))
    // one column-pruned scan of the (id, component) map restricted to
    // the affected components (comps is bounded by |victims|)
    val survivors = rleg("survivors")(assign
      .join(bVids(comps), Seq("component"))
      .select(col(idCol), col("_src"), col("idb").cast("long").as("idb"))
      .join(bVids(vids), Seq(idCol), "left_anti")
      .localCheckpoint(eager = false))
    (comps, membersResplit(s, root, idCol, survivors))
  }

  /** CC of `members` over their survivor subgraph of the persisted
    * edge log, with canonical min-member-doc labels — the shared core
    * of the victim re-split ([[resplitPlan]]), the r15 serve-time
    * bridge-split, and the r15 crash-window label repair
    * ([[repairComponents]]). `members` must carry `idCol`; anything
    * outside it is invisible to the traversal. */
  private def membersResplit(s: SparkSession, root: String, idCol: String,
                             members: DataFrame): DataFrame = {
    import s.implicits._
    if (members.isEmpty)
      return Seq.empty[(Long, Long)].toDF(idCol, "_newcomp")
    val survIds = members.select(col(idCol).as("_sid"))
    // one physical pass over the log: the four survivor-subgraph
    // frames below share these blocks instead of re-scanning
    // (review-caught; the log is narrow but scanning it four
    // times was pure waste). The hygiene rewrite later is its own
    // necessary pass.
    val edgesAll = s.read.parquet(s"$root/edges")
      .localCheckpoint(eager = false)
    // doc->set membership rows among survivors decide set survival
    val liveSets = edgesAll.filter(col("u") < 0 && col("v") >= 0)
      .join(survIds, col("v") === col("_sid"), "leftsemi")
      .select(col("u")).distinct().localCheckpoint(eager = false)
    // a member row whose doc survives has a live set by definition
    val memberEdges = edgesAll.filter(col("u") < 0 && col("v") >= 0)
      .join(survIds, col("v") === col("_sid"), "leftsemi")
    val setSetEdges = edgesAll.filter(col("u") < 0 && col("v") < 0)
      .join(liveSets.select(col("u")), Seq("u"), "leftsemi")
      .join(liveSets.select(col("u").as("v")), Seq("v"), "leftsemi")
    val docDocEdges = edgesAll.filter(col("u") >= 0 && col("v") >= 0)
      .join(survIds, col("u") === col("_sid"), "leftsemi")
      .join(survIds, col("v") === col("_sid"), "leftsemi")
    val survEdges = memberEdges.unionByName(setSetEdges)
      .unionByName(docDocEdges).select(col("u"), col("v"))
    val cc = ConnectedComponents.components(survEdges, "u", "v")
      .select(col("id").as("_ccid"), col("component").as("_cccomp"))
    // canonical component ids are the min MEMBER DOC id — the CC
    // universe contains negative set nodes, whose ids must never
    // leak into assignments
    val docCc = members.select(col(idCol))
      .join(cc, col(idCol) === col("_ccid"), "left")
      .select(col(idCol), coalesce(col("_cccomp"), col(idCol)).as("_rawcomp"))
    val canon = docCc.groupBy(col("_rawcomp"))
      .agg(min(col(idCol)).as("_canon"))
    docCc.join(canon, Seq("_rawcomp"))
      .select(col(idCol), col("_canon").as("_newcomp"))
  }

  /** Label-repair pass for the crash window where appends interleaved
    * AFTER the rewrites began (r15): the completed rewrites applied a
    * plan those appends postdate, so rows the appends wrote into (or
    * merged with) the affected components may carry labels the re-split
    * dissolved. Seeded by the plan's dissolved labels, its new labels,
    * and the CURRENT components of the plan's survivor ids (covering a
    * mid-window merge that relabeled them to an outside label), the
    * members re-split from the edge log — victims are already erased,
    * so this is a pure structure repair, idempotent, equal to a fresh
    * CC over the affected family. */
  private[operators] def repairComponents(s: SparkSession, root: String,
                               stateDir: String, idCol: String): Unit = {
    import s.implicits._
    val survivorComps = s.read.parquet(s"$root/assign")
      .join(s.read.parquet(s"$stateDir/newassign").select(col(idCol)),
        Seq(idCol), "left_semi")
      .select(col("component"))
    val labels = s.read.parquet(s"$stateDir/comps")
      .unionByName(s.read.parquet(s"$stateDir/newassign")
        .select(col("_newcomp").as("component")))
      .unionByName(survivorComps)
      .distinct().localCheckpoint()
    val nL = labels.count()
    if (nL == 0L) return
    val members = s.read.parquet(s"$root/assign")
      .join(TargetedDelete.maybeBroadcast(labels, nL), Seq("component"), "left_semi")
      .select(col(idCol), col("_src"), col("idb").cast("long").as("idb"))
      .localCheckpoint(eager = false)
    val remap = membersResplit(s, root, idCol, members)
    val parts = members.select(col("_src"), col("idb")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (parts.nonEmpty) {
      val partsDf = parts.toDF("_psrc", "_pidb")
      rleg("label-repair")(TargetedDelete.rewriteWhere(
        s, s"$root/assign", Seq("_src", "idb"),
        mark = df => df.join(broadcast(partsDf),
          col("_src") === col("_psrc") &&
            col("idb").cast("long") === col("_pidb"), "left_semi"),
        keep = df => df.join(remap, Seq(idCol), "left")
          .withColumn("component",
            coalesce(col("_newcomp"), col("component")))
          .drop("_newcomp"),
        prePrune = col("idb").isin(parts.map(_._2).distinct: _*)))
    }
  }
}
