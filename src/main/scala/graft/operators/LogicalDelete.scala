package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level LOGICAL deletion for the persisted indexes (VERDICT r12
  * item 1) — the fast path that makes the marginal takedown cost
  * O(victims) instead of the physical remove()'s full-bucket-rewrite
  * floor. The design is the classic deletion-vector split:
  *
  *  - `logicalRemove` (per family) validates exactly like the physical
  *    remove and commits the same idempotent fingerprint subtraction,
  *    but its only mutation is ONE small parquet write: the victims'
  *    ids under `<indexDir>/deleted/batch=<tag>`. Probes go blind
  *    immediately (every index read anti-joins this set); no table is
  *    rewritten.
  *  - `compact()` physically RECLAIMS: the fold it already performs
  *    filters tombstoned rows out (zero extra I/O — the rows ride the
  *    rewrite the fold was doing anyway), then purges retired
  *    generations (right-to-be-forgotten beats reader grace) and
  *    clears the tombstone set.
  *
  * The tombstone set lives at the index TOP level, outside the data
  * generations (like `rmstate/` and the replay markers), so a
  * generation-pointer flip never moves it; it is bounded by design —
  * every compaction empties it — so the read-side anti-join stays a
  * broadcast-sized equi join (Spark auto-broadcasts off the parquet
  * size stats, the same posture as S4Stream's ingest tombstones).
  *
  * Semantics between the logical step and the reclaim (documented, and
  * pinned by IndexRemoveSpec):
  *
  *  - every probe/top-k/assignment read EXCLUDES tombstoned ids — the
  *    RTBF contract holds from the moment logicalRemove returns;
  *  - a tombstoned id is DEAD until reclaim: appends refuse deltas that
  *    carry one (re-ingesting it would be hidden by the id-scoped
  *    anti-join and then wrongly dropped by the reclaim filter), and
  *    physical remove() refuses while any tombstone pends (its
  *    component re-split discovery would treat logically-deleted rows
  *    as survivors);
  *  - the cluster family's SERVED component structure is correct
  *    immediately (r15): its logicalRemove persists the victims'
  *    component re-split (the same resplitPlan compact's reclaim
  *    executes) as a serve-overlay under [[overlayDir]], and
  *    `assignments()` folds it in — or recomputes it live from the
  *    adjacency log when the overlay is missing or stale — so
  *    consumers see a fresh-build-equal map without waiting for the
  *    physical pass.
  *    `probe()` still labels incoming docs under the coarser pre-split
  *    quotient of the PHYSICAL assign table (its append-side merge
  *    bookkeeping is keyed on those labels) — the split of a probe
  *    label, and the physical retirement of victim rows, land with
  *    compact(). After reclaim the index is bit-equal to a physical
  *    remove and to a fresh build on the survivors.
  *
  * Not to be confused with S4Stream's `removed/` tombstones: those are
  * CONTENT-scoped ingest-replay guards owned by the streaming loops;
  * these are ID-scoped deletion vectors owned by the index families.
  */
private[graft] object LogicalDelete {

  def dir(indexDir: String): String =
    IndexMaintenance.normalize(indexDir) + "/deleted"

  private def dirPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(dir(indexDir))

  /** The cluster family's serve-overlay (r15: the victims' component
    * re-split, persisted by its logicalRemove so reads don't recompute
    * it). Lives beside the batches because its lifetime IS the pending
    * tombstones' — [[clearBatches]] tidies it with them. The `batch=`
    * prefix filter in [[pendingBatches]] keeps it invisible to every
    * batch listing. */
  def overlayDir(indexDir: String): String = dir(indexDir) + "/overlay"
  def overlayMetaDir(indexDir: String): String = dir(indexDir) + "/overlay_meta"

  /** Pending tombstone batch names (sanitized tags) — ops visibility and
    * the compact paths' lease-time snapshot. ONE FS metadata call on
    * every path (ADVICE r13): `exists` + `listStatus` was two LIST
    * round-trips per index read on S3; a missing dir is the common case
    * (no deletion ever pended) and surfaces as FileNotFoundException
    * from the single listStatus instead. */
  def pendingBatches(conf: org.apache.hadoop.conf.Configuration,
                     indexDir: String): Seq[String] = {
    val d = dirPath(indexDir)
    val fs = d.getFileSystem(conf)
    try fs.listStatus(d).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=")).sorted.toSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** The union of pending tombstoned ids as a one-column frame, or None
    * when no logical deletion pends — the fast path every read takes on
    * an index that never saw one costs exactly ONE FS metadata call
    * (the [[pendingBatches]] listStatus). The column keeps the id
    * column's ORIGINAL name (as the builder passed it), so [[idColOf]]
    * can recover it at compact time without schema guessing. */
  def ids(s: SparkSession, indexDir: String): Option[DataFrame] =
    idsOf(s, indexDir,
      pendingBatches(s.sparkContext.hadoopConfiguration, indexDir))

  /** [[ids]] for callers that already hold the pending-batch listing
    * (the compact/retrain paths snapshot it under the lease) — zero
    * additional FS metadata calls. */
  def idsOf(s: SparkSession, indexDir: String,
            batches: Seq[String]): Option[DataFrame] =
    if (batches.isEmpty) None
    else {
      val d = dir(indexDir)
      val raw = s.read.parquet(batches.map(b => s"$d/batch=$b"): _*)
      Some(raw.select(col(idColOf(raw))).distinct())
    }

  /** The index's id column name, recovered from a pending tombstone
    * frame (its only non-partition column). */
  def idColOf(tomb: DataFrame): String =
    tomb.columns.filterNot(_ == "batch").head

  /** Persist one removal batch's victim ids — the logical remove's only
    * mutation. Idempotent per batch (mode=overwrite into the tag's own
    * dir), so the crash-replay protocol can re-run it freely. */
  def write(vids: DataFrame, idCol: String, indexDir: String,
            rmTag: String): Unit =
    vids.select(col(idCol)).distinct()
      .coalesce(1) // a deletion batch is driver-small by nature
      .write.mode("overwrite")
      .parquet(s"${dir(indexDir)}/batch=${Fingerprint.sanitizeTag(rmTag)}")

  /** Hide tombstoned rows at read: anti-join `df` against the pending
    * set on `idCol`. No broadcast hint on purpose — the tombstone side
    * reads straight from its (small, compaction-bounded) parquet, so
    * Spark's size stats pick the broadcast; a bulk-sweep-sized set
    * degrades to a shuffle join instead of straining the driver. */
  def hide(df: DataFrame, idCol: String, tomb: Option[DataFrame]): DataFrame =
    tomb.fold(df)(t =>
      df.join(t.select(col(idColOf(t)).as(idCol)), Seq(idCol), "left_anti"))

  /** Refusal shared by the appends and the first run of a logical
    * remove: `keys` must not contain an id that is already tombstoned.
    * For appends, re-ingesting a dead id would be hidden by the
    * id-scoped anti-join and then wrongly dropped by the reclaim
    * filter; for a second logical remove it would double-subtract the
    * fingerprint. */
  def requireNotTombstoned(s: SparkSession, indexDir: String,
                           keys: DataFrame, idCol: String,
                           opName: String): Unit =
    requireNotTombstoned(s, indexDir, keys, idCol, opName, ids(s, indexDir))

  /** Overload for callers that already resolved the pending set — the
    * hot ingest path must not pay a second FS probe + parquet read. */
  def requireNotTombstoned(s: SparkSession, indexDir: String,
                           keys: DataFrame, idCol: String,
                           opName: String, tomb: Option[DataFrame]): Unit =
    tomb.foreach { t =>
      val n = keys.select(col(idCol)).distinct()
        .join(t.select(col(idColOf(t)).as(idCol)), Seq(idCol), "left_semi").count()
      if (n > 0L) Fingerprint.refuse(
        s"$opName: $n of the ids are logically deleted (tombstoned under " +
          s"${dir(indexDir)}) and awaiting physical reclaim — compact() the " +
          "index first. (If a compact() just completed, these tombstones " +
          "survived a crash between its cutover and its cleanup and match " +
          "nothing — re-running compact() clears them.)")
    }

  /** Refusal for the physical remove(): while ANY tombstone pends, its
    * re-split discovery would count logically-deleted rows as survivors
    * and the post-remove fingerprint equality would break. Reclaim via
    * compact() first. `exceptBatch` (r15): the staged physical remove
    * writes a barrier batch under its OWN tag — a replay re-entering
    * must not refuse over its own barrier, whose ids ARE the victims
    * being erased. */
  def requireNonePending(conf: org.apache.hadoop.conf.Configuration,
                         indexDir: String, opName: String,
                         exceptBatch: Option[String] = None): Unit = {
    val pending = pendingBatches(conf, indexDir)
      .filterNot(b => exceptBatch.contains(b))
    if (pending.nonEmpty) Fingerprint.refuse(
      s"$opName: logical deletion batch(es) ${pending.mkString(", ")} are " +
        s"pending reclaim under ${dir(indexDir)} — run compact() to reclaim " +
        "them before a physical remove. (If a compact() just completed, " +
        "these batches survived a crash between its cutover and its " +
        "cleanup and match nothing — re-running compact() clears them.)")
  }

  /** Drop the whole tombstone set — build()'s rebuild path only (a
    * rebuild wipes the corpus the tombstones were hiding rows of;
    * surviving entries would wrongly hide the REBUILT corpus' rows
    * under recycled ids). Reclaim paths must use [[clearBatches]] with
    * the batch list they actually folded — see its doc. */
  def clear(conf: org.apache.hadoop.conf.Configuration,
            indexDir: String): Unit = {
    val d = dirPath(indexDir)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true)
  }

  /** Drop EXACTLY the named tombstone batches — the reclaim paths'
    * cleanup (review-caught r13): compact()/retrain() clear AFTER
    * finishCompact released the compact lease, so a logicalRemove that
    * acquired the freed remove lease in that window may already have
    * written a NEW batch; a whole-set clear would delete it — its
    * victims would resurrect in every probe while meta permanently
    * records them subtracted. Clearing only the fold's own snapshot
    * leaves the newcomer pending for the next reclaim. */
  def clearBatches(conf: org.apache.hadoop.conf.Configuration,
                   indexDir: String, batches: Seq[String]): Unit = {
    val d = dirPath(indexDir)
    val fs = d.getFileSystem(conf)
    batches.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(d, s"batch=$b"), true)
    }
    // The serve-overlay keyed to these batches is stale the moment they
    // reclaim (its recorded root/fingerprint/batch-list no longer match,
    // so no reader will serve it) — tidy it non-fatally. Meta first: a
    // racing reader validates meta before touching the payload, and any
    // read error inside its try falls back to the live recompute.
    try {
      fs.delete(new org.apache.hadoop.fs.Path(overlayMetaDir(indexDir)), true)
      fs.delete(new org.apache.hadoop.fs.Path(overlayDir(indexDir)), true)
    } catch { case scala.util.control.NonFatal(_) => () }
    // Tidy the now-empty parent, but NEVER fail the compact over it: a
    // logicalRemove that acquired the freed remove lease may be writing
    // a new batch dir between our listStatus and the delete — the
    // non-recursive delete then throws on HDFS/object stores after the
    // cutover already committed (ADVICE r13). An undeleted empty
    // deleted/ dir is harmless; the next write recreates its children.
    try {
      if (fs.exists(d) && fs.listStatus(d).isEmpty) fs.delete(d, false)
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
