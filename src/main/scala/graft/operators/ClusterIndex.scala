package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent near-dup CLUSTER index — the build-once artifact behind the
  * whole `doc_dedup_clusters` / `doc_leakage_safe_split` /
  * `doc_pipeline_e2e` family (VERDICT r9 item 1). The tokenize →
  * prefix-filtered exact set-similarity join ([[SetSimJoin]]) →
  * connected components ([[ConnectedComponents]]) pass is the most
  * expensive computation in the engine; at 100 TB the `doc_id →
  * component` map is exactly the kind of thing you compute ONCE,
  * fingerprint, and probe — not something every consumer query re-derives.
  *
  * Layout (plain parquet, engine-independent, object-store friendly;
  * every table carries the ingest-provenance `_src` tag as its TOP
  * partition level so an append is a tag-scoped DYNAMIC overwrite —
  * crash-replay of a batch rewrites its own partitions and is therefore
  * exactly-once by construction, the same property the lake side of
  * `indexedDedupStream` gets from batchId-keyed subtrees):
  *
  *  - `<dir>/assign`   (id, component)        PARTITIONED BY (_src, idb)
  *  - `<dir>/toks`     (id, sorted token set) PARTITIONED BY (_src, idb)
  *  - `<dir>/postings` (token, id, set size)  PARTITIONED BY (_src, tb)
  *  - `<dir>/df`       (token, doc freq)      PARTITIONED BY (tb) — frozen
  *  - `<dir>/edges`    (u, v) similarity-graph adjacency log in the
  *    deletion-safe set-node form ([[SetSimJoin.jaccardEdgesSetForm]]:
  *    negative ids are virtual per-distinct-token-set nodes) plus
  *    append-time verified doc-doc pairs — PARTITIONED BY (_src, eb).
  *    [[remove]]'s scoped component re-split reads this log (one
  *    narrow-table pass + the hygiene rewrite) instead of re-running a
  *    PPJoin over the affected components' members: log I/O in place of
  *    a corpus-class similarity join per takedown (31% faster at sf1,
  *    slope 1.76x vs 3.05x — SCALING.md r11). Probes never read it.
  *  - `<dir>/meta`     threshold + bucket count + corpus [[Fingerprint]]
  *
  * [[probe]] assigns INCOMING docs their component under the union
  * corpus EXACTLY, in O(|delta| + touched partitions): the old graph
  * never needs revisiting because contracting each existing component to
  * one super-node is a valid connectivity quotient — every old edge is
  * intra-component by definition, so components of (old ∪ delta) equal
  * components of (quotient nodes = old component reps + new ids, edges =
  * delta-internal near-dup edges + delta→component matches). Component
  * ids stay canonical (min member id) because an old rep IS its
  * component's minimum, so the quotient minimum is the union minimum.
  *
  * Candidate generation against the index is EXACT with a one-sided
  * prefix: if none of the |x| - ceil(t|x|) + 1 chosen tokens of incoming
  * x hit an indexed doc y, then |x∩y| <= ceil(t|x|) - 1 < t|x|, which
  * J(x,y) >= t forbids (J >= t forces overlap >= t·|x| via the size
  * bound |y| >= t|x|). That argument needs NO global token order — any
  * k-subset works — so the index stores FULL postings and the persisted
  * df table is only an EFFICIENCY hint (rarest-first prefixes shrink the
  * candidate join); df staleness after appends can never lose a pair,
  * and new-vocabulary tokens default to df 0 = rarest = chosen first.
  *
  * [[append]] = probe + tag-scoped writes + targeted re-assignment of
  * the (rare) components the delta bridged, + an idempotent-per-batch
  * fingerprint merge ([[Fingerprint.shouldMerge]]). After append,
  * `<dir>/assign` equals a fresh CC over the union corpus —
  * ClusterIndexSpec holds that equivalence including bridge-merge,
  * rep-change, and delta-internal-chain cases.
  *
  * Ids must be integral (CC operates on longs) and UNIQUE across corpus
  * and deltas — the id namespace is the graph's node namespace.
  */
object ClusterIndex {

  private def sanitize(tag: String): String = Fingerprint.sanitizeTag(tag)

  private def idb(id: Column, nBuckets: Int): Column =
    pmod(xxhash64(id), lit(nBuckets.toLong))

  private def tb(tok: Column, nBuckets: Int): Column =
    pmod(tok, lit(nBuckets.toLong))

  private def tokenize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))

  /** GRAFT_PROBE_DEBUG=1: time each probe leg with an extra count()
    * action (costs a re-execution per leg — debug channel only, the
    * same contract as GRAFT_CC_DEBUG). */
  private val probeDebug = sys.env.get("GRAFT_PROBE_DEBUG").contains("1")
  /** GRAFT_REMOVE_DEBUG=1: time each remove() leg (same debug-only
    * contract as GRAFT_PROBE_DEBUG). */
  private val removeDebug = sys.env.get("GRAFT_REMOVE_DEBUG").contains("1")
  private def rleg[T](name: String)(f: => T): T = {
    if (removeDebug) {
      val t0 = System.nanoTime()
      val r = f
      println(f"[remove] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    } else f
  }
  private def dbg(name: String)(df: DataFrame): DataFrame = {
    if (probeDebug) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    df
  }

  /** One corpus pass: tokenize, exact near-dup edges (prefix-filtered,
    * no O(n²) stage), O(log n)-round CC, then persist assignments +
    * token sets + full postings + the df hint + the fingerprinted meta
    * row. Static overwrite: a rebuild replaces every generation of every
    * table, and [[Fingerprint.clearReplayState]] drops the old
    * generation's replay bookkeeping with it. Tables land in the index's
    * LIVE data root ([[IndexMaintenance.liveRoot]] — `<dir>` until a
    * compaction cutover moves it to `<dir>/g<N>`), under a write lease
    * so a racing compact() fails loudly instead of retiring the tree
    * mid-write. */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
            threshold: Double = 0.8, nBuckets: Int = 64): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    val conf0 = s.sparkContext.hadoopConfiguration
    // a rebuild during a pending removal would wipe the replay state
    // (tagfp, the barrier tombstones) the removal's windows depend on —
    // and since r15 window B holds only a WRITE lease, the build's own
    // write lease would no longer exclude it; refuse until the removal
    // replays to completion (pendingRemovals == rmstate dirs)
    Fingerprint.requireNoOtherPendingRemoval(conf0,
      IndexMaintenance.normalize(indexDir), rmTag = "", "ClusterIndex.build")
    IndexMaintenance.withLease(conf0, indexDir, "write") {
    val root = IndexMaintenance.liveRoot(conf0, indexDir)
    val toks = tokenize(docs, idCol, textCol).localCheckpoint()
    // the edge log's sign-based vertex classification needs non-negative
    // doc ids — enforce loudly (one tiny agg against checkpointed toks)
    val minRow = toks.agg(min(col(idCol))).head()
    require(minRow.isNullAt(0) || minRow.getLong(0) >= 0L,
      s"ClusterIndex requires non-negative doc ids (got min " +
        s"${minRow.getLong(0)}): the persisted edge log encodes virtual " +
        "set nodes as negative ids")
    // ONE repGraph pass feeds both the CC input and the persisted log
    val (edges, edgeLog) = SetSimJoin.jaccardEdgesWithLog(
      toks, idCol, "_toks", threshold, salt = "build")
    val cc = ConnectedComponents.components(edges, "id2", "id1",
      edgesNormalized = true)
      .select(col("id").as("_ccid"), col("component").as("_cccomp"))
    val assign = docs.select(col(idCol))
      .join(cc, col(idCol) === col("_ccid"), "left")
      .select(col(idCol),
        coalesce(col("_cccomp"), col(idCol)).as("component"))
    assign
      .withColumn("_src", lit("build")).withColumn("idb", idb(col(idCol), nBuckets))
      .write.mode("overwrite").partitionBy("_src", "idb")
      .parquet(s"$root/assign")
    toks
      .withColumn("_src", lit("build")).withColumn("idb", idb(col(idCol), nBuckets))
      .write.mode("overwrite").partitionBy("_src", "idb")
      .parquet(s"$root/toks")
    val postings = toks
      .select(col(idCol), size(col("_toks")).as("_sz"), explode(col("_toks")).as("_tok"))
    postings
      .withColumn("_src", lit("build")).withColumn("tb", tb(col("_tok"), nBuckets))
      .write.mode("overwrite").partitionBy("_src", "tb")
      .parquet(s"$root/postings")
    postings.groupBy(col("_tok")).agg(count(lit(1)).as("df"))
      .withColumn("tb", tb(col("_tok"), nBuckets))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$root/df")
    // the adjacency log (deletion-safe set-node form; see class doc) —
    // derived from the SAME repGraph pass as the CC input above
    edgeLog
      .withColumn("_src", lit("build")).withColumn("eb", idb(col("u"), nBuckets))
      .write.mode("overwrite").partitionBy("_src", "eb")
      .parquet(s"$root/edges")
    val fp = Fingerprint.of(docs, Seq(idCol, textCol))
    Seq((threshold, nBuckets, fp._1, fp._2))
      .toDF("threshold", "n_buckets", "n_rows", "content_hash")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    Fingerprint.clearReplayState(conf0, indexDir)
    // a rebuild wiped the corpus the tombstones were hiding rows of —
    // surviving entries would wrongly hide the rebuilt corpus' rows
    LogicalDelete.clear(conf0, indexDir)
    // freshness fast-path: record the corpus file statuses LAST — a
    // crash mid-build degrades to the hash scan, never a false fresh
    Fingerprint.writeSourceStatus(conf0, indexDir, Fingerprint.sourceStatus(docs))
    }
  }

  // root = resolved data root (IndexMaintenance.liveRoot), not the index dir
  private def readMeta(s: SparkSession, root: String): (Double, Int) = {
    val m = s.read.parquet(s"$root/meta").head()
    (m.getAs[Double]("threshold"), m.getAs[Int]("n_buckets"))
  }

  private def readFingerprint(s: SparkSession, root: String): Option[(Long, Long)] =
    try {
      val m = s.read.parquet(s"$root/meta").head()
      Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
    } catch { case _: Exception => None } // absent/legacy meta => stale

  /** Does the persisted cluster map still describe THIS corpus? The
    * unchanged-corpus answer is O(files) FS metadata calls
    * ([[Fingerprint.statusFresh]] — no Spark job); drift or a non-file
    * corpus falls back to the content-hash authority: one column-pruned
    * agg scan (see [[Fingerprint]]) — cheap next to the PPJoin+CC pass
    * it guards. */
  def isFresh(s: SparkSession, indexDir: String, corpus: DataFrame,
              idCol: String, textCol: String): Boolean =
    Fingerprint.statusFresh(indexDir, corpus) ||
      readFingerprint(s,
          IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir))
        .contains(Fingerprint.of(corpus, Seq(idCol, textCol)))

  /** Build-once/consume-many entry: (re)build only when absent or stale. */
  def ensure(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
             threshold: Double = 0.8, nBuckets: Int = 64): Unit = {
    val s = docs.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val success = new org.apache.hadoop.fs.Path(s"$root/assign/_SUCCESS")
    val fs = success.getFileSystem(conf)
    // a pre-r11 index has no adjacency log — remove() depends on it, so
    // treat the index as stale and rebuild rather than leaving a tree
    // that refuses takedowns
    val edgesOk = fs.exists(
      new org.apache.hadoop.fs.Path(s"$root/edges/_SUCCESS"))
    if (!fs.exists(success) || !edgesOk ||
        !isFresh(s, indexDir, docs, idCol, textCol))
      build(docs, idCol, textCol, indexDir, threshold, nBuckets)
  }

  /** The persisted `(id, component)` map — what every consumer reads
    * instead of re-running PPJoin+CC.
    *
    * Serve-time bridge-split (r15): while logical-delete tombstones pend,
    * the components the victims belong to are re-split READ-ONLY from the
    * persisted adjacency log — the same [[resplitPlan]] the physical
    * remove and compact()'s reclaim execute — so the served map equals a
    * fresh CC over the survivors from the moment logicalRemove returns.
    * Correctness therefore never requires an in-path compact(); the
    * physical reclaim stays the amortized maintenance pass it is in
    * production. Cost shape: the no-tombstone fast path is unchanged
    * (ONE FS metadata call); with tombstones pending the re-split is
    * served from the OVERLAY [[logicalRemove]] persisted (one tiny
    * parquet read — reads stay pure, so any number of concurrent
    * consumers pay O(overlay rows), not O(affected edges) each), and
    * recomputed live only when the overlay is missing or stale — a
    * crash before the overlay write, or an append since (appends can
    * re-bridge split survivors through fresh docs, so the overlay's
    * recorded corpus fingerprint must equal meta's to be served). */
  def assignments(s: SparkSession, indexDir: String, idCol: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val base = s.read.parquet(s"$root/assign").select(col(idCol), col("component"))
    val batches = LogicalDelete.pendingBatches(conf, indexDir)
    LogicalDelete.idsOf(s, indexDir, batches) match {
      case None => base
      case Some(t) =>
        val vids = t.select(col(LogicalDelete.idColOf(t)).as(idCol))
          .localCheckpoint()
        val nV = vids.count()
        val newAssign = readOverlay(s, root, indexDir, idCol, batches)
          .getOrElse {
            val (_, nBuckets) = readMeta(s, root)
            val vIdb = vids.select(idb(col(idCol), nBuckets).as("idb"))
              .distinct().collect().map(_.getLong(0)).toSeq
            resplitPlan(s, root, idCol, vids, nV, vIdb)._2
          }
        // same fold as compact()'s reclaim: drop victims, remap survivors
        // of their components, everyone else passes through untouched
        base.join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "left_anti")
          .join(newAssign, Seq(idCol), "left")
          .withColumn("component", coalesce(col("_newcomp"), col("component")))
          .drop("_newcomp")
    }
  }

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

  /** Persist the union-pending re-split; called by [[logicalRemove]]
    * under the remove lease (appends hold the disjoint write lease, so
    * ingest never waits on this). Skips legacy fingerprint-less metas —
    * there is nothing to validate against, so serves recompute live.
    *
    * `curBatch`/`curVids` reuse the caller's already-checkpointed state
    * for the overwhelmingly common single-pending-batch case — the
    * overlay then adds only the re-split itself plus two small writes
    * to the takedown wall, no re-derivation jobs. `newFp` is the
    * fingerprint the caller just committed (re-read only on the replay
    * path where it didn't write one). */
  private def writeOverlay(s: SparkSession, root: String, normDir: String,
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
  private def readOverlay(s: SparkSession, root: String, indexDir: String,
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

  /** Incoming docs' components under the UNION corpus (exact — see the
    * quotient argument in the class doc), plus the merge map for old
    * components the delta bridged, plus the delta's (already
    * checkpointed) token sets so [[append]] doesn't tokenize twice.
    * Pure query: mutates nothing. */
  private def probeParts(s: SparkSession, root: String, incoming: DataFrame,
                         idCol: String, textCol: String,
                         excludeTag: Option[String],
                         tomb: Option[DataFrame]): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (t, nBuckets) = readMeta(s, root)
    // lazy checkpoints throughout: each frame's FIRST consumer (a bounded
    // collect or append's eager assignD checkpoint) materializes the
    // blocks inside its own job, so the probe path pays no standalone
    // checkpoint jobs — on a small delta the sequential-job count, not
    // data volume, dominates wall-clock
    val incToks = tokenize(incoming, idCol, textCol)
      .localCheckpoint(eager = false)
    // delta-internal connectivity (sparse star+rep form, exact)
    val inner = dbg("inner-edges")(
      SetSimJoin.jaccardEdges(incToks, idCol, "_toks", t)
        .select(col("id1").as("src"), col("id2").as("dst")))
    // probe prefix: the |x| - ceil(t|x|) + 1 rarest tokens by the FROZEN
    // df hint (new tokens coalesce to df 0 — rarest). ONE bounded collect
    // (<= nBuckets longs) of the delta's token buckets turns BOTH the df
    // and postings reads into static partition filters, the same recipe
    // as TextIndex/VectorIndex (prefix buckets are a subset of the
    // delta's token buckets, so reusing the superset list is pruning-
    // correct and saves a second collect barrier).
    val occ = incToks.select(col(idCol).as("_inc"),
      size(col("_toks")).as("_szi"), explode(col("_toks")).as("_tok"))
      .localCheckpoint(eager = false) // feeds the bucket collect AND the ranked join
    val touchedTb = occ.select(tb(col("_tok"), nBuckets).as("tb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val dfHint = s.read.parquet(s"$root/df")
      .filter(col("tb").isin(touchedTb: _*)).select(col("_tok"), col("df"))
    val pref = occ.join(dfHint, Seq("_tok"), "left")
      .withColumn("_df", coalesce(col("df"), lit(0L)))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_inc")).orderBy(col("_df"), col("_tok"))))
      .filter(col("_rk") <= col("_szi") - ceil(lit(t) * col("_szi") - lit(1e-9)) + 1)
      .select(col("_tok"), col("_inc"), col("_szi"))
    val postAll = s.read.parquet(s"$root/postings")
      .filter(col("tb").isin(touchedTb: _*))
    // _src is a PARTITION column (never null): plain =!= is both safe
    // and pruned at the file level. Logically-deleted docs leave the
    // candidate pool HERE (the tombstone anti-join) — cands, the toks
    // verify, and the assign bridge are all keyed by these refs, so one
    // exclusion point blinds the whole probe.
    val post = LogicalDelete.hide(
      excludeTag.fold(postAll)(tg =>
        postAll.filter(col("_src") =!= lit(sanitize(tg)))),
      idCol, tomb)
    val cands = dbg("cands")(pref
      .join(post.select(col("_tok"), col(idCol).as("_ref"), col("_sz").as("_szr")), "_tok")
      // size filter: J >= t forces t|x| <= |y| <= |x|/t
      .filter(col("_szr") >= lit(t) * col("_szi") - lit(1e-9)
        && col("_szi") >= lit(t) * col("_szr") - lit(1e-9))
      .select(col("_inc"), col("_ref")).distinct()
      .localCheckpoint(eager = false)) // feeds the bucket collect AND the verify join
    val candIdb = cands.select(idb(col("_ref"), nBuckets).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    def prunedByIdb(table: String): DataFrame = {
      val all = s.read.parquet(s"$root/$table")
        .filter(col("idb").isin(candIdb: _*))
      excludeTag.fold(all)(tg => all.filter(col("_src") =!= lit(sanitize(tg))))
    }
    // exact verification — the same predicate-only accept set as
    // Dedup.jaccardVerifyAtLeast (J >= t ⟺ overlap >= ceil(t/(1+t)(|x|+|y|)))
    val matches = cands
      .join(incToks.select(col(idCol).as("_inc"), col("_toks").as("_ti")), "_inc")
      .join(prunedByIdb("toks").select(col(idCol).as("_ref"), col("_toks").as("_tr")), "_ref")
      .filter(graft.functions.SortedIntersectAtLeast(col("_ti"), col("_tr"),
        ceil(lit(t / (1 + t)) * (size(col("_ti")) + size(col("_tr"))) - lit(1e-9)).cast("int")))
      .select(col("_inc"), col("_ref"))
    // quotient-graph edges: delta-internal pairs + (incoming -> matched
    // existing COMPONENT). Old components enter as single super-nodes.
    // Against a large near-dup family the raw relation is multi-edged
    // (an incoming doc verifies hundreds of member refs that all map to
    // ONE component — 2.7M rows at the sf1 fixture); the DISTINCT
    // collapses it to <= |delta| x (components touched) rows. CC's own
    // normalize stage would also collapse the duplicates (so this is not
    // a correctness requirement, and bridge must STILL go through
    // normalize — its edges are not src>dst oriented), but the second
    // consumer would not: without distinct+checkpoint the merge map
    // re-executes the whole candidate+verify chain and re-reads the
    // multi-edge relation.
    val bridge = dbg("bridge")(matches
      .join(prunedByIdb("assign").select(col(idCol).as("_ref"), col("component")), "_ref")
      .select(col("_inc").as("src"), col("component").as("dst"))
      .distinct()
      .localCheckpoint(eager = false))
    val qcc = ConnectedComponents.components(
        inner.unionByName(bridge), "src", "dst")
      .select(col("id").as("_ccid"), col("component").as("_cccomp"))
      .localCheckpoint(eager = false) // feeds incoming assignment AND the merge map
    val assignInc = incoming.select(col(idCol))
      .join(qcc, col(idCol) === col("_ccid"), "left")
      .select(col(idCol), coalesce(col("_cccomp"), col(idCol)).as("component"))
    val merges = bridge.select(col("dst").as("loser")).distinct()
      .join(qcc, col("loser") === col("_ccid"))
      .filter(col("_cccomp") =!= col("loser"))
      .select(col("loser"), col("_cccomp").as("winner"))
    // matches is returned UN-checkpointed: probe() never consumes it (no
    // cost), append() writes it to the adjacency log (its one extra
    // consumer re-executes the verify chain — delta-sized)
    (assignInc, merges, incToks, matches)
  }

  /** Assign incoming docs their exact union-corpus component without
    * touching the index — the read-only probe. Docs near-duplicating
    * nothing are singletons (component = own id); docs bridging existing
    * clusters get the merged minimum, exactly what a fresh CC over
    * (indexed corpus ∪ incoming) assigns them. */
  def probe(s: SparkSession, indexDir: String, incoming: DataFrame,
            idCol: String, textCol: String,
            excludeTag: Option[String] = None): DataFrame =
    probeParts(s,
      IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir),
      incoming, idCol, textCol, excludeTag,
      LogicalDelete.ids(s, indexDir))._1

  /** Which of `ids` does the index already hold an assignment for?
    * Bounded work: the batch's id-hash buckets (a ≤`nBuckets` collect)
    * become a static partition filter on `assign`, and the pruned scan
    * is semi-joined against the broadcast batch — no shuffle, result
    * ≤ |ids|. `excludeTag` skips rows this batch's own (crashed,
    * replayed) append wrote, the same provenance rule the probes use —
    * an id is "known" only if a DIFFERENT batch ingested it. */
  def knownIds(s: SparkSession, indexDir: String, ids: DataFrame,
               idCol: String, excludeTag: Option[String] = None): DataFrame = {
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val (_, nBuckets) = readMeta(s, root)
    val pinned = ids.select(col(idCol)).distinct().localCheckpoint()
    val touched = pinned.select(idb(col(idCol), nBuckets).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val assignAll = s.read.parquet(s"$root/assign")
      .filter(col("idb").isin(touched: _*))
    val assign = excludeTag.fold(assignAll)(tg =>
      assignAll.filter(col("_src") =!= lit(sanitize(tg))))
    // a logically-deleted id is NOT known: its rows are dead pending
    // reclaim, exactly as if the physical remove had already run
    LogicalDelete.hide(
      assign.join(broadcast(pinned), Seq(idCol), "leftsemi").select(col(idCol)),
      idCol, LogicalDelete.ids(s, indexDir))
  }

  /** The victim rows that ARE this index's rows of record — id known
    * AND the text token-matches the ingested version (r14, the
    * streaming takedown's staging filter). Ids never ingested, already
    * taken down, or rows whose text does not match the indexed document
    * simply drop out — the same "does not match, nothing to forget"
    * semantic the lake-snapshot takedown siblings get from their lake
    * join — so the removal protocols' content-set refusal stays
    * unreachable from the staged set by construction. Same bounded
    * shape as [[knownIds]]: bucket-pruned toks scan, ≤ |victims| out. */
  def matchingRows(s: SparkSession, indexDir: String, victims: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val (_, nBuckets) = readMeta(s, root)
    val pinned = victims.select(col(idCol), col(textCol))
      .distinct().localCheckpoint()
    val touched = pinned.select(idb(col(idCol), nBuckets).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val stored = LogicalDelete.hide(
        s.read.parquet(s"$root/toks").filter(col("idb").isin(touched: _*)),
        idCol, LogicalDelete.ids(s, indexDir))
      .select(col(idCol).as("_mid"), xxhash64(col("_toks")).as("_sh"))
    pinned
      .withColumn("_vh", xxhash64(Dedup.hashedTokenSet(col(textCol))))
      .join(stored,
        col(idCol) === col("_mid") && col("_vh") === col("_sh"),
        "leftsemi")
      .drop("_vh")
  }

  /** Fold marker-COMMITTED append generations back into the `build`
    * generation — the small-files lifecycle valve for a long-running
    * ingest stream. Each streaming batch appends its own `_src=<tag>`
    * partition tree to assign/toks/postings (up to `nBuckets` files per
    * table per batch), so a year of micro-batches accretes O(batches ×
    * buckets) files per table; compaction rewrites each table as one
    * file per partition directory with PURE I/O — no tokenize, no
    * PPJoin, no CC — which is what distinguishes it from a [[build]]
    * (the recompute path).
    *
    * Which generations fold: only tags whose `applied/` marker exists —
    * the streaming loop's commit point, after which that batch can never
    * re-run its body (the marker check runs first on replay). An
    * appended-but-UNMARKERED batch is the crash-window replay candidate:
    * relabeling its rows to `build` would break its excludeTag re-probe
    * (every id would read as already-known, the replay would append an
    * empty delta, and the tag-reuse guard would then crash-loop the
    * stream), so those generations keep their provenance. Direct
    * [[append]] callers have no markers; when the operator KNOWS none of
    * those tags can ever replay (every append call returned), pass
    * `foldUnmarkedTags = true` to fold everything.
    *
    * Also preserved exactly: row contents, the meta row (threshold,
    * buckets, the corpus-of-record fingerprint — so [[isFresh]] answers
    * unchanged), and the replay-protection state (`applied/` markers and
    * `tagfp/` records copy verbatim, so a restarted stream still skips
    * its committed batches and a reused old tag is still refused). The
    * build-time source-status record is NOT carried over (appends
    * already cleared it; freshness falls back to the content-hash
    * authority).
    *
    * Cutover and crash window: see [[IndexMaintenance]] — the folded
    * tables are staged in the next generation directory and go live via
    * a single generation-pointer write (no directory rename, object-
    * store safe); a crash before the flip leaves the old generation
    * live and the staged tree inert. Quiescence is ENFORCED: compact
    * holds the compact lease, so a racing build/append fails loudly. */
  def compact(s: SparkSession, indexDir0: String,
              foldUnmarkedTags: Boolean = false): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val indexDir = IndexMaintenance.normalize(indexDir0)
    val ctx = IndexMaintenance.beginCompact(conf, indexDir)
    // snapshot the pending tombstone set ONCE, under the compact lease:
    // the trailing cleanup clears exactly these batches, never a batch a
    // post-flip logicalRemove added after the lease freed
    // (review-caught r13)
    val reclaimBatches = LogicalDelete.pendingBatches(conf, indexDir)
    try {
      // marker names are raw tags; _src partition values are sanitized —
      // compare in sanitized space (identical for streaming-loop tags)
      val committed = IndexMaintenance.committedTags(conf, indexDir)
        .map(sanitize).toSeq
      val foldSrc: Column =
        if (foldUnmarkedTags) lit("build")
        else when(col("_src").isin(committed: _*)
            || col("_src") === "build", lit("build"))
          .otherwise(col("_src"))
      // ---- tombstone RECLAIM ([[LogicalDelete]], VERDICT r12 item 1):
      // the victims' rows ride OUT on the rewrite this fold was doing
      // anyway (zero extra I/O), and the survivors of the components
      // they held together are remapped per the same re-split plan the
      // physical remove computes — discovered here from the from-root,
      // which the fold never mutates, so a crashed compact replays the
      // identical plan. Tombstones clear only AFTER the cutover. ----
      val (_, nBuckets) = readMeta(s, ctx.fromRoot)
      val tomb =
        LogicalDelete.idsOf(s, indexDir, reclaimBatches)
      val reclaim = tomb.map { t =>
        // the id column name rides in the tombstone frame itself —
        // whatever the builder passed to logicalRemove
        val idCol = LogicalDelete.idColOf(t)
        val vids = t.localCheckpoint()
        val nV = vids.count()
        val vIdb = vids.select(idb(col(idCol), nBuckets).as("idb"))
          .distinct().collect().map(_.getLong(0)).toSeq
        val (_, newAssign) = resplitPlan(s, ctx.fromRoot, idCol, vids, nV, vIdb)
        (idCol, vids, nV, newAssign)
      }
      def dropVictims(df: DataFrame): DataFrame = reclaim.fold(df) {
        case (idCol, vids, nV, _) =>
          df.join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "left_anti")
      }
      def fold(table: String, bucketCol: String,
               transform: DataFrame => DataFrame = identity): Unit =
        IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot, table,
          Seq("_src", bucketCol), remap = Map("_src" -> foldSrc),
          transform = transform)
      // edges fold COLLAPSES the log to the live graph (VERDICT r12
      // item 3): on continuous ingest the raw log grows with HISTORY —
      // every batch adds its own salted set nodes plus one verified
      // doc-doc row per (delta doc x indexed near-dup), so the re-split
      // leg's cost creeps with ingest count, not corpus size. The fold
      // re-keys every folding set node by its token-set CONTENT
      // (recomputed from the toks table — all members of a node share
      // one set by construction), merges equivalent nodes across
      // batches, and converts the accumulated doc-doc pairs into
      // canonical set-set edges: J(x, ref) >= t IS J(S_x, S_ref) >= t
      // on their token sets, so the conversion preserves exact
      // connectivity AND the deletion-safe one-sided layout (a set is
      // live iff >= 1 member row survives; a set-set edge links every
      // member pair directly). A corpus built+appended N times folds to
      // the SAME edge count as one fresh build (ClusterIndexSpec).
      // Dangling-set GC is subsumed: a set with no surviving member has
      // no canonical mapping and its edges drop in the joins.
      // UNMARKERED batches keep their rows verbatim (minus their own
      // dangling set-set rows) — a crash-window replay dynamic-
      // overwrites its _src partitions, so folding them would be wrong.
      // Pre-r11 indexes have no edges table (ADVICE r11): skip the fold
      // — mirroring ensure()'s edgesOk handling, which already treats
      // such trees as rebuild-needed for remove() purposes — instead of
      // hard-failing a compaction of an otherwise-valid index. Detection
      // is by DIRECTORY, not the _SUCCESS marker: a deployment that
      // disables marksuccessfuljobs (common object-store tuning) must
      // not get its healthy edges table silently dropped — and then
      // GC'd with the retired generations — by a marker-only probe.
      val edgesDir = new org.apache.hadoop.fs.Path(s"${ctx.fromRoot}/edges")
      val edgesFs = edgesDir.getFileSystem(conf)
      val legacyNoEdges =
        !edgesFs.exists(edgesDir) || edgesFs.listStatus(edgesDir).isEmpty
      val edgesTransform: DataFrame => DataFrame = { dfIn =>
          // reclaim hygiene first: a tombstoned id must leave the log
          // (either endpoint), exactly as remove()'s deleteAnyKey pass —
          // the member-row drop then feeds the canonicalization below
          val df0 = reclaim.fold(dfIn) { case (idCol, vids, nV, _) =>
            def keysAs(c: String) =
              TargetedDelete.maybeBroadcast(vids.select(col(idCol).as(c)), nV)
            dfIn.join(keysAs("u"), Seq("u"), "left_anti")
              .join(keysAs("v"), Seq("v"), "left_anti")
          }
          // one physical pass feeds every branch (same rescan fix as
          // remove()'s survivor-subgraph frames)
          val df = df0.localCheckpoint(eager = false)
          val foldsToBuild =
            if (foldUnmarkedTags) lit(true)
            else col("_src").isin(committed: _*) || col("_src") === "build"
          val folding = df.filter(foldsToBuild)
          val kept = df.filter(!foldsToBuild)
          // canonical node id = content hash of the members' token set;
          // "fold"-salted, so a SECOND compact maps them to themselves
          // (idempotent) and a removed-then-reingested id still never
          // aliases (the new text hashes differently)
          val toksTable = s.read.parquet(s"${ctx.fromRoot}/toks")
          val tokId = toksTable.schema.fieldNames
            .filterNot(Set("_toks", "_src", "idb")).head
          val docHash = toksTable.select(col(tokId).as("v"),
            xxhash64(col("_toks")).as("_th"))
          val members0 = folding.filter(col("u") < 0 && col("v") >= 0)
          val canon = members0.join(docHash, Seq("v"))
            .select(col("u"),
              (-(xxhash64(lit("fold"), col("_th"))
                .bitwiseAND(lit(Long.MaxValue))) - 1).as("_cn"))
            .distinct().localCheckpoint(eager = false)
          val members = members0.join(canon, Seq("u"))
            .select(col("_cn").as("u"), col("v")).distinct()
            .localCheckpoint(eager = false) // feeds the union AND docCn
          val setSet = folding.filter(col("u") < 0 && col("v") < 0)
            .join(canon, Seq("u"))
            .join(canon.select(col("u").as("v"), col("_cn").as("_cnv")), Seq("v"))
            .select(least(col("_cn"), col("_cnv")).as("u"),
              greatest(col("_cn"), col("_cnv")).as("v"))
          val docCn = members.select(col("v").as("_doc"), col("u").as("_dcn"))
          val dd = folding.filter(col("u") >= 0 && col("v") >= 0)
            .join(docCn.select(col("_doc").as("u"), col("_dcn").as("_cu")),
              Seq("u"), "left")
            .join(docCn.select(col("_doc").as("v"), col("_dcn").as("_cv")),
              Seq("v"), "left")
            .localCheckpoint(eager = false) // feeds converted + kept legs
          val ddAsSet = dd
            .filter(col("_cu").isNotNull && col("_cv").isNotNull)
            .select(least(col("_cu"), col("_cv")).as("u"),
              greatest(col("_cu"), col("_cv")).as("v"))
          // co-members (same canonical set) are already connected by
          // their member rows; cross-set pairs dedup with the remapped
          // set-set edges in ONE distinct
          val pairEdges = setSet.unionByName(ddAsSet)
            .filter(col("u") =!= col("v")).distinct()
          // a doc-doc endpoint without a member row cannot occur for a
          // verified J>=t pair (empty sets never verify), but a left
          // join + verbatim keep is cheaper than proving it forever
          val ddKept = dd.filter(col("_cu").isNull || col("_cv").isNull)
            .select(col("u"), col("v"))
          val canonEdges = members.unionByName(pairEdges).unionByName(ddKept)
            .withColumn("_src", lit("build"))
            .withColumn("eb", idb(col("u"), nBuckets))
          // kept (unmarkered) side: verbatim minus its own dangling
          // set-set rows — its salted nodes are batch-local, so the
          // liveness rule closes over the kept rows alone
          val keptLive = kept.filter(col("u") < 0 && col("v") >= 0)
            .select(col("u")).distinct().localCheckpoint(eager = false)
          val keptClean = kept.filter(!(col("u") < 0 && col("v") < 0))
            .unionByName(kept.filter(col("u") < 0 && col("v") < 0)
              .join(keptLive, Seq("u"), "leftsemi")
              .join(keptLive.select(col("u").as("v")), Seq("v"), "leftsemi"))
          canonEdges.unionByName(
            keptClean.select(canonEdges.columns.map(col): _*))
        }
      // the six staged-table writes are INDEPENDENT — each reads only
      // the immutable from-root (plus its own plan frames) and writes
      // its own staging subdir — so they run concurrently (r13, the
      // same shape as remove()'s parallel legs): the fold's wall drops
      // from the sum of six table rewrites to the slowest one, which is
      // exactly what the reclaim path of
      // doc_cluster_index_logical_remove clocks.
      IndexMaintenance.runLegs(Seq(
        "compact.assign" -> (() => fold("assign", "idb", df => reclaim.fold(df) {
          case (idCol, vids, nV, newAssign) =>
            df.join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "left_anti")
              .join(newAssign, Seq(idCol), "left")
              .withColumn("component", coalesce(col("_newcomp"), col("component")))
              .drop("_newcomp")
        })),
        "compact.toks" -> (() => fold("toks", "idb", dropVictims)),
        "compact.postings" -> (() => fold("postings", "tb", dropVictims)),
        "compact.edges" -> (() => if (!legacyNoEdges)
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot, "edges",
            Seq("_src", "eb"), remap = Map("_src" -> foldSrc),
            transform = edgesTransform)),
        "compact.df" -> (() =>
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot, "df", Seq("tb"))),
        "compact.meta" -> (() =>
          IndexMaintenance.copyTable(s, ctx.fromRoot, ctx.stagingRoot, "meta"))))
    } catch {
      case t: Throwable => IndexMaintenance.abortCompact(conf, ctx); throw t
    }
    IndexMaintenance.finishCompact(conf, ctx,
      legacyTables = Seq("assign", "toks", "postings", "df", "edges", "meta"))
    // reclaim bookkeeping: the retired generation still holds the
    // victims' bytes (right-to-be-forgotten beats reader grace), and
    // the tombstones clear only now that the reclaimed tree is LIVE —
    // a crash between the flip and here leaves no-op tombstones (their
    // ids match nothing) that the next compact clears. Clears ONLY the
    // lease-time snapshot: a logicalRemove racing in after finishCompact
    // freed the lease keeps its new batch pending.
    if (reclaimBatches.nonEmpty) {
      IndexMaintenance.purgeRetired(conf, indexDir,
        Seq("assign", "toks", "postings", "df", "edges", "meta"))
      LogicalDelete.clearBatches(conf, indexDir, reclaimBatches)
    }
    // the folded tree describes the same corpus of record: re-recording
    // would be wrong only if the corpus moved, which the fingerprint
    // still guards — nothing else to do here
  }

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
  private def resplitPlan(s: SparkSession, root: String, idCol: String,
                          vids: DataFrame, nV: Long,
                          vIdb: Seq[Long]): (DataFrame, DataFrame) = {
    import s.implicits._
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    val comps = rleg("comps")(s.read.parquet(s"$root/assign")
      .filter(col("idb").isin(vIdb: _*))
      .join(bVids(vids), Seq(idCol), "leftsemi")
      .select(col("component")).distinct().localCheckpoint(eager = false))
    // one column-pruned scan of the (id, component) map restricted to
    // the affected components (comps is bounded by |victims|)
    val survivors = rleg("survivors")(s.read.parquet(s"$root/assign")
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
    IndexMaintenance.withLease(conf, indexDir, "remove") {
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
        conf, normDir, rmTag, "ClusterIndex.remove")
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
          val vToksA = rleg("vtoks")(s.read.parquet(s"$root/toks")
            .filter(col("idb").isin(vIdb: _*))
            .join(bVids(vids), Seq(idCol), "leftsemi")
            .select(col(idCol), col("_toks"))
            .localCheckpoint(eager = false))
          val vAgg = TargetedDelete.contentSet(victims, idCol,
            xxhash64(Dedup.hashedTokenSet(col(textCol))))
            .withColumnRenamed("_chs", "_vchs")
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
          // mid-append crash guard (see TextIndex.remove): a victim from
          // an append whose fingerprint merge never recorded must not
          // subtract — its delta was never added. Pruned provenance read,
          // bounded by |tags|.
          if (oldFp.isDefined) {
            val vSrcs = rleg("guard")(s.read.parquet(s"$root/assign")
              .filter(col("idb").isin(vIdb: _*))
              .join(bVids(vids), Seq(idCol), "leftsemi")
              .select(col("_src")).filter(col("_src").isNotNull) // pre-provenance rows = build-era
              .distinct().collect().map(_.getString(0)).toSet)
            Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
              "ClusterIndex.remove")
          }
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
    }
    if (nV > 0L && !completedReplay) {
      if (stagedPath)
        removeStaged(s, conf, root, normDir, rmTag, stateDir, planMarker,
          idCol, vids, nV, vIdb, nBuckets)
      else IndexMaintenance.withLease(conf, indexDir, "remove") {
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
      }
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

  private def persistPlan(s: SparkSession, root: String, normDir: String,
                          stateDir: String,
                          idCol: String, vids: DataFrame, nV: Long,
                          vIdb: Seq[Long], nBuckets: Int): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    // snapshot FIRST (see the plantags comment above)
    writeTagFile(conf, s"$stateDir/plantags",
      Fingerprint.recordedTags(conf, normDir))
    def bVids(df: DataFrame) = TargetedDelete.maybeBroadcast(df, nV)
    // the victims' INDEXED token sets drive the postings bucket prune.
    // Read from the CURRENT toks table on purpose: until del-toks runs
    // it is pristine, and a replay after del-toks finds it empty exactly
    // when del-postings already completed — the prune no-ops.
    val vToks = rleg("vtoks")(s.read.parquet(s"$root/toks")
      .filter(col("idb").isin(vIdb: _*))
      .join(bVids(vids), Seq(idCol), "leftsemi")
      .select(col(idCol), col("_toks"))
      .localCheckpoint(eager = false))
    val (comps, newAssign) = resplitPlan(s, root, idCol, vids, nV, vIdb)
    rleg("plan-write") {
      newAssign.write.mode("overwrite").parquet(s"$stateDir/newassign")
      // the assign partitions to rewrite: every partition holding a
      // row of an affected component (victims included). Driver-small
      // (<= generations x buckets).
      s.read.parquet(s"$root/assign")
        .join(bVids(comps), Seq("component"), "left_semi")
        .select(col("_src"), col("idb").cast("long").as("idb")).distinct()
        .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/parts")
      // plan-resident postings buckets make all four rewrites order-free
      // — and therefore parallel (r12)
      vToks.select(explode(col("_toks")).as("_tok"))
        .select(tb(col("_tok"), nBuckets).as("tb")).distinct()
        .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/vtb")
      // the affected components themselves — window C's plan-validity
      // membership check reads these (r15)
      comps.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/comps")
    }
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
  private def repairComponents(s: SparkSession, root: String,
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
    IndexMaintenance.withLease(conf, normDir, "write") {
      persistPlan(s, root, normDir, stateDir, idCol, vids, nV, vIdb, nBuckets)
      stateFs.create(planMarker, true).close() // plan commit point
      FaultInjection.maybeCrash("cluster.plan")
      parts = s.read.parquet(s"$stateDir/parts")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      vTb = s.read.parquet(s"$stateDir/vtb")
        .collect().map(_.getLong(0)).toSeq
      IndexMaintenance.runLegs(Seq(
        "stage.assign" -> (() => rleg("stage-assign")(if (parts.nonEmpty) {
          val (mark, keep, prePrune) =
            assignSurgery(s, stateDir, idCol, vids, nV, parts)
          TargetedDelete.stageRewrite(
            s, s"$root/assign", s"$staged/assign", Seq("_src", "idb"),
            mark, keep, prePrune,
            captureStatus = true) // assign is the one append-amendable table
        })),
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
    }
    FaultInjection.maybeCrash("cluster.stage")
    // ---- WINDOW C: validate + flip under the remove lease ----
    IndexMaintenance.withLease(conf, normDir, "remove") {
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
    }
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
      conf, normDir, rmTag, "ClusterIndex.logicalRemove")
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
        // same pruned read as remove()'s known-check (r14)
        val vAgg = TargetedDelete.contentSet(victims, idCol,
          xxhash64(Dedup.hashedTokenSet(col(textCol))))
          .withColumnRenamed("_chs", "_vchs")
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
        // mid-append crash guard, same as remove()
        if (oldFp.isDefined) {
          val vSrcs = rleg("guard")(s.read.parquet(s"$root/assign")
            .filter(col("idb").isin(vIdb: _*))
            .join(bVids(vids), Seq(idCol), "leftsemi")
            .select(col("_src")).filter(col("_src").isNotNull)
            .distinct().collect().map(_.getString(0)).toSet)
          Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
            "ClusterIndex.logicalRemove")
        }
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
      FaultInjection.maybeCrash("cluster.logical.overlay")
      // serve-overlay: the victims' component re-split, computed once
      // here (bounded by the victims' components — delta-scale, never
      // the corpus) so every assignments() read until the next compact
      // is a pure O(overlay) parquet read. A crash right above leaves
      // the overlay out of step with the batch list; serves detect that
      // and recompute live, and the replay rewrites it (idempotent).
      // BEST-EFFORT (review-caught): the overlay is advisory — readers
      // validate and fall back — so a transient failure here must not
      // leave rmstate pending and wedge every later removal over an
      // artifact whose absence costs one extra per-read recompute.
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
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"ClusterIndex.logicalRemove on $indexDir: the index was compacted " +
        "during the removal — re-run it after verifying no maintenance " +
        "is racing")
    }
  }

  /** O(|delta|) maintenance — `tag` must be BATCH-UNIQUE (the streaming
    * loops use ck<runKey>_b<batchId>): writes are tag-scoped dynamic
    * overwrites, so a DIFFERENT batch under a used tag would destroy the
    * earlier batch's rows; append() detects reuse via the applied
    * fingerprint record and refuses loudly, re-admitting only the exact
    * same (tag, delta) pair — the crash-replay.
    *
    * Probe (excluding this batch's own tag, so a
    * crash-replay behaves like the first run), write the delta's rows
    * tag-scoped (dynamic overwrite — replay rewrites the same partitions,
    * exactly-once), re-assign the members of any bridged components, and
    * merge the fingerprint once per (tag, delta) pair. Post-condition
    * (ClusterIndexSpec): `assign` == fresh CC over the union corpus. */
  def append(delta: DataFrame, idCol: String, textCol: String,
             indexDir: String, tag: String = "append"): DataFrame = {
    val s = delta.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // write lease for the whole append: a racing compact() (which would
    // retire this generation and strand these writes) fails loudly at
    // its own acquire instead
    IndexMaintenance.withLease(conf, indexDir, "write") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    // ONE meta read serves threshold, bucket count, and the fingerprint
    // (three separate reads could observe different generations under a
    // concurrent rebuild)
    val m = s.read.parquet(s"$root/meta").head()
    val thr = m.getAs[Double]("threshold")
    val nBuckets = m.getAs[Int]("n_buckets")
    val oldFp =
      if (m.schema.fieldNames.contains("n_rows"))
        Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
      else None // legacy meta: no fingerprint to maintain
    // "build" is the build generation's own _src value: a tag sanitizing
    // to it would dynamic-overwrite build partitions wherever the hash
    // buckets collide, and excludeTag=Some("build") would exclude the
    // whole build corpus from the probe — near-dups of indexed docs
    // would silently go unflagged (ADVICE r10). compact() folds
    // committed generations into _src=build, widening the exposure, so
    // refuse the name outright rather than trusting callers.
    require(sanitize(tag) != "build",
      s"ClusterIndex.append: tag '$tag' sanitizes to the reserved build " +
        "generation name 'build'; its tag-scoped overwrite would destroy " +
        "build rows and its probe would exclude the build corpus — pass a " +
        "batch-unique tag that does not collide with 'build'")
    val dfp = Fingerprint.of(delta, Seq(idCol, textCol))
    // Tag reuse guard: unlike the append-mode indexes, these writes are
    // tag-scoped dynamic OVERWRITES — a different batch under a used tag
    // would silently destroy the earlier batch's rows wherever their
    // hash buckets collide (and the excludeTag probe would skip them).
    // The exact same (tag, delta) pair is the legitimate crash-replay.
    val replay = Fingerprint.wasApplied(conf, indexDir, tag, dfp)
    require(replay || !Fingerprint.tagUsed(conf, indexDir, tag),
      s"ClusterIndex.append: tag '$tag' was already used by a different " +
        "batch; appends are tag-scoped dynamic overwrites, so reusing a " +
        "tag would destroy the earlier batch's rows — pass a batch-unique " +
        "tag (the streaming loops use ck<runKey>_b<batchId>)")
    val tagS = sanitize(tag)
    // a tombstoned id is dead until compact() reclaims it: re-ingesting
    // it here would hide the new rows behind the id-scoped tombstone
    // and then wrongly drop them in the reclaim filter (no-op fast path
    // when the index never saw a logical delete)
    val tomb = LogicalDelete.ids(s, indexDir)
    LogicalDelete.requireNotTombstoned(s, indexDir,
      delta.select(col(idCol)), idCol, "ClusterIndex.append", tomb)
    val (assignInc, merges, toksD, matchPairs) = probeParts(s, root, delta,
      idCol, textCol, excludeTag = Some(tag), tomb)
    // id-sign guard BEFORE any write (review-caught twice: a post-write
    // check would leave a rejected delta's rows committed, and an EMPTY
    // delta — a re-crawl-only streaming batch — aggregates min to null,
    // which must be a no-op, not an NPE): the edge log's sign-based
    // vertex classification needs non-negative doc ids
    val minRow = toksD.agg(min(col(idCol))).head()
    require(minRow.isNullAt(0) || minRow.getLong(0) >= 0L,
      s"ClusterIndex requires non-negative doc ids (got min " +
        s"${minRow.getLong(0)}): the persisted edge log encodes virtual " +
        "set nodes as negative ids")
    // materialize BEFORE any write mutates the partitions they were read
    // from (the dynamic overwrites below touch the same tables; toksD is
    // probeParts' already-checkpointed tokenization — not recomputed)
    val assignD = assignInc.localCheckpoint()
    val mergeMap = merges.localCheckpoint() // bounded: <= touched components
    def dynOverwrite(df: DataFrame, parts: Seq[String], path: String): Unit =
      df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(parts: _*).parquet(path)
    dynOverwrite(
      toksD.withColumn("_src", lit(tagS)).withColumn("idb", idb(col(idCol), nBuckets)),
      Seq("_src", "idb"), s"$root/toks")
    dynOverwrite(
      toksD.select(col(idCol), size(col("_toks")).as("_sz"), explode(col("_toks")).as("_tok"))
        .withColumn("_src", lit(tagS)).withColumn("tb", tb(col("_tok"), nBuckets)),
      Seq("_src", "tb"), s"$root/postings")
    dynOverwrite(
      assignD.withColumn("_src", lit(tagS)).withColumn("idb", idb(col(idCol), nBuckets)),
      Seq("_src", "idb"), s"$root/assign")
    // adjacency-log maintenance: the delta's own connectivity in the
    // deletion-safe set-node form + every verified delta->indexed pair
    // (matchPairs is pair-distinct — cands was). Tag-scoped dynamic
    // overwrite like the other tables: replay rewrites its partitions.
    // salted by this batch's tag so a re-ingested id can never re-create
    // an earlier generation's node id (delta-sized second repGraph pass;
    // probeParts' CC input is computed against a different exclusion set
    // and cannot be shared without entangling the probe hot path)
    val deltaEdges = SetSimJoin
      .jaccardEdgesSetForm(toksD, idCol, "_toks", thr, salt = tagS)
      .unionByName(matchPairs.select(
        least(col("_inc"), col("_ref")).as("u"),
        greatest(col("_inc"), col("_ref")).as("v")))
    dynOverwrite(
      deltaEdges.withColumn("_src", lit(tagS))
        .withColumn("eb", idb(col("u"), nBuckets)),
      Seq("_src", "eb"), s"$root/edges")
    // targeted re-assignment of bridged components: rewrite ONLY the
    // partitions that hold a loser's members. Reading the affected rows
    // is one predicate-pushed scan of the (id, component) map — orders
    // of magnitude cheaper than the PPJoin+CC recompute it replaces.
    // partition-dir values read back type-inferred (idb=5 -> INT):
    // cast before collecting
    val affected = s.read.parquet(s"$root/assign")
      .join(broadcast(mergeMap), col("component") === col("loser"))
      .select(col("_src"), col("idb").cast("long")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (affected.nonEmpty) {
      val srcs = affected.map(_._1).distinct.toSeq
      val idbs = affected.map(_._2).distinct.toSeq
      val rewritten = s.read.parquet(s"$root/assign")
        .filter(col("_src").isin(srcs: _*) && col("idb").isin(idbs: _*))
        .join(broadcast(mergeMap), col("component") === col("loser"), "left")
        .select(col(idCol), coalesce(col("winner"), col("component")).as("component"),
          col("_src"), col("idb"))
        .localCheckpoint() // fully read before its source partitions are replaced
      dynOverwrite(rewritten, Seq("_src", "idb"), s"$root/assign")
    }
    // fingerprint: merged once per (tag, delta) — replay-safe
    if (!replay) oldFp.foreach { old =>
      import s.implicits._
      val fp = Fingerprint.merge(old, dfp)
      Seq((thr, nBuckets, fp._1, fp._2))
        .toDF("threshold", "n_buckets", "n_rows", "content_hash")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      Fingerprint.recordMerge(conf, indexDir, tag, dfp)
    }
    // build-time file statuses no longer describe the corpus of
    // record: freshness reverts to the content-hash authority
    Fingerprint.clearSourceStatus(conf, indexDir)
    // belt-and-braces behind the lease: if the generation moved anyway
    // (a compact that broke leases while this append was truly alive),
    // the writes above landed in a retired tree — fail loudly rather
    // than report success for rows no probe will ever see
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"ClusterIndex.append on $indexDir: the index was compacted to a new " +
        s"generation while this append was writing $root; its rows are in " +
        "the retired tree — re-run the append (same tag + delta replays " +
        "exactly-once) after verifying no maintenance is racing")
    // the delta's assignments AS OF THIS APPEND (already materialized —
    // safe to consume after the overwrites): the streaming loop's
    // per-batch output. The index's assign table stays authoritative;
    // a later batch that bridges can amend components there.
    assignD
    }
  }
}
