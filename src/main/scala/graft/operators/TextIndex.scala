package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent near-dup index over a TEXT corpus — the standing-corpus
  * side of [[Dedup.minhashNearDupsAgainst]] made build-once/probe-many,
  * the same lifecycle split [[VectorIndex]] gives the ANN path. Without
  * it, every incremental ingest re-pays the corpus-wide pass (tokenize,
  * 128 min-hashes per doc) just to ask "is this month's dump new?".
  *
  *  - [[build]] runs that pass ONCE and persists plain parquet —
  *    engine-independent, object-store friendly:
  *    `<dir>/bands` (one row per (doc, band): band hash + full signature,
  *    PARTITIONED BY a band-hash bucket) and `<dir>/toks` (sorted hashed
  *    token sets for exact verification, PARTITIONED BY an id bucket),
  *    plus a one-row `<dir>/meta` carrying the hash-family parameters.
  *  - [[probe]] computes the INCOMING side only, collects its touched
  *    band-hash buckets (bounded by nBuckets ints — the upsertStream
  *    argument), and scans ONLY those `hb=` partitions of the band
  *    table; verification then prunes `<dir>/toks` the same way via the
  *    candidates' id buckets. A small dump against a huge corpus reads
  *    the index partitions its own hashes land in, not the corpus.
  *  - [[append]] adds a new dump's rows under the FROZEN hash family
  *    (parameters from meta, so probe-vs-build drift is impossible) —
  *    O(|delta|), never a corpus rewrite. The natural ingest loop is
  *    probe → keep novel docs → append them.
  *
  * Same fixture, same parameters => [[probe]] returns EXACTLY
  * [[Dedup.minhashNearDupsAgainst]]'s answer (TextIndexSpec gates the
  * equivalence, the file-level pruning, and append-then-probe).
  */
object TextIndex {

  // private[graft]: IndexCheck re-derives band rows from the stored
  // token sets to audit the persisted table against the frozen params
  private[graft] def bandRows(toks: DataFrame, idCol: String, numHashes: Int,
                              bands: Int, nBuckets: Int, seed: Int): DataFrame =
    toks
      .select(col(idCol),
        Dedup.bandHashes(
          Dedup.minhashSignature(col("_toks"), numHashes, seed),
          bands, numHashes / bands).as("_bh"))
      .select(col(idCol), col("_bh"),
        posexplode(col("_bh")).as(Seq("band", "band_hash")))
      .withColumn("hb", pmod(col("band_hash"), lit(nBuckets.toLong)))

  private def tokRows(toks: DataFrame, idCol: String, nBuckets: Int): DataFrame =
    toks.withColumn("idb", pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)))

  /** One corpus pass: tokenize + sign every document, persist the
    * bucket-partitioned band and token tables plus the parameter row —
    * which also carries the indexed corpus' fingerprint (staleness guard;
    * see [[Fingerprint]] / [[isFresh]]). */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
            numHashes: Int = 128, bands: Int = 16, nBuckets: Int = 64,
            seed: Int = 42): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val s = docs.sparkSession
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    // write lease + live-root resolution: tables land in the current
    // data generation, and a racing compact() fails loudly (see
    // [[IndexMaintenance]])
    IndexMaintenance.withLease(conf, indexDir, "write") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val toks = docs
      .select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))
      .localCheckpoint() // feeds both tables; never recompute the hash pass
    tokRows(toks, idCol, nBuckets)
      .write.mode("overwrite").partitionBy("idb").parquet(s"$root/toks")
    bandRows(toks, idCol, numHashes, bands, nBuckets, seed)
      .withColumn("_src", lit("build")) // ingest provenance, see probe
      .write.mode("overwrite").partitionBy("hb").parquet(s"$root/bands")
    val fp = Fingerprint.of(docs, Seq(idCol, textCol))
    Seq((numHashes, bands, nBuckets, seed, fp._1, fp._2))
      .toDF("num_hashes", "bands", "n_buckets", "seed", "n_rows", "content_hash")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
    // a rebuild wiped the indexed rows: batch markers / merge records
    // from the previous build generation must not survive it
    Fingerprint.clearReplayState(conf, indexDir)
    // nor may pending tombstones — they would hide the rebuilt corpus'
    // rows under recycled ids (see [[LogicalDelete.clear]])
    LogicalDelete.clear(conf, indexDir)
    // freshness fast-path: record the corpus file statuses LAST — a
    // crash mid-build degrades to the hash scan, never a false fresh
    Fingerprint.writeSourceStatus(conf, indexDir, Fingerprint.sourceStatus(docs))
    }
  }

  // root = resolved data root (IndexMaintenance.liveRoot), not the index dir
  private def readMeta(s: SparkSession, root: String): (Int, Int, Int, Int) = {
    val m = s.read.parquet(s"$root/meta").head()
    (m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"),
      m.getAs[Int]("n_buckets"), m.getAs[Int]("seed"))
  }

  private def readFingerprint(s: SparkSession, root: String): Option[(Long, Long)] =
    try {
      val m = s.read.parquet(s"$root/meta").head()
      Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
    } catch { case _: Exception => None } // absent/legacy meta => stale

  /** Does the persisted index still describe THIS corpus? False when meta
    * is absent / pre-fingerprint or the corpus was regenerated in place.
    * The unchanged-corpus answer is O(files) FS metadata calls
    * ([[Fingerprint.statusFresh]] — no Spark job); drift or a non-file
    * corpus falls back to the content-hash authority: one column-pruned
    * agg scan — cheap next to the 128-hashes-per-doc pass it guards.
    * The fingerprint tracks the corpus OF RECORD: build corpus plus
    * every [[append]]ed delta (merged in O(1); appends drop the status
    * record, so the fast path only ever serves the pure-build case). */
  def isFresh(s: SparkSession, indexDir: String, corpus: DataFrame,
              idCol: String, textCol: String): Boolean =
    Fingerprint.statusFresh(indexDir, corpus) ||
      readFingerprint(s,
          IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir))
        .contains(Fingerprint.of(corpus, Seq(idCol, textCol)))

  /** Build-once/probe-many entry: (re)build only when the index is absent
    * or stale w.r.t. `docs`. */
  def ensure(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
             numHashes: Int = 128, bands: Int = 16, nBuckets: Int = 64,
             seed: Int = 42): Unit = {
    val s = docs.sparkSession
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val success = new org.apache.hadoop.fs.Path(s"$root/bands/_SUCCESS")
    val fs = success.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a pre-provenance index (no _src column anywhere) can't honor
    // probe's excludeTag replay guard — treat it as stale, don't infer
    val hasSrc =
      try s.read.parquet(s"$root/bands").schema.fieldNames.contains("_src")
      catch { case _: Exception => false }
    if (!fs.exists(success) || !hasSrc ||
        !isFresh(s, indexDir, docs, idCol, textCol))
      build(docs, idCol, textCol, indexDir, numHashes, bands, nBuckets, seed)
  }

  /** O(|delta|) maintenance: sign a new dump with the index's FROZEN
    * parameters and append its rows to both tables; the meta fingerprint
    * absorbs the delta in O(1) so [[isFresh]] keeps working. `tag` is
    * the ingest-provenance label stored on the band rows — pass a
    * batch-unique value to make a probe-then-append loop replayable
    * (see [[probe]]'s excludeTag). */
  def append(delta: DataFrame, idCol: String, textCol: String,
             indexDir: String, tag: String = "append"): Unit = {
    val s = delta.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // write lease: a compact() racing this append fails loudly at its
    // own acquire instead of retiring the generation mid-append
    IndexMaintenance.withLease(conf, indexDir, "write") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val (numHashes, bands, nBuckets, seed) = readMeta(s, root)
    val old = readFingerprint(s, root)
    // a tombstoned id is dead until compact() reclaims: re-ingesting it
    // would be hidden by the id-scoped anti-join and then wrongly
    // dropped by the reclaim filter (see [[LogicalDelete]])
    LogicalDelete.requireNotTombstoned(s, indexDir,
      delta.select(col(idCol)), idCol, "TextIndex.append")
    val toks = delta
      .select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))
      .localCheckpoint()
    tokRows(toks, idCol, nBuckets)
      .write.mode("append").partitionBy("idb").parquet(s"$root/toks")
    bandRows(toks, idCol, numHashes, bands, nBuckets, seed)
      .withColumn("_src", lit(tag))
      .write.mode("append").partitionBy("hb").parquet(s"$root/bands")
    import s.implicits._
    old.foreach { o =>
      // idempotent per batch (ADVICE r9): a crash-replayed append presents
      // the same (tag, delta fingerprint) pair — its rows re-append (probe
      // semantics tolerate duplicates) but the fingerprint must merge ONCE
      // or meta drifts from the corpus of record forever
      val dfp = Fingerprint.of(delta, Seq(idCol, textCol))
      if (Fingerprint.shouldMerge(conf, indexDir, tag, dfp)) {
        val fp = Fingerprint.merge(o, dfp)
        Seq((numHashes, bands, nBuckets, seed, fp._1, fp._2))
          .toDF("num_hashes", "bands", "n_buckets", "seed", "n_rows", "content_hash")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
        Fingerprint.recordMerge(conf, indexDir, tag, dfp)
      }
    }
    // build-time file statuses no longer describe the corpus of
    // record: freshness reverts to the content-hash authority
    Fingerprint.clearSourceStatus(conf, indexDir)
    // behind the lease this cannot fire; it guards the broke-stale-leases
    // case (see ClusterIndex.append)
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"TextIndex.append on $indexDir: index compacted to a new generation " +
        s"during the append; rows landed in the retired tree $root — re-run " +
        "the append after verifying no maintenance is racing")
    }
  }

  /** Index-side targeted DELETE (VERDICT r10 item 1): drop `victims`
    * from both tables so probes stop matching right-to-be-forgotten
    * docs, and subtract their contribution from the meta fingerprint so
    * [[isFresh]] tracks the surviving corpus of record. `victims` must
    * carry the EXACT `(id, text)` rows as ingested (read them from the
    * lake before scrubbing it) and every id must be indexed — checked
    * before anything mutates. Crash-safe like the cluster sibling: the
    * subtract + replay record commit first, then the idempotent pruned
    * rewrites (band buckets recomputed from the victims' indexed token
    * sets under the frozen hash family, so the prune is exact); a
    * replayed `(tag, victims)` pair re-runs only the rewrites. Removes
    * duplicate rows from crashed append replays too — removal is by id,
    * not by row. */
  def remove(victims: DataFrame, idCol: String, textCol: String,
             indexDir: String, tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // polite pre-lease wait for healthy in-flight halves (ADVICE r17)
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val (numHashes, bandCount, nBuckets, seed) = readMeta(s, root)
    val oldFp = readFingerprint(s, root)
    val rmTag = s"rm.$tag" // own namespace, see ClusterIndex.remove
    val vfp = Fingerprint.of(victims, Seq(idCol, textCol))
    val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
    if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
      s"TextIndex.remove: tag '$tag' was already used by a different " +
        "removal batch — pass a batch-unique tag")
    // cross-tag leftover state refusal, see ClusterIndex.remove
    Fingerprint.requireNoOtherPendingRemoval(
      conf, IndexMaintenance.normalize(indexDir), rmTag, "TextIndex.remove",
      callerHoldsLease = true)
    // pending logical deletions must reclaim first (their victims would
    // read as indexed rows here) — see [[LogicalDelete]]
    LogicalDelete.requireNonePending(conf, indexDir, "TextIndex.remove")
    val vids = victims.select(col(idCol)).distinct().localCheckpoint()
    val nV = vids.count()
    if (nV > 0L) {
      val vIdb = vids
        .select(pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).as("idb"))
        .distinct().collect().map(_.getLong(0)).toSeq
      // the victims' INDEXED token sets: authoritative for the band
      // buckets their rows live in (frozen family => exact recompute).
      // Broadcast only below the mass-victim key threshold (VERDICT r11
      // item 1), like every victim join in the remove family.
      val vToks = s.read.parquet(s"$root/toks")
        .filter(col("idb").isin(vIdb: _*))
        .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "leftsemi")
        .select(col(idCol), col("_toks"))
        .localCheckpoint()
      // the content known-check and the band-bucket collect + provenance
      // guard share only already-checkpointed inputs (vToks, vids) — run
      // them concurrently (r18 opt, guide §2.6; the known-check's
      // refusal is rethrown first on a double failure)
      var vHb: Seq[Long] = Seq.empty
      val bands = s.read.parquet(s"$root/bands") // ONE relation resolution
      IndexMaintenance.runLegs(Seq(
        "text.validate.known" -> (() => if (!replay) {
          // CONTENT-MULTISET known-check (r14, see
          // [[TargetedDelete.contentSet]]): per victim id, the stored
          // rows' token-set hashes must EQUAL the victim rows' — the
          // delete is id-keyed (every stored version goes), so the caller
          // must pass ALL of an id's ingested versions, or a wrong/partial
          // victim set would subtract a fingerprint that diverges from the
          // rows actually removed, silently poisoning isFresh forever
          val vAgg = TargetedDelete.contentSet(victims, idCol,
            xxhash64(Dedup.hashedTokenSet(col(textCol))))
            .withColumnRenamed("_chs", "_vchs")
          val known = TargetedDelete.contentSet(vToks, idCol,
              xxhash64(col("_toks")))
            .join(TargetedDelete.maybeBroadcast(vAgg, nV), Seq(idCol))
            .filter(col("_chs") === col("_vchs"))
            .count()
          if (known != nV) Fingerprint.refuse(
            s"TextIndex.remove: only $known of $nV victim ids are indexed " +
              "with matching content (ALL stored versions of each id — the " +
              "delete is id-keyed); the fingerprint subtraction needs " +
              "exactly the ingested (id, text) rows")
        }),
        "text.validate.bands" -> (() => {
          vHb = bandRows(vToks, idCol, numHashes, bandCount, nBuckets, seed)
            .select(col("hb")).distinct().collect().map(_.getLong(0)).toSeq
          // victims whose append crashed MID-append (rows landed, fingerprint
          // merge never recorded) must not subtract — their delta was never
          // added. One pruned read of the victims' band rows' provenance,
          // bounded by |tags|; only meaningful on fingerprinted indexes with
          // provenance columns. Same sanitized namespace as tagfp/ names.
          if (!replay && oldFp.isDefined &&
              bands.schema.fieldNames.contains("_src")) {
            val vSrcs = bands
              .filter(col("hb").isin(vHb: _*))
              .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "leftsemi")
              .select(col("_src")).filter(col("_src").isNotNull) // pre-provenance rows = build-era
              .distinct().collect().map(_.getString(0)).toSet
            Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
              "TextIndex.remove")
          }
        })))
      // idempotent fingerprint commit (ADVICE r11; r15: metabase-first +
      // resolveRemovalMeta, so appends interleaved across a crash
      // window replay exactly instead of having their merges wiped by
      // an absolute-target overwrite)
      val normDir = IndexMaintenance.normalize(indexDir)
      Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
        oldFp, "TextIndex.remove")
      val stateDir = Fingerprint.removeStatePath(normDir, rmTag)
      // the victims' band buckets join the commit record as plan state
      // (computed from the toks table, pristine on any first attempt):
      // the bands prune no longer depends on another rewrite's table,
      // so the two deletes are order-free — and parallel (the same
      // protocol as ClusterIndex.remove's four legs). Written whenever
      // ABSENT, not only with a fresh record, so a removal that crashed
      // under the pre-plan protocol (record exists, no vhb) self-heals:
      // recomputing from the current toks reproduces exactly the old
      // protocol's bucket list at every one of its crash boundaries
      // (toks was always deleted last, and an empty recompute can only
      // happen after the bands delete already completed).
      // Presence is an explicit fs.create'd marker (ClusterIndex's
      // PLAN_READY protocol) or surviving part files — NOT _SUCCESS,
      // which deployments disable (mapreduce.fileoutputcommitter
      // .marksuccessfuljobs=false is common object-store tuning): with
      // only _SUCCESS probed, a replay after the parallel toks leg
      // completed would recompute vHb from the now-empty toks table and
      // overwrite the plan with an empty bucket list, leaving the
      // victims' band rows alive forever. An existing plan is never
      // overwritten.
      val vhbDir = new org.apache.hadoop.fs.Path(s"$stateDir/vhb")
      val vhbMarker = new org.apache.hadoop.fs.Path(s"$stateDir/VHB_READY")
      val vhbFs = vhbMarker.getFileSystem(conf)
      val vhbPresent = vhbFs.exists(vhbMarker) ||
        (vhbFs.exists(vhbDir) && vhbFs.listStatus(vhbDir)
          .exists(st => st.isFile && st.getPath.getName.startsWith("part-")))
      if (!vhbPresent) {
        import s.implicits._
        vHb.toDF("hb").coalesce(1)
          .write.mode("overwrite").parquet(vhbDir.toString)
      }
      if (!vhbFs.exists(vhbMarker)) vhbFs.create(vhbMarker, true).close()
      FaultInjection.maybeCrash("text.state")
      Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
        "TextIndex.remove").foreach { fp =>
        import s.implicits._
        Seq((numHashes, bandCount, nBuckets, seed, fp._1, fp._2))
          .toDF("num_hashes", "bands", "n_buckets", "seed", "n_rows", "content_hash")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      }
      FaultInjection.maybeCrash("text.meta")
      if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
      FaultInjection.maybeCrash("text.record")
      // both rewrites plan-driven and idempotent: run concurrently,
      // surface the first failure only after both settle (a mid-leg
      // crash must never leave a sibling job racing the replay).
      // When THIS call just wrote the plan, the in-memory list IS its
      // content — re-reading the file buys nothing (r18 opt); a replay
      // that found an existing plan still reads the file of record.
      val vHbPlan =
        if (!vhbPresent) vHb
        else s.read.parquet(s"$stateDir/vhb")
          .collect().map(_.getLong(0)).toSeq
      IndexMaintenance.runLegs(Seq(
        "text.bands" -> (() => {
          TargetedDelete.delete(s, s"$root/bands", Seq("hb"), idCol, vids,
            col("hb").isin(vHbPlan: _*))
          (): Unit
        }),
        "text.toks" -> (() => {
          TargetedDelete.delete(s, s"$root/toks", Seq("idb"), idCol, vids,
            col("idb").isin(vIdb: _*))
          (): Unit
        })))
      Fingerprint.clearSourceStatus(conf, indexDir)
      // retired GC-grace generations hold the victims' rows too —
      // right-to-be-forgotten beats reader grace (see
      // IndexMaintenance.purgeRetired)
      IndexMaintenance.purgeRetired(conf, indexDir, Seq("bands", "toks", "meta"))
      // state cleanup LAST — every step above replays from the record
      Fingerprint.clearRemoveState(conf, normDir, rmTag)
    }
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"TextIndex.remove on $indexDir: index compacted during the removal " +
        "— re-run it after verifying no maintenance is racing")
    }
  }

  /** LOGICAL targeted delete (VERDICT r12 item 1) — the RTBF fast path:
    * same validation and the same idempotent fingerprint subtraction as
    * [[remove]], but the only mutation is one small tombstone-batch
    * write under `<indexDir>/deleted/` — O(victims), no band/toks
    * rewrite. [[probe]] is blind to the victims the moment this
    * returns; the rows are physically reclaimed by the next [[compact]]
    * (see [[LogicalDelete]] — tombstoned ids are dead to appends until
    * then). `victims` must carry the EXACT `(id, text)` rows as
    * ingested; tags share the remove namespace. */
  def logicalRemove(victims: DataFrame, idCol: String, textCol: String,
                    indexDir: String, tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val (numHashes, bandCount, nBuckets, seed) = readMeta(s, root)
    val oldFp = readFingerprint(s, root)
    val rmTag = s"rm.$tag"
    val vfp = Fingerprint.of(victims, Seq(idCol, textCol))
    val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
    if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
      s"TextIndex.logicalRemove: tag '$tag' was already used by a " +
        "different removal batch — pass a batch-unique tag")
    val normDir = IndexMaintenance.normalize(indexDir)
    Fingerprint.requireNoOtherPendingRemoval(
      conf, normDir, rmTag, "TextIndex.logicalRemove",
      callerHoldsLease = true)
    val vids = victims.select(col(idCol)).distinct().localCheckpoint()
    val nV = vids.count()
    // applied record + no pending removal state ⟺ the prior run fully
    // completed; re-writing the tombstone would re-hide ids re-ingested
    // after a compact() reclaim (ADVICE r13) — no-op the replay
    val completedReplay = replay &&
      Fingerprint.readRemoveState(conf, normDir, rmTag).isEmpty
    if (nV > 0L && !completedReplay) {
      val vIdb = vids
        .select(pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)).as("idb"))
        .distinct().collect().map(_.getLong(0)).toSeq
      if (!replay) {
        LogicalDelete.requireNotTombstoned(s, indexDir, vids, idCol,
          "TextIndex.logicalRemove")
        // content-set, like remove() — see the r14 note there
        val vAgg = TargetedDelete.contentSet(victims, idCol,
          xxhash64(Dedup.hashedTokenSet(col(textCol))))
          .withColumnRenamed("_chs", "_vchs")
        val known = TargetedDelete.contentSet(
            s.read.parquet(s"$root/toks")
              .filter(col("idb").isin(vIdb: _*))
              .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol),
                "leftsemi"),
            idCol, xxhash64(col("_toks")))
          .join(TargetedDelete.maybeBroadcast(vAgg, nV), Seq(idCol))
          .filter(col("_chs") === col("_vchs"))
          .count()
        if (known != nV) Fingerprint.refuse(
          s"TextIndex.logicalRemove: only $known of $nV victim ids are " +
            "indexed with matching content (ALL stored versions of each " +
            "id); the fingerprint subtraction needs exactly the ingested " +
            "(id, text) rows")
        // mid-append crash guard, same pruned provenance read as remove()
        if (oldFp.isDefined &&
            s.read.parquet(s"$root/bands").schema.fieldNames.contains("_src")) {
          val vToks = s.read.parquet(s"$root/toks")
            .filter(col("idb").isin(vIdb: _*))
            .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "leftsemi")
            .select(col(idCol), col("_toks"))
          val vHb = bandRows(vToks, idCol, numHashes, bandCount, nBuckets, seed)
            .select(col("hb")).distinct().collect().map(_.getLong(0)).toSeq
          val vSrcs = s.read.parquet(s"$root/bands")
            .filter(col("hb").isin(vHb: _*))
            .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "leftsemi")
            .select(col("_src")).filter(col("_src").isNotNull)
            .distinct().collect().map(_.getString(0)).toSet
          Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
            "TextIndex.logicalRemove")
        }
      }
      // idempotent fingerprint commit — remove()'s protocol shape (r15:
      // metabase-first + interleaving-exact replay resolution)
      Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
        oldFp, "TextIndex.logicalRemove")
      FaultInjection.maybeCrash("text.logical.state")
      Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
        "TextIndex.logicalRemove").foreach { fp =>
        Seq((numHashes, bandCount, nBuckets, seed, fp._1, fp._2))
          .toDF("num_hashes", "bands", "n_buckets", "seed", "n_rows", "content_hash")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
      }
      FaultInjection.maybeCrash("text.logical.meta")
      if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
      FaultInjection.maybeCrash("text.logical.record")
      // the one "leg": the tombstone batch — probes blind from here
      LogicalDelete.write(vids, idCol, normDir, rmTag)
      Fingerprint.clearSourceStatus(conf, indexDir)
      Fingerprint.clearRemoveState(conf, normDir, rmTag)
    }
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"TextIndex.logicalRemove on $indexDir: index compacted during the " +
        "removal — re-run it after verifying no maintenance is racing")
    }
  }

  /** Fold the accreted append files: rewrite `bands`/`toks` as one file
    * per partition directory with pure I/O (no re-tokenize, no
    * re-sign). Ingest-provenance `_src` values are a DATA column here
    * and are preserved verbatim, so probe's excludeTag replay guard
    * keeps working; meta carries over unchanged and the
    * replay-protection state lives at the index top level, outside the
    * data generations. Tombstoned rows ([[logicalRemove]]) are
    * RECLAIMED here: they ride out on the rewrite the fold was doing
    * anyway, retired generations purge (RTBF beats reader grace), and
    * the tombstone set clears after the cutover. Cutover is a
    * generation-pointer flip (object-store safe, no renames) under the
    * compact lease — see [[IndexMaintenance]]. */
  def compact(s: SparkSession, indexDir0: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val indexDir = IndexMaintenance.normalize(indexDir0)
    val ctx = IndexMaintenance.beginCompact(conf, indexDir)
    // lease-time snapshot; the trailing cleanup clears exactly these
    // batches, never one a post-flip logicalRemove adds (r13 review)
    val reclaimBatches = LogicalDelete.pendingBatches(conf, indexDir)
    try {
      val tomb =
        LogicalDelete.idsOf(s, indexDir, reclaimBatches)
      def dropVictims(df: DataFrame): DataFrame = tomb.fold(df) { t =>
        // the id column name rides in the tombstone frame itself
        df.join(t, Seq(LogicalDelete.idColOf(t)), "left_anti")
      }
      // independent staged-table writes run concurrently (r13 — the
      // remove()-legs shape; see ClusterIndex.compact)
      IndexMaintenance.runLegs(Seq(
        "compact.bands" -> (() =>
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot, "bands",
            Seq("hb"), transform = dropVictims)),
        "compact.toks" -> (() =>
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot, "toks",
            Seq("idb"), transform = dropVictims)),
        "compact.meta" -> (() =>
          IndexMaintenance.copyTable(s, ctx.fromRoot, ctx.stagingRoot, "meta"))))
    } catch {
      case t: Throwable => IndexMaintenance.abortCompact(conf, ctx); throw t
    }
    IndexMaintenance.finishCompact(conf, ctx,
      legacyTables = Seq("bands", "toks", "meta"))
    if (reclaimBatches.nonEmpty) {
      IndexMaintenance.purgeRetired(conf, indexDir, Seq("bands", "toks", "meta"))
      LogicalDelete.clearBatches(conf, indexDir, reclaimBatches)
    }
  }

  /** Flag incoming docs that near-duplicate the INDEXED corpus: the
    * [[Dedup.minhashNearDupsAgainst]] contract (one row per flagged
    * incoming doc, best match by verified Jaccard then ref id), with the
    * reference side read partition-PRUNED from the persisted index.
    *
    * `excludeTag` drops index rows whose ingest-provenance `_src` label
    * equals the given tag — the replay guard for probe-then-append
    * loops: if this very batch was already appended (crash after append,
    * before the caller's commit marker), a re-probe would otherwise flag
    * every doc against its own just-appended copy. Exclusion is by the
    * batch's PROVENANCE, not by incoming id, so a stable-id re-crawl
    * appended by an EARLIER batch still dedups normally — an id-based
    * self-exclusion would silently disable dedup for any source that
    * reuses document ids across dumps. */
  def probe(s: SparkSession, indexDir: String, incoming: DataFrame,
            idCol: String, textCol: String,
            threshold: Double = 0.8,
            excludeTag: Option[String] = None): DataFrame = {
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val (numHashes, bands, nBuckets, seed) = readMeta(s, root)
    val incToks = incoming
      .select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))
      .localCheckpoint()
    val incBands = bandRows(incToks, idCol, numHashes, bands, nBuckets, seed)
      .localCheckpoint() // consumed twice: bucket collect + the join
    // bounded collect: at most nBuckets longs — prunes the band scan
    val touchedHb = incBands.select(col("hb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // Schema resolution: default inference samples ONE footer; on an
    // index mixing pre-_src files with tagged appends it could come back
    // without _src — hiding the appended rows' provenance and silently
    // disabling the replay guard. But an unconditional mergeSchema read
    // merges EVERY file's footer on every probe — a per-micro-batch
    // full-metadata pass on the hot streaming path. So: try the cheap
    // single-footer read; only when the sampled footer lacks _src (the
    // rare mixed-legacy index, which ensure() rebuilds anyway) pay the
    // mergeSchema pass to check whether any appended file carries it.
    val plainBands = s.read.parquet(s"$root/bands")
    val refBandsRead =
      (if (plainBands.columns.contains("_src")) plainBands
       else s.read.option("mergeSchema", "true").parquet(s"$root/bands"))
        .filter(col("hb").isin(touchedHb: _*))
    // fully pre-provenance index (ensure() rebuilds these, but direct
    // probe calls must still resolve): legacy rows are _src = null
    val refBandsAll =
      if (refBandsRead.columns.contains("_src")) refBandsRead
      else refBandsRead.withColumn("_src", lit(null).cast("string"))
    // null-safe (ADVICE r9): on an index mixing pre-_src files with tagged
    // appends, legacy rows read _src = null; `=!=` would evaluate NULL and
    // silently drop the whole pre-upgrade corpus from the probe.
    // Logically-deleted docs leave the reference side HERE (tombstone
    // anti-join): cands and the toks verify are keyed by these refs, so
    // one exclusion point blinds the whole probe.
    val refBands = LogicalDelete.hide(
        excludeTag.fold(refBandsAll)(t =>
          refBandsAll.filter(!(col("_src") <=> lit(t)))),
        idCol, LogicalDelete.ids(s, indexDir))
      .select(col("band"), col("band_hash"),
        col(idCol).as("ref_id"), col("_bh").as("_bh1"))
    val cands = refBands
      .join(incBands.select(col("band"), col("band_hash"),
          col(idCol).as("inc_id"), col("_bh").as("_bh2")),
        Seq("band", "band_hash"))
      .filter(graft.functions.FirstBandMatch(col("_bh1"), col("_bh2")) === col("band"))
      .select(col("inc_id"), col("ref_id"))
      .localCheckpoint() // consumed twice: id-bucket collect + verify join
    // bounded collect again: candidate ref ids' buckets prune the verify scan
    val touchedIdb = cands
      .select(pmod(xxhash64(col("ref_id")), lit(nBuckets.toLong)).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val refToks = s.read.parquet(s"$root/toks")
      .filter(col("idb").isin(touchedIdb: _*))
      .select(col(idCol).as("ref_id"), col("_toks").as("_tr"))
    cands
      .join(incToks.select(col(idCol).as("inc_id"), col("_toks").as("_ti")), "inc_id")
      .join(refToks, "ref_id")
      .withColumn("_inter",
        graft.functions.SortedIntersectSize(col("_ti"), col("_tr")))
      .withColumn("jaccard", col("_inter").cast("double") /
        (size(col("_ti")) + size(col("_tr")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .withColumn("_rn", row_number().over(Window.partitionBy(col("inc_id"))
        .orderBy(col("jaccard").desc, col("ref_id"))))
      .filter(col("_rn") === 1)
      .select(col("inc_id"), col("ref_id"), round(col("jaccard"), 3).as("jaccard"))
  }
}
