package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CosineScores, VectorOps}

/** Persistent IVF index — the build-once / query-many lifecycle a real
  * 100 TB deployment runs. Training the coarse quantizer and assigning
  * every corpus vector to a cell is the expensive corpus-wide pass;
  * doing it inside every query (as [[Similarity.ivfTopK]] does, by
  * design, for the self-contained query surface) re-pays that pass per
  * probe batch. This operator splits the lifecycle:
  *
  *  - [[build]] runs the corpus pass ONCE and persists plain parquet —
  *    engine-independent, object-store friendly:
  *    `<dir>/centroids` (nlist x dim doubles, one tiny file) and
  *    `<dir>/cells` (corpus + precomputed norms, PARTITIONED BY cell).
  *  - [[topK]] reads the centroid table, picks each probe's nprobe
  *    cells, and scans ONLY those `cell=` partitions — the cell
  *    restriction is a partition-PRUNED file scan (the touched-cell set
  *    is bounded by nlist, collected like upsertStream's buckets), so a
  *    probe batch with nprobe/nlist = 1/4 reads a quarter of the index
  *    bytes and never shuffles the corpus.
  *
  * Same centroids + same probes => [[topK]] returns EXACTLY
  * [[Similarity.ivfTopK]]'s answer (training is deterministic in the
  * seed); VectorIndexSpec gates that equivalence and the partition
  * pruning itself.
  */
object VectorIndex {

  /** One corpus pass: train the quantizer, persist centroids + the
    * cell-partitioned corpus with precomputed norms, plus a meta row
    * fingerprinting the indexed corpus (staleness guard — see
    * [[Fingerprint]] and [[isFresh]]). */
  def build(corpus: DataFrame, indexDir: String,
            nlist: Int = Similarity.AutoNlist,
            iters: Int = 2, seed: Long = 42L,
            corpusId: String = "vec_id", corpusVec: String = "embedding"): Unit = {
    val s = corpus.sparkSession
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    // write lease + live-root resolution: tables land in the current
    // data generation, and a racing compact() fails loudly (see
    // [[IndexMaintenance]])
    IndexMaintenance.withLease(conf, indexDir, "write") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val centroids = Similarity.trainCentroids(corpus,
      Similarity.resolveNlist(corpus, nlist, corpusId), iters, seed,
      corpusId, corpusVec)
    require(centroids.nonEmpty, "IVF index build needs a non-empty corpus")
    centroids.zipWithIndex
      .flatMap { case (c, cell) => c.zipWithIndex.map { case (v, pos) => (cell, pos, v) } }
      .toDF("cell", "pos", "value")
      .coalesce(1) // nlist x dim doubles: one tiny file, broadcast-sized
      .write.mode("overwrite").parquet(s"$root/centroids")
    corpus
      .withColumn("cell", Similarity.nearestCentroid(col(corpusVec), centroids))
      .withColumn("norm", VectorOps.norm(col(corpusVec)))
      .withColumn("_src", lit("build")) // ingest provenance, see probeDups
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/cells")
    writeMeta(s, root, Fingerprint.of(corpus, Seq(corpusId, corpusVec)))
    // a rebuild wiped the indexed rows: batch markers / merge records
    // from the previous build generation must not survive it
    Fingerprint.clearReplayState(conf, indexDir)
    // nor may pending tombstones — they would hide the rebuilt corpus'
    // rows under recycled ids (see [[LogicalDelete.clear]])
    LogicalDelete.clear(conf, indexDir)
    // recall-probe readings describe the retired quantizer
    clearRecallProbes(conf, indexDir)
    // freshness fast-path: record the corpus file statuses LAST — a
    // crash mid-build degrades to the hash scan, never a false fresh
    Fingerprint.writeSourceStatus(conf, indexDir, Fingerprint.sourceStatus(corpus))
    }
  }

  // root = resolved data root (IndexMaintenance.liveRoot), not the index dir
  private def writeMeta(s: SparkSession, root: String,
                        fp: (Long, Long)): Unit = {
    import s.implicits._
    Seq(fp).toDF("n_rows", "content_hash")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
  }

  private def readMeta(s: SparkSession, root: String): Option[(Long, Long)] =
    try {
      val m = s.read.parquet(s"$root/meta").head()
      Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
    } catch { case _: Exception => None } // absent/legacy meta => stale

  /** Does the persisted index still describe THIS corpus? False when the
    * meta row is absent (pre-fingerprint index) or the corpus fingerprint
    * drifted — e.g. the source parquet was regenerated in place. The
    * unchanged-corpus answer is O(files) FS METADATA calls (build-time
    * source statuses + plan hash, [[Fingerprint.statusFresh]] — no Spark
    * job, no data bytes); any drift or a non-file corpus falls back to
    * the content-hash authority: one column-pruned agg scan, still far
    * cheaper than the quantizer training pass it guards. */
  def isFresh(s: SparkSession, indexDir: String, corpus: DataFrame,
              corpusId: String = "vec_id",
              corpusVec: String = "embedding"): Boolean =
    Fingerprint.statusFresh(indexDir, corpus) ||
      readMeta(s,
          IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir))
        .contains(Fingerprint.of(corpus, Seq(corpusId, corpusVec)))

  /** Build-once/query-many entry: (re)build only when the index is
    * absent or its fingerprint no longer matches the corpus. */
  def ensure(corpus: DataFrame, indexDir: String,
             nlist: Int = Similarity.AutoNlist,
             iters: Int = 2, seed: Long = 42L,
             corpusId: String = "vec_id", corpusVec: String = "embedding"): Unit = {
    val s = corpus.sparkSession
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val success = new org.apache.hadoop.fs.Path(s"$root/cells/_SUCCESS")
    val fs = success.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a pre-provenance index (no _src column anywhere) can't honor
    // probeDups' excludeTag replay guard — treat it as stale
    val hasSrc =
      try s.read.parquet(s"$root/cells").schema.fieldNames.contains("_src")
      catch { case _: Exception => false }
    if (!fs.exists(success) || !hasSrc ||
        !isFresh(s, indexDir, corpus, corpusId, corpusVec))
      build(corpus, indexDir, nlist, iters, seed, corpusId, corpusVec)
  }

  /** Incremental maintenance: assign NEW vectors to the EXISTING
    * quantizer and append them to their cell partitions — O(|delta|),
    * never a corpus rewrite, the arrival path for a streaming corpus.
    * The quantizer itself is deliberately frozen (retraining would
    * orphan every already-assigned cell); as the corpus drifts, recall
    * degrades gracefully until a periodic [[build]] re-clusters — the
    * standard IVF operating procedure. Appended vectors are immediately
    * visible to [[topK]] because cells are plain parquet partitions. */
  def append(delta: DataFrame, indexDir: String,
             corpusId: String = "vec_id",
             corpusVec: String = "embedding",
             tag: String = "append"): Unit = {
    val s = delta.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // write lease: a compact() racing this append fails loudly at its
    // own acquire instead of retiring the generation mid-append
    IndexMaintenance.withLease(conf, indexDir, "write") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val centroids = loadCentroidsFromRoot(s, root)
    // a tombstoned id is dead until compact() reclaims: re-ingesting it
    // would be hidden by the id-scoped anti-join and then wrongly
    // dropped by the reclaim filter (see [[LogicalDelete]])
    LogicalDelete.requireNotTombstoned(s, indexDir,
      delta.select(col(corpusId)), corpusId, "VectorIndex.append")
    delta
      .withColumn("cell", Similarity.nearestCentroid(col(corpusVec), centroids))
      .withColumn("norm", VectorOps.norm(col(corpusVec)))
      .withColumn("_src", lit(tag))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/cells")
    // keep the staleness fingerprint in step: merge the delta in O(1) —
    // once per (tag, delta) pair, so a crash-replayed append (ADVICE r9)
    // can't drift meta away from the corpus of record
    readMeta(s, root).foreach { old =>
      val dfp = Fingerprint.of(delta, Seq(corpusId, corpusVec))
      if (Fingerprint.shouldMerge(conf, indexDir, tag, dfp)) {
        writeMeta(s, root, Fingerprint.merge(old, dfp))
        Fingerprint.recordMerge(conf, indexDir, tag, dfp)
      }
    }
    // ---- recall-drift probe (r15, VERDICT r14 item 4): measure how
    // well the FROZEN quantizer fits THIS batch's distribution, so
    // IndexAdmin --advise can see the one verb it previously couldn't —
    // retrain(). Bounded by construction: one TakeOrdered of the delta
    // (<= recallSampleSize rows reach the driver) and O(S x R x dim)
    // driver flops; a measurement failure must never fail the ingest.
    try {
      val sample = delta.select(col(corpusId), col(corpusVec))
        .orderBy(col(corpusId)).limit(recallSampleSize)
        .collect()
        .map(_.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
          case n: Number => n.doubleValue()
        }.toArray)
      selfRecall(sample, centroids).foreach { rec =>
        writeRecallProbe(conf, indexDir, tag, rec, sample.length)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[VectorIndex.append] recall probe failed (ingest unaffected): " +
            s"${e.getMessage}")
    }
    // build-time file statuses no longer describe the corpus of
    // record: freshness reverts to the content-hash authority
    Fingerprint.clearSourceStatus(conf, indexDir)
    // behind the lease this cannot fire; it guards the broke-stale-leases
    // case (see ClusterIndex.append)
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"VectorIndex.append on $indexDir: index compacted to a new " +
        s"generation during the append; rows landed in the retired tree " +
        s"$root — re-run the append after verifying no maintenance is racing")
    }
  }

  /** The persisted quantizer, reassembled in cell order (bounded read:
    * nlist x dim rows). */
  def loadCentroids(s: SparkSession, indexDir: String): Seq[Seq[Double]] =
    loadCentroidsFromRoot(s,
      IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir))

  private[graft] def loadCentroidsFromRoot(s: SparkSession, root: String): Seq[Seq[Double]] =
    s.read.parquet(s"$root/centroids").collect()
      .groupBy(_.getAs[Int]("cell")).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("value")).toSeq
      }

  // ---- recall-drift probe (r15): constants + the pure measurement ----
  // Sample cap: what the TakeOrdered collects to the driver per append.
  private[graft] val recallSampleSize = 512
  // Below this the estimate is noise — the probe writes nothing and the
  // advise rule simply has no fresher data point.
  private[graft] val recallMinSample = 64

  /** Sampled self-recall of a batch under the FROZEN quantizer — the
    * drift signal for the retrain cadence. Both searches run over the
    * SAME sample, so the measurement is a pure function of (batch
    * distribution, quantizer): truth = exact cosine top-k within the
    * sample; IVF answer = the same top-k restricted to sample rows
    * whose frozen cell is among the query's nprobe nearest cells, at a
    * FIXED visit fraction (nprobe = max(1, nlist/8)) so the number is
    * comparable across appends and across index sizes. k = the expected
    * CELL OCCUPANCY of the sample (|sample|/nlist): the question the
    * probe answers is "is a full cell's worth of neighborhood findable
    * at the fixed visit fraction" — the VectorIndexSpec drift
    * construction shows quantizer damage lands in the mates across a
    * cell boundary, not the handful of co-jittered nearest, so a small
    * fixed k (or k at half occupancy — measured 0.86 on the planted
    * drift) under-reads the damage. A batch that matches the quantizer
    * (each natural cluster inside one cell) scores ~1.0;
    * boundary-straddling drift (the retrain fixture) scores ~0.5.
    * Pure driver math, O(S x R x dim) with S <= 32, R <= 512. */
  private[graft] def selfRecall(vecs: Array[Array[Double]],
                                centroids: Seq[Seq[Double]]): Option[Double] = {
    if (vecs.length < recallMinSample || centroids.isEmpty) return None
    val nlist = centroids.size
    val nprobe = math.max(1, nlist / 8)
    val k = math.max(1, vecs.length / nlist)
    val cents = centroids.map(_.toArray).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val cnorm = cents.map(c => math.sqrt(dot(c, c)))
    val vnorm = vecs.map(v => math.sqrt(dot(v, v)))
    def cellScore(v: Int, c: Int): Double =
      if (cnorm(c) > 0 && vnorm(v) > 0) dot(vecs(v), cents(c)) / (cnorm(c) * vnorm(v))
      else 0.0
    // frozen-quantizer assignment: max cosine, FIRST-max tie-break —
    // the same rule as Similarity.nearestCentroid
    val cell = Array.tabulate(vecs.length) { i =>
      var best = 0; var bestS = Double.NegativeInfinity
      var c = 0
      while (c < nlist) {
        val sc = cellScore(i, c)
        if (sc > bestS) { bestS = sc; best = c }
        c += 1
      }
      best
    }
    val nq = math.min(32, vecs.length)
    val perQuery = (0 until nq).map { q =>
      val sims = (0 until vecs.length).iterator.filter(_ != q).map { j =>
        val d = vnorm(q) * vnorm(j)
        (if (d > 0) dot(vecs(q), vecs(j)) / d else 0.0, j)
      }.toIndexedSeq
      val truth = sims.sortBy { case (s, j) => (-s, j) }.take(k).map(_._2).toSet
      val visitedCells = (0 until nlist)
        .map(c => (-cellScore(q, c), c)).sorted.take(nprobe).map(_._2).toSet
      val got = sims.filter { case (_, j) => visitedCells(cell(j)) }
        .sortBy { case (s, j) => (-s, j) }.take(k).map(_._2).toSet
      (truth & got).size.toDouble / k
    }
    Some(perQuery.sum / nq)
  }

  /** Persist one probe reading under `<indexDir>/recall/` (top level,
    * outside the data generations, like the replay state): file name =
    * zero-padded sequence + tag (appends are serialized by the write
    * lease, so the count-derived sequence is race-free and the listing
    * order IS the append order), content = "recall n". Replays of the
    * same (tag, delta) re-measure — harmless, it is a measurement of
    * the same distribution under the same quantizer. */
  private def writeRecallProbe(conf: org.apache.hadoop.conf.Configuration,
                               indexDir: String, tag: String,
                               recall: Double, n: Int): Unit = {
    val d = new org.apache.hadoop.fs.Path(
      IndexMaintenance.normalize(indexDir) + "/recall")
    val fs = d.getFileSystem(conf)
    val seq =
      try fs.listStatus(d).length
      catch { case _: java.io.FileNotFoundException => 0 }
    val p = new org.apache.hadoop.fs.Path(d,
      f"$seq%06d_${Fingerprint.sanitizeTag(tag)}")
    val out = fs.create(p, true)
    try out.write(f"$recall%.4f $n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The persisted probe series in append order: (tag, recall). */
  def recallProbes(conf: org.apache.hadoop.conf.Configuration,
                   indexDir: String): Seq[(String, Double)] = {
    val d = new org.apache.hadoop.fs.Path(
      IndexMaintenance.normalize(indexDir) + "/recall")
    val fs = d.getFileSystem(conf)
    val files =
      try fs.listStatus(d).toSeq.sortBy(_.getPath.getName)
      catch { case _: java.io.FileNotFoundException => return Seq.empty }
    files.flatMap { st =>
      val in = fs.open(st.getPath)
      val body =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val tag = st.getPath.getName.dropWhile(_ != '_').drop(1)
      body.split(" ").headOption.flatMap(s =>
        scala.util.Try(s.toDouble).toOption).map(tag -> _)
    }
  }

  /** Drop the probe series — build()/retrain() reset it: the readings
    * describe the RETIRED quantizer, and a stale low reading would keep
    * advising a retrain that already happened. */
  private def clearRecallProbes(conf: org.apache.hadoop.conf.Configuration,
                                indexDir: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(
      IndexMaintenance.normalize(indexDir) + "/recall")
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true)
  }

  /** SemDeDup probe against the PERSISTED index: flag incoming vectors
    * whose cosine against any INDEXED vector in their own cell STRICTLY
    * exceeds `tau` (cosine == tau is kept; VectorIndexSpec pins the
    * boundary verdict across batch/probe/stream so the rule cannot
    * drift) — [[Similarity.semanticDedup]]'s decision rule with the
    * corpus side read partition-pruned from the index (the touched-cell
    * set is a bounded collect, the probe batch broadcasts). Returns one
    * row per flagged incoming vector: (inc_id, dup_of) with dup_of the
    * smallest same-cell witness. Same approximation contract as the
    * batch operator: a cross-cell duplicate is missed by design.
    *
    * `excludeTag` drops index rows whose ingest-provenance `_src` label
    * equals the given tag — the replay guard for probe-then-append loops
    * (see [[TextIndex.probe]]): a re-probed batch that was already
    * appended must not flag against its own indexed copies, while a
    * stable-id re-crawl appended by an EARLIER batch must still dedup. */
  def probeDups(s: SparkSession, indexDir: String, incoming: DataFrame,
                tau: Double, corpusId: String = "vec_id",
                corpusVec: String = "embedding",
                excludeTag: Option[String] = None): DataFrame = {
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val centroids = loadCentroidsFromRoot(s, root)
    val probed = incoming
      .withColumn("_cid", Similarity.nearestCentroid(col(corpusVec), centroids))
      .withColumn("_nrm", VectorOps.norm(col(corpusVec)))
      .select(col(corpusId).as("inc_id"), col(corpusVec).as("_ei"),
        col("_nrm").as("_ni"), col("_cid"))
    // bounded collect (<= nlist ints): static partition filter on cells
    val touched = probed.select(col("_cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // a mixed pre-_src index must expose the appended rows' provenance
    // (single-footer inference could hide it and silently disable the
    // replay guard) — but the mergeSchema pass reads every footer, so
    // it runs only when the cheap read lacks _src; see TextIndex.probe
    val plainCells = s.read.parquet(s"$root/cells")
    val cellsRead =
      (if (plainCells.columns.contains("_src")) plainCells
       else s.read.option("mergeSchema", "true").parquet(s"$root/cells"))
        .filter(col("cell").isInCollection(touched))
    // fully pre-provenance index: legacy rows are _src = null
    val cells0 =
      if (cellsRead.columns.contains("_src")) cellsRead
      else cellsRead.withColumn("_src", lit(null).cast("string"))
    // null-safe (ADVICE r9): pre-_src rows read _src = null; `=!=` would
    // evaluate NULL and silently drop them from the probe.
    // Logically-deleted vectors leave the reference side here (tombstone
    // anti-join — no-op fast path when no logical delete pends).
    val cells = LogicalDelete.hide(
      excludeTag.fold(cells0)(t =>
        cells0.filter(!(col("_src") <=> lit(t)))),
      corpusId, LogicalDelete.ids(s, indexDir))
    cells
      .select(col("cell"), col(corpusId).as("ref_id"),
        col(corpusVec).as("_er"), col("norm").as("_nr"))
      .join(broadcast(probed), col("cell") === probed("_cid"))
      .filter(VectorOps.dot(col("_ei"), col("_er"))
        > lit(tau) * col("_ni") * col("_nr"))
      .groupBy(col("inc_id")).agg(min(col("ref_id")).as("dup_of"))
  }

  /** Index-side targeted DELETE (VERDICT r10 item 1): drop `victims`
    * from their cells so [[probeDups]]/[[topK]] stop matching
    * right-to-be-forgotten vectors, and subtract their contribution from
    * the meta fingerprint so [[isFresh]] tracks the surviving corpus.
    * `victims` must carry the EXACT `(id, embedding)` rows as ingested
    * and every id must be indexed. The touched-cell set is recomputed
    * from the victim embeddings under the FROZEN quantizer (assignment
    * is deterministic), so the rewrite prunes to ≤ nlist cell
    * partitions and is independent of index state — replay-safe at any
    * crash boundary. The quantizer itself is untouched: cell centroids
    * describe geometry, not membership, and recall semantics are
    * unchanged by removals. */
  def remove(victims: DataFrame, indexDir: String,
             corpusId: String = "vec_id", corpusVec: String = "embedding",
             tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // polite pre-lease wait for healthy in-flight halves (ADVICE r17:
    // waiting INSIDE the lease can starve the half that needs it)
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val centroids = loadCentroidsFromRoot(s, root)
    val oldFp = readMeta(s, root)
    val rmTag = s"rm.$tag" // own namespace, see ClusterIndex.remove
    val vfp = Fingerprint.of(victims, Seq(corpusId, corpusVec))
    val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
    if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
      s"VectorIndex.remove: tag '$tag' was already used by a different " +
        "removal batch — pass a batch-unique tag")
    // cross-tag leftover state refusal, see ClusterIndex.remove
    Fingerprint.requireNoOtherPendingRemoval(
      conf, IndexMaintenance.normalize(indexDir), rmTag, "VectorIndex.remove",
      callerHoldsLease = true)
    // pending logical deletions must reclaim first — see [[LogicalDelete]]
    LogicalDelete.requireNonePending(conf, indexDir, "VectorIndex.remove")
    val pinned = victims
      .withColumn("cell", Similarity.nearestCentroid(col(corpusVec), centroids))
      .select(col(corpusId), col("cell")).distinct().localCheckpoint()
    val nV = pinned.select(col(corpusId)).distinct().count()
    if (nV > 0L) {
      val vCells = pinned.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by nlist
      val vids = pinned.select(col(corpusId)).distinct()
      if (!replay) {
        // ONE cells relation for both checks (r18 opt: repeated
        // spark.read.parquet re-resolves the file index), and the
        // known-check runs concurrently with the provenance guard
        // (guide §2.6; known-check's refusal wins a double failure)
        val cellsPruned = s.read.parquet(s"$root/cells")
          .filter(col("cell").isInCollection(vCells))
          .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(corpusId),
            "leftsemi")
          .localCheckpoint(eager = false) // shared by both legs
        IndexMaintenance.runLegs(Seq(
          "vector.validate.known" -> (() => {
            // content-set known-check (r14) — see TextIndex.remove;
            // this family stores the ingested embedding itself, so the
            // hashed equality is over EXACT float arrays, not token sets
            val vAgg = TargetedDelete.contentSet(victims, corpusId,
              xxhash64(col(corpusVec))).withColumnRenamed("_chs", "_vchs")
            val known = TargetedDelete.contentSet(cellsPruned,
                corpusId, xxhash64(col(corpusVec)))
              .join(TargetedDelete.maybeBroadcast(vAgg, nV), Seq(corpusId))
              .filter(col("_chs") === col("_vchs"))
              .count()
            if (known != nV) Fingerprint.refuse(
              s"VectorIndex.remove: only $known of $nV victim ids are " +
                "indexed with matching content (ALL stored versions of each " +
                "id); the fingerprint subtraction needs exactly the ingested " +
                "(id, embedding) rows")
          }),
          // mid-append crash guard (see TextIndex.remove): a victim row
          // from an append whose merge never recorded must not subtract
          "vector.validate.guard" -> (() =>
            if (oldFp.isDefined &&
                cellsPruned.schema.fieldNames.contains("_src")) {
              val vSrcs = cellsPruned
                .select(col("_src")).filter(col("_src").isNotNull) // pre-provenance rows = build-era
                .distinct().collect().map(_.getString(0)).toSet
              Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
                "VectorIndex.remove")
            })))
      }
      // idempotent fingerprint commit (ADVICE r11; r15: metabase-first +
      // interleaving-exact replay resolution — see Fingerprint
      // .resolveRemovalMeta)
      val normDir = IndexMaintenance.normalize(indexDir)
      Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
        oldFp, "VectorIndex.remove")
      Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
        "VectorIndex.remove").foreach(fp => writeMeta(s, root, fp))
      FaultInjection.maybeCrash("vector.meta")
      if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
      FaultInjection.maybeCrash("vector.record")
      TargetedDelete.delete(s, s"$root/cells", Seq("cell"), corpusId, vids,
        col("cell").isInCollection(vCells))
      Fingerprint.clearSourceStatus(conf, indexDir)
      // retired GC-grace generations hold the victims' rows too —
      // right-to-be-forgotten beats reader grace (see
      // IndexMaintenance.purgeRetired)
      IndexMaintenance.purgeRetired(conf, indexDir, Seq("cells", "centroids", "meta"))
      // state cleanup LAST — every step above replays from the record
      Fingerprint.clearRemoveState(conf, normDir, rmTag)
    }
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"VectorIndex.remove on $indexDir: index compacted during the " +
        "removal — re-run it after verifying no maintenance is racing")
    }
  }

  /** LOGICAL targeted delete (VERDICT r12 item 1) — the RTBF fast path:
    * same validation and the same idempotent fingerprint subtraction as
    * [[remove]], but the only mutation is one small tombstone-batch
    * write under `<indexDir>/deleted/` — O(victims), no cell rewrite.
    * [[topK]] and [[probeDups]] are blind to the victims the moment
    * this returns; the rows are physically reclaimed by the next
    * [[compact]] (see [[LogicalDelete]] — tombstoned ids are dead to
    * appends until then). `victims` must carry the EXACT
    * `(id, embedding)` rows as ingested; tags share the remove
    * namespace. */
  def logicalRemove(victims: DataFrame, indexDir: String,
                    corpusId: String = "vec_id",
                    corpusVec: String = "embedding",
                    tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val centroids = loadCentroidsFromRoot(s, root)
    val oldFp = readMeta(s, root)
    val rmTag = s"rm.$tag"
    val vfp = Fingerprint.of(victims, Seq(corpusId, corpusVec))
    val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
    if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
      s"VectorIndex.logicalRemove: tag '$tag' was already used by a " +
        "different removal batch — pass a batch-unique tag")
    val normDir = IndexMaintenance.normalize(indexDir)
    Fingerprint.requireNoOtherPendingRemoval(
      conf, normDir, rmTag, "VectorIndex.logicalRemove",
      callerHoldsLease = true)
    val pinned = victims
      .withColumn("cell", Similarity.nearestCentroid(col(corpusVec), centroids))
      .select(col(corpusId), col("cell")).distinct().localCheckpoint()
    val vids = pinned.select(col(corpusId)).distinct()
    val nV = vids.count()
    // applied record + no pending removal state ⟺ the prior run fully
    // completed; re-writing the tombstone would re-hide ids re-ingested
    // after a compact() reclaim (ADVICE r13) — no-op the replay
    val completedReplay = replay &&
      Fingerprint.readRemoveState(conf, normDir, rmTag).isEmpty
    if (nV > 0L && !completedReplay) {
      if (!replay) {
        LogicalDelete.requireNotTombstoned(s, indexDir, vids, corpusId,
          "VectorIndex.logicalRemove")
        val vCells = pinned.select(col("cell")).distinct()
          .collect().map(_.getInt(0)).toSeq // bounded by nlist
        // content-set (r14) — exact float arrays, see remove()
        val vAgg = TargetedDelete.contentSet(victims, corpusId,
          xxhash64(col(corpusVec))).withColumnRenamed("_chs", "_vchs")
        val known = TargetedDelete.contentSet(
            s.read.parquet(s"$root/cells")
              .filter(col("cell").isInCollection(vCells))
              .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(corpusId),
                "leftsemi"),
            corpusId, xxhash64(col(corpusVec)))
          .join(TargetedDelete.maybeBroadcast(vAgg, nV), Seq(corpusId))
          .filter(col("_chs") === col("_vchs"))
          .count()
        if (known != nV) Fingerprint.refuse(
          s"VectorIndex.logicalRemove: only $known of $nV victim ids are " +
            "indexed with matching content (ALL stored versions of each " +
            "id); the fingerprint subtraction needs exactly the ingested " +
            "(id, embedding) rows")
        // mid-append crash guard, same pruned provenance read as remove()
        if (oldFp.isDefined &&
            s.read.parquet(s"$root/cells").schema.fieldNames.contains("_src")) {
          val vSrcs = s.read.parquet(s"$root/cells")
            .filter(col("cell").isInCollection(vCells))
            .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(corpusId), "leftsemi")
            .select(col("_src")).filter(col("_src").isNotNull)
            .distinct().collect().map(_.getString(0)).toSet
          Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs,
            "VectorIndex.logicalRemove")
        }
      }
      // idempotent fingerprint commit — remove()'s protocol shape (r15:
      // metabase-first + interleaving-exact replay resolution)
      Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
        oldFp, "VectorIndex.logicalRemove")
      FaultInjection.maybeCrash("vector.logical.state")
      Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
        "VectorIndex.logicalRemove").foreach(fp => writeMeta(s, root, fp))
      FaultInjection.maybeCrash("vector.logical.meta")
      if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
      FaultInjection.maybeCrash("vector.logical.record")
      // the one "leg": the tombstone batch — reads blind from here
      LogicalDelete.write(vids, corpusId, normDir, rmTag)
      Fingerprint.clearSourceStatus(conf, indexDir)
      Fingerprint.clearRemoveState(conf, normDir, rmTag)
    }
    require(IndexMaintenance.liveRoot(conf, indexDir) == root,
      s"VectorIndex.logicalRemove on $indexDir: index compacted during " +
        "the removal — re-run it after verifying no maintenance is racing")
    }
  }

  /** RETRAIN the coarse quantizer over the CURRENT corpus of record and
    * re-partition every vector into the new cells (VERDICT r12 item 2)
    * — the maintenance verb for the one index family with a
    * distribution assumption. [[append]] deliberately freezes the
    * quantizer (retraining in-place would orphan every already-assigned
    * cell), so a corpus whose distribution drifts across many appends
    * degrades cell balance and recall; this verb restores both without
    * a source-corpus rebuild: the indexed rows themselves are the
    * training set and the re-assignment input (one table read — the
    * source corpus is never touched, so it works even when the original
    * build inputs are gone).
    *
    * Runs under the compact-class lease with the same staging +
    * generation-pointer cutover as [[compact]]: probes keep serving the
    * OLD generation until the flip (they hold no lease and resolve
    * [[IndexMaintenance.liveRoot]] at read time), a crash before the
    * flip leaves the old generation live and the staged tree inert, and
    * the replay-protection state (applied markers, tag fingerprints,
    * meta fingerprint) lives outside the data generations so
    * [[isFresh]] and the append replay guards survive the cutover
    * unchanged. Ingest-provenance `_src` is a DATA column in cells and
    * carries over verbatim. Pending tombstones ([[logicalRemove]])
    * are reclaimed here exactly as in [[compact]] — the retrain is a
    * full rewrite anyway, and training must not see deleted rows.
    *
    * `nlist` <= 0 keeps the current cell count; pass an explicit value
    * to re-size the quantizer with the corpus. */
  def retrain(s: SparkSession, indexDir0: String, nlist: Int = -1,
              iters: Int = 2, seed: Long = 42L,
              corpusId: String = "vec_id",
              corpusVec: String = "embedding"): Unit = {
    import s.implicits._
    val conf = s.sparkContext.hadoopConfiguration
    val indexDir = IndexMaintenance.normalize(indexDir0)
    val ctx = IndexMaintenance.beginCompact(conf, indexDir)
    // lease-time snapshot; the trailing cleanup clears exactly these
    // batches, never one a post-flip logicalRemove adds (r13 review)
    val reclaimBatches = LogicalDelete.pendingBatches(conf, indexDir)
    try {
      val tomb =
        LogicalDelete.idsOf(s, indexDir, reclaimBatches)
      val live = tomb.fold(
          s.read.option("mergeSchema", "true").parquet(s"${ctx.fromRoot}/cells"))(
          t => s.read.option("mergeSchema", "true").parquet(s"${ctx.fromRoot}/cells")
            .join(t, Seq(LogicalDelete.idColOf(t)), "left_anti"))
        .drop("cell", "norm") // re-derived below under the NEW quantizer
        .localCheckpoint() // one materialization feeds train + re-assign
      val k =
        if (nlist > 0) nlist
        else loadCentroidsFromRoot(s, ctx.fromRoot).size
      val centroids = Similarity.trainCentroids(live, k, iters, seed,
        corpusId, corpusVec)
      require(centroids.nonEmpty,
        "VectorIndex.retrain needs a non-empty indexed corpus")
      centroids.zipWithIndex
        .flatMap { case (c, cell) => c.zipWithIndex.map { case (v, pos) => (cell, pos, v) } }
        .toDF("cell", "pos", "value")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${ctx.stagingRoot}/centroids")
      live
        .withColumn("cell", Similarity.nearestCentroid(col(corpusVec), centroids))
        .withColumn("norm", VectorOps.norm(col(corpusVec)))
        .repartition(col("cell")) // one task per cell => one file per dir
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"${ctx.stagingRoot}/cells")
      IndexMaintenance.copyTable(s, ctx.fromRoot, ctx.stagingRoot, "meta")
    } catch {
      case t: Throwable => IndexMaintenance.abortCompact(conf, ctx); throw t
    }
    IndexMaintenance.finishCompact(conf, ctx,
      legacyTables = Seq("cells", "centroids", "meta"))
    if (reclaimBatches.nonEmpty) {
      IndexMaintenance.purgeRetired(conf, indexDir,
        Seq("cells", "centroids", "meta"))
      LogicalDelete.clearBatches(conf, indexDir, reclaimBatches)
    }
    // the probe series measured the RETIRED quantizer — a stale low
    // reading would keep advising the retrain that just happened
    clearRecallProbes(conf, indexDir)
  }

  /** Fold the accreted append files: rewrite `cells` as one file per
    * cell partition with pure I/O (no re-training, no re-assignment —
    * the quantizer and every vector's cell are unchanged). The
    * ingest-provenance `_src` values are a DATA column and carry over
    * verbatim, so probeDups' excludeTag replay guard keeps working;
    * centroids and meta copy unchanged; the replay-protection state
    * lives at the index top level, outside the data generations.
    * Tombstoned rows ([[logicalRemove]]) are RECLAIMED here: they ride
    * out on the rewrite the fold was doing anyway, retired generations
    * purge (RTBF beats reader grace), and the tombstone set clears
    * after the cutover. Cutover is a generation-pointer flip
    * (object-store safe, no renames) under the compact lease — see
    * [[IndexMaintenance]]. */
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
      val dropVictims: DataFrame => DataFrame = df => tomb.fold(df) { t =>
        // the id column name rides in the tombstone frame itself
        df.join(t, Seq(LogicalDelete.idColOf(t)), "left_anti")
      }
      // independent staged-table writes run concurrently (r13 — the
      // remove()-legs shape; see ClusterIndex.compact)
      IndexMaintenance.runLegs(Seq(
        "compact.cells" -> (() =>
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot, "cells",
            Seq("cell"), transform = dropVictims)),
        "compact.centroids" -> (() =>
          IndexMaintenance.copyTable(s, ctx.fromRoot, ctx.stagingRoot, "centroids")),
        "compact.meta" -> (() =>
          IndexMaintenance.copyTable(s, ctx.fromRoot, ctx.stagingRoot, "meta"))))
    } catch {
      case t: Throwable => IndexMaintenance.abortCompact(conf, ctx); throw t
    }
    IndexMaintenance.finishCompact(conf, ctx,
      legacyTables = Seq("cells", "centroids", "meta"))
    if (reclaimBatches.nonEmpty) {
      IndexMaintenance.purgeRetired(conf, indexDir,
        Seq("cells", "centroids", "meta"))
      LogicalDelete.clearBatches(conf, indexDir, reclaimBatches)
    }
  }

  /** ANN top-k against the PERSISTED index: identical semantics to
    * [[Similarity.ivfTopK]] at the same (nlist, iters, seed), but the
    * corpus-side work is a partition-pruned scan of the touched cells
    * with norms already materialized — no training, no assignment, no
    * corpus shuffle at query time. */
  def topK(s: SparkSession, indexDir: String, probes: DataFrame, k: Int,
           nprobe: Int = 8, corpusId: String = "vec_id",
           corpusVec: String = "embedding",
           probeId: String = "q_id", probeVec: String = "q_emb",
           excludeSelf: Boolean = false): DataFrame = {
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val centroids = loadCentroidsFromRoot(s, root)
    val probed = probes
      .select(col(probeId), col(probeVec),
        posexplode(CosineScores(col(probeVec), centroids)).as(Seq("_cid", "_score")))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(probeId)).orderBy(col("_score").desc, col("_cid"))))
      .filter(col("_rk") <= nprobe)
      .withColumn("_np", VectorOps.norm(col(probeVec)))
      .select(col(probeId), col(probeVec), col("_np"), col("_cid"))
    // bounded collect (<= nlist ints): the probe batch's touched cells,
    // turned into a STATIC partition filter so the file scan prunes
    val touched = probed.select(col("_cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = LogicalDelete.hide(
      s.read.parquet(s"$root/cells")
        .filter(col("cell").isInCollection(touched)),
      corpusId, LogicalDelete.ids(s, indexDir))
    val w = Window.partitionBy(col(probeId))
      .orderBy(col("cosine").desc, col(corpusId))
    val cand0 = cells
      .join(broadcast(probed), cells("cell") === probed("_cid"))
    // more-like-this: when probes share the corpus id space, the probe
    // doc is dropped BEFORE ranking so it never occupies a result slot
    val cand =
      if (excludeSelf) cand0.filter(col(corpusId) =!= col(probeId))
      else cand0
    cand
      .withColumn("cosine", round(
        VectorOps.dot(col(probeVec), col(corpusVec)) / (col("_np") * col("norm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(probeId), col("rn"), col(corpusId), col("cosine"))
  }
}
