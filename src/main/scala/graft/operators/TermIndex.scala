package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 retrieval index — the fourth index family: build the
  * tf/df/dl statistics ONCE, serve ranked lexical retrieval many times,
  * maintain incrementally. The closed-form scorer (`TextPipeline
  * .bm25TopK`, Robertson/Spärck Jones BM25 with the positive ln idf)
  * recomputes the whole fan-out per call; at corpus scale the tf pass
  * is the dominant cost and is exactly what never changes between
  * queries, so it belongs on disk with the same lifecycle as the other
  * three families (generations, leases, fingerprint freshness, logical
  * deletes, compaction).
  *
  * Layout under the live data root ([[IndexMaintenance.liveRoot]]):
  *  - `postings(id, term, tf)` partitioned by `(_src, tb)` where
  *    `tb = pmod(xxhash64(term), nBuckets)`: a term's postings all live
  *    in one bucket, so a query touches only its own terms' buckets —
  *    the bounded-collect static-partition-filter recipe the other
  *    families use (at 100 TB a 5-term query reads 5 buckets, never the
  *    corpus).
  *  - `dl(id, dl)` partitioned by `(_src, idb)` — per-document token
  *    counts, read at query time only for the CANDIDATE docs' buckets
  *    (a bounded collect of the candidates' idb values turns the join
  *    read into a static partition filter, like the postings read).
  *  - `meta(n_buckets, n_rows, content_hash, sum_dl)` — parameters, the
  *    corpus fingerprint, and the corpus token total. N (= `n_rows`,
  *    the fingerprint's own row count) and `sum_dl` give avgdl WITHOUT
  *    an O(corpus) dl aggregate per query batch — the last corpus-sized
  *    serve-path stage before r16. Both are additive, so they ride the
  *    fingerprint's exactly-once machinery VERBATIM: every meta write
  *    (append merge, removal subtraction) updates fingerprint and
  *    sum_dl in the SAME parquet file, so the two can never desync —
  *    any crash window that could drift sum_dl drifts the fingerprint
  *    identically and is flagged by the existing freshness check.
  *    Defense in depth: `topK` under `graft.term.checkStats=true`
  *    (Verify sets it) re-derives both from the stored dl rows and
  *    refuses on mismatch, so drift fails loudly in the oracle gate
  *    rather than silently mis-scoring.
  *
  * Writes are tag-scoped dynamic overwrites (the [[ClusterIndex]]
  * discipline, NOT the append-mode [[TextIndex]] one) because BM25
  * aggregates SUM over postings: a crash-replayed append-mode batch
  * would double every tf it carries — match-once probe semantics
  * tolerate duplicate rows, ranking sums do not. A replay rewrites its
  * own `_src` partitions byte-for-byte; a DIFFERENT delta under a used
  * tag refuses loudly.
  *
  * Ids must be UNIQUE across corpus and deltas (same contract as the
  * cluster family): two versions of one id would both score.
  *
  * RTBF: [[logicalRemove]] tombstones victims (queries blind
  * immediately — scores, df, N, and avgdl all reflect the survivors
  * from that moment) and [[compact]] reclaims physically on its own
  * cadence; [[remove]] (r17) is the "data must be GONE now" verb — the
  * same bucket-pruned partition rewrites as the siblings, so a BM25
  * index honors the strict-SLA takedown without waiting for the next
  * compaction. All four families now carry both verbs.
  *
  * Because topK serves (N, avgdl) FROM meta, both removal verbs order
  * their mutations rows-first: the tombstone write (logical) / the
  * postings+dl deletes (physical) land BEFORE the meta subtraction, so
  * served stats never LEAD the served rows (ADVICE r16) — a crash in
  * between leaves victims already invisible with slightly-stale
  * survivor stats (the conservative direction; `checkStats` refuses
  * that window loudly until the removal replays), never victims still
  * returnable under survivor-exact stats.
  *
  * Writers hold the EXCLUSIVE `xwrite` lease, not the shared `write`
  * one (ADVICE r16): concurrent tag-scoped appends never collide on
  * partitions, but both would read meta at entry and commit
  * merge(entry-meta, own-delta) — the later commit silently dropping
  * the earlier delta's (n_rows, sum_dl). For the one family that
  * SERVES stats from meta, lost updates are mis-scoring, so same-index
  * writes serialize (the loser gets the retryable lease conflict).
  */
object TermIndex {

  private def sanitize(tag: String): String = Fingerprint.sanitizeTag(tag)

  private def tb(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong))
  private def idb(id: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(id), lit(nBuckets.toLong))

  /** Per-(doc, term) counts + per-doc lengths for one corpus slice. */
  private def stats(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = graft.functions.TextOps.tokens(col(textCol))
    val tf = docs
      .select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol), size(toks).cast("long").as("dl"))
    (tf, dl)
  }

  private def writeSlice(tf: DataFrame, dl: DataFrame, idCol: String,
                         root: String, src: String, nBuckets: Int,
                         dynamic: Boolean): Unit = {
    def w(df: DataFrame, parts: Seq[String], path: String): Unit = {
      val base = df.write.mode("overwrite")
      (if (dynamic) base.option("partitionOverwriteMode", "dynamic") else base)
        .partitionBy(parts: _*).parquet(path)
    }
    w(tf.withColumn("_src", lit(src)).withColumn("tb", tb(col("term"), nBuckets)),
      Seq("_src", "tb"), s"$root/postings")
    w(dl.withColumn("_src", lit(src)).withColumn("idb", idb(col(idCol), nBuckets)),
      Seq("_src", "idb"), s"$root/dl")
  }

  private def writeMeta(s: SparkSession, root: String, nBuckets: Int,
                        fp: (Long, Long), sumDl: Option[Long]): Unit = {
    import s.implicits._
    val base = Seq((nBuckets, fp._1, fp._2))
      .toDF("n_buckets", "n_rows", "content_hash")
    sumDl.fold(base)(sd => base.withColumn("sum_dl", lit(sd)))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/meta")
  }

  /** Token total of a dl slice — one column-pruned aggregate. The write
    * sites pass the slice ALREADY ON DISK (build: the whole table;
    * append: the tag's own `_src` partition) so the number always
    * describes the rows of record, never a re-tokenize that could
    * diverge from them. */
  private def sumDlOf(dl: DataFrame): Long =
    dl.agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)

  /** One corpus pass: tokenize, aggregate tf + dl, persist both tables
    * and the fingerprinted meta row. Static overwrite — a rebuild
    * replaces every generation and drops the old replay bookkeeping. */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
            nBuckets: Int = 64): Unit = {
    val s = docs.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // a rebuild during a pending removal would wipe the replay state its
    // windows depend on (same rule as the cluster family)
    Fingerprint.requireNoOtherPendingRemoval(conf,
      IndexMaintenance.normalize(indexDir), rmTag = "", "TermIndex.build")
    IndexMaintenance.withLease(conf, indexDir, "xwrite") {
      val root = IndexMaintenance.liveRoot(conf, indexDir)
      val (tf, dl) = stats(docs, idCol, textCol)
      writeSlice(tf, dl, idCol, root, src = "build", nBuckets, dynamic = false)
      val fp = Fingerprint.of(docs, Seq(idCol, textCol))
      writeMeta(s, root, nBuckets, fp,
        Some(sumDlOf(s.read.parquet(s"$root/dl"))))
      Fingerprint.clearReplayState(conf, indexDir)
      LogicalDelete.clear(conf, indexDir)
      Fingerprint.writeSourceStatus(conf, indexDir, Fingerprint.sourceStatus(docs))
    }
  }

  private def readMeta(s: SparkSession, root: String)
      : (Int, Option[(Long, Long)], Option[Long]) = {
    val m = s.read.parquet(s"$root/meta").head()
    (m.getAs[Int]("n_buckets"),
      if (m.schema.fieldNames.contains("n_rows"))
        Some((m.getAs[Long]("n_rows"), m.getAs[Long]("content_hash")))
      else None,
      // pre-r16 index without the stats column: serve falls back to the
      // dl aggregate until the next rebuild refreshes meta
      if (m.schema.fieldNames.contains("sum_dl"))
        Some(m.getAs[Long]("sum_dl"))
      else None)
  }

  /** Fingerprint freshness, same contract as the siblings. */
  def isFresh(s: SparkSession, indexDir: String, corpus: DataFrame,
              idCol: String, textCol: String): Boolean =
    Fingerprint.statusFresh(indexDir, corpus) ||
      (try readMeta(s, IndexMaintenance
          .liveRoot(s.sparkContext.hadoopConfiguration, indexDir))._2
        catch { case _: Exception => None })
        .contains(Fingerprint.of(corpus, Seq(idCol, textCol)))

  /** Build-once/serve-many entry: (re)build only when absent or stale. */
  def ensure(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
             nBuckets: Int = 64): Unit = {
    val s = docs.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val success = new org.apache.hadoop.fs.Path(s"$root/postings/_SUCCESS")
    val fs = success.getFileSystem(conf)
    // a pre-r16 meta without sum_dl serves through the O(corpus)
    // fallback — schema-upgrade it by rebuild even when content-fresh
    def statsLess = (try readMeta(s, root)._3 catch {
      case _: Exception => None
    }).isEmpty
    if (!fs.exists(success) || statsLess ||
        !isFresh(s, indexDir, docs, idCol, textCol))
      build(docs, idCol, textCol, indexDir, nBuckets)
  }

  /** Ranked retrieval against the persisted statistics: BM25 with the
    * positive-idf ln form, k1/b at query time (they tune, they don't
    * index). `queries(queryIdCol, queryTextCol)` is expected to be
    * small (a query batch); its terms' buckets are collected ONCE
    * (bounded: <= nBuckets longs) and turn both postings reads into
    * static partition filters. Returns (queryIdCol, rank, <doc id col>,
    * score) with the identical decimal accumulation + rounding as the
    * closed-form `TextPipeline.bm25TopK`, so index-vs-recompute is
    * value-exact, not approximately equal. Pending logical deletes are
    * anti-joined out of the postings and the dl join, and N/avgdl come
    * from meta (subtracted at logicalRemove commit) — the RTBF contract
    * holds from the moment logicalRemove returns.
    *
    * `excludeSelf = true` serves more-like-this retrieval: when the
    * query ids share the doc id space (the query IS an indexed doc),
    * the doc itself is dropped BEFORE ranking so it never occupies a
    * result slot. */
  def topK(s: SparkSession, indexDir: String, queries: DataFrame,
           queryIdCol: String = "query_id", queryTextCol: String = "q",
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
           excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conf = s.sparkContext.hadoopConfiguration
    val root = IndexMaintenance.liveRoot(conf, indexDir)
    val (nBuckets, metaFp, metaSumDl) = readMeta(s, root)
    val postingsAll = s.read.parquet(s"$root/postings")
    val idCol = postingsAll.columns
      .filterNot(Set("term", "tf", "_src", "tb")).head
    val tomb = LogicalDelete.ids(s, indexDir)
    def hide(df: DataFrame) = LogicalDelete.hide(df, idCol, tomb)

    // ONE job for the whole query side (VERDICT r16 item 5 — the serve
    // floor): the (query_id, term) pairs were driver-bound anyway (every
    // consumer below broadcast()s them), so collecting them once — WITH
    // their term buckets in the same rows — replaces the former
    // localCheckpoint job + separate bucket-collect job, and the joins
    // below consume a driver-local relation with no re-scan. Still
    // bounded by the query batch's vocabulary, never the corpus.
    val qtPlan = queries
      .select(col(queryIdCol),
        explode(graft.functions.TextOps.tokens(col(queryTextCol))).as("term"))
      .distinct()
    val qtRows = qtPlan.withColumn("_tb", tb(col("term"), nBuckets)).collect()
    val touchedTb = qtRows.map(_.getLong(2)).distinct.toSeq
    val qterms = s.createDataFrame(
      java.util.Arrays.asList(qtRows.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1))): _*),
      qtPlan.schema)
    val tfQ = hide(postingsAll
        .filter(col("tb").isin(touchedTb: _*))
        .join(broadcast(qterms.select(col("term")).distinct()), Seq("term")))
      .select(col(idCol), col("term"), col("tf"))
      // lazy: the idb collect right below is the materializing action,
      // so the checkpoint costs no extra job (df + score join reuse it)
      .localCheckpoint(eager = false)
    val dfreq = tfQ.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // second bounded collect (<= nBuckets longs): the CANDIDATE docs'
    // idb values turn the per-doc dl join read into a static partition
    // filter too — with the meta stats below, no read in this serve
    // path touches more than the query's own buckets
    val touchedIdb = tfQ.select(idb(col(idCol), nBuckets).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val dlCand = hide(s.read.parquet(s"$root/dl")
        .filter(col("idb").isin(touchedIdb: _*)))
      .select(col(idCol), col("dl"))
    // N and avgdl come from meta — maintained survivor-exact by every
    // append/logicalRemove under the fingerprint protocol (class doc) —
    // NOT from an O(corpus) dl aggregate per query batch. Reproduces
    // the legacy expression's exact IEEE arithmetic: long sum cast to
    // double, divided by the long count promoted to double.
    val metaStats = for { fp <- metaFp; sd <- metaSumDl }
      yield (fp._1.toDouble, sd.toDouble / fp._1.toDouble)
    if (metaStats.isDefined &&
        s.conf.getOption("graft.term.checkStats").exists(_.toBoolean)) {
      // drift tripwire (Verify sets this): re-derive both stats from the
      // stored rows of record and refuse on ANY disagreement with meta
      val r = hide(s.read.parquet(s"$root/dl")).agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sd")).head()
      require(r.getLong(0) == metaFp.get._1 && r.getLong(1) == metaSumDl.get,
        s"TermIndex.topK on $indexDir: meta corpus stats (n=${metaFp.get._1}, " +
          s"sum_dl=${metaSumDl.get}) disagree with the stored dl rows " +
          s"(n=${r.getLong(0)}, sum_dl=${r.getLong(1)}) — the incremental " +
          "maintenance drifted; rebuild the index and report the lifecycle " +
          "sequence that led here")
    }
    val joined0 = tfQ
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dlCand, Seq(idCol))
    val joined =
      if (excludeSelf) joined0.filter(col(idCol) =!= col(queryIdCol))
      else joined0
    metaStats.fold {
      // pre-r16 meta without sum_dl: the legacy full-table aggregate
      val dlAll = hide(s.read.parquet(s"$root/dl"))
        .select(col(idCol), col("dl"))
      val corpusStats = dlAll.agg(count(lit(1)).cast("double").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      joined.crossJoin(broadcast(corpusStats))
    } { case (n, avgdl) =>
      joined.withColumn("n", lit(n)).withColumn("avgdl", lit(avgdl))
    }
      .groupBy(col(queryIdCol), col(idCol))
      // the ONE shared scorer — doc_bm25_index_topk == doc_bm25_topk is
      // a value-exact contract, see graft.functions.Bm25
      .agg(graft.functions.Bm25.score(graft.functions.Bm25.weight(k1, b))
        .as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("score").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("score"))
  }

  /** Which of `ids` are already indexed (streaming first-write-wins
    * filter — the unique-id contract means a stable-id re-crawl must
    * not re-enter): pruned dl read, logically-deleted ids NOT known.
    * `excludeTag` keeps a crashed append's own rows from masking its
    * replay, like the cluster sibling. */
  def knownIds(s: SparkSession, indexDir: String, ids: DataFrame,
               idCol: String, excludeTag: Option[String] = None): DataFrame = {
    val root = IndexMaintenance.liveRoot(s.sparkContext.hadoopConfiguration, indexDir)
    val (nBuckets, _, _) = readMeta(s, root)
    val pinned = ids.select(col(idCol)).distinct().localCheckpoint()
    val touched = pinned.select(idb(col(idCol), nBuckets).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val dlAll = s.read.parquet(s"$root/dl").filter(col("idb").isin(touched: _*))
    val dl = excludeTag.fold(dlAll)(tg =>
      dlAll.filter(col("_src") =!= lit(sanitize(tg))))
    LogicalDelete.hide(
      dl.join(broadcast(pinned), Seq(idCol), "leftsemi").select(col(idCol)),
      idCol, LogicalDelete.ids(s, indexDir))
  }

  /** O(|delta|) maintenance — `tag` must be BATCH-UNIQUE: writes are
    * tag-scoped dynamic overwrites (see the class doc for why this
    * family cannot be append-mode), the fingerprint merges once per
    * (tag, delta) pair, and a crash-replay rewrites its own partitions
    * exactly-once. Post-condition (TermIndexSpec): topK == a fresh
    * build over the union corpus. */
  def append(delta: DataFrame, idCol: String, textCol: String,
             indexDir: String, tag: String = "append"): Unit = {
    val s = delta.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // xwrite (ADVICE r16): same-index appends must serialize — see the
    // class doc; the meta commit below reads (oldFp, oldSumDl) from the
    // lease entry, which only stays current while no sibling writer runs
    IndexMaintenance.withLease(conf, indexDir, "xwrite") {
      val root = IndexMaintenance.liveRoot(conf, indexDir)
      val (nBuckets, oldFp, oldSumDl) = readMeta(s, root)
      require(sanitize(tag) != "build",
        s"TermIndex.append: tag '$tag' sanitizes to the reserved build " +
          "generation name 'build' — its tag-scoped overwrite would " +
          "destroy build rows; pass a batch-unique tag")
      val dfp = Fingerprint.of(delta, Seq(idCol, textCol))
      val replay = Fingerprint.wasApplied(conf, indexDir, tag, dfp)
      require(replay || !Fingerprint.tagUsed(conf, indexDir, tag),
        s"TermIndex.append: tag '$tag' was already used by a different " +
          "batch; appends are tag-scoped dynamic overwrites, so reusing " +
          "a tag would destroy the earlier batch's rows — pass a " +
          "batch-unique tag")
      LogicalDelete.requireNotTombstoned(s, indexDir,
        delta.select(col(idCol)), idCol, "TermIndex.append")
      val apTag = s"ap.${sanitize(tag)}"
      // rmstate paths resolve through the normalized dir, the same
      // convention as logicalRemove's state calls
      val normDir = IndexMaintenance.normalize(indexDir)
      // leftover commit state for a DIFFERENT delta refuses BEFORE any
      // write: the tag-scoped writeSlice below would overwrite the
      // crashed batch's staged partitions with the wrong batch's rows
      // (spec-caught — the in-block check alone ran one write too late)
      Fingerprint.readRemoveState(conf, normDir, apTag).foreach {
        case (sdfp, _) =>
          if (sdfp != dfp)
            Fingerprint.refuse(
              s"TermIndex.append: tag '$tag' has leftover append-commit " +
                "state for a DIFFERENT batch (a crashed append under it " +
                "never completed) — re-run that append with its original " +
                "delta first")
      }
      val (tf, dl) = stats(delta, idCol, textCol)
      writeSlice(tf, dl, idCol, root, src = sanitize(tag), nBuckets,
        dynamic = true)
      oldFp.foreach { o =>
        val statePends =
          Fingerprint.readRemoveState(conf, normDir, apTag).isDefined
        if (Fingerprint.shouldMerge(conf, indexDir, tag, dfp) || statePends) {
          // IDEMPOTENT meta commit (r16 review): the plain
          // write-then-record ordering left a crash window where the
          // replay merged the delta twice — tolerable when meta carried
          // only the fingerprint (drift => spurious rebuild at the next
          // ensure), SILENT mis-scoring now that topK serves (n_rows,
          // sum_dl) from meta. The removal-commit machinery is reused
          // with merge as the target op: state persists BEFORE the
          // write, the write derives from persisted state under the
          // interleaved-append addend rule, record + cleanup follow —
          // every crash boundary replays to the same meta. sum_dl rides
          // the same atomic write, its delta read off the tag's OWN
          // just-written `_src` partition (pruned, O(delta), replay-
          // stable: the dynamic overwrite rewrites it byte-for-byte).
          Fingerprint.ensureAppendState(conf, normDir, apTag, dfp, o,
            "TermIndex.append")
          FaultInjection.maybeCrash("term.append.state")
          Fingerprint.resolveRemovalMeta(conf, normDir, apTag, oldFp,
            "TermIndex.append").foreach { fp =>
            writeMeta(s, root, nBuckets, fp, oldSumDl.map(_ + sumDlOf(
              s.read.parquet(s"$root/dl")
                .filter(col("_src") === lit(sanitize(tag))))))
          }
          FaultInjection.maybeCrash("term.append.meta")
          Fingerprint.recordMerge(conf, indexDir, tag, dfp)
          FaultInjection.maybeCrash("term.append.record")
          Fingerprint.clearRemoveState(conf, normDir, apTag)
        }
      }
      Fingerprint.clearSourceStatus(conf, indexDir)
      require(IndexMaintenance.liveRoot(conf, indexDir) == root,
        s"TermIndex.append on $indexDir: index compacted during the " +
          "append — re-run it after verifying no maintenance is racing")
    }
  }

  /** The victims' recomputed (tf, dl) under the frozen tokenizer, plus
    * their term/id bucket lists — a PURE function of the victims
    * argument, so the removal verbs need no persisted bucket plan: a
    * crash-replay recomputes the identical prune from the same rows
    * (unlike [[TextIndex.remove]], whose buckets derive from the stored
    * toks table and must ride the rmstate dir). */
  private def victimStats(victims: DataFrame, idCol: String, textCol: String,
                          vids: DataFrame, nBuckets: Int)
      : (DataFrame, DataFrame, Seq[Long], Seq[Long]) = {
    val (vtf0, vdl) = stats(victims, idCol, textCol)
    val vtf = vtf0.localCheckpoint() // bucket collect + signature/meta reuse
    val vTb = vtf.select(tb(col("term"), nBuckets).as("tb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val vIdb = vids.select(idb(col(idCol), nBuckets).as("idb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    (vtf, vdl, vTb, vIdb)
  }

  /** First-attempt victim validation shared by both removal verbs:
    * content known-check (the victims' recomputed per-id postings
    * signature must equal the stored rows' — the fingerprint
    * subtraction needs exactly the ingested content; unique-id family:
    * one signature per id, the whole (term, tf) profile) and the
    * mid-append-crash provenance guard. The stored postings read prunes
    * to the VICTIMS' term buckets (bounded collect, the topK recipe) —
    * never the corpus. The prune could hide stored-only terms, so
    * totality is pinned by the dl equality: pruned-profile match +
    * equal token counts => full-profile match (a stored term outside
    * the pruned buckets would make the stored dl strictly larger) —
    * the same argument that makes the physical verb's tb-pruned
    * postings delete exact. */
  private def validateVictims(s: SparkSession, root: String, indexDir: String,
                              victims: DataFrame, vids: DataFrame, nV: Long,
                              idCol: String, vtf: DataFrame, vdl: DataFrame,
                              vTb: Seq[Long], vIdb: Seq[Long],
                              opName: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    def profile(tf: DataFrame): DataFrame = tf
      .groupBy(col(idCol))
      .agg(xxhash64(sort_array(collect_list(struct(col("term"),
        col("tf"))))).as("_sig"))
    val vSig = profile(vtf)
      .withColumnRenamed("_sig", "_vsig")
      .join(vdl.select(col(idCol), col("dl").as("_vdl")), Seq(idCol))
    val storedDl = s.read.parquet(s"$root/dl")
      .filter(col("idb").isin(vIdb: _*))
      .join(TargetedDelete.maybeBroadcast(vids, nV), Seq(idCol), "leftsemi")
      .localCheckpoint() // signature join + provenance collect
    val storedSig = profile(
      s.read.parquet(s"$root/postings")
        .filter(col("tb").isin(vTb: _*))
        .join(TargetedDelete.maybeBroadcast(
          storedDl.select(col(idCol)), nV), Seq(idCol), "leftsemi")
        .select(col(idCol), col("term"), col("tf")))
    // the signature-equality count and the provenance guard both read
    // only the already-checkpointed storedDl (plus the pruned postings)
    // and share no other state — run them concurrently (r18 opt, guide
    // §2.6; the known-check's refusal is rethrown first on a double
    // failure, preserving message order)
    IndexMaintenance.runLegs(Seq(
      "term.validate.known" -> (() => {
        val known = storedSig
          .join(storedDl.select(col(idCol), col("dl")), Seq(idCol))
          .join(TargetedDelete.maybeBroadcast(vSig, nV), Seq(idCol))
          .filter(col("_sig") === col("_vsig") && col("dl") === col("_vdl"))
          .count()
        if (known != nV) Fingerprint.refuse(
          s"$opName: only $known of $nV victim ids are " +
            "indexed with matching content; the fingerprint subtraction " +
            "needs exactly the ingested (id, text) rows")
      }),
      // mid-append crash guard: victims' ingest provenance must have
      // recorded its merge, or the subtraction would remove a
      // fingerprint that was never added
      "term.validate.guard" -> (() => {
        val vSrcs = storedDl.select(col("_src"))
          .filter(col("_src").isNotNull)
          .distinct().collect().map(_.getString(0)).toSet
        Fingerprint.requireRecordedProvenance(conf, indexDir, vSrcs, opName)
      })))
  }

  /** LOGICAL targeted delete — the RTBF fast path: the same validation +
    * idempotent fingerprint subtraction protocol as the siblings, one
    * tombstone-batch write, physical reclaim at the next [[compact]]
    * (or [[remove]] for a strict "gone now" SLA). Queries are blind —
    * and their df/N/avgdl statistics survivor-exact — the moment this
    * returns. `victims` must carry the EXACT `(id, text)` rows as
    * ingested.
    *
    * Mutation order is TOMBSTONE-then-meta (ADVICE r16, inverted from
    * the siblings on purpose): this family serves N/avgdl from meta, so
    * the meta-first order had a crash window where topK scored
    * still-visible victim rows under survivor-exact stats. Tombstone
    * first, a crash in between leaves victims invisible with stale
    * (victim-inclusive) stats — conservative, and loudly refused by the
    * `checkStats` tripwire until the removal replays. A crash-resumed
    * replay (removal state present for the SAME victim fingerprint)
    * skips the validation — its first attempt already passed it against
    * pristine tables, and the tombstone it wrote would now fail
    * requireNotTombstoned. */
  def logicalRemove(victims: DataFrame, idCol: String, textCol: String,
                    indexDir: String, tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    // polite pre-lease wait for healthy in-flight halves (ADVICE r17)
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
      val root = IndexMaintenance.liveRoot(conf, indexDir)
      val (nBuckets, oldFp, oldSumDl) = readMeta(s, root)
      val rmTag = s"rm.$tag"
      val vfp = Fingerprint.of(victims, Seq(idCol, textCol))
      val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
      if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
        s"TermIndex.logicalRemove: tag '$tag' was already used by a " +
          "different removal batch — pass a batch-unique tag")
      val normDir = IndexMaintenance.normalize(indexDir)
      Fingerprint.requireNoOtherPendingRemoval(
        conf, normDir, rmTag, "TermIndex.logicalRemove",
        callerHoldsLease = true)
      val vids = victims.select(col(idCol)).distinct().localCheckpoint()
      val nV = vids.count()
      // completed-replay no-op (ADVICE r13): the tombstone must not be
      // rewritten after a reclaim legitimately re-admitted the id
      val state0 = Fingerprint.readRemoveState(conf, normDir, rmTag)
      val completedReplay = replay && state0.isEmpty
      // crash-resumed first attempt: state pends for THESE victims but
      // recordMerge never ran (a crash before the record point); the
      // tombstone may already be written, so validation must not re-run
      val resumed = state0.exists(_._1 == vfp)
      if (nV > 0L && !completedReplay) {
        val (vtf, vdl, vTb, vIdb) =
          victimStats(victims, idCol, textCol, vids, nBuckets)
        if (!replay && !resumed) {
          LogicalDelete.requireNotTombstoned(s, indexDir, vids, idCol,
            "TermIndex.logicalRemove")
          validateVictims(s, root, indexDir, victims, vids, nV, idCol,
            vtf, vdl, vTb, vIdb, "TermIndex.logicalRemove")
        }
        Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
          oldFp, "TermIndex.logicalRemove")
        FaultInjection.maybeCrash("term.logical.state")
        // ROWS FIRST (class doc): queries are blind from this write on,
        // while meta still carries the victims until the write below —
        // stats may lag the rows across a crash here, never lead them
        LogicalDelete.write(vids, idCol, normDir, rmTag)
        FaultInjection.maybeCrash("term.logical.tombstone")
        Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
          "TermIndex.logicalRemove").foreach { fp =>
          // sum_dl subtraction rides the SAME atomic meta write the
          // resolver just gated: when the fingerprint is on the
          // pre-subtraction side (Some), so is sum_dl (one file), so
          // "current minus victims" is exact under crash replay AND
          // under appends interleaved mid-removal (their sum_dl merges
          // arrived through the same meta writes the resolver's addend
          // accounts for). Victims' token total is recomputed from the
          // given (id, text) rows — validated content-equal to the
          // stored rows on the first attempt — O(victims).
          writeMeta(s, root, nBuckets, fp, oldSumDl.map(_ - sumDlOf(vdl)))
        }
        FaultInjection.maybeCrash("term.logical.meta")
        if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
        FaultInjection.maybeCrash("term.logical.record")
        Fingerprint.clearSourceStatus(conf, indexDir)
        Fingerprint.clearRemoveState(conf, normDir, rmTag)
      }
      require(IndexMaintenance.liveRoot(conf, indexDir) == root,
        s"TermIndex.logicalRemove on $indexDir: index compacted during " +
          "the removal — re-run it after verifying no maintenance is racing")
    }
  }

  /** PHYSICAL targeted delete (VERDICT r16 item 1 — the family's last
    * verb asymmetry): the victims' rows leave `postings` and `dl` ON
    * DISK before this returns, for the "data must be GONE" RTBF SLA
    * that [[logicalRemove]]+[[compact]] only bounds by the compaction
    * cadence. Protocol = the [[TextIndex.remove]] shape (validation →
    * idempotent state/meta commit → pruned parallel partition rewrites
    * → retired-generation purge → state cleanup LAST), with two
    * term-family twists:
    *
    *  - NO persisted bucket plan: the postings prune (victims' term
    *    buckets) recomputes from the victims' own (id, text) under the
    *    frozen tokenizer — replay-stable by construction — where
    *    TextIndex must persist `vhb` because its prune derives from the
    *    stored toks table that a parallel leg deletes. The prune is
    *    EXACT by the validateVictims dl-equality totality argument.
    *  - ROWS-first ordering (class doc): the deletes run BEFORE the
    *    meta subtraction, so served stats never lead the served rows —
    *    a mid-removal crash leaves victims already gone with stale
    *    victim-inclusive stats, refused loudly under `checkStats`.
    *
    * `victims` must carry the EXACT `(id, text)` rows as ingested, all
    * ids indexed (checked before anything mutates); pending logical
    * deletions must reclaim first (their meta subtraction already
    * landed — re-subtracting here would drift it). Tag shares the
    * remove namespace. Post-conditions (TermIndexSpec): topK == a fresh
    * build on the survivors value-exact, victim rows absent from disk,
    * IndexCheck clean. */
  def remove(victims: DataFrame, idCol: String, textCol: String,
             indexDir: String, tag: String = "remove"): Unit = {
    val s = victims.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    Fingerprint.awaitInflightQuiesce(
      conf, IndexMaintenance.normalize(indexDir), s"rm.$tag")
    IndexMaintenance.withLease(conf, indexDir, "remove") {
      val root = IndexMaintenance.liveRoot(conf, indexDir)
      val (nBuckets, oldFp, oldSumDl) = readMeta(s, root)
      val rmTag = s"rm.$tag"
      val vfp = Fingerprint.of(victims, Seq(idCol, textCol))
      val replay = Fingerprint.wasApplied(conf, indexDir, rmTag, vfp)
      if (!replay && Fingerprint.tagUsed(conf, indexDir, rmTag)) Fingerprint.refuse(
        s"TermIndex.remove: tag '$tag' was already used by a different " +
          "removal batch — pass a batch-unique tag")
      val normDir = IndexMaintenance.normalize(indexDir)
      Fingerprint.requireNoOtherPendingRemoval(
        conf, normDir, rmTag, "TermIndex.remove",
        callerHoldsLease = true)
      val barrierBatch = Fingerprint.sanitizeTag(rmTag)
      LogicalDelete.requireNonePending(conf, indexDir, "TermIndex.remove",
        exceptBatch = Some(barrierBatch))
      val vids = victims.select(col(idCol)).distinct().localCheckpoint()
      val nV = vids.count()
      val state0 = Fingerprint.readRemoveState(conf, normDir, rmTag)
      val completedReplay = replay && state0.isEmpty
      val resumed = state0.exists(_._1 == vfp)
      if (nV > 0L && !completedReplay) {
        val (vtf, vdl, vTb, vIdb) =
          victimStats(victims, idCol, textCol, vids, nBuckets)
        if (!replay && !resumed)
          validateVictims(s, root, indexDir, victims, vids, nV, idCol,
            vtf, vdl, vTb, vIdb, "TermIndex.remove")
        Fingerprint.ensureRemoveState(conf, normDir, rmTag, vfp, replay,
          oldFp, "TermIndex.remove")
        FaultInjection.maybeCrash("term.remove.state")
        // victim BARRIER (r17 review, the ClusterRemoval staged-path
        // move): appends are allowed while a crashed removal's state
        // pends (the resolver's addend rule keeps META exact under
        // them), but an append RE-INGESTING a victim id in that window
        // would have its fresh rows deleted by the id-keyed replay
        // while its fingerprint stays merged — rows and meta diverging
        // for good. The barrier tombstones the victims for the
        // removal's duration (requireNotTombstoned refuses their
        // re-ingest; topK goes blind to them right here, even before
        // the deletes land) and is cleared with the state at the end.
        if (!LogicalDelete.pendingBatches(conf, indexDir)
            .contains(barrierBatch))
          LogicalDelete.write(vids, idCol, normDir, rmTag)
        FaultInjection.maybeCrash("term.remove.barrier")
        // ROWS FIRST: both deletes are idempotent pruned dynamic
        // overwrites driven by replay-stable bucket lists — parallel,
        // order-free, convergent from any completed subset
        IndexMaintenance.runLegs(Seq(
          "term.remove.postings" -> (() => {
            TargetedDelete.delete(s, s"$root/postings", Seq("_src", "tb"),
              idCol, vids, col("tb").isin(vTb: _*))
            (): Unit
          }),
          "term.remove.dl" -> (() => {
            TargetedDelete.delete(s, s"$root/dl", Seq("_src", "idb"),
              idCol, vids, col("idb").isin(vIdb: _*))
            (): Unit
          })))
        Fingerprint.resolveRemovalMeta(conf, normDir, rmTag, oldFp,
          "TermIndex.remove").foreach { fp =>
          // same sum_dl protocol as logicalRemove: the subtraction rides
          // the resolver-gated atomic meta write, victims' token total
          // recomputed from the given rows — O(victims)
          writeMeta(s, root, nBuckets, fp, oldSumDl.map(_ - sumDlOf(vdl)))
        }
        FaultInjection.maybeCrash("term.remove.meta")
        if (!replay) Fingerprint.recordMerge(conf, indexDir, rmTag, vfp)
        FaultInjection.maybeCrash("term.remove.record")
        Fingerprint.clearSourceStatus(conf, indexDir)
        // retired GC-grace generations hold the victims' rows too —
        // right-to-be-forgotten beats reader grace
        IndexMaintenance.purgeRetired(conf, indexDir,
          Seq("postings", "dl", "meta"))
        // state FIRST, barrier second — deliberate: a crash between the
        // two leaves a stale barrier with no state, which merely keeps
        // the (already-erased) ids refusing re-ingest until the next
        // compact or completedReplay clears it — an availability hiccup.
        // The opposite order would open a window where an append
        // re-ingests a victim id while state still pends and a replay's
        // id-keyed deletes then erase the NEW rows with their
        // fingerprint left merged — rows/meta divergence for good.
        Fingerprint.clearRemoveState(conf, normDir, rmTag)
        FaultInjection.maybeCrash("term.remove.cleanup")
        LogicalDelete.clearBatches(conf, normDir, Seq(barrierBatch))
      }
      // tail of the benign crash window above: a completed replay
      // (record exists, state cleaned) clears its own leftover barrier —
      // tag reuse is refused, so the batch can only be this removal's
      if (completedReplay &&
          LogicalDelete.pendingBatches(conf, indexDir).contains(barrierBatch))
        LogicalDelete.clearBatches(conf, normDir, Seq(barrierBatch))
      require(IndexMaintenance.liveRoot(conf, indexDir) == root,
        s"TermIndex.remove on $indexDir: index compacted during the " +
          "removal — re-run it after verifying no maintenance is racing")
    }
  }

  /** Fold the accreted append partitions to one file each (pure I/O,
    * `_src`/`tb` structure preserved — provenance keeps working) and
    * RECLAIM tombstoned rows on the rewrite the fold was doing anyway;
    * generation-pointer cutover like every family. */
  def compact(s: SparkSession, indexDir0: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val indexDir = IndexMaintenance.normalize(indexDir0)
    val ctx = IndexMaintenance.beginCompact(conf, indexDir)
    val reclaimBatches = LogicalDelete.pendingBatches(conf, indexDir)
    try {
      val tomb = LogicalDelete.idsOf(s, indexDir, reclaimBatches)
      def dropVictims(df: DataFrame): DataFrame = tomb.fold(df) { t =>
        df.join(t, Seq(LogicalDelete.idColOf(t)), "left_anti")
      }
      IndexMaintenance.runLegs(Seq(
        "compact.postings" -> (() =>
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot,
            "postings", Seq("_src", "tb"), transform = dropVictims)),
        "compact.dl" -> (() =>
          IndexMaintenance.foldTable(s, ctx.fromRoot, ctx.stagingRoot,
            "dl", Seq("_src", "idb"), transform = dropVictims)),
        "compact.meta" -> (() =>
          IndexMaintenance.copyTable(s, ctx.fromRoot, ctx.stagingRoot, "meta"))))
    } catch {
      case t: Throwable => IndexMaintenance.abortCompact(conf, ctx); throw t
    }
    IndexMaintenance.finishCompact(conf, ctx,
      legacyTables = Seq("postings", "dl", "meta"))
    if (reclaimBatches.nonEmpty) {
      IndexMaintenance.purgeRetired(conf, indexDir, Seq("postings", "dl", "meta"))
      LogicalDelete.clearBatches(conf, indexDir, reclaimBatches)
    }
  }
}
