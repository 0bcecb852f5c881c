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

  private def bandRows(toks: DataFrame, idCol: String, numHashes: Int,
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
    * bucket-partitioned band and token tables plus the parameter row. */
  def build(docs: DataFrame, idCol: String, textCol: String, indexDir: String,
            numHashes: Int = 128, bands: Int = 16, nBuckets: Int = 64,
            seed: Int = 42): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))
      .localCheckpoint() // feeds both tables; never recompute the hash pass
    tokRows(toks, idCol, nBuckets)
      .write.mode("overwrite").partitionBy("idb").parquet(s"$indexDir/toks")
    bandRows(toks, idCol, numHashes, bands, nBuckets, seed)
      .write.mode("overwrite").partitionBy("hb").parquet(s"$indexDir/bands")
    Seq((numHashes, bands, nBuckets, seed))
      .toDF("num_hashes", "bands", "n_buckets", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  private def readMeta(s: SparkSession, indexDir: String): (Int, Int, Int, Int) = {
    val m = s.read.parquet(s"$indexDir/meta").head()
    (m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"),
      m.getAs[Int]("n_buckets"), m.getAs[Int]("seed"))
  }

  /** O(|delta|) maintenance: sign a new dump with the index's FROZEN
    * parameters and append its rows to both tables. */
  def append(delta: DataFrame, idCol: String, textCol: String,
             indexDir: String): Unit = {
    val (numHashes, bands, nBuckets, seed) = readMeta(delta.sparkSession, indexDir)
    val toks = delta
      .select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))
      .localCheckpoint()
    tokRows(toks, idCol, nBuckets)
      .write.mode("append").partitionBy("idb").parquet(s"$indexDir/toks")
    bandRows(toks, idCol, numHashes, bands, nBuckets, seed)
      .write.mode("append").partitionBy("hb").parquet(s"$indexDir/bands")
  }

  /** Flag incoming docs that near-duplicate the INDEXED corpus: the
    * [[Dedup.minhashNearDupsAgainst]] contract (one row per flagged
    * incoming doc, best match by verified Jaccard then ref id), with the
    * reference side read partition-PRUNED from the persisted index. */
  def probe(s: SparkSession, indexDir: String, incoming: DataFrame,
            idCol: String, textCol: String,
            threshold: Double = 0.8): DataFrame = {
    val (numHashes, bands, nBuckets, seed) = readMeta(s, indexDir)
    val incToks = incoming
      .select(col(idCol), Dedup.hashedTokenSet(col(textCol)).as("_toks"))
      .localCheckpoint()
    val incBands = bandRows(incToks, idCol, numHashes, bands, nBuckets, seed)
      .localCheckpoint() // consumed twice: bucket collect + the join
    // bounded collect: at most nBuckets longs — prunes the band scan
    val touchedHb = incBands.select(col("hb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val refBands = s.read.parquet(s"$indexDir/bands")
      .filter(col("hb").isin(touchedHb: _*))
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
    val refToks = s.read.parquet(s"$indexDir/toks")
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
