package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators for the LLM-data-pipeline layer (SURVEY.md §2b):
  * exact (hash-groupBy), MinHash+LSH near-dup, SimHash near-dup, and
  * n-gram Jaccard verification.
  *
  * Scale design: candidate generation is always a shuffle on a *bucket*
  * key (band hash / simhash band), never an all-pairs product. Bucket
  * sizes are capped (`maxBucket`) so one degenerate bucket (all-identical
  * boilerplate docs at 100 TB) cannot produce a quadratic pair explosion —
  * overflow buckets are dropped and should be handled by exact dedup first.
  * Verification joins texts back by id (shuffle on id), never broadcasts
  * the corpus.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical text. O(n) shuffle on
    * the text hash (group key is the 256-bit digest, not the full text —
    * cheaper shuffle keys for long docs). */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numHashes` independent min-hashes over word
    * shingles, as one HOF expression (codegen, no UDF). Hash i of shingle s
    * is xxhash64(s, i, seed). Empty shingle sets get Long.MaxValue mins. */
  def minhashSignature(toks: Column, shingleLen: Int, numHashes: Int, seed: Int): Column = {
    val sh = TextOps.shingles(toks, shingleLen)
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => aggregate(sh, lit(Long.MaxValue),
        (m, x) => least(m, xxhash64(x, i, lit(seed)))))
  }

  /** LSH banding: signature of b bands × r rows; a pair is a candidate if
    * any band of r consecutive min-hashes matches exactly.
    * Emits (id, band, band_hash) — one row per band per doc. */
  def lshBands(df: DataFrame, idCol: String, sigCol: Column,
               bands: Int, rows: Int): DataFrame =
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(sigCol, b * rows + 1, lit(rows)), b)))
          .as(Seq("band", "band_hash")))

  /** Candidate pairs from band buckets: self-join on (band, band_hash),
    * id1 < id2, distinct. Buckets larger than maxBucket are dropped
    * (degenerate near-identical mass — cap prevents quadratic blowup). */
  def candidatePairs(banded: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    val sized = banded
      .withColumn("_bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))))
      .filter(col("_bucket_n") <= maxBucket)
    val a = sized.select(col("band"), col("band_hash"), col(idCol).as("id1"))
    val b = sized.select(col("band"), col("band_hash"), col(idCol).as("id2"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Exact token-set Jaccard for a pair table, joining texts back by id.
    * tokensOf must produce the token array from the text column. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, tokensOf: Column => Column): DataFrame = {
    val toks = docs.select(col(idCol).as("_jid"),
      array_distinct(tokensOf(col(textCol))).as("_toks"))
    pairs
      .join(toks.withColumnRenamed("_jid", "id1").withColumnRenamed("_toks", "_t1"), "id1")
      .join(toks.withColumnRenamed("_jid", "id2").withColumnRenamed("_toks", "_t2"), "id2")
      .withColumn("jaccard",
        size(array_intersect(col("_t1"), col("_t2"))).cast("double") /
          size(array_union(col("_t1"), col("_t2"))))
      .drop("_t1", "_t2")
  }

  /** Full MinHash-LSH near-dup pipeline: returns (id1, id2, jaccard) for
    * candidate pairs with verified Jaccard >= threshold. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int = 3, numHashes: Int = 16, bands: Int = 8,
                      threshold: Double = 0.5, maxBucket: Int = 64,
                      seed: Int = 42): DataFrame = {
    val rows = numHashes / bands
    val toks = TextOps.tokens(col(textCol))
    val sigs = docs.select(col(idCol),
      minhashSignature(toks, shingleLen, numHashes, seed).as("sig"))
    val banded = lshBands(sigs, idCol, col("sig"), bands, rows)
    val cands = candidatePairs(banded, idCol, maxBucket)
    jaccardVerify(cands, docs, idCol, textCol, TextOps.tokens)
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 3).as("jaccard"))
  }

  /** SimHash near-dup: docs whose 64-bit simhash differs by <= maxHamming
    * bits. Candidate generation buckets on 4 × 16-bit simhash bands
    * (guarantees recall for hamming <= 3); verification checks the true
    * hamming distance. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxBucket: Int = 256): DataFrame = {
    val sigs = TextOps.simhash(docs, idCol, TextOps.tokens(col(textCol)))
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col(idCol).as("id1"), col("simhash").as("sh1"))
    val b = banded.select(col("band"), col("band_hash"),
      col(idCol).as("id2"), col("simhash").as("sh2"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        TextOps.hamming(col("sh1"), col("sh2")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
