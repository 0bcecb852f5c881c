package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Similarity search over embedding columns (SURVEY.md §2b).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) probe set against the
  *    corpus — a BroadcastNestedLoopJoin scoring every (probe, vector)
  *    pair with a codegen'd HOF cosine. Exact; linear in corpus size per
  *    probe; the right baseline and the recall oracle for the ANN path.
  *  - LSH-bucketed top-k: sign-random-projection (hyperplane) LSH — each
  *    vector maps to a small int bucket; probes only score vectors in the
  *    same bucket (plus optional 1-bit multiprobe neighbors). Candidate
  *    join is a hash join on the bucket id: at 100 TB the corpus shuffles
  *    once on bucket, probes broadcast, and per-probe work drops from
  *    O(corpus) to O(corpus / 2^bits × probes).
  *
  * Hyperplanes are generated driver-side from a seeded RNG (tiny constant:
  * bits × dim doubles) and embedded as literal arrays — deterministic,
  * no data-dependent driver work.
  */
object Similarity {

  /** Exact brute-force cosine top-k. Probes must be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     probeId: String = "q_id", probeVec: String = "q_emb"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(probes))
      .withColumn("cosine", VectorOps.cosine(col(probeVec), col(corpusVec)))
    val w = Window.partitionBy(col(probeId))
      .orderBy(round(col("cosine"), 4).desc, col(corpusId))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(probeId), col("rn"), col(corpusId), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic random hyperplanes: `bits` rows of `dim` doubles. */
  def hyperplanes(bits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Embedding dimensionality read from the data (one-row action — NOT a
    * collect of the corpus). A wrong hardcoded dim makes `zip_with`
    * silently truncate dot products (VERDICT r1); deriving it removes the
    * failure mode. */
  def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Sign-random-projection bucket id: bit i = sign(dot(v, plane_i)). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0)) { case (acc, (p, i)) =>
      acc.bitwiseOR(
        when(VectorOps.dot(vec, typedLit(p)) >= 0, lit(1 << i)).otherwise(lit(0)))
    }

  /** Bucket ids to probe: the probe's own bucket plus all 1-bit flips
    * (multiprobe — recovers most near neighbors lost at the boundary). */
  def multiprobeBuckets(bucket: Column, bits: Int): Column =
    array((bucket +: (0 until bits).map(i => bucket.bitwiseXOR(lit(1 << i)))): _*)

  /** ANN top-k via MULTI-TABLE hyperplane LSH + 1-bit multiprobe — the
    * standard recall lever: L independent tables of `bits` hyperplanes
    * each; a candidate is scored if it lands within hamming<=1 of the
    * probe's bucket in ANY table (recall 1-(1-p_table)^L vs a single
    * table's p_table). Returns the same shape as bruteForceTopK
    * (approximate contents; SimilaritySpec gates recall@k >= 0.8).
    *
    * Cost at scale: the corpus emits `tables` rows per vector and
    * shuffles once on (table, bucket); probes broadcast with their
    * multiprobe expansion (|probes| x tables x (bits+1) rows — tiny).
    * Candidates are deduped on (probe, vector) before ranking so a pair
    * found by several tables scores once. Tune bits ~ log2(corpus /
    * wanted-bucket-size) and tables for the recall target.
    * dim <= 0 means derive it from the corpus. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int = 6,
              tables: Int = 8, dim: Int = -1, seed: Long = 42L,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              probeId: String = "q_id", probeVec: String = "q_emb"): DataFrame = {
    val d = if (dim > 0) dim else dimOf(corpus, corpusVec)
    val planes = hyperplanes(bits * tables, d, seed)
    def tableBucket(vec: Column, t: Int): Column =
      lshBucket(vec, planes.slice(t * bits, (t + 1) * bits))
    val bucketed = corpus.select(col(corpusId), col(corpusVec),
      posexplode(array((0 until tables).map(t => tableBucket(col(corpusVec), t)): _*))
        .as(Seq("_tbl", "_bkt")))
    val probed = probes.select(col(probeId), col(probeVec),
        posexplode(array((0 until tables).map(t =>
          multiprobeBuckets(tableBucket(col(probeVec), t), bits)): _*))
          .as(Seq("_tbl", "_bkts")))
      .withColumn("_bkt", explode(col("_bkts")))
      .drop("_bkts")
    val cands = bucketed
      .join(broadcast(probed), Seq("_tbl", "_bkt"))
      .withColumn("cosine",
        round(VectorOps.cosine(col(probeVec), col(corpusVec)), 4))
      .select(col(probeId), col(corpusId), col("cosine"))
      .distinct()
    val w = Window.partitionBy(col(probeId))
      .orderBy(col("cosine").desc, col(corpusId))
    cands
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(probeId), col("rn"), col(corpusId), col("cosine"))
  }

  /** Global embedding near-dup pairs via LSH-bucket blocking — the scale
    * path for "find near-identical vectors anywhere in the corpus"
    * (blocking on a data column like `label` is O(n^2/|labels|) and
    * misses cross-label pairs; hyperplane buckets bound the pair space by
    * corpus^2 / 2^bits regardless of any label skew).
    *
    * One side indexes its own bucket, the other probes its bucket plus
    * all 1-bit flips, so any pair whose bucket codes differ by <= 1 bit
    * is scored; for cosine >= 0.95 and 8 bits that is ~0.8+ recall
    * (SimilaritySpec gates it on planted near-dups). Approximate by
    * design — pairs differing in >= 2 bucket bits are missed.  */
  def lshNearDups(corpus: DataFrame, threshold: Double, bits: Int = 8,
                  seed: Long = 42L, corpusId: String = "vec_id",
                  corpusVec: String = "embedding"): DataFrame = {
    val planes = hyperplanes(bits, dimOf(corpus, corpusVec), seed)
    val a = corpus
      .withColumn("_bucket", lshBucket(col(corpusVec), planes))
      .select(col("_bucket"), col(corpusId).as("id1"), col(corpusVec).as("_e1"))
    val b = corpus
      .withColumn("_bucket",
        explode(multiprobeBuckets(lshBucket(col(corpusVec), planes), bits)))
      .select(col("_bucket"), col(corpusId).as("id2"), col(corpusVec).as("_e2"))
    a.join(b, "_bucket")
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", round(VectorOps.cosine(col("_e1"), col("_e2")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
      .distinct()
  }
}
