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

  /** ANN top-k via hyperplane LSH + 1-bit multiprobe.
    * Returns the same shape as bruteForceTopK (approximate contents). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, bits: Int = 8,
              dim: Int = 64, seed: Long = 42L,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              probeId: String = "q_id", probeVec: String = "q_emb"): DataFrame = {
    val planes = hyperplanes(bits, dim, seed)
    val bucketed = corpus.withColumn("_bucket", lshBucket(col(corpusVec), planes))
    val probed = probes
      .withColumn("_probe_bucket",
        explode(multiprobeBuckets(lshBucket(col(probeVec), planes), bits)))
    val scored = bucketed
      .join(broadcast(probed), col("_bucket") === col("_probe_bucket"))
      .withColumn("cosine", VectorOps.cosine(col(probeVec), col(corpusVec)))
    val w = Window.partitionBy(col(probeId))
      .orderBy(round(col("cosine"), 4).desc, col(corpusId))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(probeId), col("rn"), col(corpusId), round(col("cosine"), 4).as("cosine"))
  }
}
