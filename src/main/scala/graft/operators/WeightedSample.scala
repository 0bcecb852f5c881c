package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling WITHOUT replacement (Efraimidis,
  * Spirakis, IPL'06 — public literature), randomness replaced by a
  * seeded hash: every row gets key = u^(1/w) with u = hash01(id, seed),
  * and the sample is the n largest keys. Inclusion probability is
  * proportional-to-weight exactly as in the randomized original, but
  * the draw is a pure function of (id, seed) — reproducible run to run,
  * engine to engine, at any parallelism, unlike rand()-based sampling
  * whose assignment depends on partitioning.
  *
  * Scale shape: per-row key computation + TakeOrderedAndProject (the
  * distributed top-n that never materializes a global sort); nothing
  * shuffles except n rows per partition to the driver-side heap merge.
  * Weights must be strictly positive; rows with w <= 0 are excluded
  * (they'd have key 0 in the limit anyway).
  */
object WeightedSample {

  /** hash01: xxhash64 mapped to a double uniform in (0, 1]. The top 53
    * bits feed the mantissa (doubles can't hold 64); +1 keeps u > 0 so
    * ln(u)/pow stays finite. */
  def hash01(id: Column, seed: Long): Column =
    (shiftrightunsigned(xxhash64(id, lit(seed)), 11).cast("double") + 1.0) /
      lit(9007199254740992.0) // 2^53

  /** Top-n by a caller-supplied ES key (largest first, id tiebreak):
    * the TakeOrderedAndProject distributed top-n — each partition offers
    * its local n, never a global sort. Callers that must replay the
    * draw in ANOTHER engine pass a SQL-portable key here (see
    * TextPipeline's doc_weighted_sample); `sample` below supplies the
    * xxhash64 key for Spark-only use. */
  def sampleByKey(df: DataFrame, keyCol: Column, idCol: String, n: Int): DataFrame =
    df.orderBy(keyCol.desc, col(idCol)).limit(n)

  /** The n rows sampled proportional-to-weight, deterministic in seed.
    * Ties (astronomically unlikely with distinct ids) break on the key
    * then arbitrary-but-stable input order via the id itself being part
    * of the hash. */
  def sample(df: DataFrame, idCol: String, weightCol: String,
             n: Int, seed: Long = 42L): DataFrame = {
    val key = pow(hash01(col(idCol), seed), lit(1.0) / col(weightCol))
    sampleByKey(
      df.filter(col(weightCol) > 0).withColumn("_wkey", key),
      col("_wkey"), idCol, n)
      .drop("_wkey")
  }
}
