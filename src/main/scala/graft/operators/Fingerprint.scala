package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent corpus fingerprint backing persisted-index staleness
  * checks (VERDICT r8 item 3: the driver regenerates fixture parquet IN
  * PLACE, so an index keyed only by source path can silently serve answers
  * for data that no longer exists).
  *
  * The fingerprint is `(row count, XOR of xxhash64 over the named
  * columns)` computed in ONE column-pruned aggregate scan:
  *
  *  - XOR is associative/commutative ⇒ the value is independent of row
  *    order and partitioning, and an append merges in O(1)
  *    ([[merge]]) — no index-wide recompute on incremental maintenance.
  *  - A check costs a single pruned scan + 16-byte agg — orders of
  *    magnitude cheaper than the rebuild it guards (quantizer training /
  *    128 min-hashes per doc), and skippable entirely by deployments
  *    with an immutable corpus contract.
  */
object Fingerprint {

  /** One pruned scan: (n_rows, xor of xxhash64(cols...)). Empty input
    * fingerprints as (0, 0). */
  def of(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    val r = df
      .agg(count(lit(1)).as("n"),
        coalesce(expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))"), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Fingerprint of (a ∪ b) from the parts — the append path. */
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 ^ b._2)
}
