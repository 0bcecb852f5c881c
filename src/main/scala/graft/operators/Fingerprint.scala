package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent corpus fingerprint backing persisted-index staleness
  * checks (VERDICT r8 item 3: the driver regenerates fixture parquet IN
  * PLACE, so an index keyed only by source path can silently serve answers
  * for data that no longer exists).
  *
  * The fingerprint is `(row count, SUM of xxhash64 over the named columns,
  * mod 2^64)` computed in ONE column-pruned aggregate scan:
  *
  *  - Sum is associative/commutative ⇒ the value is independent of row
  *    order and partitioning, and an append merges in O(1)
  *    ([[merge]] is a wrapping add) — no index-wide recompute on
  *    incremental maintenance.
  *  - Sum, unlike XOR, is multiplicity-sensitive: XOR cancels any row
  *    appearing an even number of times, so {A,A,B,B} and {C,C,D,D}
  *    would collide at (4, 0) and a stale index would read as fresh.
  *    The sum accumulates in DECIMAL(38,0) (no ANSI long overflow) and
  *    the low 64 bits are kept — exactly sum mod 2^64, which a Scala
  *    wrapping `+` reproduces on merge.
  *  - A check costs a single pruned scan + 16-byte agg — orders of
  *    magnitude cheaper than the rebuild it guards (quantizer training /
  *    128 min-hashes per doc), and skippable entirely by deployments
  *    with an immutable corpus contract.
  */
object Fingerprint {

  /** One pruned scan: (n_rows, sum of xxhash64(cols...) mod 2^64).
    * Empty input fingerprints as (0, 0). */
  def of(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    val r = df
      .agg(count(lit(1)).as("n"),
        coalesce(
          sum(expr(s"xxhash64(${cols.mkString(", ")})").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("h"))
      .head()
    (r.getLong(0), r.getDecimal(1).toBigInteger.longValue()) // low 64 bits
  }

  /** Fingerprint of (a ∪ b) from the parts — the append path. The
    * wrapping long add equals decimal-sum-mod-2^64 of the union. */
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
}
