package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE BM25 scoring form every retrieval surface shares —
  * `TextPipeline.bm25TopK` (closed-form recompute),
  * `TextPipeline.rrfFusion` (lexical leg), and `TermIndex.topK` (the
  * persisted family). All three are DuckDB-oracle-checked against the
  * same SQL replay, and `doc_bm25_index_topk == doc_bm25_topk` is a
  * value-exact contract, so the weight expression and the rounding
  * discipline live here once: a tuning change that only touched one
  * copy would silently break the equality the bench relies on.
  *
  * Robertson/Spärck Jones BM25 with the positive ln idf
  * (ln((N - df + 0.5)/(df + 0.5) + 1) — never negative, the Lucene
  * form). Per-term weights round at 6 dp and accumulate as
  * DECIMAL(18,6) — exact addition, merge-order-independent, so the
  * distributed sum replays bit-equal in any engine — and the total
  * rounds at 4 dp. */
object Bm25 {

  /** Per-(query term, doc) weight over columns `tf`, `df`, `dl` and the
    * corpus stats columns `n`, `avgdl`. */
  def weight(k1: Double, b: Double): Column =
    log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
      (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) *
        (lit(1 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))

  /** The exact-decimal score accumulation (an AGGREGATE expression). */
  def score(w: Column): Column =
    round(sum(round(w, 6).cast("decimal(18,6)")).cast("double"), 4)
}
