package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact set-similarity self-join (token-set Jaccard >= t) WITHOUT a
  * cross join, via prefix filtering (the SSJoin/PPJoin family, public
  * literature). Results are bit-identical to the brute-force all-pairs
  * computation — this is an exact algorithm, not an approximation
  * (equivalence held by SetSimJoinSpec against the cross-join form).
  *
  * Why it scales: a pair with J(x,y) >= t must share at least one token
  * among the first |x| - ceil(t*|x|) + 1 tokens of each side when every
  * doc's tokens are sorted by a single global order. Ordering by
  * ascending document frequency puts the RAREST tokens in the prefix, so
  * the candidate join on prefix tokens touches df^2 pairs only for rare
  * tokens — the frequent tokens that would explode a naive token-join
  * never enter the index. Shuffles: one explode+count for df, one window
  * by doc id for ranking, one hash join on prefix token, one verify join
  * by id. All linear-ish in corpus size; no O(n^2) stage.
  *
  * The FP guard: ceil(t*sz) computed in doubles can land one ULP above
  * the true integer (0.8*10 -> 8.0000...04 -> ceil 9), silently
  * SHORTENING the prefix and losing pairs. The -1e-9 slack keeps ceil
  * exact for every sz < 1e6.
  */
object SetSimJoin {

  /** Candidate pairs (id1 < id2) that can possibly reach Jaccard >= t.
    * Input: (idCol, toksCol) with toksCol an array of DISTINCT tokens. */
  def prefixCandidates(toks: DataFrame, idCol: String, toksCol: String,
                       t: Double): DataFrame = {
    val sized = toks.select(col(idCol), col(toksCol).as("_tk"),
      size(col(toksCol)).as("_sz"))
    val tokenDf = sized.select(explode(col("_tk")).as("_tok"))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    val ranked = sized.select(col(idCol), col("_sz"), explode(col("_tk")).as("_tok"))
      .join(tokenDf, "_tok")
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("_df"), col("_tok"))))
    // each prefix row carries the doc's WHOLE prefix as a (df, tok) array
    // sorted in the global token order, so the join below can decide
    // per-row whether it is the pair's earliest shared witness. The
    // pairs are flattened (df0, tok0, df1, tok1, ...) into one long
    // array — see IsEarliestWitness's layout note.
    val prefix = ranked
      .filter(col("_rk") <= col("_sz") - ceil(lit(t) * col("_sz") - lit(1e-9)) + 1)
      .withColumn("_parr", flatten(transform(
        array_sort(collect_list(struct(col("_df"), col("_tok")))
          .over(Window.partitionBy(col(idCol)))),
        s => array(s.getField("_df"), s.getField("_tok")))))
      .select(col("_tok"), col("_df"), col(idCol), col("_sz"), col("_rk"), col("_parr"))
      // both join sides reference this subtree (explode -> df join -> two
      // windows); checkpoint so it computes once, not once per side —
      // same leak-free lifecycle as the token table (blocks freed with
      // the returned plan)
      .localCheckpoint()
    val a = prefix.select(col("_tok"), col("_df"), col(idCol).as("id1"),
      col("_sz").as("_sz1"), col("_rk").as("_rk1"), col("_parr").as("_parr1"))
    val b = prefix.select(col("_tok"), col(idCol).as("id2"),
      col("_sz").as("_sz2"), col("_rk").as("_rk2"), col("_parr").as("_parr2"))
    a.join(b, "_tok")
      .filter(col("id1") < col("id2"))
      // size filter: J >= t forces t*|x| <= |y| <= |x|/t (both directions)
      .filter(col("_sz2") >= lit(t) * col("_sz1") - lit(1e-9)
        && col("_sz1") >= lit(t) * col("_sz2") - lit(1e-9))
      // positional filter (PPJoin): tokens are globally ordered, so the
      // overlap witnessed through a shared token at ranks (rk1, rk2) is at
      // most 1 + min(sz1-rk1, sz2-rk2); if that upper bound can't reach
      // the minimum overlap t/(1+t)*(sz1+sz2), this occurrence can't
      // certify the pair. A pair survives if ANY shared prefix token
      // passes; the earliest-witness filter below implements the ANY —
      // the bound is maximal at the earliest shared token (both ranks
      // minimal), so it passes whenever any witness does.
      .filter(lit(1) + least(col("_sz1") - col("_rk1"), col("_sz2") - col("_rk2"))
        >= ceil(lit(t / (1 + t)) * (col("_sz1") + col("_sz2")) - lit(1e-9)))
      // emit the pair ONLY at its earliest shared witness: exactly-once
      // by construction — replaces a global distinct() over the join
      // output (9.7s of the 13s candidate stage at sf0.1) with a
      // codegen'd two-pointer merge per row
      .filter(graft.functions.IsEarliestWitness(
        col("_parr1"), col("_parr2"), col("_df"), col("_tok")))
      .select(col("id1"), col("id2"))
  }

  /** Exact Jaccard self-join: (id1, id2, jaccard) for all pairs with
    * token-set Jaccard >= t. Same output as the cross-join brute force.
    * toksCol must be a SORTED array<long> set (Dedup.hashedTokenSet) —
    * verification uses the codegen'd merge-intersect fast path. */
  def jaccardSelfJoin(toks: DataFrame, idCol: String, toksCol: String,
                      t: Double): DataFrame = {
    // the token table feeds the df-count, the ranking, and both verify
    // joins; eager localCheckpoint so the (potentially expensive)
    // tokenization runs once instead of once per reference, WITHOUT the
    // CacheManager leak a persist-with-no-unpersist-point has (ADVICE
    // r2): checkpoint blocks free when the returned plan is dropped
    val cached = toks.localCheckpoint()
    Dedup.jaccardVerifySorted(
        prefixCandidates(cached, idCol, toksCol, t), cached, idCol, toksCol)
      .filter(col("jaccard") >= t)
  }
}
