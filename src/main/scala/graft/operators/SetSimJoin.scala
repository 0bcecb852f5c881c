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
    * Input: (idCol, toksCol) with toksCol an array of DISTINCT tokens.
    *
    * Asymmetric prefixes (PPJoin proper): pairs are oriented so the
    * LARGER set (by (size, id)) probes and the smaller set indexes.
    * The probing side needs the standard prefix |x| - ceil(t|x|) + 1;
    * the indexed side only |y| - ceil(2t/(1+t)|y|) + 1, because all its
    * eligible partners are at least its size, forcing minimum overlap
    * 2t/(1+t)*|y| (at t=0.8: a ~0.11|y| prefix vs ~0.2|y| — the
    * candidate join roughly halves). */
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
    // Checkpoint only the PROBE-prefix rows (the longer of the two
    // prefixes, ~0.2|x| of the exploded occurrences at t=0.8) — never
    // the full occurrence table, which at corpus scale is every token of
    // every doc. Both role tables derive from this subset; leak-free
    // lifecycle as with the token table (blocks freed with the plan).
    val prefRows = ranked
      .filter(col("_rk") <= col("_sz") - ceil(lit(t) * col("_sz") - lit(1e-9)) + 1)
      .localCheckpoint(eager = false)
    // each prefix row carries the doc's WHOLE prefix (of its own role)
    // as a (df, tok) array sorted in the global token order, so the join
    // below can decide per-row whether it is the pair's earliest shared
    // witness. The pairs are flattened (df0, tok0, df1, tok1, ...) into
    // one long array — see IsEarliestWitness's layout note.
    // Built ONCE per doc by aggregation and joined back to the prefix
    // rows (VERDICT r3 item 4) — the window form ran
    // array_sort+transform+flatten per prefix ROW over the whole array,
    // O(prefix^2) work per doc in the projection itself.
    def withPrefixArr(rows: DataFrame): DataFrame = {
      val parr = rows.groupBy(col(idCol))
        .agg(flatten(transform(
          array_sort(collect_list(struct(col("_df"), col("_tok")))),
          s => array(s.getField("_df"), s.getField("_tok")))).as("_parr"))
      rows.join(parr, idCol)
        .select(col("_tok"), col("_df"), col(idCol), col("_sz"), col("_rk"), col("_parr"))
    }
    val probe = withPrefixArr(prefRows)
    // the index role is a per-row projection of the probe role: its
    // (shorter) prefix is the first idxLen tokens in the same global
    // (df, tok) order the probe array is sorted by, so slicing the
    // already-built array replaces a second groupBy + join
    val idxLen = (col("_sz")
      - ceil(lit(2 * t / (1 + t)) * col("_sz") - lit(1e-9)) + 1).cast("int")
    val index = probe.filter(col("_rk") <= idxLen)
      .withColumn("_parr", slice(col("_parr"), lit(1), idxLen * 2))
    val a = probe.select(col("_tok"), col("_df"), col(idCol).as("_ida"),
      col("_sz").as("_sza"), col("_rk").as("_rka"), col("_parr").as("_parra"))
    val b = index.select(col("_tok"), col(idCol).as("_idb"),
      col("_sz").as("_szb"), col("_rk").as("_rkb"), col("_parr").as("_parrb"))
    a.join(b, "_tok")
      // canonical orientation: the probe side is strictly larger by
      // (size, id), so every unordered pair is examined exactly once
      // with the roles the prefix lengths assume
      .filter(col("_szb") < col("_sza")
        || (col("_szb") === col("_sza") && col("_idb") < col("_ida")))
      // size filter: J >= t and |y| <= |x| force |y| >= t*|x|
      .filter(col("_szb") >= lit(t) * col("_sza") - lit(1e-9))
      // positional filter (PPJoin): tokens are globally ordered, so the
      // overlap witnessed through a shared token at ranks (rka, rkb) is at
      // most 1 + min(sza-rka, szb-rkb); if that upper bound can't reach
      // the minimum overlap t/(1+t)*(sza+szb), this occurrence can't
      // certify the pair. A pair survives if ANY shared witness passes;
      // the earliest-witness filter below implements the ANY — the bound
      // is maximal at the earliest shared token (both ranks minimal), so
      // it passes whenever any witness does.
      .filter(lit(1) + least(col("_sza") - col("_rka"), col("_szb") - col("_rkb"))
        >= ceil(lit(t / (1 + t)) * (col("_sza") + col("_szb")) - lit(1e-9)))
      // emit the pair ONLY at its earliest shared witness (first common
      // element of probe-prefix x index-prefix): exactly-once by
      // construction — replaces a global distinct() over the join output
      // (9.7s of the 13s candidate stage at sf0.1) with a codegen'd
      // two-pointer merge per row
      .filter(graft.functions.IsEarliestWitness(
        col("_parra"), col("_parrb"), col("_df"), col("_tok")))
      .select(least(col("_ida"), col("_idb")).as("id1"),
        greatest(col("_ida"), col("_idb")).as("id2"))
  }

  /** Exact Jaccard self-join: (id1, id2, jaccard) for all pairs with
    * token-set Jaccard >= t. Same output as the cross-join brute force
    * (SetSimJoinSpec holds the equivalence bit-for-bit).
    * toksCol must be a SORTED array<long> set (Dedup.hashedTokenSet) —
    * verification uses the codegen'd merge-intersect fast path.
    *
    * Dedup-first (Dedup.scala's own prescription, VERDICT r3 item 2):
    * docs with IDENTICAL token sets are grouped before the prefix join —
    * the PPJoin machinery runs over one representative per distinct set,
    * so an exact-duplicate clique of size c costs the candidate stage one
    * row instead of c probes × c index entries (the quadratic blowup
    * degenerate corpora hit at scale). Clique pairs are re-emitted
    * directly at jaccard exactly 1.0 (what brute force computes for
    * identical sets: |x∩x|/|x∪x|), and representative pairs fan back out
    * to all member combinations — two broadcast-size joins on group key.
    * Identical sets group EXACTLY (the full sorted array is the key, not
    * a hash of it), so no collision can merge different sets. */
  def jaccardSelfJoin(toks: DataFrame, idCol: String, toksCol: String,
                      t: Double): DataFrame = {
    val (members, repPairs) = repGraph(toks, idCol, toksCol, t)
    // within-clique pairs: identical sets, jaccard exactly 1.0
    val cliquePairs = members.alias("x")
      .join(members.alias("y"), col("x._rep") === col("y._rep"))
      .filter(col("x._mid") < col("y._mid"))
      .select(col("x._mid").as("id1"), col("y._mid").as("id2"),
        lit(1.0).as("jaccard"))
    // cross-set pairs: each rep pair fans out to every member combination
    // (jaccard depends only on the sets, so members inherit the
    // representatives' score verbatim)
    val crossPairs = repPairs
      .join(members.select(col("_rep").as("id1"), col("_mid").as("_m1")), "id1")
      .join(members.select(col("_rep").as("id2"), col("_mid").as("_m2")), "id2")
      .select(least(col("_m1"), col("_m2")).as("id1"),
        greatest(col("_m1"), col("_m2")).as("id2"), col("jaccard"))
    crossPairs.unionByName(cliquePairs)
  }

  /** A SPARSE edge set with the same connectivity as the full
    * jaccard >= t pair relation: member→representative star edges for
    * identical-set groups plus the PPJoin pairs over representatives.
    * An exact-dup clique of size c contributes c-1 edges here instead of
    * c(c-1)/2 expanded pairs — the right input for component clustering
    * (ConnectedComponents), where emitting the full pair expansion only
    * to contract it again would make the edge list quadratic in clique
    * size for no information gain. */
  def jaccardEdges(toks: DataFrame, idCol: String, toksCol: String,
                   t: Double): DataFrame = {
    val (members, repPairs) = repGraph(toks, idCol, toksCol, t, needScores = false)
    members.filter(col("_mid") =!= col("_rep"))
      .select(col("_rep").as("id1"), col("_mid").as("id2"))
      .unionByName(repPairs.select(col("id1"), col("id2")))
  }

  /** The same connectivity as [[jaccardEdges]] in a DELETION-SAFE form
    * (the persisted edge log [[ClusterIndex]] keeps for its scoped
    * re-split): each distinct token SET becomes a VIRTUAL node (strictly
    * negative id), every member doc links to its set node, and set-set
    * edges connect the NODES, not the rep docs. Why the star form
    * cannot be stored: its hub is a real doc, so deleting the rep would
    * sever member-member connectivity that the true similarity graph
    * (where identical docs are pairwise linked) retains; the set node
    * can never be a deletion victim, and a consumer drops a set node
    * exactly when its last member doc is gone — which is also exactly
    * when the true graph loses those paths. Set-set edges are honest
    * under deletion too: J(S,T) >= t means EVERY surviving member of S
    * pairs with every surviving member of T directly.
    *
    * Node ids are `-(xxhash64(salt, rep) & Long.MaxValue) - 1` — always
    * negative, SALTED by the writing generation. A plain `-(rep)-1`
    * encoding was a review-caught collision: remove an id, re-ingest it
    * under DIFFERENT text in a later batch, and the re-created node id
    * would conflate the old and new token sets, falsely merging their
    * components in a later re-split. With the generation salt, node ids
    * never alias across batches; cross-batch connectivity rides the
    * doc-doc match pairs, which never needed shared node ids. (Hash
    * collisions are the same 2^-64 class the token-set hashing upstream
    * already accepts.) Doc ids must be NON-NEGATIVE — the log's
    * sign-based vertex classification depends on it; [[ClusterIndex]]
    * enforces that at build/append. */
  def jaccardEdgesSetForm(toks: DataFrame, idCol: String, toksCol: String,
                          t: Double, salt: String): DataFrame = {
    val (members, repPairs) = repGraph(toks, idCol, toksCol, t, needScores = false)
    def node(rep: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      -(xxhash64(lit(salt), rep).bitwiseAND(lit(Long.MaxValue))) - 1
    members
      .select(node(col("_rep")).as("u"), col("_mid").as("v"))
      .unionByName(repPairs.select(
        node(col("id1")).as("u"), node(col("id2")).as("v")))
  }

  /** ONE repGraph pass serving both consumers ([[ClusterIndex.build]]):
    * the CC-input star edges and the persistable set-form log. The
    * shared (members, repPairs) frames are lazily checkpointed so the
    * expensive prefix-candidate + verify join runs once, not once per
    * derived form. */
  def jaccardEdgesWithLog(toks: DataFrame, idCol: String, toksCol: String,
                          t: Double, salt: String): (DataFrame, DataFrame) = {
    val (members0, repPairs0) = repGraph(toks, idCol, toksCol, t, needScores = false)
    val members = members0.localCheckpoint(eager = false)
    val repPairs = repPairs0.localCheckpoint(eager = false)
    val star = members.filter(col("_mid") =!= col("_rep"))
      .select(col("_rep").as("id1"), col("_mid").as("id2"))
      .unionByName(repPairs.select(col("id1"), col("id2")))
    def node(rep: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      -(xxhash64(lit(salt), rep).bitwiseAND(lit(Long.MaxValue))) - 1
    val setForm = members
      .select(node(col("_rep")).as("u"), col("_mid").as("v"))
      .unionByName(repPairs.select(
        node(col("id1")).as("u"), node(col("id2")).as("v")))
    (star, setForm)
  }

  /** Shared dedup-first structure (Dedup.scala's own prescription, VERDICT
    * r3 item 2): docs with IDENTICAL token sets are grouped before the
    * prefix join — the PPJoin machinery runs over one representative per
    * distinct set, so an exact-duplicate clique of size c costs the
    * candidate stage one row instead of c probes × c index entries (the
    * quadratic blowup degenerate corpora hit at scale). Identical sets
    * group EXACTLY (the full sorted array is the key, not a hash of it),
    * so no collision can merge different sets.
    *
    * Returns (members: (_rep, _mid), repPairs: (id1, id2, jaccard >= t)).
    *
    * The distinct-set aggregate below is the plan's fan-out point (it
    * feeds members, reps, the df-count, the ranking and the verify
    * joins); a lazy localCheckpoint there runs the tokenization+grouping
    * once — inside the first consumer's job, no separate checkpoint job —
    * WITHOUT the CacheManager leak a persist-with-no-unpersist-point has
    * (ADVICE r2): checkpoint blocks free when the returned plan is dropped.
    * Empty sets are dropped up front: brute force scores an
    * identical-empty pair 0/0 = NaN (excluded by >= t), and an empty set
    * can never reach t > 0 against anything else. */
  private def repGraph(toks: DataFrame, idCol: String, toksCol: String,
                       t: Double, needScores: Boolean = true): (DataFrame, DataFrame) = {
    // one row per distinct NON-EMPTY token set; keep-first representative.
    // The checkpoint sits HERE (not on the raw token table): since the
    // dedup-first refactor this aggregate is the fan-out point — members,
    // reps, the prefix index and the verify join all derive from it — and
    // everything upstream (tokenization included) has exactly one
    // consumer. Lazy: the first consumer job materializes the blocks, so
    // no separate checkpoint job runs.
    val groups = toks.filter(size(col(toksCol)) > 0)
      .groupBy(col(toksCol))
      .agg(min(col(idCol)).as("_rep"), collect_list(col(idCol)).as("_ids"))
      .localCheckpoint(eager = false)
    val members = groups.select(col("_rep"), explode(col("_ids")).as("_mid"))
    val reps = groups.select(col("_rep").as(idCol), col(toksCol))
    // score-free callers (edge producers) get the short-circuiting
    // threshold verify — same accept set, no exact-count column
    val repPairs =
      if (needScores)
        Dedup.jaccardVerifySorted(
            prefixCandidates(reps, idCol, toksCol, t), reps, idCol, toksCol)
          .filter(col("jaccard") >= t)
      else
        Dedup.jaccardVerifyAtLeast(
          prefixCandidates(reps, idCol, toksCol, t), reps, idCol, toksCol, t)
    (members, repPairs)
  }
}
