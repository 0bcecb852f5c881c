package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair encoding) tokenizer training — Sennrich,
  * Haddow, Birch, ACL'16 (public literature): the vocabulary-learning
  * step of an LLM data pipeline.
  *
  * The textbook structure, kept faithfully BECAUSE it is the scale
  * shape: BPE trains on the WORD-FREQUENCY table, not the raw corpus.
  * One distributed pass contracts the corpus to (word, freq) — Heaps'
  * law keeps that table DataFrame-sized even at 100 TB — and every
  * merge round then runs on the contracted table: count adjacent symbol
  * pairs weighted by word frequency (one map-side-combined groupBy),
  * collect the top-`batchSize` pairs (a bounded collect), accept as
  * many non-interacting merges as provably match sequential BPE (see
  * [[train]]), and rewrite the symbol arrays with left-to-right
  * non-overlapping folds (codegen'd higher-order aggregates — no UDF).
  * Each round localCheckpoints lazily so the iterative plan never grows.
  *
  * Determinism: ties break on (freq desc, left asc, right asc), so the
  * learned merge table is identical run-to-run at any parallelism —
  * BpeSpec holds it against a sequential reference implementation.
  */
object Bpe {

  /** One learned merge rule. */
  case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Split a word into single-character symbols with an end-of-word
    * marker on the last one (the classic formulation — "st" inside a
    * word and "st</w>" at its end are different statistics). */
  private def charSymbols(word: Column): Column =
    transform(split(word, ""),
      (c, i) => when(i === size(split(word, "")) - 1, concat(c, lit("</w>")))
        .otherwise(c))

  /** Adjacent symbol pairs of an array as (left, right) structs. */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2),
        i => struct(element_at(syms, i + 1).as("l"),
          element_at(syms, i + 2).as("r"))))
      .otherwise(array())

  /** Left-to-right non-overlapping merge of (l, r) -> l||r in one fold:
    * if the accumulator's last symbol is `l` AND the incoming is `r`,
    * replace the last with the merged symbol, else append. After a
    * merge the new last symbol is l||r, which cannot equal `l` (r is
    * non-empty), so overlapping runs merge exactly like sequential BPE. */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    val merged = l + r
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) >= 1 && element_at(acc, -1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))
  }

  /** The word-frequency table with initial character symbols. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(charSymbols(col("word")).as("symbols"), col("freq"))

  /** Learn `numMerges` merge rules from the corpus, BATCHING compatible
    * merges per distributed round (r6 verdict item 4: one Spark job per
    * merge makes the driver loop the bottleneck at real merge counts —
    * 30k+ sequential jobs for a production tokenizer).
    *
    * Each round: count pairs once, collect the top `batchSize` rows
    * (bounded), then accept pairs in rank order while the round stays
    * PROVABLY equivalent to sequential BPE:
    *
    *  - stop at the first pair sharing a symbol (left, right, or merged
    *    name) with an accepted pair — its count changes once the earlier
    *    merge applies, so its precomputed rank is stale;
    *  - stop on an equal-frequency tie hazard: a merge can create new
    *    pairs with count up to the count of an old pair containing its
    *    symbols, so a not-accepted pair with freq == the candidate's
    *    that touches an accepted symbol (or possible unseen ties at the
    *    collect horizon) could tie-sort ahead of the candidate in the
    *    sequential order — accept only what no such tie can contest.
    *
    * Disjointness makes every accepted pair's count exact (a merge only
    * changes counts of pairs sharing its symbols), the no-skip rule
    * makes it maximal at its sequential step, and the tie guard makes it
    * win the (freq desc, l, r) tiebreak — so the learned table is
    * IDENTICAL to one-merge-per-round training (BpeSpec holds batched ≡
    * sequential-reference on fixtures and random corpora), with
    * jobs-per-merge < 1. `batchSize = 1` degenerates to the classic
    * loop. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            batchSize: Int = 16): Seq[Merge] =
    trainWithStats(docs, textCol, numMerges, batchSize)._1

  /** As [[train]], also returning the number of pair-count ROUNDS (Spark
    * job waves) — the jobs-per-merge diagnostic BpeSpec gates on. */
  def trainWithStats(docs: DataFrame, textCol: String, numMerges: Int,
                     batchSize: Int = 16): (Seq[Merge], Int) = {
    require(batchSize >= 1, "batchSize must be >= 1")
    var syms = wordTable(docs, textCol).localCheckpoint(eager = false)
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var rounds = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = syms
        .select(explode(adjacentPairs(col("symbols"))).as("p"), col("freq"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(batchSize).collect()
      rounds += 1
      if (top.isEmpty) exhausted = true
      else {
        val horizonF = top.last.getLong(2)
        val touched = scala.collection.mutable.Set[String]()
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var stop = false
        val it = top.iterator
        while (!stop && it.hasNext && rank + accepted.size < numMerges) {
          val row = it.next()
          val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
          val overlaps = touched(l) || touched(r)
          val acceptedKeys = accepted.map(m => (m._1, m._2)).toSet
          // (the first pair of a round is always safe: nothing touched,
          // no new pairs exist yet — it is exactly sequential BPE's pick)
          lazy val tieHazard = accepted.nonEmpty && (
            (top.length == batchSize && f == horizonF) ||
              top.exists { q =>
                val (ql, qr) = (q.getString(0), q.getString(1))
                q.getLong(2) == f && !(ql == l && qr == r) &&
                  !acceptedKeys.contains((ql, qr)) &&
                  (touched(ql) || touched(qr))
              })
          if (overlaps || tieHazard) stop = true
          else {
            accepted += ((l, r, f))
            touched += l; touched += r; touched += (l + r)
          }
        }
        accepted.foreach { case (l, r, f) =>
          out += Merge(rank, l, r, f); rank += 1
        }
        syms = syms
          .select(accepted.foldLeft(col("symbols")) { (sc, m) =>
            applyMerge(sc, m._1, m._2)
          }.as("symbols"), col("freq"))
          .localCheckpoint(eager = false)
      }
    }
    (out.result(), rounds)
  }

  /** Tokenize a text column with a learned merge list: the same
    * char-split + fold chain, one fold per rule in rank order. Returns
    * array<string> of subword tokens per word, flattened per text. */
  def applyBpe(text: Column, merges: Seq[Merge]): Column = {
    val words = filter(split(text, " "), w => length(w) > 0)
    flatten(transform(words, w =>
      merges.foldLeft(charSymbols(w)) { (s, mr) => applyMerge(s, mr.left, mr.right) }))
  }
}
