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
  * pick the most frequent pair (a one-ROW collect, bounded by
  * construction), rewrite the symbol arrays with a left-to-right
  * non-overlapping fold (a codegen'd higher-order aggregate — no UDF).
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

  /** Learn `numMerges` merge rules from the corpus. Each round is one
    * distributed pair-count job plus a one-row collect; the symbol
    * table re-checkpoints per round. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    var syms = wordTable(docs, textCol).localCheckpoint(eager = false)
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = syms
        .select(explode(adjacentPairs(col("symbols"))).as("p"), col("freq"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(rank, l, r, f)
        syms = syms
          .select(applyMerge(col("symbols"), l, r).as("symbols"), col("freq"))
          .localCheckpoint(eager = false)
        rank += 1
      }
    }
    out.result()
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
