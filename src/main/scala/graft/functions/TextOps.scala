package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline layer (SURVEY.md §2b):
  * tokenization, n-gram shingling, quality stats, language-ID heuristic,
  * rolling-hash fingerprints. All built-in expressions / HOFs — codegen'd,
  * no UDFs, no driver-side loops; every function is a per-row projection
  * that scales embarrassingly.
  */
object TextOps {

  /** Whitespace tokenizer (fixture text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: runs of letters, runs of digits, or single
    * other non-space chars. Same RE2/Java-compatible pattern as the oracle. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Word n-gram shingles as strings: ["a b c", "b c d", ...].
    * Empty result if the doc has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())

  /** A tiny multilingual stopword table for the language-ID heuristic. */
  val stopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "los", "por"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "ta", "zhe", "men", "zai"),
  )

  /** English-ish stopwords used for the quality-score ratio. */
  val stopwords: Seq[String] = stopwordsByLang("en")

  /** Count of tokens present in `words` (HOF filter, no explode). */
  def matchCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Stopword ratio: stopword tokens / total tokens. */
  def stopRatio(toks: Column): Column =
    matchCount(toks, stopwords).cast("double") / size(toks)

  /** Heuristic language ID: argmax of per-language stopword hit counts;
    * "und" (undetermined) when nothing matches. Deterministic tie-break by
    * language code order. */
  def langId(toks: Column): Column = {
    val scored = stopwordsByLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      (lang, matchCount(toks, words))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, score)) =>
      acc.when(score === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: min hash over word shingles (a 1-hash
    * MinHash — robust to small edits, unlike a whole-text hash). The
    * per-shingle hash is the first 15 hex chars of md5 (60 bits,
    * sign-safe in a BIGINT) rather than xxhash64: md5 is the one hash
    * every engine computes bit-identically, which lets the DuckDB
    * oracle replay the fingerprint exactly (VERDICT r10 item 6) — the
    * robustness properties are the same. Docs with fewer than
    * `shingleLen` tokens fingerprint as NULL on both engines. */
  def fingerprint(toks: Column, shingleLen: Int): Column = {
    val sh = shingles(toks, shingleLen)
    when(size(sh) > 0,
      array_min(transform(sh, x =>
        conv(substring(md5(x.cast("binary")), 1, 15), 16, 10).cast("long"))))
      .otherwise(lit(null).cast("long"))
  }

  /** SimHash-64 of a token column, computed scale-friendly: explode to
    * (id, tokenHash), one hash-aggregate pass producing the 64 bit-votes
    * (partial+final agg — no per-doc quadratic work, no UDF), then fold
    * votes into the signature.
    *
    * Returns (idCol, simhash: long).
    */
  def simhash(df: DataFrame, idCol: String, toksCol: Column): DataFrame = {
    val hashed = df
      .select(col(idCol), explode(toksCol).as("_tok"))
      .select(col(idCol), xxhash64(col("_tok")).as("_h"))
    val voteCols = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("_h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"_b$j")
    }
    val votes = hashed.groupBy(col(idCol)).agg(voteCols.head, voteCols.tail: _*)
    val sig = (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
      acc.bitwiseOR(when(col(s"_b$j") > 0, lit(1L << j)).otherwise(0L))
    }
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** Engine-NEUTRAL SimHash: same bit-vote aggregate as [[simhash]] but
    * over 60-bit md5-derived token hashes (first 15 hex chars — the
    * [[fingerprint]] recipe), so a DuckDB oracle replays the signature
    * bit-identically: per-bit votes are exact integer sums, the
    * signature folds votes with exact bit arithmetic, and md5 is
    * byte-identical across engines. Returns (idCol, simhash: long)
    * with bits 60-63 always zero. */
  def simhashPortable(df: DataFrame, idCol: String, toksCol: Column): DataFrame = {
    val hashed = df
      .select(col(idCol), explode(toksCol).as("_tok"))
      .select(col(idCol),
        conv(substring(md5(col("_tok").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("_h"))
    val voteCols = (0 until 60).map { j =>
      sum(when(shiftrightunsigned(col("_h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"_b$j")
    }
    val votes = hashed.groupBy(col(idCol)).agg(voteCols.head, voteCols.tail: _*)
    val sig = (0 until 60).foldLeft(lit(0L)) { (acc, j) =>
      acc.bitwiseOR(when(col(s"_b$j") > 0, lit(1L << j)).otherwise(0L))
    }
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures via bit_count(xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** PII scrub patterns: the categories a training-data pipeline redacts
    * before anything else touches the text. Patterns stay inside the
    * RE2 ∩ java.util.regex common subset (no backrefs, no lookaround) so
    * the same strings behave identically in Spark and any RE2 engine.
    * Order matters — specific before loose: emails before phone (an
    * email's digit run half-matches the phone pattern), SSN before
    * phone (an SSN IS a valid phone-shaped digit run). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "ipv4" -> """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b""",
    "ssn" -> """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b""",
    "phone" -> """\+?[0-9][0-9()\-. ]{7,}[0-9]""")

  /** Redact every PII category to its `[CATEGORY]` placeholder — one
    * regexp_replace per category, all codegen'd, per-row only. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }

  /** Per-category PII hit counts (the audit side of [[scrubPii]]):
    * map(category -> matches) for flagging documents, not just cleaning
    * them. */
  def piiCounts(text: Column): Column =
    map(piiPatterns.flatMap { case (name, pat) =>
      Seq(lit(name), size(regexp_extract_all(text, lit(pat), lit(0))))
    }: _*)
}
