package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Gates for distributed BPE training: the learned merge table must
  * equal a sequential reference implementation exactly (same ranks,
  * pairs, frequencies), the classic hand example must come out, and
  * applyBpe must tokenize consistently with the learned rules. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE on a word-frequency map. */
  private def refTrain(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var tbl: Seq[(Vector[String], Long)] = words.toSeq.map { case (w, f) =>
      (w.dropRight(1).map(_.toString).toVector :+ (w.last.toString + "</w>"), f)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      tbl.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((l, r), f) => (-f, l, r) }
        out += ((l, r, f))
        tbl = tbl.map { case (syms, wf) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), wf)
        }
        k += 1
      }
    }
    out.result()
  }

  test("classic hand corpus learns the expected first merges") {
    // 5x "low", 2x "lower", 6x "newest", 3x "widest" (Sennrich's example
    // shape): the end-of-word marker rides on the last char, so the
    // dominant merges are (e, s) freq 9 then (es, t</w>) freq 9, and
    // "est</w>" exists as one symbol after rank 1; (l, o) freq 7 is next.
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .mkString(" ")
    val merges = Bpe.train(Seq(docs).toDF("text"), "text", 3)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t</w>"), ("l", "o")))
    assert(merges.map(_.freq) == Seq(9L, 9L, 7L))
  }

  test("distributed training equals the sequential reference on the fixture") {
    val docs = Tables.documents(spark, sf0001)
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refTrain(words, 12)
    val got = Bpe.train(docs, "text", 12).map(m => (m.left, m.right, m.freq))
    assert(got == expect)
  }

  test("applyBpe tokenizes with the learned rules (merged symbols appear, ranks respected)") {
    val docs = Seq("aa aa aa ab").toDF("text")
    val merges = Bpe.train(docs, "text", 2)
    // "aa" x3 makes (a, a</w>) the top pair (freq 3), then (a, b</w>)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "a</w>"), ("a", "b</w>")))
    val toks = Seq("aa ab ba").toDF("text")
      .select(Bpe.applyBpe(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // "aa" -> [aa</w>], "ab" -> [ab</w>], "ba" -> [b, a</w>] (no rule for b+a)
    assert(toks == Seq("aa</w>", "ab</w>", "b", "a</w>"))
  }

  test("batched rounds stay equal to sequential AND run fewer jobs than merges") {
    val docs = Tables.documents(spark, sf0001)
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refTrain(words, 20)
    val (merges, rounds) = Bpe.trainWithStats(docs, "text", 20, batchSize = 16)
    assert(merges.map(m => (m.left, m.right, m.freq)) == expect)
    assert(merges.map(_.rank) == (0 until merges.length))
    // the point of batching: strictly fewer pair-count jobs than merges
    assert(rounds < merges.length,
      s"expected batching to beat one-job-per-merge, got $rounds rounds for ${merges.length} merges")
  }

  test("batched == sequential reference on random corpora (small alphabets force ties)") {
    // small alphabets maximize pair interactions and equal-frequency
    // ties — exactly the cases where a naive batcher diverges from
    // sequential BPE. The tie/overlap guards must keep them identical.
    val rng = new scala.util.Random(20260813L)
    for (trial <- 1 to 12) {
      val alpha = Seq("a", "b", "c", "d").take(2 + trial % 3)
      val nWords = 30 + rng.nextInt(40)
      val corpus = (1 to nWords).map { _ =>
        (1 to (1 + rng.nextInt(5))).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      }
      val words = corpus.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val expect = refTrain(words, 10)
      val got = Bpe.train(corpus.mkString(" ") :: Nil toDF "text", "text", 10, batchSize = 8)
        .map(m => (m.left, m.right, m.freq))
      assert(got == expect, s"trial $trial diverged: corpus=${corpus.take(10)}...")
    }
  }

  test("fertility query: bounded by chars/words and monotone in merge count") {
    // doc_bpe_fertility's invariants: with 0 merges every word splits to
    // chars (fertility == chars/words exactly); more merges can only
    // lower the subword count, never below 1 per word.
    val fert10 = graft.queries.TextPipeline.bpeFertility(spark, sf0001)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("total_words"), r.getAs[Long]("total_subwords"))).toMap
    assert(fert10.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
    val words = filter(split(col("text"), " "), w => length(w) > 0)
    val bounds = docs
      .select(col("source"), size(words).as("w"),
        aggregate(transform(words, w => length(w)), lit(0), (a, x) => a + x).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("w")).as("tw"), sum(col("c")).as("tc"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tw"), r.getAs[Long]("tc"))).toMap
    fert10.foreach { case (src, (tw, ts)) =>
      val (bw, bc) = bounds(src)
      assert(tw == bw, s"$src word count drifted")
      assert(ts >= tw && ts <= bc,
        s"$src subwords $ts outside [words $tw, chars $bc]")
    }
    // 10-merge tokenization must strictly beat the 0-merge char split
    // somewhere (the corpus repeats common pairs by construction)
    assert(fert10.exists { case (src, (_, ts)) => ts < bounds(src)._2 },
      "10 merges never reduced the subword count below the char split")
  }
}
