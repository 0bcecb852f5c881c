package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, ConnectedComponents, Dedup, SetSimJoin, Similarity}

/** Degenerate-input gates: every operator must return the semantically
  * correct EMPTY or small result, not throw, when handed the shapes
  * real pipelines produce at the margins — empty tables, single rows,
  * all-identical corpora, k larger than the corpus. These are the
  * inputs that surface lurking .head()s, 0-partition plans and
  * divide-by-zero aggregates. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: empty edge set -> empty assignment (both paths)") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.components(empty, "a", "b").count() == 0L)
    assert(ConnectedComponents.components(empty, "a", "b",
      localTailMaxEdges = 0L).count() == 0L)
  }

  test("connected components: single edge and single self-loop") {
    assert(ConnectedComponents.components(
      Seq((7L, 3L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap == Map(3L -> 3L, 7L -> 3L))
    assert(ConnectedComponents.components(
      Seq((5L, 5L)).toDF("a", "b"), "a", "b").count() == 0L)
  }

  test("jaccard self-join: empty corpus, single doc, and all-identical corpus") {
    val schema = Seq.empty[(Long, Seq[Long])].toDF("id", "toks")
    assert(SetSimJoin.jaccardSelfJoin(schema, "id", "toks", 0.8).count() == 0L)
    val one = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "toks")
    assert(SetSimJoin.jaccardSelfJoin(one, "id", "toks", 0.8).count() == 0L)
    // 4 identical docs: the dedup-first path must emit all C(4,2) pairs
    // at jaccard exactly 1.0 without ever probing the prefix index
    val same = (1L to 4L).map(i => (i, Seq(10L, 20L, 30L))).toDF("id", "toks")
    val got = SetSimJoin.jaccardSelfJoin(same, "id", "toks", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b, 1.0)).toSet)
    // empty token sets can never match (brute force scores 0/0 = NaN)
    val empties = Seq((1L, Seq.empty[Long]), (2L, Seq.empty[Long])).toDF("id", "toks")
    assert(SetSimJoin.jaccardSelfJoin(empties, "id", "toks", 0.8).count() == 0L)
  }

  test("knn join: k larger than the corpus returns all non-self neighbors") {
    val corpus = (0L until 4L).map(i =>
      (i, Seq.tabulate(8)(d => (if (d == i) 1f else 0.01f * (d + 1) * (i + 1))))).toDF("vec_id", "embedding")
    val got = Similarity.knnJoin(corpus, k = 10, nlist = 2, nprobe = 2)
    // every probe sees every cell (nprobe = nlist), so k > n-1 yields
    // exactly n-1 neighbors per probe and never a self pair
    assert(got.filter(col("q_id") === col("vec_id")).count() == 0L)
    val perProbe = got.groupBy(col("q_id")).count()
      .collect().map(_.getLong(1)).toSet
    assert(perProbe == Set(3L))
  }

  test("as-of join: empty right side attaches nulls, empty left returns empty") {
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "payload")
    val r = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "v")
    val got = AsofJoin.asof(l, r, "k", "ts", "ts", Seq("v")).collect()
    assert(got.length == 1 && got.head.isNullAt(got.head.fieldIndex("asof_v")))
    val lEmpty = Seq.empty[(Long, Long, String)].toDF("k", "ts", "payload")
    val rFull = Seq((1L, 5L, 99L)).toDF("k", "ts", "v")
    assert(AsofJoin.asof(lEmpty, rFull, "k", "ts", "ts", Seq("v")).count() == 0L)
  }

  test("exact dedup: empty input and all-distinct input") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactKeepFirst(empty, "doc_id", "text").count() == 0L)
    val distinct = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val got = Dedup.exactKeepFirst(distinct, "doc_id", "text")
    assert(got.count() == 2L &&
      got.filter(col("n_copies") =!= 1).count() == 0L)
  }

  test("source overlap: identical, disjoint, single-source, and sub-shingle inputs") {
    import graft.queries.TextPipeline.sourceOverlapFrom
    // identical shingle sets -> jaccard exactly 1.0 (4 tokens = 2 shingles)
    val same = Seq(("a", "x y z w"), ("b", "x y z w")).toDF("source", "text")
    val sameGot = sameKeyed(sourceOverlapFrom(same))
    assert(sameGot == Map(("a", "b") -> (2L, 1.0)))
    // disjoint sources still get a pair row, zero-filled
    val disj = Seq(("a", "x y z"), ("b", "p q r")).toDF("source", "text")
    assert(sameKeyed(sourceOverlapFrom(disj)) == Map(("a", "b") -> (0L, 0.0)))
    // one source -> no pairs; all-short docs -> no grams -> no pairs
    assert(sourceOverlapFrom(Seq(("a", "x y z")).toDF("source", "text")).count() == 0L)
    assert(sourceOverlapFrom(Seq(("a", "x y"), ("b", "p")).toDF("source", "text"))
      .count() == 0L)
  }

  private def sameKeyed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
      (r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toMap

  test("dsir weights: empty target slice and all-target corpus both score every doc") {
    import graft.queries.TextPipeline.dsirWeightsFrom
    val docs = Seq(
      (1L, "fr", "le chat noir"),
      (2L, "de", "der schwarze kater"),
      (3L, "fr", "le chien blanc")).toDF("doc_id", "lang", "text")
    // no 'en' docs at all: c_t = 0 everywhere, ln(0 + v) normalizer —
    // must run (no log-of-zero) and weigh every doc
    val noTgt = dsirWeightsFrom(docs).collect()
    assert(noTgt.length == 3 && noTgt.forall(_.getAs[Long]("n_tokens") == 3L))
    // fr as target: every fr token appears ONLY in fr docs, so c_t ==
    // c_r -> q = 0 exactly for them; both fr docs (3 tokens each) must
    // land on the identical weight, and the de doc strictly below
    val fr = dsirWeightsFrom(docs, targetLang = "fr").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_q")).toMap
    assert(fr(1L) == fr(3L), s"pure-target docs must tie: $fr")
    assert(fr(2L) < fr(1L), s"off-target doc must score below: $fr")
  }

  test("label outliers: planted far vector is flagged, tight cluster is not") {
    import graft.queries.Vectors.labelOutliersFrom
    // 40 vectors in a tight ball + one far point, one label; the far
    // point's z-score dominates even though it inflates sd itself
    val rows = (0 until 40).map { i =>
      (i.toLong, 0, Seq(0.1f * (i % 3), 0.1f * ((i + 1) % 3), 0f, 0f))
    } :+ (99L, 0, Seq(50f, 50f, 50f, 50f))
    val got = labelOutliersFrom(rows.toDF("vec_id", "label", "embedding"))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got == Set(99L), s"flagged $got")
    // all-identical vectors: sd = 0 -> 0/0 = NaN -> nothing flagged
    val flat = (0 until 5).map(i => (i.toLong, 0, Seq(1f, 2f, 3f, 4f)))
    assert(labelOutliersFrom(flat.toDF("vec_id", "label", "embedding")).count() == 0L)
  }
}
