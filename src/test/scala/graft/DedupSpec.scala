package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextOps
import graft.queries.TextPipeline

/** Recall gates for the near-dup family (VERDICT r1 item 2): LSH paths
  * must recover >= 0.9 of the brute-force ground truth, not just run. */
class DedupSpec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id1").cast("long"), col("id2").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash near-dup recall >= 0.9 vs brute-force jaccard ground truth") {
    val truth = pairSet(TextPipeline.jaccardPairs(spark, sf0001))
    val found = pairSet(TextPipeline.minhashPairs(spark, sf0001))
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    val recall = (truth & found).size.toDouble / truth.size
    // Verified candidates can't exceed the threshold filter, so precision
    // vs the same-threshold truth is 1.0 by construction; check it too.
    assert(found.subsetOf(truth), "verified pairs must all be true pairs")
    assert(recall >= 0.9, s"recall $recall < 0.9 (${found.size}/${truth.size})")
  }

  test("DEFAULT-family minhash keeps its own recall gate (portable took the query)") {
    // doc_minhash_pairs now runs the engine-neutral family; the xxhash64
    // default still powers the index/streaming paths and must hold the
    // same recall bar on its own
    val truth = pairSet(TextPipeline.jaccardPairs(spark, sf0001))
    val found = pairSet(Dedup.minhashNearDups(
      Tables.documents(spark, sf0001), "doc_id", "text",
      numHashes = 128, bands = 16, threshold = 0.8))
    val recall = (truth & found).size.toDouble / truth.size
    assert(found.subsetOf(truth) && recall >= 0.9,
      s"default-family recall $recall < 0.9")
  }

  test("Md5ShingleSet == the builtin md5/conv HOF chain, bit for bit") {
    // the fused expression must produce exactly what the oracle-visible
    // builtin recipe produces — this equality is what makes the DuckDB
    // replay of the portable minhash family sound
    val docs = Tables.documents(spark, sf0001)
    for (n <- Seq(1, 3)) {
      val hof = array_sort(array_distinct(transform(
        TextOps.shingles(TextOps.tokens(col("text")), n),
        x => conv(substring(md5(x.cast("binary")), 1, 15), 16, 10).cast("long"))))
      val mismatch = docs.select(
          graft.functions.Md5ShingleSet(col("text"), n).as("fused"), hof.as("hof"))
        .filter(col("fused") =!= col("hof")).count()
      assert(mismatch == 0L, s"n=$n: fused md5 shingle set diverged from the HOF chain")
    }
  }

  test("portable simhash: hamming bound holds and the 4x15-bit pigeonhole is lossless") {
    val docs = Tables.documents(spark, sf0001)
    val found = Dedup.simhashNearDupsPortable(docs, "doc_id", "text", maxHamming = 3)
    assert(found.filter(col("hamming") > 3).count() === 0)
    val sigs = TextOps.simhashPortable(docs, "doc_id", TextOps.tokens(col("text")))
    val a = sigs.select(col("doc_id").as("id1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("id2"), col("simhash").as("h2"))
    val truth = pairSet(
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .filter(TextOps.hamming(col("h1"), col("h2")) <= 3))
    assert(pairSet(found) === truth)
    // the signature really is 60-bit: the top 4 bits never set
    assert(sigs.filter(shiftrightunsigned(col("simhash"), 60) =!= 0L).count() === 0)
  }

  test("asymmetric near-dup flags incoming-vs-ref only, never within a side") {
    import spark.implicits._
    def words(seed: Int) =
      (0 until 20).map(i => s"w${seed}_$i").mkString(" ")
    val ref = Seq(
      (1L, words(1)), (2L, words(2)), (3L, words(3))).toDF("doc_id", "text")
    val nearOf2 = words(2).split(" ").updated(0, "CHANGED").mkString(" ")
    val twin = words(9) // 104/105 duplicate each other, neither matches ref
    val incoming = Seq(
      (101L, words(1)),   // exact copy of ref 1
      (102L, nearOf2),    // 19/20 tokens of ref 2 -> J = 19/21 ≈ 0.905
      (103L, words(7)),   // novel
      (104L, twin), (105L, twin)).toDF("doc_id", "text")
    val got = Dedup.minhashNearDupsAgainst(ref, incoming, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("inc_id") ->
        (r.getAs[Long]("ref_id"), r.getAs[Double]("jaccard"))).toMap
    assert(got.keySet == Set(101L, 102L),
      s"only cross-side near-dups may flag (104/105 pair each other, not ref): $got")
    assert(got(101L) == (1L, 1.0))
    assert(got(102L)._1 == 2L && got(102L)._2 >= 0.9)
    // ground truth sweep: flags == the brute-force cross-side pair scan
    val truth = incoming.as("i").crossJoin(ref.as("r"))
      .select(col("i.doc_id").as("inc_id"), col("r.doc_id").as("ref_id"),
        (size(array_intersect(split(col("i.text"), " "), split(col("r.text"), " ")))
          .cast("double") /
          size(array_union(split(col("i.text"), " "), split(col("r.text"), " "))))
          .as("j"))
      .filter(col("j") >= 0.8)
      .select("inc_id").collect().map(_.getLong(0)).toSet
    assert(got.keySet == truth, s"asymmetric flags must equal brute force: $truth")
  }

  test("portable asymmetric near-dup equals brute force; within-side never flags") {
    import spark.implicits._
    def words(seed: Int) =
      (0 until 20).map(i => s"w${seed}_$i").mkString(" ")
    val ref = Seq(
      (1L, words(1)), (2L, words(2)), (3L, words(3))).toDF("doc_id", "text")
    val nearOf2 = words(2).split(" ").updated(0, "CHANGED").mkString(" ")
    val twin = words(9)
    val incoming = Seq(
      (101L, words(1)), (102L, nearOf2), (103L, words(7)),
      (104L, twin), (105L, twin)).toDF("doc_id", "text")
    val got = Dedup.minhashNearDupsAgainstPortable(ref, incoming, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("inc_id") ->
        (r.getAs[Long]("ref_id"), r.getAs[Double]("jaccard"))).toMap
    assert(got.keySet == Set(101L, 102L),
      s"portable family must flag exactly the cross-side near-dups: $got")
    assert(got(101L) == (1L, 1.0))
    assert(got(102L)._1 == 2L && got(102L)._2 >= 0.9)
  }

  test("exact dedup is idempotent and keeps lowest id") {
    val docs = Tables.documents(spark, sf0001)
    val deduped = Dedup.exactKeepFirst(docs, "doc_id", "text")
    val n = deduped.count()
    assert(n <= docs.count())
    // keep_id must be the min doc_id among copies of the same hash
    val bad = deduped.join(
        docs.select(col("doc_id"), sha2(col("text"), 256).as("text_hash")),
        "text_hash")
      .groupBy(col("text_hash"), col("keep_id"))
      .agg(min(col("doc_id")).as("true_min"))
      .filter(col("keep_id") =!= col("true_min"))
    assert(bad.count() === 0)
  }

  test("maxBucket valve drops degenerate buckets; exact-dedup pre-pass restores them") {
    import spark.implicits._
    // 40 identical docs -> every band bucket holds all 40
    val clones = (1L to 40L).map(i => (i, "all the same words here")).toDF("doc_id", "text")
    val capped = Dedup.minhashNearDups(clones, "doc_id", "text", maxBucket = 10)
    assert(capped.count() === 0, "oversize bucket must not explode into pairs")
    val uncapped = Dedup.minhashNearDups(clones, "doc_id", "text")
    assert(uncapped.count() === 40L * 39 / 2, "default cap must not fire here")
    // the production recipe: exact dedup first — the identical mass
    // collapses to one representative, no degenerate buckets remain
    val reps = Dedup.exactKeepFirst(clones, "doc_id", "text")
    assert(reps.count() === 1)
  }

  test("a capped bucket masks, not suppresses: pair still found via a later band") {
    import spark.implicits._
    // synthetic band-hash arrays: docs 1 and 2 agree in band 0 AND band 1;
    // band 0's bucket (hash 100) holds 5 docs and gets capped at 4, band
    // 1's bucket (hash 777) holds only the pair. Pre-fix, FirstBandMatch
    // saw the unmasked signatures, said "first match = band 0", and the
    // pair vanished with the capped bucket even though band 1 agreed.
    val withBh = Seq(
      (1L, Seq(100L, 777L)), (2L, Seq(100L, 777L)),
      (3L, Seq(100L, 11L)), (4L, Seq(100L, 12L)), (5L, Seq(100L, 13L)))
      .toDF("id", "_bh")
    val pairs = Dedup.candidatePairsFirstBand(withBh, "id", maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"pair must surface from its first SURVIVING agreeing band: $pairs")
    // and with no capping the masking path is inert: same pairs as the
    // distinct-based generator on the same input
    val viaDistinct = Dedup.candidatePairs(
      withBh.select(col("id"), col("_bh"),
        posexplode(col("_bh")).as(Seq("band", "band_hash")))
        .select(col("id"), col("band"), col("band_hash")),
      "id", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFirstBand = Dedup.candidatePairsFirstBand(withBh, "id", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaFirstBand === viaDistinct, s"$viaFirstBand vs $viaDistinct")
  }

  test("simhash pairs respect the hamming bound and recover banded mass") {
    val docs = Tables.documents(spark, sf0001)
    val found = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
    assert(found.filter(col("hamming") > 3).count() === 0)
    // Pigeonhole guarantee: hamming<=3 over 4 bands of 16 bits means at
    // least one band is identical, so candidate generation is lossless —
    // verify against brute-force simhash pairs.
    val sigs = TextOps.simhash(docs, "doc_id", TextOps.tokens(col("text")))
    val a = sigs.select(col("doc_id").as("id1"), col("simhash").as("h1"))
    val b = sigs.select(col("doc_id").as("id2"), col("simhash").as("h2"))
    val truth = pairSet(
      a.crossJoin(b).filter(col("id1") < col("id2"))
        .filter(TextOps.hamming(col("h1"), col("h2")) <= 3))
    assert(pairSet(found) === truth)
  }

  test("span dedup catches boilerplate the fixed segment grid misses (unaligned duplication)") {
    // two docs share an identical 20-token passage, OFFSET by 3 tokens
    // in the second doc: no fixed 16-token segment aligns across docs,
    // but stride-1 spans must flag exactly the 5 windows that fit
    // entirely inside the shared passage in both docs
    import spark.implicits._
    val passage = (1 to 20).map(i => s"p$i").mkString(" ")
    val docA = passage + " " + (1 to 20).map(i => s"a$i").mkString(" ")
    val docB = "b1 b2 b3 " + passage + " " + (1 to 17).map(i => s"c$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("spansrc")
    dir.toFile.deleteOnExit()
    Seq((0L, docA, "en", "s1", docA.length.toLong),
        (1L, docB, "en", "s2", docB.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val shared = TextPipeline.spanDedup(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_shared_spans
    assert(shared == Map(0L -> 5L, 1L -> 5L),
      s"unaligned duplication must surface as the 5 in-passage spans: $shared")
    val dupSegs = TextPipeline.segmentDedup(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_dup_segs
    assert(dupSegs.values.forall(_ == 0L),
      s"the fixed grid must miss it (the operator's reason to exist): $dupSegs")
  }
}
