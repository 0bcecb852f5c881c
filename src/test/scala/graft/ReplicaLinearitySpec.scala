package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Gates the SCALING.md methodology: ScaleGen's re-keyed replicas use
  * DISJOINT token namespaces, so a k× fixture must produce EXACTLY k×
  * the pair/cluster output of the base — any deviation means replicas
  * interacted (cross-copy near-dups faking a super-linear slope) or an
  * operator leaked state across what should be independent sub-corpora.
  * Runs at sf0.001 with k=2 so the gate is cheap enough for every build.
  */
class ReplicaLinearitySpec extends SparkSpec {

  private lazy val twoCopies: String = {
    val d = Files.createTempDirectory("replin").toString
    val base = Tables.documents(spark, sf0001)
    val stride = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val copy = base
      .withColumn("doc_id", col("doc_id") + lit(stride))
      .withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(lit("c1_"), t)), " "))
    base.unionByName(copy)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def count(name: String, dir: String): Long =
    SparkEntry.queries(name)(spark, dir).count()

  test("EXACT pair outputs scale exactly x2 on a 2x disjoint-replica corpus") {
    for (q <- Seq("doc_jaccard_pairs", "doc_exact_dedup", "doc_span_dedup")) {
      val (one, two) = (count(q, sf0001), count(q, twoCopies))
      assert(two == 2 * one,
        s"$q: expected exactly 2x${one}, got $two — replicas interacted " +
          "or the operator leaks across independent sub-corpora")
    }
  }

  test("LSH pair output scales ~x2 (copy-prefixed tokens re-roll the hash dice)") {
    // minhash recall at a fixed hash family is corpus-dependent: the
    // prefixed replica's signatures differ, so its recall wobbles around
    // copy 0's. Exact x2 is NOT expected — but a deviation beyond recall
    // noise would still expose cross-copy pairs (each would add, never
    // remove). Bound the ratio instead of pinning it.
    val (one, two) = (count("doc_minhash_pairs", sf0001),
      count("doc_minhash_pairs", twoCopies))
    val ratio = two.toDouble / one
    assert(ratio > 1.9 && ratio < 2.1,
      s"doc_minhash_pairs: 2x corpus gave ${ratio}x pairs ($one -> $two)")
  }

  test("cluster COUNT doubles while the size histogram is preserved") {
    def hist(dir: String): Map[Long, Long] =
      SparkEntry.queries("doc_dedup_clusters")(spark, dir)
        .groupBy(col("cluster_size")).agg(sum(lit(1L)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (h1, h2) = (hist(sf0001), hist(twoCopies))
    assert(h2 == h1.map { case (sz, n) => sz -> 2 * n },
      s"every cluster size class must double: $h1 vs $h2")
  }
}
