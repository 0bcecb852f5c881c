package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SetSimJoin}

/** Dev-only stage profiler for the document near-dup pipelines (not part
  * of the shipped library or the driver contract; run with
  * `sbt "Test/runMain graft.ProfileMain [sfDir]"`). Reps matter: rep 1
  * carries JVM/codegen warmup. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    val docs = Tables.documents(spark, dir)
    docs.count()

    if (args.contains("ngram")) {
      // stage-by-stage decomposition of the ngram pipeline (the r3 bench
      // hotspot): where do the seconds go?
      val grams = graft.functions.ShingleHashSet(col("text"), 3)
      for (rep <- 1 to 2) {
        val toks = docs.select(col("doc_id"), grams.as("toks"))
          .filter(size(col("toks")) > 0)
        t(s"rep$rep ngram tokenize")(toks)
        val cached = toks.localCheckpoint()
        val t0 = 0.8
        val sized = cached.select(col("doc_id"), col("toks").as("_tk"),
          size(col("toks")).as("_sz"))
        t(s"rep$rep ngram df-count")(sized.select(explode(col("_tk")).as("_tok"))
          .groupBy(col("_tok")).agg(count(lit(1)).as("_df")))
        t(s"rep$rep ngram candidates")(
          SetSimJoin.prefixCandidates(cached, "doc_id", "toks", t0))
        t(s"rep$rep ngram full")(SetSimJoin.jaccardSelfJoin(cached, "doc_id", "toks", t0))
      }
    } else if (args.contains("cc")) {
      // doc_dedup_clusters decomposition: PPJoin edge generation vs the
      // connected-components rounds vs the full query
      for (rep <- 1 to 3) {
        val toks = docs.select(col("doc_id"), Dedup.hashedTokenSet(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
        val cachedToks = toks.localCheckpoint()
        t(s"rep$rep cc candidates")(
          SetSimJoin.prefixCandidates(cachedToks, "doc_id", "toks", 0.8))
        val cands = SetSimJoin.prefixCandidates(cachedToks, "doc_id", "toks", 0.8)
          .localCheckpoint()
        t(s"rep$rep cc verify-only")(
          Dedup.jaccardVerifySorted(cands, cachedToks, "doc_id", "toks")
            .filter(col("jaccard") >= 0.8))
        t(s"rep$rep cc edges")(
          SetSimJoin.jaccardEdges(toks, "doc_id", "toks", 0.8))
        val edges = SetSimJoin.jaccardEdges(toks, "doc_id", "toks", 0.8)
          .localCheckpoint()
        t(s"rep$rep cc rounds-only")(
          graft.operators.ConnectedComponents.components(
            edges, "id2", "id1", edgesNormalized = true))
        t(s"rep$rep cc full query")(
          graft.queries.TextPipeline.dedupClusters(spark, dir))
      }
    } else if (args.contains("probe")) {
      // doc_cluster_index_probe decomposition: which leg of the probe
      // path (delta-internal PPJoin, candidate generation against the
      // persisted postings, verify, quotient CC) carries the cost?
      val idx = graft.queries.TextPipeline.ensureProbeClusterIndex(spark, dir)
      val incoming = Tables.documents(spark, dir)
        .filter(col("source") === "src19").localCheckpoint()
      // pin the keep-boundary NOW: Dataset.rdd is a lazy val, so reading
      // it inside the cleanup filter would allocate its id AFTER every
      // rep-1 checkpoint RDD, keep them all persisted, and skew reps 2-3
      // with exactly the storage bloat this profiler exists to measure
      val keepId = incoming.rdd.id
      for (rep <- 1 to 3) {
        val incToks = incoming.select(col("doc_id"),
          Dedup.hashedTokenSet(col("text")).as("_toks"))
        t(s"rep$rep probe tokenize")(incToks)
        val cached = incToks.localCheckpoint()
        t(s"rep$rep probe inner-edges")(
          SetSimJoin.jaccardEdges(cached, "doc_id", "_toks", 0.8))
        t(s"rep$rep probe full")(
          graft.operators.ClusterIndex.probe(spark, idx, incoming,
            "doc_id", "text"))
        t(s"rep$rep probe e2e query")(
          graft.queries.TextPipeline.clusterIndexProbe(spark, dir))
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(_.id <= keepId).foreach(_.unpersist(true))
      }
    } else {
      for (rep <- 1 to 3) {
        t(s"rep$rep minhashNearDups")(Dedup.minhashNearDups(docs, "doc_id", "text"))
        t(s"rep$rep jaccardSelfJoin") {
          val toks = docs.select(col("doc_id"), Dedup.hashedTokenSet(col("text")).as("toks"))
          SetSimJoin.jaccardSelfJoin(toks, "doc_id", "toks", 0.8)
        }
        t(s"rep$rep simhashNearDups")(Dedup.simhashNearDups(docs, "doc_id", "text"))
      }
    }
    spark.stop()
  }
}
