package graft

import org.apache.spark.sql.SparkSession

/** BM25 slope evidence (SCALING.md): times the persisted-index serve
  * path (`TermIndex.topK`) against the closed-form recompute
  * (`TextPipeline.bm25TopK`) on the same fixture dir, plus the
  * one-time build. Usage:
  *   sbt "Test/runMain graft.TermScaleProfile <fixtureDir> [runs]"
  * The index should be near-flat in corpus size (query terms' buckets
  * only); the recompute's tf pass is linear — the crossover is the
  * whole point of the fourth family. */
object TermScaleProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_termprof/" +
      Tables.fixtureKey(dir)
    // fresh build every invocation: the build slope is part of the story
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    val (buildS, _) = time {
      graft.operators.TermIndex.build(docs, "doc_id", "text", idx, nBuckets)
    }
    val queries = Seq((1L, "spark table join"), (2L, "data stream window agg"),
      (3L, "dup merge"), (4L, "customer query fast")).toDF("query_id", "q")
    val serve = (1 to runs).map { _ =>
      time(graft.operators.TermIndex.topK(spark, idx, queries, k = 10)
        .collect().length)._1
    }
    val recompute = (1 to runs).map { _ =>
      time(graft.queries.TextPipeline.bm25TopK(spark, dir)
        .collect().length)._1
    }
    println(f"[termprof] dir=$dir docs=$nDocs nBuckets=$nBuckets build=$buildS%.2fs " +
      f"serve_min=${serve.min}%.2fs recompute_min=${recompute.min}%.2fs " +
      s"serve=${serve.map(t => f"$t%.2f").mkString(",")} " +
      s"recompute=${recompute.map(t => f"$t%.2f").mkString(",")}")
    // archive beside the bench artifact (VERDICT r15 item 6): one JSON
    // line per invocation so the SCALING.md serve-vs-recompute
    // crossover stays a measured, re-derivable series — not prose
    def arr(xs: Seq[Double]) = xs.map(t => f"$t%.3f").mkString("[", ",", "]")
    val line =
      s"""{"dir":"$dir","docs":$nDocs,"n_buckets":$nBuckets,""" +
        f""""build_s":$buildS%.3f,"serve_min_s":${serve.min}%.3f,""" +
        f""""recompute_min_s":${recompute.min}%.3f,""" +
        s""""serve_runs":${arr(serve)},"recompute_runs":${arr(recompute)}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("term_profile.jsonl"), line + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
