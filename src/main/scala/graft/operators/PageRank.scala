package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Fixed-iteration weighted PageRank over an edge-list DataFrame
  * (Page, Brin, Motwani, Winograd 1999 — public literature; the
  * map-reduce formulation follows the standard GraphX/Pregel contribution
  * pattern re-expressed as DataFrame joins).
  *
  * The LLM-pipeline use: rank web domains / pages by link centrality to
  * prioritise crawl budget and weight training-mix sampling (the
  * CommonCrawl-curation shape) — here exercised on the `events` journey
  * graph, but the operator is generic over any (src, dst, weight) edge
  * set.
  *
  * Why this shape at 100 TB:
  *   - One iteration = one join of the edge set against the (much
  *     smaller) rank vector plus one groupBy(dst) — both shuffle on the
  *     node key, so AQE coalesces and the edge set never moves more than
  *     once per round. No driver-side adjacency; the only driver values
  *     are two scalars per round (node count once, dangling mass each
  *     round — the same single-row reduce GraphX performs).
  *   - Ranks are localCheckpointed each round: iterative DataFrame plans
  *     must truncate lineage or planning cost grows per round (the
  *     ConnectedComponents lesson).
  *   - Dangling mass is redistributed uniformly each round, so total
  *     rank stays exactly 1 and the result is a true distribution —
  *     dropping dangling nodes (the tempting shortcut) silently deflates
  *     every score.
  *   - Fixed iteration count (not convergence-to-epsilon) keeps the
  *     round count deterministic and the oracle expressible; production
  *     crawl ranking runs a fixed budget of rounds for the same reason.
  */
object PageRank {

  /** Run `iters` damped rounds over `edges` (columns src, dst, weight).
    * Returns (node, rank) with ranks summing to 1. */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val s = edges.sparkSession
    // Materialize the edge list ONCE: every iteration (and the node /
    // out-weight prep) re-reads it, and without this the upstream plan —
    // often a full-corpus window or join — re-executes per action.
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
      .localCheckpoint(true)

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    // Empty graph: no nodes to rank — return the empty (node, rank)
    // frame instead of seeding ranks with 1/0.
    if (n == 0L)
      return nodes.withColumn("rank", lit(0.0)).select(col("node"), col("rank"))

    // Normalised out-weight per source: contributions below divide by it.
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
      .localCheckpoint(true)

    var rank = nodes.withColumn("r", lit(1.0 / n))
    var i = 0
    while (i < iters) {
      // Mass parked on sinks this round — one scalar to the driver, the
      // same reduce every distributed PageRank performs per round.
      val dangling = rank.join(outw, rank("node") === outw("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0))).head.getDouble(0)
      val contrib = e
        .join(rank, e("src") === rank("node"))
        .join(outw, "src")
        .select(col("dst").as("node"),
          (col("r") / col("wsum") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(dangling / n)))
            .as("r"))
        .localCheckpoint(true)
      i += 1
    }
    rank.select(col("node"), col("r").as("rank"))
  }
}
