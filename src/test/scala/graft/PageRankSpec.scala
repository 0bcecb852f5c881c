package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Gates for the fixed-iteration weighted PageRank operator: exact
  * agreement with a sequential in-memory reference on adversarial shapes
  * (dangling sinks, weighted edges, disconnected pieces), plus the
  * distribution invariants that define the algorithm. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: the same dangling-redistribution recurrence,
    * computed in plain Scala. */
  private def refRanks(edges: Seq[(Long, Long, Double)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outw.contains).map(r).sum
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => r(s) / outw(s) * w }.sum
      }
      r = nodes.map(nd => nd ->
        ((1.0 - d) / n + d * (contrib.getOrElse(nd, 0.0) + dangling / n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Double)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst", "weight"), iters)
      .as[(Long, Double)].collect().toMap

  test("matches the sequential reference on a weighted graph with a sink") {
    // 4 -> nothing (dangling); asymmetric weights into 1
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 3.0), (2L, 3L, 1.0),
      (3L, 1L, 2.0), (3L, 4L, 1.0))
    val got = run(edges, 3)
    val want = refRanks(edges, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (n, r) => assert(math.abs(r - want(n)) < 1e-12,
      s"node $n: got $r want ${want(n)}") }
  }

  test("ranks sum to 1 and a symmetric cycle is uniform") {
    val cycle = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0))
    val got = run(cycle, 5)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // a pure cycle's stationary distribution is uniform, and every
    // damped iterate from a uniform start stays uniform
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("empty edge set yields an empty ranking, not a division by zero") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    assert(PageRank.run(empty, 3).count() == 0L)
  }

  test("disconnected pieces and a higher in-mass node ranks above a leaf") {
    val edges = Seq((1L, 2L, 1.0), (3L, 2L, 1.0), (4L, 5L, 1.0))
    val got = run(edges, 3)
    val want = refRanks(edges, 3)
    got.foreach { case (n, r) => assert(math.abs(r - want(n)) < 1e-12) }
    assert(got(2L) > got(5L), "two in-edges must outrank one")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conserved")
  }
}
