package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Error gates for the sketch-family operators that have no SQL oracle
  * (different sketch algorithms across engines): the approximation must
  * stay within its accuracy contract of the exact answer. */
class SketchSpec extends SparkSpec {

  test("approx_percentile stays within 2% of the exact percentiles") {
    val approx = Relational.q31ApproxPercentile(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.q28Percentiles(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (a50, a90)) <- approx; (e50, e90) = exact(k)) {
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$k p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / e90 <= 0.02, s"$k p90: approx $a90 vs exact $e90")
    }
  }

  test("approx_count_distinct stays within HLL++ error of the exact counts") {
    // default rsd = 0.05; gate at 3x that to be flake-proof while still
    // catching a broken sketch (which is off by orders of magnitude).
    val approx = Relational.q20ApproxDistinct(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.q08DistinctParts(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx; e = exact(k))
      assert(math.abs(a - e).toDouble / e <= 0.15,
        s"$k: approx $a vs exact $e exceeds 15% error")
  }

  test("approx sketches are deterministic across runs") {
    val c = Relational.q20ApproxDistinct(spark, sf001).collect().map(_.toString).toSeq
    val d = Relational.q20ApproxDistinct(spark, sf001).collect().map(_.toString).toSeq
    assert(c === d)
  }

  test("approx_percentile is deterministic across runs") {
    val a = Relational.q31ApproxPercentile(spark, sf001).collect().map(_.toString).toSeq
    val b = Relational.q31ApproxPercentile(spark, sf001).collect().map(_.toString).toSeq
    assert(a === b)
  }
}
