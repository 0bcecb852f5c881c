package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.{countAll, maxOf, minOf, sumOf}

/** The IVM contract: state + delta refresh must equal a full recompute
  * over base ∪ delta, bit-for-bit, across repeated refreshes, new keys
  * and empty deltas. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("l_returnflag", "l_linestatus")
  private val aggs = Seq(
    sumOf("l_quantity", "sum_qty"),
    countAll("n_rows"),
    minOf("l_extendedprice", "min_price"),
    maxOf("l_extendedprice", "max_price"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.orderBy(keys.map(col): _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq

  test("refresh(state, delta) == recompute(base ∪ delta), repeatedly") {
    val li = Tables.lineitem(spark, sf0001)
    // three disjoint deterministic slices: base, delta1, delta2
    val base = li.filter(pmod(col("l_orderkey"), lit(3)) === 0)
    val d1 = li.filter(pmod(col("l_orderkey"), lit(3)) === 1)
    val d2 = li.filter(pmod(col("l_orderkey"), lit(3)) === 2)

    var state = IncrementalAgg.initial(base, keys, aggs)
    state = IncrementalAgg.refresh(state, d1, keys, aggs)
    assert(canon(state) == canon(IncrementalAgg.initial(base.union(d1), keys, aggs)))

    state = IncrementalAgg.refresh(state, d2, keys, aggs)
    assert(canon(state) == canon(IncrementalAgg.initial(li, keys, aggs)))
  }

  test("delta with only-new keys appends; empty delta is identity") {
    val base = Seq(("A", "x", 1.0, 10.0), ("A", "x", 2.0, 20.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val newKey = Seq(("B", "y", 5.0, 50.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val state = IncrementalAgg.initial(base, keys, aggs)
    val after = IncrementalAgg.refresh(state, newKey, keys, aggs)
    assert(canon(after) == canon(IncrementalAgg.initial(base.union(newKey), keys, aggs)))
    val empty = newKey.limit(0)
    assert(canon(IncrementalAgg.refresh(after, empty, keys, aggs)) == canon(after))
  }
}
