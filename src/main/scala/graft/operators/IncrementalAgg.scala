package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an algebraic aggregate table — the batch
  * "materialized view refresh" every warehouse ships: given the current
  * aggregate state and a DELTA of newly arrived rows, produce the
  * updated state WITHOUT rescanning the base table.
  *
  * Sound for the algebraic aggregates (sum, count, min, max — anything
  * with an associative, commutative merge): aggregate the delta alone,
  * then merge per key with one outer join against the state. Cost is
  * O(|delta| + |touched keys|), never O(|base|); both sides shuffle on
  * the same group keys, so at 100 TB the state table can be bucketed on
  * those keys and the refresh becomes a co-located join. Averages ride
  * as (sum, count) pairs and divide at read time — storing avg itself
  * would make the merge lossy, the classic IVM mistake.
  *
  * Deletions/updates are out of scope by design (they need either
  * invertible aggregates or recompute-affected-groups); this is the
  * append-only form, which is what log/event pipelines need.
  */
object IncrementalAgg {

  /** Aggregate spec: how to BUILD a column from raw rows and how to
    * MERGE two partial values of it. sum/count merge with +, min/max
    * with least/greatest. */
  case class AggSpec(name: String, build: Column, merge: (Column, Column) => Column)

  def sumOf(c: String, as: String): AggSpec =
    AggSpec(as, sum(col(c)), (a, b) => a + b)
  def countAll(as: String): AggSpec =
    AggSpec(as, count(lit(1)), (a, b) => a + b)
  def minOf(c: String, as: String): AggSpec =
    AggSpec(as, min(col(c)), (a, b) => least(a, b))
  def maxOf(c: String, as: String): AggSpec =
    AggSpec(as, max(col(c)), (a, b) => greatest(a, b))

  /** Build the initial state from a base table. */
  def initial(base: DataFrame, keys: Seq[String], aggs: Seq[AggSpec]): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(aggs.head.build.as(aggs.head.name),
        aggs.tail.map(a => a.build.as(a.name)): _*)

  /** Merge a delta of raw rows into the current state. New keys appear,
    * existing keys merge per AggSpec; untouched keys pass through the
    * join unchanged. */
  def refresh(state: DataFrame, delta: DataFrame,
              keys: Seq[String], aggs: Seq[AggSpec]): DataFrame = {
    val d = initial(delta, keys, aggs)
    val s = aggs.foldLeft(state) { (df, a) =>
      df.withColumnRenamed(a.name, s"_s_${a.name}")
    }
    val joined = s.join(d, keys, "full_outer")
    val merged = aggs.map { a =>
      val sv = col(s"_s_${a.name}")
      val dv = col(a.name)
      when(sv.isNull, dv).when(dv.isNull, sv)
        .otherwise(a.merge(sv, dv)).as(a.name)
    }
    joined.select(keys.map(col) ++ merged: _*)
  }
}
