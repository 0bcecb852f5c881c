package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.VectorOps

/** CONTINUOUS top-k similarity search: the running k most-similar corpus
  * vectors per probe, maintained incrementally as the corpus STREAMS in
  * (the "continuously adaptive similarity search" problem of the
  * retrieved PAPERS.md corpus — a batch top-k recomputed per arrival
  * re-scans everything; this maintains the answer online).
  *
  * Shape: arriving vectors score against the (small, static, broadcast)
  * probe set — a stream-static cross join, scored by the fused
  * codegen'd [[graft.functions.VecDot]] — then per-probe state keeps
  * the best k (id, score) pairs seen so far: state is O(k) per probe
  * REGARDLESS of stream length, and the operator shuffles each arrival
  * once on the probe id. Output is append-mode: a row is emitted when a
  * vector ENTERS a probe's running top-k (so downstream sees every
  * intermediate leader, and the final top-k is the last k survivors per
  * probe — the test reduces with keepLatest).
  *
  * Ties and determinism: ranking orders by (score desc, vec_id asc) —
  * the same tie-break as the batch [[graft.operators.Similarity]] top-k
  * — so replays and restarts emit identical decisions.
  */
object VectorStream {

  /** A vector entering a probe's running top-k at this point of the
    * stream (rn = its rank at entry). */
  case class TopKEntry(q_id: Long, vec_id: Long, score: Double, rn: Int)

  def streamingTopK(vecs: DataFrame, probes: DataFrame, k: Int,
                    vecId: String = "vec_id", vecCol: String = "embedding",
                    probeId: String = "q_id", probeVec: String = "q_emb")
      : Dataset[TopKEntry] = {
    import vecs.sparkSession.implicits._
    val p = probes.withColumn("_np", VectorOps.norm(col(probeVec)))
    val scored = vecs
      .withColumn("_nc", VectorOps.norm(col(vecCol)))
      .crossJoin(broadcast(p))
      .select(col(probeId).cast("long"), col(vecId).cast("long"),
        (VectorOps.dot(col(probeVec), col(vecCol)) / (col("_np") * col("_nc")))
          .as("_score"))
      .as[(Long, Long, Double)]
    scored
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qId: Long, it: Iterator[(Long, Long, Double)],
         state: GroupState[Seq[(Long, Double)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty)
          val prevIds = prev.map(_._1).toSet
          // merge batch arrivals into the running top-k, ONE entry per
          // vec_id (ADVICE r5): a vector re-arriving with a changed
          // embedding (update / at-least-once redelivery) must not hold
          // two of the k slots. Max score per id is the deterministic
          // reduction ("latest" has no order inside a batch); (score
          // desc, id) ordering then fixes the survivor set and emissions.
          val merged = (prev ++ it.map(r => (r._2, r._3)))
            .groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq
            .sortBy { case (id, s) => (-s, id) }
            .take(k)
          state.update(merged)
          merged.zipWithIndex.collect {
            case ((id, s), i) if !prevIds.contains(id) =>
              TopKEntry(qId, id, s, i + 1)
          }.iterator
      }
  }

  /** Batch-side reduction for tests/sinks: the FINAL top-k per probe =
    * for each (q_id, vec_id) keep the last emission, re-rank, take k. */
  def finalTopK(entries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    entries.dropDuplicates("q_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
