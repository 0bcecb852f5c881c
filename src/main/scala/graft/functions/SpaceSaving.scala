package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy hitters (Metwally, Agrawal, El Abbadi, ICDT'05 —
  * public literature) as a typed Aggregator: approximate top frequent
  * items over an unbounded keyed stream of strings in O(capacity) state.
  *
  * Counter semantics: each tracked item carries (count, err) where
  * `count` OVERESTIMATES the true frequency by at most `err` (the count
  * of the counter it evicted). The classic guarantees hold per sketch:
  * any item with true frequency > n/capacity is tracked, and
  * count - err <= true <= count.
  *
  * Distributed merge: counters merge by summing counts for shared items;
  * items present in only one side add the other side's "unseen mass"
  * bound (its minimum count) to their error, then the merged table is
  * re-trimmed to capacity — the standard mergeable-summaries treatment
  * (Agarwal et al., PODS'12). Spark runs it partial+final like any
  * aggregate: the shuffle carries one capacity-bounded map per group,
  * never the raw items. SpaceSavingSpec gates the guarantees on skewed
  * data with known exact counts.
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
  require(capacity >= 1)

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)],
                      item: String): Map[String, (Long, Long)] =
    buf.get(item) match {
      case Some((c, e)) => buf.updated(item, (c + 1, e))
      case None if buf.size < capacity => buf.updated(item, (1L, 0L))
      case None =>
        // evict the minimum-count counter; the newcomer inherits its
        // count as both floor and error bound (the Space-Saving step)
        val (minK, (minC, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        (buf - minK).updated(item, (minC + 1, minC))
    }

  override def merge(a: Map[String, (Long, Long)],
                     b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // an item absent from a sketch may still have occurred up to that
    // sketch's minimum tracked count times (only if the sketch was full)
    def unseen(m: Map[String, (Long, Long)]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min
    val (ua, ub) = (unseen(a), unseen(b))
    val merged = (a.keySet ++ b.keySet).iterator.map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((ca, ea)), Some((cb, eb))) => k -> (ca + cb, ea + eb)
        case (Some((ca, ea)), None) => k -> (ca + ub, ea + ub)
        case (None, Some((cb, eb))) => k -> (cb + ua, eb + ua)
        case (None, None) => throw new IllegalStateException
      }
    }.toMap
    if (merged.size <= capacity) merged
    else merged.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity).toMap
  }

  /** Tracked items as (item, count, err), count desc then item asc. */
  override def finish(buf: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] = ExpressionEncoder()
}
