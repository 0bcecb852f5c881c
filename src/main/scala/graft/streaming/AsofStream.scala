package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

/** STREAMING as-of enrichment — the stream-stream mirror of the batch
  * `operators.AsofJoin` (each left row enriched with the latest right row
  * whose event time is <= its own, per key; left-outer semantics).
  *
  * Spark's built-in stream-stream joins express interval equi-joins, not
  * "latest prior", so this is `transformWithState` over the two streams
  * unioned and keyed (the same union trick the batch operator uses, with
  * per-key state in place of the window):
  *
  *   - Rights within the watermark horizon are buffered per key, PLUS the
  *     single latest right at-or-before the watermark — any left emitted
  *     later has ts > watermark, so of the rights at-or-before the
  *     watermark only the latest can ever be its match. That invariant is
  *     what keeps state bounded at scale: O(rights inside the horizon + 1)
  *     per key, regardless of stream length.
  *   - Lefts are buffered until the watermark passes their event time —
  *     only then can no earlier-timestamped right still arrive (this is
  *     exactly the cross-batch late-arrival case: a right that shows up a
  *     batch after a left, with an earlier event time, still wins).
  *     Emission happens in `handleInputRows` when new arrivals advance
  *     things, and from an event-time timer otherwise, so a key with
  *     buffered lefts and no further traffic still flushes.
  *
  * Dropped-late contract: inputs are watermarked before the union, so
  * Spark itself drops rows later than the horizon — state never sees them.
  */
object AsofStream {

  /** Unioned wire format: side 0 = right (quote), 1 = left (probe). */
  case class AsofEvent(key: String, ts: Timestamp, side: Int, value: String)

  /** Left row + its match (None = no right at-or-before the left ts). */
  case class AsofMatch(key: String, ts: Timestamp, value: String,
                       asof_ts: Option[Timestamp], asof_value: Option[String])

  /** @param left     streaming (key, leftTs, leftVal)
    * @param right    streaming (key, rightTs, rightVal)
    * @param delay    watermark delay for BOTH sides (e.g. "10 seconds")
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, leftVal: String, rightVal: String,
           delay: String): Dataset[AsofMatch] = {
    import left.sparkSession.implicits._
    val l = left.select(col(key).cast("string").as("key"),
      col(leftTs).as("ts"), lit(1).as("side"), col(leftVal).cast("string").as("value"))
    val r = right.select(col(key).cast("string").as("key"),
      col(rightTs).as("ts"), lit(0).as("side"), col(rightVal).cast("string").as("value"))
    l.unionByName(r)
      .withWatermark("ts", delay)
      .as[AsofEvent]
      .groupByKey(_.key)
      .transformWithState(new AsofProcessor, TimeMode.EventTime(), OutputMode.Append())
  }

  /** State: rights = (ts ms, value) list (horizon + latest-before-horizon),
    * lefts = (ts ms, value) list awaiting the watermark. */
  class AsofProcessor extends
      org.apache.spark.sql.streaming.StatefulProcessor[String, AsofEvent, AsofMatch] {

    @transient private var rights: ListState[(Long, String)] = _
    @transient private var lefts: ListState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
      rights = getHandle.getListState[(Long, String)]("rights", enc, TTLConfig.NONE)
      lefts = getHandle.getListState[(Long, String)]("lefts", enc, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[AsofEvent],
                                 timerValues: TimerValues): Iterator[AsofMatch] = {
      val rs = scala.collection.mutable.ArrayBuffer.from(rights.get())
      val ls = scala.collection.mutable.ArrayBuffer.from(lefts.get())
      rows.foreach { e =>
        if (e.side == 0) rs += ((e.ts.getTime, e.value))
        else ls += ((e.ts.getTime, e.value))
      }
      flush(key, rs, ls, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[AsofMatch] =
      flush(key,
        scala.collection.mutable.ArrayBuffer.from(rights.get()),
        scala.collection.mutable.ArrayBuffer.from(lefts.get()),
        timerValues.getCurrentWatermarkInMs())

    /** Emit every buffered left the watermark has passed, matched against
      * the latest right at-or-before its ts; compact rights; re-arm a
      * timer if lefts remain buffered. */
    private def flush(key: String,
                      rs: scala.collection.mutable.ArrayBuffer[(Long, String)],
                      ls: scala.collection.mutable.ArrayBuffer[(Long, String)],
                      wm: Long): Iterator[AsofMatch] = {
      val sortedR = rs.sortBy(_._1).toIndexedSeq
      val (ready, pending) = ls.partition(_._1 <= wm)
      val out = ready.sortBy(_._1).map { case (ts, v) =>
        // latest right at-or-before ts (ties: right visible at equal ts,
        // matching the batch operator's _side ordering)
        val m = sortedR.takeWhile(_._1 <= ts).lastOption
        AsofMatch(key, new Timestamp(ts), v,
          m.map(x => new Timestamp(x._1)), m.map(_._2))
      }
      // rights compaction: everything after the watermark, plus the
      // single latest at-or-before it
      val keep = {
        val (before, after) = sortedR.partition(_._1 <= wm)
        before.lastOption.toSeq ++ after
      }
      if (keep.isEmpty) rights.clear() else rights.put(keep.toArray)
      if (pending.isEmpty) lefts.clear()
      else {
        lefts.put(pending.toArray)
        // wake when the watermark passes the earliest still-buffered left
        getHandle.registerTimer(pending.map(_._1).min + 1)
      }
      out.iterator
    }
  }
}
