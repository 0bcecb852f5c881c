package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode, Muthukrishnan, J. Algorithms '05 — public
  * literature) as a typed Aggregator: point-frequency estimates over an
  * unbounded stream of strings in O(width * depth) state, independent of
  * the number of distinct items.
  *
  * Complements the sketch family already in the engine: HLL answers "how
  * many distinct", GK answers "what quantile", Space-Saving answers
  * "which items are frequent" — Count-Min answers "how often did THIS
  * item occur" for any queried item. Guarantees per sketch: estimates
  * never UNDER-count, and overshoot is at most eps*N (eps = e/width)
  * with probability 1 - delta (delta = e^-depth).
  *
  * The counter table merges by cell-wise addition — exactly associative
  * and commutative, so Spark's partial+final aggregation and any shuffle
  * order produce the identical sketch (CountMinSpec holds merge-vs-
  * sequential equality bit-for-bit). The shuffle carries one fixed
  * (width*depth) long array per group, never the raw items.
  *
  * Row hashing uses one Murmur3 pass per row with a per-row seed — the
  * standard depth-seeded family; deterministic across JVMs (no
  * Object.hashCode anywhere).
  */
class CountMin(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] with Serializable {
  require(width >= 2 && depth >= 1 && width.toLong * depth <= (1 << 22),
    "width*depth must stay a bounded buffer")

  override def zero: Array[Long] = new Array[Long](width * depth)

  private def bucket(item: String, row: Int): Int = {
    val u = UTF8String.fromString(item)
    val h = Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
      u.numBytes(), 0x9747b28c + row * 0x5bd1e995)
    // strip the sign without modulo bias worth caring about at these widths
    (h & 0x7fffffff) % width
  }

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + bucket(item, r)) += 1
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** Point estimate from a finished sketch: min over the depth rows. */
  def estimate(sketch: Array[Long], item: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(item, r))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
