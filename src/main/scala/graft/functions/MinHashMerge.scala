package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (SURVEY.md §2b "custom typed agg"): merges per-row
  * MinHash signatures into one GROUP signature by element-wise min.
  *
  * MinHash's defining property makes this a true sketch union:
  * min-merge(sig(A), sig(B)) == sig(A ∪ B) exactly — so a group's merged
  * signature estimates Jaccard against any other set without ever
  * materializing the group's token union. That is what makes it useful at
  * 100 TB: the shuffle carries fixed-size signatures (numHashes longs per
  * group), never token sets, and Spark runs it as a partial+final
  * aggregate like any built-in (reduce = merge = element-wise min, which
  * is associative and commutative). MinHashAggSpec holds the union
  * property against directly-computed signatures.
  */
class MinHashMerge(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  private def minInto(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    val n = math.min(numHashes, sig.length)
    while (i < n) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] =
    minInto(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    minInto(a, b.toSeq)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
