package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the LBFS/rsync family — Muthitacharoen et
  * al., SOSP'01; public literature): split a document's bytes at
  * positions where a rolling hash of the trailing window hits a mask,
  * and fingerprint each chunk. Output: array<struct<hash:long, len:int>>
  * in document order; lens sum to the byte length.
  *
  * Why an engine for training data wants this next to shingles: CDC
  * boundaries are SELF-SYNCHRONIZING — insert or delete a paragraph and
  * every chunk outside the edited region keeps its boundaries and hash,
  * so shared-chunk counting finds partially-duplicated documents
  * (boilerplate headers, quoted emails, mirrored articles with edits)
  * at a granularity shingle Jaccard blurs and exact hashing misses
  * entirely. Storage-dedup systems run exactly this shape at exabyte
  * scale.
  *
  * Parameters: a 16-byte rolling window (Karp-Rabin multiplier 31,
  * precomputed top-power removal), boundary when (h & mask) == 0 with
  * mask = 2^maskBits - 1 (expected chunk ~2^maskBits bytes), minimum
  * chunk of 8 bytes to suppress pathological tiny chunks, forced
  * boundary at end-of-doc. Chunk fingerprints are xxhash64 over the
  * chunk's exact bytes (seed 42, the repo convention). Deterministic,
  * allocation-light, single pass; generated code is one static call
  * (the ShingleHashSet pattern).
  */
case class CdcChunks(child: Expression, maskBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maskBits >= 1 && maskBits <= 20, s"maskBits in [1,20], got $maskBits")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("hash", LongType, nullable = false),
      StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CdcChunks.compute($s, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private val Window = 16
  private val Mult = 31L
  private val MinChunk = 8
  /** Mult^(Window-1), the factor that removes the byte leaving the
    * rolling window. */
  private val TopPow: Long = {
    var p = 1L
    var i = 1
    while (i < Window) { p *= Mult; i += 1 }
    p
  }

  def apply(text: Column, maskBits: Int = 6): Column =
    GraftShim.column(CdcChunks(GraftShim.expression(text), maskBits))

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, maskBits: Int): ArrayData = {
    val nb = s.numBytes
    if (nb == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1L
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new java.util.ArrayList[InternalRow](4)
    var start = 0
    var h = 0L
    var i = 0
    while (i < nb) {
      val b = s.getByte(i) & 0xFF
      h = h * Mult + b
      val inChunk = i - start + 1
      if (inChunk > Window) {
        // remove the byte that left the window (entered Window bytes ago)
        h -= TopPow * Mult * (s.getByte(i - Window) & 0xFF)
      }
      if (inChunk >= MinChunk && (h & mask) == 0L) {
        out.add(InternalRow(
          XXH64.hashUnsafeBytes(base, off + start, inChunk, 42L), inChunk))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < nb) {
      out.add(InternalRow(
        XXH64.hashUnsafeBytes(base, off + start, nb - start, 42L), nb - start))
    }
    new GenericArrayData(out.toArray)
  }
}
