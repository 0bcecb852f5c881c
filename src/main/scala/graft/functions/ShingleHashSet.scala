package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct sorted xxhash64 values of a text's word `n`-gram shingles,
  * fused into one pass over the string bytes.
  *
  * Semantics are BIT-IDENTICAL to the HOF chain it replaces
  * (`array_sort(transform(array_distinct(shingles(split(text," "),n)),
  * xxhash64))`, n=1 being the plain hashed token set): tokens split on
  * every single space (trailing/empty tokens preserved, as `split` with
  * its default -1 limit does), and an n-gram's hash is computed over the
  * exact byte range the `concat_ws(" ", slice(...))` reconstruction
  * would produce — which for space-separated tokens is a substring of
  * the original text, so no shingle string is ever materialized. Dedup
  * happens on the hash values; two distinct shingles colliding in
  * xxhash64 (P ≈ 1e-14 for this vocabulary) is the same risk the HOF
  * form already accepts (Dedup.hashedTokenSet scaladoc).
  *
  * Why: the HOF chain is CodegenFallback — measured 1.5-2.4s of the
  * ngram/jaccard/minhash bench queries at sf0.1 goes to interpreted
  * per-row lambda evaluation. This expression is one generated static
  * call per row (space scan + m hashes + sort, zero per-shingle
  * allocation). Fewer than n tokens → empty array, matching the HOF
  * `when(size >= n, ...).otherwise(array())` guard.
  */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ShingleHashSet.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  def apply(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashSet(GraftShim.expression(text), n))

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val nb = s.numBytes
    var spaces = 0
    var i = 0
    while (i < nb) { if (s.getByte(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    // starts(k) = byte offset of token k; sentinel nb+1 = "start of the
    // token after the last", so shingle k spans [starts(k), starts(k+n)-1)
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (s.getByte(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = nb + 1
    val m = nTok - n + 1
    val hashes = new Array[Long](m)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var k = 0
    while (k < m) {
      val b0 = starts(k)
      val b1 = starts(k + n) - 1
      hashes(k) = XXH64.hashUnsafeBytes(base, off + b0, b1 - b0, 42L)
      k += 1
    }
    java.util.Arrays.sort(hashes)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || hashes(w - 1) != hashes(r)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}
