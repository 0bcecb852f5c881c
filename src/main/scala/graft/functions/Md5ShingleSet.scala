package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct sorted 60-bit md5 hashes of a text's word `n`-gram
  * shingles — [[ShingleHashSet]]'s fused single-pass structure with the
  * ENGINE-NEUTRAL hash (VERDICT r12 item 6): md5 is the one hash both
  * Spark and DuckDB compute bit-identically, so an oracle can replay
  * every element value. Each shingle's hash is BIT-IDENTICAL to the
  * builtin chain `conv(substring(md5(shingle), 1, 15), 16, 10)` (the
  * [[TextOps.fingerprint]] recipe): the first 15 hex chars of the
  * digest are its first 8 bytes as a big-endian long shifted right by
  * 4 — 60 bits, sign-safe. The HOF form of that chain is interpreted
  * per element (measured +1.7 s on doc_minhash_pairs at sf0.1); this is
  * one generated static call per row with a thread-local MessageDigest.
  */
case class Md5ShingleSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    Md5ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5ShingleSet.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleSet =
    copy(child = newChild)
}

object Md5ShingleSet {
  def apply(text: Column, n: Int): Column =
    GraftShim.column(Md5ShingleSet(GraftShim.expression(text), n))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    // one copy of the row's bytes; shingles are byte ranges of it (the
    // same split-on-every-space semantics as ShingleHashSet.compute)
    val bytes = s.getBytes
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = nb + 1
    val m = nTok - n + 1
    val hashes = new Array[Long](m)
    val md = md5.get()
    var k = 0
    while (k < m) {
      val b0 = starts(k)
      val b1 = starts(k + n) - 1
      md.reset()
      md.update(bytes, b0, b1 - b0)
      val d = md.digest()
      // first 15 hex chars == first 8 digest bytes big-endian >>> 4
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      hashes(k) = hi >>> 4
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
