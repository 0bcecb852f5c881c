package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct winnowing fingerprints of a text — the minimum word
  * `k`-gram of every sliding window of `w` consecutive k-grams
  * (Schleimer, Wilkerson, Aiken SIGMOD'03), fused into one pass.
  *
  * Semantics are IDENTICAL to the HOF chain it replaces
  * (`array_distinct(transform(sequence(0, size(g)-w),
  * j -> array_min(slice(g, j+1, w))))` over
  * `g = transform(sequence(0, size(tk)-k), i -> concat_ws(" ",
  * slice(tk, i+1, k)))`): tokens split on every single space (empty
  * tokens preserved), a k-gram is the exact byte range of the original
  * text the concat_ws reconstruction would produce (space-separated
  * tokens ⇒ the joined gram IS a substring of the input), the window
  * minimum is by the same byte-wise unsigned comparison Spark's
  * `array_min` and DuckDB's `list_min` use for strings, and fewer than
  * w full windows yields an empty array (the caller's length filter).
  *
  * Why: the HOF chain is CodegenFallback and allocates the full gram
  * array plus a w-slice per window — measured 6.5s at sf0.1. This
  * expression scans the bytes once, tracks window minima with a
  * monotonic deque (amortised O(1) per window, zero per-window
  * allocation), and materialises ONLY the distinct winning grams.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, s"gram width and window must be >= 1, got k=$k w=$w")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowFps.compute($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  def apply(text: Column, k: Int, w: Int): Column =
    GraftShim.column(WinnowFps(GraftShim.expression(text), k, w))

  /** Unsigned byte-lexicographic compare of two byte ranges — the
    * binary string order both engines sort ASCII text by. */
  private def cmp(b: Array[Byte], a0: Int, a1: Int, c0: Int, c1: Int): Int = {
    var i = a0; var j = c0
    while (i < a1 && j < c1) {
      val x = b(i) & 0xff; val y = b(j) & 0xff
      if (x != y) return x - y
      i += 1; j += 1
    }
    (a1 - a0) - (c1 - c0)
  }

  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    val empty = new GenericArrayData(new Array[AnyRef](0))
    if (nTok < k + w - 1) return empty
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTok) = nb + 1 // sentinel: gram g spans [starts(g), starts(g+k)-1)
    val m = nTok - k + 1  // gram count; m >= w by the guard above
    // Monotonic deque of gram indices: front = current window minimum.
    // `<=` on equal grams keeps the RIGHTMOST occurrence, which has the
    // same VALUE as array_min's pick — output-identical.
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    while (g < m) {
      val g0 = starts(g); val g1 = starts(g + k) - 1
      while (tail > head && {
        val p = deque(tail - 1)
        cmp(bytes, starts(p), starts(p + k) - 1, g0, g1) >= 0
      }) tail -= 1
      deque(tail) = g; tail += 1
      if (deque(head) <= g - w) head += 1
      if (g >= w - 1) {
        val p = deque(head)
        val p0 = starts(p); val p1 = starts(p + k) - 1
        seen.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, p0, p1)))
      }
      g += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
