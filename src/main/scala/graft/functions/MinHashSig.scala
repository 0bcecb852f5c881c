package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of an array<long> element set: `numHashes`
  * independent min-hashes, hash i of element v = XXH64(v, seed + i).
  *
  * Why a custom Catalyst Expression: the HOF formulation
  * (`transform(sequence(...), i -> aggregate(elems, ...))`) is
  * CodegenFallback — every lambda step is interpreted, measured at ~10s
  * for 5000 docs × 128 hashes at sf0.1. This single fused loop does the
  * same numHashes × |elems| work in tight generated Java (~25× less).
  * Same minhash semantics (a seeded xxhash64 family); signatures are an
  * internal sketch, not oracle-visible.
  *
  * `lcg = true` switches to the ENGINE-NEUTRAL family (VERDICT r12
  * item 6): hash i of element v = (a_i·(v mod P) + b_i) mod P with
  * P = 2^31 − 1, a_i = (2654435761·(i+1)) mod P, b_i =
  * (40503·(i+1) + 7) mod P — the textbook universal a·x+b permutation
  * family, every step exact 64-bit integer arithmetic that DuckDB
  * replays bit-identically (a_i·(v mod P) + b_i < 2^62, no overflow on
  * either engine). `seed` is unused in this family — the constants ARE
  * the family; callers pin portability, not tunability. */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long,
                      lcg: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    import MinHashSig.{lcgA, lcgB, modP}
    val aCoef = if (lcg) lcgA(numHashes) else null
    val bCoef = if (lcg) lcgB(numHashes) else null
    val a = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = a.numElements()
    var e = 0
    while (e < n) {
      val v = a.getLong(e)
      val vm = if (lcg) modP(v) else 0L
      var i = 0
      while (i < numHashes) {
        val h =
          if (lcg) modP(aCoef(i) * vm + bCoef(i))
          else XXH64.hashLong(v, seed + i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val e = ctx.freshName("e"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val self = "graft.functions.MinHashSig"
      // LCG hot-loop hygiene: the a_i/b_i coefficient arrays live in
      // operator state (one init per task, not per row), v mod P hoists
      // out of the hash loop, and the Mersenne-prime reduction replaces
      // the 64-bit divisions three `%`s would cost per (element, hash) —
      // measured +1.3s on doc_minhash_pairs at sf0.1 with naive mods
      val (setup, hashExpr) =
        if (lcg) {
          val aArr = ctx.addMutableState("long[]", "lcgA",
            vn => s"$vn = $self.lcgA($numHashes);")
          val bArr = ctx.addMutableState("long[]", "lcgB",
            vn => s"$vn = $self.lcgB($numHashes);")
          val vm = ctx.freshName("vm")
          (s"final long $vm = $self.modP($v);",
            s"$self.modP($aArr[$i] * $vm + $bArr[$i])")
        } else ("", s"$xxh.hashLong($v, ${seed}L + $i)")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $a.numElements();
         |for (int $e = 0; $e < $n; $e++) {
         |  final long $v = $a.getLong($e);
         |  $setup
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    final long $h = $hashExpr;
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(elems: Column, numHashes: Int, seed: Long): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(elems), numHashes, seed))

  /** The engine-neutral a·x+b mod P family — see the class doc. */
  def lcg(elems: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(elems), numHashes,
      seed = 0L, lcg = true))

  final val P = 2147483647L

  /** x mod P for 0 <= x < 2^62, divisionless: P is Mersenne (2^31 − 1),
    * so two fold-and-add rounds reduce exactly — same value `x % P`
    * yields, which is what the DuckDB oracle computes. */
  def modP(x: Long): Long = {
    var t = (x & P) + (x >>> 31)
    t = (t & P) + (t >>> 31)
    if (t >= P) t - P else t
  }

  def lcgA(n: Int): Array[Long] =
    Array.tabulate(n)(i => (2654435761L * (i + 1)) % P)

  def lcgB(n: Int): Array[Long] =
    Array.tabulate(n)(i => (40503L * (i + 1) + 7) % P)
}
