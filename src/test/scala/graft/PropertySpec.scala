package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{BagDistanceLB, CharHistogram, SortedIntersectAtLeast, SortedIntersectSize, VecDot}
import graft.operators.ZOrder

/** Generator-driven properties over the custom codegen expressions
  * (SURVEY.md §5): each property generates a few hundred structured
  * random cases with ScalaCheck, runs them through ONE DataFrame pass
  * (a job per forAll case would be a job storm) and compares against a
  * plain-Scala reference computed on the same values. Seeds are fixed —
  * failures are reproducible, never flaky. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator exhausted"))

  test("framing: split(join(lines)) == lines for generated line sets") {
    val line = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val batches = cases(Gen.listOfN(5, line), 100, 11L)
    batches.foreach { lines =>
      val joined = lines.mkString("\n")
      assert(joined.split("\n", -1).toSeq == (if (lines.isEmpty) Seq("") else lines))
    }
  }

  test("sorted intersect: size and threshold agree with set intersection") {
    val arr = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    val pairs = cases(Gen.zip(arr, arr, Gen.chooseNum(0, 10)), 300, 22L)
    val df = pairs.toDF("a", "b", "t")
      .withColumn("got_size", SortedIntersectSize(col("a"), col("b")))
      .withColumn("got_atleast", SortedIntersectAtLeast(col("a"), col("b"), col("t")))
      .collect()
    pairs.zip(df).foreach { case ((a, b, t), row) =>
      val expect = a.toSet.intersect(b.toSet).size
      assert(row.getAs[Int]("got_size") == expect, s"size for $a ∩ $b")
      assert(row.getAs[Boolean]("got_atleast") == (expect >= t), s"atLeast($t) for $a ∩ $b")
    }
  }

  test("bag-distance bound: LB <= levenshtein for generated mutation pairs") {
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,"
    val txt = Gen.listOf(Gen.oneOf(alphabet.toSeq)).map(_.mkString)
    val pairs = cases(Gen.zip(txt, txt), 300, 33L)
    val bad = pairs.toDF("a", "b")
      .select(
        BagDistanceLB(CharHistogram(col("a"), alphabet),
          CharHistogram(col("b"), alphabet)).as("lb"),
        levenshtein(col("a"), col("b")).as("lev"))
      .filter(col("lb") > col("lev")).count()
    assert(bad == 0L)
  }

  test("VecDot: bit-exact commutative, self-dot non-negative, zero identity") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 997.0f))
    val pairs = cases(Gen.zip(vec, vec), 300, 44L)
    val rows = pairs.toDF("a", "b")
      .select(VecDot(col("a"), col("b")).as("ab"),
        VecDot(col("b"), col("a")).as("ba"),
        VecDot(col("a"), col("a")).as("aa"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot not commutative bit-exact")
      assert(r.getDouble(2) >= 0.0)
    }
    val z = Seq((Seq.fill(16)(0.0f), pairs.head._1)).toDF("z", "v")
      .select(VecDot(col("z"), col("v"))).head().getDouble(0)
    assert(z == 0.0)
  }

  test("z-order interleave is invertible (even bits = a, odd bits = b)") {
    val coord = Gen.chooseNum(0L, 65535L)
    val pairs = cases(Gen.zip(coord, coord), 300, 55L)
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x
    }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(unspread(z) == a, s"even bits of $z != $a")
      assert(unspread(z >> 1) == b, s"odd bits of $z != $b")
    }
  }
}
