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

  test("Fingerprint: order/partitioning-independent; of(a ∪ b) == merge(of(a), of(b))") {
    val row = Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.alphaNumStr)
    val sets = cases(Gen.zip(Gen.listOf(row), Gen.listOf(row)), 30, 66L)
    sets.foreach { case (a, b) =>
      def fp(rows: Seq[(Long, String)], parts: Int) =
        graft.operators.Fingerprint.of(
          spark.createDataFrame(
            spark.sparkContext.parallelize(rows, math.max(parts, 1)))
            .toDF("id", "s"),
          Seq("id", "s"))
      val (fa, fb) = (fp(a, 2), fp(b, 3))
      assert(fp(scala.util.Random.shuffle(a ++ b), 4) ==
        graft.operators.Fingerprint.merge(fa, fb),
        s"union fingerprint must equal merged parts for |a|=${a.size} |b|=${b.size}")
      assert(fp(a.reverse, 1) == fa, "row order must not matter")
    }
  }

  test("FirstBandMatch ≡ reference first-agreeing-index over nullable arrays") {
    val elem = Gen.option(Gen.chooseNum(0L, 8L)) // tiny domain forces matches
    val arr = Gen.listOfN(6, elem)
    val pairs = cases(Gen.zip(arr, arr), 300, 77L)
    def ref(a: Seq[Option[Long]], b: Seq[Option[Long]]): Int =
      a.zip(b).indexWhere { case (x, y) => x.isDefined && y.isDefined && x == y }
    val got = pairs
      .map { case (a, b) => (a.map(_.map(Long.box).orNull), b.map(_.map(Long.box).orNull)) }
      .toDF("a", "b")
      .select(graft.functions.FirstBandMatch(
        col("a").cast("array<long>"), col("b").cast("array<long>")))
      .collect().map(_.getInt(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(g == ref(a, b), s"FirstBandMatch($a, $b) = $g, expected ${ref(a, b)}")
    }
  }
}
