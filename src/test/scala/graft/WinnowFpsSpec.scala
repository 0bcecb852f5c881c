package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowFps

/** Equivalence gate for the fused winnowing expression: value-identical
  * to the HOF chain it replaced (grams via concat_ws/slice, window
  * minima via array_min/slice, distinct), across fixture text and
  * adversarial token shapes. */
class WinnowFpsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4; private val w = 5

  /** The original HOF formulation, kept as the executable reference. */
  private def hofFps(texts: Seq[String]) = {
    val tk = split(col("text"), " ")
    val grams = transform(sequence(lit(0), size(tk) - k),
      i => concat_ws(" ", slice(tk, i + 1, lit(k))))
    texts.toDF("text")
      .filter(size(tk) >= k + w - 1)
      .select(col("text"), grams.as("g"))
      .select(col("text"),
        array_sort(array_distinct(transform(
          sequence(lit(0), size(col("g")) - w),
          j => array_min(slice(col("g"), j + 1, lit(w)))))).as("fps"))
      .as[(String, Seq[String])].collect().toMap
  }

  private def fusedFps(texts: Seq[String]) =
    texts.toDF("text")
      .select(col("text"), array_sort(WinnowFps(col("text"), k, w)).as("fps"))
      .as[(String, Seq[String])].collect().toMap
      .filter(_._2.nonEmpty)

  test("fused winnower equals the HOF chain on fixture documents") {
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].take(200).toSeq
    assert(fusedFps(texts) == hofFps(texts))
  }

  test("winnowing guarantee: a shared run of k+w-1 tokens always shares a fingerprint") {
    // The SIGMOD'03 theorem the sampling rests on: any common substring
    // of >= k+w-1 tokens contains w consecutive common grams — a full
    // window — whose value-minimum BOTH documents must fingerprint.
    val rnd = new scala.util.Random(7)
    def doc(n: Int) = (1 to n).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val run = doc(k + w - 1) // the planted shared run, exactly one window
    val pairs = (1 to 20).map { _ =>
      val a = s"${doc(rnd.nextInt(40))} $run ${doc(rnd.nextInt(40))}".trim
      val b = s"${doc(rnd.nextInt(40))} $run ${doc(rnd.nextInt(40))}".trim
      (a, b)
    }
    val fps = fusedFps(pairs.flatMap(p => Seq(p._1, p._2)).distinct)
    pairs.foreach { case (a, b) =>
      assert(fps(a).toSet.intersect(fps(b).toSet).nonEmpty,
        s"no shared fingerprint despite shared run '$run'")
    }
  }

  test("edge shapes: short docs, empty tokens, ties, boundary lengths") {
    val texts = Seq(
      "",                                    // no tokens
      "a b c d e f g",                       // 7 tokens: one short of a window
      "a b c d e f g h",                     // exactly one window
      "a a a a a a a a a a",                 // all-equal grams (tie handling)
      "x  y z w v u t s r",                  // empty token from double space
      "m n o p m n o p m n o p m n o p",     // periodic repeats
      (1 to 60).map(i => s"t${i % 7}").mkString(" "))
    val fused = fusedFps(texts)
    val hof = hofFps(texts)
    assert(fused == hof)
    // 7 tokens -> no window -> absent; 8 tokens -> exactly one fingerprint
    assert(!fused.contains("a b c d e f g"))
    assert(fused("a b c d e f g h").size == 1)
  }
}
