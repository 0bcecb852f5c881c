package graft

import org.apache.spark.sql.functions._
import graft.functions.SpaceSaving

/** Space-Saving guarantees on skewed data with known exact counts:
  * items well above the n/capacity threshold are always tracked, and
  * every tracked item's true count lies in [count - err, count] — under
  * heavy parallelism, so the distributed merge is what's under test. */
class SpaceSavingSpec extends SparkSpec {

  test("heavy hitters survive partial aggregation; count bounds hold") {
    import spark.implicits._
    // Zipf-ish: item i appears ceil(6000 / i^1.2) times, i = 1..200;
    // n ~ 30k, capacity 32 -> threshold n/32 ~ 950: items 1..4 are far
    // above it, the tail far below
    val rows = (1 to 200).flatMap { i =>
      val reps = math.ceil(6000.0 / math.pow(i, 1.2)).toInt
      Seq.fill(reps)(s"item$i")
    }
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val shuffled = new scala.util.Random(11).shuffle(rows)
    val agg = new SpaceSaving(32).toColumn
    val got = shuffled.toDF("item").repartition(16)
      .as[String].select(agg).head()
    val tracked = got.map { case (k, c, e) => k -> ((c, e)) }.toMap
    // guaranteed-tracked: margin over the threshold absorbs merge slack
    (1 to 4).map(i => s"item$i").foreach { k =>
      assert(tracked.contains(k), s"$k (true=${exact(k)}) must be tracked")
    }
    tracked.foreach { case (k, (c, e)) =>
      val t = exact(k)
      assert(t <= c, s"$k: count $c must overestimate true $t")
      assert(c - e <= t, s"$k: count-err ${c - e} must lower-bound true $t")
    }
    assert(got.size <= 32)
    // top of the sketch matches the true ranking where margins are wide
    assert(got.take(3).map(_._1) === Seq("item1", "item2", "item3"))
  }

  test("single-partition sketch is the classic sequential Space-Saving") {
    import spark.implicits._
    val rows = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      (1 to 30).map(i => s"noise$i")
    val got = rows.toDF("item").coalesce(1)
      .as[String].select(new SpaceSaving(8).toColumn).head()
    val m = got.map { case (k, c, e) => k -> ((c, e)) }.toMap
    assert(m.contains("a") && m.contains("b"))
    assert(m("a")._1 >= 40 && m("a")._1 - m("a")._2 <= 40)
    assert(m("b")._1 >= 25 && m("b")._1 - m("b")._2 <= 25)
  }
}
