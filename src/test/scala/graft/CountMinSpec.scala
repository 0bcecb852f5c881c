package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** Gates for the Count-Min sketch: never undercounts, overshoot within
  * the eps*N bound on a skewed corpus, and the merge is bit-exact
  * associative (partial+final aggregation over any partitioning equals
  * the sequential sketch). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus with known exact counts: item i appears ~N/(i+1) times
  private val items: Seq[String] =
    (0 until 50).flatMap(i => Seq.fill(1000 / (i + 1))(s"item_$i"))
  private val exact: Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimates never undercount and overshoot stays within eps*N") {
    val cm = new CountMin(width = 256, depth = 4)
    val sk = items.foldLeft(cm.zero)(cm.reduce)
    val n = items.size.toLong
    val epsN = math.ceil(math.E / 256 * n).toLong
    exact.foreach { case (item, c) =>
      val est = cm.estimate(sk, item)
      assert(est >= c, s"$item undercounted: $est < $c")
      assert(est <= c + epsN, s"$item overshoot ${est - c} > eps*N $epsN")
    }
    // an unseen item may overshoot but never beyond the same bound
    assert(cm.estimate(sk, "never_seen") <= epsN)
  }

  test("merge is bit-exact associative: Spark partial+final == sequential") {
    val cm = new CountMin(width = 256, depth = 4)
    val sequential = items.foldLeft(cm.zero)(cm.reduce)
    val viaSpark = items.toDF("item")
      .repartition(7) // force several partials and a real merge tree
      .as[String]
      .groupByKey(_ => 0)
      .agg(cm.toColumn.name("sk"))
      .collect().head._2
    assert(viaSpark.toSeq == sequential.toSeq)
  }

  test("portable md5 family: same bounds, bit-exact merge, SQL-chain bucket equality") {
    // bounds + merge associativity hold for the portable family too
    val cm = new CountMin(width = 256, depth = 4, portableMd5 = true)
    val sk = items.foldLeft(cm.zero)(cm.reduce)
    val n = items.size.toLong
    val epsN = math.ceil(math.E / 256 * n).toLong
    exact.foreach { case (item, c) =>
      val est = cm.estimate(sk, item)
      assert(est >= c, s"$item undercounted: $est < $c")
      assert(est <= c + epsN, s"$item overshoot ${est - c} > eps*N $epsN")
    }
    val viaSpark = items.toDF("item")
      .repartition(7).as[String]
      .groupByKey(_ => 0).agg(cm.toColumn.name("sk"))
      .collect().head._2
    assert(viaSpark.toSeq == sk.toSeq)
    // the bucket IS the builtin chain the oracle replays:
    // conv(substring(md5(item || '#' || r), 1, 15), 16, 10) % width
    val rows = (0 until 4).flatMap(r => exact.keys.map(k => (k, r)))
    val viaSql = rows.toDF("item", "r")
      .select(col("item"), col("r"),
        (conv(substring(md5(concat(col("item"), lit("#"), col("r"))), 1, 15),
          16, 10).cast("long") % 256).cast("int").as("b"))
      .collect().map(row => (row.getString(0), row.getInt(1)) -> row.getInt(2))
      .toMap
    rows.foreach { case (item, r) =>
      assert(CountMin.md5Bucket(item, r, 256) === viaSql((item, r)),
        s"md5Bucket($item, $r) diverges from the SQL chain")
    }
  }

  test("doc_term_freq_cm estimates bound the exact per-lang counts") {
    val got = graft.queries.TextPipeline.termFreqCm(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exactDf = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"), col("term")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case ((lang, term), est) =>
      val truth = exactDf.getOrElse((lang, term), 0L)
      assert(est >= truth, s"($lang,$term) undercounted")
    }
    // sketch should be essentially exact here: per-lang token streams are
    // far smaller than width*depth cells
    val worst = got.map { case (k, est) => est - exactDf.getOrElse(k, 0L) }.max
    assert(worst <= 50, s"overshoot $worst implausibly large for this corpus")
  }
}
