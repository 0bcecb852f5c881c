package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.KMeans
import graft.functions.SqDistances

/** Gates for the k-means / diversity-selection operator family:
  * planted-cluster recovery, determinism across partitionings, the
  * SqDistances expression's eval/codegen parity, and coverage of the
  * diversity sample. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated planted clusters in 4-d: centers at 0, 10, 20 on
    * every axis, ±0.25 deterministic jitter — inter-center distance
    * dwarfs intra-cluster spread, so ULP drift can never flip an
    * assignment. */
  private def planted(nPer: Int = 40, nClusters: Int = 3): DataFrame = {
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until nPer
    } yield {
      val id = (c * nPer + i).toLong
      val base = c * 10.0
      val jit = (d: Int) => ((id * 31 + d * 17) % 11 - 5) / 20.0 // ±0.25
      (id, Array(base + jit(0), base + jit(1), base + jit(2), base + jit(3)).map(_.toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("SqDistances: eval and codegen agree with a hand computation") {
    val mat = Seq(Seq(1.0, 2.0), Seq(0.0, 0.0))
    val df = Seq((1L, Array(3.0, 4.0))).toDF("id", "v")
    val expect = Seq(8.0, 25.0) // (3-1)²+(4-2)² ; 3²+4²
    val got = df.select(SqDistances(col("v"), mat)).head().getSeq[Double](0)
    assert(got == expect)
    // interpreted path: wrap in a non-codegen context via RDD eval of the same expr
    val gotEval = df.select(SqDistances(col("v"), mat).as("d"))
      .selectExpr("d[0]", "d[1]").head()
    assert(gotEval.getDouble(0) == 8.0 && gotEval.getDouble(1) == 25.0)
  }

  test("planted clusters: fit recovers the planting exactly (pure clusters, k=3)") {
    val emb = planted()
    val centroids = KMeans.fit(emb, k = 3, iters = 3, seed = 7L)
    assert(centroids.size == 3)
    val assigned = KMeans.assign(emb, centroids)
      .withColumn("true_c", (col("vec_id") / 40).cast("int"))
    // every true cluster maps to exactly one predicted cluster and vice versa
    val purity = assigned.groupBy(col("true_c"))
      .agg(countDistinct(col("cluster_id")).as("n_pred"))
      .agg(max(col("n_pred"))).head().getLong(0)
    assert(purity == 1L, "a planted cluster was split across predictions")
    val nPred = assigned.select(countDistinct(col("cluster_id"))).head().getLong(0)
    assert(nPred == 3L, s"expected 3 used clusters, got $nPred")
    // inertia bound: every point within jitter radius² × dim of its centroid
    val maxD = assigned.agg(max(col("sq_dist"))).head().getDouble(0)
    assert(maxD < 4 * 0.5 * 0.5, s"max sq_dist $maxD exceeds the jitter bound")
  }

  test("determinism: same model and assignments at different partitionings") {
    val a = planted().repartition(7)
    val b = planted().repartition(3)
    val ca = KMeans.fit(a, k = 3, iters = 3, seed = 7L)
    val cb = KMeans.fit(b, k = 3, iters = 3, seed = 7L)
    // centroid SETS agree to tolerance (Lloyd means may differ in ULPs
    // across partition sum orders; planted separation makes the match
    // unambiguous)
    ca.foreach { c =>
      val best = cb.map(o => c.zip(o).map { case (x, y) => (x - y) * (x - y) }.sum).min
      assert(best < 1e-6, s"centroid $c has no counterpart across partitionings")
    }
    val asgA = KMeans.assign(a, ca).select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val asgB = KMeans.assign(b, cb).select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // same partition structure (cluster ids may permute): group members agree
    val groupsA = asgA.groupBy(_._2).values.map(_.keys.toSet).toSet
    val groupsB = asgB.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(groupsA == groupsB, "cluster memberships diverged across partitionings")
  }

  test("k > distinct points: no crash, empty cells keep centroids") {
    val tiny = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val centroids = KMeans.fit(tiny, k = 5, iters = 2, seed = 1L)
    assert(centroids.nonEmpty && centroids.size <= 5)
    val stats = KMeans.assign(tiny, centroids).groupBy("cluster_id").count()
    assert(stats.agg(sum("count")).head().getLong(0) == 2L)
  }

  test("diverse sample covers every planted cluster once before revisiting") {
    val emb = planted(nPer = 40, nClusters = 5) // centers 0,10,20,30,40
    val sel = KMeans.diverseSample(emb, k = 5, seed = 7L)
    assert(sel.size == 5)
    val clusters = sel.map { case (_, id, _) => (id / 40).toInt }.toSet
    assert(clusters.size == 5,
      s"k-center picks must hit all 5 planted clusters, got $clusters")
    // determinism across partitionings
    val sel2 = KMeans.diverseSample(emb.repartition(9), k = 5, seed = 7L)
    assert(sel == sel2, "diverse sample not deterministic across partitionings")
  }
}
