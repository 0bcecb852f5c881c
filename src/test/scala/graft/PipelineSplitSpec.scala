package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.TextPipeline

/** The leakage property of the composed e2e pipeline (VERDICT r8 item 6):
  * `doc_pipeline_e2e` assigns splits by near-dup CLUSTER — the same
  * component key `doc_leakage_safe_split` reports on — so a near-dup pair
  * whose per-doc hash assignments straddle train/test lands in ONE split.
  *
  * Synthetic corpus (buckets = (id * 2654435761) % 100):
  *  - doc 1 (bucket 61 → train) and doc 13 (bucket 93 → test): 28 of 32
  *    distinct tokens shared (Jaccard 0.875 ≥ 0.8) — one cluster, rep 1,
  *    so BOTH must land in train.
  *  - docs 2 and 23: byte-identical text — exact dedup keeps doc 2.
  *  - doc 3 (bucket 83 → val): all-unique tokens, a singleton.
  */
class PipelineSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("e2esplit").toString
    val common = (0 until 30).map(i => s"w$i")
    val nearDup = common.take(28) ++ Seq("u1", "u2")
    val dupText = (100 until 130).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, common.mkString(" ")),
      (13L, nearDup.mkString(" ")),
      (2L, dupText),
      (23L, dupText),
      (3L, (200 until 225).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("e2e pipeline splits by near-dup cluster: straddling pair co-locates") {
    val got = TextPipeline.pipelineE2e(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 13's per-doc bucket is 'test'; its cluster rep (doc 1) pulls it
    // into train. kept = {1, 13, 2, 3}; doc 23 falls to exact dedup.
    assert(got == Map("train" -> ((3L, 90L)), "val" -> ((1L, 25L))),
      s"cluster-keyed split expected train=(3,90) val=(1,25): $got")
    assert(!got.contains("test"), "near-dup doc 13 must not leak into test")
  }

  test("e2e split keys match doc_leakage_safe_split's assignment") {
    val leak = TextPipeline.leakageSafeSplit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // same component key: all 4 train docs (incl. both exact dups) in one
    // split with 2 clusters, doc 13 counted as the rescued straddler
    assert(leak == Map("train" -> ((4L, 2L, 1L)), "val" -> ((1L, 1L, 0L))),
      s"expected train=(4 docs, 2 clusters, 1 rescued) val=(1,1,0): $leak")
  }
}
