package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** The multimodal plumbing is real even though the codec is stubbed:
  * schema, encoders, partition-batched decode, and frame sampling must
  * behave deterministically end to end. */
class MultimodalSpec extends SparkSpec {

  test("decode stub is deterministic and total over the corpus") {
    val a = Multimodal.decodeQuery(spark, sf0001).collect()
    val b = Multimodal.decodeQuery(spark, sf0001).collect()
    assert(a.length === 500)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val df = Multimodal.decodeQuery(spark, sf0001)
    assert(df.filter(col("width") < 16 || col("height") < 16 || col("n_frames") < 1)
      .count() === 0)
    assert(df.filter(!col("format").isin("img", "audio", "video")).count() === 0)
  }

  test("decode runs partition-batched regardless of partitioning") {
    import spark.implicits._
    val media = Multimodal.asMedia(spark, sf0001)
      .as[Multimodal.MediaRecord].repartition(7)
    val out = Multimodal.decodeStub(media)
    assert(out.count() === 500)
    assert(out.select("doc_id").distinct().count() === 500)
  }

  test("frame sample slices cover payload prefix with exact digests") {
    val fs = Multimodal.frameSample(spark, sf0001)
    // every doc contributes at least one frame; frame 0 digest must equal
    // the digest of the payload's first 64 bytes computed independently
    val independent = Multimodal.asMedia(spark, sf0001)
      .select(col("doc_id"), sha2(substring(col("payload"), 1, 64), 256).as("d0"))
    val joined = fs.filter(col("frame_idx") === 0)
      .join(independent, "doc_id")
      .filter(col("frame_digest") =!= col("d0"))
    assert(joined.count() === 0)
  }
}
