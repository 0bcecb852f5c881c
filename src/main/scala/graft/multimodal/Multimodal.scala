package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2b "multimodal columns"): media
  * payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / frame-sample run as
  * partition-batched transforms.
  *
  * STUB NOTICE — the codec step: this container ships no image/audio
  * libraries, so `decodeStub` derives metadata DETERMINISTICALLY from the
  * payload bytes (hash-derived width/height/frames) instead of parsing a
  * real container format. Everything around it is the real engine
  * surface a production decoder would plug into: the binary column
  * schema, the `Dataset[MediaRecord]` encoder, the per-PARTITION batch
  * iterator (the JVM analog of arrow-batched `mapInPandas` — one decoder
  * init per partition, amortized over its rows, no per-row UDF), and the
  * frame-sample explode. Swapping the fake for a real codec changes one
  * function body and zero plumbing.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (filled by decode). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, format: String, width: Int,
                          height: Int, n_frames: Int, n_bytes: Long)

  /** Documents as binary media payloads — the ingestion shape: any
    * bytes-valued source lands as (id, payload: binary). */
  def asMedia(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-batched decode: one iterator per partition, so a real
    * codec would init once per task, not once per row. The decode body
    * is the STUB (deterministic hash-derived metadata). */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open() here, once per partition
      it.map { r =>
        val h = java.util.Arrays.hashCode(r.payload)
        val fmt = Seq("img", "audio", "video")(Math.floorMod(h, 3))
        DecodedMedia(r.doc_id, fmt,
          width = 16 + Math.floorMod(h >> 2, 1920),
          height = 16 + Math.floorMod(h >> 11, 1080),
          n_frames = 1 + Math.floorMod(h >> 17, 64),
          n_bytes = r.payload.length.toLong)
      }
    }
  }

  /** Decode query: payloads → typed metadata rows (engine-only —
    * deterministic but the fake metadata has no SQL oracle). */
  def decodeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeStub(asMedia(s, dir).as[MediaRecord])
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: fixed-stride byte slices of the payload — the same
    * explode/slice plumbing a video frame sampler produces, with
    * oracle-checkable digests (substring over binary is exact). */
  def frameSample(s: SparkSession, dir: String, nFrames: Int = 4,
                  frameBytes: Int = 64): DataFrame =
    asMedia(s, dir)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
          k => substring(col("payload"), k * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(length(col("frame")) > 0)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        sha2(col("frame"), 256).as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> ((s, d) => decodeQuery(s, d)),
    "mm_frame_sample" -> ((s, d) => frameSample(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "mm_frame_sample" ->
      """SELECT doc_id, k - 1 AS frame_idx,
        | CAST(octet_length(CAST(substring(text, (k-1)*64 + 1, 64) AS BLOB)) AS BIGINT)
        |   AS frame_bytes,
        | sha256(substring(text, (k-1)*64 + 1, 64)) AS frame_digest
        |FROM documents CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS k) f
        |WHERE octet_length(CAST(substring(text, (k-1)*64 + 1, 64) AS BLOB)) > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
