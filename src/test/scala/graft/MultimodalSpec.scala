package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** The multimodal layer: container synthesis, the pure-JVM header parse,
  * partition-batched decode, and frame sampling must behave
  * deterministically end to end. */
class MultimodalSpec extends SparkSpec {

  test("image aHash: hand-computable bits, edit stability, discrimination, banded pairs") {
    import spark.implicits._
    import Multimodal.{MediaRecord, imageAHash}
    val hdr = Array.fill[Byte](54)(0)
    // 64 one-byte blocks 0..63: mean 31.5, so bits 32..63 set exactly
    val ramp = MediaRecord(0L, hdr ++ (0 until 64).map(_.toByte).toArray)
    // blocky payload far from the mean: flipping two bytes inside one
    // block cannot move any block across the global mean -> hash stable
    val blocky = (b: Int => Byte) => hdr ++
      (0 until 64).flatMap(i => Array.fill(16)(b(i))).toArray
    val base = MediaRecord(2L, blocky(i => if (i % 2 == 0) 10 else 100))
    val edited0 = blocky(i => if (i % 2 == 0) 10 else 100)
    edited0(54) = 13; edited0(60) = 14 // two-byte edit in block 0
    val edited = MediaRecord(4L, edited0)
    val inverted = MediaRecord(6L, blocky(i => if (i % 2 == 0) 100 else 10))
    val hs = imageAHash(Seq(ramp, base, edited, inverted).toDS())
      .collect().map(h => h.doc_id -> h.ahash).toMap
    assert(hs(0L) == java.lang.Long.parseUnsignedLong("ffffffff00000000", 16),
      f"ramp hash must set exactly bits 32..63, got ${hs(0L)}%016x")
    assert(java.lang.Long.bitCount(hs(2L) ^ hs(4L)) == 0,
      "a two-byte edit inside one far-from-mean block must not flip bits")
    assert(java.lang.Long.bitCount(hs(2L) ^ hs(6L)) == 64,
      "inverting every block must flip every bit")
  }

  test("phash pairs flag the woven re-encodes and no corpus-noise pairs") {
    val pairs = Multimodal.phashPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(pairs.nonEmpty, "the re-encode weave must produce pairs")
    assert(pairs.forall(_._3 <= 3), "banded candidates must verify by exact hamming")
    // every pair is original <-> its re-encoded variant (id + 1000000):
    // the corpus's own images sit >= 16 bits apart (measured), so any
    // other pair here is a detector bug
    assert(pairs.forall(p => p._2 == p._1 + 1000000L),
      s"unexpected non-weave pair: ${pairs.mkString(",")}")
    assert(pairs.length >= 4, s"at sf0.001, ~5 of 50 even ids are woven: $pairs")
  }

  test("decoder parses hand-built BMP and WAV headers exactly") {
    import spark.implicits._
    // BMP 640x480, built byte-by-byte independently of synthMedia
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val bmp = ("BM".getBytes("ASCII") ++ le(58, 4) ++ le(0, 4) ++ le(54, 4) ++
      le(40, 4) ++ le(640, 4) ++ le(480, 4) ++ le(1, 2) ++ le(24, 2) ++
      le(0, 4) ++ le(4, 4) ++ le(2835, 4) ++ le(2835, 4) ++ le(0, 4) ++ le(0, 4) ++
      Array[Byte](1, 2, 3, 4))
    // WAV 44100 Hz stereo
    val wav = ("RIFF".getBytes("ASCII") ++ le(40, 4) ++ "WAVE".getBytes("ASCII") ++
      "fmt ".getBytes("ASCII") ++ le(16, 4) ++ le(1, 2) ++ le(2, 2) ++
      le(44100, 4) ++ le(44100L * 2 * 2, 4) ++ le(4, 2) ++ le(16, 2) ++
      "data".getBytes("ASCII") ++ le(4, 4) ++ Array[Byte](9, 9, 9, 9))
    val junk = Array.fill[Byte](60)(7)
    val out = Multimodal.decode(Seq(
        Multimodal.MediaRecord(1L, bmp),
        Multimodal.MediaRecord(2L, wav),
        Multimodal.MediaRecord(3L, junk)).toDS())
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(1L) === Multimodal.DecodedMedia(1L, "bmp",
      Some(640), Some(480), None, None, bmp.length.toLong))
    assert(out(2L) === Multimodal.DecodedMedia(2L, "wav",
      None, None, Some(44100), Some(2), wav.length.toLong))
    assert(out(3L).format === "unknown")
  }

  test("PNG decode: known pixels round-trip the real javax.imageio codec exactly (r17)") {
    import spark.implicits._
    import Multimodal.MediaRecord
    // hand-encode a 3x2 grayscale PNG with known pixels, independently
    // of synthPng, and decode through the partition-batched path
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Seq(7, 42, 99, 0, 255, 128)
    px.zipWithIndex.foreach { case (v, i) =>
      img.getRaster.setSample(i % 3, i / 3, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val decoded = Multimodal.decodePngStats(
      Seq(MediaRecord(1L, bos.toByteArray),
        MediaRecord(2L, "not a png".getBytes("ASCII"))).toDS()).collect()
    assert(decoded.length == 1, "a non-PNG payload must be rejected, not faked")
    val d = decoded.head
    assert((d.doc_id, d.format, d.width, d.height, d.n_pixels, d.pixel_sum) ===
      ((1L, "png", 3, 2, 6L, px.sum.toLong)))
  }

  test("JPEG decode: real lossy codec — dims exact, means within quantization bounds, non-JPEG rejected (r17)") {
    import spark.implicits._
    import Multimodal.MediaRecord
    def jpegOf(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JPEG encoder present")
      bos.toByteArray
    }
    // uniform gray: DCT of a constant block is a lone DC coefficient —
    // quantization recovers it within a level or two
    val uniform = jpegOf(16, 16, (_, _) => 128)
    // 8x8 constant blocks aligned to the DCT grid: same argument per block
    val blocks = jpegOf(32, 16, (x, y) => 32 + 64 * ((x / 8 + y / 8) % 4))
    val out = Multimodal.decodeJpegStats(Seq(
        MediaRecord(1L, uniform), MediaRecord(2L, blocks),
        MediaRecord(3L, "not a jpeg".getBytes("ASCII"))).toDS())
      .collect().map(d => d.doc_id -> d).toMap
    assert(out.keySet === Set(1L, 2L), "non-JPEG payloads must be rejected")
    assert((out(1L).format, out(1L).width, out(1L).height, out(1L).n_pixels) ===
      (("jpeg", 16, 16, 256L)))
    assert(math.abs(out(1L).pixel_sum.toDouble / 256 - 128.0) <= 2.0,
      s"uniform mean must survive quantization: ${out(1L).pixel_sum / 256.0}")
    assert((out(2L).width, out(2L).height) === ((32, 16)))
    val blockMeanIn = (32 + 96 + 160 + 224) / 4.0
    assert(math.abs(out(2L).pixel_sum.toDouble / 512 - blockMeanIn) <= 4.0,
      s"block-gradient mean must survive quantization: ${out(2L).pixel_sum / 512.0}")
  }

  test("synthPng payloads are REAL PNGs whose decode replays the source text exactly (r17)") {
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.synthPng(spark, dir).collect()
    assert(media.nonEmpty)
    // every payload opens with the PNG magic — genuine containers
    assert(media.forall(m => (m.payload(0) & 0xFF) == 0x89 &&
      m.payload(1) == 'P' && m.payload(2) == 'N' && m.payload(3) == 'G'))
    val stats = Multimodal.decodePngStats(
        Multimodal.synthPng(spark, dir)).collect()
      .map(d => d.doc_id -> d).toMap
    // driver-side oracle from the fixture text — dims + wrapped pixel sum
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stats.nonEmpty && stats.size == docs.count { case (_, t) =>
      t.nonEmpty && t.forall(_ < 0x80) })
    stats.foreach { case (id, d) =>
      val t = docs(id)
      val (w, h) = (8 + t.length % 24, 8 + (t.length * 3) % 16)
      val expect = (0 until w * h).map(i => t.charAt(i % t.length).toLong).sum
      assert((d.width, d.height, d.pixel_sum) === ((w, h, expect)),
        s"doc $id: decoded stats must replay the source text")
    }
  }

  test("synthGif payloads are REAL multi-frame GIFs whose per-frame decode replays the source text exactly (r18)") {
    import spark.implicits._
    import Multimodal.MediaRecord
    val dir = "/root/testdata/sf0.001"
    val media = Multimodal.synthGif(spark, dir).collect()
    assert(media.nonEmpty)
    // every payload opens with the GIF magic — genuine containers
    assert(media.forall(m => m.payload(0) == 'G' && m.payload(1) == 'I' &&
      m.payload(2) == 'F' && m.payload(3) == '8'))
    val frames = Multimodal.decodeGifFrames(Multimodal.synthGif(spark, dir))
      .collect().groupBy(_.doc_id)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(frames.nonEmpty && frames.size == docs.count { case (_, t) =>
      t.nonEmpty && t.forall(_ < 0x80) })
    frames.foreach { case (id, fs) =>
      val t = docs(id)
      val (w, h) = (8 + t.length % 13, 6 + (t.length * 3) % 11)
      val nf = 2 + t.length % 3
      assert(fs.length == nf,
        s"doc $id: the reader must enumerate all $nf frames, got ${fs.length}")
      fs.sortBy(_.frame_idx).zipWithIndex.foreach { case (d, f) =>
        assert(d.frame_idx == f)
        val expect = (0 until w * h)
          .map(i => t.charAt((f * 7 + i) % t.length).toLong).sum
        assert((d.width, d.height, d.pixel_sum) === ((w, h, expect)),
          s"doc $id frame $f: decoded stats must replay the source text")
      }
    }
    // a non-GIF payload is rejected like a decoder, not faked
    val rejected = Multimodal.decodeGifFrames(
      Seq(MediaRecord(9L, "not a gif".getBytes("ASCII"))).toDS()).collect()
    assert(rejected.isEmpty)
  }

  test("nearest-neighbor resize samples exactly every other row/column") {
    import spark.implicits._
    // 256 bytes, b[k] = k: stride 64 -> 4 rows, 2x down -> 2x32 output
    // sampling rows {0,2} cols {0,2,...,62}:
    //   row 0: sum 0+2+...+62 = 992; row 2: sum (128+0)+(128+2)+... = 32*128+992
    val ramp = Array.tabulate[Byte](256)(k => k.toByte)
    val short = Array.fill[Byte](100)(1) // < 128 bytes -> dropped
    val out = Multimodal.resize(Seq(
        Multimodal.MediaRecord(1L, ramp),
        Multimodal.MediaRecord(2L, short)).toDS())
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet === Set(1L), "truncated payloads must be dropped")
    assert(out(1L) === Multimodal.ResizedMedia(1L, 32, 2, 992L + 32 * 128 + 992))
  }

  test("synthesized containers round-trip through the decoder") {
    val a = Multimodal.decodeQuery(spark, sf0001).collect()
    val b = Multimodal.decodeQuery(spark, sf0001).collect()
    assert(a.length === 500)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val df = Multimodal.decodeQuery(spark, sf0001)
    assert(df.filter(!col("format").isin("bmp", "wav")).count() === 0,
      "every synthesized payload must parse as its container format")
    assert(df.filter(col("format") === "bmp" &&
      (col("width") < 16 || col("height") < 16)).count() === 0)
    assert(df.filter(col("format") === "wav" &&
      (col("sample_rate") < 8000 || !col("channels").isin(1, 2))).count() === 0)
  }

  test("decode runs partition-batched regardless of partitioning") {
    import spark.implicits._
    val media = Multimodal.synthMedia(spark, sf0001)
      .as[Multimodal.MediaRecord].repartition(7)
    val out = Multimodal.decode(media)
    assert(out.count() === 500)
    assert(out.select("doc_id").distinct().count() === 500)
  }

  test("audio sample decode: hand-built WAV yields exact int16 energy") {
    import spark.implicits._
    // 44-byte header + 3 LE int16 samples: 1, -2, 300
    val samples = Seq[Short](1, -2, 300)
    val data = samples.flatMap(s =>
      Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)).toArray
    val header = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)
    header.write("RIFF".getBytes); header.write(le32(36 + data.length))
    header.write("WAVE".getBytes)
    header.write("fmt ".getBytes); header.write(le32(16)); header.write(le16(1))
    header.write(le16(1)); header.write(le32(8000)); header.write(le32(16000))
    header.write(le16(2)); header.write(le16(16))
    header.write("data".getBytes); header.write(le32(data.length))
    header.write(data)
    // a structurally valid WAV whose chunk at offset 36 is LIST, not
    // data (ADVICE r5): the simple 44-byte-layout reader must reject it
    // rather than decode the LIST chunk header+body as samples
    val listWav = new java.io.ByteArrayOutputStream()
    listWav.write(header.toByteArray, 0, 36)
    listWav.write("LIST".getBytes); listWav.write(le32(4))
    listWav.write("INFO".getBytes)
    listWav.write("data".getBytes); listWav.write(le32(data.length))
    listWav.write(data)
    val media = Seq(Multimodal.MediaRecord(7L, header.toByteArray),
      Multimodal.MediaRecord(8L, "not audio".getBytes),
      Multimodal.MediaRecord(9L, listWav.toByteArray)).toDS()
    val out = Multimodal.audioStats(media).collect()
    assert(out.length === 1,
      "non-WAV and non-canonical-chunk payloads must be rejected")
    val a = out.head
    assert(a.doc_id === 7L && a.n_samples === 3)
    assert(a.sum_sq === (1L * 1 + 2L * 2 + 300L * 300))
    assert(a.rms === math.sqrt((1.0 + 4.0 + 90000.0) / 3))
  }

  test("audio frames: full 2-sample windows with exact energy, tail dropped") {
    import spark.implicits._
    // 5 samples at frame=2 -> frames [1,-2], [300,4]; tail [5] dropped
    val samples = Seq[Short](1, -2, 300, 4, 5)
    val data = samples.flatMap(s =>
      Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)).toArray
    def le32(v: Int): Array[Byte] = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)
    val h = new java.io.ByteArrayOutputStream()
    h.write("RIFF".getBytes); h.write(le32(36 + data.length)); h.write("WAVE".getBytes)
    h.write("fmt ".getBytes); h.write(le32(16)); h.write(le16(1)); h.write(le16(1))
    h.write(le32(8000)); h.write(le32(16000)); h.write(le16(2)); h.write(le16(16))
    h.write("data".getBytes); h.write(le32(data.length)); h.write(data)
    val out = Multimodal.audioFrames(
      Seq(Multimodal.MediaRecord(3L, h.toByteArray)).toDS(), frame = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(f => (f.frame_idx, f.sum_sq)).toSeq ===
      Seq((0, 1L * 1 + 2L * 2), (1, 300L * 300 + 4L * 4)))
    assert(out.forall(f => f.rms === math.sqrt(f.sum_sq.toDouble / 2)))
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
