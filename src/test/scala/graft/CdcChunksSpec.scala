package graft

import org.apache.spark.sql.functions._
import graft.functions.CdcChunks

/** The content-defined chunker is gated three ways: bit-equality with a
  * plain-Scala reference implementation (both eval modes), structural
  * invariants (lens partition the bytes, min-chunk respected), and the
  * property CDC exists for — boundaries resynchronize after an edit, so
  * documents sharing a long run of bytes share chunk fingerprints. */
class CdcChunksSpec extends SparkSpec {

  /** Reference implementation: same window/multiplier/min-chunk/mask
    * contract, written independently over a byte array. */
  private def reference(text: String, maskBits: Int): Seq[(Long, Int)] = {
    val bytes = text.getBytes("UTF-8")
    val W = 16; val M = 31L; val min = 8
    val topPow = (1 until W).foldLeft(1L)((p, _) => p * M)
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    def fp(from: Int, until: Int): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L)
    var start = 0; var h = 0L
    for (i <- bytes.indices) {
      h = h * M + (bytes(i) & 0xFF)
      val n = i - start + 1
      if (n > W) h -= topPow * M * (bytes(i - W) & 0xFF)
      if (n >= min && (h & mask) == 0L) {
        out += ((fp(start, i + 1), n)); start = i + 1; h = 0L
      }
    }
    if (start < bytes.length) out += ((fp(start, bytes.length), bytes.length - start))
    out.toSeq
  }

  private def viaSpark(texts: Seq[String], maskBits: Int): Seq[Seq[(Long, Int)]] = {
    import spark.implicits._
    texts.toDF("t").select(CdcChunks(col("t"), maskBits).as("c"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getInt(1))))
  }

  private val rnd = new scala.util.Random(77)
  private def randomText(n: Int): String =
    (1 to n).map(_ => ('a' + rnd.nextInt(27)).toChar match {
      case c if c > 'z' => ' '
      case c => c
    }).mkString

  test("expression equals the reference implementation (both eval modes)") {
    val texts = Seq("", "short", randomText(50), randomText(500),
      randomText(5000), "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        val got = viaSpark(texts, 6)
        val want = texts.map(reference(_, 6))
        assert(got === want, s"$mode: chunker diverges from reference")
      }
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
  }

  test("chunk lens partition the byte length; non-final chunks respect min-chunk") {
    val texts = (1 to 50).map(_ => randomText(rnd.nextInt(2000)))
    viaSpark(texts, 6).zip(texts).foreach { case (chunks, t) =>
      assert(chunks.map(_._2).sum === t.getBytes("UTF-8").length)
      chunks.dropRight(1).foreach { case (_, len) => assert(len >= 8) }
      chunks.foreach { case (_, len) => assert(len >= 1) }
    }
  }

  test("boundaries resynchronize: edited prefix, shared suffix chunks survive") {
    val shared = randomText(4000)
    val a = randomText(300) + shared
    val b = randomText(517) + shared
    val Seq(ca, cb) = viaSpark(Seq(a, b), 6)
    val common = ca.map(_._1).toSet & cb.map(_._1).toSet
    // the suffix is ~93% of each doc; after resync nearly all of its
    // chunks must coincide (exact count depends on where boundaries
    // fall around the splice point)
    assert(common.size >= (ca.length * 6) / 10,
      s"only ${common.size} of ~${ca.length} chunks shared after a prefix edit")
    // and unrelated docs share (essentially) nothing
    val Seq(cx, cy) = viaSpark(Seq(randomText(3000), randomText(3000)), 6)
    val collide = cx.map(_._1).toSet & cy.map(_._1).toSet
    assert(collide.size <= 2, s"unrelated docs share ${collide.size} chunks")
  }
}
