package graft

import org.apache.spark.sql.functions._
import graft.functions.{BagDistanceLB, CharHistogram}

/** Gates for the edit-distance prune pair: CharHistogram must count
  * exactly (incl. clamping and non-ASCII skip), BagDistanceLB must be a
  * TRUE Levenshtein lower bound (an over-estimate would silently drop
  * pairs from doc_editdist_pairs), and both expressions must agree
  * between interpreted and codegen eval. */
class BagDistanceSpec extends SparkSpec {
  import spark.implicits._

  private val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,"

  test("CharHistogram counts match a naive per-char count") {
    val texts = Seq("hello world", "", "aaa bbb, c.c", "no excl or colon here")
    val got = texts.toDF("text")
      .select(CharHistogram(col("text"), alphabet).as("h"))
      .collect().map(_.getAs[Array[Byte]](0))
    texts.zip(got).foreach { case (t, h) =>
      assert(h.length == alphabet.length)
      alphabet.zipWithIndex.foreach { case (c, i) =>
        assert((h(i) & 0xFF) == t.count(_ == c), s"char '$c' in '$t'")
      }
    }
  }

  test("CharHistogram clamps at 255 and skips non-ASCII / non-alphabet chars") {
    val long = "a" * 300 + "b" * 2
    val mixed = "aé世b!" // é and 世 are multi-byte; ! not in alphabet
    val got = Seq(long, mixed).toDF("text")
      .select(CharHistogram(col("text"), alphabet).as("h"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert((got(0)(0) & 0xFF) == 255) // 'a' clamped
    assert((got(0)(1) & 0xFF) == 2)   // 'b' exact
    assert((got(1)(0) & 0xFF) == 1 && (got(1)(1) & 0xFF) == 1)
    assert(got(1).map(_ & 0xFF).sum == 2) // only a and b counted
  }

  test("BagDistanceLB is a true Levenshtein lower bound on random mutation pairs") {
    val rnd = new scala.util.Random(7)
    val chars = "abcdefgh 01"
    def randStr(n: Int) = Seq.fill(n)(chars(rnd.nextInt(chars.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.patch(p, "", 1)                   // delete
          case 1 => cur.patch(p, chars(rnd.nextInt(chars.length)).toString, 0) // insert
          case _ if cur.nonEmpty => cur.updated(p, chars(rnd.nextInt(chars.length)))
          case _ => cur
        }
      }
      cur
    }
    val pairs = (1 to 200).map { i =>
      val a = randStr(20 + rnd.nextInt(200))
      val b = if (i % 3 == 0) randStr(20 + rnd.nextInt(200)) else mutate(a, rnd.nextInt(30))
      (a, b)
    }
    val bad = pairs.toDF("a", "b")
      .select(
        BagDistanceLB(CharHistogram(col("a"), alphabet),
          CharHistogram(col("b"), alphabet)).as("lb"),
        levenshtein(col("a"), col("b")).as("lev"))
      .filter(col("lb") > col("lev"))
      .count()
    assert(bad == 0L, "bag-distance bound exceeded true Levenshtein")
  }

  test("interpreted and codegen eval agree for both expressions") {
    val rows = Seq("graft engine", "", "zzz,,, ...", "a" * 300, "münchen 42")
      .toDF("text")
      .withColumn("h", CharHistogram(col("text"), alphabet))
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      val results = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { mode =>
        spark.conf.set("spark.sql.codegen.factoryMode", mode)
        rows.alias("x").crossJoin(rows.select(col("h").as("h2"), col("text").as("t2")))
          .select(col("text"), col("t2"), col("h"),
            BagDistanceLB(col("h"), col("h2")).as("lb"))
          .orderBy(col("text"), col("t2"))
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getAs[Array[Byte]](2).toSeq, r.getInt(3))).toSeq
      }
      assert(results(0) == results(1))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("nulls propagate") {
    val got = Seq((Some("ab"), None: Option[String]), (None, Some("cd")))
      .toDF("a", "b")
      .select(BagDistanceLB(CharHistogram(col("a"), alphabet),
        CharHistogram(col("b"), alphabet)).as("lb"))
      .collect()
    assert(got.forall(_.isNullAt(0)))
  }
}
