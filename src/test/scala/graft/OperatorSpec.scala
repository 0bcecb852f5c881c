package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Per-operator invariants from SURVEY.md §5: as-of join vs the brute
  * range-join definition, line-framing round trip (split∘join = id, the
  * `input/unix.go:91-104` semantics), and partition-local sort. */
class OperatorSpec extends SparkSpec {

  test("as-of join == brute-force range join + argmax on sf0.001 events") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))

    val fast = AsofJoin.asofTs(purchases, signups, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof_ts"))
    // Brute force: the definitional O(|L|*|R|) form — latest right ts <= left ts.
    val brute = purchases
      .join(signups.select(col("user_id").as("s_uid"), col("ts").as("s_ts")),
        col("user_id") === col("s_uid") && col("s_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(col("s_ts")).as("asof_ts"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[Long])] =
      df.select(col("event_id"), unix_micros(col("asof_ts")))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
    val f = rows(fast)
    assert(f.nonEmpty)
    assert(f === rows(brute))
    assert(f.exists(_._2.isEmpty), "fixture should have unmatched purchases")
  }

  test("line framing round trip: split(join(lines)) == lines") {
    val lines = Tables.documents(spark, sf0001).select(col("text"))
      .limit(50).collect().map(_.getString(0)).toSeq ++
      Seq("", "trailing space ", " leading", "tab\tinside")
    val joined = lines.mkString("\n")
    val back = spark.range(1).select(split(lit(joined), "\n").as("v"))
      .collect()(0).getSeq[String](0)
    assert(back === lines)
  }

  test("language-ID picks the language whose stopwords dominate") {
    import graft.functions.TextOps
    val samples = Seq(
      ("the cat sat on the mat and it is a cat", "en"),
      ("el perro y la casa de los gatos en un dia", "es"),
      ("le chat et la maison de les chats pour une nuit", "fr"),
      ("der hund und die katze ist ein tier von hier", "de"),
      ("zzz qqq xxx", "und"))
    import spark.implicits._
    val got = samples.map(_._1).toDF("text")
      .select(TextOps.langId(TextOps.tokens(col("text"))).as("pred"))
      .collect().map(_.getString(0)).toSeq
    assert(got === samples.map(_._2))
  }

  test("fingerprint is edit-robust where a whole-text hash is not") {
    import graft.functions.TextOps
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val edited = base + " omega" // one appended token
    val df = Seq(base, edited).toDF("text")
      .select(TextOps.fingerprint(TextOps.tokens(col("text")), 3).as("fp"),
        sha2(col("text"), 256).as("h"))
      .collect()
    assert(df(0).getLong(0) === df(1).getLong(0), "min-shingle fingerprint should survive a 1-token append")
    assert(df(0).getString(1) !== df(1).getString(1))
  }

  test("batch partitioned parquet write prunes partitions on filtered read") {
    // The batch-side twin of StreamingSpec's lake-layout pruning test:
    // a Hive-layout partitioned write must let a partition-key filter
    // skip whole directories at planning time (PartitionFilters), not
    // scan-and-discard — at 100 TB this is the difference between
    // reading one partition and reading the lake.
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val reads = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val p = reads.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type")
      || p.contains("PartitionFilters: [(event_type"),
      s"partition filter must reach the scan:\n$p")
    assert(!p.contains("PushedFilters: [IsNotNull(event_type"),
      "partition key must prune directories, not run as a data filter")
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(reads.count() === expected)
  }

  test("sortWithinPartitions orders every partition without a shuffle") {
    val df = Tables.orders(spark, sf0001)
      .repartition(4, col("o_orderstatus"))
      .sortWithinPartitions(col("o_totalprice"))
    // no Exchange may appear above the Sort (partition-local)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && !plan.matches("(?s).*Sort.*Exchange.*Sort.*"))
    val ok = df.select(col("o_totalprice")).rdd
      .mapPartitions { it =>
        val v = it.map(_.getDouble(0)).toSeq
        Iterator(v == v.sorted)
      }.collect()
    assert(ok.forall(identity))
  }

  test("contamination bloom pre-filter is output-invariant (exact semi-join verifies)") {
    // the bloom only drops rows the semi-join would drop anyway; its
    // false positives are removed BY the semi-join — so the two modes
    // must agree row-for-row, and the bloom's only effect is fewer
    // shuffled bytes
    val a = graft.queries.TextPipeline.contamination(spark, sf0001, bloomPrefilter = true)
    val b = graft.queries.TextPipeline.contamination(spark, sf0001, bloomPrefilter = false)
    assert(a.count() > 0, "fixture must exhibit contamination")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "bloom pre-filter must not change the result")
  }

  test("parquet compression codecs round-trip bit-identically (zstd, snappy, gzip, lz4)") {
    import org.apache.spark.sql.functions._
    // codec choice is a scale lever (zstd ~30% smaller than snappy at
    // similar scan cost); each must round-trip the same rows
    val src = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val sig = src.agg(count(lit(1)),
      bit_xor(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))))
      .head()
    Seq("zstd", "snappy", "gzip", "lz4").foreach { codec =>
      val dir = java.nio.file.Files.createTempDirectory(s"codec_$codec").toString
      src.write.option("compression", codec).mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).agg(count(lit(1)),
        bit_xor(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))))
        .head()
      assert(back == sig, s"codec $codec did not round-trip")
    }
  }

  test("hash-function family agrees with reference implementations (crc32)") {
    import spark.implicits._
    // crc32 has no DuckDB analogue, so it is gated here against the JDK's
    // CRC32 (the authoritative implementation) instead of the oracle
    val texts = Seq("graft", "", "the quick brown fox", "čšž unicode")
    val got = texts.toDF("t").select(crc32(col("t").cast("binary"))).collect()
      .map(_.getLong(0))
    val expect = texts.map { t =>
      val c = new java.util.zip.CRC32()
      c.update(t.getBytes("UTF-8")); c.getValue
    }
    assert(got.toSeq === expect)
  }
}
