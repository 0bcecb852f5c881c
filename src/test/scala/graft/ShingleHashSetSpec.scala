package graft

import org.apache.spark.sql.functions._
import graft.functions.{ShingleHashSet, TextOps}

/** The fused shingle hasher must be BIT-IDENTICAL to the HOF chain it
  * replaced — same xxhash64 seed, same split-on-every-space semantics
  * (empty tokens preserved), same <n-token empty-array guard — so the
  * near-dup family's outputs are provably unchanged by the swap. */
class ShingleHashSetSpec extends SparkSpec {

  private def hofGrams(n: Int) =
    array_sort(transform(
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), n)),
      g => xxhash64(g)))

  private def hofTokens =
    array_sort(transform(array_distinct(TextOps.tokens(col("text"))), t => xxhash64(t)))

  private val edges = Seq(
    "",                       // empty text -> one empty token
    "a",                      // single token
    "a b",                    // below 3-gram width
    "a b c",                  // exactly one 3-gram
    "a  b",                   // double space -> empty middle token
    "a b ",                   // trailing space -> trailing empty token
    " a b",                   // leading space
    "x x x x",                // repeated tokens -> hash dedup
    "the quick brown fox jumps")

  test("n=1 fused == HOF hashed token set, bit for bit (fixture + edges)") {
    import spark.implicits._
    val fixture = Tables.documents(spark, sf001).select(col("text"))
    val all = fixture.union(edges.toDF("text"))
    val diff = all
      .select(ShingleHashSet(col("text"), 1).as("fused"), hofTokens.as("hof"))
      .filter(not(col("fused") === col("hof")))
      .count()
    assert(diff === 0)
  }

  test("n=3 fused == HOF shingle hashes, bit for bit (fixture + edges)") {
    import spark.implicits._
    val fixture = Tables.documents(spark, sf001).select(col("text"))
    val all = fixture.union(edges.toDF("text"))
    val diff = all
      .select(ShingleHashSet(col("text"), 3).as("fused"), hofGrams(3).as("hof"))
      .filter(not(col("fused") === col("hof")))
      .count()
    assert(diff === 0)
  }

  test("fused expression compiles under CODEGEN_ONLY factory mode") {
    val prevFb = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = Tables.documents(spark, sf0001)
        .select(ShingleHashSet(col("text"), 3).as("g"))
        .selectExpr("sum(size(g))").head.getLong(0)
      assert(n > 0)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFb)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}
