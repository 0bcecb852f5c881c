package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.GraftExtensions

/** The SQL registration surface: every custom expression reachable from
  * `spark.sql(...)` must evaluate to the same result the DataFrame path
  * produces, and the `spark.sql.extensions` class form must inject
  * without error. */
class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after register()") {
    GraftExtensions.register(spark)

    val dot = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(dot === 32.0)

    val isect = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 5L, 9L), array(2L, 3L, 5L)) AS n")
      .head.getInt(0)
    assert(isect === 2)

    val sig = spark.sql(
      "SELECT minhash_sig(array(1L, 2L, 3L), 4, 42L) AS s")
      .head.getSeq[Long](0)
    assert(sig.length === 4)

    val sh = spark.sql(
      "SELECT shingle_hash_set('a b c d', 3) AS g").head.getSeq[Long](0)
    assert(sh.length === 2, "two distinct 3-grams in a 4-token text")
    // same seeded family as the DataFrame path
    val viaDf = {
      import org.apache.spark.sql.graftshim.GraftShim
      import org.apache.spark.sql.functions._
      spark.range(1).select(GraftShim.column(
        graft.functions.MinHashSig(GraftShim.expression(
          array(lit(1L), lit(2L), lit(3L))), 4, 42L)).as("s"))
        .head.getSeq[Long](0)
    }
    assert(sig === viaDf, "SQL and DataFrame paths must agree")

    val atLeast = spark.sql(
      "SELECT sorted_intersect_at_least(array(1L, 2L, 5L), array(2L, 5L, 9L), 2) AS ok")
      .head.getBoolean(0)
    assert(atLeast)

    val chunks = spark.sql(
      "SELECT size(cdc_chunks('the quick brown fox jumps over the lazy dog', 4)) AS n")
      .head.getInt(0)
    assert(chunks >= 1)

    val bag = spark.sql(
      "SELECT bag_distance_lb(char_histogram('abc', 'abcdef'), " +
        "char_histogram('abd', 'abcdef')) AS lb")
      .head.getInt(0)
    assert(bag === 1, "one char only in each side -> bound 1")

    val wf = spark.sql(
      "SELECT winnow_fps('a b c d e f g h', 4, 5) AS f").head.getSeq[String](0)
    assert(wf === Seq("a b c d"),
      "8 tokens -> 5 grams -> one window -> its min gram")
  }

  test("minhash_sig rejects non-literal sketch parameters") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), id, 42L) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected a loud literal-arg error, got: ${e.getMessage}")
  }

  test("the spark.sql.extensions class form injects all functions") {
    // The config path applies this at session build; here we hold the
    // class to "injects without throwing" against a fresh extensions
    // container (building a second SparkSession in-JVM would just
    // return the shared one).
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
