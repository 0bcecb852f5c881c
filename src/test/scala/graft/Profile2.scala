package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir); docs.count()
    val t = 0.8
    val toks = docs.select(col("doc_id"), Dedup.hashedTokenSet(col("text")).as("toks")).localCheckpoint()
    def tmr(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[p2] $name%-38s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
    }
    val sized = toks.select(col("doc_id"), col("toks").as("_tk"), size(col("toks")).as("_sz"))
    val tokenDf = sized.select(explode(col("_tk")).as("_tok")).groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    val ranked = sized.select(col("doc_id"), col("_sz"), explode(col("_tk")).as("_tok"))
      .join(tokenDf, "_tok")
      .withColumn("_rk", row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("_df"), col("_tok"))))
    val prefixPlan = ranked
      .filter(col("_rk") <= col("_sz") - ceil(lit(t) * col("_sz") - lit(1e-9)) + 1)
      .withColumn("_parr", flatten(transform(
        array_sort(collect_list(struct(col("_df"), col("_tok"))).over(Window.partitionBy(col("doc_id")))),
        s => array(s.getField("_df"), s.getField("_tok")))))
      .select(col("_tok"), col("_df"), col("doc_id"), col("_sz"), col("_rk"), col("_parr"))
    var prefix: org.apache.spark.sql.DataFrame = null
    tmr("prefix build+checkpoint") { prefix = prefixPlan.localCheckpoint(); prefix.count() }
    val a = prefix.select(col("_tok"), col("_df"), col("doc_id").as("id1"), col("_sz").as("_sz1"), col("_rk").as("_rk1"), col("_parr").as("_parr1"))
    val b = prefix.select(col("_tok"), col("doc_id").as("id2"), col("_sz").as("_sz2"), col("_rk").as("_rk2"), col("_parr").as("_parr2"))
    def joined = a.join(b, "_tok")
      .filter(col("id1") < col("id2"))
      .filter(col("_sz2") >= lit(t) * col("_sz1") - lit(1e-9) && col("_sz1") >= lit(t) * col("_sz2") - lit(1e-9))
      .filter(lit(1) + least(col("_sz1") - col("_rk1"), col("_sz2") - col("_rk2"))
        >= ceil(lit(t / (1 + t)) * (col("_sz1") + col("_sz2")) - lit(1e-9)))
    for (rep <- 1 to 2) {
      tmr(s"rep$rep join+filters only") { joined.count() }
      tmr(s"rep$rep join+filters+witness") {
        joined.filter(graft.functions.IsEarliestWitness(col("_parr1"), col("_parr2"), col("_df"), col("_tok"))).count()
      }
    }
    joined.filter(graft.functions.IsEarliestWitness(col("_parr1"), col("_parr2"), col("_df"), col("_tok"))).explain("formatted")
    spark.stop()
  }
}
