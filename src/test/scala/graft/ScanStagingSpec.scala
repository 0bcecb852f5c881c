package graft

import org.apache.spark.sql.functions._

/** Stage-once scan staging (VERDICT r10 item 7): warmed runs must not
  * rewrite the staging copy (the write used to sit inside the timed
  * bench path and its IO wobble dominated the noisiest rows), while a
  * fixture regenerated IN PLACE must re-stage — the same source-status
  * rule the index ensure() family uses, so a stale staged copy can
  * never serve a regenerated corpus. */
class ScanStagingSpec extends SparkSpec {
  import spark.implicits._

  test("second run reuses the staged copy; in-place regen re-stages") {
    val fixture = java.nio.file.Files.createTempDirectory("scanstage").toString
    Tables.documents(spark, sf0001).limit(50)
      .write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    def stagedFiles: Map[String, Long] = {
      val staged = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_scan/" +
          fixture.replaceAll("[^a-zA-Z0-9]", "_") + "/docs_text")
      staged.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    def run() = graft.queries.Scans.scanText(spark, fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val first = run()
    val files1 = stagedFiles
    assert(run() == first)
    assert(stagedFiles == files1,
      "warmed run must not rewrite the staging copy")
    // regenerate the fixture in place with different content
    Tables.documents(spark, sf0001).limit(20)
      .write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val second = run()
    assert(second._1 == 20L,
      s"regenerated fixture must re-stage, got $second")
    assert(stagedFiles != files1, "re-stage must produce new staged files")
  }
}
