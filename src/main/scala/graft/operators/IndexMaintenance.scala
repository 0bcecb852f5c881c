package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared mechanics of persisted-index compaction — the small-files
  * lifecycle valve all three index families use ([[ClusterIndex]],
  * [[TextIndex]], [[VectorIndex]]). Each streaming append adds its own
  * files per table (up to the bucket count per batch), so a long-running
  * ingest accretes O(batches × buckets) files; compaction rewrites each
  * table as one file per partition directory with PURE I/O — no
  * re-tokenize, no re-sign, no re-cluster — into `<dir>.compact`, then
  * swaps directories.
  *
  * PRECONDITION (all callers): a quiesced index — no in-flight append
  * and no running stream batch. The swap is two renames; a crash
  * between them leaves the index momentarily absent with the complete
  * old state at `<dir>.old` — re-run compact() or rename it back, both
  * states are self-consistent.
  */
private[operators] object IndexMaintenance {

  /** Trailing slashes would make `<dir>.compact` / `<dir>.old` resolve
    * INSIDE the index and fail the swap after all the rewrite work. */
  def normalize(indexDir: String): String = indexDir.replaceAll("/+$", "")

  /** Rewrite one table as one file per partition directory. The read
    * merges every footer: compaction is a rare offline pass, and
    * single-footer inference on a mixed pre-provenance index could
    * sample a legacy file, silently DROP the `_src` data column from
    * the resolved schema, and turn a transient read hazard into
    * permanent provenance loss (the hazard [[TextIndex.probe]] /
    * [[VectorIndex.probeDups]] defend against on the hot path).
    * `remap` lets a caller rewrite columns (e.g. [[ClusterIndex]]'s
    * generation fold) before the repartition. */
  def foldTable(s: SparkSession, fromDir: String, tmpDir: String,
                table: String, partCols: Seq[String],
                remap: Map[String, Column] = Map.empty): Unit = {
    val base = s.read.option("mergeSchema", "true")
      .parquet(s"$fromDir/$table")
    val remapped = remap.foldLeft(base) { case (df, (name, expr)) =>
      df.withColumn(name, expr)
    }
    remapped
      .repartition(partCols.map(col): _*) // one task per dir => one file per dir
      .write.mode("overwrite").partitionBy(partCols: _*)
      .parquet(s"$tmpDir/$table")
  }

  /** Copy a small unpartitioned table (meta, centroids) as one file. */
  def copyTable(s: SparkSession, fromDir: String, tmpDir: String,
                table: String): Unit =
    s.read.parquet(s"$fromDir/$table")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmpDir/$table")

  /** Copy the replay-protection state (applied/ batch markers, tagfp/
    * merge records) verbatim so a restarted stream still skips its
    * committed batches and reused tags are still refused. */
  def copyReplayState(conf: Configuration, fromDir: String, toDir: String): Unit = {
    val from0 = new Path(fromDir)
    val fs = from0.getFileSystem(conf)
    Seq("applied", "tagfp").foreach { d =>
      val from = new Path(s"$fromDir/$d")
      if (fs.exists(from))
        FileUtil.copy(fs, from, fs, new Path(s"$toDir/$d"), false, conf)
    }
  }

  /** The batch tags whose `applied/` marker exists — i.e. the streaming
    * loop's commit point was reached, so that batch can never replay its
    * body again (the marker check runs first). Only these generations
    * are safe to fold away; an appended-but-unmarkered batch is the
    * crash-window replay candidate and must keep its provenance. */
  def committedTags(conf: Configuration, indexDir: String): Set[String] = {
    val p = new Path(s"$indexDir/applied")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet
  }

  /** Prepare a clean `<dir>.compact`, returning its path. */
  def prepTmp(conf: Configuration, indexDir: String): String = {
    val tmp = new Path(s"$indexDir.compact")
    val fs = tmp.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    tmp.toString
  }

  /** The directory dance: `<dir>` → `<dir>.old`, `<dir>.compact` →
    * `<dir>`, delete `<dir>.old`. */
  def swapInPlace(conf: Configuration, indexDir: String): Unit = {
    val src = new Path(indexDir)
    val fs = src.getFileSystem(conf)
    val tmp = new Path(s"$indexDir.compact")
    val old = new Path(s"$indexDir.old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(src, old), s"compact: could not move $src aside")
    require(fs.rename(tmp, src), s"compact: could not move $tmp into place " +
      s"(index is at $old — restore it by renaming back)")
    fs.delete(old, true)
  }
}
