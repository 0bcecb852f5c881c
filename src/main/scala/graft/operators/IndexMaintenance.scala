package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

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
