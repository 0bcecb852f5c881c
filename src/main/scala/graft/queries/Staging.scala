package graft.queries

import org.apache.spark.sql.DataFrame

/** Stage-once fixture staging shared by the scan round-trips
  * ([[Scans]]) and the composed takedown flow
  * ([[TextPipeline.clusterIndexRemove]]) — VERDICT r10 item 7 / r11
  * item 2: write a derived staging copy only when it is absent or the
  * SOURCE fixture's file status (path|len|mtime + plan hash —
  * [[graft.operators.Fingerprint.sourceStatus]]) no longer matches the
  * recorded marker. A cold run and every fresh-tmp Verify still exercise
  * the full write path; a warmed Bench run measures the steady-state
  * cost. Regenerated fixtures re-stage via the status mismatch, the same
  * rule the index ensure() family uses.
  *
  * The marker is written LAST, so a crash mid-write re-stages; callers'
  * `write` bodies must therefore be overwrite-idempotent (they all are —
  * `mode("overwrite")`).
  */
private[graft] object Staging {

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path.__staged")

  /** Record (or clear, for a non-file source) the staging marker.
    * Shared by [[stageOnce]] and forced re-stage paths so the marker
    * format can never desynchronize between them. */
  def recordMarker(fs: org.apache.hadoop.fs.FileSystem, path: String,
                   status: Option[String]): Unit = status match {
    case Some(st) =>
      val out = fs.create(markerPath(path), true)
      try out.write(st.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    case None =>
      if (fs.exists(markerPath(path))) fs.delete(markerPath(path), false)
  }

  /** Run `write` (which must produce `path` from `src`) unless the
    * recorded marker matches `src`'s current source status. */
  def stageOnce(src: DataFrame, path: String)(write: => Unit): Unit = {
    val conf = src.sparkSession.sparkContext.hadoopConfiguration
    val marker = markerPath(path)
    val fs = marker.getFileSystem(conf)
    val status = graft.operators.Fingerprint.sourceStatus(src)
    val fresh = status.nonEmpty && fs.exists(marker) && {
      val in = fs.open(marker)
      val recorded = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      status.contains(recorded)
    }
    if (!fresh) {
      if (fs.exists(marker)) fs.delete(marker, false)
      write
      // marker LAST: crash mid-write re-stages
      recordMarker(fs, path, status)
    }
  }
}
