package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** A registered non-`file:` Hadoop FileSystem scheme backed by local
  * disk — the sandbox stand-in for an object store (VERDICT r9 item 3:
  * the north star is Structured Streaming over an S3 source, but every
  * test ran `file:`; a `mock://` round trip proves no `java.io.File` /
  * `file:`-scheme assumption leaks into the lake and index code paths).
  * Same trick Spark's own CheckpointSuite uses (a RawLocalFileSystem
  * subclass with a foreign URI).
  *
  * Every data `open()` is also COUNTED per path, which gives
  * IndexFreshnessSpec a synchronous, listener-free way to assert "this
  * ensure() read NO corpus bytes": any Spark job that scans a corpus
  * file must open it through this method, while pure FS-metadata calls
  * (`getFileStatus`, `listStatus`) never do.
  */
class CountingMockFs extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = CountingMockFs.uri
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    CountingMockFs.record(f)
    super.open(f, bufferSize)
  }
  // Metadata-call counting (r14): every remote LIST/HEAD-shaped API the
  // index read paths can issue. Counted at the public-API boundary —
  // RawLocalFileSystem's listStatus does not re-enter getFileStatus for
  // a missing dir, so a single-probe fast path records exactly one call.
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    CountingMockFs.recordMeta(f)
    super.listStatus(f)
  }
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    CountingMockFs.recordMeta(f)
    super.getFileStatus(f)
  }
}

object CountingMockFs {
  val uri: URI = URI.create("mock:///")
  private val opened = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Register the scheme on a session's Hadoop conf (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[CountingMockFs].getName)

  private[graft] def record(p: Path): Unit = opened.add(p.toUri.getPath)
  private val meta = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private[graft] def recordMeta(p: Path): Unit = meta.add(p.toUri.getPath)
  def reset(): Unit = { opened.clear(); meta.clear() }

  /** Metadata calls (listStatus/getFileStatus, incl. exists) under this
    * local-path prefix since the last [[reset]]. */
  def metaCallsUnder(prefix: String): Int = {
    val it = meta.iterator()
    var n = 0
    while (it.hasNext) if (it.next().startsWith(prefix)) n += 1
    n
  }

  /** How many file opens landed under this local-path prefix since the
    * last [[reset]] (local[*] runs tasks in this JVM, so task-side opens
    * are visible). */
  def opensUnder(prefix: String): Int = openedUnder(prefix).size

  /** The opened paths themselves — for failure messages that should name
    * the stray reads, not just count them. */
  def openedUnder(prefix: String): Seq[String] = {
    val it = opened.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) { val p = it.next(); if (p.startsWith(prefix)) b += p }
    b.result()
  }
}

/** A registered `naren://` scheme where EVERY rename is a NON-ATOMIC
  * recursive copy-then-delete — the object-store rename semantics (S3A
  * directory "rename" is an O(data) copy+delete with no atomicity).
  * Every rename call is also recorded, so a spec can assert that an
  * index lifecycle never renames the live tree itself: under the
  * generation-pointer cutover the only renames left are Spark's own
  * commit-protocol moves inside a staged, not-yet-live directory. */
class NonAtomicRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "naren"
  override def getUri: URI = NonAtomicRenameFs.uri
  override def rename(src: Path, dst: Path): Boolean = {
    NonAtomicRenameFs.record(src, dst)
    if (!exists(src)) false
    else org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, true, getConf)
  }
}

object NonAtomicRenameFs {
  val uri: URI = URI.create("naren:///")
  private val renamed =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.naren.impl", classOf[NonAtomicRenameFs].getName)

  private[graft] def record(src: Path, dst: Path): Unit =
    renamed.add((src.toUri.getPath, dst.toUri.getPath))
  def reset(): Unit = renamed.clear()

  /** All (src, dst) rename pairs since the last [[reset]], as
    * scheme-stripped paths. */
  def renames: Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    renamed.forEach(p => out += p)
    out.result()
  }
}
