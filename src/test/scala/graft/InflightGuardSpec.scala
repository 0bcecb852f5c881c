package graft

import java.io.IOException
import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import graft.operators.{Fingerprint, IndexMaintenance, TextIndex}

/** A scheme whose getFileStatus ALWAYS throws a generic IOException —
  * the object-store-throttle stand-in for the in-flight heartbeat
  * probe's degrade rule (ADVICE r17: a read-only status probe must
  * never turn into an operation failure). */
class ThrottledStatusFs extends RawLocalFileSystem {
  override def getScheme: String = "throttle"
  override def getUri: URI = URI.create("throttle:///")
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    throw new IOException("simulated object-store throttle (503)")
}

/** The r18 in-flight guard semantics (ADVICE r17 medium + lows).
  *
  * The r17 protocol classified heartbeat-fresh pending removal state as
  * IN-FLIGHT and WAITED a grace for it to clear — but every
  * remove-family guard call site runs INSIDE its verb's exclusive
  * lease, and a staged physical half must RE-ACQUIRE write/remove
  * leases for its later windows: the in-lease waiter could starve a
  * healthy removal into a LeaseConflict death and then read its corpse
  * as CRASHED. Since r18 the wait lives PRE-lease
  * ([[Fingerprint.awaitInflightQuiesce]]) and the in-lease guard throws
  * the retryable conflict immediately (`callerHoldsLease = true`). */
class InflightGuardSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def freshIndex(prefix: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(prefix).toString + "/idx"
    val docs = (0 until 4)
      .map(i => (i.toLong, s"$prefix fixture doc $i")).toDF("doc_id", "text")
    TextIndex.build(docs, "doc_id", "text", dir)
    IndexMaintenance.normalize(dir)
  }

  test("a lease-holding caller gets the retryable conflict IMMEDIATELY, not a grace-wait that starves the in-flight half") {
    val dir = freshIndex("ifg_hold")
    Fingerprint.ensureRemoveState(conf, dir, "rm.live", (1L, 2L),
      replay = false, oldFp = None, "spec")
    Fingerprint.withInflightBeat(conf, dir, "rm.live") {
      val t0 = System.nanoTime()
      val e = intercept[IndexMaintenance.LeaseConflictException] {
        Fingerprint.requireNoOtherPendingRemoval(conf, dir, "rm.other",
          "spec-op", callerHoldsLease = true)
      }
      val waitedMs = (System.nanoTime() - t0) / 1e6
      // the r17 bug was a 10s in-lease wait that could NEVER succeed
      // for the staged path; under a held lease there must be no wait
      assert(waitedMs < 3000, s"in-lease guard must not grace-wait: ${waitedMs}ms")
      assert(e.getMessage.contains("IN-FLIGHT") &&
        e.getMessage.contains("rm.live"), e.getMessage)
      assert(e.getMessage.contains("holds a lease"), e.getMessage)
    }
    Fingerprint.clearRemoveState(conf, dir, "rm.live")
  }

  test("mixed fresh+stale pending: refusal names ONLY the stale tags as replay candidates") {
    val dir = freshIndex("ifg_mixed")
    Fingerprint.ensureRemoveState(conf, dir, "rm.stalecrash", (1L, 2L),
      replay = false, oldFp = None, "spec")
    Fingerprint.ensureRemoveState(conf, dir, "rm.live", (3L, 4L),
      replay = false, oldFp = None, "spec")
    Fingerprint.withInflightBeat(conf, dir, "rm.live") {
      val e = intercept[Fingerprint.RemovalRefused] {
        Fingerprint.requireNoOtherPendingRemoval(conf, dir, "rm.other",
          "spec-op", callerHoldsLease = true)
      }
      val msg = e.getMessage
      // the replay instruction must point at the crashed tag...
      assert(msg.contains("crashed removal/append commit(s) rm.stalecrash"),
        msg)
      // ...and must NOT tell the operator to replay the healthy half
      // that is running right now (r17 low: the old message listed ALL
      // pending tags in the re-run instruction)
      assert(msg.contains("rm.live") && msg.contains("do NOT replay"), msg)
      assert(!msg.substring(0, msg.indexOf("never completed"))
        .contains("rm.live"),
        s"fresh tag leaked into the replay list: $msg")
    }
    Fingerprint.clearRemoveState(conf, dir, "rm.stalecrash")
    Fingerprint.clearRemoveState(conf, dir, "rm.live")
  }

  test("awaitInflightQuiesce returns as soon as the in-flight half clears (pre-lease, never throws)") {
    val dir = freshIndex("ifg_wait")
    Fingerprint.ensureRemoveState(conf, dir, "rm.live", (1L, 2L),
      replay = false, oldFp = None, "spec")
    // a half that finishes ~600ms in: beat + state both clear
    val worker = new Thread(() =>
      Fingerprint.withInflightBeat(conf, dir, "rm.live") {
        Thread.sleep(600L)
        Fingerprint.clearRemoveState(conf, dir, "rm.live")
      })
    worker.start()
    Thread.sleep(100L) // let the beat's marker land
    val t0 = System.nanoTime()
    Fingerprint.awaitInflightQuiesce(conf, dir, "rm.other")
    val waitedMs = (System.nanoTime() - t0) / 1e6
    worker.join()
    assert(waitedMs < 8000,
      s"quiesce must return once the half clears, not burn the full grace: ${waitedMs}ms")
    // and with nothing pending the guard passes clean afterwards
    Fingerprint.requireNoOtherPendingRemoval(conf, dir, "rm.other",
      "spec-op", callerHoldsLease = true)
  }

  test("inflightFresh degrades to 'not provably in-flight' on a generic FS error, instead of failing the probe") {
    conf.set("fs.throttle.impl", classOf[ThrottledStatusFs].getName)
    // any path on the throttled scheme: the status call throws IOException
    val verdict = Fingerprint.inflightFresh(conf, "throttle:///idx", "rm.x")
    assert(!verdict, "a throttled probe must read as not-in-flight " +
      "(conservative: routes to the refusal branch, never mutates)")
  }
}
