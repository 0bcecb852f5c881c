package graft.streaming

import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets
import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming source for a UNIX domain socket — the reference's
  * R1 transport made literal for BOTH of its modes: client dial
  * (`input/unix.go:19-34`, `ConnectUnixSocket`) connects to an existing
  * socket path; server listen (`input/unix.go:48-82`,
  * `ListenUnixSocket`) binds the path and accepts clients one after
  * another in a loop, draining each connection to EOF before accepting
  * the next — exactly the reference's single-threaded accept loop.
  * Records frame by newline either way, one `value: string` row each.
  * JDK 17's `UnixDomainSocketAddress` carries the transport; the source
  * is a standard DSv2 micro-batch stream.
  *
  * Same contract as Spark's own TCP `socket` source (and the same shape:
  * a driver-side reader thread buffers records; each micro-batch is an
  * offset range into that buffer): NO replay — a socket cannot re-serve
  * bytes after a restart, so this is the dev/mock path, not the
  * exactly-once one (that is the file-stream source, S4Stream R1).
  * Committed batches are trimmed from the buffer, so driver memory holds
  * only not-yet-committed records.
  *
  * Usage: `spark.readStream.format("unix-socket").option("path", p)
  * [.option("mode", "dial" | "listen")].load()`
  */
class UnixSocketSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "unix-socket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UnixSocketSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UnixSocketTable(properties.get("path"),
      Option(properties.get("mode")).getOrElse("dial"))
}

object UnixSocketSourceProvider {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private class UnixSocketTable(path: String, mode: String)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty,
    "unix-socket source requires .option(\"path\", <socket file>)")
  require(mode == "dial" || mode == "listen",
    s"unix-socket mode must be dial or listen, got $mode")
  override def name(): String = s"unix-socket:$mode:$path"
  override def schema(): StructType = UnixSocketSourceProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UnixSocketSourceProvider.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UnixSocketMicroBatchStream(path, mode)
      }
    }
}

/** Monotone record-count offset (self-contained — no dependence on Spark's
  * internal LongOffset, which is private to its streaming runtime). */
private case class RecordCountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class UnixSocketMicroBatchStream(path: String, mode: String)
    extends MicroBatchStream {
  // records not yet trimmed by commit; buffer(i) is record (base + i)
  private val buffer = new ArrayBuffer[String]
  private var base = 0L
  private val lock = new Object
  @volatile private var channel: SocketChannel = _
  @volatile private var server: java.nio.channels.ServerSocketChannel = _
  @volatile private var stopped = false
  // An unexpected transport failure (server-socket accept error, or a
  // dial-mode read error) recorded by the reader thread; surfaced on the
  // next trigger so the query FAILS instead of silently never ingesting
  // again (the silent-death mode the r6 advice flagged).
  @volatile private var readerFailure: Throwable = _

  // Drain one connection to EOF: blocking reads, decoded as UTF-8,
  // framed on '\n' (CR kept — the reference frames on bare newlines too).
  private def drain(ch: SocketChannel): Unit = {
    val buf = ByteBuffer.allocate(64 * 1024)
    val pending = new StringBuilder
    while (!stopped && ch.read(buf) >= 0) {
      buf.flip()
      pending.append(StandardCharsets.UTF_8.decode(buf))
      buf.clear()
      var idx = pending.indexOf("\n")
      while (idx >= 0) {
        val line = pending.substring(0, idx)
        pending.delete(0, idx + 1)
        lock.synchronized { buffer += line }
        idx = pending.indexOf("\n")
      }
    }
  }

  // Connect/bind eagerly (the reference client connects at startup and
  // fails fast if the daemon is absent; the reference server binds and
  // accepts clients one at a time in a loop, input/unix.go:61-78) and
  // read on a daemon thread.
  private lazy val reader: Thread = {
    val body: Runnable =
      if (mode == "listen") {
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
        val srv = java.nio.channels.ServerSocketChannel
          .open(StandardProtocolFamily.UNIX)
        srv.bind(UnixDomainSocketAddress.of(path))
        server = srv
        () => {
          try {
            while (!stopped) {
              val conn = srv.accept() // reference: one client at a time
              channel = conn
              // A per-CONNECTION error (e.g. reset mid-drain) must not
              // kill the accept loop — the reference's ListenUnixSocket
              // keeps accepting after a client error. Only stop() or a
              // server-socket failure ends the loop.
              try drain(conn)
              catch { case _: Throwable if !stopped => () }
              finally conn.close()
            }
          } catch {
            case _: Throwable if stopped => // closed by stop(); normal
            case t: Throwable => readerFailure = t // accept() died unexpectedly
          }
        }
      } else {
        val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
        ch.connect(UnixDomainSocketAddress.of(path))
        channel = ch
        () => {
          try drain(ch)
          catch {
            case _: Throwable if stopped => ()
            case t: Throwable => readerFailure = t // dial-mode read died
          }
        }
      }
    val t = new Thread(body, s"unix-socket-reader-$mode-$path")
    t.setDaemon(true)
    t.start()
    t
  }

  override def initialOffset(): Offset = { reader; RecordCountOffset(0L) }

  override def latestOffset(): Offset = {
    reader
    if (readerFailure != null)
      throw new IllegalStateException(
        s"unix-socket reader ($mode $path) failed", readerFailure)
    lock.synchronized(RecordCountOffset(base + buffer.length))
  }

  override def deserializeOffset(json: String): Offset =
    RecordCountOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RecordCountOffset].n
    val e = end.asInstanceOf[RecordCountOffset].n
    val rows = lock.synchronized {
      buffer.slice((s - base).toInt, (e - base).toInt).toArray
    }
    if (rows.isEmpty) Array.empty
    else Array(UnixSocketInputPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    UnixSocketReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[RecordCountOffset].n
    lock.synchronized {
      val drop = (e - base).toInt
      if (drop > 0) { buffer.remove(0, math.min(drop, buffer.length)); base = e }
    }
  }

  override def stop(): Unit = {
    stopped = true
    if (channel != null) channel.close()
    if (server != null) {
      server.close()
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    }
  }
}

private case class UnixSocketInputPartition(rows: Array[String]) extends InputPartition

private object UnixSocketReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[UnixSocketInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(rows(i)))
      override def close(): Unit = ()
    }
  }
}
