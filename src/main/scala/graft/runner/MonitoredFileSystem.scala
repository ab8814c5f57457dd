package graft.runner

import java.io.InputStream
import java.net.URI
import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}

/** JVM-wide read-I/O counters for [[MonitoredFileSystem]] — the Spark
  * rendition of the reference's mutex-merged per-handle `ReadStats`
  * (/root/reference/main.cc:85-99, 273-281): one op per `Read()` call,
  * plus the bytes it returned.
  *
  * Statics work because the harness targets the reference's deployment
  * shape — one process (`local[*]`, the pthread pool analogue). On a
  * multi-executor cluster these adders count per-executor; aggregate them
  * with an accumulator or merge executor logs instead.
  */
object MonitoredFs {
  val readOps = new LongAdder
  val readBytes = new LongAdder

  /** (ops, bytes) snapshot for delta accounting around a run. */
  def snapshot(): (Long, Long) = (readOps.sum(), readBytes.sum())

  /** Hadoop scheme this FS registers under (`monitored:/path/to/file`). */
  val Scheme = "monitored"

  /** Config key Hadoop uses to resolve the scheme to an implementation. */
  val ImplKey = s"fs.$Scheme.impl"
}

/** A local filesystem whose input streams count every read call — the
  * reference's `MonitoredFileSystem` wrapper (main.cc:100-115) rebuilt as
  * a Hadoop `FileSystem`. Register with
  * `conf.set(MonitoredFs.ImplKey, classOf[MonitoredFileSystem].getName)`
  * and address files as `monitored:/abs/path`; every layer above (parquet
  * footer reads, column chunk fetches, the ORC/CSV readers, …) is then
  * metered without knowing it.
  */
final class MonitoredFileSystem extends RawLocalFileSystem {
  override def getScheme: String = MonitoredFs.Scheme
  override def getUri: URI = URI.create(s"${MonitoredFs.Scheme}:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(new MonitoredStream(super.open(f, bufferSize)))
}

/** Counts ops+bytes on every read variant, delegating to the wrapped
  * stream; implements Seekable + PositionedReadable so parquet's
  * footer/column-chunk positioned reads go through the meter too. */
private final class MonitoredStream(in: FSDataInputStream)
    extends InputStream with Seekable with PositionedReadable {

  private def counted(n: Int): Int = {
    MonitoredFs.readOps.increment()
    if (n > 0) MonitoredFs.readBytes.add(n.toLong)
    n
  }

  override def read(): Int = {
    MonitoredFs.readOps.increment()
    val r = in.read()
    if (r >= 0) MonitoredFs.readBytes.add(1L)
    r
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    counted(in.read(b, off, len))
  override def read(pos: Long, buf: Array[Byte], off: Int, len: Int): Int =
    counted(in.read(pos, buf, off, len))
  override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
    in.readFully(pos, buf, off, len)
    MonitoredFs.readOps.increment()
    MonitoredFs.readBytes.add(len.toLong)
  }
  override def readFully(pos: Long, buf: Array[Byte]): Unit =
    readFully(pos, buf, 0, buf.length)

  override def seek(pos: Long): Unit = in.seek(pos)
  override def getPos: Long = in.getPos
  override def seekToNewSource(targetPos: Long): Boolean =
    in.seekToNewSource(targetPos)
  override def skip(n: Long): Long = in.skip(n)
  override def available(): Int = in.available()
  override def close(): Unit = in.close()
}
