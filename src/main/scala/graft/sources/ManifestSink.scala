package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** The WRITE half of the custom-connector surface ([[GraftSynthSource]]
  * is the read half): a DSv2 batch sink with MANIFEST-COMMIT exactly-once
  * semantics — the protocol every production lake sink (Delta/Iceberg
  * commit logs, FileOutputCommitter v2's successor designs) is built on,
  * demonstrated on plain TSV part files:
  *
  *   1. each task writes `_temp/part-<partition>-<task>.tsv` and returns
  *      (path, rows, bytes) as its [[WriterCommitMessage]] — NOTHING a
  *      failed/speculative task wrote is ever visible;
  *   2. the driver's `commit()` publishes atomically: temp files rename
  *      into the target dir, then ONE `_MANIFEST` file lists every
  *      committed part with its row count — readers trust the manifest,
  *      not directory listing, so concurrent/zombie writers can't leak
  *      rows;
  *   3. `abort()` deletes the temp files of every completed task.
  *
  * At 100 TB the pattern is what makes retries free: a task re-attempt
  * re-writes its part under a new task id, the committer picks exactly
  * one message per partition, and rename-or-manifest is the only
  * serialization point (one driver round, no per-row coordination).
  * Scale caveat documented: HDFS rename is O(1), object-store rename is
  * a copy — production sinks write directly to final names and let the
  * MANIFEST be the commit, which this class also does in spirit (the
  * manifest is what readers consume; the rename keeps the demo's target
  * dir human-readable).
  *
  * Append mode only — the sink demonstrates the commit protocol, not a
  * table lifecycle. TSV cells escape tab/newline/backslash, so any
  * fixture row round-trips; RunnerSpec drives documents through it and
  * replays the manifest against the source counts.
  */
class GraftManifestSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the written frame

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft manifest sink requires .option(\"path\")")
    new ManifestTable(path, schema)
  }
}

private[graft] class ManifestTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_manifest($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        private def hconf = new SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration)
        override def toBatch: BatchWrite =
          new ManifestBatchWrite(path, info.schema(), hconf)
        override def toStreaming: streaming.StreamingWrite =
          new ManifestStreamingWrite(path, info.schema(), hconf)
      }
    }
}

/** Streaming flavor: one `_MANIFEST-<epoch>` per micro-batch, and
  * commit is IDEMPOTENT on epoch — if the manifest for an epoch already
  * exists (the driver died after commit, the batch re-delivers), the
  * re-commit discards its freshly written temps instead of publishing a
  * second copy. That epoch check is the entire exactly-once story of a
  * streaming sink: the source replays, the sink deduplicates on the
  * epoch id it is handed. */
private[graft] class ManifestStreamingWrite(path: String,
    schema: StructType, conf: SerializableConfiguration)
    extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : streaming.StreamingDataWriterFactory = {
    // locals only: the anonymous factory must not capture `this` (the
    // StreamingWrite stays driver-side and is not Serializable)
    val inner = new ManifestWriterFactory(path, schema, conf)
    new streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        inner.createWriter(partitionId, taskId, epochId)
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    val manifestPath = new Path(dir, s"_MANIFEST-$epochId")
    val parts = messages.map(_.asInstanceOf[PartCommit])
    if (fs.exists(manifestPath)) { // replayed epoch: drop, don't double
      parts.foreach(p => fs.delete(new Path(p.file), false))
      return
    }
    fs.mkdirs(dir)
    parts.foreach { p =>
      val tmp = new Path(p.file)
      fs.rename(tmp, new Path(dir, tmp.getName))
    }
    val manifest = parts.sortBy(_.file).map(p =>
      s"${new Path(p.file).getName}\t${p.rows}\t${p.bytes}")
      .mkString("", "\n", "\n")
    val out = fs.create(manifestPath, false)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    // zombie-attempt hygiene: task attempts whose commit message never
    // arrived (speculation, task retry after a kill) leave orphan temps
    // that no later epoch touches — sweep THIS epoch's prefix now that
    // its manifest is durable (batch commit deletes the whole _temp dir;
    // a streaming epoch may share _temp with in-flight later epochs, so
    // only its own prefix is safe to reap)
    val tempDir = new Path(dir, "_temp")
    if (fs.exists(tempDir)) {
      val orphans = fs.listStatus(tempDir)
        .filter(_.getPath.getName.startsWith(s"part-$epochId-"))
      orphans.foreach(st => fs.delete(st.getPath, false))
      if (fs.listStatus(tempDir).isEmpty) fs.delete(tempDir, true)
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case p: PartCommit =>
      fs.delete(new Path(p.file), false)
    }
  }
}

/** One committed part: where it landed and what it holds. */
private[graft] case class PartCommit(file: String, rows: Long, bytes: Long)
    extends WriterCommitMessage

private[graft] class ManifestBatchWrite(path: String, schema: StructType,
    conf: SerializableConfiguration) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new ManifestWriterFactory(path, schema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    val parts = messages.map(_.asInstanceOf[PartCommit])
    parts.foreach { p =>
      val tmp = new Path(p.file)
      fs.rename(tmp, new Path(dir, tmp.getName))
    }
    // the manifest IS the commit: readers consume this list, so a
    // half-renamed state is invisible until the single file lands
    val manifest = parts.sortBy(_.file).map(p =>
      s"${new Path(p.file).getName}\t${p.rows}\t${p.bytes}")
      .mkString("", "\n", "\n")
    val out = fs.create(new Path(dir, "_MANIFEST"), true)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    fs.delete(new Path(dir, "_temp"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case p: PartCommit =>
      fs.delete(new Path(p.file), false)
    }
  }
}

private[graft] class ManifestWriterFactory(path: String,
    schema: StructType, conf: SerializableConfiguration)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = mkWriter(s"part-$partitionId-$taskId.tsv")

  /** Streaming variant: the epoch id lands in the part name, so replays
    * of the same epoch never collide with the committed files. */
  def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    mkWriter(s"part-$epochId-$partitionId-$taskId.tsv")

  private def mkWriter(name: String)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val file = new Path(s"$path/_temp/$name")
    private val fs = file.getFileSystem(conf.value)
    private val out = fs.create(file, true)
    private var rows = 0L
    private var bytes = 0L
    private val fields = schema.fields

    private def cell(row: InternalRow, i: Int): String = {
      val raw =
        if (row.isNullAt(i)) "\\N"
        else row.get(i, fields(i).dataType).toString
      raw.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
    }

    override def write(row: InternalRow): Unit = {
      val line = fields.indices.map(cell(row, _))
        .mkString("", "\t", "\n").getBytes("UTF-8")
      out.write(line)
      rows += 1L
      bytes += line.length
    }

    override def commit(): WriterCommitMessage = {
      out.close()
      PartCommit(file.toString, rows, bytes)
    }

    override def abort(): Unit = {
      out.close()
      fs.delete(file, false)
    }

    override def close(): Unit = ()
  }
}
