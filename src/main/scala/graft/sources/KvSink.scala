package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSourceV2 BATCH WRITE connector — the other half of the
  * [[SeqSource]] handshake: a (key BIGINT, val STRING) line sink with
  * the full V2 commit protocol. Each task writes an uncommitted
  * `part-<partition>-<task>` file and reports a [[KvCommit]] message;
  * only the DRIVER's `commit()` publishes the `_SUCCESS` manifest
  * listing every committed file with its row count, and `abort()`
  * deletes the orphans — exactly the two-phase rhythm a real
  * object-store committer follows (task files are invisible until the
  * single driver-side atomic publish). `mode("overwrite")` maps to the
  * TRUNCATE capability and clears the target before the new write.
  *
  * The local-filesystem paths stand in for distributed storage: at
  * scale the same five interfaces write s3a/HDFS task-attempt paths and
  * the manifest becomes the snapshot commit (the Iceberg/Delta shape).
  */
class KvSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType().add("key", LongType).add("val", StringType)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

class KvTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_kv($path)"
  override def schema(): StructType =
    new StructType().add("key", LongType).add("val", StringType)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(path, info.schema())
}

class KvWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new KvBatchWrite(path, schema, truncateFirst)
  }
}

case class KvCommit(file: String, rows: Long) extends WriterCommitMessage

class KvBatchWrite(path: String, schema: StructType, truncateFirst: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncateFirst) {
      Files.list(dir).forEach(p => Files.deleteIfExists(p))
    }
    new KvWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val manifest = messages.collect { case KvCommit(f, n) => s"$f,$n" }
      .sorted.mkString("", "\n", "\n")
    Files.write(Paths.get(path, "_SUCCESS"),
      manifest.getBytes(StandardCharsets.UTF_8))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case KvCommit(f, _) =>
      Files.deleteIfExists(Paths.get(path, f))
    }
}

class KvWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val fileName = s"part-$partitionId-$taskId"
      private val target: Path = Paths.get(path, fileName)
      private val out = Files.newBufferedWriter(target, StandardCharsets.UTF_8)
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        out.write(s"${record.getLong(0)},${record.getUTF8String(1)}\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        KvCommit(fileName, rows)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(target)
      }
      override def close(): Unit = ()
    }
}
