package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  * the full V2 commit protocol, staged for ATOMIC publish:
  *
  *  - every task writes into a write-scoped `.staging-<writeId>/`
  *    directory and reports a [[KvCommit]] message — nothing under the
  *    table root changes while tasks run;
  *  - the DRIVER's `commit()` moves the staged files into the root,
  *    then atomically REPLACES the `_SUCCESS` manifest (temp file +
  *    ATOMIC_MOVE) — the single commit point. An overwrite
  *    (`mode("overwrite")` → TRUNCATE capability) deletes the
  *    previously-manifested files only AFTER the new manifest is live,
  *    so a crash at ANY step leaves readers on a complete committed
  *    snapshot (either the old manifest + old files, or the new one) —
  *    the Iceberg/Delta snapshot-swap rhythm on a filesystem;
  *  - `abort()` deletes the staging directory; orphaned task files are
  *    invisible because readers go through [[KvSink.committedFiles]],
  *    never through directory listing.
  *
  * The local-filesystem paths stand in for distributed storage: at
  * scale the same five interfaces write s3a/HDFS task-attempt paths and
  * the manifest becomes the snapshot commit.
  */
class KvSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType().add("key", LongType).add("val", StringType)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

object KvSink {
  /** The manifest-gated read path: the files published by the last
    * committed write, with their committed row counts. Uncommitted task
    * files, in-flight staging directories and post-crash orphans are
    * invisible — readers see exactly one committed snapshot.
    */
  def committedFiles(path: String): Seq[(String, Long)] = {
    val manifest = Paths.get(path, "_SUCCESS")
    if (!Files.exists(manifest)) Seq.empty
    else new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf(',')
        (line.substring(0, i), line.substring(i + 1).toLong)
      }
  }

  /** Absolute paths of the committed snapshot — what a reader scans. */
  def committedPaths(path: String): Seq[String] =
    committedFiles(path).map { case (f, _) => Paths.get(path, f).toString }

  private[sources] def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}

class KvTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_kv($path)"
  override def schema(): StructType =
    new StructType().add("key", LongType).add("val", StringType)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(path, info.queryId())
}

class KvWriteBuilder(path: String, writeId: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new KvBatchWrite(path, writeId, truncateFirst)
  }
}

case class KvCommit(file: String, rows: Long) extends WriterCommitMessage

class KvBatchWrite(path: String, writeId: String, truncateFirst: Boolean)
    extends BatchWrite {
  private val dir = Paths.get(path)
  private val staging = dir.resolve(s".staging-$writeId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    new KvWriterFactory(staging.toString, writeId)
  }

  /** The commit point. Ordering is the whole story:
    *  1. staged files move into the root (still invisible — not in the
    *     manifest);
    *  2. the manifest is REPLACED atomically — readers flip from the old
    *     snapshot to the new one in one rename;
    *  3. only then does an overwrite delete the old snapshot's files.
    * A crash before 2 leaves the old snapshot fully intact; a crash
    * after 2 leaves at worst invisible orphans — never a reader-visible
    * partial state.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.toSeq.collect { case KvCommit(f, n) => (f, n) }.sortBy(_._1)
    val prev = KvSink.committedFiles(path)
    fresh.foreach { case (f, _) =>
      Files.move(staging.resolve(f), dir.resolve(f))
    }
    val published = if (truncateFirst) fresh else prev ++ fresh
    val manifest = published.map { case (f, n) => s"$f,$n" }
      .mkString("", "\n", "\n")
    val tmp = staging.resolve("_SUCCESS.tmp")
    Files.write(tmp, manifest.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("_SUCCESS"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    if (truncateFirst) {
      val keep = fresh.map(_._1).toSet
      prev.collect { case (f, _) if !keep(f) =>
        Files.deleteIfExists(dir.resolve(f))
      }
    }
    KvSink.deleteTree(staging)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KvSink.deleteTree(staging)
}

class KvWriterFactory(stagingDir: String, writeId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // writeId in the name keeps part files collision-free across
      // writes, so an append never overwrites a committed file
      private val fileName = s"part-$writeId-$partitionId-$taskId"
      private val target: Path = Paths.get(stagingDir, fileName)
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
