package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDelta, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog-resolved DataSourceV2 tables with ROW-LEVEL OPERATION support —
  * the leg that makes the SQL a warehouse user actually types work
  * end-to-end:
  *
  * {{{
  *   CREATE TABLE graft_cat.ns.dim (...);
  *   INSERT INTO graft_cat.ns.dim SELECT ...;
  *   MERGE INTO graft_cat.ns.dim t USING updates s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET ...
  *     WHEN NOT MATCHED THEN INSERT ...;
  * }}}
  *
  * MERGE resolves through [[SupportsRowLevelOperations]] in GROUP-BASED
  * (copy-on-write) mode: Catalyst's RewriteMergeIntoTable plans a
  * ReplaceData — it scans the affected groups through the operation's
  * own ScanBuilder, computes carried-over + merged rows, and hands the
  * replacement set to the operation's WriteBuilder, whose commit swaps
  * it in atomically. This table declares ONE group (the whole table):
  * every MERGE rewrites the full row set, which is exactly the
  * semantics — and the honest cost model — of copy-on-write on an
  * unpartitioned table. A production table partitions groups by file
  * (Iceberg's shape): same interfaces, `requiredMetadataAttributes`
  * exposing a file id, scan pruned to matched files. The protocol
  * exercised here is identical.
  *
  * Storage is an in-JVM snapshot map — this class demonstrates the
  * CATALOG + MERGE protocol; the staged-file commit story lives in
  * [[KvSink]] and rows-from-ranges scanning in [[SeqSource]]. Writes
  * ship task rows inside commit messages (bounded demo tables); the
  * driver-side commit publishes a NEW immutable snapshot — readers that
  * planned against the old snapshot keep it (the scan captures the row
  * seq at build time), so reads are repeatable, exactly the
  * snapshot-isolation contract the file manifest gives KvSink.
  */
class MemCatalog extends TableCatalog {
  private var catalogName: String = "graft_cat"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MemCatalog.store.keySet().asScala
      .filter(_.namespace().sameElements(namespace)).toArray
  override def loadTable(ident: Identifier): Table = {
    val t = MemCatalog.store.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // merge-on-read opt-in: the `mor` namespace (CREATE TABLE
    // graft_cat.mor.t ...) or TBLPROPERTIES ('write.mode'='merge-on-read')
    val mor = ident.namespace().headOption.contains("mor") ||
      properties.asScala.get("write.mode").contains("merge-on-read")
    val t = new MemTable(ident, schema, mor)
    if (MemCatalog.store.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")
  override def dropTable(ident: Identifier): Boolean =
    MemCatalog.store.remove(ident) != null
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE not supported")
}

object MemCatalog {
  private[graft] val store = new ConcurrentHashMap[Identifier, MemTable]()
}

class MemTable(ident: Identifier, tableSchema: StructType,
    private[graft] val mor: Boolean = false) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns {
  /** Current committed BASE snapshot — replaced wholesale on every
    * copy-on-write commit, never mutated, so scans planned earlier stay
    * consistent.
    */
  @volatile private[graft] var rows: Seq[InternalRow] = Seq.empty

  /** Merge-on-read DELTA LOG: row-level commits on a `mor` table append
    * actions here and leave the base snapshot untouched — the write-side
    * saving that defines MOR. Readers pay instead: [[current]]
    * reconciles base + log at scan-build time (Iceberg's read-side
    * merge; a file-backed table would do this per matching data file
    * with position/equality delete files).
    */
  @volatile private[graft] var deltaLog: Vector[MemDeltaAction] = Vector.empty

  /** The reconciled row set a new scan serves: base rows with the delta
    * log replayed in commit order, keyed by the rowId column. Update
    * keeps the row's base position, insert appends, delete removes —
    * the same total content a COW rewrite would have produced (and the
    * spec proves row-identity between the two paths).
    */
  private[graft] def current: Seq[InternalRow] = {
    val log = deltaLog
    if (log.isEmpty) rows
    else {
      val keyType = tableSchema.fields(0).dataType
      val m = new scala.collection.mutable.LinkedHashMap[Any, InternalRow]
      rows.foreach { r => m.put(if (r.isNullAt(0)) null else r.get(0, keyType), r) }
      log.foreach { a =>
        a.op match {
          case MemDeltaAction.Delete => m.remove(a.key)
          case MemDeltaAction.Update => m.put(a.key, a.row)
          case MemDeltaAction.Insert => m.put(a.key, a.row)
        }
      }
      m.values.toSeq
    }
  }

  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** The copy-on-write GROUP id, exposed as a metadata column. One group
    * (the whole table) here; a partitioned table would surface its file /
    * partition id — this is the handle Spark's row-level machinery uses
    * to route carried-over rows back to their group (and declaring it is
    * what selects the projecting DataAndMetadata write path).
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(MemTable.GroupColumn)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(current, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(this)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () =>
      if (mor) new MemDeltaOperation(this, info.command())
      else new MemRowLevelOperation(this, info.command())
}

object MemTable {
  val GroupColName = "_group"
  object GroupColumn extends MetadataColumn {
    override def name(): String = GroupColName
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String = "copy-on-write group id (single group)"
  }
}

/** Whole-table-as-one-group copy-on-write operation: the scan feeds
  * Catalyst every current row; the write's commit REPLACES the snapshot
  * with the rewritten set (carried-over + merged), whatever the command.
  */
class MemRowLevelOperation(table: MemTable, cmd: Command)
    extends RowLevelOperation {
  override def command(): Command = cmd
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(MemTable.GroupColName))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(table.current, table.schema())
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(table, replace = true, info.schema())
      }
    }
}

class MemScanBuilder(snapshot: Seq[InternalRow], tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(MemPartition(snapshot))
    override def createReaderFactory(): PartitionReaderFactory =
      MemReaderFactory(tableSchema, required)
  }
}

/** Serves the requested schema from table-layout rows: data columns by
  * position, the `_group` metadata column synthesized (single COW group).
  */
case class MemReaderFactory(tableSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val groupVal = org.apache.spark.unsafe.types.UTF8String.fromString("all")
    val fields: Array[(Int, DataType)] = required.fields.map { f =>
      if (f.name == MemTable.GroupColName) (-1, f.dataType)
      else (tableSchema.fieldIndex(f.name), f.dataType)
    }
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[MemPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          fields.map { case (i, dt) =>
            if (i < 0) groupVal
            else if (cur.isNullAt(i)) null
            else cur.get(i, dt)
          }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

case class MemPartition(rows: Seq[InternalRow]) extends InputPartition

class MemWriteBuilder(table: MemTable)
    extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MemBatchWrite(table, replace, table.schema())
  }
}

case class MemCommit(rows: Seq[InternalRow]) extends WriterCommitMessage

class MemBatchWrite(table: MemTable, replace: Boolean, writeSchema: StructType)
    extends BatchWrite {
  private val tableSchema = table.schema()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // incoming rows follow the WRITE schema (for row-level operations it
    // need not be the table layout); map each table column to its source
    // position once, on the driver
    val srcIdx = tableSchema.fields.map { tf =>
      (writeSchema.fieldIndex(tf.name), tf.dataType)
    }
    MemWriterFactory(srcIdx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.toSeq.collect { case MemCommit(rs) => rs }.flatten
    table.synchronized {
      if (replace) {
        table.rows = fresh
        table.deltaLog = Vector.empty // truncate supersedes pending deltas
      } else table.rows = table.rows ++ fresh
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Task-side writer: deep-copies each incoming row field-by-field into
  * the TABLE column layout — upstream projections reuse row buffers, and
  * a row-level-operation write may deliver a wider row than the table
  * (metadata columns), so position-blind `row.copy()` is not enough.
  */
case class MemWriterFactory(
    srcIdx: Array[(Int, org.apache.spark.sql.types.DataType)])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Seq.newBuilder[InternalRow]
      // the row-level (MERGE) path delivers carried-over rows through the
      // metadata-bearing overload — the group id needs no routing here
      // (single group), so both overloads store the projected data row
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)
      override def write(record: InternalRow): Unit =
        buf += MemRows.copyToTableLayout(srcIdx, record)
      override def commit(): WriterCommitMessage = MemCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private[graft] object MemRows {
  /** Deep-copies an incoming write-schema row into the table column
    * layout — upstream projections reuse row buffers, so string/binary
    * fields must be copied, and a row-level write may deliver a wider
    * row than the table.
    */
  def copyToTableLayout(srcIdx: Array[(Int, DataType)],
      record: InternalRow): InternalRow = {
    val vals: Array[Any] = srcIdx.map { case (i, dt) =>
      if (record.isNullAt(i)) null
      else dt match {
        case org.apache.spark.sql.types.StringType =>
          record.getUTF8String(i).copy()
        case org.apache.spark.sql.types.BinaryType =>
          record.getBinary(i).clone()
        case _ => record.get(i, dt)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }
}

/** One merge-on-read action: op ∈ {Delete, Update, Insert}, the rowId
  * value it targets, and (for update/insert) the replacement row in
  * table layout.
  */
case class MemDeltaAction(op: Int, key: Any, row: InternalRow)
object MemDeltaAction {
  val Delete = 0; val Update = 1; val Insert = 2
}

/** Merge-on-read row-level operation ([[SupportsDelta]]): Catalyst plans
  * a WriteDelta instead of ReplaceData — no carried-over rows flow
  * through the plan, and the writer receives per-row DELETE / UPDATE /
  * INSERT calls keyed by the declared rowId column. Commit APPENDS the
  * actions to the table's delta log; the base snapshot is never
  * rewritten. Readers reconcile base + log at scan build
  * ([[MemTable.current]]) — the write-cheap / read-pays trade that
  * defines MOR vs the COW twin ([[MemRowLevelOperation]]); the spec
  * pins base-unchanged + log-grown and row-identity of the two paths.
  */
class MemDeltaOperation(table: MemTable, cmd: Command)
    extends RowLevelOperation with SupportsDelta {
  override def command(): Command = cmd
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(table.schema().fields(0).name))
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(table.current, table.schema())
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new MemDeltaBatchWrite(table, info.schema())
      }
    }
}

case class MemDeltaCommit(actions: Seq[MemDeltaAction]) extends WriterCommitMessage

class MemDeltaBatchWrite(table: MemTable, writeSchema: StructType)
    extends DeltaBatchWrite {
  private val tableSchema = table.schema()
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    // a DELETE-only command ships no data row — the layout map exists
    // only when the write schema carries every table column
    val srcIdx: Option[Array[(Int, DataType)]] =
      if (tableSchema.fields.forall(tf => writeSchema.fieldNames.contains(tf.name)))
        Some(tableSchema.fields.map(tf =>
          (writeSchema.fieldIndex(tf.name), tf.dataType)))
      else None
    MemDeltaWriterFactory(srcIdx, tableSchema.fields(0).dataType)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val acts = messages.toSeq.collect { case MemDeltaCommit(as) => as }.flatten
    table.synchronized { table.deltaLog = table.deltaLog ++ acts }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class MemDeltaWriterFactory(srcIdx: Option[Array[(Int, DataType)]],
    keyType: DataType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val buf = Seq.newBuilder[MemDeltaAction]
      // id rows arrive in the rowId projection (single column, pos 0)
      // and may reuse buffers — copy string keys like data fields
      private def keyOf(id: InternalRow): Any =
        if (id.isNullAt(0)) null
        else keyType match {
          case StringType => id.getUTF8String(0).copy()
          case _ => id.get(0, keyType)
        }
      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        buf += MemDeltaAction(MemDeltaAction.Delete, keyOf(id), null)
      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        buf += MemDeltaAction(MemDeltaAction.Update, keyOf(id),
          MemRows.copyToTableLayout(srcIdx.get, row))
      override def insert(row: InternalRow): Unit = {
        val r = MemRows.copyToTableLayout(srcIdx.get, row)
        buf += MemDeltaAction(MemDeltaAction.Insert,
          if (r.isNullAt(0)) null else r.get(0, keyType), r)
      }
      override def commit(): WriterCommitMessage = MemDeltaCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
