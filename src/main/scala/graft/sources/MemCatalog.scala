package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableCatalogCapability, TableChange}
import org.apache.spark.sql.connector.catalog.constraints.Constraint
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
    val t = new MemTable(ident, schema, mor,
      MemPartitioning.parse(partitions, schema))
    if (MemCatalog.store.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }
  /** SCHEMA EVOLUTION at the catalog (the lakehouse leg `parquet
    * mergeSchema` only approximates): ADD COLUMNS appends nullable
    * fields to the live schema WITHOUT rewriting any stored row — old
    * rows are physically shorter and the scan null-backfills them by
    * ordinal (exactly Iceberg/Delta's add-column contract: a metadata
    * operation, zero data IO). Row-level operations compose: a MERGE /
    * UPDATE after evolution projects old rows through the new schema.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = MemCatalog.store.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "only top-level ADD COLUMN is supported")
        t.evolveAdd(StructField(add.fieldNames()(0), add.dataType(),
          nullable = true))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "only top-level DROP COLUMN is supported")
        t.evolveDrop(del.fieldNames()(0))
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames().length == 1,
          "only top-level RENAME COLUMN is supported")
        t.evolveRename(ren.fieldNames()(0), ren.newName())
      case ac: TableChange.AddConstraint =>
        t.addConstraint(ac.constraint())
      case dc: TableChange.DropConstraint =>
        t.dropConstraint(dc.name(), dc.ifExists())
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change not supported: $other")
    }
    t
  }
  // Advertise ALTER TABLE ... ADD CONSTRAINT support (the analyzer
  // refuses the statement against catalogs that don't declare it).
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  override def dropTable(ident: Identifier): Boolean =
    MemCatalog.store.remove(ident) != null
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = MemCatalog.store.get(oldIdent)
    if (t == null) throw new NoSuchTableException(oldIdent)
    if (MemCatalog.store.putIfAbsent(newIdent, t) != null)
      throw new TableAlreadyExistsException(newIdent)
    MemCatalog.store.remove(oldIdent)
  }
}

object MemCatalog {
  private[graft] val store = new ConcurrentHashMap[Identifier, MemTable]()
}

/** PARTITION TRANSFORMS for the V2 catalog — `CREATE TABLE ...
  * PARTITIONED BY (bucket(N, k) | truncate(W, c) | days(ts) |
  * identity)`. A transform list compiles to a deterministic
  * row → partition-id function; the partition id IS the copy-on-write
  * GROUP id (`_group`), so group-based row-level operations rewrite at
  * partition grain instead of whole-table grain, and merge-on-read
  * delta actions carry the partition they belong to (the file-routing
  * handle a real lake format needs).
  *
  * The ids are human-readable strings (`b3/d19723/gra`) rather than
  * hashes: a demo-scale choice that makes specs and plans legible; the
  * grouping contract is identical to Iceberg's hidden partitioning —
  * derived from data columns, recomputable from any row, never stored
  * by the writer.
  */
private[graft] object MemPartitioning {
  import org.apache.spark.sql.types._

  /** One compiled transform: reads its source field from a TABLE-layout
    * row and renders the partition-value token.
    */
  private def compile(name: String, width: Int, idx: Int,
      dt: DataType): InternalRow => String = {
    def longVal(r: InternalRow): Long = dt match {
      case LongType => r.getLong(idx)
      case IntegerType => r.getInt(idx).toLong
      case ShortType => r.getShort(idx).toLong
      case DateType => r.getInt(idx).toLong // days since epoch
      case TimestampType => Math.floorDiv(r.getLong(idx), 86400000000L)
      case other => throw new UnsupportedOperationException(
        s"partition transform $name over $other")
    }
    name match {
      case "bucket" => r =>
        if (r.isNullAt(idx)) "bnull"
        else dt match {
          // modulo, not murmur: legible demo buckets with the same
          // co-location contract (equal keys → equal bucket)
          case StringType => s"b${Math.floorMod(r.getUTF8String(idx).hashCode, width)}"
          case _ => s"b${Math.floorMod(longVal(r), width.toLong)}"
        }
      case "truncate" => r =>
        if (r.isNullAt(idx)) "tnull"
        else dt match {
          case StringType =>
            val s0 = r.getUTF8String(idx).toString
            s"t${s0.substring(0, math.min(width, s0.length))}"
          case _ =>
            val v = longVal(r); s"t${v - Math.floorMod(v, width.toLong)}"
        }
      case "days" | "day" => r =>
        if (r.isNullAt(idx)) "dnull" else s"d${longVal(r)}"
      case "identity" => r =>
        if (r.isNullAt(idx)) "null"
        else dt match {
          case StringType => r.getUTF8String(idx).toString
          case _ => longVal(r).toString
        }
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform: $other")
    }
  }

  /** Compiles a PARTITIONED BY transform list into a row→group function;
    * None for an unpartitioned table (single `all` group — the original
    * whole-table-COW behavior, unchanged).
    */
  /** Returns the compiled row→group function AND the physical slot
    * indices of the transforms' SOURCE columns (recorded at CREATE time —
    * slots are append-only, so they stay valid across every later ADD /
    * RENAME). [[MemTable.evolveDrop]] refuses to drop any slot the spec
    * references: after such a drop new rows would write null into the
    * orphaned slot and routing would silently key off dead data — the
    * same reason Iceberg refuses dropping a field of the active
    * partition spec.
    */
  def parse(transforms: Array[Transform],
      schema: StructType): Option[(InternalRow => String, Set[Int])] = {
    if (transforms == null || transforms.isEmpty) None
    else Some {
      val compiled = transforms.toSeq.map { t =>
        val refs = t.references()
        require(refs.length == 1,
          s"partition transform ${t.name()} must reference exactly one column")
        val idx = schema.fieldIndex(refs.head.fieldNames().mkString("."))
        val width = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value() != null && l.dataType().isInstanceOf[IntegerType] =>
            l.value().asInstanceOf[Int]
        }.getOrElse(0)
        (compile(t.name().toLowerCase(java.util.Locale.ROOT), width, idx,
          schema.fields(idx).dataType), idx)
      }
      val fns = compiled.map(_._1)
      ((r: InternalRow) => fns.map(_(r)).mkString("/"),
        compiled.map(_._2).toSet)
    }
  }
}

class MemTable(ident: Identifier, initialSchema: StructType,
    private[graft] val mor: Boolean = false,
    partSpec: Option[(InternalRow => String, Set[Int])] = None) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns {
  /** Live schema — ADD COLUMNS appends here; stored rows keep their
    * write-time width and the reader null-backfills by ordinal.
    */
  @volatile private var tableSchema: StructType = initialSchema

  /** PHYSICAL storage slot of each live column. The storage layout is
    * APPEND-ONLY: ADD claims a fresh slot, DROP orphans its slot (stored
    * values stay on disk, invisible — re-adding the name claims a NEW
    * slot, so dropped data is never resurrected: the Iceberg field-id
    * contract), RENAME re-keys the mapping in place (zero data IO).
    */
  @volatile private[graft] var physIdx: Map[String, Int] =
    initialSchema.fieldNames.zipWithIndex.toMap
  @volatile private[graft] var physWidth: Int = initialSchema.length

  /** Table-level constraints (the Delta-style WRITE-TIME contract):
    * stored here, REPORTED through [[constraints]], and enforced by the
    * engine — Spark's ResolveTableConstraints rule wraps every V2 write
    * against this table (append, overwrite, MERGE's ReplaceData, MOR's
    * WriteDelta) in CheckInvariant guards that throw on the first
    * violating row, so the write's tasks fail BEFORE any commit message
    * reaches [[MemBatchWrite.commit]] — atomic abort, no partial
    * visibility (SourceSinkSpec pins both halves).
    */
  @volatile private var tableConstraints: Seq[Constraint] = Seq.empty

  private[graft] def addConstraint(c: Constraint): Unit = synchronized {
    require(!tableConstraints.exists(_.name() == c.name()),
      s"constraint ${c.name()} already exists")
    tableConstraints :+= c
  }

  private[graft] def dropConstraint(name: String, ifExists: Boolean): Unit =
    synchronized {
      require(ifExists || tableConstraints.exists(_.name() == name),
        s"no such constraint: $name")
      tableConstraints = tableConstraints.filterNot(_.name() == name)
    }

  override def constraints(): Array[Constraint] = tableConstraints.toArray

  private[graft] def evolveAdd(f: StructField): Unit = synchronized {
    require(!tableSchema.fieldNames.contains(f.name),
      s"column ${f.name} already exists")
    tableSchema = tableSchema.add(f)
    physIdx += (f.name -> physWidth)
    physWidth += 1
  }

  /** DROP COLUMN, metadata-only: the live schema and mapping forget the
    * column; every stored row keeps its bytes (time travel / rollback
    * would still see them), and no data is rewritten at any table size.
    * The physical row-id slot (0) anchors MOR delta keying and COW
    * carry-back, so dropping it is refused — same as a lake format
    * refusing to drop its identifier field.
    */
  private[graft] def evolveDrop(name: String): Unit = synchronized {
    require(tableSchema.fieldNames.contains(name), s"no such column: $name")
    require(physIdx(name) != 0, "cannot drop the row-id column")
    // Iceberg contract: a field the ACTIVE partition spec reads cannot
    // be dropped — new rows would write null into the orphaned slot and
    // partition routing would silently key off dead data (or, after a
    // re-add claimed a fresh slot, off the wrong one).
    require(!partSlots.contains(physIdx(name)),
      s"cannot drop column $name: referenced by the partition spec")
    tableSchema = StructType(tableSchema.filterNot(_.name == name))
    physIdx -= name
  }

  /** RENAME COLUMN, metadata-only: the mapping re-keys to the same
    * physical slot — stored rows untouched, values preserved.
    */
  private[graft] def evolveRename(from: String, to: String): Unit =
    synchronized {
      require(tableSchema.fieldNames.contains(from), s"no such column: $from")
      require(!tableSchema.fieldNames.contains(to),
        s"column $to already exists")
      val slot = physIdx(from)
      tableSchema = StructType(tableSchema.map(f =>
        if (f.name == from) f.copy(name = to) else f))
      physIdx = physIdx - from + (to -> slot)
    }

  /** Physical write template: one entry per storage slot — live columns
    * point at their write-schema source, orphaned (dropped) slots write
    * null. Incoming rows always materialize at full physical width so
    * every stored row resolves by absolute slot.
    */
  private[graft] def physTemplate(
      writeSchema: StructType): Array[(Int, DataType)] = synchronized {
    val bySlot = physIdx.map(_.swap)
    val live = tableSchema.fields.map(f => f.name -> f).toMap
    (0 until physWidth).map { slot =>
      bySlot.get(slot) match {
        case Some(name) =>
          (writeSchema.fieldIndex(name), live(name).dataType)
        case None => (-1, org.apache.spark.sql.types.NullType: DataType)
      }
    }.toArray
  }
  /** Row → copy-on-write group id. Unpartitioned tables keep the single
    * `all` group (whole-table COW, the original semantics); partitioned
    * tables derive the group from the PARTITIONED BY transforms — the
    * group a row belongs to is recomputable from the row itself, never
    * stored (hidden partitioning).
    */
  private[graft] val partitionOf: InternalRow => String =
    partSpec.map(_._1).getOrElse((_: InternalRow) => "all")
  /** CREATE-time physical slots the partition transforms read. */
  private val partSlots: Set[Int] = partSpec.map(_._2).getOrElse(Set.empty)
  private[graft] def isPartitioned: Boolean = partSpec.isDefined

  /** Observability for specs and ops: the group set the last row-level
    * commit actually replaced (after runtime group filtering).
    */
  @volatile private[graft] var lastReplacedGroups: Set[String] = Set.empty
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

  /** The copy-on-write GROUP id, exposed as a metadata column: the
    * partition id for a PARTITIONED BY table, the single `all` group
    * otherwise — the handle Spark's row-level machinery uses to route
    * carried-over rows back to their group (and declaring it is what
    * selects the projecting DataAndMetadata write path).
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(MemTable.GroupColumn)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(current, tableSchema, physIdx, partitionOf)

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

/** GROUP-BASED copy-on-write operation, now at PARTITION grain. The
  * scan serves one input partition per COW group and implements
  * [[SupportsRuntimeV2Filtering]] on `_group`, so Catalyst's
  * RowLevelOperationRuntimeGroupFiltering rule prunes it at runtime: a
  * dynamic IN-subquery computes the groups the condition actually
  * touches, `filter()` drops every other group from the scan, and the
  * commit REPLACES exactly the filtered group set — siblings' rows are
  * carried over untouched (by reference — the spec proves identity).
  *
  * The commit's replaced-group set MUST mirror the runtime filter's
  * IN-set exactly: Spark also places a row-level `_group IN (...)`
  * Filter above the scan, so rows of unmatched groups never reach the
  * write — replacing a group the filter excluded would silently drop
  * its rows. That is why `filter()` refuses predicates it cannot parse
  * instead of ignoring them.
  */
class MemRowLevelOperation(table: MemTable, cmd: Command)
    extends RowLevelOperation {
  /** The runtime group filter the MAIN scan received, if any: the
    * single source of truth for which groups this operation rewrites.
    * None ⇒ no pruning happened ⇒ every group was scanned.
    */
  @volatile private[graft] var runtimeGroups: Option[Set[String]] = None

  override def command(): Command = cmd
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(MemTable.GroupColName))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(table.current, table.schema(), table.physIdx,
      table.partitionOf, rowLevel = Some(this))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(table, replace = true, info.schema(),
            replaceGroups = () => runtimeGroups)
      }
    }
}

class MemScanBuilder(snapshot: Seq[InternalRow], tableSchema: StructType,
    physIdx: Map[String, Int], groupOf: InternalRow => String,
    rowLevel: Option[MemRowLevelOperation] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new MemGroupScan(snapshot, physIdx, required, groupOf, rowLevel)
}

/** One COW group per input partition; row-level scans are runtime-
  * group-filterable on `_group` (see [[MemRowLevelOperation]]).
  */
class MemGroupScan(snapshot: Seq[InternalRow], physIdx: Map[String, Int],
    required: StructType, groupOf: InternalRow => String,
    rowLevel: Option[MemRowLevelOperation])
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  @volatile private var allowed: Option[Set[String]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Advertise `_group` for runtime filtering ONLY on row-level scans
  // that actually output it — Spark's DPP machinery resolves the filter
  // attributes against the scan output and fails loudly on a plain
  // pruned read (e.g. a SELECT k) otherwise.
  override def filterAttributes(): Array[NamedReference] =
    if (rowLevel.isDefined &&
        required.fieldNames.contains(MemTable.GroupColName))
      Array(Expressions.column(MemTable.GroupColName))
    else Array.empty

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val inSets = predicates.toSeq.map { p =>
      require(p.name() == "IN",
        s"unparseable runtime group filter would lose carried rows: $p")
      p.children().toSeq.collect {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value() != null && !l.isInstanceOf[NamedReference] =>
          l.value().toString
      }.toSet
    }
    val keep = inSets.reduceOption(_ intersect _).getOrElse(Set.empty)
    allowed = Some(keep)
    rowLevel.foreach(_.runtimeGroups = Some(keep))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val grouped = snapshot.groupBy(groupOf).toSeq.sortBy(_._1)
    val served = allowed match {
      case Some(keep) => grouped.filter { case (g, _) => keep(g) }
      case None => grouped
    }
    served.map { case (g, rs) => MemPartition(g, rs) }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    MemReaderFactory(physIdx, required)
}

/** Serves the requested schema from table-layout rows: data columns by
  * position, the `_group` metadata column synthesized from the input
  * partition's COW group id.
  */
case class MemReaderFactory(physIdx: Map[String, Int], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[MemPartition]
    val groupVal = org.apache.spark.unsafe.types.UTF8String.fromString(part.group)
    val fields: Array[(Int, DataType)] = required.fields.map { f =>
      if (f.name == MemTable.GroupColName) (-1, f.dataType)
      else (physIdx(f.name), f.dataType)
    }
    new PartitionReader[InternalRow] {
      private val it = part.rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          fields.map { case (i, dt) =>
            if (i < 0) groupVal
            // rows written before an ADD COLUMN are physically shorter:
            // null-backfill evolved ordinals (the add-column contract)
            else if (i >= cur.numFields || cur.isNullAt(i)) null
            else cur.get(i, dt)
          }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

case class MemPartition(group: String, rows: Seq[InternalRow]) extends InputPartition

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

class MemBatchWrite(table: MemTable, replace: Boolean, writeSchema: StructType,
    replaceGroups: () => Option[Set[String]] = () => None)
    extends BatchWrite {
  private val tableSchema = table.schema()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // incoming rows follow the WRITE schema (for row-level operations it
    // need not be the table layout); map each PHYSICAL storage slot to
    // its write-schema source once, on the driver (orphaned slots of
    // dropped columns write null)
    MemWriterFactory(table.physTemplate(writeSchema))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.toSeq.collect { case MemCommit(rs) => rs }.flatten
    table.synchronized {
      if (replace) {
        replaceGroups() match {
          case Some(groups) =>
            // Partition-scoped copy-on-write: swap ONLY the groups the
            // runtime-filtered scan served; sibling partitions' rows are
            // carried by reference — the untouched-files contract.
            table.rows = table.rows.filterNot(r =>
              groups(table.partitionOf(r))) ++ fresh
            table.lastReplacedGroups = groups
          case None =>
            table.rows = fresh
            table.lastReplacedGroups =
              fresh.map(table.partitionOf).toSet
        }
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
      if (i < 0 || record.isNullAt(i)) null
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
  * value it targets, (for update/insert) the replacement row in table
  * layout, and the PARTITION the action lands in — deletes/updates
  * carry the scanned row's partition (via the `_group` metadata
  * column), inserts the partition derived from the new row. At scale
  * the partition id routes each action to its partition's delta file so
  * a reader merges only its own partition's deltas; here it is recorded
  * and spec-verified.
  */
case class MemDeltaAction(op: Int, key: Any, row: InternalRow,
    part: String = "all")
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
  // a partitioned MOR table needs the scanned row's partition to route
  // its delete/update actions; unpartitioned tables have nothing to ask
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (table.isPartitioned) Array(Expressions.column(MemTable.GroupColName))
    else Array.empty
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(table.current, table.schema(), table.physIdx,
      table.partitionOf)
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
    // only when the write schema carries every table column (physical
    // slots, so delta rows align with evolved base rows)
    val srcIdx: Option[Array[(Int, DataType)]] =
      if (tableSchema.fields.forall(tf => writeSchema.fieldNames.contains(tf.name)))
        Some(table.physTemplate(writeSchema))
      else None
    MemDeltaWriterFactory(srcIdx, tableSchema.fields(0).dataType,
      metaHasGroup = table.isPartitioned,
      partitionOf = if (table.isPartitioned) Some(table.partitionOf) else None)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val acts = messages.toSeq.collect { case MemDeltaCommit(as) => as }.flatten
    table.synchronized { table.deltaLog = table.deltaLog ++ acts }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class MemDeltaWriterFactory(srcIdx: Option[Array[(Int, DataType)]],
    keyType: DataType, metaHasGroup: Boolean = false,
    partitionOf: Option[InternalRow => String] = None)
    extends DeltaWriterFactory {
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
      // the metadata projection carries requiredMetadataAttributes in
      // declared order: `_group` at position 0 on a partitioned table
      private def metaPart(metadata: InternalRow): String =
        if (metaHasGroup && metadata != null && !metadata.isNullAt(0))
          metadata.getUTF8String(0).toString
        else "all"
      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        buf += MemDeltaAction(MemDeltaAction.Delete, keyOf(id), null,
          metaPart(metadata))
      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        val r = MemRows.copyToTableLayout(srcIdx.get, row)
        // an update that moves the row across partitions lands in the
        // NEW partition (derived from the new row values)
        buf += MemDeltaAction(MemDeltaAction.Update, keyOf(id), r,
          partitionOf.map(_(r)).getOrElse(metaPart(metadata)))
      }
      override def insert(row: InternalRow): Unit = {
        val r = MemRows.copyToTableLayout(srcIdx.get, row)
        buf += MemDeltaAction(MemDeltaAction.Insert,
          if (r.isNullAt(0)) null else r.get(0, keyType), r,
          partitionOf.map(_(r)).getOrElse("all"))
      }
      override def commit(): WriterCommitMessage = MemDeltaCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
