package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSourceV2 BATCH connector — the connector-extensibility
  * proof the rest of the library leans on file formats for: a
  * deterministic integer-sequence table (`id`, `sq = id²`,
  * `mod7 = id % 7`, `hex`) generated directly into `InternalRow`s, split
  * into `slices` input partitions so the scan parallelizes like any real
  * source, with COLUMN PRUNING honored through
  * [[SupportsPushDownRequiredColumns]] — a `select(mod7, sq)` reaches the
  * reader as a 2-field schema and the reader materializes only those
  * fields (PlanSpec pins the pruned `readSchema`). The same four
  * interfaces (TableProvider → Table → ScanBuilder → PartitionReader)
  * are what a real object-store / JDBC / message-bus connector
  * implements; rows-from-arithmetic stands in for rows-from-IO so the
  * handshake itself is what the oracle verifies (DuckDB
  * `generate_series` replays the table exactly).
  *
  * Scale shape: partitions are computed ranges — planInputPartitions is
  * O(slices) driver work and each reader streams its range without
  * buffering, the contract every scalable connector obeys.
  */
object SeqTable {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("mod7", LongType, nullable = false),
    StructField("hex", StringType, nullable = false)))
}

class SeqSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-seq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqTable.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqTable.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

/** Builder with BOTH pushdown handshakes: required-column pruning and
  * id-range filter pushdown. Pushed bounds NARROW the planned partition
  * ranges (the connector analog of parquet row-group pruning) but are
  * also returned as residuals so Spark re-evaluates them post-scan —
  * the belt-and-suspenders production pattern: pruning is an
  * optimization, never the correctness story.
  */
class SeqScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
  private var required: StructType = SeqTable.fullSchema
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case _ => false
    }
    filters // all residual: Spark re-evaluates, narrowing is an optimization
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new SeqScan(lo, hi, slices, required)
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String = s"graft-seq range=[$lo,$hi)"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val step = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by step)
      .map(s => SeqPartition(s, math.min(hi, s + step)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, slices, required)
}

/** Streaming leg of the connector: offsets are plain row positions and
  * each micro-batch reads the [start, end) slice with the SAME
  * partition/reader machinery as the batch scan — the property that
  * makes a storage source replayable (offset + deterministic range =
  * exactly-once on retry). Advancement is ADMISSION-CONTROLLED
  * ([[SupportsAdmissionControl]]): the default read limit is a quarter
  * of the table, so a bounded drain genuinely exercises multi-batch
  * incremental state (≥ 4 micro-batches — StreamingSpec pins it), and
  * [[SupportsTriggerAvailableNow]] lets Trigger.AvailableNow respect
  * those limits instead of swallowing the range in one batch — the
  * Kafka-source rhythm (maxOffsetsPerTrigger) re-expressed for a range
  * source.
  */
class SeqMicroBatchStream(lo: Long, hi: Long, slices: Int,
    required: StructType) extends MicroBatchStream
    with SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset
  private case class SeqOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }
  private val chunk = math.max(1L, (hi - lo) / 4)
  override def initialOffset(): Offset = SeqOffset(lo)
  /** Admission-controlled sources route every poll through
    * latestOffset(start, limit); the legacy no-arg form must never be
    * called (same contract as the Kafka source).
    */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit)")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(chunk)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].n
    val step = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows())
      case _ => hi - s // ReadAllAvailable
    }
    SeqOffset(math.min(hi, s + step))
  }
  override def reportLatestOffset(): Offset = SeqOffset(hi)
  /** The table is bounded and static — the available-now end is `hi`
    * regardless of when the trigger starts, so there is nothing to
    * capture.
    */
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    SeqOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].n
    val e = end.asInstanceOf[SeqOffset].n
    val n = math.max(0L, e - s)
    val step = math.max(1L, (n + slices - 1) / slices)
    (s until e by step)
      .map(p => SeqPartition(p, math.min(e, p + step)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(fields.toSeq.map {
        case "id" => cur
        case "sq" => cur * cur
        case "mod7" => cur % 7
        case "hex" => UTF8String.fromString(java.lang.Long.toHexString(cur))
      })
      override def close(): Unit = ()
    }
  }
}
