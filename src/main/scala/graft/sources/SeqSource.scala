package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native DataSource V2 connector — the extension surface a
  * standalone Spark library ships so the ENGINE, not driver-side
  * glue, owns ingestion (the reference's HTTP pull is imperative
  * Python writing blobs; `etl.Extract` mirrors that shape, and this
  * is the Spark-first alternative: a `TableProvider` whose scans
  * negotiate with Catalyst). The table is a deterministic generated
  * sequence — id ∈ [0, rows), grp = 'g'‖(id mod 10), val = the
  * Knuth multiplicative hash (id·2654435761) mod 1000003 — so
  * correctness is DuckDB-oracle-checkable via generate_series with
  * identical integer arithmetic.
  *
  * What it negotiates (and PlanSpec pins):
  *  - SupportsPushDownFilters: id-range predicates narrow [lo, hi)
  *    INSIDE the source; non-id filters return as residuals for
  *    Spark to re-apply. At 100 TB this is the difference between
  *    scanning a partition and skipping it.
  *  - SupportsPushDownRequiredColumns: the reader materializes only
  *    requested fields (column pruning at generation).
  *  - planInputPartitions: the [0, rows) domain splits into `parts`
  *    fixed chunks and only chunks INTERSECTING the pushed range
  *    survive — static partition pruning, visible in the scan
  *    description as `chunks=kept/total`.
  */
class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object SeqTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType, nullable = false),
    StructField("val", LongType, nullable = false)))
  /** Engine-identical row derivation (mirrored in the q226 oracle). */
  def grpOf(id: Long): String = "g" + (id % 10)
  def valOf(id: Long): Long = (id * 2654435761L) % 1000003L
}

class SeqTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts)
}

class SeqScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SeqTable.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("id", _: java.lang.Long | _: java.lang.Integer) => true
      case EqualTo("id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, toL(v))
      case GreaterThan(_, v)        => lo = math.max(lo, toL(v) + 1)
      case LessThan(_, v)           => hi = math.min(hi, toL(v))
      case LessThanOrEqual(_, v)    => hi = math.min(hi, toL(v) + 1)
      case EqualTo(_, v) => lo = math.max(lo, toL(v)); hi = math.min(hi, toL(v) + 1)
      case _ =>
    }
    accepted = ours
    residual
  }
  private def toL(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeqScan(rows, parts, lo, hi, required)
}

case class SeqRangePartition(start: Long, end: Long) extends InputPartition

class SeqScan(rows: Long, parts: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  private lazy val partitions: Array[InputPartition] = {
    val chunk = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(p => (p * chunk, math.min(rows, (p + 1) * chunk)))
      .map { case (s, e) => (math.max(s, lo), math.min(e, hi)) }
      .filter { case (s, e) => s < e }
      .map { case (s, e) => SeqRangePartition(s, e): InputPartition }
      .toArray
  }
  override def planInputPartitions(): Array[InputPartition] = partitions
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqScan(lo=$lo, hi=$hi, chunks=${partitions.length}/$parts, " +
      s"cols=${required.fieldNames.mkString(",")})"
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqRangePartition]
    new SeqPartitionReader(p.start, p.end, required)
  }
}

class SeqPartitionReader(start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private var cur = start - 1
  override def next(): Boolean = { cur += 1; cur < end }
  override def get(): InternalRow = {
    val vals = required.fieldNames.map {
      case "id"  => java.lang.Long.valueOf(cur)
      case "grp" => UTF8String.fromString(SeqTable.grpOf(cur))
      case "val" => java.lang.Long.valueOf(SeqTable.valOf(cur))
    }
    InternalRow.fromSeq(vals.toSeq)
  }
  override def close(): Unit = ()
}
