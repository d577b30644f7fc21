package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{BooleanType, DoubleType, FloatType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.tablelog.TableLog

/** Structured-Streaming SOURCE over a [[graft.tablelog.TableLog]]
  * commit log — the "table format as a stream" capability (Delta's
  * streaming-source shape): a downstream pipeline subscribes to the
  * table and receives each append commit's files as micro-batch
  * input, exactly once, without ever rescanning the table.
  *
  * {{{
  *   spark.readStream.format("graft.sources.GraftLogStreamProvider")
  *     .option("path", table).load()
  * }}}
  *
  * Semantics:
  *  - the OFFSET is the table version — replays after a failure
  *    re-read the same version window, which is deterministic from
  *    the immutable log, so a checkpointed query is exactly-once
  *    end to end;
  *  - each batch reads ONLY the files added by append-shaped commits
  *    (`create`/`append`/`evolve`) in `(startVersion, endVersion]` —
  *    the [[TableLog.readAppendsSince]] contract, streamed: at 100 TB
  *    a batch is the day's files, never the decade's;
  *  - a REWRITE commit (delete/merge/compact/…) in the window fails
  *    the stream fast: its re-added files would double-count rows an
  *    appends-only reader already emitted. Honest failure over silent
  *    duplication — the consumer falls back to [[TableLog.diffVersions]]
  *    (change-exact through rewrites) and restarts past it;
  *  - `startingVersion` option replays history from a chosen version
  *    (default 0 = the table's beginning).
  *
  * The per-file readers decode parquet through the public
  * parquet-hadoop API (no Spark session on executors), null-filling
  * columns absent from pre-evolution files — primitive columns
  * (long/int/double/float/boolean/string), which is what the log's
  * key-stats design supports. */
class GraftLogStreamProvider extends TableProvider {
  /** Nullability is RELAXED on read, the same contract Spark's file
    * sources apply: a column added by schema evolution may be NOT
    * NULL in the writer's frame, yet pre-evolution files null-fill
    * it — a non-nullable read schema would silently turn those nulls
    * into zero through the unsafe projection. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(
      StructType.fromDDL(TableLog.state(options.get("path")).schemaDdl)
        .fields.map(_.copy(nullable = true)))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLogStreamTable(properties.get("path"),
      StructType(schema.fields.map(_.copy(nullable = true))))
}

class GraftLogStreamTable(path: String, tblSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graftlog_stream(`$path`)"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = tblSchema
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new GraftLogMicroBatchStream(path, tblSchema,
          Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L))
    }
}

/** The stream offset IS the table version — total order for free,
  * replay windows deterministic from the log. */
case class GraftLogVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

class GraftLogMicroBatchStream(path: String, schema: StructType,
    startingVersion: Long) extends MicroBatchStream {
  private val appendOps = Set("create", "append", "evolve")

  override def initialOffset(): Offset = GraftLogVersionOffset(startingVersion)
  override def latestOffset(): Offset =
    GraftLogVersionOffset(TableLog.latestVersion(path))
  override def deserializeOffset(json: String): Offset =
    GraftLogVersionOffset(json.toLong)
  // nothing to clean: offsets are log versions, the log is the state
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftLogVersionOffset].version
    val hi = end.asInstanceOf[GraftLogVersionOffset].version
    val window = TableLog.commits(path, hi).filter(_.version > lo)
    window.filterNot(c => appendOps(c.op)).foreach { c =>
      throw new IllegalStateException(
        s"$path: v${c.version} is a ${c.op} (rewrite) — an appends-only " +
          "stream over this window would double-count; consume " +
          "diffVersions across it and restart with startingVersion > " +
          s"${c.version}")
    }
    window.flatMap(_.adds).map(a => GraftLogStreamFilePartition(
      java.nio.file.Paths.get(path, a.relPath).toString,
      schema.toDDL): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogStreamReaderFactory
}

case class GraftLogStreamFilePartition(file: String, schemaDdl: String)
  extends InputPartition

class GraftLogStreamReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[GraftLogStreamFilePartition]
    val schema = StructType.fromDDL(fp.schemaDdl)
    @annotation.nowarn("cat=deprecation")
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new HadoopPath(fp.file))
      .withConf(new Configuration()).build()
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        val g = reader.read()
        if (g == null) return false
        val gt = g.getType
        val vals: Array[Any] = schema.fields.map { f =>
          // pre-evolution files lack later columns → null-fill, the
          // same contract as the batch read's explicit-schema scan
          if (!gt.containsField(f.name)) null
          else {
            val i = gt.getFieldIndex(f.name)
            if (g.getFieldRepetitionCount(i) == 0) null
            else f.dataType match {
              case LongType    => g.getLong(i, 0)
              case IntegerType => g.getInteger(i, 0)
              case DoubleType  => g.getDouble(i, 0)
              case FloatType   => g.getFloat(i, 0)
              case BooleanType => g.getBoolean(i, 0)
              case StringType  => UTF8String.fromString(g.getString(i, 0))
              case o => throw new UnsupportedOperationException(
                s"graftlog stream: unsupported column type $o for '${f.name}'")
            }
          }
        }
        cur = InternalRow.fromSeq(vals.toIndexedSeq)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = reader.close()
    }
  }
}
