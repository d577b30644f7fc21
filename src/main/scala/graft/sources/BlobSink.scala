package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native DataSource V2 SINK with a real commit protocol — the
  * write-side counterpart of [[SeqSourceProvider]] (which covers the
  * read-side negotiation surface). The reference's load path appends
  * rows with no atomicity (reference `src/load/main.py:40-43` — a
  * partially-failed insert leaves committed prefixes behind); this
  * connector shows the Spark-first correction at the CONNECTOR layer,
  * the same guarantee `tablelog.TableLog` provides at the table
  * layer:
  *
  *  - each task's [[DataWriter]] streams rows to an UNCOMMITTED
  *    `*.tmp` file and returns its name as the task's
  *    [[WriterCommitMessage]] — speculative/zombie task attempts die
  *    with their tmp files, never visible;
  *  - the driver's [[BatchWrite.commit]] runs exactly once over the
  *    winning attempts' messages: it renames each tmp into place and
  *    publishes ONE `_MANIFEST` (tmp-write + ATOMIC_MOVE), so a
  *    reader sees the whole batch or none of it;
  *  - [[BatchWrite.abort]] deletes the orphan tmps;
  *  - reads list the MANIFEST, never the directory — a crashed job's
  *    leftovers or foreign files in the directory are invisible
  *    (spec-planted).
  *
  * The sink is self-describing: the first commit publishes the
  * schema as `_SCHEMA` (DDL string), and `inferSchema` reads it
  * back, so `spark.read.format(...)` round-trips with no declared
  * schema. Payload format is escaped TSV — deliberately trivial,
  * because the connector surface under test is the commit protocol
  * and the planner negotiation, not the encoding (Parquet remains
  * the table format; `TableLog` is the scaled-up descendant). Values
  * support long/int/double/string and NULLs. */
class BlobSinkProvider extends TableProvider {
  /** Writes carry the frame's own schema (no inference pass); reads
    * with no user schema fall back to [[inferSchema]]'s `_SCHEMA`. */
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = Paths.get(options.get("path"), "_SCHEMA")
    require(Files.exists(p), s"BlobSink: no _SCHEMA at $p — write first")
    StructType.fromDDL(Files.readString(p))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BlobTable(properties.get("path"), schema)
}

object BlobSink {
  val nullToken = "\\N"
  def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
  def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'N'  => b.append("\\N"); i += 2 // only whole-field token
          case o    => b.append(c); b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
  def manifestOf(dir: String): Path = Paths.get(dir, "_MANIFEST")
  def committedFiles(dir: String): Seq[String] =
    if (Files.exists(manifestOf(dir)))
      Files.readAllLines(manifestOf(dir)).asScala.toSeq.filter(_.nonEmpty)
    else Seq.empty
}

class BlobTable(dir: String, tblSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_blob($dir)"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = tblSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        BlobSink.committedFiles(dir)
          .map(f => BlobFilePartition(s"$dir/$f"): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new BlobReaderFactory(tblSchema)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BlobBatchWrite(dir, info.schema())
      }
    }
}

case class BlobFilePartition(file: String) extends InputPartition

class BlobReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lines = Files.readAllLines(
      Paths.get(p.asInstanceOf[BlobFilePartition].file),
      StandardCharsets.UTF_8).iterator()
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val parts = lines.next().split("\t", -1)
        val vals: Array[Any] = schema.fields.zipWithIndex.map { case (f, i) =>
          val raw = parts(i)
          if (raw == BlobSink.nullToken) null
          else f.dataType match {
            case LongType    => raw.toLong
            case IntegerType => raw.toInt
            case DoubleType  => raw.toDouble
            case StringType  => UTF8String.fromString(BlobSink.unesc(raw))
            case o => throw new IllegalArgumentException(s"BlobSink: $o")
          }
        }
        row = InternalRow.fromSeq(vals.toIndexedSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

case class BlobCommitMessage(tmpName: String, rows: Long)
    extends WriterCommitMessage

class BlobBatchWrite(dir: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new BlobWriterFactory(dir, schema)

  /** Exactly-once publish point: rename winners into place, then one
    * atomic manifest move. Appends re-publish the full file list
    * (prior manifest + this batch) — single-writer discipline at this
    * layer, documented; `TableLog.commit` owns real concurrency. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val prior = BlobSink.committedFiles(dir)
    val fresh = messages.collect {
      case BlobCommitMessage(tmp, _) =>
        val fin = tmp.stripSuffix(".tmp")
        Files.move(Paths.get(dir, tmp), Paths.get(dir, fin),
          StandardCopyOption.ATOMIC_MOVE)
        fin
    }
    val schemaPath = Paths.get(dir, "_SCHEMA")
    if (!Files.exists(schemaPath)) {
      val tmpS = Paths.get(dir, s"_SCHEMA.${UUID.randomUUID()}.tmp")
      Files.writeString(tmpS, schema.toDDL)
      Files.move(tmpS, schemaPath, StandardCopyOption.ATOMIC_MOVE)
    }
    val tmpM = Paths.get(dir, s"_MANIFEST.${UUID.randomUUID()}.tmp")
    Files.writeString(tmpM, (prior ++ fresh).mkString("\n"))
    Files.move(tmpM, BlobSink.manifestOf(dir),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case BlobCommitMessage(tmp, _) =>
        Files.deleteIfExists(Paths.get(dir, tmp))
      case _ => ()
    }
}

class BlobWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    Files.createDirectories(Paths.get(dir))
    val tmpName = f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.tsv.tmp"
    val out = Files.newBufferedWriter(
      Paths.get(dir, tmpName), StandardCharsets.UTF_8)
    var n = 0L
    new DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = {
        val line = schema.fields.zipWithIndex.map { case (f, i) =>
          if (r.isNullAt(i)) BlobSink.nullToken
          else f.dataType match {
            case LongType    => r.getLong(i).toString
            case IntegerType => r.getInt(i).toString
            case DoubleType  => r.getDouble(i).toString
            case StringType  => BlobSink.esc(r.getUTF8String(i).toString)
            case o => throw new IllegalArgumentException(s"BlobSink: $o")
          }
        }.mkString("\t")
        out.write(line); out.write("\n"); n += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close(); BlobCommitMessage(tmpName, n)
      }
      override def abort(): Unit = {
        out.close(); Files.deleteIfExists(Paths.get(dir, tmpName))
      }
      override def close(): Unit = ()
    }
  }
}
