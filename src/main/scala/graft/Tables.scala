package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables
  * (see /root/repo/TESTDATA.md, /root/repo/FIXTURES.md §2).
  *
  * All loads go through `spark.read.parquet` so Catalyst's vectorized
  * Parquet reader, predicate pushdown, and column pruning apply — at
  * 100 TB the scan is the dominant cost and must stay declarative.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = table(s, dir, "lineitem")
  /** `events.ts` normalization — the driver has shipped the column as
    * parquet TIMESTAMP(NANOS) (Spark 4 refuses it natively; sessions
    * set spark.sql.legacy.parquet.nanosAsLong and we µs-truncate, the
    * same truncation DuckDB applies reading nanos) and as µs with no
    * tz annotation (sessions disable inferTimestampNTZ so the scan
    * yields TIMESTAMP directly; the NTZ branch here is the fallback
    * for sessions without that conf — a cast above the scan, so keep
    * ts predicates off it when pushdown matters). */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  /** `documents` re-spread across the cluster. The testdata table is
    * one parquet row-group → one scan task, which serializes any
    * CPU-heavy projection (shingling, token hashing) onto a single
    * core. The shuffle moves only raw text once (~100 B/row) and buys
    * full-width parallelism for the signature pipelines; real
    * many-file inputs get this parallelism from the scan itself. */
  /** The partition count is explicit: AQE coalesces repartitions and
    * aggregation exchanges whose byte size looks small, but these
    * stages fan out to CPU-heavy per-row work (shingling, hashing) —
    * size them by downstream work, not input bytes. Explicit
    * hash-partitioning on doc_id also lets the downstream
    * groupBy(doc_id) aggregations run exchange-free. */
  def documentsSpread(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).repartition(s.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("doc_id"))
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
