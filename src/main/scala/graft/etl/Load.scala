package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp
import org.apache.spark.sql.streaming.Trigger

/** L — landing blobs → the `posts` table (reference S6–S8).
  *
  * The reference reads one named GCS blob per Pub/Sub event and
  * streaming-inserts rows into BigQuery at-least-once (duplicates on
  * retry — SURVEY.md §2.3). Spark-first re-expression:
  *
  *  - the Structured Streaming FILE SOURCE replaces the whole
  *    GCS→Pub/Sub→push-endpoint notification chain (S4/S5): Spark's
  *    directory listing discovers new blobs, the checkpoint records
  *    what's been processed;
  *  - file-source + checkpoint + file sink = end-to-end EXACTLY-ONCE,
  *    a strict upgrade over the reference (documented divergence);
  *  - `multiLine=true` because the reference lands each batch as one
  *    whole-payload JSON array blob (src/extract/main.py:47), not
  *    JSON-lines; Spark natively normalizes top-level-array → N rows
  *    and single-object → 1 row, the reference's S7 branch
  *    (src/load/main.py:39-51).
  */
object Load {

  /** Batch read of every landed blob, declared schema, no inference. */
  def readLanding(spark: SparkSession, landingDir: String): DataFrame =
    spark.read.schema(Schemas.postsSource)
      .option("multiLine", "true")
      .json(landingDir)

  /** One-shot batch load: landing → conform → append to the table.
    * Idempotence is the caller's concern in batch mode (the streaming
    * variant below is the exactly-once path). */
  def runBatch(spark: SparkSession, landingDir: String, tableDir: String,
               processedAt: Column = current_timestamp()): Unit =
    Transform.conform(readLanding(spark, landingDir), processedAt)
      .write.mode("append").parquet(tableDir)

  /** Incremental exactly-once load: every blob is processed once ever,
    * recorded in the checkpoint; re-runs (the reference's "manual
    * re-load job", SURVEY.md §2.1 O3) are safe no-ops. AvailableNow
    * drains all pending files then stops — swap the trigger for
    * ProcessingTime to run continuously. */
  def runStream(spark: SparkSession, landingDir: String, tableDir: String,
                checkpointDir: String): Unit = {
    val raw = spark.readStream
      .schema(Schemas.postsSource)
      .option("multiLine", "true")
      .json(landingDir)
    val q = Transform.conform(raw)
      .writeStream
      .format("parquet")
      .option("path", tableDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read the sink table back with the contract schema. */
  def table(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.schema(Schemas.postsTable).parquet(tableDir)

  /** Content fingerprint of the CONTRACT columns — processedAt is
    * deliberately excluded (each delivery stamps its own time; a
    * redelivery must still collide). JSON-encoding the struct keeps
    * nulls and field boundaries unambiguous where a separator-join
    * would collide ("a",NULL vs NULL,"a"). */
  private def contentFp: Column =
    org.apache.spark.sql.functions.md5(
      org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("userId"),
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("title"),
          org.apache.spark.sql.functions.col("body"))))

  /** Exactly-once load PLUS content-level dedup — the operator a
    * 6-hourly ingest pipeline actually runs. The checkpoint already
    * makes re-processing the SAME FILE a no-op, but the reference's
    * delivery chain can also redeliver the same content under a NEW
    * blob name (SURVEY.md §2.3 — retries re-upload, insert ids are
    * fresh); only content addressing catches that. Each micro-batch:
    * conform → fingerprint → in-batch dropDuplicates → anti-join
    * against the table's stored fingerprint column → append.
    *
    * The fingerprint is MATERIALIZED as a table column, so the probe
    * side of the anti-join is a single-column pruned scan — never a
    * recompute over the table's text. At 100 TB the table would also
    * be bucketed/partitioned by a fingerprint prefix so the anti-join
    * prunes to matching buckets; the contract read path is unchanged
    * ([[table]]'s declared schema projects the extra column away). */
  def runStreamDeduped(spark: SparkSession, landingDir: String, tableDir: String,
                       checkpointDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val raw = spark.readStream
      .schema(Schemas.postsSource)
      .option("multiLine", "true")
      .json(landingDir)
    val q = raw.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val incoming = Transform.conform(batch)
          .withColumn("fp", contentFp)
          .dropDuplicates("fp")
        val fresh =
          if (new java.io.File(tableDir).exists())
            incoming.join(spark.read.parquet(tableDir).select(col("fp")),
              Seq("fp"), "left_anti")
          else incoming
        fresh.write.mode("append").parquet(tableDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch load into a DATE-PARTITIONED table (`load_date=YYYY-MM-DD/`
    * directories). At 100 TB this is the difference between scanning
    * the table and scanning a day: any `load_date` predicate becomes a
    * PartitionFilter (directory pruning, zero data I/O for pruned
    * days) — asserted in PartitionedLoadSpec. The reference's
    * timestamped blob names (S2) encode the same intent; Hive-style
    * partitioning is its queryable form. */
  def runBatchPartitioned(spark: SparkSession, landingDir: String,
                          tableDir: String,
                          processedAt: Column = current_timestamp()): Unit = {
    import org.apache.spark.sql.functions.to_date
    Transform.conform(readLanding(spark, landingDir), processedAt)
      .withColumn("load_date", to_date(org.apache.spark.sql.functions.col("processedAt")))
      .write.mode("append")
      .partitionBy("load_date")
      .parquet(tableDir)
  }

  /** Read the partitioned table (schema grows the partition column). */
  def partitionedTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)

  /** Landing read with quarantine (SURVEY §1.4's deliberate upgrade
    * over the reference, which 500s and re-delivers forever on a
    * poison blob — §2.3 "no dead-letter queue"): PERMISSIVE parse
    * captures malformed payloads in `_corrupt_record`; returns
    * (good rows, quarantined raw payloads). The cache() is the
    * documented Spark requirement for predicates on the corrupt
    * column (the raw record exists only during parsing). */
  def readLandingQuarantined(spark: SparkSession,
                             landingDir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Schemas.postsSource.fields :+
      StructField("_corrupt_record", StringType))
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", "true")
      .json(landingDir)
      .cache()
    (raw.where(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.where(col("_corrupt_record").isNotNull).select(col("_corrupt_record")))
  }

  /** Compact a table directory: rewrite many small files (the
    * inevitable product of per-batch appends — the reference lands
    * one blob per 6-hour batch, a streaming sink lands one file per
    * micro-batch per partition) into `targetFiles` larger ones.
    * Small files are the classic silent killer at 100 TB: every file
    * costs a listing call, a task, and a footer read, so a year of
    * micro-batches can turn a table scan into a metadata storm.
    * Rewrite-to-temp + atomic swap keeps readers consistent. */
  def compact(spark: SparkSession, tableDir: String, targetFiles: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = tableDir + ".compacting"
    spark.read.schema(Schemas.postsTable).parquet(tableDir)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp)
    val old = tableDir + ".old"
    Files.move(Paths.get(tableDir), Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(tableDir), StandardCopyOption.ATOMIC_MOVE)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))
  }
}
