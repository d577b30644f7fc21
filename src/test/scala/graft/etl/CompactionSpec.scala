package graft.etl

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSuite {

  test("compaction collapses per-batch small files without changing table contents") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val table = s"$root/table"
    // simulate 10 micro-batch appends → ≥10 small files
    (1 to 10).foreach { i =>
      val landing = s"$root/landing$i"
      Extract.land(() => s"""[{"userId":$i,"id":$i,"title":"t$i","body":"b$i"}]""",
        landing, java.time.Instant.parse(f"2024-03-01T00:00:${i % 60}%02dZ"))
      Load.runBatch(spark, landing, table, to_timestamp(lit("2024-03-01 00:00:00")))
    }
    def parquetFiles = new java.io.File(table).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = Load.table(spark, table).orderBy("id").collect()
    assert(parquetFiles >= 10)

    Load.compact(spark, table, targetFiles = 2)

    assert(parquetFiles <= 2)
    val after = Load.table(spark, table).orderBy("id").collect()
    assert(after.toSeq == before.toSeq) // byte-identical rows, fewer files
  }

  test("streaming load via foreachBatch upsert is idempotent under redelivery") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val landing = s"$root/landing"
    Extract.land(() => """[{"userId":1,"id":1,"title":"a","body":"x"},
                          {"userId":1,"id":2,"title":"b","body":"y"}]""",
      landing, java.time.Instant.parse("2024-03-01T00:00:00Z"))
    val table = s"$root/table"
    // foreachBatch sink with id-keyed dedup against the existing table:
    // replays of the same batch (the reference's at-least-once world)
    // cannot double-insert.
    def runOnce(checkpoint: String): Unit = {
      val raw = spark.readStream.schema(Schemas.postsSource)
        .option("multiLine", "true").json(landing)
      val q = Transform.conform(raw, to_timestamp(lit("2024-03-01 00:00:00")))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val existing =
            if (new java.io.File(table).exists())
              Load.table(spark, table).select("id")
            else spark.emptyDataFrame.withColumn("id", lit(0L)).limit(0)
          batch.join(existing, Seq("id"), "left_anti")
            .write.mode("append").parquet(table)
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce(s"$root/cp1")
    runOnce(s"$root/cp2") // fresh checkpoint = full redelivery of the same file
    assert(Load.table(spark, table).count() == 2) // not 4: upsert held
  }
}
