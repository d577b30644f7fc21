package graft.etl

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PartitionedLoadSpec extends SparkSuite {

  test("date-partitioned load: pruning engages, only the queried day is scanned") {
    val root = java.nio.file.Files.createTempDirectory("graft_part").toString
    val landing = s"$root/landing"
    val table = s"$root/table"
    // two batches landed and loaded under different processing days
    Extract.land(() => """[{"userId":1,"id":1,"title":"a","body":"x"}]""", landing,
      java.time.Instant.parse("2024-03-01T10:00:00Z"))
    Load.runBatchPartitioned(spark, landing, table,
      to_timestamp(lit("2024-03-01 10:00:00")))
    val landing2 = s"$root/landing2"
    Extract.land(() => """[{"userId":2,"id":2,"title":"b","body":"y"}]""", landing2,
      java.time.Instant.parse("2024-03-02T10:00:00Z"))
    Load.runBatchPartitioned(spark, landing2, table,
      to_timestamp(lit("2024-03-02 10:00:00")))

    // layout: Hive-style load_date= directories
    val dirs = new java.io.File(table).listFiles().map(_.getName).filter(_.startsWith("load_date="))
    assert(dirs.toSet == Set("load_date=2024-03-01", "load_date=2024-03-02"))

    val day1 = Load.partitionedTable(spark, table)
      .where(col("load_date") === "2024-03-01")
    assert(day1.count() == 1)
    assert(day1.head().getAs[Long]("id") == 1L)
    // the predicate must be a PartitionFilter (directory pruning),
    // never a data filter
    val plan = day1.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(load_date"), plan.take(400))
  }
}
