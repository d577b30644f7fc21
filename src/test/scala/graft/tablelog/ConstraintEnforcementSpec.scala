package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Round-10 ADVICE pins: CHECK constraints are enforced on EVERY
  * write path, not only Spark's catalog rule — the direct TableLog
  * API and the DSv2 provider batch sink validate the batch before
  * their manifest commit, so the ENFORCED flag in the table metadata
  * is honest; and the streaming sink's autoCompact option fails fast
  * at write-build time, not after an epoch already committed. */
class ConstraintEnforcementSpec extends SparkSuite {

  private def freshDir(): String =
    Files.createTempDirectory("tlog_ck_").toString + "/t"

  private def mkConstrained(): String = {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price"), t, "k", 1)
    TableLog.setProps(t, Map("constraint.price_pos" -> "price > 0.0"))
    t
  }

  test("direct-API append/merge/cdc validate CHECK constraints: a " +
      "violating batch throws and no version moves") {
    import spark.implicits._
    val t = mkConstrained()
    val v0 = TableLog.latestVersion(t)
    val bad = Seq((3L, -5.0)).toDF("k", "price")
    val errA = intercept[IllegalArgumentException] {
      TableLog.append(bad, t, 1)
    }
    assert(errA.getMessage.contains("price_pos"))
    val errM = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t, bad, 1)
    }
    assert(errM.getMessage.contains("CHECK"))
    val errC = intercept[IllegalArgumentException] {
      TableLog.applyCdc(spark, t,
        Seq((3L, -5.0, "insert")).toDF("k", "price", "action"), 1)
    }
    assert(errC.getMessage.contains("price_pos"))
    assert(TableLog.latestVersion(t) == v0, "a violating write moved the log")
    // NULL passes (SQL CHECK semantics), valid rows pass
    TableLog.append(Seq((4L, java.lang.Double.valueOf(5.0)),
      (5L, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "price"), t, 1)
    assert(TableLog.snapshot(spark, t).count() == 4)
    // a CDC delete of existing rows never trips the value check
    TableLog.applyCdc(spark, t,
      Seq((1L, null.asInstanceOf[java.lang.Double], "delete"))
        .toDF("k", "price", "action"), 1)
    assert(TableLog.snapshot(spark, t).count() == 3)
  }

  test("provider-path batch append validates staged files at commit: " +
      "violating batch fails whole, rows never land") {
    import spark.implicits._
    val t = mkConstrained()
    val v0 = TableLog.latestVersion(t)
    val err = intercept[Exception] {
      Seq((6L, -1.0), (7L, 3.0)).toDF("k", "price")
        .write.format("graft.sources.GraftLogStreamProvider")
        .mode("append").option("path", t).save()
    }
    assert(err.getMessage != null)
    assert(TableLog.latestVersion(t) == v0)
    assert(TableLog.snapshot(spark, t).count() == 2)
    // Spark aborts the failed write, which deletes the staged files
    // outright — whatever survives an interrupted abort is vacuumable
    TableLog.vacuum(t, graceMillis = 0L)
    assert(TableLog.snapshot(spark, t).count() == 2)
    // and a clean provider-path batch still lands
    Seq((8L, 4.0)).toDF("k", "price")
      .write.format("graft.sources.GraftLogStreamProvider")
      .mode("append").option("path", t).save()
    assert(TableLog.snapshot(spark, t).count() == 3)
  }

  test("streaming sink autoCompact validates at write-build time, " +
      "before any micro-batch runs") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(Seq((1L, "a")).toDF("k", "v"), t, "k", 1)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("rate")
        .option("rowsPerSecond", "1").load()
        .select(col("value").as("k"), lit("b").as("v"))
        .writeStream
        .format("graft.sources.GraftLogStreamProvider")
        .option("path", t)
        .option("autoCompact", "1")
        .option("checkpointLocation",
          Files.createTempDirectory("ck_").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(err.getMessage.contains("autoCompact"))
    // the bad option failed the query BEFORE any epoch committed
    assert(TableLog.snapshot(spark, t).count() == 1)
  }
}
