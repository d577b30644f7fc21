package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.tablelog.TableLog

/** Warehouse-rooted NAMED addressing (q437's machinery): with the
  * catalog's `warehouse` option set, identifiers resolve
  * BigQuery-style (`catalog.dataset.table` → `<root>/dataset/table`),
  * `SHOW NAMESPACES` / `SHOW TABLES` enumerate the tree, and every
  * existing surface (CTAS, DML, #history/#partitions, time travel)
  * works by name. Path addressing keeps working under the same
  * catalog instance. */
class GraftLogWarehouseSpec extends SparkSuite {

  private def freshWarehouse(): String = {
    val root = Files.createTempDirectory("tlog_wh_").toString
    spark.conf.set("spark.sql.catalog.graftwh",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.graftwh.warehouse", root)
    root
  }

  test("dataset.table naming end to end: CREATE NAMESPACE, CTAS by " +
      "name, SHOW TABLES/NAMESPACES, metadata suffix, time travel") {
    val root = freshWarehouse()
    spark.sql("CREATE NAMESPACE graftwh.sales")
    import spark.implicits._
    (0L to 49L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("wh_src")
    spark.sql(
      """CREATE TABLE graftwh.sales.t TBLPROPERTIES ('key' = 'k')
        |AS SELECT * FROM wh_src""".stripMargin)
    // resolves to <root>/sales/t on disk
    assert(TableLog.latestVersion(s"$root/sales/t") >= 1L)
    assert(spark.sql("SELECT count(*) FROM graftwh.sales.t")
      .collect().head.getLong(0) == 50L)
    // INSERT by name appends a version; v-era reads by name
    spark.sql("INSERT INTO graftwh.sales.t SELECT k + 100, v FROM wh_src")
    assert(spark.sql("SELECT count(*) FROM graftwh.sales.t")
      .collect().head.getLong(0) == 100L)
    assert(spark.sql(
      "SELECT count(*) FROM graftwh.sales.t VERSION AS OF 2")
      .collect().head.getLong(0) == 50L)
    // enumeration
    assert(spark.sql("SHOW NAMESPACES IN graftwh")
      .collect().map(_.getString(0)).toSeq == Seq("sales"))
    assert(spark.sql("SHOW TABLES IN graftwh.sales")
      .collect().map(_.getString(1)).toSeq == Seq("t"))
    // metadata table by name
    val hist = spark.sql("SELECT version, op FROM graftwh.sales.`t#history`")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist.map(_._2).take(2) == Seq("create", "append"))
    // absolute paths still address through the SAME catalog
    val p = Files.createTempDirectory("tlog_wh_abs_").toString
    TableLog.create((0L to 9L).toDF("k"), p, "k", numFiles = 1)
    assert(spark.sql(s"SELECT count(*) FROM graftwh.`$p`")
      .collect().head.getLong(0) == 10L)
    // two-level namespaces refuse (the BigQuery dataset shape)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graftwh.a.b.c").collect())
    assert(e.getMessage.toLowerCase.contains("not") ||
      e.getMessage.toLowerCase.contains("found"), e.getMessage)
  }

  test("streaming by name: readStream.table chains into " +
      "writeStream.toTable with exactly-once incremental batches") {
    val root = Files.createTempDirectory("tlog_whs_").toString
    spark.conf.set("spark.sql.catalog.graftwh_s",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.graftwh_s.warehouse", root)
    spark.sql("CREATE NAMESPACE graftwh_s.feed")
    spark.sql("CREATE TABLE graftwh_s.feed.src (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql("CREATE TABLE graftwh_s.feed.dst (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    import spark.implicits._
    (0L to 49L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("whs_src")
    spark.sql("INSERT INTO graftwh_s.feed.src SELECT * FROM whs_src")
    val cp = s"$root/_cp"
    def chainOnce(): Unit = {
      val q = spark.readStream.table("graftwh_s.feed.src")
        .writeStream
        .option("checkpointLocation", cp)
        .option("txnAppId", "wh-chain")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graftwh_s.feed.dst")
      q.awaitTermination()
    }
    chainOnce()
    assert(spark.sql("SELECT count(*) FROM graftwh_s.feed.dst")
      .collect().head.getLong(0) == 50L)
    // re-run from the same checkpoint: nothing new, nothing duplicated
    chainOnce()
    assert(spark.sql("SELECT count(*) FROM graftwh_s.feed.dst")
      .collect().head.getLong(0) == 50L)
    // a fresh append flows through incrementally — only the delta moves
    spark.sql(
      "INSERT INTO graftwh_s.feed.src SELECT k + 100, v FROM whs_src")
    chainOnce()
    val got = spark.sql(
      "SELECT count(*), sum(k) FROM graftwh_s.feed.dst").collect().head
    assert(got.getLong(0) == 100L)
    assert(got.getLong(1) == (0L to 49L).sum + (100L to 149L).sum)
    // complete-mode streaming writes refuse (append-only sink)
    val agg = spark.readStream.table("graftwh_s.feed.src")
      .groupBy($"v").count()
    val e = intercept[Exception] {
      val q = agg.writeStream
        .outputMode("complete")
        .option("checkpointLocation", s"$root/_cp2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graftwh_s.feed.dst2")
      q.awaitTermination()
    }
    assert(e.getMessage.contains("append-mode only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-mode only")),
      e.toString.take(300))
  }
}
