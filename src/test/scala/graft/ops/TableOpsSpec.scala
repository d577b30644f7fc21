package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.tablelog.TableLog

class TableOpsSpec extends SparkSuite {

  test("q354 MV fold: planted history incl. a group retracted to zero") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_mv_").toString
    def rows(xs: (Long, String, Double)*) = xs.toDF("k", "status", "price")
    TableLog.create(
      rows((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 5.0)), t, "k", 1)
    TableLog.append(rows((4L, "B", 7.0), (5L, "B", 8.0)), t, 1)
    TableLog.deleteWhere(spark, t, col("status") === "B", 1)
    TableLog.compact(spark, t, 1)
    val got = TableOps.mvTrajectoryOf(spark, t, "status", "price")
      .orderBy("version", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "A", 2L, 30.0), (1L, "B", 1L, 5.0),
      (2L, "A", 2L, 30.0), (2L, "B", 3L, 20.0),
      // v3 deletes every B row: the group leaves the view entirely
      (3L, "A", 2L, 30.0),
      // v4 compaction is a no-op refresh: view unchanged
      (4L, "A", 2L, 30.0)))
  }

  test("q355 replaceWhere: atomic slice swap, contract check, time travel") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_rw_").toString
    def rows(xs: (Long, String, Double)*) = xs.toDF("k", "status", "price")
    TableLog.create(
      rows((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 5.0)), t, "k", 1)
    // incoming rows outside the slice are rejected up front
    val bad = rows((7L, "F", 1.0))
    val e = intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("status") === "O", bad, 1)
    }
    assert(e.getMessage.contains("do not satisfy"))
    assert(TableLog.latestVersion(t) == 1L, "failed replace must not commit")
    // the real restatement: O slice shrinks from 2 rows to 1, atomically
    TableLog.replaceWhere(spark, t, col("status") === "O",
      rows((9L, "O", 99.0)), 1)
    val now = TableLog.snapshot(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(now == Set((2L, "F", 20.0), (9L, "O", 99.0)))
    // the pre-restatement slice is still readable at v1
    assert(TableLog.snapshot(spark, t, 1L).count() == 3)
    assert(TableLog.history(t).last.op == "replace")
  }

  test("q354 MV fold: update-shaped CDC moves mass between groups exactly") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_mvc_").toString
    def rows(xs: (Long, String, Double)*) = xs.toDF("k", "status", "price")
    TableLog.create(
      rows((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 5.0)), t, "k", 1)
    // CDC batch: move key 2 from A to B with a new price, delete key 3,
    // insert key 9 into A — one atomic commit, three action kinds
    val changes = Seq(
      (2L, "B", 99.0, "update"), (3L, "B", 5.0, "delete"),
      (9L, "A", 1.0, "insert")).toDF("k", "status", "price", "action")
    TableLog.applyCdc(spark, t, changes, 1)
    val got = TableOps.mvTrajectoryOf(spark, t, "status", "price")
      .orderBy("version", "grp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "A", 2L, 30.0), (1L, "B", 1L, 5.0),
      (2L, "A", 2L, 11.0), (2L, "B", 1L, 99.0)))
  }

  test("q389 advisor: bounds bracket exact rows; narrow beats full on skips") {
    val rows = TableOps.q389SkippingAdvisor(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 3)
    rows.foreach { case (c, total, scanned, bound, exact, skip) =>
      assert(scanned <= total)
      // manifest bound can only over-count what the scan will keep
      assert(exact <= bound, s"$c: exact $exact > bound $bound")
      assert(skip == 1000000L * (total - scanned) / total)
    }
    val narrow = rows.find(_._1 == "p1_narrow").get
    val full = rows.find(_._1 == "p3_full").get
    // narrow range skips most files; the full range skips none
    assert(narrow._6 > 0L, s"narrow skipped nothing: $narrow")
    assert(full._3 == full._2 && full._6 == 0L)
    // full-range exact equals the whole table
    assert(full._5 == graft.Tables.orders(spark, sf0001).count())
  }
}
