package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.tablelog.TableLog

/** Persistent-view lifecycle over the graftlog catalog
  * ([[GraftViewRule]]): create / read / replace / drop, the stored
  * text tracking the base table's CURRENT snapshot (the BigQuery
  * logical-view posture), pushdown THROUGH the view, and the
  * refusals (DML through a view, shadowing a table, duplicate
  * create, missing drop). */
class GraftLogViewSpec extends SparkSuite {

  private def freshTable(): String = {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("graft_view_").toString + "/t"
    TableLog.create(
      (1L to 8L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "x"),
      t, "k", 2)
    t
  }

  test("create / read / replace / drop lifecycle; base-table commits " +
      "are visible through the view") {
    val t = freshTable()
    val v = Paths.get(t).getParent.toString + "/v_small"
    spark.sql(s"CREATE VIEW graftlog.`$v` AS " +
      s"SELECT k, x FROM graftlog.`$t` WHERE k <= 3")
    assert(spark.sql(s"SELECT sum(x) FROM graftlog.`$v`")
      .head().getLong(0) == 60L)
    // a base-table append is visible on the NEXT read — logical view
    import spark.implicits._
    TableLog.append(Seq((2L, "s2b", 100L)).toDF("k", "s", "x"), t, 1)
    assert(spark.sql(s"SELECT sum(x) FROM graftlog.`$v`")
      .head().getLong(0) == 160L)
    // CREATE without OR REPLACE refuses; IF NOT EXISTS no-ops
    intercept[Exception] {
      spark.sql(s"CREATE VIEW graftlog.`$v` AS SELECT 1 AS one")
    }
    spark.sql(s"CREATE VIEW IF NOT EXISTS graftlog.`$v` AS SELECT 1 AS one")
    assert(spark.sql(s"SELECT sum(x) FROM graftlog.`$v`")
      .head().getLong(0) == 160L, "IF NOT EXISTS must not replace")
    // OR REPLACE swaps the definition atomically
    spark.sql(s"CREATE OR REPLACE VIEW graftlog.`$v` AS " +
      s"SELECT k FROM graftlog.`$t` WHERE k > 6")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$v`")
      .head().getLong(0) == 2L)
    spark.sql(s"DROP VIEW graftlog.`$v`")
    intercept[Exception] { spark.sql(s"SELECT * FROM graftlog.`$v`") }
    intercept[IllegalArgumentException] {
      spark.sql(s"DROP VIEW graftlog.`$v`")
    }
    spark.sql(s"DROP VIEW IF EXISTS graftlog.`$v`") // no-op, no throw
  }

  test("a view is read-only, validates at CREATE, and cannot shadow " +
      "a table; views of views compose; filters push through") {
    val t = freshTable()
    val dir = Paths.get(t).getParent.toString
    // bad SQL fails at CREATE (missing table), not first read
    intercept[Exception] {
      spark.sql(s"CREATE VIEW graftlog.`$dir/bad` AS " +
        s"SELECT * FROM graftlog.`$dir/no_such_table`")
    }
    assert(!Files.exists(Paths.get(dir, "_views", "bad.sql")))
    // shadowing an existing TABLE refuses
    val ex = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE VIEW graftlog.`$t` AS SELECT 1 AS one")
    }
    assert(ex.getMessage.contains("shadow"))
    spark.sql(s"CREATE VIEW graftlog.`$dir/v1` AS " +
      s"SELECT k, x FROM graftlog.`$t` WHERE k <= 5")
    // DML through the view refuses loudly
    intercept[UnsupportedOperationException] {
      spark.sql(s"INSERT INTO graftlog.`$dir/v1` VALUES (9, 90)")
    }
    intercept[UnsupportedOperationException] {
      spark.sql(s"DELETE FROM graftlog.`$dir/v1` WHERE k = 1")
    }
    // a view OVER a view expands to fixed point
    spark.sql(s"CREATE VIEW graftlog.`$dir/v2` AS " +
      s"SELECT k FROM graftlog.`$dir/v1` WHERE k >= 4")
    assert(spark.sql(s"SELECT * FROM graftlog.`$dir/v2`").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
    // pushdown THROUGH the view reaches the base scan: the plan holds
    // one graftlog scan and no barrier between filter and scan
    val plan = spark.sql(
      s"SELECT k FROM graftlog.`$dir/v1` WHERE x = 30").queryExecution
      .executedPlan.toString
    assert(plan.contains("graftlog"), s"view read lost the DSv2 scan:\n$plan")
    // SHOW VIEWS enumerates the sidecar dir
    val shown = spark.sql(s"SHOW VIEWS IN graftlog.`$dir`").collect()
      .map(_.getString(1)).toSeq
    assert(shown == Seq("v1", "v2"), s"SHOW VIEWS listed $shown")
  }

  test("ALTER VIEW … AS swaps the definition atomically with " +
      "validate-now; SHOW CREATE TABLE replays runnable DDL") {
    val t = freshTable()
    val v = Paths.get(t).getParent.toString + "/v_alter"
    spark.sql(s"CREATE VIEW graftlog.`$v` AS " +
      s"SELECT k, x FROM graftlog.`$t` WHERE k <= 2")
    assert(spark.sql(s"SELECT sum(x) FROM graftlog.`$v`")
      .head().getLong(0) == 30L)
    spark.sql(s"ALTER VIEW graftlog.`$v` AS " +
      s"SELECT k, x FROM graftlog.`$t` WHERE k >= 7")
    assert(spark.sql(s"SELECT sum(x) FROM graftlog.`$v`")
      .head().getLong(0) == 150L, "ALTER VIEW must swap the definition")
    // validate-now: a bad new text refuses and the OLD definition holds
    intercept[Exception] {
      spark.sql(s"ALTER VIEW graftlog.`$v` AS SELECT nope FROM missing")
    }
    assert(spark.sql(s"SELECT sum(x) FROM graftlog.`$v`")
      .head().getLong(0) == 150L, "a refused ALTER must keep the old text")
    // a missing view refuses; a TABLE name refuses as not-a-view
    intercept[IllegalArgumentException] {
      spark.sql(s"ALTER VIEW graftlog.`$v-nope` AS SELECT 1 AS one")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"ALTER VIEW graftlog.`$t` AS SELECT 1 AS one")
    }
    // SHOW CREATE TABLE on the view replays runnable DDL
    val ddl = spark.sql(s"SHOW CREATE TABLE graftlog.`$v`")
      .head().getString(0)
    assert(ddl.startsWith("CREATE VIEW") && ddl.contains("k >= 7"),
      s"SHOW CREATE must replay the stored definition, got:\n$ddl")
    spark.sql(s"DROP VIEW graftlog.`$v`")
  }

  test("a definition cycle closed by CREATE OR REPLACE fails with a " +
      "clear cycle error, not a StackOverflowError") {
    val t = freshTable()
    val dir = Paths.get(t).getParent.toString
    // v1 → base, then v2 → v1: both analyze fine at create time
    spark.sql(s"CREATE VIEW graftlog.`$dir/cva` AS " +
      s"SELECT k FROM graftlog.`$t`")
    spark.sql(s"CREATE VIEW graftlog.`$dir/cvb` AS " +
      s"SELECT k FROM graftlog.`$dir/cva`")
    // the REPLACE analyzes against the OLD on-disk cva (→ base), then
    // the atomic write closes the loop cva → cvb → cva
    spark.sql(s"CREATE OR REPLACE VIEW graftlog.`$dir/cva` AS " +
      s"SELECT k FROM graftlog.`$dir/cvb`")
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graftlog.`$dir/cva`").collect()
    }
    def messages(e: Throwable): Seq[String] =
      if (e == null) Nil
      else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(ex).exists(_.contains("cycle")),
      s"expected a cycle error, got: $ex")
  }
}
