package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** MERGE schema evolution ([[TableLog.merge]] `evolve = true` —
  * Delta autoMerge shape): one atomic commit carries the upsert AND
  * the widened DDL; refusals for accidental drift, type conflicts,
  * dropped columns, and physical-name resurrection. */
class MergeEvolveSpec extends SparkSuite {

  private def freshTable(): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_mev_").toString + "/t"
    TableLog.create((0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"),
      t, "k", 2)
    t
  }

  test("evolve=true lands upserts + widened schema in ONE commit; " +
      "untouched files null-fill; time travel keeps the old era") {
    import spark.implicits._
    val t = freshTable()
    val changes = Seq((3L, "V3", 30L), (100L, "new", 99L))
      .toDF("k", "v", "score")
    TableLog.merge(spark, t, changes, numFiles = 2, evolve = true)
    assert(TableLog.latestVersion(t) == 2L, "must be one atomic commit")
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.contains((3L, "V3", 30L)) && got.contains((100L, "new", 99L)))
    assert(got.filter(x => x._1 != 3L && x._1 != 100L).forall(_._3 == -1L),
      "untouched rows must null-fill the evolved column")
    // pre-merge era still reads with the NARROW schema
    assert(!TableLog.snapshot(spark, t, 1L)
      .columns.contains("score"))
  }

  test("refusals: unknown column without evolve; type conflict; " +
      "omitted column; resurrection of a dropped physical name") {
    import spark.implicits._
    val t = freshTable()
    val drift = Seq((1L, "x", 5L)).toDF("k", "v", "score")
    val e1 = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t, drift, 1) // evolve not requested
    }
    assert(e1.getMessage.contains("evolve = true"))
    val e2 = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t,
        Seq((1L, 7L)).toDF("k", "v"), 1, evolve = true) // v: string vs long
    }
    assert(e2.getMessage.contains("type conflict"))
    val e3 = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t,
        Seq(Tuple1(1L)).toDF("k"), 1, evolve = true) // omits v
    }
    assert(e3.getMessage.contains("omit"))
    // a dropped column's physical name must not resurrect old bytes
    TableLog.dropColumn(t, "v")
    val e4 = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t, Seq((1L, "zombie")).toDF("k", "v"), 1,
        evolve = true)
    }
    assert(e4.getMessage.toLowerCase.contains("physical") ||
      e4.getMessage.contains("v"), e4.getMessage)
  }

  test("a defaulted column may be omitted from evolving changes and " +
      "fills per the write-default contract") {
    import spark.implicits._
    val t = freshTable()
    TableLog.evolveSchemaDefault(t, "flag",
      org.apache.spark.sql.types.LongType, "7")
    // changes omit `flag` (filled with 7) and evolve a NEW column
    TableLog.merge(spark, t,
      Seq((200L, "ins", 1L)).toDF("k", "v", "extra"), 1, evolve = true)
    val r = TableLog.snapshot(spark, t).where(col("k") === 200L)
      .select("flag", "extra").head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 1L)
  }
}
