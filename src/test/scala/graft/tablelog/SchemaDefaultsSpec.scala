package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite

/** Round-10 pins: ADD COLUMN … DEFAULT as a metadata-only commit
  * (old files answer the default at read on every scan path; new
  * writes materialize; time travel is era-exact) and metadata-only
  * TYPE WIDENING (INT→BIGINT, FLOAT→DOUBLE) through Spark's parquet
  * reader promotions, including on the vectorized path. */
class SchemaDefaultsSpec extends SparkSuite {

  private def freshDir(): String =
    Files.createTempDirectory("tlog_def_").toString + "/t"

  test("ADD COLUMN DEFAULT: zero data files move; old files answer " +
      "the default; explicit values and NULLs after it are stored; " +
      "time travel replays each era") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, "k", 1) // v1
    val v2 = TableLog.evolveSchemaDefault(t, "score", LongType, "7")     // v2
    assert(v2 == 2L)
    assert(TableLog.history(t).last.nAdds == 0, "metadata-only commit")
    // old files answer the default
    val got2 = TableLog.snapshot(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got2.toSeq == Seq((1L, 7L), (2L, 7L)))
    // new writes store explicit values — NULL included, never back-filled
    TableLog.append(Seq((3L, "c", java.lang.Long.valueOf(5L)),
      (4L, "d", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "v", "score"), t, 1)                                    // v3
    // and an append OMITTING the column materializes the default
    TableLog.append(Seq((5L, "e")).toDF("k", "v"), t, 1)                 // v4
    val got4 = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got4.toSeq == Seq((1L, 7L), (2L, 7L), (3L, 5L), (4L, -1L), (5L, 7L)))
    // time travel: the pre-declaration era has no score column at all
    assert(!TableLog.snapshot(spark, t, version = 1L)
      .columns.contains("score"))
    // the v4 checkpoint round-trips the defaults map
    assert(TableLog.state(t).defaults ==
      Map("score" -> (("7", 2L))))
    // refusals: NULL and non-evaluating defaults fail fast
    intercept[IllegalArgumentException] {
      TableLog.evolveSchemaDefault(t, "z", LongType, "NULL") }
    intercept[IllegalArgumentException] {
      TableLog.evolveSchemaDefault(t, "z", LongType, "no_such_col + 1") }
  }

  test("defaults resolve on the DV merge-on-read path and survive " +
      "restore and clone") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      t, "k", 1)                                                         // v1
    TableLog.evolveSchemaDefault(t, "score", LongType, "42")             // v2
    TableLog.deleteWhereDv(spark, t, col("k") === 2L)                    // v3
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 42L), (3L, 42L)),
      "DV'd files must still answer the default")
    // restore to v1: the default era unwinds with the schema
    TableLog.restore(t, 1L)                                              // v4
    assert(!TableLog.snapshot(spark, t).columns.contains("score"))
    // forward again and clone: the clone carries the defaults map
    TableLog.restore(t, 3L)                                              // v5
    val dst = freshDir()
    TableLog.shallowClone(t, dst)
    assert(TableLog.state(dst).defaults.contains("score"))
    assert(TableLog.snapshot(spark, dst).orderBy("k").collect()
      .map(_.getLong(2)).toSeq == Seq(42L, 42L))
  }

  test("widenColumn INT→BIGINT: metadata-only; mixed-width files read " +
      "widened on the vectorized scan; stats skipping survives") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(
      Seq((1L, 10), (2L, 20)).toDF("k", "x"), t, "k", 1)                 // v1
    val v2 = TableLog.widenColumn(t, "x", LongType)                      // v2
    assert(v2 == 2L && TableLog.history(t).last.nAdds == 0)
    assert(StructType.fromDDL(TableLog.state(t).schemaDdl)("x").dataType
      == LongType)
    // post-widening appends write BIGINT; the mixed set reads as one
    TableLog.append(Seq((3L, 3000000000L)).toDF("k", "x"), t, 1)         // v3
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 3000000000L)))
    // the scan is the VECTORIZED parquet path (no row-based fallback)
    val plan = TableLog.snapshot(spark, t).queryExecution.executedPlan
    assert(plan.toString.contains("Scan parquet"),
      s"expected a parquet scan, got:\n$plan")
    // both widths share the 'l' stats domain: a range predicate on x
    // still file-skips via the recorded column stats
    val snap = TableLog.state(t)
    assert(snap.active.forall(_.cols.exists(c => c.col == "x" && c.typ == 'l')))
    // refusals: non-widening retype, key column
    intercept[IllegalArgumentException] {
      TableLog.widenColumn(t, "x", IntegerType) }
    intercept[IllegalArgumentException] {
      TableLog.widenColumn(t, "k", LongType) }
  }

  test("SQL surface: ALTER TABLE ADD COLUMN … DEFAULT and ALTER " +
      "COLUMN … TYPE BIGINT; INSERT column lists fill the default") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshDir()
    spark.sql(s"CREATE TABLE graftlog.`$t` (k BIGINT, x INT) " +
      "TBLPROPERTIES ('key' = 'k')")
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (1, 10), (2, 20)")
    spark.sql(s"ALTER TABLE graftlog.`$t` ADD COLUMN tier STRING " +
      "DEFAULT 'bronze'")
    spark.sql(s"ALTER TABLE graftlog.`$t` ALTER COLUMN x TYPE BIGINT")
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (3, 3000000000, 'gold')")
    // INSERT with a column list omitting the defaulted column fills it
    spark.sql(s"INSERT INTO graftlog.`$t` (k, x) VALUES (4, 40)")
    val got = spark.sql(
      s"SELECT k, x, tier FROM graftlog.`$t` ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 10L, "bronze"), (2L, 20L, "bronze"),
      (3L, 3000000000L, "gold"), (4L, 40L, "bronze")))
    // era-exact history: v1..v2 era (pre-default) reads no tier column
    assert(!spark.sql(s"SELECT * FROM graftlog.`$t` VERSION AS OF 2")
      .columns.contains("tier"))
    // CREATE-time defaults refuse loudly rather than silently drop
    val err = intercept[Exception] {
      spark.sql(s"CREATE TABLE graftlog.`${freshDir()}` " +
        "(k BIGINT, y INT DEFAULT 5) TBLPROPERTIES ('key' = 'k')") }
    assert(err.getMessage.contains("DEFAULT"))
  }

  test("widenColumn FLOAT→DOUBLE: narrow float bytes read widened; " +
      "post-widening appends store DOUBLE") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(Seq((1L, 1.5f), (2L, 2.5f)).toDF("k", "x"), t, "k", 1)
    TableLog.widenColumn(t, "x", DoubleType)
    TableLog.append(Seq((3L, 3.25)).toDF("k", "x"), t, 1)
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.5), (2L, 2.5), (3L, 3.25)))
  }

  test("defaults track renames, die with drops, and refuse " +
      "non-deterministic expressions") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(Seq((1L, "a")).toDF("k", "v"), t, "k", 1)
    TableLog.evolveSchemaDefault(t, "bonus", LongType, "7")
    // rename: the default follows the NEW name on read and write
    TableLog.renameColumn(t, "bonus", "bonus2")
    assert(TableLog.state(t).defaults.keySet == Set("bonus2"))
    assert(TableLog.snapshot(spark, t).select("bonus2")
      .collect().head.getLong(0) == 7L)
    TableLog.append(Seq((2L, "b")).toDF("k", "v"), t, 1) // omits bonus2
    assert(TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(_.getLong(2)).toSeq == Seq(7L, 7L))
    // drop: the default dies and a later plain re-add reads NULL,
    // never the stale 7
    TableLog.dropColumn(t, "bonus2")
    assert(TableLog.state(t).defaults.isEmpty)
    TableLog.evolveSchema(t, StructType(Seq(
      StructField("bonus3", LongType))))
    assert(TableLog.snapshot(spark, t).collect()
      .forall(_.isNullAt(2)), "a dropped default resurrected")
    // non-deterministic defaults refuse at declaration
    val err = intercept[IllegalArgumentException] {
      TableLog.evolveSchemaDefault(t, "r", DoubleType, "rand()")
    }
    assert(err.getMessage.contains("non-deterministic"))
  }
}
