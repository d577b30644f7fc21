package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Generated columns ([[TableLog.genColsOf]], Delta GENERATED ALWAYS
  * AS shape): compute-on-omit, audit-on-supply, declaration rules. */
class GeneratedColumnsSpec extends SparkSuite {

  private def freshTable(): String = {
    spark.version // force the shared session (declaration probes need it)
    val t = Files.createTempDirectory("tlog_gen_").toString + "/t"
    TableLog.createEmpty(t, "k BIGINT, x BIGINT, band STRING", "k",
      props = Map("gencol.band" ->
        "CASE WHEN x >= 10 THEN 'hi' ELSE 'lo' END"))
    t
  }

  test("omitted generated column computes and MATERIALIZES; supplied " +
      "correct values land; wrong values refuse on every write path") {
    import spark.implicits._
    val t = freshTable()
    TableLog.append(Seq((1L, 5L), (2L, 20L)).toDF("k", "x"), t, 1)
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq == Seq((1L, "lo"), (2L, "hi")))
    // the value is physically in the file (not a read-time fiction):
    // a raw parquet read without the table schema still sees it
    val raw = spark.read.parquet(s"$t/data/*").select("band")
      .collect().map(_.getString(0)).sorted
    assert(raw.toSeq == Seq("hi", "lo"))
    // correct explicit values pass the audit
    TableLog.append(Seq((3L, 50L, "hi")).toDF("k", "x", "band"), t, 1)
    // wrong explicit values refuse — append, merge and replaceWhere
    val bad = Seq((4L, 1L, "hi")).toDF("k", "x", "band")
    val e1 = intercept[IllegalArgumentException] {
      TableLog.append(bad, t, 1)
    }
    assert(e1.getMessage.contains("band_generated"))
    intercept[IllegalArgumentException] {
      TableLog.merge(spark, t, bad, 1)
    }
    intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("k") === 4L, bad, 1)
    }
    // merge with omitted gencol computes it (fill precedes the audit)
    TableLog.merge(spark, t, Seq((2L, 3L)).toDF("k", "x"), 1)
    val r2 = TableLog.snapshot(spark, t).where(col("k") === 2L).head()
    assert(r2.getLong(1) == 3L && r2.getString(2) == "lo",
      "merge must recompute the generated column for the new row image")
  }

  test("declaration rules: unknown column, key column, bad SQL and " +
      "nondeterministic expressions refuse at CREATE; SET " +
      "TBLPROPERTIES refuses NEW generated columns") {
    spark.version // force the shared session (declaration probes need it)
    def tryCreate(props: Map[String, String]): Exception =
      intercept[Exception] {
        TableLog.createEmpty(
          Files.createTempDirectory("tlog_genr_").toString + "/t",
          "k BIGINT, x BIGINT, band STRING", "k", props = props)
      }
    assert(tryCreate(Map("gencol.nope" -> "x + 1"))
      .getMessage.contains("no such column"))
    assert(tryCreate(Map("gencol.k" -> "x + 1"))
      .getMessage.contains("key column"))
    tryCreate(Map("gencol.band" -> "not_a_col + 1")) // analysis error
    assert(tryCreate(Map("gencol.band" -> "cast(rand() as string)"))
      .getMessage.contains("deterministic"))
    val t = freshTable()
    val e = intercept[IllegalArgumentException] {
      TableLog.setProps(t, TableLog.state(t).props +
        ("gencol.x" -> "k * 2"))
    }
    assert(e.getMessage.contains("declared at CREATE"))
    // re-setting UNCHANGED props (the branch/publish flow) still works
    TableLog.setProps(t, TableLog.state(t).props + ("owner" -> "me"))
    // a generation expression referencing ANOTHER generated column
    // would fold in declaration order, not dependency order — refuse
    intercept[Exception] {
      TableLog.createEmpty(
        Files.createTempDirectory("tlog_genr_").toString + "/t",
        "k BIGINT, a STRING, b STRING", "k",
        props = Map("gencol.a" -> "concat(b, '!')",
          "gencol.b" -> "cast(k as string)"))
    }
    // dropping/renaming the generated column (or a column its
    // expression reads) refuses instead of wedging future writes
    intercept[IllegalArgumentException] { TableLog.dropColumn(t, "band") }
    intercept[IllegalArgumentException] { TableLog.dropColumn(t, "x") }
    intercept[IllegalArgumentException] {
      TableLog.renameColumn(t, "x", "x2")
    }
  }

  test("the synthetic audit reaches catalog SQL DML: an UPDATE that " +
      "contradicts the generation expression refuses") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable()
    TableLog.append(Seq((1L, 5L), (2L, 20L)).toDF("k", "x"), t, 1)
    // UPDATE that sets the generated column to a contradicting value
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graftlog.`$t` SET band = 'hi' WHERE k = 1")
    }
    assert(e.getMessage.contains("band_generated") ||
      e.getMessage.toLowerCase.contains("check"), e.getMessage)
    // an UPDATE that keeps the pair consistent lands
    spark.sql(s"UPDATE graftlog.`$t` SET x = 50, band = 'hi' WHERE k = 1")
    val r = TableLog.snapshot(spark, t).where(col("k") === 1L).head()
    assert(r.getLong(1) == 50L && r.getString(2) == "hi")
  }

  test("SQL UPDATE recomputes an omitted generated column from the " +
      "NEW source values — including self-referential assignments") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable()
    TableLog.append(Seq((1L, 5L), (2L, 20L)).toDF("k", "x"), t, 1)
    // plain source-column update: band recomputes (previously the
    // audit refused any x update that omitted band)
    spark.sql(s"UPDATE graftlog.`$t` SET x = 50 WHERE k = 1")
    var r = TableLog.snapshot(spark, t).where(col("k") === 1L).head()
    assert(r.getLong(1) == 50L && r.getString(2) == "hi", r.toString)
    // self-referential: band's injected expression must see the NEW x
    // (old x = 50 → new x = 5 → 'lo'; unsubstituted it would keep 'hi')
    spark.sql(s"UPDATE graftlog.`$t` SET x = x - 45 WHERE k = 1")
    r = TableLog.snapshot(spark, t).where(col("k") === 1L).head()
    assert(r.getLong(1) == 5L && r.getString(2) == "lo", r.toString)
    // untouched rows keep their pair; explicit wrong values still refuse
    assert(TableLog.snapshot(spark, t).where(col("k") === 2L)
      .head().getString(2) == "hi")
    intercept[Exception] {
      spark.sql(s"UPDATE graftlog.`$t` SET x = 1, band = 'hi' WHERE k = 2")
    }
  }

  test("a table cannot be created under an existing view's name — " +
      "reads would silently resolve the view") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val base = Files.createTempDirectory("tlog_genv_").toString
    val t0 = base + "/real"
    TableLog.create(Seq((1L, "a")).toDF("k", "v"), t0, "k", 1)
    spark.sql(s"CREATE VIEW graftlog.`$base/shadow` AS " +
      s"SELECT k FROM graftlog.`$t0`")
    val e = intercept[IllegalArgumentException] {
      TableLog.create(Seq((9L, "z")).toDF("k", "v"),
        base + "/shadow", "k", 1)
    }
    assert(e.getMessage.contains("VIEW"), e.getMessage)
  }

  test("SQL INSERT INTO computes an omitted generated column and " +
      "audits a supplied one — the statement path matches the API") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable()
    // column-list form omitting the gencol → computed on the write
    spark.sql(s"INSERT INTO graftlog.`$t` (k, x) VALUES (1, 5), (2, 20)")
    // positional reduced form (non-generated columns in order)
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (3, 40)")
    // full-width positional with a CORRECT supplied value → audited, lands
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (4, 2, 'lo')")
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((1L, "lo"), (2L, "hi"), (3L, "hi"), (4L, "lo")), got)
    // a WRONG supplied value refuses via the synthetic audit; unmoved
    val before = TableLog.latestVersion(t)
    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO graftlog.`$t` VALUES (5, 1, 'hi')")
    }
    assert(ex.getMessage.contains("band_generated"), ex.getMessage)
    assert(TableLog.latestVersion(t) == before,
      "a refused SQL gencol insert moved the table")
  }

  test("heterogeneous staged sliver: gencol omission is detected PER " +
      "FILE — the omitting file finishes, the supplying file lands " +
      "byte-untouched with its values intact") {
    import java.nio.file.Paths
    import spark.implicits._
    val t = freshTable() // k BIGINT, x BIGINT, band STRING (gencol)
    // externally stage two files: A supplies band, B omits it (the
    // commitStagedAppend public-API shape — e.g. two different
    // writer builds feeding one staged commit)
    def stageOne(df: org.apache.spark.sql.DataFrame,
        stage: String): (String, TableLog.AddFile) = {
      val dir = Paths.get(t, "data", stage)
      df.coalesce(1).write.parquet(dir.toString)
      val s = Files.list(dir)
      val f = try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSeq.head
      } finally s.close()
      val ks = df.select("k").collect().map(_.getLong(0))
      val rel = s"data/$stage/$f"
      (rel, TableLog.AddFile(rel, ks.length.toLong, ks.min, ks.max))
    }
    val (relA, addA) =
      stageOne(Seq((1L, 20L, "hi")).toDF("k", "x", "band"), "exta0001")
    val (relB, addB) =
      stageOne(Seq((2L, 3L)).toDF("k", "x"), "extb0001")
    TableLog.commitStagedAppend(t, Seq(addA, addB))
    val active = TableLog.state(t).active.map(_.relPath).toSet
    assert(active.contains(relA),
      s"the supplying file must land byte-untouched, active: $active")
    assert(!active.contains(relB),
      "the omitting file must be FINISHED (re-staged with the gencol)")
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((1L, "hi"), (2L, "lo")),
      s"per-file completion wrong: $got")
  }
}
