package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSuite
import graft.tablelog.TableLog

/** The SQL-visible commit-log catalog (q417/q418's machinery): named
  * reads, VERSION AS OF resolution, and the manifest-level skipping
  * the ScanBuilder performs BEFORE Spark plans a scan — pinned on the
  * builder itself, not a plan string.
  */
class GraftLogCatalogSpec extends SparkSuite {

  private val emptyOpts =
    new CaseInsensitiveStringMap(java.util.Collections.emptyMap())

  private def freshTable(bloom: Option[String] = None): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_cat_").toString
    val v1 = (0L to 99L).map(i => (i, s"a$i")).toDF("k", "v")
    TableLog.create(v1, t, "k", numFiles = 4, bloomCol = bloom)
    TableLog.append((100L to 199L).map(i => (i, s"b$i")).toDF("k", "v"),
      t, numFiles = 4)
    t
  }

  test("named SQL read + VERSION AS OF resolve manifest snapshots; " +
      "pushdown reaches the parquet scan") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    // latest: both commits visible
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 200L)
    // time travel: v1 predates the append — snapshot isolation by name
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 1")
      .collect().head.getLong(0) == 100L)
    // rows through a pushed key predicate stay exact (file skip is
    // file-grain; the residual row filter does the last mile)
    val df = spark.sql(s"SELECT v FROM graftlog.`$t` WHERE k >= 180")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      (180L to 199L).map(i => s"b$i").sorted)
    // the key comparison reaches the parquet scan for row-group skip
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(k,180"), p.take(800))
  }

  test("ScanBuilder prunes the manifest file set from pushed filters: " +
      "key ranges via [min,max] stats, point lookups via bloom sidecars") {
    val t = freshTable(bloom = Some("v"))
    val snap = TableLog.state(t)
    assert(snap.active.size == 8)
    // key range: only range-intersecting files survive, none lost
    val kb = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
    kb.pushFilters(Array(GreaterThanOrEqual("k", java.lang.Long.valueOf(150L))))
    assert(kb.chosenFiles.size < snap.active.size, kb.chosenFiles.toString)
    assert(kb.chosenFiles.forall(_.max >= 150L))
    assert(kb.chosenFiles.map(_.rows).sum >= 50L)
    assert(kb.pushedFilters().length == 1)
    // bloom point predicate on the NON-key column: sidecars skip files
    // the value cannot be in (false positives only widen, never lose)
    val bb = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
    bb.pushFilters(Array(EqualTo("v", "a5")))
    assert(bb.chosenFiles.size < snap.active.size, bb.chosenFiles.toString)
    assert(bb.chosenFiles.nonEmpty)
  }

  test("a NON-key predicate reaches the wrapped parquet scan's " +
      "PushedFilters — row-group pruning is not key-only") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val df = spark.sql(s"SELECT k FROM graftlog.`$t` WHERE v = 'a5'")
    val p = df.queryExecution.executedPlan.toString
    // the parquet scan gets the filter for row-group/page pruning...
    assert(p.contains("EqualTo(v,a5)"), p.take(800))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L))
    // ...AND the manifest's column-stats layer consumes it too: the
    // point lookup lands on exactly the one file whose recorded
    // string range holds 'a5' (binary UTF-8 bounds)
    val b = new GraftLogScanBuilder(spark, t, TableLog.state(t), emptyOpts)
    b.pushFilters(Array(EqualTo("v", "a5")))
    assert(b.pushedFilters().toSeq == Seq(EqualTo("v", "a5")))
    assert(b.chosenFiles.size == 1, b.chosenFiles.toString)
  }

  test("static IN on the key prunes EXACTLY per value, not by the " +
      "list's span") {
    import org.apache.spark.sql.sources.In
    val t = freshTable() // 8 range-partitioned files over keys 0..199
    val snap = TableLog.state(t)
    val b = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
    // [5, 199] spans the whole key space: a [min,max] collapse would
    // keep all 8 files; the per-value probe keeps only the two files
    // actually containing 5 and 199
    b.pushFilters(Array(In("k",
      Array[Any](java.lang.Long.valueOf(5L), java.lang.Long.valueOf(199L)))))
    assert(b.chosenFiles.size <= 2, b.chosenFiles.toString)
    assert(b.chosenFiles.exists(f => f.min <= 5L && f.max >= 5L))
    assert(b.chosenFiles.exists(f => f.min <= 199L && f.max >= 199L))
    // rows stay exact end to end
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    assert(spark.sql(s"SELECT v FROM graftlog.`$t` WHERE k IN (5, 199)")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("a5", "b199"))
  }

  test("VERSION AS OF beyond the latest committed version fails " +
      "loudly instead of clamping to current data") {
    val t = freshTable() // versions 1..2
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 99")
        .collect()
    }
    assert(e.getMessage.contains("99"), e.getMessage)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 0")
        .collect()
    }
    // the boundary versions still resolve
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 2")
      .collect().head.getLong(0) == 200L)
  }

  test("catalog surface: nonexistent paths miss cleanly, DDL refuses") {
    val cat = new GraftLogCatalog
    cat.initialize("graftlog", emptyOpts)
    val ghost = Identifier.of(Array.empty, "/nonexistent/graft/table")
    assert(!cat.tableExists(ghost))
    intercept[UnsupportedOperationException] { cat.dropTable(ghost) }
  }

  test("SQL DML: DELETE pushes to the COW delete when translatable, " +
      "refuses when not; time-traveled snapshots refuse all DML") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    // untranslatable condition (arithmetic): falls to the row-level
    // COW rewrite and deletes exactly the matching rows
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k % 2 = 0 AND k < 10")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 195L)
    assert(spark.sql(s"SELECT min(k) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 1L)
    // translatable range: one atomic COW commit; old version intact
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k >= 150")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 145L)
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 2")
      .collect().head.getLong(0) == 200L)
    assert(TableLog.history(t).last.op == "delete")
    // history is immutable: a time-traveled snapshot refuses writes
    val cat = new GraftLogCatalog
    cat.initialize("graftlog", emptyOpts)
    val versioned = cat.loadTable(Identifier.of(Array.empty, t), "1")
      .asInstanceOf[GraftLogTable]
    intercept[UnsupportedOperationException] {
      versioned.newWriteBuilder(null)
    }
    assert(!versioned.canDeleteWhere(
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("k", java.lang.Long.valueOf(1L)))))
  }

  test("runtime file pruning: a join-delivered IN-set shrinks the " +
      "file set by key range before any task launches; rows stay exact") {
    import org.apache.spark.sql.sources.{Filter, In}
    import spark.implicits._
    val t = freshTable() // 8 range-partitioned files over keys 0..199
    val snap = TableLog.state(t)
    val scan = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
      .build().asInstanceOf[GraftLogDataScan]
    val before = scan.planInputPartitions().length
    scan.filter(Array[Filter](In("k",
      Array[Any](java.lang.Long.valueOf(5L), java.lang.Long.valueOf(7L)))))
    assert(scan.chosenFiles.size < snap.active.size,
      s"runtime IN-set did not prune: ${scan.chosenFiles.size}")
    assert(scan.chosenFiles.forall(f => f.min <= 7L && f.max >= 5L))
    assert(scan.planInputPartitions().length <= before)
    assert(scan.description().contains("runtimePruned=true"))
    // end-to-end: the same fact side joined through SQL stays exact
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val dim = Seq(5L, 7L, 150L).toDF("k")
    val joined = spark.sql(s"SELECT k, v FROM graftlog.`$t`")
      .join(dim, "k").collect()
    assert(joined.map(_.getLong(0)).sorted.toSeq == Seq(5L, 7L, 150L))
  }

  test("whole-table count/min/max answer from the manifest fold — " +
      "zero data files opened; filters and non-key columns fall back") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val df = spark.sql(
      s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM graftlog.`$t`")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("manifest-stats"), p.take(600))
    assert(!p.contains("Parquet"), p.take(600))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((200L, 0L, 199L)))
    // a row filter invalidates file-grain stats: real scan, exact rows
    val f = spark.sql(s"SELECT count(*) FROM graftlog.`$t` WHERE k >= 100")
    assert(!f.queryExecution.executedPlan.toString.contains("manifest-stats"))
    assert(f.collect().head.getLong(0) == 100L)
    // min over a STRING column refuses — its stored bounds may be
    // truncated, and the pushdown contract is exactness: real scan
    val nk = spark.sql(s"SELECT min(v) FROM graftlog.`$t`")
    assert(!nk.queryExecution.executedPlan.toString.contains("manifest-stats"))
    assert(nk.collect().head.getString(0) == "a0")
    // a NON-key INTEGRAL column folds from its column stats when
    // every active file carries them — zero files opened
    import spark.implicits._
    val t2 = Files.createTempDirectory("tlog_aggc_").toString
    TableLog.create((0L to 99L).map(i => (i, 1000L - i)).toDF("k", "amt"),
      t2, "k", numFiles = 4)
    val ik = spark.sql(
      s"SELECT min(amt) AS mn, max(amt) AS mx FROM graftlog.`$t2`")
    assert(ik.queryExecution.executedPlan.toString.contains("manifest-stats"))
    assert(ik.collect().head match {
      case r => (r.getLong(0), r.getLong(1)) == ((901L, 1000L))
    })
  }

  test("CTAS creates-and-loads in one statement; df.write appends " +
      "through the connector as an atomic commit") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_ctas_").toString + "/tbl"
    (0L to 49L).map(i => (i, s"a$i")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    try {
      // key defaults to the first BIGINT column (k) — no property needed
      spark.sql(s"CREATE TABLE graftlog.`$t` AS SELECT * FROM ctas_src")
      assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
        .collect().head.getLong(0) == 50L)
      // DataFrame-writer append via the stream provider's batch path
      (50L to 79L).map(i => (i, s"b$i")).toDF("k", "v")
        .write.format("graft.sources.GraftLogStreamProvider")
        .option("path", t).mode("append").save()
      assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
        .collect().head.getLong(0) == 80L)
      assert(TableLog.history(t).map(_.op) ==
        Seq("create", "append", "append"))
      // manifest stats are true bounds across both write paths
      assert(TableLog.statsOf(t) == ((80L, 0L, 79L)))
    } finally spark.catalog.dropTempView("ctas_src")
  }

  test("ALTER TABLE ADD COLUMN is one metadata-only evolve commit; " +
      "pre-evolution files null-fill; non-additive changes refuse") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_alter_").toString + "/tbl"
    spark.sql(s"CREATE TABLE graftlog.`$t` (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('key' = 'k')")
    (0L to 9L).map(i => (i, s"a$i")).toDF("k", "v")
      .write.format("graft.sources.GraftLogStreamProvider")
      .option("path", t).mode("append").save()
    spark.sql(s"ALTER TABLE graftlog.`$t` ADD COLUMN w BIGINT")
    // the evolve commit carries ZERO data files — pure metadata
    val evolve = TableLog.history(t).last
    assert(evolve.op == "evolve" && evolve.nAdds == 0 && evolve.nRemoves == 0)
    (10L to 14L).map(i => (i, s"b$i", i * 2)).toDF("k", "v", "w")
      .write.format("graft.sources.GraftLogStreamProvider")
      .option("path", t).mode("append").save()
    val rows = spark.sql(s"SELECT k, w FROM graftlog.`$t` ORDER BY k")
      .collect()
    assert(rows.length == 15)
    assert(rows.take(10).forall(_.isNullAt(1)), "pre-evolution must null-fill")
    assert(rows.drop(10).forall(r => r.getLong(1) == r.getLong(0) * 2))
    // time travel still reads the narrow schema's data
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 2")
      .collect().head.getLong(0) == 10L)
    // duplicate columns refuse; DROP/RENAME are no longer refusals —
    // they ride the column mapping (dedicated spec below); pin here
    // that a rename keeps the evolve-era null-fill behavior intact
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graftlog.`$t` ADD COLUMN v STRING")
    }
    spark.sql(s"ALTER TABLE graftlog.`$t` RENAME COLUMN w TO w2")
    val renamed = spark.sql(
      s"SELECT k, w2 FROM graftlog.`$t` ORDER BY k").collect()
    assert(renamed.take(10).forall(_.isNullAt(1)))
    assert(renamed.drop(10).forall(r => r.getLong(1) == r.getLong(0) * 2))
  }

  test("TIMESTAMP AS OF resolves the latest commit at-or-before the " +
      "instant; an instant predating the table misses") {
    val cat = new GraftLogCatalog
    cat.initialize("graftlog", emptyOpts)
    val t = Files.createTempDirectory("tlog_ts_").toString
    import spark.implicits._
    val before = System.currentTimeMillis() - 5L
    TableLog.create((0L to 99L).map(i => (i, s"a$i")).toDF("k", "v"), t, "k", 2)
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    TableLog.append((100L to 199L).map(i => (i, s"b$i")).toDF("k", "v"), t, 2)
    val ident = Identifier.of(Array.empty, t)
    def rowsAt(millis: Long): Long = {
      val snap = TableLog.state(t,
        TableLog.versionAtTimestamp(t, millis))
      snap.active.map(_.rows).sum
    }
    assert(rowsAt(between) == 100L)
    assert(rowsAt(System.currentTimeMillis()) == 200L)
    // the catalog hook receives MICROseconds and lands on the same version
    assert(cat.loadTable(ident, between * 1000L).schema().fieldNames
      .toSeq == Seq("k", "v"))
    intercept[Exception] { TableLog.versionAtTimestamp(t, before) }
  }

  test("#history metadata table matches TableLog.history row for row") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val got = spark.sql(
      s"SELECT * FROM graftlog.`$t#history` ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val want = TableLog.history(t).map(h =>
      (h.version, h.op, h.nAdds, h.nRemoves,
        h.rowsAdded, h.rowsRemoved, h.totalRows))
    assert(got.toSeq == want)
    // versionless: time travel over history refuses
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graftlog.`$t#history` VERSION AS OF 1")
        .collect()
    }
  }

  test("column-stats file skipping: comparison predicates on NON-KEY " +
      "columns prune files from the manifest; stat-less files survive") {
    import spark.implicits._
    import org.apache.spark.sql.sources.{GreaterThan, In => SIn, LessThan}
    val t = Files.createTempDirectory("tlog_cst_").toString
    // k-range staging → amt/tag ranges align per file: 4 files of 50
    val df = (0L to 199L).map(i => (i, i * 3L, f"t$i%03d")).toDF("k", "amt", "tag")
    TableLog.create(df, t, "k", numFiles = 4)
    val snap = TableLog.state(t)
    assert(snap.active.size == 4)
    def chosen(fs: org.apache.spark.sql.sources.Filter*): Int = {
      val b = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
      b.pushFilters(fs.toArray)
      b.chosenFiles.size
    }
    // amt = k*3: a point, a range edge, an IN set, a string range
    assert(chosen(EqualTo("amt", java.lang.Long.valueOf(300L))) == 1)
    assert(chosen(GreaterThan("amt", java.lang.Long.valueOf(450L))) == 1)
    assert(chosen(LessThan("tag", "t050")) == 1)
    assert(chosen(SIn("amt", Array[Any](java.lang.Long.valueOf(3L),
      java.lang.Long.valueOf(597L)))) == 2)
    // impossible predicate prunes everything; rows stay exact end-to-end
    assert(chosen(EqualTo("amt", java.lang.Long.valueOf(-5L))) == 0)
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    assert(spark.sql(
      s"SELECT count(*) FROM graftlog.`$t` WHERE amt >= 450 AND amt < 600")
      .collect().head.getLong(0) == 50L)
    // the DSv2 INSERT write path records the same stats inline
    val t2 = Files.createTempDirectory("tlog_cst2_").toString + "/tbl"
    spark.sql(
      s"""CREATE TABLE graftlog.`$t2` (k BIGINT, amt BIGINT, tag STRING)
         |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    df.createOrReplaceTempView("cst_src")
    spark.sql(s"INSERT INTO graftlog.`$t2` SELECT * FROM cst_src")
    val ins = TableLog.state(t2).active
    assert(ins.nonEmpty && ins.forall(a =>
      a.cols.map(_.col).toSet == Set("amt", "tag")), ins.map(_.cols))
    // inserted stats are true bounds: fold of per-file ranges = global
    assert(ins.map(_.cols.find(_.col == "amt").get.min.toLong).min == 0L)
    assert(ins.map(_.cols.find(_.col == "amt").get.max.toLong).max == 597L)
  }

  test("deletion vectors through the catalog: named reads subtract " +
      "dead rows; count(*) folds exactly; min/max falls back to scan") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_dvcat_").toString
    TableLog.create((0L to 199L).map(i => (i, i * 2L)).toDF("k", "amt"),
      t, "k", numFiles = 4)
    // merge-on-read delete through SQL CALL, including the current min
    val r = spark.sql(
      s"CALL graftlog.delete_dv('$t', 'k % 10 = 0 OR k = 199')").collect()
    assert(r.head.getLong(1) == 21L, r.toSeq)
    // named read: dead rows subtracted, predicates stay exact
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` WHERE k < 100")
      .collect().head.getLong(0) == 90L)
    val got = spark.sql(
      s"SELECT k FROM graftlog.`$t` ORDER BY k").collect().map(_.getLong(0))
    assert(got.length == 179 && !got.exists(k => k % 10 == 0 || k == 199L))
    // count(*) still answers from the manifest (live rows fold)
    val c = spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
    assert(c.queryExecution.executedPlan.toString.contains("manifest-stats"))
    assert(c.collect().head.getLong(0) == 179L)
    // min/max ALSO answer from stats: the dead rows carried the min
    // and the max, but the DV commit re-derived the bounds over the
    // survivors (dvExact), so the manifest fold stays live-exact —
    // zero data files opened even on a MoR'd table
    val mm = spark.sql(s"SELECT min(k) AS mn, max(k) AS mx FROM graftlog.`$t`")
    assert(mm.queryExecution.executedPlan.toString.contains("manifest-stats"),
      "survivor-exact DV bounds must keep the stats pushdown answering")
    val row = mm.collect().head
    assert((row.getLong(0), row.getLong(1)) == ((1L, 198L)))
    // time travel composes: pre-delete version reads all physical rows
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 1")
      .collect().head.getLong(0) == 200L)
  }

  test("#detail: one-row manifest card with live/dead accounting; " +
      "VERSION AS OF composes; zero files opened") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_det_").toString
    TableLog.create((0L to 99L).map(i => (i, s"a$i")).toDF("k", "v"),
      t, "k", numFiles = 4, bloomCol = Some("v"))
    TableLog.deleteWhereDv(spark, t, $"k" < 10L)
    val df = spark.sql(s"SELECT * FROM graftlog.`$t#detail`")
    assert(df.queryExecution.executedPlan.toString.contains("manifest-stats"))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4), r.getString(6)) == ((2L, 4L, 90L, 10L, "k", "v")))
    // time travel: the pre-delete card
    val r1 = spark.sql(
      s"SELECT version, live_rows, dead_rows FROM graftlog.`$t#detail` " +
        "VERSION AS OF 1").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((1L, 100L, 0L)))
  }

  test("TBLPROPERTIES persist in the log; delete.mode=merge-on-read " +
      "routes SQL DELETE to deletion vectors; UNSET returns to COW") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_props_").toString + "/tbl"
    spark.sql(
      s"""CREATE TABLE graftlog.`$t` (k BIGINT, v STRING)
         |TBLPROPERTIES ('key' = 'k', 'team' = 'data-eng')""".stripMargin)
    (0L to 99L).map(i => (i, s"a$i")).toDF("k", "v")
      .createOrReplaceTempView("props_src")
    spark.sql(s"INSERT INTO graftlog.`$t` SELECT * FROM props_src")
    // persisted props read back via SHOW TBLPROPERTIES
    val shown = spark.sql(s"SHOW TBLPROPERTIES graftlog.`$t`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("team").contains("data-eng") &&
      shown.get("key").contains("k"), shown)
    // flip the delete mode via ALTER ... SET TBLPROPERTIES
    spark.sql(s"ALTER TABLE graftlog.`$t` " +
      "SET TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    def parquetCount: Int = {
      val s = Files.walk(java.nio.file.Paths.get(t, "data"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      } finally s.close()
    }
    val before = parquetCount
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k < 10")
    assert(parquetCount == before, "MoR DELETE must not rewrite files")
    assert(TableLog.state(t).active.exists(_.dv.isDefined))
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 90L)
    // UNSET returns the next DELETE to copy-on-write
    spark.sql(s"ALTER TABLE graftlog.`$t` " +
      "UNSET TBLPROPERTIES ('delete.mode')")
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k >= 90")
    assert(parquetCount > before, "COW DELETE should have staged files")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 80L)
    // the key declaration is immutable
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graftlog.`$t` SET TBLPROPERTIES ('key'='v')")
    }
  }

  test("SQL CALL runs each procedure end-to-end and returns its " +
      "accounting row (LocalScan output, no task launch)") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    // compact 8 files -> 2 (v3), returns (version, n_files)
    val c = spark.sql(s"CALL graftlog.compact('$t', 2)").collect()
    assert(c.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 2L)))
    // restore to pre-compaction v2 (v4): physical layout returns,
    // rows unchanged; accounting row names the new version
    val r = spark.sql(s"CALL graftlog.restore('$t', 2)").collect()
    assert(r.head.getLong(0) == 4L && r.head.getLong(1) == 8L)
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 200L)
    // vacuum keeping only the latest version reclaims v3's files
    val v = spark.sql(s"CALL graftlog.vacuum('$t', 1, 0)").collect()
    assert(v.head.getLong(0) >= 2L) // at least the compacted pair
    // table still reads after vacuum
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 200L)
    // zorder re-lays the files; logical no-op, both axes get stats
    val z = spark.sql(s"CALL graftlog.zorder('$t', 'k', 'k', 2)").collect()
    assert(z.head.getLong(1) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 200L)
    // clone procedure: zero-copy fork readable by name
    val c2 = Files.createTempDirectory("tlog_callcl_").toString + "/c"
    spark.sql(s"CALL graftlog.clone('$t', '$c2')")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$c2`")
      .collect().head.getLong(0) == 200L)
  }

  test("CHECK constraints: ADD validates existing rows, violating " +
      "INSERTs refuse through Spark's enforcement, DROP re-opens") {
    val t = freshTable() // k in 0..199
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    // a constraint the table already violates must not be declarable
    val e0 = intercept[Exception](spark.sql(
      s"ALTER TABLE graftlog.`$t` ADD CONSTRAINT k_small CHECK (k < 100)"))
    assert(e0.getMessage.contains("violate"), e0.getMessage)
    // a satisfiable one lands as a metadata commit
    spark.sql(
      s"ALTER TABLE graftlog.`$t` ADD CONSTRAINT k_bound CHECK (k < 1000)")
    assert(TableLog.state(t).props.get("constraint.k_bound")
      .exists(_.contains("k < 1000")))
    // valid insert passes, violating insert refuses BEFORE landing
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (500, 'ok')")
    val vBefore = TableLog.latestVersion(t)
    val e1 = intercept[Exception](spark.sql(
      s"INSERT INTO graftlog.`$t` VALUES (5000, 'nope')"))
    assert(e1.getMessage.toLowerCase.contains("check") ||
      e1.getMessage.contains("k_bound"), e1.getMessage)
    assert(TableLog.latestVersion(t) == vBefore,
      "violating insert must not commit")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 201L)
    // DROP CONSTRAINT re-opens the gate
    spark.sql(s"ALTER TABLE graftlog.`$t` DROP CONSTRAINT k_bound")
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (5000, 'now ok')")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 202L)
  }

  test("#files metadata table: one row per active file off the " +
      "manifest, folds agree with #detail, VERSION AS OF composes") {
    val t = freshTable() // 200 rows, 8 files over 2 commits
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val rows = spark.sql(
      s"""SELECT rel_path, rows, live_rows, min_key, max_key, size_bytes
         |FROM graftlog.`$t#files` ORDER BY rel_path""".stripMargin)
      .collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).sum == 200L)
    assert(rows.forall(r => r.getLong(5) > 0L), "size_bytes missing")
    assert(rows.map(_.getLong(3)).min == 0L &&
      rows.map(_.getLong(4)).max == 199L)
    // folds agree with #detail exactly
    val d = spark.sql(s"SELECT n_files, live_rows FROM graftlog.`$t#detail`")
      .collect().head
    assert(d.getLong(0) == 8L && d.getLong(1) == 200L)
    // VERSION AS OF composes: v1's active set only
    assert(spark.sql(
      s"SELECT count(*) FROM graftlog.`$t#files` VERSION AS OF 1")
      .collect().head.getLong(0) == 4L)
    // a DV'd file reports dead rows through live_rows
    TableLog.deleteWhereDv(spark, t,
      org.apache.spark.sql.functions.expr("k IN (3, 7)"))
    val dv = spark.sql(
      s"""SELECT sum(rows) - sum(live_rows) FROM graftlog.`$t#files`""")
      .collect().head.getLong(0)
    assert(dv == 2L)
  }

  test("estimateStatistics reports the manifest's EXACT live row " +
      "count to CBO — whole table and pruned file set alike") {
    val t = freshTable() // 200 rows over 8 files
    val snap = TableLog.state(t)
    val full = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
      .build().asInstanceOf[GraftLogDataScan]
    val st = full.estimateStatistics()
    assert(st.numRows().isPresent && st.numRows().getAsLong == 200L)
    assert(st.sizeInBytes().isPresent && st.sizeInBytes().getAsLong > 0L)
    // after key-range pushdown the count follows the PRUNED set's fold
    val pruned = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
    pruned.pushFilters(
      Array(GreaterThanOrEqual("k", java.lang.Long.valueOf(150L))))
    val ps = pruned.build().asInstanceOf[GraftLogDataScan]
    val expected = ps.chosenFiles.map(_.liveRows).sum
    assert(expected < 200L)
    assert(ps.estimateStatistics().numRows().getAsLong == expected)
  }

  test("deletePrune composes every skipping layer: a bloom point " +
      "predicate on a non-key column narrows the DELETE candidate scan") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_delpr_").toString
    // custkeys cluster with the key ranges (cust = k / 10), so each
    // of the 8 range-staged files holds few custkeys and the bloom
    // sidecars separate them — and cust=3 (keys 30-39) lands INSIDE
    // one file (keys 25-49), so the merge-on-read delete must leave a
    // DV'd survivor, not drop a fully-dead file
    val df = (0L to 199L).map(i => (i, i / 10L, s"v$i"))
      .toDF("k", "cust", "v")
    TableLog.create(df, t, "k", numFiles = 8, bloomCol = Some("cust"))
    val snap = TableLog.state(t)
    val prune = GraftLogTable.deletePrune(spark, t, snap,
      Seq(EqualTo("cust", java.lang.Long.valueOf(3L))))
    val kept = prune(snap)
    assert(kept.nonEmpty && kept.size < snap.active.size,
      s"bloom layer did not narrow: ${kept.size} of ${snap.active.size}")
    // soundness: every file actually holding cust=3 survived
    val holding = TableLog.snapshot(spark, t).where($"cust" === 3L)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(kept.size.toLong >= holding)
    // and the merge-on-read route through SQL stays exact
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    TableLog.setProps(t, Map("delete.mode" -> "merge-on-read"))
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE cust = 3")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 190L)
    assert(TableLog.history(t).last.op == "delete")
    // merge-on-read: no data file was rewritten, only DV sidecars
    assert(TableLog.state(t).active.count(_.dv.isDefined) >= 1)
  }

  test("ALTER TABLE RENAME/DROP COLUMN: metadata commits through the " +
      "column mapping; SQL readback, DML and time travel all line up") {
    val t = freshTable()
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    spark.sql(s"ALTER TABLE graftlog.`$t` RENAME COLUMN v TO label")
    // readback under the new name, filtered on it (pushed through the
    // mapping to the physical parquet column)
    val got = spark.sql(
      s"SELECT k, label FROM graftlog.`$t` WHERE label = 'a7'").collect()
    assert(got.length == 1 && got.head.getLong(0) == 7L)
    // INSERT with the new name lands and reads back
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES (500, 'fresh')")
    assert(spark.sql(
      s"SELECT count(*) FROM graftlog.`$t` WHERE label = 'fresh'")
      .collect().head.getLong(0) == 1L)
    // DELETE keyed on the renamed column stays exact
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE label = 'a7'")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 200L)
    // time travel BEFORE the rename answers under the OLD name
    val era = spark.sql(
      s"SELECT k, v FROM graftlog.`$t` VERSION AS OF 2 WHERE v = 'a7'")
      .collect()
    assert(era.length == 1 && era.head.getString(1) == "a7")
    // DROP COLUMN narrows; the physical name stays refused for re-add
    spark.sql(s"ALTER TABLE graftlog.`$t` DROP COLUMN label")
    assert(spark.table(s"graftlog.`$t`").columns.toSeq == Seq("k"))
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE graftlog.`$t` ADD COLUMN v STRING"))
    assert(e.getMessage.contains("PHYSICAL"), e.getMessage)
    // a DIFFERENT name adds fine
    spark.sql(s"ALTER TABLE graftlog.`$t` ADD COLUMN note STRING")
    assert(spark.table(s"graftlog.`$t`").columns.toSeq == Seq("k", "note"))
  }

  test("the pushed-DELETE candidate pruner prunes at chunk grain: a " +
      "partition-bounded delete never parses non-matching chunks") {
    import spark.implicits._
    import graft.tablelog.TableLog
    val t = java.nio.file.Files.createTempDirectory("cat_delchunk_")
      .toString + "/t"
    def slice(p: String, base: Long) =
      (0L until 64L).map(i => (base + i, p)).toDF("k", "part")
    TableLog.create(slice("a", 0L), t, "k", numFiles = 8,
      partCols = Seq("part"))
    TableLog.append(slice("b", 100L), t, numFiles = 8)
    TableLog.append(slice("c", 200L), t, numFiles = 8)
    TableLog.append(slice("d", 300L), t, numFiles = 8)  // v4 checkpoints
    val snap = TableLog.state(t)
    val prune = GraftLogTable.deletePrune(spark, t, snap,
      Seq(org.apache.spark.sql.sources.EqualTo("part", "d")))
    val fs = prune(snap)
    assert(fs.nonEmpty && fs.forall(_.parts.forall(_.values == Seq("d"))))
    val ix = snap.chunkIndex.get
    assert(ix.chunksParsed < ix.chunksTotal,
      s"delete pruning parsed ${ix.chunksParsed}/${ix.chunksTotal} chunks")
  }
}
