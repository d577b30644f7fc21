package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.tablelog.TableLog

/** SQL row-level operations on the catalog (q430/q431's machinery):
  * group-based copy-on-write UPDATE / MERGE INTO / rewriting DELETE,
  * with Spark's runtime group filter shrinking the rewrite to files
  * whose key range holds a matched key, and one atomic rewrite
  * manifest per statement.
  */
class GraftLogRowLevelSpec extends SparkSuite {

  private def freshTable(): String = {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_rl_").toString
    TableLog.create((0L to 99L).map(i => (i, s"a$i")).toDF("k", "v"),
      t, "k", numFiles = 4)
    TableLog.append((100L to 199L).map(i => (i, s"b$i")).toDF("k", "v"),
      t, numFiles = 4)
    t // 8 range-partitioned files, ~25 keys each
  }

  test("UPDATE rewrites ONLY files holding a matched key (runtime " +
      "group filter through the manifest scan); one atomic commit") {
    val t = freshTable()
    spark.sql(s"UPDATE graftlog.`$t` SET v = 'upd' WHERE pmod(k, 50) = 1")
    val got = spark.sql(
      s"SELECT k FROM graftlog.`$t` WHERE v = 'upd' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 51L, 101L, 151L), got.mkString(","))
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 200L)
    val c = TableLog.history(t).last
    assert(c.op == "update")
    // the four matched keys live in four distinct files: exactly
    // those rewrite — the other four files are untouched
    assert(c.nRemoves == 4, s"expected matched-sliver rewrite, got $c")
    // non-matching update commits nothing at all
    val vBefore = TableLog.latestVersion(t)
    spark.sql(s"UPDATE graftlog.`$t` SET v = 'x' WHERE k = -5")
    assert(TableLog.latestVersion(t) == vBefore)
  }

  test("MERGE INTO upserts through pure SQL: matched keys update, " +
      "fresh keys insert, one commit, time travel past it") {
    import spark.implicits._
    val t = freshTable()
    Seq((10L, "m10"), (170L, "m170"), (500L, "m500"))
      .toDF("k", "v").createOrReplaceTempView("rl_merge_src")
    try {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` t USING rl_merge_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    } finally spark.catalog.dropTempView("rl_merge_src")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 201L)
    val got = spark.sql(s"SELECT k, v FROM graftlog.`$t` " +
      "WHERE k IN (10, 11, 170, 500) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((10L, "m10"), (11L, "a11"), (170L, "m170"),
      (500L, "m500")), got.mkString(","))
    val c = TableLog.history(t).last
    assert(c.op == "merge")
    // matched keys 10 and 170 live in two files; only those rewrite,
    // the insert rides in the same commit
    assert(c.nRemoves == 2, s"expected matched-sliver rewrite, got $c")
    // the pre-merge snapshot is immutable
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 2")
      .collect().head.getLong(0) == 200L)
    assert(spark.sql(s"SELECT v FROM graftlog.`$t` VERSION AS OF 2 " +
      "WHERE k = 10").collect().head.getString(0) == "a10")
  }

  test("tri-clause MERGE: conditional matched update, matched delete, " +
      "insert, and both NOT MATCHED BY SOURCE arms in one commit") {
    import spark.implicits._
    val t = freshTable() // keys 0..199, v = a<k>/b<k>
    Seq((10L, "s10"), (11L, "s11"), (500L, "s500"))
      .toDF("k", "v").createOrReplaceTempView("rl_tri_src")
    try {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` t USING rl_tri_src s ON t.k = s.k
           |WHEN MATCHED AND t.k % 2 = 0 THEN UPDATE SET v = s.v
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE AND t.k >= 198 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'untouched'
           |""".stripMargin)
    } finally spark.catalog.dropTempView("rl_tri_src")
    val got = spark.sql(s"SELECT k, v FROM graftlog.`$t` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // k=10 matched+even -> s10; k=11 matched+odd -> deleted;
    // k=500 fresh -> inserted; k=198,199 unmatched -> deleted;
    // everything else unmatched -> v='untouched'
    val want = ((0L to 197L).filter(_ != 11L).map(k =>
      if (k == 10L) (k, "s10") else (k, "untouched")) :+ (500L, "s500"))
    assert(got == want,
      s"got ${got.size} rows; head=${got.take(3)}, last=${got.last}")
    val c = TableLog.history(t).last
    assert(c.op == "merge")
    // NOT MATCHED BY SOURCE touches every row: the whole 8-file table
    // rewrites (no matched-group sliver is legal here)
    assert(c.nRemoves == 8, s"expected full-table rewrite, got $c")
    // snapshot isolation: pre-merge version intact
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 2")
      .collect().head.getLong(0) == 200L)
  }

  test("merge.mode=merge-on-read routes SQL MERGE through deletion " +
      "vectors on a PARTITIONED IDENTITY table: sidecars land, no " +
      "file rewrites, ids preserve/allocate, #partitions exact") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_mordv_").toString + "/t"
    def day(d: Int) =
      java.sql.Timestamp.valueOf(f"2024-05-$d%02d 08:00:00")
    TableLog.createEmpty(t,
      "sid BIGINT, k BIGINT, ts TIMESTAMP, v STRING", "k",
      partCols = Seq("days:ts"),
      props = Map("identity.sid" -> "1000",
        "merge.mode" -> "merge-on-read"))
    TableLog.appendIdentity((0L to 39L).map(i =>
        (i, day((i % 4).toInt + 1), s"a$i")).toDF("k", "ts", "v"), t, 2)
    val sidOf3 = spark.sql(s"SELECT sid FROM graftlog.`$t` WHERE k = 3")
      .collect().head.getLong(0)
    val before = TableLog.state(t).active.map(a => a.relPath ->
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(t, a.relPath)).toMillis).toMap
    Seq((3L, day(1), "UPD", "u"), (5L, day(2), "", "d"),
      (100L, day(9), "NEW", "i"))
      .toDF("k", "ts", "v", "op").createOrReplaceTempView("mor_src")
    try {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` tg USING mor_src s ON tg.k = s.k
           |WHEN MATCHED AND s.op = 'd' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT (k, ts, v)
           |  VALUES (s.k, s.ts, s.v)
           |""".stripMargin)
    } finally spark.catalog.dropTempView("mor_src")
    val st = TableLog.state(t)
    assert(TableLog.history(t).last.op == "merge")
    // merge-on-read: DV sidecars present, every original file still
    // active under its relPath, bytes untouched
    assert(st.active.exists(_.dv.isDefined),
      "SQL MERGE did not route merge-on-read under merge.mode")
    assert(before.keySet.subsetOf(st.active.map(_.relPath).toSet),
      "merge-on-read MERGE rewrote an original file")
    before.foreach { case (r, ts0) =>
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(t, r)).toMillis == ts0,
        s"merge-on-read MERGE touched bytes of $r") }
    // readback: update landed with its id PRESERVED, delete gone,
    // insert allocated the next id, mark advanced in the commit
    val got = spark.sql(
      s"SELECT k, sid, v FROM graftlog.`$t` ORDER BY k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.size == 40 && !got.contains(5L), s"rows: ${got.size}")
    assert(got(3L) == ((sidOf3, "UPD")), s"id not preserved: ${got(3L)}")
    assert(got(100L) == ((1040L, "NEW")), s"insert id: ${got(100L)}")
    assert(st.props("identity.sid") == "1041")
    // ids stay unique through the merge
    assert(spark.sql(s"SELECT count(DISTINCT sid) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 40L)
    // #partitions folds exactly through the MoR merge (tuple stats
    // decremented for the dead rows, fresh images staged partitioned)
    val parts = spark.sql(
      s"SELECT `days(ts)`, row_count FROM graftlog.`$t#partitions`")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts == Map("2024-05-01" -> 10L, "2024-05-02" -> 9L,
      "2024-05-03" -> 10L, "2024-05-04" -> 10L, "2024-05-09" -> 1L),
      parts.toString)
  }

  test("merge-on-read SQL MERGE composes with GENERATED columns: " +
      "update arms recompute an omitted gencol from NEW values, " +
      "insert arms compute it from the arm's own assignments") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_mordvg_").toString + "/t"
    TableLog.createEmpty(t, "sid BIGINT, k BIGINT, x BIGINT, band STRING",
      "k", props = Map(
        "identity.sid" -> "1",
        "gencol.band" -> "CASE WHEN x >= 10 THEN 'hi' ELSE 'lo' END",
        "merge.mode" -> "merge-on-read"))
    TableLog.appendIdentity(
      Seq((1L, 5L), (2L, 20L), (3L, 7L)).toDF("k", "x"), t, 1)
    val before = TableLog.state(t).active.map(_.relPath).toSet
    Seq((1L, 50L), (9L, 3L)).toDF("k", "x")
      .createOrReplaceTempView("mordvg_src")
    try {
      // both arms OMIT band: the analyzer completion injects the
      // recompute (update: NEW x substituted) / compute (insert: the
      // arm's own x), and the synthetic CHECK gates the images
      spark.sql(
        s"""MERGE INTO graftlog.`$t` tg USING mordvg_src s ON tg.k = s.k
           |WHEN MATCHED THEN UPDATE SET x = s.x
           |WHEN NOT MATCHED THEN INSERT (k, x) VALUES (s.k, s.x)
           |""".stripMargin)
    } finally spark.catalog.dropTempView("mordvg_src")
    val st = TableLog.state(t)
    assert(st.active.exists(_.dv.isDefined) &&
      before.subsetOf(st.active.map(_.relPath).toSet),
      "gencol MERGE did not route merge-on-read")
    val got = spark.sql(
      s"SELECT k, sid, x, band FROM graftlog.`$t` ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    // k=1: updated x=50 -> band recomputed 'hi', sid preserved;
    // k=9: inserted x=3 -> band 'lo', sid allocated (next = 4)
    assert(got == Seq((1L, 1L, 50L, "hi"), (2L, 2L, 20L, "hi"),
      (3L, 3L, 7L, "lo"), (9L, 4L, 3L, "lo")), got.toString)
    assert(st.props("identity.sid") == "5")
  }

  test("dv.mode umbrella: ONE property routes SQL DELETE, UPDATE and " +
      "MERGE merge-on-read; a per-operation mode overrides it") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_dvmode_").toString
    TableLog.create((0L to 99L).map(i => (i, s"a$i")).toDF("k", "v"),
      t, "k", numFiles = 4)
    TableLog.setProps(t, TableLog.state(t).props +
      ("dv.mode" -> "merge-on-read"))
    val before = TableLog.state(t).active.map(_.relPath).toSet
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k = 3")
    spark.sql(s"UPDATE graftlog.`$t` SET v = 'upd' WHERE k = 5")
    Seq((7L, "mrg"), (200L, "new")).toDF("k", "v")
      .createOrReplaceTempView("dvmode_src")
    try {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` tg USING dvmode_src s ON tg.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
           |""".stripMargin)
    } finally spark.catalog.dropTempView("dvmode_src")
    val st = TableLog.state(t)
    assert(before.subsetOf(st.active.map(_.relPath).toSet),
      "umbrella-routed DML rewrote an original file")
    assert(st.active.count(_.dv.isDefined) >= 1, "no DV landed")
    val got = spark.sql(s"SELECT k, v FROM graftlog.`$t` ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 100 && !got.contains(3L) && got(5L) == "upd" &&
      got(7L) == "mrg" && got(200L) == "new" && got(8L) == "a8", got.toString)
    // a per-op mode OVERRIDES the umbrella: delete opts back to
    // copy-on-write while update/merge stay merge-on-read
    TableLog.setProps(t, TableLog.state(t).props +
      ("delete.mode" -> "copy-on-write"))
    val files2 = TableLog.state(t).active.map(_.relPath).toSet
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k = 9")
    assert(!files2.subsetOf(
      TableLog.state(t).active.map(_.relPath).toSet),
      "the per-op copy-on-write override did not rewrite")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .collect().head.getLong(0) == 99L)
  }

  test("star MERGE arms enforce the SAME full-width source contract " +
      "on the merge-on-read and copy-on-write routes: a partial " +
      "source refuses on both, a full source lands on both") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    def mkTable(mor: Boolean): String = {
      val t = Files.createTempDirectory("tlog_star_").toString
      TableLog.create((0L to 19L).map(i => (i, s"a$i", i * 10L))
        .toDF("k", "v", "w"), t, "k", numFiles = 2)
      if (mor) TableLog.setProps(t, TableLog.state(t).props +
        ("merge.mode" -> "merge-on-read"))
      t
    }
    def starMerge(t: String, src: String): Unit = spark.sql(
      s"""MERGE INTO graftlog.`$t` tg USING $src s ON tg.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val (tMor, tCow) = (mkTable(mor = true), mkTable(mor = false))
    // a source LACKING 'w' refuses identically on both routes —
    // Spark's own merge resolution fails the COW star arm, and the
    // DV route mirrors the contract (flipping merge.mode must change
    // the write shape, never which statements are accepted)
    Seq((3L, "UPD")).toDF("k", "v").createOrReplaceTempView("star_part")
    try {
      intercept[Exception] { starMerge(tCow, "star_part") }
      val e = intercept[Exception] { starMerge(tMor, "star_part") }
      assert(e.getMessage.contains("w"), e.getMessage)
    } finally spark.catalog.dropTempView("star_part")
    // a FULL-width source lands the same result on both routes
    Seq((3L, "UPD", 999L), (100L, "NEW", 5L)).toDF("k", "v", "w")
      .createOrReplaceTempView("star_full")
    def readback(t: String) =
      spark.sql(s"SELECT k, v, w FROM graftlog.`$t` ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq
    try {
      starMerge(tMor, "star_full")
      starMerge(tCow, "star_full")
      val (gotMor, gotCow) = (readback(tMor), readback(tCow))
      assert(gotMor == gotCow,
        s"star-arm results drift across merge.mode:\n$gotMor\n$gotCow")
      val byK = gotMor.map(x => x._1 -> ((x._2, x._3))).toMap
      assert(byK(3L) == (("UPD", 999L)) && byK(100L) == (("NEW", 5L)),
        byK.toString)
      assert(TableLog.state(tMor).active.exists(_.dv.isDefined),
        "the MoR table's star merge did not land deletion vectors")
    } finally spark.catalog.dropTempView("star_full")
  }

  test("SQL MERGE on a STRING join column prunes candidates through " +
      "the manifest's string column stats: a corrupted file outside " +
      "the source's envelope never opens") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_strenv_").toString
    TableLog.create((0L to 99L).map(i => (i, f"n$i%03d", "old"))
      .toDF("k", "name", "v"), t, "k", numFiles = 4)
    TableLog.setProps(t, TableLog.state(t).props +
      ("merge.mode" -> "merge-on-read"))
    val top = TableLog.state(t).active.maxBy(_.max)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, top.relPath), "not parquet".getBytes)
    Seq(("n003", "UPD"), ("n021", "UPD21")).toDF("name", "nv")
      .createOrReplaceTempView("strenv_src")
    try {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` tg USING strenv_src s
           |ON tg.name = s.name
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    } finally spark.catalog.dropTempView("strenv_src")
    val st = TableLog.state(t)
    val live = st.active.filter(_.relPath != top.relPath)
    val got = TableLog.readFiles(spark, t, st, live)
      .where($"k".isin(3L, 21L) || $"k" === 5L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(3L -> "UPD", 21L -> "UPD21", 5L -> "old"),
      s"string-envelope SQL MERGE readback: $got")
  }

  test("schema.autoMerge: a star MERGE whose source carries a NEW " +
      "column widens the schema and lands the data; without the " +
      "property the unseen column is ignored (target-column star " +
      "expansion — vanilla Spark's and Delta's non-autoMerge contract)") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    def mkTable(auto: Boolean): String = {
      val t = Files.createTempDirectory("tlog_am_").toString
      TableLog.create((0L to 9L).map(i => (i, s"a$i")).toDF("k", "v"),
        t, "k", numFiles = 1)
      if (auto) TableLog.setProps(t, TableLog.state(t).props +
        ("schema.autoMerge" -> "true"))
      t
    }
    Seq((3L, "UPD", 33L), (100L, "NEW", 7L)).toDF("k", "v", "score")
      .createOrReplaceTempView("am_src")
    def merge(t: String): Unit = spark.sql(
      s"""MERGE INTO graftlog.`$t` tg USING am_src s ON tg.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val tAuto = mkTable(auto = true)
    try {
      merge(tAuto)
      val got = spark.sql(
        s"SELECT k, v, score FROM graftlog.`$tAuto` ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      assert(got.size == 11, s"rows: ${got.size}")
      assert(got.contains((3L, "UPD", 33L)) &&
        got.contains((100L, "NEW", 7L)), got.toString)
      // untouched rows null-fill the evolved column through the read
      assert(got.filter(x => x._1 != 3L && x._1 != 100L)
        .forall(x => x._2.startsWith("a") && x._3 == -1L), got.toString)
      // an evolution-FREE merge on the same table keeps its normal
      // route (the probe must not push every merge through evolution)
      Seq((4L, "UPD4")).toDF("k", "v").createOrReplaceTempView("am_src2")
      try {
        spark.sql(
          s"""MERGE INTO graftlog.`$tAuto` tg USING am_src2 s
             |ON tg.k = s.k
             |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
        assert(spark.sql(
          s"SELECT v FROM graftlog.`$tAuto` WHERE k = 4")
          .collect().head.getString(0) == "UPD4")
      } finally spark.catalog.dropTempView("am_src2")
      // without the property, star arms expand by TARGET columns
      // (vanilla Spark = Delta-without-autoMerge): the unseen source
      // column is ignored, the schema does NOT widen, and the data
      // arms still land — evolution stays an explicit opt-in
      val tPlain = mkTable(auto = false)
      merge(tPlain)
      assert(!TableLog.state(tPlain).schemaDdl.contains("score"),
        "a non-opted-in star merge must not widen the schema: " +
          TableLog.state(tPlain).schemaDdl)
      val plain = spark.sql(
        s"SELECT k, v FROM graftlog.`$tPlain` ORDER BY k").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(plain.size == 11 && plain(3L) == "UPD" &&
        plain(100L) == "NEW", plain.toString)
    } finally spark.catalog.dropTempView("am_src")
  }

  test("DELETE with an untranslatable predicate takes the row-level " +
      "rewrite; survivors exact even when whole files die") {
    val t = freshTable()
    // cond matches EVERY row of the last two files (k >= 150) plus a
    // scattering elsewhere — the dangerous shape for any connector
    // that over-prunes its rewrite scan
    spark.sql(s"DELETE FROM graftlog.`$t` WHERE k >= 150 OR pmod(k, 7) = 0")
    val survivors = (0L to 149L).filterNot(k => k % 7 == 0)
    val got = spark.sql(s"SELECT k FROM graftlog.`$t` ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == survivors, s"got ${got.size}, want ${survivors.size}")
    assert(TableLog.history(t).last.op == "delete")
  }

  test("row-level DML refuses on a time-traveled snapshot") {
    val t = freshTable()
    val cat = new GraftLogCatalog
    cat.initialize("graftlog",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    val versioned = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, t), "1")
      .asInstanceOf[GraftLogTable]
    intercept[UnsupportedOperationException] {
      versioned.newRowLevelOperationBuilder(null)
    }
  }
}
