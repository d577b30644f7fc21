package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tablelog.TableLog

/** The commit-log streaming source (q422's machinery): version
  * offsets, incremental batches, null-filled schema evolution, and
  * the rewrite fail-fast.
  */
class GraftLogStreamSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("incremental batches: a mid-stream append flows as its own " +
      "batch; offsets are versions; nothing is rescanned") {
    val t = Files.createTempDirectory("tlog_stream_").toString
    val cp = Files.createTempDirectory("tlog_stream_cp_").toString
    TableLog.create(kv((0L to 49L).map(i => (i, s"a$i"))), t, "k", 2)
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).load()
      .writeStream.format("memory").queryName("tlog_stream_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("tlog_stream_probe").count() == 50L)
      TableLog.append(kv((50L to 99L).map(i => (i, s"b$i"))), t, 2)
      q.processAllAvailable()
      val got = spark.table("tlog_stream_probe").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size == 100 && got(0L) == "a0" && got(99L) == "b99")
      // the second batch carried ONLY the appended version's rows
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      assert(prog.map(_.numInputRows).sum == 100L, prog.mkString("\n"))
      assert(prog.last.numInputRows == 50L, prog.mkString("\n"))
    } finally q.stop()
  }

  test("startingVersion replays from a chosen point; schema evolution " +
      "null-fills pre-evolution files in the stream") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_stream2_").toString
    val cp = Files.createTempDirectory("tlog_stream2_cp_").toString
    TableLog.create(kv((0L to 9L).map(i => (i, s"a$i"))), t, "k", 1)
    TableLog.appendEvolve((10L to 19L).map(i => (i, s"b$i", i * 2))
      .toDF("k", "v", "w"), t, 1)
    // full replay: pre-evolution rows stream with the widened schema,
    // the missing column null-filled (the batch read's contract)
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).load()
      .writeStream.format("memory").queryName("tlog_stream_probe2")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tlog_stream_probe2").collect()
      assert(rows.length == 20, rows.length.toString)
      val (old, young) = rows.partition(_.getLong(0) < 10L)
      assert(old.length == 10 && old.forall(_.isNullAt(2)))
      assert(young.forall(r => r.getLong(2) == r.getLong(0) * 2))
    } finally q.stop()
    // startingVersion=1 skips the create commit: only v2's rows flow
    val cp2 = Files.createTempDirectory("tlog_stream2_cp2_").toString
    val q2 = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("tlog_stream_probe2b")
      .option("checkpointLocation", cp2)
      .start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("tlog_stream_probe2b").collect()
      assert(rows.length == 10, rows.length.toString)
      assert(rows.forall(_.getLong(0) >= 10L))
    } finally q2.stop()
  }

  test("native sink: each micro-batch is one atomic append commit " +
      "with manifest key stats; redelivered epochs land exactly once") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_sink_").toString
    val landing = Files.createTempDirectory("tlog_sink_land_").toString
    val rows = (0L to 99L).map(i => (i, s"a$i"))
    kv(rows).coalesce(1).write.mode("overwrite")
      .parquet(s"$landing/in")
    TableLog.create(kv(Nil), t, "k", 1)
    def runOnce(cp: String): Unit = {
      val q = spark.readStream.schema(kv(Nil).schema)
        .parquet(s"$landing/in")
        .writeStream.format("graft.sources.GraftLogStreamProvider")
        .option("path", t).option("txnAppId", "spec-sink")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce(s"$landing/_cp1")
    val vAfterFirst = TableLog.latestVersion(t)
    runOnce(s"$landing/_cp1") // same checkpoint: no new data, no commit
    runOnce(s"$landing/_cp2") // fresh checkpoint: txn ledger drops epoch 0
    val got = TableLog.snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 100 && got(0L) == "a0" && got(99L) == "a99",
      s"redelivery landed rows twice or lost rows: ${got.size}")
    assert(TableLog.latestVersion(t) == vAfterFirst,
      "a redelivered epoch must not even bump the version")
    // the manifest's key stats came from the task writer, and they
    // are the TRUE bounds: a stats-only read proves them
    assert(TableLog.statsOf(t) == ((100L, 0L, 99L)))
    // schema mismatch refuses at write build time
    val bad = intercept[Exception] {
      val q = spark.readStream.schema(
        kv(Nil).select($"k").schema).parquet(s"$landing/in")
        .writeStream.format("graft.sources.GraftLogStreamProvider")
        .option("path", t).option("checkpointLocation", s"$landing/_cp3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(bad.getMessage != null)
  }

  test("native sink option('branch', name): exactly-once ingest INTO " +
      "a staging branch — commits land on the branch head, main " +
      "untouched; publish lands them; unpublished drop refuses") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_brsink_").toString
    val landing = Files.createTempDirectory("tlog_brsink_land_").toString
    TableLog.create(kv((0L to 9L).map(i => (i, s"m$i"))), t, "k", 1)
    spark.sql(s"CALL graftlog.branch('$t', 'ingest')")
    kv((100L to 149L).map(i => (i, s"s$i"))).coalesce(1)
      .write.mode("overwrite").parquet(s"$landing/in")
    def runOnce(cp: String): Unit = {
      val q = spark.readStream.schema(kv(Nil).schema)
        .parquet(s"$landing/in")
        .writeStream.format("graft.sources.GraftLogStreamProvider")
        .option("path", t).option("branch", "ingest")
        .option("txnAppId", "spec-brsink")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce(s"$landing/_cp1")
    val bp = s"$t/_branches/ingest"
    // the epoch landed on the BRANCH head; main never moved
    assert(TableLog.snapshot(spark, bp).count() == 60L,
      "sink commits must land on the branch")
    assert(TableLog.snapshot(spark, t).count() == 10L,
      "the staging sink must not touch main")
    // exactly-once rides the BRANCH's txn ledger: a redelivery from a
    // fresh checkpoint (same txnAppId, epoch 0 again) commits nothing
    val vb = TableLog.latestVersion(bp)
    runOnce(s"$landing/_cp2")
    assert(TableLog.latestVersion(bp) == vb &&
      TableLog.snapshot(spark, bp).count() == 60L,
      "a redelivered epoch must no-op on the branch ledger")
    // WAP discipline: dropping the branch with unpublished sink work
    // refuses; publish fast-forwards main, then the drop is safe
    val e = intercept[Exception] {
      spark.sql(s"CALL graftlog.drop_branch('$t', 'ingest')")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("publish") || e.getMessage.contains("force")),
      e.getMessage)
    spark.sql(s"CALL graftlog.publish('$t', 'ingest')")
    val main = TableLog.snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(main.size == 60 && main(120L) == "s120" && main(3L) == "m3",
      s"publish must land the sink's branch commits: ${main.size}")
    spark.sql(s"CALL graftlog.drop_branch('$t', 'ingest')")
    assert(TableLog.snapshot(spark, t).count() == 60L,
      "published rows must survive the branch drop")
  }

  test("change-feed admission control: a multi-commit backfill under " +
      "maxFilesPerTrigger drains in bounded batches, change-exact") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_cdfadm_").toString
    TableLog.create(kv((0L to 19L).map(i => (i, s"a$i"))), t, "k", 2) // v1
    TableLog.append(kv((20L to 39L).map(i => (i, s"b$i"))), t, 2)    // v2
    TableLog.deleteWhere(spark, t, col("k") < 5L, 2)                 // v3
    TableLog.append(kv((40L to 49L).map(i => (i, s"c$i"))), t, 2)    // v4
    val cp = Files.createTempDirectory("tlog_cdfadm_cp_").toString
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("readChangeFeed", "true")
      .option("maxFilesPerTrigger", "2")
      .load()
      .writeStream.format("memory").queryName("cdf_admit_probe")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("cdf_admit_probe")
      .select($"k", $"action", $"_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // change-exact across the bounded drain: 50 inserts + 5 deletes,
    // each exactly once, versions intact
    assert(rows.count(_._2 == "insert") == 50, rows.length.toString)
    assert(rows.filter(_._2 == "delete").map(_._1).sorted.toSeq ==
      (0L to 4L))
    assert(rows.filter(_._3 == 4L).forall(_._2 == "insert"))
    // the budget actually split the drain: v1 alone holds 2 files, so
    // at maxFiles=2 the 4-version window cannot land as one batch —
    // multiple batch directories exist in the checkpoint's offsets
    val offs = java.nio.file.Files.list(
      java.nio.file.Paths.get(cp, "offsets"))
    try {
      import scala.jdk.CollectionConverters._
      assert(offs.iterator().asScala.size >= 2, "expected >= 2 batches")
    } finally offs.close()
  }

  test("autoCompact sink option: small-file debt stays bounded across " +
      "micro-batches, totals exact, history shows the compact commits") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_ac_").toString
    val landing = Files.createTempDirectory("tlog_ac_land_").toString
    TableLog.create(kv(Nil), t, "k", 1)
    // 8 single-row drops → 8 micro-batches under maxFilesPerTrigger=1,
    // one append commit each; without compaction the table would hold
    // 8 live files at the end
    (0L to 7L).foreach(i => kv(Seq((i, s"a$i"))).coalesce(1)
      .write.parquet(s"$landing/in/batch$i"))
    val q = spark.readStream.schema(kv(Nil).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$landing/in/*")
      .writeStream.format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("txnAppId", "spec-ac")
      .option("autoCompact", "4")
      .option("checkpointLocation", s"$landing/_cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // bounded: the threshold re-folds debt each time it crosses 4
    val live = TableLog.state(t).active.size
    assert(live <= 4, s"small-file debt unbounded: $live live files")
    // exact: every row exactly once despite the interleaved rewrites
    val got = TableLog.snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == (0L to 7L).map(i => i -> s"a$i").toMap, got.toString)
    // audited: the compactions are ordinary commits in the history
    val ops = TableLog.history(t).map(_.op)
    assert(ops.count(_ == "compact") >= 1, ops.toString)
    assert(ops.count(_ == "append") >= 8, ops.toString)
  }

  test("bucket.count above the partition-tuple cap: an unclustered " +
      "single-task insert routes to >64 bucket files and commits") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_bigbkt_").toString
    TableLog.createEmpty(t, "k BIGINT, v STRING", "k",
      props = Map("bucket.count" -> "128"))
    // provider path: no clustered distribution — ONE task sees ~128
    // distinct buckets, which the old 64-tuple cap refused outright
    (0L to 199L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.GraftLogStreamProvider")
      .option("path", t).mode("append").save()
    val snap = TableLog.state(t)
    assert(snap.active.size > 64, s"expected >64 bucket files, " +
      s"got ${snap.active.size}")
    // every staged file is bucket-pure (the SPJ gate's precondition)
    assert(snap.active.forall(a =>
      a.cols.exists(s => s.col == "__bucket" && s.min == s.max)))
    val got = TableLog.snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 200 && got(137L) == "x137")
  }

  test("admission control: a 3-append backfill under maxFilesPerTrigger=1 " +
      "drains in >=3 micro-batches with exact totals") {
    val t = Files.createTempDirectory("tlog_admit_").toString
    val cp = Files.createTempDirectory("tlog_admit_cp_").toString
    TableLog.create(kv((0L to 9L).map(i => (i, s"a$i"))), t, "k", 1)
    TableLog.append(kv((10L to 19L).map(i => (i, s"b$i"))), t, 1)
    TableLog.append(kv((20L to 29L).map(i => (i, s"c$i"))), t, 1)
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("maxFilesPerTrigger", "1").load()
      .writeStream.format("memory").queryName("tlog_admit_probe")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3,
        s"backfill must drain in bounded batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows == 10L),
        batches.map(_.numInputRows).mkString(","))
      val got = spark.table("tlog_admit_probe").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size == 30 && got(0L) == "a0" && got(29L) == "c29")
    } finally q.stop()
  }

  test("admission offsets: maxFiles/maxRows/maxBytes budgets admit " +
      "whole versions, never zero progress; rewrite windows refuse") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val t = Files.createTempDirectory("tlog_admit2_").toString
    TableLog.create(kv((0L to 9L).map(i => (i, s"a$i"))), t, "k", 1)
    TableLog.append(kv((10L to 19L).map(i => (i, s"b$i"))), t, 1)
    TableLog.append(kv((20L to 29L).map(i => (i, s"c$i"))), t, 1)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      TableLog.state(t).schemaDdl)
    def off(stream: GraftLogMicroBatchStream, from: Long,
        limit: ReadLimit): Long =
      stream.latestOffset(GraftLogVersionOffset(from), limit)
        .asInstanceOf[GraftLogVersionOffset].version
    val s0 = new GraftLogMicroBatchStream(t, schema, 0L)
    // two files per trigger = two versions (each commit staged 1 file)
    assert(off(s0, 0L, ReadLimit.maxFiles(2)) == 2L)
    assert(off(s0, 2L, ReadLimit.maxFiles(2)) == 3L)
    // a budget SMALLER than the next commit still admits it (progress)
    assert(off(s0, 0L, ReadLimit.maxRows(1L)) == 1L)
    assert(off(s0, 1L, ReadLimit.maxRows(1L)) == 2L)
    assert(off(s0, 0L, ReadLimit.maxBytes(1L)) == 1L)
    // rows: 10 per commit, 20 admits two versions
    assert(off(s0, 0L, ReadLimit.maxRows(20L)) == 2L)
    // allAvailable jumps to the latest
    assert(off(s0, 0L, ReadLimit.allAvailable()) == 3L)
    assert(s0.reportLatestOffset()
      .asInstanceOf[GraftLogVersionOffset].version == 3L)
    // default limit derives from the options
    assert(new GraftLogMicroBatchStream(t, schema, 0L,
      maxFilesPerTrigger = Some(1)).getDefaultReadLimit.toString
      .contains("1"))
    assert(s0.getDefaultReadLimit ==
      ReadLimit.allAvailable())
  }

  test("change feed rides through rewrites: deletes, updates and " +
      "inserts emit change-exact; moved-but-unchanged rows drop") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_cdf_").toString
    val cp = Files.createTempDirectory("tlog_cdf_cp_").toString
    TableLog.create(kv((0L to 19L).map(i => (i, s"a$i"))), t, "k", 2)
    TableLog.append(kv((20L to 39L).map(i => (i, s"b$i"))), t, 2)
    // v3: rewrite (COW delete) — the appends-only stream fails here,
    // the change feed must ride through with exactly the deleted rows
    TableLog.deleteWhere(spark, t, col("k").between(5L, 8L), 2)
    // v4: merge — two updates and one fresh insert in one commit
    TableLog.merge(spark, t,
      Seq((30L, "B30"), (31L, "B31"), (100L, "c100")).toDF("k", "v"), 2)
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("tlog_cdf_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tlog_cdf_probe").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3),
          r.getLong(4)))
      val byAction = rows.groupBy(_._2)
      // v1+v2 inserts: all 40 created/appended rows, old_v null
      val v12 = rows.filter(_._5 <= 2L)
      assert(v12.length == 40 && v12.forall(r =>
        r._2 == "insert" && r._3 == null &&
          r._4 == (if (r._1 < 20) s"a${r._1}" else s"b${r._1}")))
      // v3: exactly k=5..8 as deletes with old values; the other 36
      // rows moved files but are value-identical — zero noise
      val v3 = rows.filter(_._5 == 3L)
      assert(v3.map(_._1).sorted.toSeq == Seq(5L, 6L, 7L, 8L), v3.mkString(","))
      assert(v3.forall(r => r._2 == "delete" && r._3 == s"a${r._1}" &&
        r._4 == null))
      // v4: updates carry old AND new; the fresh key is an insert
      val v4 = rows.filter(_._5 == 4L)
      assert(v4.map(r => (r._1, r._2, r._3, r._4)).sortBy(_._1).toSeq == Seq(
        (30L, "update", "b30", "B30"), (31L, "update", "b31", "B31"),
        (100L, "insert", null, "c100")), v4.mkString(","))
      assert(byAction("insert").length == 41)
      // a LIVE commit keeps flowing incrementally
      TableLog.deleteWhere(spark, t, col("k") === 100L, 2)
      q.processAllAvailable()
      val v5 = spark.table("tlog_cdf_probe").collect()
        .filter(_.getLong(4) == 5L)
      assert(v5.length == 1 && v5.head.getLong(0) == 100L &&
        v5.head.getString(1) == "delete")
    } finally q.stop()
  }

  test("change feed rides through DELETION-VECTOR commits: a DV " +
      "delete emits exactly the dead rows, no file ever rewrote") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_cdfdv_").toString
    val cp = Files.createTempDirectory("tlog_cdfdv_cp_").toString
    TableLog.create(kv((0L to 19L).map(i => (i, s"a$i"))), t, "k", 2)
    TableLog.deleteWhereDv(spark, t, col("k").between(3L, 6L)) // v2: DV
    TableLog.updateWhereDv(spark, t, col("k") === 10L,
      Map("v" -> lit("A10"))) // v3: MoR update
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("tlog_cdfdv_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tlog_cdfdv_probe").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3),
          r.getLong(4)))
      // v2: the DV commit changes no relPath, yet the feed sees the
      // dead rows — content identity includes the DV token
      val v2 = rows.filter(_._5 == 2L)
      assert(v2.map(_._1).sorted.toSeq == Seq(3L, 4L, 5L, 6L),
        v2.mkString(","))
      assert(v2.forall(r => r._2 == "delete" && r._3 == s"a${r._1}"))
      // v3: the MoR update emits old AND new images of k=10 only
      val v3 = rows.filter(_._5 == 3L)
      assert(v3.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
        Seq((10L, "update", "a10", "A10")), v3.mkString(","))
    } finally q.stop()
  }

  test("change feed rides through a MERGE-ON-READ MERGE commit: " +
      "update, delete and insert arms emit change-exact in one batch") {
    import spark.implicits._
    import graft.tablelog.TableLog.{MergeArm, MergeTargetPrefix => T, MergeSourcePrefix => S}
    val t = Files.createTempDirectory("tlog_cdfmm_").toString
    val cp = Files.createTempDirectory("tlog_cdfmm_cp_").toString
    TableLog.create(kv((0L to 19L).map(i => (i, s"a$i"))), t, "k", 2)
    TableLog.mergeDv(spark, t,
      Seq((5L, "UPD", "u"), (7L, "", "d"), (100L, "NEW", "i"))
        .toDF("k", "v", "op"),
      col(T + "k") === col(S + "k"),
      matched = Seq(
        MergeArm(Some(col(S + "op") === "d"), "delete"),
        MergeArm(None, "update", Map("v" -> col(S + "v")))),
      notMatched = Seq(MergeArm(None, "insert",
        Map("k" -> col(S + "k"), "v" -> col(S + "v"))))) // v2
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("tlog_cdfmm_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val v2 = spark.table("tlog_cdfmm_probe").collect()
        .filter(_.getLong(4) == 2L)
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3))).sortBy(_._1)
      assert(v2.toSeq == Seq((5L, "update", "a5", "UPD"),
        (7L, "delete", "a7", null), (100L, "insert", null, "NEW")),
        v2.mkString(","))
    } finally q.stop()
  }

  test("skipChangeCommits drops rewrite commits wholesale: appends " +
      "flow, DV and COW deletes never fail or double-count the stream") {
    import spark.implicits._
    val t = Files.createTempDirectory("tlog_skipcc_").toString
    val cp = Files.createTempDirectory("tlog_skipcc_cp_").toString
    TableLog.create(kv((0L to 9L).map(i => (i, s"a$i"))), t, "k", 2)  // v1
    TableLog.deleteWhereDv(spark, t, col("k") < 3L)                   // v2
    TableLog.deleteWhere(spark, t, col("k") === 5L, 1)                // v3
    TableLog.append(kv((10L to 14L).map(i => (i, s"b$i"))), t, 1)     // v4
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("skipChangeCommits", "true").load()
      .writeStream.format("memory").queryName("tlog_skipcc_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("tlog_skipcc_probe").collect()
        .map(_.getLong(0)).sorted.toSeq
      // v1's rows once (v3's rewritten survivors skipped — no
      // double-count), v2's DV adds skipped, v4's appends flow
      assert(got == (0L to 14L), got.mkString(","))
    } finally q.stop()
  }

  test("a rewrite commit in the window fails the stream fast — " +
      "appends-only reads must not double-count") {
    val t = Files.createTempDirectory("tlog_stream3_").toString
    TableLog.create(kv((0L to 9L).map(i => (i, s"a$i"))), t, "k", 2)
    TableLog.compact(spark, t, 1) // v2 is a rewrite
    val stream = new GraftLogMicroBatchStream(t,
      org.apache.spark.sql.types.StructType.fromDDL(
        TableLog.state(t).schemaDdl), startingVersion = 0L)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(GraftLogVersionOffset(0L),
        GraftLogVersionOffset(2L))
    }
    assert(e.getMessage.contains("rewrite"))
    // restarting past the rewrite works: only post-compact appends flow
    TableLog.append(kv((10L to 14L).map(i => (i, s"c$i"))), t, 1)
    val parts = stream.planInputPartitions(GraftLogVersionOffset(2L),
      GraftLogVersionOffset(3L))
    assert(parts.length == 1)
  }

  test("option(branch, name) streams a staging branch by name — the " +
      "WAP audit stream needs no _branches path; bad names refuse") {
    val t = Files.createTempDirectory("tlog_streambr_").toString
    val cp = Files.createTempDirectory("tlog_streambr_cp_").toString
    TableLog.create(kv(Seq(1L -> "main")), t, "k", 1)
    TableLog.branch(t, "audit")
    TableLog.append(kv(Seq(2L -> "staged")),
      java.nio.file.Paths.get(t, "_branches", "audit").toString, 1)
    // the branch's v1 is its FORK (rewrite-shaped to an appends-only
    // reader), so the audit stream skips change commits — it audits
    // the branch's OWN staged appends, which is the WAP shape
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("branch", "audit")
      .option("skipChangeCommits", "true").load()
      .writeStream.format("memory").queryName("tlog_branch_probe")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tlog_branch_probe").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "staged"),
      s"branch audit stream must carry the staged appends: $got")
    // unknown branch and path-component names refuse loudly
    Seq("nope", "..").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        spark.readStream
          .format("graft.sources.GraftLogStreamProvider")
          .option("path", t).option("branch", bad).load()
      }
      assert(e.getMessage.contains("no branch"), e.getMessage)
    }
  }
}
