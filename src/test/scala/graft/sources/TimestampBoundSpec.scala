package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.tablelog.TableLog

/** Timestamp-bounded feeds: the streaming source's
  * `startingTimestamp` option, the `graft_table_changes_between`
  * TVF, and the commit-stamp MONOTONICITY CLAMP that makes both
  * sound — a foreign/legacy writer's future-dated stamp must not let
  * a later commit land with a SMALLER stamp (the binary search would
  * silently resolve wrong versions under non-monotone stamps). */
class TimestampBoundSpec extends SparkSuite {

  private def kv(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def freshTable(): String = {
    val t = Files.createTempDirectory("tlog_tsb_").toString + "/t"
    TableLog.create(kv((0L until 10L).map(i => (i, s"a$i"))), t, "k", 1) // v1
    Thread.sleep(15)
    TableLog.append(kv((10L until 20L).map(i => (i, s"b$i"))), t, 1)    // v2
    Thread.sleep(15)
    TableLog.append(kv((20L until 30L).map(i => (i, s"c$i"))), t, 1)    // v3
    t
  }

  test("startingTimestamp replays exactly the commits stamped " +
      "at-or-after the instant; exclusive with startingVersion") {
    val t = freshTable()
    val t2 = TableLog.commitStamp(t, 2L)
    val cp = Files.createTempDirectory("tlog_tsb_cp_").toString
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("startingTimestamp", t2.toString).load()
      .writeStream.format("memory").queryName("tsb_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val keys = spark.table("tsb_probe").collect().map(_.getLong(0)).sorted
      assert(keys.toSeq == (10L until 30L),
        s"expected v2+v3 rows only, got ${keys.length} rows")
    } finally q.stop()
    intercept[IllegalArgumentException] {
      GraftLogStartingBound.resolve(t,
        Map("startingVersion" -> "1",
          "startingTimestamp" -> t2.toString).get(_).orNull)
    }
    // a FUTURE instant starts empty and waits (firstVersionAtOrAfter
    // = latest + 1), never throws
    assert(TableLog.firstVersionAtOrAfter(t,
      TableLog.commitStamp(t, 3L) + 60000L) == 4L)
  }

  test("graft_table_changes_between diffs the snapshots AS OF the " +
      "two instants") {
    graft.GraftFunctions.install(spark)
    val t = freshTable()
    val from = TableLog.commitStamp(t, 1L)
    val to = TableLog.commitStamp(t, 2L)
    val got = spark.sql(
      s"SELECT k, action FROM graft_table_changes_between('$t', $from, $to)")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq == (10L until 20L).map(_ -> "insert"),
      s"expected v2's inserts, got ${got.length} rows")
  }

  test("commit stamps clamp non-decreasing: a future-dated stamp " +
      "cannot be followed by a smaller one, and TIMESTAMP AS OF " +
      "resolution stays exact across the clamp") {
    val t = Files.createTempDirectory("tlog_tsb_").toString + "/t"
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)                     // v1
    // simulate a foreign writer with a stepped-forward clock: v2 is
    // hand-written with a stamp far in the future
    val future = System.currentTimeMillis() + 3600L * 1000L
    Files.writeString(Paths.get(t, "_log", f"v${2L}%016d.commit"),
      s"op append\nts $future\nkey k\nschema \n")
    // the API append lands v3: its stamp MUST clamp to >= v2's even
    // though the local clock is an hour behind the foreign stamp
    TableLog.append(kv(Seq(2L -> "b")), t, 1)                          // v3
    val s2 = TableLog.commitStamp(t, 2L)
    val s3 = TableLog.commitStamp(t, 3L)
    assert(s3 >= s2, s"v3 stamp $s3 regressed below v2's $s2 — the " +
      "monotonicity clamp is broken and binary-search time travel " +
      "would silently resolve wrong versions")
    // the binary search resolves the LATEST version at the shared
    // stamp — exactly what the linear scan would have answered
    assert(TableLog.versionAtTimestamp(t, s3) == 3L)
    assert(TableLog.versionAtTimestamp(t, s2 - 1L) == 1L)
  }

  test("startingTag resolves the feed boundary through a named ref: " +
      "the stream replays exactly the commits AFTER the tag") {
    val t = freshTable() // v1..v3
    TableLog.tag(t, "trained_on", 2L) // v4 (metadata)
    val cp = Files.createTempDirectory("tlog_tag_cp_").toString
    val q = spark.readStream
      .format("graft.sources.GraftLogStreamProvider")
      .option("path", t).option("startingTag", "trained_on").load()
      .writeStream.format("memory").queryName("tag_probe")
      .option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
      val keys = spark.table("tag_probe").collect().map(_.getLong(0)).sorted
      assert(keys.toSeq == (20L until 30L),
        s"expected only v3's rows (after the v2 tag), got ${keys.length}")
    } finally q.stop()
    // unknown tag refuses loudly; exclusivity holds
    intercept[IllegalArgumentException] {
      GraftLogStartingBound.resolve(t, Map("startingTag" -> "nope").get(_).orNull)
    }
    intercept[IllegalArgumentException] {
      GraftLogStartingBound.resolve(t,
        Map("startingTag" -> "trained_on", "startingVersion" -> "1")
          .get(_).orNull)
    }
  }
}
