package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Snapshot TAGS ([[TableLog.tag]]): immutable named refs that make
  * a version addressable from SQL (`VERSION AS OF '<name>'`) and pin
  * its files from every vacuum variant until dropped — the Iceberg
  * ref-reachability rule. */
class SnapshotTagSpec extends SparkSuite {

  private def fresh(): String = {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = Files.createTempDirectory("tlog_tag_").toString + "/t"
    TableLog.create((1L to 8L).map(i => (i, s"v$i")).toDF("k", "v"),
      t, "k", 2)
    t
  }

  test("tag pins a version for VERSION AS OF by name; #tags lists it; " +
      "tags are immutable; all-digit and unknown names refuse") {
    import spark.implicits._
    val t = fresh()                                       // v1
    spark.sql(s"CALL graftlog.tag('$t', 'corpus_v1')")    // v2 (pins v1)
    TableLog.append(Seq((100L, "new")).toDF("k", "v"), t, 1) // v3
    assert(spark.sql(
      s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 'corpus_v1'")
      .head().getLong(0) == 8L, "tag must read the pinned era")
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .head().getLong(0) == 9L)
    val tags = spark.sql(s"SELECT tag_name, version FROM graftlog.`$t#tags`")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tags == Seq(("corpus_v1", 1L)), tags.toString)
    intercept[IllegalArgumentException] { TableLog.tag(t, "corpus_v1", 3L) }
    intercept[IllegalArgumentException] { TableLog.tag(t, "123") }
    intercept[IllegalArgumentException] { TableLog.tag(t, "late", 99L) }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graftlog.`$t` VERSION AS OF 'nope'")
    }
  }

  test("a tag pins its files from vacuum (plain and retention-windowed); " +
      "drop_tag releases them") {
    import spark.implicits._
    val t = fresh()                                       // v1: 8 rows
    spark.sql(s"CALL graftlog.tag('$t', 'rel1')")         // v2 pins v1
    val v1Files = TableLog.state(t, 1L).active.map(_.relPath)
    // rewrite everything: v1's files become historical-only (v3's
    // intermediate survivors are NOT tagged and may reclaim)
    TableLog.deleteWhere(spark, t, col("k") <= 4L, 2)     // v3
    TableLog.compact(spark, t, 1)                         // v4
    TableLog.vacuum(t, graceMillis = 0L)
    assert(v1Files.forall(p =>
      Files.exists(java.nio.file.Paths.get(t, p))),
      "vacuum must keep every file of the tagged v1")
    TableLog.vacuumRetain(t, 1, graceMillis = 0L)
    assert(v1Files.forall(p =>
      Files.exists(java.nio.file.Paths.get(t, p))),
      "retention vacuum must also honor the pin")
    // the tagged era stays exactly readable
    assert(spark.sql(
      s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 'rel1'")
      .head().getLong(0) == 8L)
    // release the pin: the pinned files become reclaimable and go
    spark.sql(s"CALL graftlog.drop_tag('$t', 'rel1')")
    assert(TableLog.vacuum(t, graceMillis = 0L) > 0,
      "after drop_tag the pinned files must reclaim")
    assert(!v1Files.forall(p =>
      Files.exists(java.nio.file.Paths.get(t, p))),
      "dropping the tag must release v1's files to the vacuum")
    // head unaffected throughout
    assert(TableLog.snapshot(spark, t).count() == 4L)
  }

  test("tags compose with WAP: tagging main never wedges an open " +
      "branch's publish, main's refs survive it, and a branch-local " +
      "tag does not travel") {
    import spark.implicits._
    val t = fresh()                                        // v1
    TableLog.tag(t, "pre_fork")        // inherited refs must NOT fork
    val br = TableLog.branch(t, "drop")
    assert(TableLog.listTags(br).isEmpty,
      "a fork renumbers history — inherited tag refs must strip")
    TableLog.shallowClone(t, t + "_sc")
    assert(TableLog.listTags(t + "_sc").isEmpty,
      "a clone renumbers history — tag refs must strip")
    TableLog.append(Seq((100L, "new")).toDF("k", "v"), br, 1)
    TableLog.tag(br, "staging_probe")  // branch-local ref
    TableLog.tag(t, "rel_a")           // main moves (tag-only) post-fork
    TableLog.publish(spark, t, "drop") // tag-only interim → still lands
    val names = TableLog.listTags(t).map(_._1)
    assert(names == Seq("pre_fork", "rel_a"),
      s"main must keep its refs and never adopt branch-local ones: $names")
    // main's ref still resolves and still reads its pinned era
    assert(spark.sql(
      s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 'rel_a'")
      .head().getLong(0) == 8L)
    assert(TableLog.snapshot(spark, t).count() == 9L)
  }
}
