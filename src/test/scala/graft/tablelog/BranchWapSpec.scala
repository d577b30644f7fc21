package graft.tablelog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Round-10 write-audit-publish pins beyond q482's oracle: publish is
  * fast-forward ONLY (a moved main aborts, nothing half-lands),
  * branch-born files hard-link into main's data dir so the branch
  * directory is deletable after publish, and a branch DV-delete on an
  * inherited file publishes as merge-on-read state main can read. */
class BranchWapSpec extends SparkSuite {

  private def freshDir(): String =
    Files.createTempDirectory("tlog_wap_").toString + "/t"

  private def kv(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("publish refuses a moved main (fast-forward only) and a " +
      "non-branch path") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    TableLog.branch(t, "b1")
    TableLog.append(kv(Seq(2L -> "b")), t, 1) // main moves past the fork
    val before = TableLog.latestVersion(t)
    intercept[java.util.ConcurrentModificationException] {
      TableLog.publish(spark, t, "b1")
    }
    assert(TableLog.latestVersion(t) == before, "a refused publish moved main")
    intercept[IllegalArgumentException] { TableLog.branch(t, "no spaces") }
  }

  test("branch-born files hard-link into main's data dir: the branch " +
      "directory is deletable after publish; main reads survive") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    val br = TableLog.branch(t, "drop")
    TableLog.append(kv(Seq(2L -> "b")), br, 1)
    TableLog.publish(spark, t, "drop")
    val snap = TableLog.state(t)
    assert(snap.active.forall(a => !a.relPath.startsWith("_branches/")),
      s"published state references the branch dir: ${snap.active.map(_.relPath)}")
    // delete the branch wholesale — the adopted hard links keep the bytes
    def rmTree(p: java.nio.file.Path): Unit = {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
    rmTree(Paths.get(t, "_branches"))
    assert(TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "b")))
  }

  test("a branch merge-on-read delete on an inherited file publishes: " +
      "main reads the DV'd state; rows and history exact") {
    val t = freshDir()
    TableLog.create(kv((0L to 9L).map(i => (i, s"x$i"))), t, "k", 1)
    val br = TableLog.branch(t, "gdpr")
    TableLog.deleteWhereDv(spark, br, col("k") === 3L)
    TableLog.append(kv(Seq(100L -> "new")), br, 1)
    val (v, added, removed) = TableLog.publish(spark, t, "gdpr")
    assert(added == 2 && removed == 1,
      s"expected DV re-add + new file vs one removed, got +$added/-$removed")
    val got = TableLog.snapshot(spark, t).select("k").collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq == ((0L to 9L).filterNot(_ == 3L) :+ 100L))
    assert(TableLog.history(t).last.op == "publish" &&
      TableLog.latestVersion(t) == v)
  }

  test("publish carries branch metadata: a schema evolved on the " +
      "branch travels to main in the same atomic commit") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    val br = TableLog.branch(t, "evo")
    TableLog.appendEvolve(
      { import spark.implicits._
        Seq((2L, "b", 9L)).toDF("k", "v", "score") }, br, 1)
    TableLog.publish(spark, t, "evo")
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((1L, -1L), (2L, 9L)))
  }

  test("a publish is rewrite-shaped to downstream consumers: the " +
      "appends-only stream fails loudly across it, the version diff " +
      "reads the published rows as inserts") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)             // v1
    val br = TableLog.branch(t, "drop")
    TableLog.append(kv(Seq(2L -> "b", 3L -> "c")), br, 1)
    TableLog.publish(spark, t, "drop")                          // v2
    // an appends-only incremental feed over the publish would
    // double-count through a rewrite — it must refuse
    intercept[IllegalStateException] {
      TableLog.readAppendsSince(spark, t, sinceVersion = 1L).count()
    }
    // the change-exact diff reads exactly the published rows
    val diff = TableLog.diffVersions(spark, t, 1L, 2L).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(diff.toSeq == Seq((2L, "insert"), (3L, "insert")))
  }

  test("publish never strips main's governance: the per-batch gate " +
      "dropped on the branch returns with the landing") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    TableLog.setProps(t, TableLog.state(t).props +
      ("constraint.v_nonempty" -> "length(v) > 0"))
    val br = TableLog.branch(t, "bulk")
    TableLog.setProps(br, TableLog.state(br).props - "constraint.v_nonempty")
    TableLog.append(kv(Seq(2L -> "b")), br, 1)
    TableLog.publish(spark, t, "bulk")
    assert(TableLog.state(t).props.contains("constraint.v_nonempty"),
      "the branch's dropped per-batch gate stripped main's constraint")
    // and the returned gate actually enforces again
    intercept[IllegalArgumentException] {
      TableLog.append(kv(Seq(3L -> "")), t, 1)
    }
  }
}
