package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.SparkSuite
import graft.sources.GraftLogScanBuilder

/** Round-10 partition-spec evolution pins (Iceberg's spec-evolution
  * contract): files prune ONLY under their own spec era — the
  * positional-reinterpretation trap is the one that silently loses
  * rows, so it gets the adversarial fixture; chunk envelopes
  * invalidate when the spec evolves past the checkpoint; rewrites
  * migrate the layout; the #partitions table refuses mixed eras. */
class PartitionSpecEvolutionSpec extends SparkSuite {

  private def freshDir(): String =
    Files.createTempDirectory("tlog_pse_").toString + "/t"

  private val emptyOpts = new CaseInsensitiveStringMap(
    java.util.Collections.emptyMap[String, String]())

  test("old-era files are NEVER positionally reinterpreted: a spec " +
      "swap with anti-correlated values keeps them; results exact") {
    import spark.implicits._
    val t = freshDir()
    // grp and cat anti-correlate: under spec 0 (grp) the era-0 file
    // holding cat='x' rows records tuple ('y') — reinterpreting that
    // tuple under spec 1 (cat) would WRONGLY prune cat='x' rows away
    val era0 = Seq((1L, "y", "x"), (2L, "y", "x"), (3L, "x", "y"))
      .toDF("k", "grp", "cat")
    TableLog.create(era0, t, "k", numFiles = 2,
      partCols = Seq("grp"))                                     // v1
    TableLog.setPartitionSpec(t, Seq("cat"))                     // v2
    TableLog.append(Seq((10L, "x", "x"), (11L, "y", "y"))
      .toDF("k", "grp", "cat"), t, numFiles = 2)                 // v3
    val snap = TableLog.state(t)
    assert(snap.partSpecs == Seq(Seq("grp"), Seq("cat")) &&
      snap.specId == 1)
    assert(snap.active.map(_.specId).toSet == Set(0, 1))
    val b = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
    b.pushFilters(Array(EqualTo("cat", "x")))
    // era-0 files all survive (conservative); era-1 files prune exactly
    assert(b.chosenFiles.filter(_.specId == 0).size ==
      snap.active.count(_.specId == 0))
    assert(b.chosenFiles.filter(_.specId == 1)
      .forall(_.parts.forall(_.values == Seq("x"))))
    // and the rows are EXACT across both eras
    val got = TableLog.snapshot(spark, t).where($"cat" === "x")
      .select($"k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 10L))
  }

  test("a compact migrates every file to the current spec; the raw " +
      "temporal predicate then prunes the whole layout; #partitions " +
      "refuses mixed eras and works after migration") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshDir()
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 06:00:00")
    val ev = (0L until 32L).map(i => (i, day((i % 4).toInt + 1)))
      .toDF("k", "ts")
    TableLog.create(ev.where($"k" % 2 === 0), t, "k", numFiles = 2) // v1
    TableLog.setPartitionSpec(t, Seq("days:ts"))                    // v2
    TableLog.append(ev.where($"k" % 2 === 1), t, numFiles = 2)      // v3
    // mixed eras: #partitions must refuse loudly, not mislabel
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM graftlog.`$t#partitions`").collect()
    }
    assert(err.getMessage.contains("spec era"), err.getMessage)
    TableLog.compact(spark, t, 2)                                   // v4
    val snap = TableLog.state(t)
    assert(snap.active.forall(_.specId == 1), "compact must migrate")
    // post-migration: the raw ts predicate prunes day files exactly
    val b = new GraftLogScanBuilder(spark, t, snap, emptyOpts)
    b.pushFilters(Array(org.apache.spark.sql.sources
      .GreaterThanOrEqual("ts", day(4))))
    assert(b.chosenFiles.nonEmpty &&
      b.chosenFiles.size < snap.active.size &&
      b.chosenFiles.forall(_.parts.exists(p =>
        p.values.head >= "2024-03-04")))
    assert(spark.sql(s"SELECT count(*) FROM graftlog.`$t#partitions`")
      .collect().head.getLong(0) == 4L)
    // history carries the spec change as its own auditable commit
    assert(TableLog.history(t).map(_.op)
      == Seq("create", "partspec", "append", "compact"))
  }

  test("spec history survives the chunked checkpoint; envelopes from " +
      "a pre-evolution checkpoint stop pruning but results stay exact") {
    import spark.implicits._
    val t = freshDir()
    def slice(p: String, base: Long) =
      (0L until 16L).map(i => (base + i, p)).toDF("k", "part")
    TableLog.create(slice("a", 0L), t, "k", numFiles = 8,
      partCols = Seq("part"))
    TableLog.append(slice("b", 100L), t, numFiles = 8)
    TableLog.append(slice("c", 200L), t, numFiles = 8)
    TableLog.append(slice("d", 300L), t, numFiles = 8)  // v4 checkpoints
    TableLog.setPartitionSpec(t, Nil)                   // v5: unpartition
    val snap = TableLog.state(t)
    assert(snap.partSpecs == Seq(Seq("part"), Nil) && snap.specId == 1)
    assert(!snap.chunkEnvOk,
      "envelopes of a pre-evolution checkpoint must invalidate")
    // reads stay exact — the stale envelopes must not prune
    assert(TableLog.snapshot(spark, t).where($"part" === "c").count() == 16L)
    // four more commits: the NEXT checkpoint re-validates envelopes
    // under the current spec (here: none — key pruning only)
    (0 until 4).foreach(j => TableLog.append(
      Seq((1000L + j, "e")).toDF("k", "part"), t, numFiles = 1))
    val snap8 = TableLog.state(t)
    assert(snap8.chunkEnvOk && snap8.partSpecs.length == 2)
    assert(TableLog.snapshot(spark, t).count() == 68L)
    // clone carries the full spec history with the per-file eras
    val dst = freshDir()
    TableLog.shallowClone(t, dst)
    val cs = TableLog.state(dst)
    assert(cs.partSpecs == snap8.partSpecs &&
      cs.active.map(_.specId).toSet == Set(0, 1))
  }

  test("migrate_stats lifts the DV refusal WITHOUT moving data: " +
      "stale-era files re-render tuple stats metadata-only, a MoR " +
      "DELETE then lands and #partitions stays exact") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshDir()
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 06:00:00")
    val ev = (0L until 32L).map(i => (i, day((i % 4).toInt + 1)))
      .toDF("k", "ts")
    TableLog.create(ev.where($"k" % 2 === 0), t, "k", numFiles = 2) // v1
    TableLog.setPartitionSpec(t, Seq("days:ts"))                    // v2
    TableLog.append(ev.where($"k" % 2 === 1), t, numFiles = 2)      // v3
    // pre-migration: merge-on-read DML refuses on the stale era,
    // naming the metadata-only remedy
    val e = intercept[IllegalArgumentException] {
      TableLog.deleteWhereDv(spark, t, $"k" === 0L)
    }
    assert(e.getMessage.contains("migrate_stats"), e.getMessage)
    // record the physical layout: migration must not move a byte
    val before = TableLog.state(t).active.map(a => a.relPath ->
      java.nio.file.Files.size(java.nio.file.Paths.get(t, a.relPath)))
      .toMap
    val nStale = TableLog.state(t).active.count(_.specId == 0)
    val r = spark.sql(s"CALL graftlog.migrate_stats('$t')").collect().head
    assert(r.getLong(1) == nStale.toLong, r)
    val snap = TableLog.state(t)
    assert(snap.active.forall(a =>
      a.specId == snap.specId && a.parts.nonEmpty), "migration incomplete")
    val after = snap.active.map(a => a.relPath ->
      java.nio.file.Files.size(java.nio.file.Paths.get(t, a.relPath)))
      .toMap
    assert(after == before, "migrate_stats must be metadata-only")
    // idempotent no-op on a clean layout
    assert(spark.sql(s"CALL graftlog.migrate_stats('$t')")
      .collect().head.getLong(1) == 0L)
    // the MoR delete now routes: zero rewrites, tuple stats exact
    TableLog.deleteWhereDv(spark, t, $"k" === 0L) // k=0 → 2024-03-01
    val st2 = TableLog.state(t)
    assert(st2.active.map(_.relPath).toSet == before.keySet,
      "the DV delete must not rewrite data files")
    val parts = spark.sql(
      s"SELECT * FROM graftlog.`$t#partitions`").collect()
      .map(r2 => r2.getString(0) -> r2.getLong(2)).toMap
    assert(parts == Map("2024-03-01" -> 7L, "2024-03-02" -> 8L,
      "2024-03-03" -> 8L, "2024-03-04" -> 8L), parts)
  }
}
