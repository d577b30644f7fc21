package graft.tablelog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** IDENTITY columns ([[TableLog.appendIdentity]]): transactional id
  * allocation, ALWAYS semantics, routing guards, and the
  * concurrency posture (hwm commits are metadata-bearing — a stale
  * allocator aborts instead of rebasing into duplicates). */
class IdentityColumnSpec extends SparkSuite {

  private def freshTable(start: Long = 100L): String = {
    spark.version
    val t = Files.createTempDirectory("tlog_idc_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, v STRING", "id",
      props = Map("identity.id" -> start.toString))
    t
  }

  test("ids are unique, increasing across commits, dense within one; " +
      "the high-water mark advances in the same commit; COW delete " +
      "keeps assigned ids") {
    import spark.implicits._
    val t = freshTable()
    TableLog.appendIdentity(Seq("a", "b", "c").toDF("v"), t, 1)
    TableLog.appendIdentity(Seq("d", "e").toDF("v"), t, 1)
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.map(_._1).toSeq == (100L to 104L),
      s"ids should be dense from the start value, got ${got.toSeq}")
    assert(TableLog.state(t).props("identity.id") == "105")
    // a rewrite of EXISTING rows preserves ids (no re-allocation)
    TableLog.deleteWhere(spark, t, col("id") === 101L, 1)
    val after = TableLog.snapshot(spark, t).collect()
      .map(_.getLong(0)).sorted
    assert(after.toSeq == Seq(100L, 102L, 103L, 104L))
    // the next allocation continues past the mark, never reuses
    TableLog.appendIdentity(Seq("f").toDF("v"), t, 1)
    assert(TableLog.snapshot(spark, t).agg(max("id")).head().getLong(0) == 105L)
  }

  test("ALWAYS semantics and routing guards: explicit ids, plain " +
      "append/merge/replaceWhere and staged appends all refuse; " +
      "declaration rules hold") {
    import spark.implicits._
    val t = freshTable()
    TableLog.appendIdentity(Seq("a").toDF("v"), t, 1)
    intercept[IllegalArgumentException] {
      TableLog.appendIdentity(Seq((9L, "x")).toDF("id", "v"), t, 1)
    }
    intercept[IllegalArgumentException] {
      TableLog.append(Seq((9L, "x")).toDF("id", "v"), t, 1)
    }
    intercept[IllegalArgumentException] {
      TableLog.merge(spark, t, Seq((9L, "x")).toDF("id", "v"), 1)
    }
    intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("id") === 9L,
        Seq((9L, "x")).toDF("id", "v"), 1)
    }
    // INSERT OVERWRITE's staged path brings arbitrary rows too
    intercept[IllegalArgumentException] {
      TableLog.overwriteWhereStaged(spark, t, col("id") === 9L, Nil, 1)
    }
    // staged rewrites (SQL UPDATE/MERGE, truncate-form OVERWRITE)
    // refuse; DELETE — id-preserving by construction — passes through
    intercept[IllegalArgumentException] {
      TableLog.commitStagedRewrite(t, Nil, Nil, "replace")
    }
    intercept[IllegalArgumentException] {
      TableLog.commitStagedRewrite(t, Nil, Nil, "update")
    }
    TableLog.commitStagedRewrite(t, Nil, Nil, "delete") // no-op commit, allowed
    // declaration: must exist, be BIGINT, not also generated; no
    // post-hoc declaration via SET TBLPROPERTIES
    intercept[IllegalArgumentException] {
      TableLog.createEmpty(
        Files.createTempDirectory("tlog_idr_").toString + "/t",
        "id BIGINT, v STRING", "id", props = Map("identity.nope" -> "0"))
    }
    intercept[IllegalArgumentException] {
      TableLog.createEmpty(
        Files.createTempDirectory("tlog_idr_").toString + "/t",
        "id BIGINT, v STRING", "id", props = Map("identity.v" -> "0"))
    }
    val e = intercept[IllegalArgumentException] {
      TableLog.setProps(t, TableLog.state(t).props + ("identity.v" -> "0"))
    }
    assert(e.getMessage.contains("declared at CREATE"))
  }

  test("a stale allocator aborts instead of rebasing into duplicate " +
      "ids: two appendIdentity calls from the SAME snapshot cannot " +
      "both land") {
    import spark.implicits._
    val t = freshTable()
    // simulate the race: capture the snapshot's hwm commit shape by
    // landing one allocation, then hand-replay a commit that claims
    // the same expected version with an identity-props ride
    TableLog.appendIdentity(Seq("a", "b").toDF("v"), t, 1) // v2, hwm 102
    val snap1 = TableLog.state(t)
    TableLog.appendIdentity(Seq("c").toDF("v"), t, 1)      // v3, hwm 103
    // an allocator still holding snap1 (hwm 102) must abort loudly —
    // its props were computed against a superseded ledger
    intercept[java.util.ConcurrentModificationException] {
      TableLog.commit(t, snap1.version, "append", Nil, Nil, "", "",
        props = Some(snap1.props + ("identity.id" -> "104")))
    }
    assert(TableLog.state(t).props("identity.id") == "103")
  }

  test("SQL INSERT INTO allocates identity ids through the same " +
      "freeze-then-assign path as appendIdentity: omit-forms land " +
      "with the mark advanced in-commit; naming the column refuses") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable() // identity.id starts at 100
    spark.sql(s"INSERT INTO graftlog.`$t` (v) VALUES ('a'), ('b')")
    spark.sql(s"INSERT INTO graftlog.`$t` VALUES ('c')") // positional reduced
    spark.sql(s"INSERT INTO graftlog.`$t` BY NAME SELECT 'd' AS v")
    spark.sql(s"INSERT INTO graftlog.`$t` (v) " +
      s"SELECT upper(v) FROM graftlog.`$t` WHERE id = 100") // SELECT form
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((100L, "a"), (101L, "b"), (102L, "c"),
      (103L, "d"), (104L, "A")), got.toString)
    assert(TableLog.state(t).props("identity.id") == "105",
      "the high-water mark must advance with the SQL inserts")
    // ALWAYS: an INSERT naming the identity column refuses, both the
    // column-list and the full-width positional form; table unmoved
    val before = TableLog.latestVersion(t)
    val e1 = intercept[Exception] {
      spark.sql(s"INSERT INTO graftlog.`$t` (id, v) VALUES (9, 'x')")
    }
    assert(e1.getMessage.contains("IDENTITY"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO graftlog.`$t` VALUES (9, 'x')")
    }
    assert(e2.getMessage.contains("IDENTITY"), e2.getMessage)
    assert(TableLog.latestVersion(t) == before,
      "a refused SQL identity insert moved the table")
    // INSERT OVERWRITE keeps its staged-path refusal (arbitrary rows)
    val e3 = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE graftlog.`$t` VALUES (9L, 'x')")
    }
    assert(e3.getMessage.contains("IDENTITY") ||
      e3.getMessage.contains("identity"), e3.getMessage)
  }

  test("SQL UPDATE on an identity table: id-preserving updates land " +
      "through the merge-on-read path; assigning the id refuses") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable()
    TableLog.appendIdentity(Seq("a", "b", "c").toDF("v"), t, 1)
    spark.sql(s"UPDATE graftlog.`$t` SET v = upper(v) WHERE id = 101")
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((100L, "a"), (101L, "B"), (102L, "c")), got.toString)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graftlog.`$t` SET id = 5 WHERE v = 'a'")
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
  }

  test("the SQL INSERT rewrite does ResolveInsertInto's jobs itself: " +
      "store-assignment casts, unknown-column and missing-column " +
      "refusals") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    spark.version
    val t = Files.createTempDirectory("tlog_idcast_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, p DOUBLE, s STRING", "id",
      props = Map("identity.id" -> "1"))
    // an INT literal into the DOUBLE column must CAST at write — an
    // uncast insert stages INT32 parquet that poisons every later read
    spark.sql(s"INSERT INTO graftlog.`$t` (p, s) VALUES (1, 'a')")
    val r = TableLog.snapshot(spark, t).head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 1.0 &&
      r.getString(2) == "a", r.toString)
    // unknown and missing columns refuse loudly
    val e1 = intercept[Exception] {
      spark.sql(s"INSERT INTO graftlog.`$t` (nope, s) VALUES (1, 'x')")
    }
    assert(e1.getMessage.contains("unknown column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO graftlog.`$t` (p) VALUES (2.0)")
    }
    assert(e2.getMessage.contains("must be supplied"), e2.getMessage)
  }

  test("an ALIASED SQL UPDATE routes like the bare form: qualifiers " +
      "strip for the MoR path; duplicate set targets refuse") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable()
    TableLog.appendIdentity(Seq("a", "b").toDF("v"), t, 1)
    spark.sql(
      s"UPDATE graftlog.`$t` AS x SET v = upper(x.v) WHERE x.id = 101")
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((100L, "a"), (101L, "B")), got.toString)
    // duplicate set targets differing only in case refuse, never
    // silently last-win
    val e = intercept[IllegalArgumentException] {
      TableLog.updateWhereDv(spark, t, col("id") === 100L,
        Map("v" -> lit("x"), "V" -> lit("y")))
    }
    assert(e.getMessage.contains("duplicate assignment"), e.getMessage)
  }

  test("updateWhereDv refuses an unknown set key and casts assigned " +
      "values to the column's declared type") {
    import spark.implicits._
    spark.version
    val t = Files.createTempDirectory("tlog_dvset_").toString + "/t"
    TableLog.create(Seq((1L, 1.5), (2L, 2.5)).toDF("k", "p"), t, "k", 1)
    val e = intercept[IllegalArgumentException] {
      TableLog.updateWhereDv(spark, t, col("k") === 1L,
        Map("pp" -> lit(9.0)))
    }
    assert(e.getMessage.contains("no such column"), e.getMessage)
    // INT literal into the DOUBLE column casts; later reads stay sound
    TableLog.updateWhereDv(spark, t, col("k") === 1L, Map("p" -> lit(7)))
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 7.0), (2L, 2.5)), got.toString)
  }

  test("START WITH / INCREMENT BY: identity.<col> = '<next>:<step>' " +
      "allocates in steps, advances the mark by n*step, keeps the " +
      "step across commits; step 0 refuses at CREATE") {
    import spark.implicits._
    spark.version
    val t = Files.createTempDirectory("tlog_idst_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, v STRING", "id",
      props = Map("identity.id" -> "100:5"))
    TableLog.appendIdentity(Seq("a", "b", "c").toDF("v"), t, 1)
    TableLog.appendIdentity(Seq("d").toDF("v"), t, 1)
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((100L, "a"), (105L, "b"), (110L, "c"),
      (115L, "d")), got.toString)
    assert(TableLog.state(t).props("identity.id") == "120:5",
      "the mark must advance by n*step and keep the step")
    intercept[IllegalArgumentException] {
      TableLog.createEmpty(
        Files.createTempDirectory("tlog_idst0_").toString + "/t",
        "id BIGINT, v STRING", "id",
        props = Map("identity.id" -> "100:0"))
    }
  }

  test("a DV update may rewrite non-id columns but never TARGET the " +
      "identity column — set-expressions cannot mint ids past the " +
      "allocator") {
    import spark.implicits._
    val t = freshTable()
    TableLog.appendIdentity(Seq("a", "b", "c").toDF("v"), t, 1)
    val before = TableLog.latestVersion(t)
    val ex = intercept[IllegalArgumentException] {
      TableLog.updateWhereDv(spark, t, col("v") === "b",
        Map("id" -> lit(999L)))
    }
    assert(ex.getMessage.contains("IDENTITY"), ex.getMessage)
    assert(TableLog.latestVersion(t) == before,
      "a refused identity-targeting DV update moved the table")
    // non-id set-expressions pass through — ids were already assigned
    TableLog.updateWhereDv(spark, t, col("v") === "b",
      Map("v" -> lit("B")))
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((100L, "a"), (101L, "B"), (102L, "c")), got.toString)
  }

  test("stepped identity composes with the SQL INSERT path: ids " +
      "allocate at the declared INCREMENT across statements") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    spark.version
    val t = Files.createTempDirectory("tlog_idstep_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, v STRING", "id",
      props = Map("identity.id" -> "10:10"))
    spark.sql(s"INSERT INTO graftlog.`$t` (v) VALUES ('a'), ('b')")
    spark.sql(s"INSERT INTO graftlog.`$t` (v) VALUES ('c')")
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((10L, "a"), (20L, "b"), (30L, "c")), got.toString)
    assert(TableLog.state(t).props("identity.id") == "40:10")
  }
}
