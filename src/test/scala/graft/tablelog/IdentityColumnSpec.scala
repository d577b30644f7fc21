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
    // staged rewrites (SQL UPDATE/MERGE, truncate-form OVERWRITE) no
    // longer refuse wholesale: the commit's completion pass AUDITS
    // carried ids against the pre-image and allocates nulls — an
    // empty rewrite is a plain no-op commit on every op
    TableLog.commitStagedRewrite(t, Nil, Nil, "replace")
    TableLog.commitStagedRewrite(t, Nil, Nil, "update")
    TableLog.commitStagedRewrite(t, Nil, Nil, "delete")
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

  test("SQL UPDATE on a PARTITIONED identity table lands through the " +
      "partitioned MoR path: ids preserved, tuple stats exact") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    spark.version
    val t = Files.createTempDirectory("tlog_idpart_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, grp STRING, v STRING", "id",
      partCols = Seq("grp"), props = Map("identity.id" -> "100"))
    TableLog.appendIdentity(
      Seq(("g0", "a"), ("g1", "b"), ("g0", "c")).toDF("grp", "v"), t, 1)
    spark.sql(s"UPDATE graftlog.`$t` SET v = upper(v) WHERE grp = 'g0'")
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((100L, "g0", "A"), (101L, "g1", "b"),
      (102L, "g0", "C")), got.toString)
    // per-tuple stats stayed exact through the DV update
    val tupleRows = TableLog.state(t).active.flatMap(_.parts)
      .groupBy(_.values.head).map { case (k, ps) => k -> ps.map(_.rows).sum }
    assert(tupleRows == Map("g0" -> 2L, "g1" -> 1L), tupleRows.toString)
    // the allocator keeps working after the update
    TableLog.appendIdentity(Seq(("g1", "d")).toDF("grp", "v"), t, 1)
    assert(TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L))
  }

  test("EXACT-case duplicate SQL UPDATE targets refuse at analysis — " +
      "never silently last-win through the set map") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshTable()
    TableLog.appendIdentity(Seq("a").toDF("v"), t, 1)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graftlog.`$t` SET v = 'x', v = 'y' WHERE id = 100")
    }
    assert(e.getMessage.contains("duplicate assignment"), e.getMessage)
    assert(TableLog.snapshot(spark, t).head().getString(1) == "a")
  }

  test("SQL MERGE on an identity+gencol table: insert arm allocates, " +
      "update arm preserves ids and recomputes the gencol, arms " +
      "assigning the id refuse") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    spark.version
    val t = Files.createTempDirectory("tlog_idmrg_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, k BIGINT, v STRING, vu STRING",
      "k", props = Map("identity.id" -> "100", "gencol.vu" -> "upper(v)"))
    TableLog.appendIdentity(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, 1)
    Seq((2L, "bee"), (3L, "cee")).toDF("k", "v")
      .createOrReplaceTempView("idmrg_src")
    spark.sql(
      s"""MERGE INTO graftlog.`$t` AS tgt USING idmrg_src AS src
         |ON tgt.k = src.k
         |WHEN MATCHED THEN UPDATE SET v = src.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.v)
         |""".stripMargin)
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == Seq((100L, 1L, "a", "A"), (101L, 2L, "bee", "BEE"),
      (102L, 3L, "cee", "CEE")), got.toString)
    // the mark advanced IN the merge commit: the next insert continues
    spark.sql(s"INSERT INTO graftlog.`$t` (k, v) VALUES (4, 'd')")
    assert(TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 103L))
    // an arm ASSIGNING the identity column refuses loudly
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` AS tgt USING idmrg_src AS src
           |ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET id = 5, v = src.v
           |""".stripMargin)
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    // ... including an explicit NULL on the UPDATE arm — letting it
    // through would silently RE-allocate an existing row's id
    val eNull = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO graftlog.`$t` AS tgt USING idmrg_src AS src
           |ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET id = NULL, v = src.v
           |""".stripMargin)
    }
    assert(eNull.getMessage.contains("IDENTITY"), eNull.getMessage)
  }

  test("API merge on an identity table: matched keys inherit their " +
      "ids, inserts allocate, the changes frame must omit the column") {
    import spark.implicits._
    spark.version
    val t = Files.createTempDirectory("tlog_idamrg_").toString + "/t"
    TableLog.createEmpty(t, "id BIGINT, k BIGINT, v STRING", "k",
      props = Map("identity.id" -> "10"))
    TableLog.appendIdentity(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, 1)
    // k=2 updates (keeps id 11), k=3 inserts (allocates 12)
    TableLog.merge(spark, t, Seq((2L, "B"), (3L, "c")).toDF("k", "v"), 1)
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((10L, 1L, "a"), (11L, 2L, "B"), (12L, 3L, "c")),
      got.toString)
    assert(TableLog.state(t).props("identity.id") == "13")
    // explicit ids in the changes frame refuse — ALWAYS
    val e = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t,
        Seq((99L, 4L, "x")).toDF("id", "k", "v"), 1)
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    // a merge KEYED on the identity column refuses with guidance
    val t2 = Files.createTempDirectory("tlog_idamrg2_").toString + "/t"
    TableLog.createEmpty(t2, "id BIGINT, v STRING", "id",
      props = Map("identity.id" -> "0"))
    val e2 = intercept[IllegalArgumentException] {
      TableLog.merge(spark, t2, Seq("x").toDF("v"), 1)
    }
    assert(e2.getMessage.contains("merge key"), e2.getMessage)
  }

  test("the exactly-once streaming sink feeds an identity-KEYED " +
      "gencol table: ids allocate per micro-batch inside the txn " +
      "commit, a redelivered epoch is a no-op, explicit ids refuse") {
    import spark.implicits._
    spark.version
    val root = Files.createTempDirectory("tlog_idsink_").toString
    val t = s"$root/t"
    TableLog.createEmpty(t, "id BIGINT, v STRING, vu STRING", "id",
      props = Map("identity.id" -> "0", "gencol.vu" -> "upper(v)"))
    val src = Seq("a", "b", "c").toDF("v")
    src.coalesce(1).write.parquet(s"$root/in")
    def runOnce(cp: String): Unit = {
      val q = spark.readStream.schema(src.schema).parquet(s"$root/in")
        .writeStream.format("graft.sources.GraftLogStreamProvider")
        .option("path", t).option("txnAppId", "idsink-spec")
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce(s"$root/_cp1")
    val v1 = TableLog.latestVersion(t)
    runOnce(s"$root/_cp2") // fresh checkpoint: txn ledger drops epoch 0
    assert(TableLog.latestVersion(t) == v1,
      "a redelivered epoch must not even bump the version")
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((0L, "a", "A"), (1L, "b", "B"), (2L, "c", "C")),
      got.toString)
    assert(TableLog.state(t).props("identity.id") == "3")
    // a second delivery of NEW data continues the sequence
    Seq("d").toDF("v").coalesce(1).write.mode("append")
      .parquet(s"$root/in")
    runOnce(s"$root/_cp1")
    assert(TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // a stream SUPPLYING the identity column refuses at write build
    val bad = intercept[Exception] {
      val q = spark.readStream
        .schema(Seq((9L, "x")).toDF("id", "v").schema)
        .parquet(s"$root/in")
        .writeStream.format("graft.sources.GraftLogStreamProvider")
        .option("path", t).option("checkpointLocation", s"$root/_cp3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(bad.getMessage != null)
  }

  test("DDL-native spelling: GENERATED ALWAYS AS IDENTITY (START WITH " +
      "/ INCREMENT BY) and GENERATED ALWAYS AS (expr) in the CREATE " +
      "column list lower onto the engine's declarations") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    spark.version
    val t = Files.createTempDirectory("tlog_idddl_").toString + "/t"
    spark.sql(
      s"""CREATE TABLE graftlog.`$t` (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY
         |    (START WITH 7 INCREMENT BY 3),
         |  k BIGINT,
         |  v STRING,
         |  vu STRING GENERATED ALWAYS AS (upper(v))
         |) TBLPROPERTIES ('key' = 'k')""".stripMargin)
    val props = TableLog.state(t).props
    assert(props.get("identity.id").contains("7:3"), props.toString)
    assert(props.get("gencol.vu").contains("upper(v)"), props.toString)
    // the whole write surface works off the DDL declaration
    spark.sql(s"INSERT INTO graftlog.`$t` (k, v) VALUES (1, 'a'), (2, 'b')")
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == Seq((7L, 1L, "a", "A"), (10L, 2L, "b", "B")),
      got.toString)
    // GENERATED BY DEFAULT refuses: the allocator contract is ALWAYS
    val t2 = Files.createTempDirectory("tlog_idddl2_").toString + "/t"
    val e = intercept[Exception] {
      spark.sql(
        s"""CREATE TABLE graftlog.`$t2` (
           |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
           |  k BIGINT
           |) TBLPROPERTIES ('key' = 'k')""".stripMargin)
    }
    assert(e.getMessage.contains("ALWAYS"), e.getMessage)
  }

  test("SET TBLPROPERTIES cannot corrupt the allocator: rewound mark, " +
      "zero step, flipped direction and unparseable values refuse; a " +
      "legal advance commits") {
    import spark.implicits._
    val t = freshTable()
    TableLog.appendIdentity(Seq("a", "b").toDF("v"), t, 1) // hwm -> 102
    val props = TableLog.state(t).props
    def trySet(v: String): IllegalArgumentException =
      intercept[IllegalArgumentException] {
        TableLog.setProps(t, props + ("identity.id" -> v))
      }
    assert(trySet("50").getMessage.contains("rewinds"))
    assert(trySet("200:0").getMessage.contains("INCREMENT BY 0"))
    assert(trySet("200:-1").getMessage.contains("direction"))
    assert(trySet("abc").getMessage.contains("unparseable"))
    // UNSET is refused too: dropping the property would open
    // explicit-id writes and lose the mark irrecoverably
    val eUnset = intercept[IllegalArgumentException] {
      TableLog.setProps(t, props - "identity.id")
    }
    assert(eUnset.getMessage.contains("UNSET"), eUnset.getMessage)
    // a legal forward move (e.g. reserving a gap) is allowed
    TableLog.setProps(t, props + ("identity.id" -> "500"))
    TableLog.appendIdentity(Seq("c").toDF("v"), t, 1)
    assert(TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 101L, 500L))
  }

  test("replaceWhere admits an ID-PRESERVING slice restatement: ids " +
      "stable, outside rows untouched, the mark unmoved; smuggled, " +
      "null, duplicate or omitted ids refuse") {
    import spark.implicits._
    val t = freshTable()
    TableLog.appendIdentity(Seq("a", "b", "c", "d").toDF("v"), t, 1)
    // restate the slice id IN (101, 102) with corrected payloads,
    // carrying the SAME ids — the backfill/correction shape
    val cond = col("id").isin(101L, 102L)
    TableLog.replaceWhere(spark, t, cond,
      Seq((101L, "B"), (102L, "C")).toDF("id", "v"), 1)
    val got = TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((100L, "a"), (101L, "B"), (102L, "C"),
      (103L, "d")), s"restatement wrong: $got")
    // the allocator mark never moved — no id was minted
    assert(TableLog.state(t).props("identity.id") == "104")
    // a restatement may DROP slice rows (ids stay a subset)
    TableLog.replaceWhere(spark, t, col("id") === 103L,
      Seq.empty[(Long, String)].toDF("id", "v"), 1)
    assert(TableLog.snapshot(spark, t).count() == 3L)
    // smuggled id (not in the slice pre-image) refuses
    val e1 = intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("id") === 101L,
        Seq((999L, "x")).toDF("id", "v"), 1)
    }
    assert(e1.getMessage.contains("satisfy the replace predicate") ||
      e1.getMessage.contains("pre-image"), e1.getMessage)
    // an in-slice-shaped smuggle: cond matches the id, but the row
    // never existed — pre-image audit catches it
    val e2 = intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("id") === 998L,
        Seq((998L, "x")).toDF("id", "v"), 1)
    }
    assert(e2.getMessage.contains("pre-image"), e2.getMessage)
    // duplicate ids refuse
    val e3 = intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("id") === 101L,
        Seq((101L, "x"), (101L, "y")).toDF("id", "v"), 1)
    }
    assert(e3.getMessage.contains("not id-preserving"), e3.getMessage)
    // omitting the id column refuses (no omit-and-allocate) — the
    // cond keys on the payload so the frame stays resolvable
    val e4 = intercept[IllegalArgumentException] {
      TableLog.replaceWhere(spark, t, col("v") === "B",
        Seq("B").toDF("v"), 1)
    }
    assert(e4.getMessage.contains("CARRY the ids"), e4.getMessage)
    // ids stable through all the refusals
    assert(TableLog.snapshot(spark, t).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L))
  }
}
