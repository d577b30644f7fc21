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

  test("publish REBASES a disjoint-moved main: interim appends and the " +
      "branch delta both land; a non-branch path refuses") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    val br = TableLog.branch(t, "b1")
    TableLog.append(kv(Seq(3L -> "c")), br, 1)  // branch delta
    TableLog.append(kv(Seq(2L -> "b")), t, 1)   // main moves past the fork
    TableLog.publish(spark, t, "b1")            // disjoint → rebase lands
    val got = TableLog.snapshot(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"rebase must keep BOTH sides' rows, got $got")
    intercept[IllegalArgumentException] { TableLog.branch(t, "no spaces") }
  }

  test("publish-rebase refusals: an overlapping file rewrite and a " +
      "metadata move on main both abort loudly with main unmoved") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a", 2L -> "b")), t, "k", 1)
    // overlap: both sides rewrite the file holding k=1
    val br = TableLog.branch(t, "clash")
    TableLog.deleteWhere(spark, br, col("k") === 1L, 1)
    TableLog.deleteWhere(spark, t, col("k") === 2L, 1) // same file on main
    val before = TableLog.latestVersion(t)
    val e1 = intercept[java.util.ConcurrentModificationException] {
      TableLog.publish(spark, t, "clash")
    }
    assert(e1.getMessage.contains("both sides touched"), e1.getMessage)
    assert(TableLog.latestVersion(t) == before, "a refused publish moved main")
    // metadata move: main evolves props after an independent fork
    val br2 = TableLog.branch(t, "meta")
    TableLog.append(kv(Seq(9L -> "z")), br2, 1)
    TableLog.setProps(t, TableLog.state(t).props + ("owner" -> "ops"))
    val e2 = intercept[java.util.ConcurrentModificationException] {
      TableLog.publish(spark, t, "meta")
    }
    assert(e2.getMessage.contains("metadata moved"), e2.getMessage)
  }

  test("a rebase audits main's INTERIM files against branch-added " +
      "constraints: violating interim rows refuse the landing, " +
      "compliant ones land with the constraint installed") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    val br = TableLog.branch(t, "gate")
    TableLog.setProps(br, TableLog.state(br).props +
      ("constraint.v_nonempty" -> "length(v) > 0"))
    TableLog.append(kv(Seq(2L -> "b")), br, 1)
    // main's interim append VIOLATES the branch's new gate — landing
    // it would declare an ENFORCED constraint over rows it never saw
    TableLog.append(kv(Seq(3L -> "")), t, 1)
    val before = TableLog.latestVersion(t)
    val ex = intercept[IllegalArgumentException] {
      TableLog.publish(spark, t, "gate")
    }
    assert(ex.getMessage.contains("v_nonempty"), ex.getMessage)
    assert(TableLog.latestVersion(t) == before,
      "a refused interim-audit publish moved main")
    // compliant interim rows: same shape, clean value → lands
    val t2 = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t2, "k", 1)
    val br2 = TableLog.branch(t2, "gate")
    TableLog.setProps(br2, TableLog.state(br2).props +
      ("constraint.v_nonempty" -> "length(v) > 0"))
    TableLog.append(kv(Seq(2L -> "b")), br2, 1)
    TableLog.append(kv(Seq(3L -> "c")), t2, 1)
    TableLog.publish(spark, t2, "gate")
    assert(TableLog.state(t2).props.contains("constraint.v_nonempty"))
    assert(TableLog.snapshot(spark, t2).count() == 3L)
  }

  test("a rebase keeps main's interim compaction of files the branch " +
      "left untouched, and a branch DV-delete rebases onto appends") {
    val t = freshDir()
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t, "k", 4)
    val br = TableLog.branch(t, "mor")
    // branch: merge-on-read delete on an inherited file
    TableLog.deleteWhereDv(spark, br, col("k") === 2L)
    // main: interim APPEND (touches nothing the branch touched)
    TableLog.append(kv(Seq(100L -> "new")), t, 1)
    TableLog.publish(spark, t, "mor")
    val got = TableLog.snapshot(spark, t).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L to 7L).filterNot(_ == 2L) :+ 100L).sorted,
      s"rebased MoR publish wrong: $got")
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

  test("publish audits the branch DELTA when the branch adds no " +
      "constraint, and the full head when it does") {
    val t = freshDir()
    TableLog.create(kv((0L to 19L).map(i => (i, s"x$i"))), t, "k", 4) // v1
    TableLog.setProps(t, TableLog.state(t).props +
      ("constraint.v_nonempty" -> "length(v) > 0"))                   // v2
    val br = TableLog.branch(t, "drop")
    TableLog.append(kv(Seq(100L -> "new")), br, 1)
    val m = TableLog.state(t)
    val b = TableLog.state(br)
    // same constraint set → only the branch-born file is audited,
    // never the 4 files inherited unchanged from main
    val delta = TableLog.publishAuditScope(t, br, m, b)
    assert(delta.size == 1 && b.active.size == 5,
      s"delta audit should price 1 branch-born file of ${b.active.size}, " +
        s"got ${delta.size}")
    // a branch-ADDED constraint was never checked against inherited
    // files → the audit must scan the full branch head
    TableLog.setProps(br, TableLog.state(br).props +
      ("constraint.k_small" -> "k < 1000"))
    val b2 = TableLog.state(br)
    val full = TableLog.publishAuditScope(t, br, m, b2)
    assert(full.size == b2.active.size,
      s"constraint-adding publish must audit all ${b2.active.size} " +
        s"files, got ${full.size}")
    // and the delta-scoped gate still BLOCKS a dirty drop: violating
    // rows live in the branch-born file, which IS in scope
    TableLog.setProps(br, TableLog.state(br).props - "constraint.k_small"
      - "constraint.v_nonempty")
    TableLog.append(kv(Seq(101L -> "")), br, 1)
    val before = TableLog.latestVersion(t)
    val ex = intercept[IllegalArgumentException] {
      TableLog.publish(spark, t, "drop")
    }
    assert(ex.getMessage.contains("v_nonempty"))
    assert(TableLog.latestVersion(t) == before)
  }

  test("a branch cannot WEAKEN main's governance by redefining a " +
      "constraint name: the publish audit evaluates BOTH predicates") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    TableLog.setProps(t, TableLog.state(t).props +
      ("constraint.v_nonempty" -> "length(v) > 0"))
    val br = TableLog.branch(t, "weak")
    // redefine (not drop) the gate to a tautology, then violate it
    TableLog.setProps(br, TableLog.state(br).props +
      ("constraint.v_nonempty" -> "true"))
    TableLog.append(kv(Seq(2L -> "")), br, 1)
    val before = TableLog.latestVersion(t)
    val e = intercept[IllegalArgumentException] {
      TableLog.publish(spark, t, "weak")
    }
    assert(e.getMessage.contains("v_nonempty"),
      s"the audit must fire MAIN's predicate, got: ${e.getMessage}")
    assert(TableLog.latestVersion(t) == before,
      "a weakened-gate publish moved main")
  }

  test("branch forks O(chunks): the v1 manifest re-references main's " +
      "checkpoint chunks instead of re-listing every active file") {
    val t = freshDir()
    // enough commits past a checkpoint for chunked refs + a tail
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t, "k", 4)  // v1
    (1 to 4).foreach(i =>                                             // v2..v5
      TableLog.append(kv(Seq((100L + i) -> s"y$i")), t, 2))
    // checkpointEvery = 4 → chunked checkpoint at v4, tail v5
    val br = TableLog.branch(t, "fork")
    val v1 = Files.readString(
      Paths.get(br, "_log", f"v${1L}%016d.commit"))
    assert(!v1.linesIterator.exists(l =>
      l.startsWith("add ") || l.startsWith("addt ")),
      s"O(chunks) fork must not re-list files in the v1 commit:\n$v1")
    val ck = Files.readString(
      Paths.get(br, "_log", f"v${1L}%016d.checkpoint"))
    val chunkLines = ck.linesIterator.filter(_.startsWith("chunk ")).toSeq
    assert(chunkLines.exists(_.contains("../")),
      s"fork checkpoint should re-reference main's chunks:\n$ck")
    // the fork is exact: branch state == main state, and both keep
    // working through branch-side writes and a publish
    val bGot = TableLog.snapshot(spark, br).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    val mGot = TableLog.snapshot(spark, t).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(bGot == mGot, s"forked state diverges: $bGot vs $mGot")
    TableLog.deleteWhere(spark, br, col("k") === 3L, numFiles = 1)
    TableLog.append(kv(Seq(200L -> "z")), br, 1)
    TableLog.publish(spark, t, "fork")
    val pub = TableLog.snapshot(spark, t).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(pub == (mGot.filterNot(_ == 3L) :+ 200L).sorted,
      s"post-publish state wrong: $pub")
  }

  test("commit-grain consumers see an O(chunks) fork's inherited files " +
      "as v1 adds: streams and history deltas keep the initial snapshot") {
    val t = freshDir()
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t, "k", 4)
    (1 to 4).foreach(i =>
      TableLog.append(kv(Seq((100L + i) -> s"y$i")), t, 1))
    val br = TableLog.branch(t, "feed") // chunked fork: empty v1 commit
    val v1 = TableLog.commits(br, upTo = 1L).head
    assert(v1.op == "branch" && v1.adds.nonEmpty &&
      v1.adds.map(_.rows).sum == 12L,
      s"hydrated v1 should carry the full inherited set, got " +
        s"${v1.adds.size} adds")
  }

  test("a forked branch's own later checkpoint stays incremental and " +
      "its reads stay exact across inherited-file rewrites") {
    val t = freshDir()
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t, "k", 4)  // v1
    (1 to 3).foreach(i =>
      TableLog.append(kv(Seq((100L + i) -> s"y$i")), t, 1))          // v2..v4
    val br = TableLog.branch(t, "long")                               // ckpt@v1
    // push the branch past its own checkpoint cadence, including a
    // rewrite of inherited files (dirty-chunk path)
    TableLog.deleteWhere(spark, br, col("k") === 1L, numFiles = 1)    // v2
    TableLog.append(kv(Seq(201L -> "a")), br, 1)                      // v3
    TableLog.append(kv(Seq(202L -> "b")), br, 1)                      // v4 → ckpt
    TableLog.append(kv(Seq(203L -> "c")), br, 1)                      // v5
    assert(Files.exists(Paths.get(br, "_log", f"v${4L}%016d.checkpoint")),
      "branch should checkpoint on its own cadence")
    val got = TableLog.snapshot(spark, br).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = ((0L to 7L).filterNot(_ == 1L) ++
      Seq(101L, 102L, 103L, 201L, 202L, 203L)).sorted
    assert(got == want, s"branch reads diverged after own checkpoint: $got")
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

  test("fork ownership is the v1 COMMIT: a crashed chunked fork " +
      "(commit landed, checkpoint never linked) reads LOUDLY, never " +
      "as an empty branch; the name stays owned until cleared") {
    val t = freshDir()
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t, "k", 4)  // v1
    (1 to 4).foreach(i =>                                             // v2..v5
      TableLog.append(kv(Seq((100L + i) -> s"y$i")), t, 2))
    val br = TableLog.branch(t, "crashy") // chunked fork: ckpt + v1 commit
    // the protocol marker is transient — it must NOT surface in a
    // healthy branch's props (state reads the checkpoint header)
    assert(!TableLog.state(br).props.contains("branch.ckpt"),
      "the fork-protocol marker leaked into branch props")
    // simulate the crash window: the v1 commit won ownership but the
    // checkpoint link never landed. A FRESH marker reads as
    // in-progress — a concurrent reader racing the fork's
    // commit→checkpoint window must not be advised to delete it
    Files.delete(Paths.get(br, "_log", f"v${1L}%016d.checkpoint"))
    val e0 = intercept[IllegalStateException] { TableLog.state(br) }
    assert(e0.getMessage.contains("IN PROGRESS"), e0.getMessage)
    // a STALE marker reads as crashed: backdate the v1 commit stamp
    val v1c = Paths.get(br, "_log", f"v${1L}%016d.commit")
    Files.writeString(v1c, Files.readString(v1c).linesIterator.map(l =>
      if (l.startsWith("ts ")) s"ts ${System.currentTimeMillis() - 120000L}"
      else l).mkString("\n") + "\n")
    val ex = intercept[IllegalStateException] { TableLog.state(br) }
    assert(ex.getMessage.contains("crashed"),
      s"crashed fork must fail loudly, got: ${ex.getMessage}")
    // the crashed fork's commit still owns the name — a blind re-fork
    // refuses instead of pairing a new commit with stale state
    intercept[IllegalArgumentException] { TableLog.branch(t, "crashy") }
    // recovery is the documented step: delete the branch dir, re-fork
    def rmTree(p: java.nio.file.Path): Unit = {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
    rmTree(Paths.get(br))
    val br2 = TableLog.branch(t, "crashy")
    assert(TableLog.snapshot(spark, br2).count() == 12L,
      "a re-fork after recovery must read the full base snapshot")
  }

  test("publish-rebase on a PARTITIONED table: disjoint per-partition " +
      "appends from branch and main both land with tuple stats intact") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(
      Seq((1L, "ca", "x1"), (2L, "ny", "x2")).toDF("k", "region", "v"),
      t, "k", 1, partCols = Seq("region"))
    val br = TableLog.branch(t, "drop")
    TableLog.append(Seq((3L, "ca", "x3")).toDF("k", "region", "v"), br, 1)
    TableLog.append(Seq((4L, "tx", "x4")).toDF("k", "region", "v"), t, 1)
    TableLog.publish(spark, t, "drop") // disjoint files -> rebase
    val got = TableLog.snapshot(spark, t).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), got.toString)
    // partition inventory still exact after the rebase adoption
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val parts = spark.sql(s"SELECT * FROM graftlog.`$t#partitions`")
      .collect().map(r => (r.getString(0), r.getLong(2))).sorted.toSeq
    assert(parts == Seq(("ca", 2L), ("ny", 1L), ("tx", 1L)),
      s"partition stats wrong after rebase: $parts")
  }

  test("drop_branch closes the WAP loop: refuses unpublished work, " +
      "reclaims after publish, main's adopted files survive, " +
      "#branches empties") {
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    val br = TableLog.branch(t, "drop1")
    TableLog.append(kv(Seq(2L -> "b")), br, 1)
    // unpublished work refuses without force
    val e = intercept[IllegalArgumentException] {
      TableLog.dropBranch(t, "drop1")
    }
    assert(e.getMessage.contains("unpublished"), e.getMessage)
    // publish, then drop: branch dir gone, adopted data intact
    TableLog.publish(spark, t, "drop1")
    val n = TableLog.dropBranch(t, "drop1")
    assert(n > 0, "nothing reclaimed")
    assert(!Files.exists(Paths.get(br)), "branch dir survived the drop")
    assert(TableLog.listBranches(t).isEmpty)
    val got = TableLog.snapshot(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b")),
      s"published rows lost by the drop: $got")
    // an abandoned drop needs force — and force works
    val br2 = TableLog.branch(t, "drop2")
    TableLog.append(kv(Seq(9L -> "z")), br2, 1)
    TableLog.dropBranch(t, "drop2", force = true)
    assert(TableLog.listBranches(t).isEmpty)
    assert(TableLog.snapshot(spark, t).count() == 2)
    // a fresh fork (no work) drops without force; unknown name refuses
    TableLog.branch(t, "drop3")
    TableLog.dropBranch(t, "drop3")
    intercept[IllegalArgumentException] { TableLog.dropBranch(t, "nope") }
  }

  test("publish REBASES across a constraint main ADDED in the interim: " +
      "the branch delta audits against it; a violating delta refuses") {
    import spark.implicits._
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    val br = TableLog.branch(t, "cadd")
    TableLog.append(kv(Seq(2L -> "bb")), br, 1)
    // main ADDS a constraint after the fork (validates its own rows)
    TableLog.setProps(t, TableLog.state(t).props +
      ("constraint.nonempty" -> "length(v) > 0"))
    // the branch delta satisfies it -> publish rebases and lands
    TableLog.publish(spark, t, "cadd")
    val got = TableLog.snapshot(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "bb")), got.toString)
    // main's added constraint SURVIVED the publish
    assert(TableLog.state(t).props.get("constraint.nonempty")
      .contains("length(v) > 0"))
    // a delta VIOLATING main's constraint refuses at publish: the
    // branch drops its inherited per-batch gate (the documented
    // bulk-load posture), stages a violating row, and main's
    // governance catches it at the landing
    val br2 = TableLog.branch(t, "cadd2")
    TableLog.setProps(br2,
      TableLog.state(br2).props - "constraint.nonempty")
    TableLog.append(kv(Seq(3L -> "")), br2, 1)
    TableLog.setProps(t, TableLog.state(t).props +
      ("constraint.short" -> "length(v) < 10"))
    val e = intercept[IllegalArgumentException] {
      TableLog.publish(spark, t, "cadd2")
    }
    assert(e.getMessage.contains("nonempty"), e.getMessage)
    // a constraint DROPPED on main in the interim still aborts
    val br3 = TableLog.branch(t, "cdrop")
    TableLog.append(kv(Seq(4L -> "d")), br3, 1)
    TableLog.setProps(t, TableLog.state(t).props - "constraint.short")
    intercept[java.util.ConcurrentModificationException] {
      TableLog.publish(spark, t, "cdrop")
    }
  }

  test("path-component branch names refuse everywhere: '..' must " +
      "never resolve to the table root (drop_branch would delete " +
      "the whole table)") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    TableLog.branch(t, "real") // _branches exists, the attack surface
    for (bad <- Seq("..", ".")) {
      intercept[IllegalArgumentException] { TableLog.branch(t, bad) }
      intercept[IllegalArgumentException] {
        TableLog.dropBranch(t, bad, force = true)
      }
      intercept[IllegalArgumentException] { TableLog.publish(spark, t, bad) }
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT * FROM graftlog.`$t` VERSION AS OF 'branch:$bad'")
          .collect()
      }
      assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"),
        e.getMessage)
    }
    // the table survived every attempt
    assert(TableLog.snapshot(spark, t).count() == 1)
    // a non-branch directory under _branches refuses the drop too
    Files.createDirectories(Paths.get(t, "_branches", "fake", "_log"))
    intercept[IllegalArgumentException] {
      TableLog.dropBranch(t, "fake", force = true)
    }
  }

  test("VERSION AS OF 'branch:<name>' reads a staging branch head by " +
      "name from SQL — read-only, no filesystem path needed") {
    spark.conf.set("spark.sql.catalog.graftlog",
      "graft.sources.GraftLogCatalog")
    val t = freshDir()
    TableLog.create(kv(Seq(1L -> "a")), t, "k", 1)
    TableLog.branch(t, "staging")
    TableLog.append(kv(Seq(2L -> "b")),
      Paths.get(t, "_branches", "staging").toString, 1)
    val main = spark.sql(s"SELECT count(*) FROM graftlog.`$t`")
      .head().getLong(0)
    val branch = spark.sql(
      s"SELECT count(*) FROM graftlog.`$t` VERSION AS OF 'branch:staging'")
      .head().getLong(0)
    assert(main == 1L && branch == 2L, s"main=$main branch=$branch")
    // unknown branch refuses as table-not-found (Spark rewraps the
    // catalog's message; the refusal is the contract)
    val e = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graftlog.`$t` VERSION AS OF 'branch:nope'")
        .collect()
    }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), e.getMessage)
  }

  test("drop_branch counts a DV edit on a fork-inherited file as " +
      "UNPUBLISHED: the data inode is main's, the sidecar work is not") {
    val t = freshDir()
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t, "k", 1)
    val br = TableLog.branch(t, "dvgate")
    // the branch's merge-on-read delete keeps the inherited data
    // file's inode (only a sidecar lands) — inode identity alone
    // would wrongly call this published and silently discard the
    // staged erasure on drop
    TableLog.deleteWhereDv(spark, br, col("k") === 2L)
    val e = intercept[IllegalArgumentException] {
      TableLog.dropBranch(t, "dvgate")
    }
    assert(e.getMessage.contains("unpublished"), e.getMessage)
    // after publish the DV state IS main's — the drop proceeds
    TableLog.publish(spark, t, "dvgate")
    TableLog.dropBranch(t, "dvgate")
    assert(TableLog.snapshot(spark, t).collect().map(_.getLong(0)).toSet
      == (0L to 7L).toSet - 2L)
    // MAIN's own post-publish DV edit is main's work, not the
    // branch's: a fully published branch still drops after main
    // DV-deletes from a file the branch references DV-less
    val t2 = freshDir()
    TableLog.create(kv((0L to 7L).map(i => (i, s"x$i"))), t2, "k", 1)
    TableLog.branch(t2, "pubdv")
    TableLog.deleteWhereDv(spark, t2, col("k") === 5L) // main's OWN edit
    TableLog.dropBranch(t2, "pubdv") // must not read it as branch work
    assert(TableLog.listBranches(t2).isEmpty)
  }
}
