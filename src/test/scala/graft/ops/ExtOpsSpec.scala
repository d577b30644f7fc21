package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** ExtOps / approximate-aggregate guarantees beyond the oracle rows.
  * q40's hashed surface only pins a 10% bound (2× the sketch's default
  * 5% rsd, so it can never flake); this spec asserts the tighter error
  * actually observed at the correctness scale.
  */
class ExtOpsSpec extends SparkSuite {

  test("q40 approx_count_distinct: observed relative error <= 5% at sf0.01") {
    import spark.implicits._
    val rows = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey").as("approx"))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      val err = math.abs(a - e).toDouble / e
      assert(err <= 0.05, s"flag=${r.getString(0)} exact=$e approx=$a err=$err")
    }
  }

  test("q150 fkAudit: planted orphans counted per constraint in one pass") {
    import spark.implicits._
    // child rows 1..5: keys 4 and 5 have no parent in pa; key 9 none in pb
    val child = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 10L), (5L, 9L))
      .toDF("ck_a", "ck_b")
      .withColumnRenamed("ck_a", "a_key").withColumnRenamed("ck_b", "b_key")
    val pa = Seq(1L, 2L, 3L, 3L).toDF("pa_key") // dup parent must not inflate
    val pb = Seq(10L, 20L, 30L).toDF("pb_key")
    val got = ExtOps.fkAudit(child, Seq(
        ("child.a->pa", pa, "a_key", "pa_key"),
        ("child.b->pb", pb, "b_key", "pb_key")))
      .collect().map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2)))).toMap
    assert(got("child.a->pa") == ((5L, 2L))) // 4, 5 orphaned
    assert(got("child.b->pb") == ((5L, 1L))) // 9 orphaned
  }

  test("q150 on the sf corpus: every FK resolves") {
    val rows = ExtOps.q150ReferentialAudit(spark, sf0001).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getInt(3) == 1, r.getString(0))
    }
  }

  test("q98 sorted layout: per-file shipdate ranges are pairwise disjoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = ExtOps.q98Write(spark, sf0001)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1, "need multiple files to prove disjointness")
    // the property a range scan skips files on: no two files' [min,
    // max] key intervals overlap (equal keys stay in one partition)
    // ISO timestamp strings order lexicographically == chronologically
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min($"l_shipdate").cast("string"), max($"l_shipdate").cast("string"))
        .head()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    assert(ranges.forall { case (lo, hi) => lo <= hi })
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlap: $a vs $b")
      case _ =>
    }
  }

  test("q108 z-order: every octant is rectangle-bounded on BOTH keys; z replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = ExtOps.q108Write(spark, sf0001)
    val octDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("z_oct=")).map(_.getPath).sorted
    assert(octDirs.length >= 4, s"expected several octants, got ${octDirs.length}")

    val b = spark.read.parquet(dir)
      .agg(min($"l_partkey"), max($"l_partkey"), min($"l_suppkey"), max($"l_suppkey"))
      .head()
    val (minP, maxP, minS, maxS) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))

    // top-3-bit octant = aligned quadtree cell: partkey confined to a
    // half, suppkey to a quarter — bounded on BOTH axes, which is what
    // lets min/max stats skip octants for predicates on either column
    // (a single-column sort leaves the other axis at full width ≈ 1.0)
    octDirs.foreach { d =>
      val r = spark.read.parquet(d)
        .agg(min($"l_partkey"), max($"l_partkey"), min($"l_suppkey"), max($"l_suppkey"))
        .head()
      val widthP = (r.getLong(1) - r.getLong(0)).toDouble / (maxP - minP)
      val widthS = (r.getLong(3) - r.getLong(2)).toDouble / (maxS - minS)
      assert(widthP <= 0.52, s"$d partkey width $widthP")
      assert(widthS <= 0.27, s"$d suppkey width $widthS")
    }

    // replay the interleave bit-for-bit from the stored keys
    def morton(sx: Long, sy: Long): Long =
      (0 until 16).map(i => (((sx >> i) & 1L) << (2 * i)) +
        (((sy >> i) & 1L) << (2 * i + 1))).sum
    val rows = spark.read.parquet(dir)
      .select($"l_partkey", $"l_suppkey", $"z").limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sx = (r.getLong(0) - minP) * 65535 / (maxP - minP)
      val sy = (r.getLong(1) - minS) * 65535 / (maxS - minS)
      assert(r.getLong(2) == morton(sx, sy), s"z mismatch at $r")
    }
  }

  test("q133 compaction bins replay the greedy sequential packing exactly") {
    import spark.implicits._
    val docs = graft.Tables.table(spark, sf0001, "documents")
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // driver-side greedy fold: one cumulative sum per source in
    // doc_id order — the single-window formulation the hierarchical
    // plan must equal bit-for-bit
    val binned: Seq[(String, Long, Long, Long)] =
      docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).toSeq.map { case (_, id, n) =>
          val bin = cum / ExtOps.compactionTarget; cum += n; (src, bin, id, n)
        }
      }
    val want = binned.groupBy(t => (t._1, t._2)).map { case ((src, bin), rows) =>
      (src, bin) -> ((rows.size.toLong, rows.map(_._4).sum,
        rows.map(_._3).min, rows.map(_._3).max))
    }
    val got = ExtOps.q133CompactionPlan(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    // packing invariants: bins are contiguous from 0 per source, and
    // no bin except possibly the last overflows target by more than
    // one document's worth (greedy property: a bin closes only once
    // the running sum crosses the boundary)
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      val bins = ks.map(_._2).toSeq.sorted
      assert(bins == (0L until bins.size.toLong))
    }
  }

  test("SecondMax UDAF: NULL on fewer than two distinct values") {
    import spark.implicits._
    val agg = ExtOps.SecondMax.toColumn
    val one = Seq(5.0, 5.0, 5.0).toDS().select(agg).head()
    assert(one == null)
    val two = Seq(5.0, 3.0, 5.0).toDS().select(agg).head()
    assert(two == 3.0)
  }

  test("q166 merged read: all rows survive, priority NULLed exactly on old-schema files") {
    import spark.implicits._
    val got = ExtOps.q166SchemaEvolution(spark, sf0001).collect()
    val n = graft.Tables.orders(spark, sf0001).count()
    assert(got.length == n)
    got.foreach { r =>
      val key = r.getLong(0)
      // batch=1 (old schema, even keys) reads as NULL priority;
      // batch=2 rows keep their written value
      assert(r.isNullAt(2) == (key % 2 == 0), s"key $key null-pattern wrong")
    }
    assert(got.exists(!_.isNullAt(2)), "new-schema rows present")
  }

  test("q183 estimator: unbiased key sampling lands within 20% on the fixture") {
    val r = ExtOps.q183JoinCardinality(spark, sf0001).collect()(0)
    val (exact, est, diff, errPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(exact > 0 && est > 0)
    assert(diff == est - exact)
    assert(errPpm == 1000000L * math.abs(diff) / exact)
    // sf0.001 samples only ~75 keys, so the sampling stddev is ~12%;
    // bound at 50% (4 sigma) — the sf0.01 oracle run observes ~1%
    assert(errPpm < 500000L, s"est $est vs exact $exact")
  }

  test("q214 observation: metrics equal the action's own counts") {
    val r = ExtOps.q214ObservedMetrics(spark, sf0001).collect()(0)
    val (seen, kept, keptAction, cents, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // observed rows_kept must equal what the filter action itself saw
    assert(kept == keptAction)
    assert(kept <= seen && kept > 0 && kept < seen, "both branches live")
    assert(cents > 0 && ppm == 1000000L * kept / seen)
  }

  test("q226 source: residual filters re-apply; pushed bounds are exact") {
    import spark.implicits._
    val base = spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", "1000").option("parts", "4").load()
    // exact pushed range: equality pins a single row with derived columns
    val one = base.where($"id" === 123L).collect()
    assert(one.length == 1)
    assert(one(0).getString(1) == "g3" &&
      one(0).getLong(2) == (123L * 2654435761L) % 1000003L)
    // a grp predicate is NOT pushable: the source returns it as residual
    // and Spark re-applies it — count must still be exact
    val g7 = base.where($"id" < 100L && $"grp" === "g7").collect()
    assert(g7.map(_.getLong(0)).toSeq == (7L until 100L by 10L))
    // range clamp: beyond-domain bounds yield the domain
    assert(base.where($"id" >= 990L).count() == 10L)
  }

  test("q227 functions: both install paths share one descriptor list; SQL anchors") {
    graft.GraftFunctions.install(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  graft_doti(array(2, 3), array(5, 7)) AS di,
        |  graft_nfc('é') AS nfc""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 31L)
    assert(r.getString(2) == "é", "NFC composes e + combining acute")
    // the config path (spark.sql.extensions=graft.GraftExtensions) injects
    // the SAME descriptors — apply it to a fresh extensions container
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must accept all descriptors
    assert(graft.GraftFunctions.all.map(_._1.funcName) ==
      Seq("graft_dot", "graft_doti", "graft_nfc"))
  }

  test("q263 advisor: exact replay at sf0.001; planted clustering narrows runs") {
    import spark.implicits._
    val got = ExtOps.q263EncodingAdvisor(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_orderkey", $"l_linenumber",
        $"l_extendedprice", $"l_quantity").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue,
        math.round(r.getDouble(3) * 100), math.round(r.getDouble(4) * 100)))
    def bits(x: Long) = java.lang.Long.toBinaryString(1 + math.abs(x)).length.toLong
    def replay(group: ((Long, Long, Long, Long, Long)) => Long,
               key: ((Long, Long, Long, Long, Long)) => (Long, Long, Long, Long)) = {
      val n = li.length.toLong
      val ds = li.groupBy(group).values.flatMap { g =>
        g.sortBy(key).sliding(2).collect {
          case Array(a, b) => (b._4 - a._4, b._5 - a._5)
        }
      }.toSeq
      (n, ds.length.toLong,
        (1000000L * (n - ds.length)) / n,
        1000L * ds.map(d => bits(d._1)).sum / ds.length,
        1000L * ds.map(d => bits(d._2)).sum / ds.length)
    }
    val ok = replay(_._2, t => (t._3, t._4, t._5, 0L))
    val pk = replay(_._1, t => (t._2, t._3, t._4, t._5))
    assert(got.find(_._1 == "orderkey_clustered").get ==
      (("orderkey_clustered", ok._2, ok._3, ok._4, ok._5)))
    assert(got.find(_._1 == "partkey_clustered").get ==
      (("partkey_clustered", pk._2, pk._3, pk._4, pk._5)))
    // planted: price clusters by partkey ⇒ partkey layout must win
    val planted = (0 until 200).map { i =>
      (i.toLong % 10L, i.toLong / 4L, i.toLong % 4L,
        1000000L * (i % 10) + i / 10, 100L)
    }.toDF("l_partkey", "l_orderkey", "l_linenumber", "price_c", "qty_c")
    val o = ExtOps.deltaBitsOf(planted, "o", "l_orderkey",
      Seq("l_linenumber")).collect()(0).getLong(3)
    val p = ExtOps.deltaBitsOf(planted, "p", "l_partkey",
      Seq("l_orderkey", "l_linenumber")).collect()(0).getLong(3)
    assert(p < o, s"clustered layout must compress: partkey=$p orderkey=$o")
  }

  test("q371 avro roundtrip: byte-identical to the parquet original") {
    import spark.implicits._
    val back = ExtOps.q371AvroRoundtrip(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getString(4)))
    val orig = Tables.customer(spark, sf0001).orderBy($"c_custkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getString(4)))
    assert(back.toSeq == orig.toSeq)
  }

  test("q372 xml roundtrip: declared-schema read recovers every row") {
    import spark.implicits._
    val back = ExtOps.q372XmlRoundtrip(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val orig = Tables.nation(spark, sf0001)
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name",
        "CAST(n_regionkey AS BIGINT)")
      .orderBy($"n_nationkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq == orig.toSeq)
  }

  test("q396 lineage: renames chain, unions merge positionally, " +
      "two-source expressions split, literals trace to <none>") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nat = graft.Tables.nation(spark, sf0001)
    val reg = graft.Tables.region(spark, sf0001)
    // rename-of-rename + a union of two different base columns
    val a = nat.select($"n_name".as("x")).select($"x".as("y"))
    val b = reg.select($"r_name".as("y"))
    val probe = a.unionAll(b)
      .select($"y".as("label"), lit(1L).as("one"))
    val rows = ExtOps.lineageOf(probe).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("label", "nation", "n_name"),
      ("label", "region", "r_name"),
      ("one", "<none>", "<none>")), rows.toString)
    // a computed column referencing two tables traces to both
    val two = nat.join(reg, $"n_regionkey" === $"r_regionkey")
      .select((length($"n_name") + length($"r_name")).as("w"))
    val wr = ExtOps.lineageOf(two).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(wr == Set(("nation", "n_name"), ("region", "r_name")))
  }

  test("q414 cogroup: lambda-observed sort order holds on every key, " +
      "the withheld-lines branch is live, and the plan secondary-sorts " +
      "inside partitions instead of buffering groups") {
    import spark.implicits._
    val df = ExtOps.q414CogroupReconcile(spark, sf0001)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(5)))
    assert(rows.forall(_._3), "a line iterator arrived unsorted")
    val (noLines, withLines) = rows.partition(_._2 == 0L)
    assert(noLines.nonEmpty && withLines.nonEmpty)
    // the plant: every 7th order's lines are withheld (the corpus also
    // has natively line-less orders — both sources feed the branch)
    assert(rows.filter(_._1 % 7 == 0).forall(_._2 == 0L))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CoGroup"), p.take(400))
    // secondary sort = local Sort (global=false) feeding the cogroup
    assert("Sort \\[[^\\]]*\\], false".r.findFirstIn(p).isDefined, p.take(800))
  }

  test("q414 cogroup: a line-only key (dangling line-side FK) emits " +
      "NOTHING — the lambda mirrors LEFT JOIN FROM orders, no sentinel") {
    import spark.implicits._
    val o = Seq((1L, 500L), (2L, 300L))
      .toDF("o_orderkey", "cents").as[(Long, Long)]
    val l = Seq((1L, 200L), (1L, 100L), (9L, 777L)) // key 9 orphan
      .toDF("l_orderkey", "cents").as[(Long, Long)]
    val rows = ExtOps.cogroupReconcile(o, l).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L),
      "orphan key 9 must not surface a row the oracle cannot express")
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == 500L && r1.getLong(2) == 300L
      && r1.getLong(3) == 2L && r1.getLong(4) == 200L && r1.getBoolean(5))
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getLong(2) == 0L && r2.getLong(3) == 0L
      && r2.getLong(4) == 300L)
  }
}
