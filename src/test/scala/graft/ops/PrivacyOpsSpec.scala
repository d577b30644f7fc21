package graft.ops

import graft.SparkSuite

class PrivacyOpsSpec extends SparkSuite {

  test("q161 flags exactly the sub-threshold quasi-identifier groups") {
    import spark.implicits._
    // planted release: one safe group of 7, one risky group of 2,
    // one group sitting exactly AT the threshold (k = 5 is safe —
    // the flag is strict-less-than)
    val quasi = (Seq.fill(7)(("A", 0L, 1L)) ++
      Seq.fill(2)(("A", 1L, 1L)) ++
      Seq.fill(PrivacyOps.kThreshold)(("B", 0L, 2L)))
      .toDF("segment", "nation_bucket", "bal_band")
    val got = PrivacyOps.kAnonymityOf(quasi).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      ("A", 0L, 1L) -> ((7L, false)),
      ("A", 1L, 1L) -> ((2L, true)),
      ("B", 0L, 2L) -> ((PrivacyOps.kThreshold.toLong, false)),
    ))
  }

  test("q161 on the sf fixture: k sums to the row count, flags consistent") {
    val rows = PrivacyOps.q161KAnonymity(spark, sf0001).collect()
    val total = graft.Tables.customer(spark, sf0001).count()
    assert(rows.map(_.getLong(3)).sum == total)
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(3) < PrivacyOps.kThreshold))
    }
  }

  test("q162 noise: bounded by CDF support, clamped at zero, deterministic") {
    // the CDF itself must be a valid quantized distribution
    val thresholds = PrivacyOps.noiseCdfPpm.map(_._2)
    assert(thresholds == thresholds.sorted && thresholds.last == 1000000L)
    assert(PrivacyOps.noiseCdfPpm.map(_._1) == (-4 to 4))
    val out = PrivacyOps.q162NoisyRelease(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // re-run: identical release (hash-based draws, no RNG state)
    val again = PrivacyOps.q162NoisyRelease(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == again)
    // every noisy count within support of the true count, never negative
    import spark.implicits._
    val truth = graft.Tables.documents(spark, sf0001)
      .groupBy($"lang", $"source").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.keySet == truth.keySet)
    out.foreach { case (k, noisy) =>
      val c = truth(k)
      assert(noisy >= math.max(0L, c - 4) && noisy <= c + 4,
        s"cell $k: noisy $noisy vs true $c outside support")
    }
    // the mechanism genuinely perturbs: not every cell passes through
    assert(out.exists { case (k, noisy) => noisy != truth(k) })
  }

  test("q229 pseudonymization: linkage survives, raw ids do not appear") {
    import spark.implicits._
    val got = PrivacyOps.q229PseudonymizedJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tok(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"pseud-v1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    }
    val browse = ev.filter(e => e._2 == "view" || e._2 == "click")
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val buys = ev.filter(_._2 == "purchase")
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val want = (browse.keySet intersect buys.keySet).toSeq
      .map(id => (tok(id), browse(id), buys(id))).sortBy(_._1)
    assert(got.toSeq == want)
    // no raw identifier survives: every output key is a 16-hex token,
    // and no token equals the decimal form of any source id
    val ids = ev.map(_._1.toString).toSet
    assert(got.forall(r => r._1.matches("[0-9a-f]{16}") && !ids(r._1)))
  }

  test("q313 l-diversity catches the large-but-uniform group q161 passes") {
    import spark.implicits._
    // group A0: k = 9 (passes k-anonymity) but every member shares one
    // sensitive value — l = 1, the homogeneity attack case;
    // group B1: k = 3 only, but 3 distinct values — l passes;
    // group C2: exactly AT the threshold (l = 3 is safe — strict <)
    val rows = (Seq.fill(9)(("A", 0L, "URGENT")) ++
      Seq(("B", 1L, "URGENT"), ("B", 1L, "HIGH"), ("B", 1L, "LOW")) ++
      Seq(("C", 2L, "URGENT"), ("C", 2L, "URGENT"), ("C", 2L, "HIGH"),
        ("C", 2L, "LOW")))
      .toDF("segment", "nation_bucket", "sensitive")
    val got = PrivacyOps.lDiversityOf(rows).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got == Map(
      ("A", 0L) -> ((9L, 1L, 1000000L, true)),
      ("B", 1L) -> ((3L, 3L, 333333L, false)),
      ("C", 2L) -> ((4L, 3L, 500000L, false)),
    ))
  }

  test("q317 t-closeness: mirror group scores 0, skewed groups the exact EMD") {
    import spark.implicits._
    // global over the planted frame: P1:10, P2:2, P3:2, P4:2 of 16
    // → q = [625000, 125000, 125000, 125000] micro.
    // A0 uniform (1/4 each): cum deltas −375k,−250k,−125k,0 → t = 250000
    // B1 all-P1: cum deltas 375k,250k,125k,0 → t = 250000
    // C2 mirrors the global exactly → t = 0
    val rows = (Seq(("A", 0L, "P1"), ("A", 0L, "P2"),
      ("A", 0L, "P3"), ("A", 0L, "P4")) ++
      Seq.fill(4)(("B", 1L, "P1")) ++
      (Seq.fill(5)(("C", 2L, "P1")) ++
        Seq(("C", 2L, "P2"), ("C", 2L, "P3"), ("C", 2L, "P4"))))
      .toDF("segment", "nation_bucket", "sensitive")
    val got = PrivacyOps.tClosenessOf(rows).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      ("A", 0L) -> ((4L, 250000L, true)),
      ("B", 1L) -> ((4L, 250000L, true)),
      ("C", 2L) -> ((8L, 0L, false)),
    ))
  }

  test("q317 on the sf fixture: k sums to orders, t bounded, flag consistent") {
    val rows = PrivacyOps.q317TCloseness(spark, sf0001).collect()
    val orders = graft.Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == orders)
    rows.foreach { r =>
      val t = r.getLong(3)
      assert(t >= 0L && t <= 1000000L)
      assert(r.getBoolean(4) == (t > PrivacyOps.tThresholdPpm))
    }
  }

  test("q313 on the sf fixture: k sums to orders, l bounded by the domain") {
    val rows = PrivacyOps.q313LDiversity(spark, sf0001).collect()
    val orders = graft.Tables.orders(spark, sf0001).count()
    val nPrio = graft.Tables.orders(spark, sf0001)
      .select("o_orderpriority").distinct().count()
    assert(rows.map(_.getLong(2)).sum == orders)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1L && r.getLong(3) <= nPrio)
      assert(r.getLong(4) >= 1000000L / r.getLong(3))  // modal >= mean share
      assert(r.getBoolean(5) == (r.getLong(3) < PrivacyOps.lThreshold))
    }
  }

  test("q347 ladder: coarser rungs never riskier; chosen = finest passing") {
    val rows = PrivacyOps.q347GeneralizationLadder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq == PrivacyOps.ladderBands)
    // group count is monotone non-increasing as bands coarsen
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"coarser band grew groups: $a -> $b") }
    // passes iff zero at-risk groups; chosen implies passes
    rows.foreach { r =>
      assert(r._5 == (r._3 == 0L))
      assert(!r._6 || r._5)
    }
    // at most one chosen rung, and it is the finest passing one
    val chosen = rows.filter(_._6)
    assert(chosen.length <= 1)
    chosen.headOption.foreach { c =>
      assert(rows.filter(_._5).map(_._1).min == c._1)
    }
  }
}
