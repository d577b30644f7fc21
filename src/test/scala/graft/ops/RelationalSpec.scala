package graft.ops

import graft.SparkSuite

/** Semantic invariants for relational operators whose correctness gate
  * (the DuckDB oracle) could in principle be wrong in the same way on
  * both sides — asserted here from first principles instead.
  */
class RelationalSpec extends SparkSuite {

  test("q90 merge: row accounting and per-action semantics hold") {
    import spark.implicits._
    val snap = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = Relational.q90MergeUpsert(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))

    // merged = snapshot + inserts, and every snapshot key survives
    val nInserts = snap.keys.count(_ % 100 == 7)
    assert(merged.length == snap.size + nInserts)
    assert(snap.keySet.subsetOf(merged.map(_._1).toSet))

    merged.foreach { case (k, price, status, action) =>
      action match {
        case "update" =>
          assert(k % 10 == 3 && price == snap(k) * 1.1 && status == "U")
        case "insert" =>
          assert(k < 0 && status == "N" && !snap.contains(k))
          assert(price == snap(-k - 1)) // insert carries the source price
        case "keep" =>
          assert(k % 10 != 3 && price == snap(k))
        case other => fail(s"unexpected action $other")
      }
    }
    // every key ≡3 (mod 10) was in fact updated, none silently kept
    assert(merged.count(_._4 == "update") == snap.keys.count(_ % 10 == 3))
  }

  test("q106 diff round-trips: old snapshot + diff rebuilds the new snapshot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val diff = Relational.q106SnapshotDiff(spark, sf0001)
    // all three actions fire on the fixture, with the derived counts
    val keys = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey").collect().map(_.getLong(0))
    val byAction = diff.collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byAction("delete") == keys.count(_ % 50 == 1))
    assert(byAction("insert") == keys.count(_ % 100 == 9))
    assert(byAction("update") == keys.count(k => k % 10 == 4 && k % 50 != 1))
    assert(byAction.keySet == Set("insert", "update", "delete"))

    // MERGE-apply the diff onto the old snapshot → exactly the new one
    val applied = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      .join(diff.select($"o_orderkey", $"action", $"new_price", $"new_status"),
        Seq("o_orderkey"), "full_outer")
      .where($"action".isNull || $"action" =!= "delete")
      .select($"o_orderkey",
        coalesce($"new_price", $"o_totalprice").as("o_totalprice"),
        coalesce($"new_status", $"o_orderstatus").as("o_orderstatus"))
    val neu = Relational.q106NewSnapshot(spark, sf0001)
    assert(applied.exceptAll(neu).isEmpty && neu.exceptAll(applied).isEmpty)
  }

  test("q115 PSI: zero for identical snapshots in a bin, detects the planted drift") {
    import spark.implicits._
    val prices = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val (mn, mx) = (prices.map(_._2).min, prices.map(_._2).max)
    def bin(p: Double): Int =
      math.min(9, math.max(0, math.floor((p - mn) * 10.0 / (mx - mn)).toInt))
    val oldB = prices.groupBy(p => bin(p._2)).view.mapValues(_.length).toMap
    val neuPrices = prices.collect {
      case (k, p) if k % 50 != 1 => if (k % 10 == 4) p * 1.05 else p
    } ++ prices.collect { case (k, p) if k % 100 == 9 => p }
    val neuB = neuPrices.groupBy(bin).view.mapValues(_.length).toMap
    def share(m: Map[Int, Int], b: Int, t: Int): Double =
      math.max(m.getOrElse(b, 0).toDouble / t, 1e-6)
    val got = Relational.q115DriftReport(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 10 && got.map(_._1).toSeq == (0L to 9L))
    got.foreach { case (b, nOld, nNew, psi) =>
      assert(nOld == oldB.getOrElse(b.toInt, 0).toLong)
      assert(nNew == neuB.getOrElse(b.toInt, 0).toLong)
      val p1 = share(oldB, b.toInt, prices.length)
      val p2 = share(neuB, b.toInt, neuPrices.length)
      assert(math.abs(psi - (p2 - p1) * math.log(p2 / p1)) < 1e-5, s"bin $b")
    }
    // the 5% bump + deletes genuinely move mass: total PSI is nonzero
    assert(got.map(_._4).map(math.abs).sum > 1e-4)
  }

  test("q210 shares: region shares sum to ~1e6 per region, total shares to ~1e6") {
    val rows = Relational.q210ShareOfParent(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, rs) =>
      val s2 = rs.map(_._3).sum
      assert(s2 > 1000000L - rs.length && s2 <= 1000000L, s"$region: $s2")
    }
    val st = rows.map(_._4).sum
    assert(st > 1000000L - rows.length && st <= 1000000L)
  }

  test("q211 WoW: first week null, deltas chain exactly") {
    val rows = Relational.q211PeriodOverPeriod(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(_._1)
    assert(rows.head._3.isEmpty && rows.head._4.isEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3.contains(a._2))
        assert(b._4.contains(b._2 - a._2))
      case _ =>
    }
  }

  test("q212 lead time: quantiles replay; the negative-lead anomaly is counted") {
    val rows = Relational.q212LeadTime(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    import spark.implicits._
    val lt = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", org.apache.spark.sql.functions.to_date($"l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val od = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderpriority",
        org.apache.spark.sql.functions.to_date($"o_orderdate")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDate(2).toLocalDate)))
      .toMap
    val byP = lt.map { case (ok, ship) =>
      val (p, odate) = od(ok)
      (p, java.time.temporal.ChronoUnit.DAYS.between(odate, ship))
    }.groupBy(_._1)
    rows.foreach { case (p, n, neg, p50, p90, mn, mx) =>
      val ds = byP(p).map(_._2).sorted
      assert(n == ds.length.toLong && mn == ds.min && mx == ds.max)
      assert(neg == ds.count(_ < 0).toLong && neg > 0, "anomaly branch live")
      assert(p50 == ds((ds.length + 1) / 2 - 1))
      assert(p90 == ds(((9 * ds.length + 9) / 10 - 1).max(0)))
    }
  }

  test("q218 lift: perfect ranker hits 1/base-rate; deciles conserve") {
    import spark.implicits._
    // 100 unique scores desc = rank; top 20 respond → base rate 20%
    val fx = (1 to 100).map(i => (i.toLong, if (i > 80) 1L else 0L))
      .toDF("score", "resp")
    val rows = Relational.liftOf(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.forall(_._2 == 10L), "equal deciles on unique scores")
    assert(rows.map(_._3).sum == 20L, "responders conserve")
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._4 == 1000000L && d1._7 == 5000000L,
      "perfect top decile: rate 100%, lift 5x (=1/0.2)")
    val d3 = rows.find(_._1 == 3L).get
    assert(d3._6 == 20L && d3._7 == (1000000L * (1000000L * 20 / 30)) / 200000L)
    assert(rows.map(_._5).toSeq == (1L to 10L).map(_ * 10), "cum monotone")
  }

  test("q218 lift: an all-tied score block is never split across deciles") {
    import spark.implicits._
    val fx = (1 to 40).map(i => (7L, if (i % 4 == 0) 1L else 0L))
      .toDF("score", "resp")
    val rows = Relational.liftOf(fx).collect()
    assert(rows.length == 1, "one block, one decile")
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 40L)
    assert(rows.head.getLong(6) == 1000000L, "lift 1x when block is the corpus")
  }

  test("q219 RFM: segments partition purchasers; replay matches a direct fold") {
    import spark.implicits._
    val got = Relational.q219RfmSegments(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey", org.apache.spark.sql.functions.to_date($"o_orderdate"),
        $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val asOf = orders.map(_._2).max
    val cust = orders.groupBy(_._1).map { case (ck, os) =>
      (ck, java.time.temporal.ChronoUnit.DAYS.between(os.map(_._2).max, asOf),
        os.length.toLong, os.map(o => math.round(o._3 * 100)).sum)
    }.toSeq
    val n = cust.length.toLong
    def rankBy[A](xs: Seq[(Long, Long)]): Map[Long, Long] =
      xs.zipWithIndex.map { case ((ck, _), i) => ck -> (i + 1L) }.toMap
    val rr = rankBy(cust.map(c => (c._1, c._2)).sortBy(c => (c._2, c._1)))
    val rf = rankBy(cust.map(c => (c._1, c._3)).sortBy(c => (-c._2, c._1)))
    val rm = rankBy(cust.map(c => (c._1, c._4)).sortBy(c => (-c._2, c._1)))
    val want = cust.map { case (ck, rec, _, cents) =>
      def q(rn: Long) = 5 - (5 * (rn - 1)) / n
      val (r, f, m) = (q(rr(ck)), q(rf(ck)), q(rm(ck)))
      val seg =
        if (r >= 4 && f >= 4 && m >= 4) "champion"
        else if (r >= 4 && f <= 2) "new"
        else if (r <= 2 && f >= 4) "at_risk_loyal"
        else if (r <= 2 && m >= 4) "cant_lose"
        else if (r <= 2) "hibernating"
        else "core"
      (seg, rec, cents)
    }.groupBy(_._1).map { case (seg, xs) =>
      (seg, xs.size.toLong, xs.map(_._3).sum, xs.map(_._2).sum / xs.size)
    }.toSet
    assert(got.map(_._2).sum == n, "segments partition the purchasers")
    assert(got.toSet == want)
  }

  test("q220 semi-additive: delta trick equals the naive carried-forward grid") {
    import spark.implicits._
    val got = Relational.q220SemiAdditive(spark, sf0001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey", org.apache.spark.sql.functions.to_date($"o_orderdate"),
        $"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2),
        math.round(r.getDouble(3) * 100)))
    val months = orders.map(_._2.withDayOfMonth(1)).distinct.sorted
    val want = months.map { m =>
      // naive: every customer's latest order (date, orderkey) up to month-end
      val eom = m.plusMonths(1)
      val upTo = orders.filter(_._2.isBefore(eom))
      val latest = upTo.groupBy(_._1).map { case (_, os) =>
        os.maxBy(o => (o._2.toEpochDay, o._3))._4
      }
      val n = upTo.map(_._1).distinct.size.toLong
      val tot = latest.sum
      (m, n, tot, tot / n)
    }
    assert(got.toSeq == want.toSeq)
  }

  test("q228 QQ drift: decile values replay; monotone within each period") {
    import spark.implicits._
    val got = Relational.q228QqDrift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to 9L))
    val orders = graft.Tables.orders(spark, sf0001)
      .select(org.apache.spark.sql.functions.year($"o_orderdate"),
        $"o_totalprice").collect()
      .map(r => (if (r.getInt(0) <= 1997) "p1" else "p2",
        math.round(r.getDouble(1) * 100)))
    // first-crossing rank: smallest x with 10*rank(x) >= d*n
    //   = sorted(xs)[ceil(d*n/10) - 1]
    def want(p: String): Seq[Long] = {
      val xs = orders.filter(_._1 == p).map(_._2).sorted
      val n = xs.length
      (1 to 9).map(d => xs(((d * n + 9) / 10 - 1).max(0)))
    }
    val (w1, w2) = (want("p1"), want("p2"))
    assert(got.map(_._2).toSeq == w1 && got.map(_._3).toSeq == w2)
    got.foreach { case (_, p1, p2, gap) =>
      assert(gap == (1000000L * (p2 - p1)) / p1)
    }
    assert(w1 == w1.sorted && w2 == w2.sorted, "deciles monotone")
  }

  test("q235 fill rate: one late line disqualifies the parent; replay") {
    import spark.implicits._
    val got = Relational.q235FillRate(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val od = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderpriority",
        org.apache.spark.sql.functions.to_date($"o_orderdate")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDate(2).toLocalDate)))
      .toMap
    val lines = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey",
        org.apache.spark.sql.functions.to_date($"l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val perOrder = lines.groupBy(_._1).map { case (ok, ls) =>
      val (p, odate) = od(ok)
      val allOk = ls.forall { l =>
        val d = java.time.temporal.ChronoUnit.DAYS.between(odate, l._2)
        d >= 0 && d <= 90
      }
      (p, allOk, ls.length.toLong)
    }.toSeq
    val want = perOrder.groupBy(_._1).map { case (p, os) =>
      (p, os.size.toLong, os.count(_._2).toLong, os.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.exists(r => r._3 < r._2), "disqualification branch live")
    assert(got.exists(r => r._3 > 0), "fully-filled branch live")
  }

  test("q245 rank migration: quintile replay; rows conserve the joint cohort") {
    import spark.implicits._
    val got = Relational.q245RankMigration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey", org.apache.spark.sql.functions.year($"o_orderdate"),
        $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.round(r.getDouble(2) * 100)))
    def quint(era1: Boolean): Map[Long, Long] = {
      val spend = orders.filter(o => (o._2 <= 1997) == era1)
        .groupBy(_._1).view.mapValues(_.map(_._3).sum).toSeq
      val n = spend.length.toLong
      spend.sortBy { case (ck, c) => (-c, ck) }.zipWithIndex.map {
        case ((ck, _), i) => ck -> (5L - (5L * i) / n)
      }.toMap
    }
    val (q1m, q2m) = (quint(true), quint(false))
    val joint = q1m.keySet intersect q2m.keySet
    val want = joint.toSeq.map(ck => (q1m(ck), q2m(ck)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(_._3).sum == joint.size.toLong)
    got.foreach { case (a, b, n, share) =>
      assert(n == want((a, b)))
      val rowTotal = got.filter(_._1 == a).map(_._3).sum
      assert(share == 1000000L * n / rowTotal)
    }
  }

  test("q247 correlation matrix: centered integer replay, bounded in [-1e6, 1e6]") {
    import spark.implicits._
    val Array(row) = Relational.q247CorrMatrix(spark, sf0001).collect()
    val got = (0 until 6).map(row.getLong)
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
      .collect().map(r => Array(
        math.round(r.getDouble(0) * 100), math.round(r.getDouble(1)),
        math.round(r.getDouble(2) * 10000), math.round(r.getDouble(3) * 10000)))
    val n = li.length.toLong
    val means = (0 until 4).map(j => li.map(_(j)).sum / n)
    val c = li.map(r => (0 until 4).map(j => r(j) - means(j)).toArray)
    def s2(j: Int) = c.map(r => r(j) * r(j)).sum
    def sxy(i: Int, j: Int) = c.map(r => r(i) * r(j)).sum
    val pairs = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      val den = (math.floor(math.sqrt(s2(i).toDouble)).toLong *
        math.floor(math.sqrt(s2(j).toDouble)).toLong) / 1000L
      assert(got(k) == (1000L * sxy(i, j)) / den, s"pair $i,$j")
      assert(got(k) >= -1000100 && got(k) <= 1000100, "ppm-bounded (+eps)")
    }
  }

  test("q253 Benford: complete digit spine, exact replay, shares telescope") {
    import spark.implicits._
    val got = Relational.q253BenfordScreen(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).toSeq == (1 to 9), "all nine digits present in order")
    val prices = graft.Tables.orders(spark, sf0001)
      .select($"o_totalprice").collect().map(_.getDouble(0))
    val digits = prices.map(p =>
      math.floor(p * 100).toLong.toString.head.asDigit)
    val total = digits.length.toLong
    got.foreach { case (d, n, obs, exp, dev) =>
      assert(n == digits.count(_ == d).toLong)
      assert(obs == 1000000L * n / total)
      assert(exp == Relational.benfordPpm(d - 1))
      assert(dev == obs - exp)
    }
    assert(got.map(_._2).sum == total, "digit counts partition the orders")
    // floored expectation table itself sums to ~1e6
    assert(Relational.benfordPpm.sum > 999990L &&
      Relational.benfordPpm.sum <= 1000000L)
  }

  test("q288 reconciliation: exact-charge replay; buckets partition the orders") {
    import spark.implicits._
    val got = Relational.q288Reconciliation(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lines = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount", $"l_tax")
      .collect()
      .map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 100) *
          (10000L - math.round(r.getDouble(2) * 10000)) *
          (10000L + math.round(r.getDouble(3) * 10000))))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val diffs = orders.map { case (k, hdr) =>
      lines.getOrElse(k, 0L) - hdr * 100000000L }
    val want = diffs.groupBy { d =>
      if (d == 0) 0L
      else math.signum(d) *
        (64 - java.lang.Long.numberOfLeadingZeros(1 + math.abs(d) / 100000000L))
    }.map { case (b, g) =>
      (b, g.length.toLong, g.map(_ / 100000000L).min, g.map(_ / 100000000L).max) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == orders.length.toLong,
      "buckets partition all orders")
  }

  test("q289 largest remainder: per-order sums land exactly on the header total") {
    import spark.implicits._
    val got = Relational.q289LargestRemainder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    val totals = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100))).toMap
    val byOrder = got.groupBy(_._1)
    byOrder.foreach { case (ok, rows) =>
      assert(rows.map(_._4).sum == totals(ok),
        s"order $ok must allocate exactly its header total")
      // every allocation is its floor share or one cent above
      val pt = rows.map(_._3).sum
      rows.foreach { case (_, _, p, alloc) =>
        val base = totals(ok) * p / pt
        assert(alloc == base || alloc == base + 1L)
      }
    }
    // multiset determinism: re-running yields the identical result
    val again = Relational.q289LargestRemainder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
    assert(got.sortBy(x => (x._1, x._2, x._4)).toSeq ==
      again.sortBy(x => (x._1, x._2, x._4)).toSeq)
  }

  test("q300 accumulating snapshot: milestone replay; widths chain consistently") {
    import spark.implicits._
    val got = Relational.q300AccumulatingSnapshot(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", org.apache.spark.sql.functions
        .to_date($"l_shipdate"), $"l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
    val od = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", org.apache.spark.sql.functions
        .to_date($"o_orderdate")).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    assert(got.length == od.size, "one row per order")
    got.foreach { case (ok, nLines, cents, dFirst, dLast, span) =>
      li.get(ok) match {
        case Some(g) =>
          assert(nLines == g.length.toLong && cents == g.map(_._3).sum)
          val (f, l) = (g.map(_._2).min, g.map(_._2).max)
          import java.time.temporal.ChronoUnit.DAYS
          assert(dFirst == DAYS.between(od(ok), f))
          assert(dLast == DAYS.between(od(ok), l))
          assert(span == DAYS.between(f, l))
          assert(dLast - dFirst == span, "widths chain")
        case None =>
          assert(nLines == 0L && cents == 0L)
          assert(dFirst == -1L && dLast == -1L && span == -1L,
            "never-shipped orders disclose with sentinels")
      }
    }
  }

  test("q361 boosting: an exact step function is learned in one round") {
    import spark.implicits._
    // y = 100 for x <= 10, 500 above: one stump away from perfect
    val base = (1L to 20L).flatMap(x =>
      Seq.fill(2)((x, if (x <= 10) 100L else 500L))).toDF("x", "y")
    val got = Relational.boostedStumpsOf(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got(0) == ((0L, -1L, 300L, 300L, 40000L)))
    // round 1 finds the true threshold and the exact leaf corrections
    assert(got(1) == ((1L, 10L, -200L, 200L, 0L)))
    // later rounds have nothing left to fit: zero adds, MSE stays 0
    assert(got.drop(2).forall(r => r._3 == 0L && r._4 == 0L && r._5 == 0L))
  }

  test("q362 holdout boosting: learnable signal generalizes, fold is honest") {
    import spark.implicits._
    // same step function in both folds: test MSE must also hit 0
    def fold(ids: Range) = ids.map(i =>
      (i.toLong % 20 + 1, if (i % 20 + 1 <= 10) 100L else 500L)).toDF("x", "y")
    val got = Relational.boostedFold(fold(0 until 200), Some(fold(200 until 260)))
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(got.head._2 == 40000L && got.head._3 == 40000L)
    assert(got.tail.forall(r => r._2 == 0L && r._3 == 0L),
      s"trajectory: ${got.toSeq}")
  }

  test("q364 pipe syntax: same rows as the relational form of the query") {
    import spark.implicits._
    val pipe = Relational.q364SqlPipeSyntax(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val rel = graft.Tables.lineitem(spark, sf0001)
      .where($"l_quantity" >= 30)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_lines"),
        org.apache.spark.sql.functions.sum($"l_extendedprice".cast("decimal(12,2)"))
          .cast("double").as("revenue"))
      .orderBy($"l_returnflag", $"l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(pipe.toSeq == rel.toSeq)
  }

  test("q365 lateral join: equals the window top-1 formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val lat = Relational.q365LateralJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_name")
    val win = graft.Tables.customer(spark, sf0001)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where($"rn" === 1)
      .join(graft.Tables.nation(spark, sf0001),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_name", $"c_acctbal")
      .orderBy($"n_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(lat.toSeq == win.toSeq)
  }

  test("q366 variant: typed path reads agree with string get_json_object") {
    import spark.implicits._
    val v = Relational.q366VariantJson(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val j = graft.Tables.events(spark, sf0001)
      .selectExpr("event_type",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"k").as("s"),
        org.apache.spark.sql.functions.max($"k").as("m"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(v.toSeq == j.toSeq)
  }

  test("q367 recursive CTE: hop counts agree with an iterative BFS fold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{min => fmin, broadcast}
    val rec = Relational.q367RecursiveCte(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Iterative reference: materialize edges once, expand a frontier
    // twice, take min hops — the q159-shaped formulation.
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey")
    val edges = li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" &&
          $"a.l_partkey" =!= $"b.l_partkey")
      .select($"a.l_partkey".as("src"), $"b.l_partkey".as("dst"))
      .distinct().cache()
    val seed = li.agg(fmin($"l_partkey")).as[Long].head()
    var reach = Seq((seed, 0L))
    for (h <- 1 to 2) {
      val frontier = reach.filter(_._2 == h - 1).map(_._1).toSet
      val next = edges.where($"src".isin(frontier.toSeq: _*))
        .select($"dst").distinct().as[Long].collect()
        .filterNot(n => reach.exists(_._1 == n)).map((_, h.toLong))
      reach = reach ++ next
    }
    edges.unpersist()
    assert(rec.sortBy(_._1) == reach.sortBy(_._1),
      s"recursive=${rec.size} iterative=${reach.size}")
  }

  test("q368 unpivot: long form carries exactly the wide form's cells") {
    val rows = Relational.q368UnpivotMelt(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val flags = rows.map(_._1).distinct
    assert(rows.length == flags.length * 3)
    // every (flag, measure) cell present exactly once
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    // qty sum for one flag equals the direct aggregate
    import spark.implicits._
    val direct = graft.Tables.lineitem(spark, sf0001)
      .where($"l_returnflag" === flags.head)
      .agg(org.apache.spark.sql.functions.sum(
        $"l_quantity".cast("decimal(12,2)")).cast("double")).head().getDouble(0)
    val cell = rows.find(t => t._1 == flags.head && t._2 == "qty").get._3
    assert(cell == direct)
  }

  test("q369 GROUP BY ALL resolves to the explicit grouping") {
    import spark.implicits._
    val all = Relational.q369GroupByAll(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val explicit = graft.Tables.orders(spark, sf0001)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"o_totalprice".cast("decimal(12,2)"))
          .cast("double").as("rev"))
      .orderBy($"o_orderstatus", $"o_orderpriority", $"n", $"rev").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(all.toSeq == explicit.toSeq)
  }

  test("q370 collation: case variants collapse, binary grouping keeps them apart") {
    val rows = Relational.q370CollatedGroup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // planted noise guarantees ≥1 group with both case variants alive
    assert(rows.exists(_._3 == 2), s"no collapsed group in ${rows.toSeq}")
    // collated group count < binary group count (the collapse is real)
    import spark.implicits._
    val binaryGroups = graft.Tables.part(spark, sf0001)
      .selectExpr("CASE WHEN p_partkey % 2 = 1 THEN upper(p_brand) ELSE p_brand END AS b")
      .select($"b").distinct().count()
    assert(rows.length < binaryGroups)
    // totals conserve: Σ n_parts = table size
    assert(rows.map(_._2).sum ==
      graft.Tables.part(spark, sf0001).count())
  }

  test("q361 boosting: training MSE falls monotonically on the corpus") {
    val mses = Relational.q361BoostedStumps(spark, sf0001).collect()
      .map(_.getLong(4)).toSeq
    assert(mses.length == Relational.boostRounds + 1)
    assert(mses.zip(mses.tail).forall { case (a, b) => b <= a },
      s"MSE trajectory not monotone: $mses")
  }

  test("q381 parameterized sql: binds equal the inlined literals") {
    import spark.implicits._
    val par = Relational.q381ParameterizedSql(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val lit = graft.Tables.lineitem(spark, sf0001)
      .where($"l_quantity" >= 25 && $"l_discount" <= 0.07)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"l_extendedprice".cast("decimal(12,2)"))
          .cast("double").as("rev"))
      .orderBy($"l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(par.toSeq == lit.toSeq)
  }

  test("q387 sql scripting: the loop's fixpoint is the grid argmax") {
    import spark.implicits._
    val r = Relational.q387SqlScripting(spark, sf0001).collect()(0)
    val (qty, n, target) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    val li = graft.Tables.lineitem(spark, sf0001)
    def cnt(q: Double) = li.where($"l_quantity" >= q).count()
    assert(target == li.count() / 4)
    // the returned cutoff clears the target...
    assert(n == cnt(qty) && n >= target)
    // ...and the loop genuinely iterated: one step higher fails it
    assert(qty < 50.0, "loop never entered")
    assert(cnt(qty + 5) < target)
  }

  test("q405 execute immediate: dynamic result equals the static twin; " +
      "IDENTIFIER binding refuses an injection payload") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dyn = Relational.q405ExecuteImmediate(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val static0 = graft.Tables.lineitem(spark, sf0001)
      .where($"l_quantity" >= 35.0)
      .groupBy($"l_returnflag".as("grp"))
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast("decimal(12,2)")).cast("double")
          .as("revenue"))
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(dyn.toSeq == static0.toSeq)
    // a name that isn't a column fails ANALYSIS — it can never smuggle
    // SQL through the identifier slot
    val ex = intercept[Exception] {
      spark.sql("""EXECUTE IMMEDIATE
        |  'SELECT IDENTIFIER(:grp) FROM graft_li_q405 LIMIT 1'
        |  USING 'l_returnflag; DROP TABLE x' AS grp""".stripMargin)
        .collect()
    }
    val msg = ex.getMessage
    assert(msg != null && msg.nonEmpty)
  }

  test("q409 null trap: NOT IN against a NULL-bearing list is empty; " +
      "the three safe forms agree on the true complement") {
    import spark.implicits._
    val got = Relational.q409NotInTrap(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = graft.Tables.orders(spark, sf0001)
      .where($"o_orderkey" % 100 === 0).count()
    assert(got("a_not_in") == 0L, "3VL: one NULL empties NOT IN")
    assert(got("b_not_exists") == truth)
    assert(got("c_anti_join") == truth)
    assert(got("d_not_in_filtered") == truth)
    assert(truth > 0L, "fixture must have a live complement")
  }

  test("q415 crosstab: the seven dow columns are schema-fixed — a " +
      "weekday-free fixture still emits all of 1..7, absent days zero") {
    import spark.implicits._
    // only Monday(2) and Thursday(5) observed; crosstab alone would
    // emit a 2-column sheet and break any fixed-schema consumer
    val pairs = Seq(("click", 2), ("click", 2), ("click", 5), ("view", 5))
      .toDF("event_type", "dow")
    val df = Relational.dowCrosstabOf(pairs)
    assert(df.columns.toSeq == "event_type_dow" +: (1 to 7).map(_.toString))
    val rows = df.collect().map(r => r.getString(0) ->
      (1 to 7).map(i => r.getLong(i))).toMap
    assert(rows("click") == Seq(0L, 2L, 0L, 0L, 1L, 0L, 0L))
    assert(rows("view") == Seq(0L, 0L, 0L, 0L, 1L, 0L, 0L))
  }
}
