package graft.ops

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Sketch guarantees beyond the oracle hashes: the Count-Min
  * one-sided error and the Bloom filter's transparency + selectivity.
  */
class SketchOpsSpec extends SparkSuite {

  test("q153 CMS: estimates are one-sided (est >= exact, never under)") {
    import spark.implicits._
    val rows = SketchOps.q153CmsHeavyHitters(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"token=${r.getString(0)} undercounted")
      assert(over == est - exact)
    }
    // exact counts agree with an independent recount of the stream
    val recount = Tables.documents(spark, sf0001)
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(recount(r.getString(0)) == r.getLong(1))
    }
  }

  test("q156 bloom prejoin: result identical to the plain semi join; " +
      "filter passes every true match") {
    import spark.implicits._
    val dir = sf0001
    val got = SketchOps.q156BloomPrejoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val keys = Tables.customer(spark, dir)
      .where($"c_mktsegment" === SketchOps.bloomSegment).select($"c_custkey")
    val want = Tables.orders(spark, dir)
      .join(keys, $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("t"))
      .orderBy($"o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("q156 plan: bloom word-table probes broadcast; no bitmap on the driver") {
    val plan = SketchOps.q156BloomPrejoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= SketchOps.bloomHashes,
      s"expected >=${SketchOps.bloomHashes} broadcast word-table joins:\n$plan")
  }

  test("q170 HLL: raw branch within 10% on 20k keys; linear branch near-exact; insert-idempotent") {
    import spark.implicits._
    val big = (1 to 20000).map(i => ("big", s"k$i"))
    val small = Seq(("small", "a"), ("small", "b"), ("small", "c"))
    val rows = (big ++ small).toDF("grp", "key")
    val got = SketchOps.hllOf(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (bigExact, bigEst) = got("big")
    assert(bigExact == 20000L)
    // raw-estimator branch: est far above the 2.5m linear cutoff
    assert(bigEst > (5L * SketchOps.hllRegisters) / 2)
    assert(math.abs(bigEst - 20000L) < 2000L, s"raw est $bigEst off >10%")
    val (smallExact, smallEst) = got("small")
    assert(smallExact == 3L && math.abs(smallEst - 3L) <= 1L)
    // duplicating every row changes nothing: max-register insertion
    // is idempotent (the property that makes registers mergeable)
    val dup = SketchOps.hllOf(rows.unionAll(rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dup == got)
  }

  test("q174 overlap algebra: disjoint pairs near zero, identical pairs near full") {
    import spark.implicits._
    // A and B share all 100 users; C is disjoint from both
    val rows = ((1 to 100).flatMap(i => Seq(("A", s"u$i"), ("B", s"u$i"))) ++
      (201 to 300).map(i => ("C", s"u$i"))).toDF("grp", "key")
    val got = SketchOps.hllOverlapOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("A", "B"))._1 == 100L)
    assert(got(("A", "C"))._1 == 0L && got(("B", "C"))._1 == 0L)
    // inclusion-exclusion: identical populations estimate near full
    // overlap, disjoint ones near zero (|err| bounded by combined
    // linear-counting noise, generous at these sizes)
    assert(math.abs(got(("A", "B"))._2 - 100L) <= 15L)
    assert(math.abs(got(("A", "C"))._2) <= 15L)
    assert(math.abs(got(("B", "C"))._2) <= 15L)
  }

  test("q186 rolling actives: exact replays driver-side, estimate tracks it") {
    import spark.implicits._
    val rows = SketchOps.q186RollingActives(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getLong(3))))
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf0001)
      .select($"event_type", org.apache.spark.sql.functions.to_date($"ts"),
        $"user_id").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    rows.foreach { case ((t, day), (exact, est)) =>
      val d = java.time.LocalDate.parse(day)
      val want = ev.filter { case (et, ed, _) =>
        et == t && !ed.isAfter(d) &&
          !ed.isBefore(d.minusDays(SketchOps.rollingDays - 1))
      }.map(_._3).distinct.length.toLong
      assert(exact == want, s"($t, $day)")
      // linear-counting regime on the fixture: estimate within 15%
      if (exact > 0)
        assert(math.abs(est - exact).toDouble / exact < 0.15, s"($t, $day) $est/$exact")
    }
  }

  test("q278 kmv: sketch replay on the fixture; planted overlap estimates true J") {
    import spark.implicits._
    val k = SketchOps.kmvK
    val got = SketchOps.q278KmvJaccard(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // independent replay: exact bottom-k over collected content hashes
    val fps = graft.Tables.documents(spark, sf0001)
      .select($"source", org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(md5(regexp_replace(lower(text), ' +', ' '))," +
          " 1, 15), 16, 10) AS BIGINT)").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .distinct.groupBy(_._1)
      .map { case (src, g) => src -> g.map(_._2).sorted.take(k.toInt).toSet }
    val srcs = fps.keys.toSeq.sorted
    for (i <- srcs.indices; j <- i + 1 until srcs.length) {
      val (a, b) = (fps(srcs(i)), fps(srcs(j)))
      val union = (a ++ b).toSeq.sorted.take(k.toInt)
      val matches = union.count(h => a.contains(h) && b.contains(h)).toLong
      val kUsed = union.length.toLong
      assert(got((srcs(i), srcs(j))) ==
        ((kUsed, matches, 1000000L * matches / kUsed)), s"${srcs(i)}/${srcs(j)}")
    }
    // planted: two 300-element sets sharing 100 → true J = 0.2; the
    // k=64 estimate must land within the sketch's ~4/√k band
    val ids = (1L to 300L).map(i => ("pa", i)) ++
      (201L to 500L).map(i => ("pb", i))
    val planted = ids.toDF("source", "i")
      .select($"source", org.apache.spark.sql.functions.expr(
        "CAST(conv(substring(md5(CAST(i AS STRING)), 1, 15), 16, 10)" +
          " AS BIGINT)").as("h"))
    val est = SketchOps.kmvJaccardOf(planted).collect()(0).getLong(4)
    assert(math.abs(est - 200000L) < 100000L, s"est $est vs true 200000")
  }

  test("q309 ams f2: md5-fold replay; single-key exactness; error budget") {
    import spark.implicits._
    // sf replay from first principles: recompute the 16 tug-of-war
    // sums with java MessageDigest and the exact F2 from key counts
    val got = SketchOps.q309AmsF2(spark, sf0001).collect()(0)
    val ks = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey").collect().map(_.getLong(0))
    def sigma(i: Int, k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ams$i:$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
      1L - 2L * (java.lang.Long.parseLong(hex.take(4), 16) % 2)
    }
    val est = (0 until SketchOps.amsSketches).map { i =>
      val x = ks.map(sigma(i, _)).sum; x * x
    }.sum / SketchOps.amsSketches
    val counts = ks.groupBy(identity).map(_._2.length.toLong)
    val exact = counts.map(c => c * c).sum
    assert(got.getLong(0) == ks.length.toLong)
    assert(got.getLong(1) == counts.size.toLong)
    assert(got.getLong(2) == exact && got.getLong(3) == est)
    assert(got.getLong(4) == 1000000L * math.abs(est - exact) / exact)
    // the fixture lands inside the sketch's ~35% relative s.d. budget
    assert(got.getLong(4) < 350000L, s"observed err ${got.getLong(4)} ppm")
    // single-key corpus: every sigma_i agrees, X_i^2 = m^2 exactly
    val one = SketchOps.amsF2Of(
      Seq.fill(9)(7L).toDF("k")).collect()(0)
    assert((one.getLong(2), one.getLong(3), one.getLong(4)) ==
      ((81L, 81L, 0L)), "degenerate skew is where the sketch is exact")
  }

  test("q383 bitmap algebra: word-grain popcounts equal driver-side exact sets") {
    import spark.implicits._
    val o = graft.Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice").collect()
    val fin = o.filter(_.getString(1) == "F").map(_.getLong(0)).toSet
    val urg = o.filter(r => Set("1-URGENT", "2-HIGH")(r.getString(2)))
      .map(_.getLong(0)).toSet
    val big = o.filter(_.getDouble(3) >= 150000.0).map(_.getLong(0)).toSet
    val sets = Map("s_finished" -> fin, "s_urgent" -> urg, "s_big" -> big)
    val rows = SketchOps.q383BitmapAlgebra(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 3)
    rows.foreach { case (a, b, na, nb, nAnd, nOr, j) =>
      val (sa, sb) = (sets(a), sets(b))
      assert(na == sa.size.toLong && nb == sb.size.toLong)
      assert(nAnd == (sa & sb).size.toLong, s"$a ∩ $b")
      assert(nOr == (sa | sb).size.toLong)
      assert(j == 1000000L * nAnd / nOr)
      // every Venn region live (the overlapping-predicate plant)
      assert(nAnd > 0 && nAnd < na && nAnd < nb, s"$a/$b degenerate")
    }
  }

  test("q390 misra-gries: vocab >> k fires decrements, summary stays <= k " +
      "per partition, candidates cover every above-guarantee token, and " +
      "the two-pass output equals the direct exact HAVING query") {
    import spark.implicits._
    val k = 16
    // 1 heavy token (1/8 of the stream) + 7 warm + 3500 singletons:
    // vocabulary 3508 >> 16 counters, so the decrement branch fires
    val stream = (Seq.fill(500)("heavy") ++
      (0 until 7).flatMap(i => Seq.fill(100)(s"warm$i")) ++
      (0 until 2800).map(i => s"cold$i"))
    val n = stream.size.toLong
    val toks = spark.createDataset(stream).repartition(4)
    val summ = SketchOps.mgSummary(toks, k)
      .withColumn("pid", expr("spark_partition_id()"))
      .collect()
    val perPart = summ.groupBy(_.getInt(2)).map(_._2.size)
    assert(perPart.forall(_ <= k), s"summary exceeded $k counters")
    assert(summ.length < 3508, "decrement branch never fired (vocab held)")
    // MG guarantee: every token with freq > N/(k+1) survives the union
    val cands = summ.map(_.getString(0)).toSet
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size }
    exact.filter(_._2 > n / (k + 1)).keys
      .foreach(t => assert(cands(t), s"guaranteed token $t missing"))
    // two-pass output == the plain exact HAVING query (share 12: heavy
    // at 1/8 of the stream passes, everything else fails)
    val got = SketchOps.mgExactHeavy(toks, k, 12).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = exact.filter(_._2 > n / 12).toSeq
      .map { case (t, c) => (t, c.toLong, 1000000L * c / n) }
      .sortBy { case (t, c, _) => (-c, t) }
    assert(got.toSeq == want)
    assert(got.map(_._1).toSeq == Seq("heavy"))
  }

  test("q390 corpus run: output equals the exact recount at sf0.001") {
    import spark.implicits._
    val got = SketchOps.q390MgHeavyHitters(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tk = Tables.documents(spark, sf0001)
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = tk.map(_._2).sum
    val want = tk.filter(_._2 > n / SketchOps.mgShare)
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty && got.length < tk.length,
      "threshold must select a nontrivial strict subset")
  }
}
