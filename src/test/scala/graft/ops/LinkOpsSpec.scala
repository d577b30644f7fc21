package graft.ops

import graft.SparkSuite

class LinkOpsSpec extends SparkSuite {

  test("q132 matches within a block and documents the cross-block miss") {
    val got = LinkOps.q132EntityMatch(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // every emitted pair shares its blocking noun and is within distance
    got.foreach { case (a, b, d) =>
      assert(a.split(' ').last == b.split(' ').last, s"cross-block pair $a / $b")
      assert(d <= LinkOps.matchDistance && a < b)
    }
    // a same-noun near pair the sf corpus is known to contain
    assert(got.exists { case (a, b, _) =>
      a.split(' ').last == b.split(' ').last && a != b })
    // blocking tradeoff pin: names whose HEAD NOUN differs are never
    // compared, however close the full strings are — that recall loss
    // is inherent to single-key blocking (Scaladoc documents the
    // second-pass mitigation), so no pair with distinct nouns appears
    assert(got.forall { case (a, b, _) =>
      a.split(' ').last == b.split(' ').last })
  }

  test("q136 triangle counts on a planted K4 plus a triangle-free path") {
    import spark.implicits._
    // baskets: {1,2,3,4} twice (dup edges must not double-count),
    // {4,5}, {5,6} — a path hanging off the clique
    val items = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (101L, 1L), (101L, 2L), (101L, 3L), (101L, 4L),
      (102L, 4L), (102L, 5L),
      (103L, 5L), (103L, 6L),
    ).toDF("ok", "pk")
    val got = LinkOps.triangleCountsOf(items).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 has C(4,3)=4 triangles; each clique node sits in exactly 3;
    // path nodes 5 and 6 are in none (absent from the result)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q143 LPA converges to one community per planted clique") {
    import spark.implicits._
    // two disjoint triangles; synchronous min-tie-break LPA settles
    // each on its smallest member id within 3 rounds (hand-traced:
    // r1 mixes, r2 floods the min, r3 confirms)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (11L, 12L), (11L, 13L), (12L, 13L),
    ).toDF("u", "v")
    val got = LinkOps.lpaOf(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      11L -> 11L, 12L -> 11L, 13L -> 11L))
  }

  test("q146 rules carry hand-computed confidence and lift") {
    import spark.implicits._
    // baskets: {1,2}×3, {1,3}×1 → N=4; sup(1)=4, sup(2)=3, sup(3)=1;
    // only pair (1,2) reaches support 3.
    // 1→2: conf = 3e6 div 4 = 750000; lift = 3·4e6 div (4·3) = 1000000
    // 2→1: conf = 1000000; lift = 1000000
    val items = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 1L), (13L, 3L),
    ).toDF("ok", "pk")
    val got = LinkOps.associationRulesOf(items).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got == Map(
      (1L, 2L) -> ((3L, 4L, 3L, 750000L, 1000000L)),
      (2L, 1L) -> ((3L, 3L, 4L, 1000000L, 1000000L)),
    ))
  }

  test("q136 agrees with a naive all-triples count on sf0.001") {
    val got = LinkOps.q136TriangleCounts(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive driver-side recount: adjacency over distinct co-purchase
    // edges, then check every emitted count against brute force
    import spark.implicits._
    val edges = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
      }.toSet
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (u, v)) =>
      m + (u -> (m.getOrElse(u, Set.empty) + v)) + (v -> (m.getOrElse(v, Set.empty) + u))
    }
    val want = adj.map { case (n, nbrs) =>
      val ns = nbrs.toSeq
      n -> ns.indices.flatMap(i => (i + 1 until ns.size).map(j =>
        if (edges.contains((ns(i) min ns(j)) -> (ns(i) max ns(j)))) 1L else 0L)).sum
    }.filter(_._2 > 0)
    assert(got == want)
  }

  test("q159 BFS hops on a planted path: exact distances, radius cutoff") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus an isolated edge 10-11; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("node")
    val got = LinkOps.bfsHopsOf(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nodes beyond bfsMaxHops (5, 6) and the disconnected edge are
    // absent — bounded-radius semantics, not transitive closure
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("q159 seed nodes always report hop 0 even when linked to each other") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val seeds = Seq(1L, 2L).toDF("node")
    val got = LinkOps.bfsHopsOf(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("q187 triples: hand-counted support, prune-transparent") {
    import spark.implicits._
    // {1,2,3} appears in baskets 100, 101 -> support 2; {1,2,4} only
    // in 102 -> support 1, out; basket 103 is a pair-only basket
    val items = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (101L, 2L), (101L, 3L), (101L, 9L),
      (102L, 1L), (102L, 2L), (102L, 4L),
      (103L, 5L), (103L, 6L),
    ).toDF("ok", "pk")
    val got = LinkOps.frequentTriplesOf(items).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 2L)))
  }

  test("q195 recs: cosine ranking demotes the bestseller raw counts favor") {
    import spark.implicits._
    // item 1 pairs with bestseller 9 in 2 of many baskets, and with
    // niche item 2 in its only 2 baskets: raw counts tie (2 = 2), but
    // cosine prefers the niche affinity (sup(2)=2 << sup(9)=6)
    val items = Seq(
      (1L, 1L), (1L, 2L), (1L, 9L),
      (2L, 1L), (2L, 2L), (2L, 9L),
      (3L, 9L), (4L, 9L), (5L, 9L), (6L, 9L),
    ).toDF("ok", "pk")
    val got = LinkOps.itemRecsOf(items).collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> r.getLong(1)).toMap
    // item 1, rank 1 must be the niche item 2, not bestseller 9:
    // cos2(1,2) = 1e6*4/(2*2) = 1e6; cos2(1,9) = 1e6*4/(2*6) = 333333
    assert(got((1L, 1L)) == 2L)
    assert(got((1L, 2L)) == 9L)
  }

  test("q200 peeling cascades where one-shot thresholding would not") {
    import spark.implicits._
    // K4 clique {1,2,3,4} plus chain 4-5-6: with k=2, node 6 (deg 1)
    // peels first, then 5 (its degree FALLS to 1) - a one-shot
    // threshold keeps 5 (initial deg 2). Core = the clique.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
    ).toDF("u", "v")
    val got = LinkOps.kcoreOf(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q201 HITS: determinism and the max-authority anchor") {
    val a = LinkOps.q201HitsAuthority(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = LinkOps.q201HitsAuthority(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // grid normalization anchors the max at exactly 1024 and keeps
    // every score within the grid
    assert(a.map(_._2).max == 1024L)
    assert(a.forall { case (_, s) => s >= 0L && s <= 1024L })
    // mutual reinforcement produces genuine spread, not a constant
    assert(a.map(_._2).distinct.length > 10)
  }

  test("q307 link prediction: path, square, cap, adjacency exclusion") {
    import spark.implicits._
    def lp(es: Seq[(Long, Long)]) =
      LinkOps.linkPredictionOf(es.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // path 1-2-3: the only candidate is (1,3) through center 2
    assert(lp(Seq((1L, 2L), (2L, 3L))).toSeq ==
      Seq((1L, 3L, 1L, 500000L)))
    // square: both diagonals, two centers each, RA = 2 * 1/2
    assert(lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))).toSeq ==
      Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    // triangle: every wedge closes - adjacency exclusion leaves nothing
    assert(lp(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
    // a hub over the degree cap generates no wedges...
    val over = (1L to 65L).map(i => (i, 100L))
    assert(lp(over).isEmpty, "deg-65 center must be cut")
    // ...at the cap it does, top-20 under the pinned total order
    val at = (1L to 64L).map(i => (i, 100L))
    val got = lp(at)
    assert(got.length == 20)
    assert(got.forall(r => r._3 == 1L && r._4 == 1000000L / 64L))
    assert(got.toSeq == got.toSeq.sortBy(r => (r._1, r._2)))
    // sf sanity: no returned pair is an existing edge, scores positive
    val sfGot = LinkOps.q307LinkPrediction(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    assert(sfGot.nonEmpty)
    sfGot.foreach { case (u, v, cn, ra) =>
      assert(u < v && !edges.contains((u, v)), "candidates are non-edges")
      assert(cn >= 1L && ra >= 1L)
    }
  }

  test("q308 assortativity: star negative, tiered positive, sentinel") {
    import spark.implicits._
    def as(es: Seq[(Long, Long)]) =
      LinkOps.assortativityOf(es.toDF("u", "v")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).head
    // K1,3 star: spokes(1) <-> hub(3); exact mirrored integers:
    // mean=2, Sxx=Syy=6, Sxy=-6, isqrt(6)=2 -> -6e6/4 (the floored
    // sqrt inflates |r| past 1e6 on tiny frames - disclosed)
    assert(as(Seq((1L, 9L), (2L, 9L), (3L, 9L))) == ((6L, -1500000L)))
    // disjoint K3 + K4: within-clique edges join equal degrees ->
    // strongly assortative (exact: Sxy=Sxx=12, isqrt=3 -> 12e6/9)
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val k4 = for (i <- 4L to 7L; j <- i + 1 to 7L) yield (i, j)
    assert(as(k3 ++ k4) == ((18L, 1333333L)))
    // regular graph: zero degree variance, out-of-band sentinel
    assert(as(k3) == ((6L, 2000000L)))
  }

  test("q320 modularity: bridged cliques score the hand value, one blob 0") {
    import spark.implicits._
    // two triangles + one bridge: LPA (hand-traced through 3 sync
    // rounds) lands {1,2,3}->1 and {11,12,13}->3; m=7, each side
    // e_c=3, d_c=7: contrib = 1e6*(84-49) div 196 = 178571, Q~0.357
    val bridged = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (11L, 12L), (11L, 13L), (12L, 13L), (3L, 11L),
    ).toDF("u", "v")
    val got = LinkOps.modularityOf(bridged).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((3L, 7L, 3L, 178571L)),
      3L -> ((3L, 7L, 3L, 178571L)),
    ))
    // a single clique collapses to one community: Q = 0 exactly
    // (e_c = m and d_c = 2m make the two terms cancel)
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val one = LinkOps.modularityOf(k3).collect()
    assert(one.length == 1)
    assert(one(0).getLong(0) == 1L && one(0).getLong(4) == 0L)
  }

  test("q320 on the sf fixture: contributions bounded, Q in (-1, 1)") {
    val rows = LinkOps.q320Modularity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getLong(4)) <= 1000000L))
    val q = rows.map(_.getLong(4)).sum
    assert(q > -1000000L && q < 1000000L)
  }

  test("q321 clustering coefficient: K4-plus-path buckets hand-verified") {
    import spark.implicits._
    // K4 on 1..4, path 4-5-6: cc(1,2,3)=1e6 (deg 3, bucket 1),
    // cc(4) = 6 div 12 -> 500000 (deg 4, bucket 2), cc(5)=0 (deg 2,
    // bucket 1), node 6 deg 1 excluded.
    // bucket 1: n=4, tri=9, mean = 3e6 div 4 = 750000;
    // bucket 2: n=1, tri=3, mean = 500000
    val edges = ((for (i <- 1L to 4L; j <- i + 1 to 4L) yield (i, j)) ++
      Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = LinkOps.clusteringCoeffOf(edges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((4L, 9L, 750000L)),
      2L -> ((1L, 3L, 500000L)),
    ))
  }

  test("q321 on the sf fixture: ppm-bounded means, buckets are log2 grid") {
    val rows = LinkOps.q321ClusteringCoeff(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1L, "deg >= 2 implies bucket >= 1")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("q348 Fellegi-Sunter: hand-summed weights land pairs in their bands") {
    import spark.implicits._
    // one block, three records: (1,2) near-identical names + same
    // balance band -> match; (1,3) near name + different band ->
    // possible; planted name "zzz" vs others -> name-disagree pairs
    // score negative and are filtered as reject
    val cust = Seq(
      (1L, "Customer#01", 7L, "BUILDING", 3L),
      (2L, "Customer#02", 7L, "BUILDING", 3L),
      (3L, "Customer#03", 7L, "BUILDING", 9L),
      (4L, "zzzzzzzzzzz", 7L, "BUILDING", 3L),
    ).toDF("c_custkey", "c_name", "nat", "seg", "bb")
    val got = LinkOps.fsPairsOf(cust).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(got == Map(
      (1L, 2L) -> ((LinkOps.fsNameAgree + LinkOps.fsBalAgree, "match")),
      (1L, 3L) -> ((LinkOps.fsNameAgree + LinkOps.fsBalDis, "possible")),
      (2L, 3L) -> ((LinkOps.fsNameAgree + LinkOps.fsBalDis, "possible")),
    ), s"got $got")
  }

  test("q348 on the sf fixture: bands partition scores at the thresholds") {
    val rows = LinkOps.q348FellegiSunter(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sc, band) = (r.getLong(2), r.getString(3))
      assert(sc >= LinkOps.fsLower, "reject pairs must never be emitted")
      assert(band == (if (sc >= LinkOps.fsUpper) "match" else "possible"))
    }
  }

  test("q376 hyperball: monotone growth, exact saturation on planted cliques") {
    import spark.implicits._
    // two disjoint triangles: every ball saturates at h = 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("u", "v")
    val got = LinkOps.hyperballOf(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // h=0: six singleton balls, linear counting floor(16 ln(16/15)) = 1 each
    assert(got(0)._2 == 6L, s"nf(0) = ${got(0)._2}")
    // saturated: nf(1) = nf(2) = nf(3), growth exactly 1e6 after h=1
    assert(got(1)._2 == got(2)._2 && got(2)._2 == got(3)._2)
    assert(got(2)._3 == 1000000L && got(3)._3 == 1000000L)
    assert(got(0)._3 == -1L)
    // monotone nondecreasing always
    assert(got.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // sf graph: same invariants on real data
    val sf = LinkOps.q376HyperballAnf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sf.length == 4)
    assert(sf.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    assert(sf.tail.forall(_._3 >= 1000000L))
  }

  test("q378 rank-1 ALS: recovers a planted rank-1 matrix; SSE never rises") {
    import spark.implicits._
    // R = a_u * b_i exactly (a = 1,2,4; b = 3,5): rank-1, noiseless
    val cells = (for ((u, a) <- Seq((1L, 1L), (2L, 2L), (3L, 4L));
                      (i, b) <- Seq(("x", 3L), ("y", 5L)))
      yield (u, i, a * b)).toDF("uid", "item", "r")
    val got = LinkOps.rank1AlsOf(cells).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // item-factor RATIO approaches b ratio 5/3 (scale itself is not
    // identified in u*v — only the product is)
    val last = got.filter(_._1 == LinkOps.alsRounds)
    val vx = last.find(_._2 == "x").get._3.toDouble
    val vy = last.find(_._2 == "y").get._3.toDouble
    assert(math.abs(vy / vx - 5.0 / 3.0) < 0.01, s"ratio ${vy / vx}")
    // noiseless rank-1 fits to the fixed-point floor: sse per cell < 10 milli^2... 
    val sse2 = last.head._4
    assert(sse2 < 6 * 100L, s"planted rank-1 SSE too high: $sse2")
    // alternation on the sf corpus: SSE monotone nonincreasing
    val sf = LinkOps.q378Rank1Als(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val byRound = sf.distinct.sortBy(_._1).map(_._2)
    assert(byRound.length == LinkOps.alsRounds)
    assert(byRound.zip(byRound.tail).forall { case (a, b) => b <= a },
      s"SSE rose: ${byRound.toSeq}")
  }

  test("q393 k-truss: K4 survives, pendant triangle peels, and the " +
      "shared edge of a triangle chain dies only via the round-2 cascade") {
    import spark.implicits._
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // pendant triangle off node 4 + a two-triangle chain sharing (11,12)
    val edges = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L),
      (10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L), (12L, 13L)))
      .toDF("u", "v")
    // one-shot support threshold at k=4 would KEEP (11,12): support 2
    val sup0 = LinkOps.trussSupportsOnEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup0((11L, 12L)) == 2L)
    assert(sup0((1L, 2L)) == 2L && sup0((4L, 5L)) == 1L)
    // the peel cascades it away: only K4 survives, every edge support 2
    val got = LinkOps.ktrussOf(edges, 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keySet == k4.toSet)
    assert(got.values.forall(_ == 2L))
  }

  test("q493 emits both tournament arms even when the item slice has " +
      "no pairs (smoke-scale fixtures)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("prefcyc").toString
    Seq(1L).toDF("p_partkey") // one item with p_partkey % 7 = 1 -> 0 pairs
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val r = LinkOps.q493PreferenceCycles(spark, tmp).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("hashed", 1L, 0L), ("ordered", 1L, 0L)), r.toString)
  }
}
