package graft.ops

import graft.SparkSuite

class SimilarityOpsSpec extends SparkSuite {

  test("q70 brute force: k results per query, descending cosine, no self-match") {
    val rows = SimilarityOps.q70KnnBruteForce(spark, sf0001).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until SimilarityOps.nQueries).toSet)
    byQuery.values.foreach { rs =>
      assert(rs.length == SimilarityOps.topK)
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
      sorted.foreach(r => assert(r.getLong(1) != r.getLong(0))) // no self
      assert(sorted.map(_.getInt(2)).toSeq == (1 to SimilarityOps.topK))
    }
  }

  test("q71 ivf: recall@10 vs brute force is usable, exact ranks within candidates") {
    val exact = SimilarityOps.q70KnnBruteForce(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = SimilarityOps.q71KnnIvf(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // every query answered
    assert(approx.keySet == exact.keySet)
    val recalls = exact.map { case (q, e) =>
      approx(q).intersect(e).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe=4 of 8 fixed cells → ~half the corpus probed on the
    // near-uniform synthetic vectors → solid but not perfect recall
    assert(mean >= 0.5, s"mean recall@10 = $mean")
  }

  test("q52 lsh: usable recall@10 vs brute force, exact ranks within candidates") {
    val exact = SimilarityOps.q70KnnBruteForce(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = SimilarityOps.q52KnnLsh(spark, sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(approx.keySet == exact.keySet)
    val recalls = exact.map { case (q, e) =>
      approx.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    // 3 bits x 4 tables probes ~half the near-uniform corpus
    assert(mean >= 0.4, s"mean recall@10 = $mean")
  }

  test("q71 ivf scans fewer candidates than brute force would") {
    // structural check: candidate set per query is bounded by the
    // probed cells, i.e. strictly fewer scored pairs than n*q
    val n = graft.Tables.embeddings(spark, sf0001).count()
    val perQueryCandidates = SimilarityOps.q71KnnIvf(spark, sf0001)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQueryCandidates.forall(_ <= SimilarityOps.topK))
    assert(n > SimilarityOps.topK) // sanity
  }
}
