package graft.ops

import graft.SparkSuite
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSuite {

  test("q50 chunking: overlap geometry, tail chunks, short docs yield one chunk") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("chunks").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(12)), (2L, words(20)), (3L, words(30)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextOps.q50DocChunks(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 1 (12 toks < chunkSize): exactly one, whole doc
    assert(rows.filter(_._1 == 1L).toSeq == Seq((1L, 0L, words(12), 12L)))
    // doc 2 (20 toks): [1..16], tail [13..20] — 4-token overlap
    val d2 = rows.filter(_._1 == 2L).toSeq
    assert(d2.map(x => (x._2, x._4)) == Seq((0L, 16L), (1L, 8L)))
    assert(d2(1)._3 == (13 to 20).map(i => s"w$i").mkString(" "))
    // doc 3 (30 toks): three chunks, final covers tokens 25..30
    val d3 = rows.filter(_._1 == 3L).toSeq
    assert(d3.map(x => (x._2, x._4)) == Seq((0L, 16L), (1L, 16L), (2L, 6L)))
  }

  test("q50 chunking: de-overlapped chunk concatenation reconstructs every doc") {
    import spark.implicits._
    val overlap = TextOps.chunkSize - TextOps.chunkStride
    val tmp = java.nio.file.Files.createTempDirectory("chunks_inv").toString
    val sizes = Seq(1, 2, 11, 12, 13, 16, 17, 27, 28, 29, 40, 57)
    sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byDoc = TextOps.q50DocChunks(spark, tmp).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      val chunks = byDoc(i.toLong)
      val rebuilt = (chunks.head +: chunks.tail.map(
        _.split(" ").drop(overlap).mkString(" "))).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == (1 to n).map(j => s"w$j").mkString(" "), s"n=$n")
    }
  }

  test("q54 redaction masks planted PII of every shape; clean text untouched") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pii").toString
    Seq(
      (1L, "contact bob.smith+x@ex-ample.co.uk or call 12345678901 now"),
      (2L, "short 123456 id stays but 9876543 goes"),
      (3L, "perfectly clean text with no identifiers"),
      (4L, "call 555-867-5309 or 555.867.5309 or 555 867 5309 today"),
      (5L, "host 10.0.0.1 and 192.168.100.200 serve it"),
      (6L, "phone 555-867-5309 ip 10.0.0.1 acct 12345678 mail a@b.io"),
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextOps.q54RedactPii(spark, tmp).collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // tuple = (redacted, n_emails, n_phones, n_ipv4, n_longnums)
    assert(r(1L) == (("contact <EMAIL> or call <NUM> now", 1L, 0L, 0L, 1L)))
    assert(r(2L) == (("short 123456 id stays but <NUM> goes", 0L, 0L, 0L, 1L)))
    assert(r(3L) == (("perfectly clean text with no identifiers", 0L, 0L, 0L, 0L)))
    assert(r(4L) == (("call <PHONE> or <PHONE> or <PHONE> today", 0L, 3L, 0L, 0L)))
    assert(r(5L) == (("host <IP> and <IP> serve it", 0L, 0L, 2L, 0L)))
    assert(r(6L) == (("phone <PHONE> ip <IP> acct <NUM> mail <EMAIL>", 1L, 1L, 1L, 1L)))
  }

  test("q57 plants PII on every 5th doc and the redaction removes all of it") {
    import spark.implicits._
    val out = TextOps.q57RedactPlanted(spark, sf0001)
    // no unmasked planted PII survives anywhere
    assert(out.where($"redacted_text".rlike(TextOps.emailRe) ||
      $"redacted_text".rlike(TextOps.phoneRe) ||
      $"redacted_text".rlike(TextOps.ipv4Re) ||
      $"redacted_text".rlike(TextOps.longNumRe)).count() == 0)
    // every planted doc counted at least one of each planted shape
    val planted = out.where($"doc_id" % 5 === 0)
    assert(planted.count() > 0)
    assert(planted.where($"n_emails" < 1 || $"n_phones" < 1 ||
      $"n_ipv4" < 1 || $"n_longnums" < 1).count() == 0)
    // unplanted docs on the clean fixture are untouched no-ops
    assert(out.where($"doc_id" % 5 =!= 0 &&
      ($"n_emails" + $"n_phones" + $"n_ipv4" + $"n_longnums") =!= 0).count() == 0)
  }

  test("q59 repetition: looped text scores high, unique text zero, short text empty") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("repetition").toString
    Seq(
      (1L, "a b a b a b a b"),                        // 6 3-grams, 2 distinct
      (2L, (1 to 12).map(i => s"u$i").mkString(" ")), // all distinct
      (3L, "one two"),                                // under 3 tokens
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextOps.q59Repetition(spark, tmp).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r(1L) == ((6L, 2L, 3L, 1.0 - 2.0 / 6)))
    assert(r(2L) == ((10L, 10L, 1L, 0.0)))
    assert(r(3L) == ((0L, 0L, 0L, 0.0)))
  }

  test("q83 sequence packing: per-stream prefix sums, boundary spans, token conservation") {
    val rows = TextOps.q83SequencePack(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val b = TextOps.packBudget
    // within each stream, start_tok is exactly the running sum of
    // preceding docs' tokens in doc_id order (gapless concatenation)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (_, _, n, start, first, last) =>
        assert(start == cum)
        assert(first == start / b && last == (start + n - 1) / b)
        cum += n
      }
    }
    // every doc lands in exactly one stream; total tokens conserved
    assert(rows.map(_._1).distinct.length == rows.length)
    val totalToks = graft.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " ")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_._3).sum == totalToks)
  }

  test("q84/q85 url curation: planted domains extracted, cap keeps top-quality per domain") {
    import spark.implicits._
    val nPlanted = graft.Tables.documents(spark, sf0001)
      .where($"doc_id" % 4 === 0).count()
    assert(nPlanted > 0)
    val doms = TextOps.q84UrlDomains(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every planted doc carries the mirror URL; every domain is one of ours
    assert(doms("mirror.example.net") == ((nPlanted, nPlanted)))
    assert(doms.keySet.forall(d =>
      d == "mirror.example.net" || d.matches("site[0-6]\\.example\\.org")))
    val rows = TextOps.q85DomainCap(spark, sf0001).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    // URL-less docs bypass with keep=true; domained groups keep
    // exactly min(cap, size), the highest-quality members
    assert(rows.filter(_._2.isEmpty).forall(r => r._5 && r._4 == 0L))
    rows.filter(_._2.nonEmpty).groupBy(_._2).foreach { case (_, g) =>
      val kept = g.filter(_._5)
      assert(kept.length == math.min(TextOps.domainCap, g.length))
      val minKeptQ = kept.map(_._3).min
      assert(g.filterNot(_._5).forall(_._3 <= minKeptQ))
    }
    // primary-domain rule: doc's first URL is the per-doc site URL
    assert(rows.filter(_._2.nonEmpty).forall(_._2.get.startsWith("site")))
  }

  test("q60 text stats: counts consistent on a known sentence") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat on the mat", "en", "srcX", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("docs_tiny")
    val r = TextOps.q60TextStats(spark, sf0001).limit(0) // plan compiles on real table
    assert(r.columns.toSet == Set("doc_id", "lang", "n_chars_actual",
      "n_tokens", "n_distinct_tokens", "avg_token_len", "stopword_ratio"))
    // semantics on the tiny fixture via the same expressions
    val row = df
      .withColumn("toks", split(lower($"text"), " "))
      .select(
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_distinct"),
        size(filter($"toks", t => t.isin(TextOps.stopwords: _*))).as("n_stop"))
      .head()
    assert(row.getInt(0) == 6)
    assert(row.getInt(1) == 5)  // "the" repeats
    assert(row.getInt(2) == 3)  // the, on, the
  }

  test("q60/q62/q63 run on sf0.001 and return every document") {
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(TextOps.q60TextStats(spark, sf0001).count() == n)
    assert(TextOps.q62QualityScore(spark, sf0001).count() == n)
    assert(TextOps.q63Fingerprint(spark, sf0001).count() == n)
  }

  test("q61 language id: real sentences classified correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog in that field it was for fun", "en"),
      (2L, "el perro y la casa de que en un una los es grande", "es"),
      (3L, "le chat et la maison de les des est un une que belle", "fr"),
      (4L, "der hund und die katze das ist von den ein eine zu haus", "de"),
      (5L, "中文文本处理测试文档内容", "zh"),
    ).toDF("doc_id", "text", "expected")
    // run the same expression pipeline q61 uses, over the fixture
    val tmp = java.nio.file.Files.createTempDirectory("langid").toString
    df.withColumn("lang", $"expected").withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.q61LangId(spark, tmp)
      .select("doc_id", "labeled_lang", "predicted_lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    out.foreach { case (_, (expected, predicted)) => assert(predicted == expected) }
  }

  test("q63 fingerprint: whitespace-collapse canonicalization dedupes") {
    import spark.implicits._
    val fp = (t: String) => Seq(t).toDF("text")
      .select(md5(regexp_replace(lower($"text"), " +", " ")).as("f"))
      .head().getString(0)
    assert(fp("Hello  World") == fp("hello world"))
    assert(fp("hello world") != fp("hello there"))
  }

  test("VectorOps: dot/norm/cosine/l2sq exact on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot($"a", $"b").as("dot"),
      VectorOps.norm($"a").as("na"),
      VectorOps.cosine($"a", $"b").as("cos"),
      VectorOps.l2sq($"a", $"b").as("l2")).head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(math.abs(r.getDouble(3) - 27.0) < 1e-12)
  }

  test("IntVecDot: codegen'd integer dot equals the HOF fold exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(50)((
      Array.fill(64)(rnd.nextInt(255) - 127),
      Array.fill(64)(rnd.nextInt(255) - 127)))
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      graft.expr.VectorExprs.doti($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * y), 0L, (acc, v) -> acc + v)")
        .as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("VectorOps: native codegen dot is bit-identical to the HOF fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val diff = df.select(
      (VectorOps.dot($"a", $"b") - VectorOps.dotHof($"a", $"b")).as("d"))
      .collect().map(_.getDouble(0))
    assert(diff.forall(_ == 0.0)) // exact, not approx: same fold order
  }

  test("VectorOps: cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(0.3f, -0.7f, 0.11f))).toDF("a")
    val r = df.select(VectorOps.cosine($"a", $"a")).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-9)
  }

  test("q105 encoding decodes back: ids follow the deterministic vocab, OOV exact") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1).toSeq))
    // reference vocab: frequency desc, token asc — same total order
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
    val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextOps.vocabSize).zipWithIndex
      .map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val got = TextOps.q105VocabEncode(spark, sf0001).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(",", -1).map(_.toLong).toSeq,
        r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.length == docs.length)
    val byId = docs.toMap
    got.foreach { case (id, ids, nTok, nOov) =>
      val toks = byId(id)
      assert(ids.length == toks.length && nTok == toks.length)
      val expect = toks.map(t => vocab.getOrElse(t, 0L))
      assert(ids == expect, s"doc $id")
      assert(nOov == expect.count(_ == 0L))
    }
    // the fixture must exercise both branches
    assert(got.exists(_._4 > 0) && got.exists(g => g._4 < g._3))
  }

  test("q107 gopher rules: planted docs fail the dup-line rule, clean docs don't") {
    import spark.implicits._
    val rows = TextOps.q107GopherRules(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { case (id, nWords, meanLen, nLines, fBullet, fDup, passes) =>
      val toks = texts(id).split(" ", -1)
      assert(nWords == toks.length)
      assert(math.abs(meanLen - toks.map(_.length).sum.toDouble / toks.length) < 1e-9)
      if (id % 3 == 0) {
        // original line + 4 planted footer lines: 2 bullets, 3 distinct
        assert(nLines == 5 && math.abs(fBullet - 0.4) < 1e-9 &&
          math.abs(fDup - 0.4) < 1e-9)
        assert(!passes, s"doc $id: dup-line rule must fail planted docs")
      } else {
        assert(nLines == 1 && fBullet == 0.0 && fDup == 0.0)
        assert(passes == (nWords >= 50 && meanLen >= 3.0 && meanLen <= 10.0))
      }
    }
    // fixture exercises both verdicts among CLEAN docs too (word rules bite)
    val clean = rows.filter(_._1 % 3 != 0)
    assert(clean.exists(_._7) && clean.exists(!_._7))
  }

  test("q109 pmi matches a from-first-principles count model") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"text").collect().map(_.getString(0).toLowerCase.split(" ", -1))
    val uni = texts.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = uni.values.sum.toDouble
    val bi = texts.flatMap(t => t.init.zip(t.tail))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val b = bi.values.sum.toDouble
    val expect = bi.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      val pmi = BigDecimal(math.log(c * n * n / (b * uni(w1) * uni(w2))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      ((w1, w2), (c, pmi))
    }
    val got = TextOps.q109PmiCollocations(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == math.min(100, expect.size))
    got.foreach { case (w1, w2, c, pmi) =>
      val (ec, epmi) = expect((w1, w2))
      assert(c == ec, s"count for ($w1,$w2)")
      assert(math.abs(pmi - epmi) < 5e-4, s"pmi for ($w1,$w2): $pmi vs $epmi")
    }
    // descending by score, and the cut really kept the global top
    assert(got.map(_._4).sliding(2).forall(p => p.head >= p.last))
    val kept = got.map(t => (t._1, t._2)).toSet
    val minKept = got.map(_._4).min
    assert(expect.forall { case (k, (_, p)) => kept(k) || p <= minKept })
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q110 ES weighted sampling: exact replay; heavier docs overrepresented") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keys = docs.map { case (id, nc) =>
      val u = (java.lang.Long.parseLong(md5hex(s"q110:$id").substring(0, 8), 16)
        .toDouble + 1) / 4294967296.0
      val k = BigDecimal(math.log(u) / nc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, nc, k)
    }
    val expect = keys.sortBy { case (id, _, k) => (-k, id) }
      .take(TextOps.q110K)
    val got = TextOps.q110WeightedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq)
    got.zip(expect).foreach { case ((_, k), (_, _, ek)) =>
      assert(math.abs(k - ek) < 2e-6)
    }
    // weight-proportional: the sample's mean length exceeds the corpus's
    val meanAll = docs.map(_._2).sum.toDouble / docs.length
    val meanSel = expect.map(_._2).sum.toDouble / expect.length
    assert(meanSel > meanAll, s"sample mean $meanSel vs corpus $meanAll")
  }

  test("q111 quantile normalization: grid and interpolated reference replay") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ref = docs.filter(_._2 == "src0").map(_._3).sorted
    def quant(p: Double): Double = {
      val h = p * (ref.length - 1)
      val lo = h.toInt
      if (lo == ref.length - 1) ref(lo).toDouble
      else ref(lo) + (h - lo) * (ref(lo + 1) - ref(lo))
    }
    val rankIn = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case (r, i) =>
        r._1 -> (if (n == 1) 100L else (i.toLong * 100) / (n - 1)) }
    }.toMap
    val got = TextOps.q111QuantileNorm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(got.length == docs.length)
    got.foreach { case (id, gi, calib) =>
      assert(gi == rankIn(id), s"grid for doc $id")
      assert(math.abs(calib - quant(gi / 100.0)) < 1e-9, s"calib for doc $id")
    }
  }

  test("q112 mixture rebalance: exact replay; both capped and thinned sources") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nBefore = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val nTotal = docs.length
    def rate(src: String): Double = {
      val k = src.drop(3).toInt
      math.min(1.0, (k + 1) / 210.0 * nTotal / nBefore(src))
    }
    val expectAfter = docs.groupBy(_._2).view.mapValues(_.count { case (id, src) =>
      java.lang.Long.parseLong(md5hex(s"q112:$id").substring(0, 4), 16) % 10000 <
        math.floor(rate(src) * 10000).toLong
    }).toMap
    val got = TextOps.q112MixtureRebalance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.length == nBefore.size)
    got.foreach { case (src, before, after, kr) =>
      assert(before == nBefore(src) && after == expectAfter(src), s"source $src")
      assert(after <= before && math.abs(kr - rate(src)) < 1e-6)
    }
    // the declared mixture genuinely thins some sources and caps others
    assert(got.exists(_._4 == 1.0) && got.exists(_._4 < 1.0))
  }

  test("q116 canonicalization collapses case/query/fragment/slash variants") {
    import spark.implicits._
    val ids = graft.Tables.documents(spark, sf0001)
      .select($"doc_id").collect().map(_.getLong(0))
    val planted = ids.filter(_ % 4 == 0)
    val rows = TextOps.q116CanonicalUrls(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCanon = rows.map(r => r._1 -> r).toMap
    // the two per-doc raw variants (HTTPS://Site...?utm=1 vs ...#frag)
    // collapse to one canonical url per planted doc
    planted.foreach { id =>
      val canon = s"https://site${id % 7}.example.org/Page$id"
      val (_, nVar, nDocs, nMent) = byCanon(canon)
      assert(nVar == 2 && nDocs == 1 && nMent == 2, s"doc $id")
    }
    // the shared mirror link (trailing slash + host case trimmed) spans
    // every planted doc under one canonical key
    val (_, mv, md, mm) = byCanon("http://mirror.example.net/x")
    assert(md == planted.length && mm == planted.length && mv == 1)
    // nothing else: every canonical url is one of the planted shapes
    assert(rows.length == planted.length + 1)
  }

  test("q119 exact-k: each stratum yields min(k, size) docs, replayed draw order") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(d => (d._2, d._3)).view.mapValues { rows =>
      rows.toSeq.sortBy(d => (md5hex(s"q119:${d._1}"), d._1))
        .take(TextOps.q119K).map(_._1)
    }.toMap
    val got = TextOps.q119ExactKSample(spark, sf0001).collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getLong(0), r.getLong(3)))
    val byStratum = got.groupBy(_._1)
    assert(byStratum.keySet == expect.keySet)
    byStratum.foreach { case (k, rows) =>
      // expect(k) is the replayed take(min(K, stratum size))
      assert(rows.length == expect(k).length, s"stratum $k size")
      assert(rows.sortBy(_._3).map(_._2).toSeq == expect(k), s"stratum $k")
    }
    // the fixture has both full strata (k drawn) and smaller ones
    assert(expect.values.exists(_.length == TextOps.q119K) &&
      expect.values.exists(_.length < TextOps.q119K))
  }

  test("q124 funnel: cascade replayed rule by rule, every verdict fires") {
    import spark.implicits._
    val stop = TextOps.stopwords.toSet
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val footer = Seq("- planted bullet", "- planted bullet",
      "repeated footer", "repeated footer")
    val expect = texts.map { case (id, text) =>
      val t1 = if (id % 25 == 1) text + TextOps.q124RepTail else text
      val t0 = if (id % 3 == 0) t1 + footer.map("\n" + _).mkString else t1
      val toks = t0.toLowerCase.split(" ", -1)
      val lines = t0.split("\n", -1)
      val qs = math.min(t0.length / 500.0, 1.0) * 0.5 +
        toks.distinct.length.toDouble / toks.length * 0.3 +
        (1.0 - toks.count(stop).toDouble / toks.length) * 0.2
      val tris = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val rr = if (tris.isEmpty) 0.0
        else 1.0 - tris.distinct.length.toDouble / tris.length
      val dupLines = 1.0 - lines.distinct.length.toDouble / lines.length
      val verdict =
        if (t0.length < 100) "too_short"
        else if (dupLines >= 0.3) "bad_composition"
        else if (rr >= TextOps.q124RepThreshold) "repetitious"
        else if (qs < 0.6) "low_quality"
        else "keep"
      id -> verdict
    }.toMap
    val got = TextOps.q124CurationFunnel(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(5)))
    assert(got.length == expect.size)
    got.foreach { case (id, v) => assert(v == expect(id), s"doc $id") }
    assert(got.map(_._2).toSet == Set("too_short", "bad_composition",
      "repetitious", "low_quality", "keep"),
      s"verdict coverage: ${got.map(_._2).distinct.toSeq}")
  }

  test("q125 LM score: integer micro-nat replay; rare-trigram docs score higher") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))
    val tris = texts.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    }
    val lm = tris.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = lm.values.sum
    val expect = tris.map { case (id, gs) =>
      if (gs.isEmpty) id -> (0L, 0L)
      else {
        val sum = gs.map(g =>
          math.floor(math.log(t.toDouble / lm(g)) * 1000000.0).toLong).sum
        id -> (gs.length.toLong, sum / gs.length)
      }
    }.toMap
    val got = TextOps.q125LmScore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == expect.size)
    got.foreach { case (id, n, avg) =>
      val (en, eavg) = expect(id)
      assert(n == en && avg == eavg, s"doc $id: ($n,$avg) vs ($en,$eavg)")
    }
    // the signal discriminates: scores are not all equal, and the doc built
    // entirely of the corpus's most common trigrams would score at the floor
    val scores = got.filter(_._2 > 0).map(_._3)
    assert(scores.distinct.length > 10, "LM score should spread across docs")
    val cheapest = math.floor(math.log(t.toDouble / lm.values.max) * 1e6).toLong
    assert(scores.forall(_ >= cheapest))
  }

  test("q128 BM25: from-first-principles replay of the top-20 ranking") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))
    val n = texts.length.toDouble
    val avgdl = texts.map(_._2.length).sum.toDouble / texts.length
    val dfs = TextOps.bm25Terms.map(t => t -> texts.count(_._2.contains(t)).toDouble).toMap
    val (k1, b) = (TextOps.bm25K1, TextOps.bm25B)
    val scored = texts.map { case (id, toks) =>
      val s = TextOps.bm25Terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = dfs(t)
        math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * toks.length / avgdl))
      }.sum
      id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = scored.filter(_._2 > 0.0)
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val got = TextOps.q128Bm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == expect.map(_._1).toSeq,
      s"got ${got.take(5).mkString(",")} expect ${expect.take(5).mkString(",")}")
    got.zip(expect).foreach { case ((_, s), (_, es)) =>
      assert(math.abs(s - es) < 2e-4)
    }
  }

  test("q129 source divergence: integer micro-nat replay; KL is near-nonnegative") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split(" ", -1)))
    val bySrc = texts.groupBy(_._1).view.mapValues(_.flatMap(_._2
      .sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSeq).toMap
    val global = bySrc.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tg = global.values.sum
    val expect = bySrc.map { case (src, grams) =>
      val cs = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ts = grams.length.toLong
      val sum = cs.map { case (g, c) =>
        math.floor(math.log(c.toDouble * tg / (ts.toDouble * global(g))) * 1e6)
          .toLong * c
      }.sum
      src -> (ts, BigDecimal(sum.toDouble / ts / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextOps.q129SourceDivergence(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expect.size)
    got.foreach { case (src, n, kl) =>
      val (en, ekl) = expect(src)
      assert(n == en && math.abs(kl - ekl) < 2e-6, s"source $src: $kl vs $ekl")
      // KL >= 0 up to the micro-nat flooring error (one micro-nat per gram)
      assert(kl >= -2e-6, s"source $src negative divergence $kl")
    }
    assert(got.map(_._3).distinct.length > 1, "divergence should vary by source")
  }

  test("q130 normalization: planted damage repaired; clean docs byte-identical") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.q130Normalize(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == texts.size)
    got.foreach { case (id, norm, raw, nn) =>
      if (id % 5 == 2) {
        // NFC composed the accent (é is ONE char), the bell is gone,
        // doubled spaces collapsed — 3 chars shorter than raw
        assert(norm == texts(id) + " café xy z", s"doc $id")
        // tail adds 13 code points raw (incl. combining mark + bell);
        // normalization composes 1, strips 1, collapses 1 → −3
        assert(raw == texts(id).length + 13 && nn == raw - 3, s"doc $id lengths")
      } else {
        assert(norm == texts(id) && nn == raw, s"doc $id must be untouched")
      }
    }
    // the codegen'd expression IS the JDK normalizer
    val probe = Seq("café", "åbc", "plain").toDF("s")
      .select(graft.expr.TextExprs.nfc($"s")).collect().map(_.getString(0))
    val expect = Seq("café", "åbc", "plain")
      .map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(probe.toSeq == expect)
    assert(probe(0) == "café" && probe(1) == "åbc")
  }

  test("q96 blocklist drops exactly the docs citing a blocked domain") {
    import spark.implicits._
    val kept = TextOps.q96DomainBlocklist(spark, sf0001)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, sf0001)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val dropped = all -- kept
    assert(dropped.nonEmpty, "planted URLs must produce real drops")
    // planted geometry: doc_id % 4 == 0 docs cite site{doc_id%7}.example.org;
    // the blocklist is site1/site4 → dropped iff doc_id%4==0 && doc_id%7 ∈ {1,4}
    val expected = all.filter(id => id % 4 == 0 && (id % 7 == 1 || id % 7 == 4))
    assert(dropped == expected)
  }

  test("q91 split is disjoint, exhaustive, repartition-stable, and ~80/10/10") {
    import spark.implicits._
    val rows = TextOps.q91TrainValTest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    // exhaustive: one labeled row per doc; disjoint by construction
    // (one bucket value → exactly one CASE branch)
    assert(rows.length == nDocs)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, b, sp) =>
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(sp == expect)
    }
    val frac = rows.count(_._3 == "train").toDouble / rows.length
    assert(frac > 0.7 && frac < 0.9, s"train frac $frac")
    // determinism: the assignment is a pure function of doc_id — a
    // different physical partitioning must not move any doc
    val again = TextOps.q91TrainValTest(spark, sf0001)
      .repartition(7).collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(again == rows.map(t => (t._1, t._3)).toSet)
  }

  test("q92 trigrams: docs under 3 tokens emit nothing (no phantom partial grams)") {
    import spark.implicits._
    val tiny = Seq(("en", "one"), ("en", "one two"), ("en", "a b c"))
      .toDF("lang", "text")
    val grams = TextOps.trigramsOf(tiny).collect().map(_.getString(1))
    assert(grams.toSeq == Seq("a b c"))
  }

  test("q92 trigrams: floor respected, 3-token grams, counts match a direct recount") {
    import spark.implicits._
    val got = TextOps.q92TrigramCounts(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(_ >= TextOps.trigramMinCount))
    assert(got.keys.forall(_._2.split(" ", -1).length == 3))
    // independent recount straight off the table (driver-side fold)
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counted = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (lang, text) =>
      val t = text.toLowerCase.split(" ", -1)
      t.indices.dropRight(2).foreach { i =>
        val g = (lang, s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
        counted(g) = counted.getOrElse(g, 0L) + 1
      }
    }
    assert(got == counted.filter(_._2 >= TextOps.trigramMinCount).toMap)
  }

  test("q88 trim keeps ~top-75% of each language and never drops above a kept score") {
    import spark.implicits._
    val kept = TextOps.q88QualityTrim(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val scored = TextOps.q62QualityScore(spark, sf0001)
      .select($"doc_id", $"quality_score")
      .join(graft.Tables.documents(spark, sf0001).select($"doc_id", $"lang"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    scored.groupBy(_._3).foreach { case (lang, docs) =>
      val k = docs.filter(d => kept((d._1, lang))).map(_._2)
      val d = docs.filterNot(d => kept((d._1, lang))).map(_._2)
      // the cutoff property: every dropped score < every kept score
      if (k.nonEmpty && d.nonEmpty) assert(d.max < k.min, s"lang=$lang")
      // quantile_cont(0.25) bounds: at most 25% strictly below the
      // cutoff are dropped; ties at the cutoff are kept
      assert(d.length <= math.ceil(docs.length * 0.25).toInt, s"lang=$lang")
      assert(k.nonEmpty, s"lang=$lang kept nothing")
    }
  }

  test("q145 frontier equals the brute-force O(n²) dominance recount") {
    import spark.implicits._
    val pts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars", $"text").collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase.split(" ")
        (r.getLong(0), r.getLong(1), toks.distinct.length.toDouble / toks.length)
      }
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(p => (p._1, p._2)).toSet
    val got = TextOps.q145ParetoFrontier(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q140 BPE learns hand-derivable merges, greedy on overlapping runs") {
    import spark.implicits._
    // corpus: "aaaa" ×3, "ab" ×2. Round 1 pairs: (a,a) weight 3·3=9,
    // (a,b) 2 → merge (a,a). Greedy left-to-right: "aaaa" → [aa, aa]
    // (NOT [a,aa,a] or three overlapping pairs). Round 2 pairs:
    // (aa,aa) 3, (a,b) 2 → merge (aa,aa) — the learned symbol itself
    // pairs. Round 3: only (a,b) 2 remains.
    val docs = (Seq.fill(3)("aaaa") ++ Seq.fill(2)("ab")).toDF("text")
    val got = TextOps.bpeMergesOf(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "a", "a", 9L),
      (2, "aa", "aa", 3L),
      (3, "a", "b", 2L),
    ))
  }

  test("q167 buckets: per-lang tertiles ordered by score, sizes within one") {
    val rows = TextOps.q167LmBuckets(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(0), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val byBucket = docs.groupBy(_._4).view.mapValues(_.length).toMap
      val sizes = Seq("head", "middle", "tail").map(byBucket.getOrElse(_, 0))
      assert(sizes.max - sizes.min <= 1, s"$lang tertiles unbalanced: $sizes")
      // every head (score, doc_id) precedes every middle, middle every tail
      def keys(b: String) = docs.filter(_._4 == b).map(d => (d._2, d._3))
      val ord = Ordering[(Long, Long)]
      if (keys("head").nonEmpty && keys("middle").nonEmpty)
        assert(ord.lt(keys("head").max, keys("middle").min))
      if (keys("middle").nonEmpty && keys("tail").nonEmpty)
        assert(ord.lt(keys("middle").max, keys("tail").min))
    }
  }

  test("q168 dataset card replays from a driver-side fold") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"lang", $"n_chars", $"text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val nDocs = docs.length.toLong
    val distinctTexts = docs.map(_._4).distinct.length.toLong
    val want = (nDocs, docs.map(_._1).distinct.length.toLong,
      docs.map(_._2).distinct.length.toLong, docs.map(_._3).sum,
      docs.map(_._4.split(" ", -1).length.toLong).sum,
      distinctTexts, (1000000L * (nDocs - distinctTexts)) / nDocs)
    val r = TextOps.q168DatasetCard(spark, sf0001).collect()(0)
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
    assert(got == want)
  }

  test("q175 volume-weighted median sits at the byte midpoint, not the doc midpoint") {
    val rows = TextOps.q175VolMedian(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"n_chars", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (lang, nDocs, total, med) =>
      val ls = docs.filter(_._1 == lang).sortBy(d => (d._2, d._3)).map(_._2)
      assert(ls.length.toLong == nDocs && ls.sum == total)
      // replay: first length whose cumulative volume crosses half
      var cum = 0L
      val want = ls.find { x => cum += x; 2 * cum >= total }.get
      assert(med == want, s"$lang: $med vs $want")
      // and it is >= the plain median length (volume weighting can
      // only shift toward longer docs)
      assert(med >= ls(ls.length / 2) || ls.distinct.length == 1)
    }
  }

  test("q176 matrix: margins conserve and every flag is re-derivable") {
    val rows = TextOps.q176CoverageMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    val total = rows.map(_._3).sum
    assert(total == graft.Tables.documents(spark, sf0001).count())
    // row/col totals equal the sum of their line's cells
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.forall(_._4 == rs.map(_._3).sum))
    }
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.forall(_._5 == rs.map(_._3).sum))
    }
    rows.foreach { case (l, s2, n, rt, ct, flag) =>
      val want =
        if (n == 0) "missing"
        else if (2 * n * total < rt * ct) "under"
        else if (n * total > 2 * rt * ct) "over"
        else "ok"
      assert(flag == want, s"($l, $s2)")
    }
  }

  test("q193 concentration: ranks/cum/bands/HHI all replay") {
    val rows = TextOps.q193SourceConcentration(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val sq = rows.map(n => n._2 * n._2).sum
    var cum = 0L
    rows.sortBy(_._3).foreach { case (_, n, _, gotCum, band, hhi) =>
      cum += n
      assert(gotCum == cum)
      val want =
        if (2 * (cum - n) < total) "head"
        else if (10 * (cum - n) < 9 * total) "body" else "tail"
      assert(band == want)
      assert(hhi == 1000000L * sq / (total * total))
    }
    // counts are non-increasing down the ranking
    val byRank = rows.sortBy(_._3).map(_._2)
    assert(byRank.sameElements(byRank.sorted.reverse))
  }

  test("q196 AUC: perfect, inverted, and tie-degenerate cases exact") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): Long =
      TextOps.aucOf(rows.toDF("score", "label")).collect()(0).getLong(2)
    // positives strictly above negatives: AUC = 1
    assert(auc(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))) == 1000000L)
    // inverted scorer: AUC = 0
    assert(auc(Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L))) == 0L)
    // all scores tied: midranks make AUC exactly 1/2
    assert(auc(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L))) == 500000L)
    // hand-computed mixed case: scores 1..4, labels 0,1,0,1 ->
    // U = 3 of 4 pairs correct -> 750000
    assert(auc(Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L))) == 750000L)
  }

  test("q198 OOV: both branches fire on the fixture and rates re-derive") {
    val rows = TextOps.q198OovCoverage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, oov, ppm) =>
      assert(oov >= 0 && oov <= n)
      assert(ppm == 1000000L * oov / n)
    }
    // a capped vocab must leave SOME held-out token uncovered while
    // still covering the bulk
    assert(rows.map(_._3).sum > 0, "no OOV at all: floor too low to test")
    assert(rows.map(_._3).sum * 10 < rows.map(_._2).sum, "OOV majority: floor broken")
  }

  test("q199 calibration: deciles partition, rates re-derive, ranges ordered") {
    val rows = TextOps.q199CalibrationBins(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val total = graft.Tables.documents(spark, sf0001).count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (_, n, lo, hi, np, ppm) =>
      assert(lo <= hi && np <= n && ppm == 1000000L * np / n)
    }
    // decile score ranges are non-decreasing across bins
    rows.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3 || a._4 <= b._4)
      case _ =>
    }
  }

  test("q215 top-N+Other conserves the corpus and keeps the tail visible") {
    val rows = TextOps.q215TopnOther(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._4).sum == graft.Tables.documents(spark, sf0001).count())
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val named = rs.filter(_._2 != "OTHER")
      assert(named.length <= TextOps.topnKeep)
      named.foreach(r => assert(r._5 == 1L))
      // every named row outranks the OTHER bucket's biggest member:
      // named counts are the top of the ordering by construction
      rs.find(_._2 == "OTHER").foreach { other =>
        assert(other._5 >= 1L && other._3 == TextOps.topnKeep + 1L,
          s"$lang other=$other")
      }
    }
  }

  test("q216 percent ranks: bounds, min/max anchors, monotone with length") {
    val rows = TextOps.q216PctRankFeatures(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      assert(sorted.head._3 == 0L, s"$lang min anchors at 0")
      assert(sorted.last._3 == 1000000L, s"$lang max anchors at 1e6")
      sorted.map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a <= b)
        case _ =>
      }
    }
  }

  test("q222 entropy anchors: uniform=1e6 ratio, constant=0, singleton guarded") {
    import spark.implicits._
    def L(k: Long) = math.floor(math.log(k.toDouble) * 1e6).toLong
    val fx = Seq(
      (1L, "a b c d"),   // uniform: H = L(4), ratio 10^6
      (2L, "a a a a"),   // constant: H = 0
      (3L, "x"),         // N=1: guarded ratio 0 (L(1)=0 would divide by zero)
      (4L, "a a b b"),   // H = L(4) - L(2)
    ).toDF("doc_id", "text")
    val got = TextOps.entropyOf(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, 4L, 4L, L(4), 1000000L)))
    assert(got(1) == ((2L, 4L, 1L, 0L, 0L)))
    assert(got(2) == ((3L, 1L, 1L, 0L, 0L)))
    assert(got(3) == ((4L, 4L, 2L, L(4) - L(2),
      (1000000L * (L(4) - L(2))) / L(4))))
  }

  test("q224 winsorized stats: fences, clip counts, and mean replay") {
    import spark.implicits._
    val got = TextOps.q224WinsorizedStats(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    got.foreach { case (src, nDocs, p05, p95, lo, hi, wmean) =>
      val xs = docs.filter(_._1 == src).map(_._2).sorted
      val n = xs.length
      assert(nDocs == n.toLong)
      val wantP05 = xs((n + 19) / 20 - 1)      // smallest rn with 20rn >= n
      val wantP95 = xs((19 * n + 19) / 20 - 1) // smallest rn with 20rn >= 19n
      assert(p05 == wantP05 && p95 == wantP95)
      assert(lo == xs.count(_ < p05) && hi == xs.count(_ > p95))
      assert(20 * lo <= n, "at most n/20 rows sit strictly below the p5 fence")
      assert(wmean == xs.map(x => math.max(p05, math.min(p95, x))).sum / n)
    }
  }

  test("q225 feature hashing: md5 replay, per-doc weight conservation") {
    import spark.implicits._
    val got = TextOps.q225FeatureHashing(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def bucket(feat: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(feat.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 64L
    }
    val want = docs.flatMap { case (id, lang, src, nc) =>
      Seq(s"lang:$lang", s"src:$src", s"len:${nc / 500}").map(f => (id, bucket(f)))
    }.groupBy(identity).map { case ((id, b), xs) => (id, b, xs.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == 3L, "every doc contributes exactly 3 features")
    }
    assert(got.forall(r => r._2 >= 0 && r._2 < 64))
  }

  test("q239 Zipf fit: closed-form replay; flat slope exposes the synthetic corpus") {
    import spark.implicits._
    val Array(row) = TextOps.q239ZipfFit(spark, sf0001).collect()
    val (n, slope) = (row.getLong(0), row.getLong(1))
    val words = graft.Tables.documents(spark, sf0001)
      .select($"text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
    val top = words.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(1000)
    assert(n == top.length.toLong)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log(i + 1.0) * 1e3).toLong,
        math.floor(math.log(f.toDouble) * 1e6).toLong)
    }
    val sx = pts.map(_._1).sum
    val xc = pts.map(p => (p._1 - sx / n, p._2))
    val (sxc, sy) = (xc.map(_._1).sum, xc.map(_._2).sum)
    val sxx = xc.map(p => p._1 * p._1).sum
    val sxy = xc.map(p => p._1 * p._2).sum
    assert(slope == (n * sxy - sxc * sy) / (n * sxx - sxc * sxc))
    // the detector semantics: natural text sits near -1000 milli;
    // this 31-word synthetic vocabulary is far flatter — and flagged
    assert(slope > -1000L, "synthetic corpus reads as non-Zipfian (flat)")
  }

  test("q241 rendezvous: adding a shard moves docs ONLY to the new shard") {
    val docs = graft.Tables.documents(spark, sf0001)
    val a8 = TextOps.rendezvousAssign(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a9 = TextOps.rendezvousAssign(docs, 9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a8.keySet == a9.keySet)
    val moved = a8.keys.filter(id => a8(id) != a9(id)).toSeq
    assert(moved.forall(id => a9(id) == 8L),
      "the rendezvous property: a doc stays put or joins the NEW shard")
    val frac = moved.size.toDouble / a8.size
    assert(frac > 0.02 && frac < 0.25,
      s"~1/9 of docs should move, got $frac")
    // mod-hashing (the q225 shape) would NOT have this property:
    // (md5 % 8) -> (md5 % 9) reassigns most keys
    def modShard(id: Long, b: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"rv:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % b
    }
    val ids = a8.keys.toSeq
    val modMoved = ids.count(id => modShard(id, 8) != modShard(id, 9))
    assert(modMoved.toDouble / ids.size > 0.5,
      "contrast: mod-hash resize moves the majority")
  }

  test("q242 independence: chi-square replay and dof/critical lookup") {
    import spark.implicits._
    val Array(row) = TextOps.q242IndependenceTest(spark, sf0001).collect()
    val (n, r, c, dof, chi2, crit, sig) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getBoolean(6))
    val cells = graft.Tables.documents(spark, sf0001)
      .groupBy($"lang", $"source").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val langs = cells.keys.map(_._1).toSeq.distinct
    val srcs = cells.keys.map(_._2).toSeq.distinct
    val nn = cells.values.sum
    val rowT = langs.map(l => l -> cells.filter(_._1._1 == l).values.sum).toMap
    val colT = srcs.map(s => s -> cells.filter(_._1._2 == s).values.sum).toMap
    val want = (for { l <- langs; s <- srcs } yield {
      val o = cells.getOrElse((l, s), 0L)
      val d = o * nn - rowT(l) * colT(s)
      (1000L * d * d) / (nn * rowT(l) * colT(s))
    }).sum
    assert(n == nn && r == langs.size && c == srcs.size)
    assert(dof == (r - 1) * (c - 1) && chi2 == want)
    val wantCrit = TextOps.chi2CritMilli.toMap.get(dof.toInt).getOrElse(
      1000L * dof + (1645L *
        math.floor(math.sqrt(2.0 * dof) * 1000).toLong) / 1000L)
    assert(crit == wantCrit)
    assert(sig == (chi2 > crit))
  }

  test("q246 stump: exhaustive split replay finds the same argmin") {
    import spark.implicits._
    val Array(row) = TextOps.q246DecisionStump(spark, sf0001).collect()
    val (at, before, after, nl, pl, nr, pr, gain) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
      row.getLong(5), row.getLong(6), row.getLong(7))
    val pts = graft.Tables.documents(spark, sf0001)
      .select($"n_chars", ($"lang" === "en").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nn = pts.length.toLong
    val ppos = pts.map(_._2).sum
    def gini(c: Seq[(Long, Long)]): Long = {
      val xs = c.map(_._1).distinct.sorted
      xs.init.map { v =>
        val l = c.filter(_._1 <= v); val r = c.filter(_._1 > v)
        val (a, b) = (l.length.toLong, l.map(_._2).sum)
        val (e, f) = (r.length.toLong, r.map(_._2).sum)
        val g = (1000000L * (a * a - b * b - (a - b) * (a - b))) / (a * nn) +
          (1000000L * (e * e - f * f - (e - f) * (e - f))) / (e * nn)
        (g, v, a, b, e, f)
      }.min match { case (g, v, a, b, e, f) =>
        assert(at == v && after == g && nl == a && pl == b && nr == e && pr == f)
        g
      }
    }
    val bestG = gini(pts.toSeq)
    val base = (1000000L * (nn * nn - ppos * ppos -
      (nn - ppos) * (nn - ppos))) / (nn * nn)
    assert(before == base && gain == base - bestG)
    assert(gain >= 0, "a split can only reduce truncated weighted Gini here")
  }

  test("q252 log-odds: planted strata replay exactly; exclusive token tops its side") {
    import spark.implicits._
    // stratum A: 'alpha' dominates and 'zonly'/'shared' appear;
    // stratum B: 'beta' dominates; 'shared' appears in both equally.
    val docs = Seq(
      (true, "alpha alpha alpha shared zonly"),
      (true, "alpha alpha shared"),
      (false, "beta beta beta shared"),
      (false, "beta beta shared shared"))
    val got = TextOps.logOddsTokensOf(docs.toDF("in_a", "text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def lm(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    val toksAll = docs.flatMap { case (ia, t) => t.split(" ").map(ia -> _) }
    val ta = toksAll.count(_._1).toLong
    val tb = toksAll.count(!_._1).toLong
    val want = toksAll.map(_._2).distinct.map { tok =>
      val a = toksAll.count(p => p._1 && p._2 == tok).toLong
      val b = toksAll.count(p => !p._1 && p._2 == tok).toLong
      (tok, a, b,
        lm(2 * a + 1) - lm(2 * (ta - a) + 1) - lm(2 * b + 1) + lm(2 * (tb - b) + 1))
    }
    got.foreach { case (_, tok, a, b, d) =>
      val w = want.find(_._1 == tok).get
      assert((a, b, d) == ((w._2, w._3, w._4)), s"token $tok")
    }
    // 'alpha' is the strongest en-side marker, 'beta' the strongest rest-side
    assert(got.head._1 == "en" && got.head._2 == "alpha")
    assert(got.find(_._1 == "rest").get._2 == "beta")
    // a token absent from one stratum beats an equally-shared one
    val dShared = want.find(_._1 == "shared").get._4
    val dZonly = want.find(_._1 == "zonly").get._4
    assert(dZonly > dShared)
  }

  test("q252 log-odds at sf0.001: sides ordered, k rows each, antisymmetric sign") {
    val got = TextOps.q252LogOddsTokens(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    val (en, rest) = got.partition(_._1 == "en")
    assert(en.length == TextOps.logOddsK && rest.length == TextOps.logOddsK)
    assert(en.map(-_._2).toSeq == en.map(-_._2).sortBy(identity).toSeq,
      "en side descends in delta")
    assert(rest.map(_._2).toSeq == rest.map(_._2).sortBy(identity).toSeq,
      "rest side ascends in delta")
    assert(en.head._2 > rest.head._2, "sides point opposite ways")
  }

  test("q259 Good–Turing: exact replay; masses telescope; discount behaves") {
    import spark.implicits._
    val got = TextOps.q259GoodTuring(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (0L to TextOps.gtMaxR.toLong))
    val toks = graft.Tables.documents(spark, sf0001)
      .select($"text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
    val n = toks.length.toLong
    val fof = toks.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (r, g) => (r, g.size.toLong) }
    got.foreach { case (r, types, mass, rstar) =>
      val f = fof.getOrElse(r, 0L)
      val fNext = fof.getOrElse(r + 1, 0L)
      if (r == 0) {
        assert(types == 0L)
        assert(mass == 1000000L * fNext / n, "P0 = f1/N")
        assert(rstar == -1L)
      } else {
        assert(types == f)
        assert(mass == 1000000L * r * f / n)
        assert(rstar == (if (f == 0) -1L else 1000L * (r + 1) * fNext / f))
      }
    }
    // the fixture's closed vocabulary repeats every type: f1 = 0 is
    // the HONEST report (no unseen mass) — the planted corpus below
    // exercises the live branch
    assert(got.head._3 == 0L && fof.getOrElse(1L, 0L) == 0L)
    // planted: counts a=1 b=1 c=2 d=3  ⇒ N=7, f1=2, f2=1, f3=1
    val planted = TextOps.goodTuringOf(
      Seq("a b c d", "c d d").toDF("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byR = planted.map(p => p._1 -> p).toMap
    assert(byR(0L)._3 == 1000000L * 2 / 7, "P0 = f1/N = 2/7")
    assert(byR(1L) == ((1L, 2L, 1000000L * 2 / 7, 1000L * 2 * 1 / 2)),
      "r*(1) = 2·f2/f1 = 1")
    assert(byR(2L) == ((2L, 1L, 1000000L * 2 / 7, 1000L * 3 * 1 / 1)),
      "r*(2) = 3·f3/f2 = 3")
    assert(byR(3L)._2 == 1L && byR(3L)._4 == 0L, "f4 = 0 ⇒ r*(3) = 0")
    assert(byR(4L)._4 == -1L, "empty class ⇒ sentinel")
  }

  test("q254 cascade: planted violations attribute to their FIRST failing gate") {
    import spark.implicits._
    val longClean = (1 to 80).map(i => f"word$i%04d xy").mkString(" ") // distinct, no stopwords
    val rows = Seq(
      // (n_chars, lang, text)
      (50L, "zh", "short doc"),                       // gate1 (also bad lang)
      (150L, "de", s"contact a@b.com $longClean"),    // gate2 (also pii)
      (600L, "en", s"reach me at x@y.org $longClean"),// gate3 (quality high)
      (110L, "en", Seq.fill(28)("the").mkString(" ")),// gate4: all stopwords
      (600L, "en", longClean),                        // survives
      (600L, "fr", longClean))                        // survives
    val got = TextOps.filterCascadeOf(
      rows.toDF("n_chars", "lang", "text")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(g => g._2 -> g._3).toMap ==
      Map("too_short" -> 1L, "bad_lang" -> 1L, "pii_email" -> 1L,
        "low_quality" -> 1L))
    // independent counts see the overlaps first-fail hides
    val any = got.map(g => g._2 -> g._4).toMap
    assert(any("bad_lang") == 2L, "short zh doc also fails the lang gate")
    assert(any("pii_email") == 2L, "de doc's email counted standalone")
    // survivors telescope monotonically down to the 2 clean docs
    assert(got.sortBy(_._1).map(_._5).toSeq == Seq(5L, 4L, 3L, 2L))
  }

  test("q272 eb shrinkage: exact replay; small outlier sources pool, big ones hold") {
    import spark.implicits._
    val got = TextOps.q272EbShrinkage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rated = docs.groupBy(_._1).toSeq.map { case (src, g) =>
      val n = g.length.toLong
      val k = g.count(_._2 >= TextOps.ebCharFloor).toLong
      (src, n, k, 1000L * k / n)
    }.sortBy(_._1)
    val gN = rated.length.toLong
    val sp = rated.map(_._4).sum
    val cc = rated.map(r => gN * r._4 - sp).map(c => c * c).sum
    val (m, v) = (sp / gN, cc / (gN * gN * gN))
    val nu =
      if (v == 0 || (1000 * m * (1000 - m)) / v - 1000 <= 0) -1L
      else (1000 * m * (1000 - m)) / v - 1000
    got.zip(rated).foreach { case ((s0, n0, k0, r0, m0, nu0, sh0), (s1, n1, k1, r1)) =>
      assert(s0 == s1 && n0 == n1 && k0 == k1 && r0 == r1)
      assert(m0 == m && nu0 == nu)
      val want = if (nu == -1L) r1
        else (1000000000L * k1 + 1000L * nu * m) /
          (1000000L * n1 + 1000L * nu)
      assert(sh0 == want)
    }
    // planted: 8 tight mid sources + two 2-doc extremes — the
    // extremes pool hard toward the prior, the big sources hold
    val perSrc = ((1 to 8).map(i => (s"big$i", 100L, 50L)) ++
      Seq(("tiny0", 2L, 0L), ("tiny1", 2L, 2L)))
    val byName = TextOps.ebShrinkOf(perSrc.toDF("source", "n_docs", "n_good"))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(5),
        r.getLong(6))).toMap
    assert(byName("big1")._2 == 4000L, "MoM prior strength nu = 4")
    assert(byName("big1")._3 == 500L, "large source holds its rate")
    assert(byName("tiny0") == ((0L, 4000L, 333L)),
      "2-doc zero-rate source pools two thirds of the way to the prior")
    assert(byName("tiny1")._3 == 666L, "symmetric pull from above")
  }

  test("q273 isotonic: minimax replay; planted violation pools exactly its bins") {
    import spark.implicits._
    val got = TextOps.q273IsotonicCalibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val bins = got.map(g => (g._1, g._2, g._3)).sortBy(_._1)
    def avg(i: Int, j: Int) = {
      val seg = bins.slice(i, j + 1)
      1000000L * seg.map(_._3).sum / seg.map(_._2).sum
    }
    got.sortBy(_._1).zipWithIndex.foreach { case ((_, n, k, raw, iso), t) =>
      assert(raw == 1000000L * k / n)
      val want = (0 to t).map(i =>
        (t until bins.length).map(j => avg(i, j)).min).max
      assert(iso == want, s"decile ${t + 1}")
    }
    // fitted curve is monotone by construction
    assert(got.sortBy(_._1).map(_._5).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
    // planted single violation: bins 2 and 3 pool to their weighted
    // mean, the monotone neighbours are returned untouched
    val p = TextOps.isotonicOf(
      Seq((1L, 10L, 1L), (2L, 10L, 3L), (3L, 10L, 2L), (4L, 10L, 4L))
        .toDF("decile", "n", "n_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(p.toSeq == Seq((1L, 100000L), (2L, 250000L), (3L, 250000L),
      (4L, 400000L)))
  }

  test("q277 ipf: fold replay; lang margins converge, source margins held") {
    import spark.implicits._
    def replay(cells: Seq[(String, String, Long)]): Map[(String, String), Long] = {
      val tot = cells.map(_._3).sum
      val langs = cells.map(_._1).distinct
      val tl = tot / langs.length
      val tc = cells.groupBy(_._2).map { case (c, g) => c -> g.map(_._3).sum }
      var w = cells.map { case (l, c, n) => ((l, c), 1000L * n) }.toMap
      (1 to 3).foreach { _ =>
        val rs = w.groupBy(_._1._1).map { case (l, g) => l -> g.values.sum }
        w = w.map { case ((l, c), v) => ((l, c), v * 1000L * tl / rs(l)) }
        val cs = w.groupBy(_._1._2).map { case (c, g) => c -> g.values.sum }
        w = w.map { case ((l, c), v) => ((l, c), v * 1000L * tc(c) / cs(c)) }
      }
      w
    }
    val fixture = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"source").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).toSeq
      .map { case ((l, c), g) => (l, c, g.length.toLong) }
    val want = replay(fixture)
    val got = TextOps.q277IpfWeights(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.length == fixture.length)
    got.foreach { case ((l, c), (n, w, rate)) =>
      assert(w == want((l, c)), s"cell ($l,$c)")
      assert(rate == w / n)
    }
    // planted 2x2: after 3 rounds lang margins sit within rounding of
    // uniform and the final column scale holds source margins exactly
    // (up to per-cell flooring)
    val planted = Seq(("a", "s1", 90L), ("a", "s2", 10L),
      ("b", "s1", 10L), ("b", "s2", 30L))
    val pw = TextOps.ipfOf(planted.toDF("lang", "source", "n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3)))
      .toMap
    assert(pw == replay(planted).map { case (k, v) => k -> v })
    val rowA = pw(("a", "s1")) + pw(("a", "s2"))
    val rowB = pw(("b", "s1")) + pw(("b", "s2"))
    assert(math.abs(rowA - 70000L) < 2500L && math.abs(rowB - 70000L) < 2500L,
      s"lang margins converge toward uniform: $rowA / $rowB")
    val colS1 = pw(("a", "s1")) + pw(("b", "s1"))
    val colS2 = pw(("a", "s2")) + pw(("b", "s2"))
    assert(math.abs(colS1 - 100000L) <= 2L && math.abs(colS2 - 40000L) <= 2L,
      "source margins exact after the closing column scale")
  }

  test("q443 Bradley-Terry: planted 3-player grid matches hand MM arithmetic; " +
    "fit is normalized and order-correct") {
    import spark.implicits._
    // A beats B 3/4, A beats C 2/4, B beats C 3/4 → wins A=5 B=4 C=3
    val judgments = (
      Seq.fill(3)(("A", "B", 1L)) ++ Seq.fill(1)(("A", "B", 0L)) ++
      Seq.fill(2)(("A", "C", 1L)) ++ Seq.fill(2)(("A", "C", 0L)) ++
      Seq.fill(3)(("B", "C", 1L)) ++ Seq.fill(1)(("B", "C", 0L))
    ).toDF("lo", "hi", "lo_wins")
    // one MM round from uniform: every t_ij = 4e12 div 2e6 = 2e6,
    // den_i = 4e6, praw_i = w_i*250000, already mean-1e6 normalized
    val r1 = TextOps.btStrengths(judgments, rounds = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(r1("A") == ((8L, 5L, 1250000L)))
    assert(r1("B") == ((8L, 4L, 1000000L)))
    assert(r1("C") == ((8L, 3L, 750000L)))
    // three rounds: strengths stay normalized (mean 1.0 up to per-player
    // flooring) and order the planted skill A > B > C
    val r3 = TextOps.btStrengths(judgments).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(r3("A") > r3("B") && r3("B") > r3("C"))
    assert(math.abs(r3.values.sum - 3000000L) <= 3L,
      s"mean-1 normalization drifted: ${r3.values.sum}")
    // the fixture run emits one row per source, all positive strengths
    val fx = TextOps.q443BradleyTerry(spark, sf0001).collect()
    assert(fx.nonEmpty && fx.forall(_.getLong(3) > 0L))
    assert(fx.map(_.getString(0)).distinct.length == fx.length)
  }

  test("q447 annotator reliability: competence orders by planted error " +
    "rate; reweighted vote never hurts the strongest annotator") {
    val got = TextOps.q447AnnotatorReliability(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    // same item count for every annotator
    assert(got.values.map(_._1).toSet.size == 1)
    // planted error rates 1/10 < 2/10 < 4/10 → competence must order
    assert(got(0L)._3 > got(1L)._3 && got(1L)._3 > got(2L)._3, got)
    // competence is a ppm affine of agreement: spot-check the formula
    val (n, ag, comp, _) = got(0L)
    assert(comp == 2L * ((ag * 1000000L) / n) - 1000000L)
    // the weighted re-vote sides with the strongest annotator at least
    // as often as majority did (it can only reweight TOWARD it)
    assert(got(0L)._4 >= got(0L)._2, got)
  }

  test("q448 FIM transform: segments reassemble to the original text; " +
    "modes split by parity with the short-doc passthrough") {
    val src = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.q448FimTransform(spark, sf0001).collect()
    assert(got.length == src.size)
    got.foreach { r =>
      val (id, mode, len, fim) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))
      val orig = src(id)
      assert(len == fim.length)
      mode match {
        case "raw" =>
          assert(orig.length < 30 && fim == orig)
        case "psm" =>
          assert(id % 2 == 0 && orig.length >= 30)
          val Array(_, rest)  = fim.split("<PRE>", 2)
          val Array(p, rest2) = rest.split("<SUF>", 2)
          val Array(sfx, mid) = rest2.split("<MID>", 2)
          assert(p + mid + sfx == orig, s"doc $id PSM reassembly")
        case "spm" =>
          assert(id % 2 == 1 && orig.length >= 30)
          val Array(_, rest)  = fim.split("<SUF>", 2)
          val Array(sfx, rest2) = rest.split("<PRE>", 2)
          val Array(p, mid)   = rest2.split("<MID>", 2)
          assert(p + mid + sfx == orig, s"doc $id SPM reassembly")
      }
    }
  }

  test("q450 data-constrained mix: targets sum to the budget exactly; " +
    "epochs cap at 4.0; sampled tokens honor the epoch fraction") {
    val got = TextOps.q450DataConstrainedMix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val totTokens = got.map(_._3).sum
    // largest-remainder exactness: allocated budget = 2x corpus, to the token
    assert(got.map(_._4).sum == 2 * totTokens,
      s"${got.map(_._4).sum} != ${2 * totTokens}")
    got.foreach { case (src, _, tokens, target, epochs, sampled) =>
      assert(epochs <= 4000000L, s"$src epochs $epochs")
      assert(epochs == math.min(4000000L, target * 1000000L / tokens))
      assert(sampled == tokens * epochs / 1000000L, s"$src sampled")
      // a capped source samples at most 4 epochs of itself
      assert(sampled <= 4 * tokens)
    }
  }

  test("q452 edit-distance dedup: planted mutants surface within the " +
    "threshold; every reported pair shares a block and stays <= 2") {
    val got = TextOps.q452EditDistanceDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 <= 2L))
    // original->mutant pairs: appended (even) and substituted (odd)
    // mutants are one edit away; some of each parity must surface
    val planted = got.filter { case (a, b, _) => b == a + 1000000L }
    assert(planted.nonEmpty && planted.forall(_._3 <= 1L))
    assert(planted.exists(_._1 % 2 == 0) && planted.exists(_._1 % 2 == 1))
    // no self-pairs, ordered ids
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("q452 hot-block cap fires: a planted shared-prefix group above " +
    "q452BlockCap emits ZERO pairs while a small block still dedups") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q452hot").toString
    // hot block: boilerplate openings — > cap docs sharing the 8-char
    // prefix AND the length bucket, pairwise ONE edit apart (without
    // the cap this block alone would emit ~n^2/2 pairs)
    val n = TextOps.q452BlockCap + 6
    val hot = (1 to n).map { i =>
      val c = ('a' + (i % 26)).toChar
      (i.toLong, s"COPYRIGHT boilerplate head 20${c}4 tail")
    }
    // good block: 3 docs with a shared prefix, pairwise FAR apart —
    // only their planted mutants (one edit) may pair with them
    val good = (101 to 103).map { i =>
      (i.toLong, s"GOODBLK-$i " + ("uvwxyz".charAt(i % 6).toString * 24))
    }
    (hot ++ good).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.q452EditDistanceDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // nothing from the hot block: base ids AND their mutants live in
    // the capped block (same prefix, same length bucket), so no pair
    // may touch a hot id or its mutant image
    def inHot(id: Long): Boolean =
      (if (id >= 1000000L) id - 1000000L else id) <= n
    assert(got.forall { case (a, b, _) => !inHot(a) && !inHot(b) },
      s"hot-block pair leaked: ${got.take(5).mkString(", ")}")
    // the small block still dedups: each good doc finds its mutant
    val planted = got.filter { case (a, b, _) => b == a + 1000000L }
    assert(planted.map(_._1).toSet == Set(101L, 102L, 103L),
      s"expected the 3 good mutant pairs, got ${got.mkString(", ")}")
  }

  test("q464 span corruption: planted 25-token doc masks groups 0 and 7, " +
    "sentinels increment, inputs+targets reconstruct the original") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q464").toString
    val words = (0 to 24).map(i => s"t$i")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextOps.q464SpanCorruption(spark, tmp).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((25L, 2L, 6L)))
    val expIn = "<extra_id_0> " + (3 to 20).map(i => s"t$i").mkString(" ") +
      " <extra_id_1> t24"
    val expTg = "<extra_id_0> t0 t1 t2 <extra_id_1> t21 t22 t23"
    assert(r.getString(4) == expIn, r.getString(4))
    assert(r.getString(5) == expTg, r.getString(5))
    // reconstruction: substituting each sentinel's target span back
    // into the inputs yields the original token stream
    val spans = expTg.split("<extra_id_\\d+> ").filter(_.nonEmpty)
      .map(_.trim)
    val rebuilt = spans.zipWithIndex.foldLeft(expIn) { case (acc, (sp, k)) =>
      acc.replace(s"<extra_id_$k>", sp)
    }
    assert(rebuilt == words.mkString(" "))
  }

  test("q465 best-of-n yield: per-prompt solve/cost fold matches the " +
    "planted score arithmetic; source aggregates are exact floor-divs") {
    val rows = TextOps.q465BestOfNYield(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, solved, ppm, gens, milli, kept) =>
      assert(solved <= n && ppm == solved * 1000000L / n, src)
      assert(gens >= n && gens <= 4 * n, s"$src gens=$gens n=$n")
      assert(milli == gens * 1000L / n)
      assert(kept >= 0)
    }
    // acceptance is (37*id + 101*c) % 1000 >= 700: ids 0..3 give
    // known first-accept candidates — pin one small planted case
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q465").toString
    Seq((0L, "s", "a b"), (1L, "s", "c"), (19L, "s", "d e f"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // id 0: scores 0,101,202,303 → never ≥700 → cost 4, unsolved
    // id 1: 37,138,239,340 → unsolved, cost 4
    // id 19: 703,804,905,6 → first cand 0 accepts → cost 1, solved
    val got = TextOps.q465BestOfNYield(spark, tmp).collect().head
    assert(got.getLong(1) == 3L && got.getLong(2) == 1L)
    assert(got.getLong(4) == 4L + 4L + 1L)
    assert(got.getLong(6) == 3L) // only id 19's 3 tokens kept
  }

  test("q480 pipeline capstone: the funnel CONSERVES — every input doc " +
    "lands in exactly one gate; planted dupes and shorties route right") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q480").toString
    val long = (1 to 12).map(i => s"w$i").mkString(" ")
    Seq((1L, "tiny doc"), (2L, long), (3L, long + " tail"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextOps.q480PipelineCapstone(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 3 docs + 3 planted copies = 6 total, conserved across gates
    assert(rows.values.map(_._1).sum == 6L, rows.toString)
    // every planted copy is an exact dupe of its original → 3 dropped
    assert(rows("__dedup_dropped")._1 == 3L)
    // doc 1 ("tiny doc", 2 tokens) fails the quality gate
    assert(rows("__quality_dropped")._1 == 1L)
    // survivors (docs 2, 3) land in splits, tokens accounted exactly
    val splitDocs = rows.filterKeys(!_.startsWith("__")).values
    assert(splitDocs.map(_._1).sum == 2L)
    assert(splitDocs.map(_._2).sum == 12L + 13L)
  }

  test("q467 split leak audit: a planted re-crawl image leaks exactly " +
    "the clusters whose copies straddle the train/test boundary") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q467").toString
    val ids = (1L to 60L)
    ids.map(i => (i, "s", s"unique document text $i"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // replicate the split arithmetic in the JVM: bucket = first 4 md5
    // hex chars of "split:<id>" mod 100; <80 train, <90 val, else test
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100
    }
    def split(id: Long): String = {
      val b = bucket(id)
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val all = ids.map(i => (i, split(i))) ++
      ids.map(i => (i + 2000000L, split(i + 2000000L)))
    def clusterOf(id: Long) = if (id >= 2000000L) id - 2000000L else id
    val trainClusters = all.collect { case (i, "train") => clusterOf(i) }.toSet
    val testDocs = all.filter(_._2 == "test")
    val expLeak = testDocs.count(x => trainClusters(clusterOf(x._1)))
    assert(expLeak >= 1, "fixture must plant at least one leak")
    val got = TextOps.q467SplitLeakAudit(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 1)
    val (_, nTest, nLeaked, ppm) = got.head
    assert(nTest == testDocs.size.toLong, s"n_test $nTest")
    assert(nLeaked == expLeak.toLong, s"n_leaked $nLeaked vs $expLeak")
    assert(ppm == nLeaked * 1000000L / nTest)
  }

  test("q453 multiclass eval: macro row is the floor-mean of class F1s; " +
    "kappa sits strictly between chance and perfection") {
    val rows = TextOps.q453MulticlassEval(spark, sf0001).collect()
    val byClass = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1),
       if (r.isNullAt(2)) -1L else r.getLong(2),
       r.getLong(3))).toMap
    assert(byClass.keySet == Set(-2L, -1L, 0L, 1L, 2L))
    val f1s = Seq(0L, 1L, 2L).map(byClass(_)._3)
    assert(byClass(-1L)._3 == f1s.sum / 3, "macro-F1 mismatch")
    Seq(0L, 1L, 2L).foreach { c =>
      val (p, r, f) = byClass(c)
      assert(p > 0 && p <= 1000000L && r > 0 && r <= 1000000L)
      assert(f == 2 * p * r / (p + r))
    }
    val kappa = byClass(-2L)._3
    assert(kappa > 0 && kappa < 1000000L, s"kappa $kappa")
  }

  test("q457 fairness audit: planted group-correlated flips produce " +
    "ordered error rates; gap rows fold from the per-group values") {
    val rows = TextOps.q457FairnessAudit(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(rows.keySet == Set(-1L, 0L, 1L, 2L, 3L))
    val per = Seq(0L, 1L, 2L, 3L).map(rows)
    // flip rate grows with the group index: group 3 is most distorted —
    // its FPR must exceed group 0's (flips of true negatives into 1s)
    assert(rows(3L)._3 > rows(0L)._3,
      s"planted bias not visible: ${rows.mkString(", ")}")
    // gap rows are exact folds of the per-group values
    val (dpGap, eoGap, _) = rows(-1L)
    assert(dpGap == per.map(_._1).max - per.map(_._1).min)
    assert(eoGap == math.max(
      per.map(_._2).max - per.map(_._2).min,
      per.map(_._3).max - per.map(_._3).min))
  }

  test("q279 vocab coverage: crossing replay; curve monotone in both axes") {
    import spark.implicits._
    val got = TextOps.q279VocabCoverage(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val toks = graft.Tables.documents(spark, sf0001)
      .select($"text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1)).filter(_.nonEmpty)
    val freq = toks.groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }
    val n = toks.length.toLong
    val nt = freq.length.toLong
    Seq(50L, 90L, 99L).zip(got).foreach { case (p, (gp, types, tTot, nTot)) =>
      var cum = 0L
      val need = freq.indexWhere { case (_, f) => cum += f; cum * 100L >= p * n } + 1L
      assert(gp == p && types == need && tTot == nt && nTot == n, s"p$p")
    }
    // more mass needs more types, never more than the vocabulary
    assert(got(0)._2 <= got(1)._2 && got(1)._2 <= got(2)._2 &&
      got(2)._2 <= got(2)._3)
  }

  test("q285 exclusivity: set replay — exclusive iff no other source carries it") {
    import spark.implicits._
    val got = TextOps.q285SourceExclusivity(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).map { case (src, g) =>
      src -> g.flatMap { case (_, text) =>
        text.toLowerCase.split(" ", -1).sliding(3).filter(_.length == 3)
          .map(_.mkString(" "))
      }.toSet
    }
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, mine) =>
      val others = bySrc.filter(_._1 != src).values.flatten.toSet
      val excl = (mine -- others).size.toLong
      val (n, e, ppm) = got(src)
      assert(n == mine.size.toLong && e == excl, src)
      assert(ppm == 1000000L * excl / mine.size)
    }
  }

  test("q291 crossfit: occupancy replay; identical split uniform, shifted split skews") {
    import spark.implicits._
    val got = TextOps.q291CrossfitNorm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val train = docs.filter(_._1 % 2 == 0).map(_._2).sorted
    val test = docs.filter(_._1 % 2 == 1).map(_._2)
    val bounds = (1 to 9).map(d =>
      train(((d * train.length + 9) / 10 - 1)))
    val bins = test.map(v => bounds.count(v > _).toLong)
    assert(got.map(_._1).toSeq == (0L to 9L))
    got.foreach { case (b, n, ppm) =>
      assert(n == bins.count(_ == b).toLong, s"bin $b")
      assert(ppm == 1000000L * n / test.length)
    }
    assert(got.map(_._2).sum == test.length.toLong, "bins partition the test split")
    // planted: same distribution → every bin near 10%; doubled test
    // values → the top bin swallows (nearly) everything
    val tr = (1L to 1000L).toDF("v")
    val same = TextOps.crossfitBinsOf(tr, (1L to 1000L).toDF("v"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(same.forall { case (_, ppm) => ppm >= 90000L && ppm <= 110000L })
    val shifted = TextOps.crossfitBinsOf(tr, (2000L to 3000L).toDF("v"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(shifted(9L) == 1000000L, "wholesale shift lands in the top bin")
  }

  test("q304 average precision: planted rankings; sf replay") {
    import spark.implicits._
    def ap(rows: Seq[(Long, Long, Long)]) =
      TextOps.averagePrecisionOf(rows.toDF("doc_id", "score", "label"))
        .collect()(0)
    // perfect ranking: every positive precedes every negative -> AP = 1
    val perfect = ap(Seq((1L, 100L, 1L), (2L, 90L, 1L), (3L, 80L, 0L),
      (4L, 70L, 0L)))
    assert(perfect.getLong(2) == 1000000L)
    assert(perfect.getLong(3) == 500000L, "p@10 over least(n,10)=4 rows")
    assert(perfect.getLong(4) == 1000000L)
    // inverted: positives at ranks 3,4 -> AP = (1/3 + 2/4) / 2
    val inverted = ap(Seq((1L, 100L, 0L), (2L, 90L, 0L), (3L, 80L, 1L),
      (4L, 70L, 1L)))
    assert(inverted.getLong(2) == (333333L + 500000L) / 2)
    // interleaved: positives at 1,3 -> AP = (1 + 2/3) / 2
    val inter = ap(Seq((1L, 100L, 1L), (2L, 90L, 0L), (3L, 80L, 1L),
      (4L, 70L, 0L)))
    assert(inter.getLong(2) == (1000000L + 666666L) / 2)
    // a score TIE is broken by doc_id - pinned, not undefined
    val tie = ap(Seq((1L, 100L, 0L), (2L, 100L, 1L)))
    assert(tie.getLong(2) == 500000L, "doc 1 outranks doc 2 at equal score")
    // no positives: sentinels, never a division by zero
    val none = ap(Seq((1L, 100L, 0L)))
    assert(none.getLong(2) == -1L && none.getLong(4) == -1L)
    // sf replay from first principles
    val Array(r) = TextOps.q304AveragePrecision(spark, sf0001).collect()
    val scored = TextOps.q125LmScore(spark, sf0001)
      .join(graft.Tables.documents(spark, sf0001)
        .select($"doc_id", $"lang"), "doc_id")
      .select($"doc_id", $"avg_nll_micro", $"lang").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.getString(2) != "en") 1L else 0L))
      .sortBy(x => (-x._2, x._1))
    val nPos = scored.map(_._3).sum
    var cum = 0L
    val terms = scored.zipWithIndex.map { case ((_, _, l), i) =>
      cum += l; if (l == 1L) 1000000L * cum / (i + 1) else 0L }.sum
    assert(r.getLong(0) == scored.length.toLong && r.getLong(1) == nPos)
    assert(r.getLong(2) == terms / nPos)
    val pos10 = scored.take(10).map(_._3).sum
    assert(r.getLong(3) == 1000000L * pos10 / math.min(scored.length, 10))
    assert(r.getLong(4) == 1000000L * pos10 / nPos)
  }

  test("q306 brier decomposition: identity on a planted forecaster; fallback") {
    import spark.implicits._
    def brier(rows: Seq[(Long, String, Long)]) =
      TextOps.brierDecompositionOf(rows.toDF("doc_id", "source", "pos"))
        .collect()(0)
    // perfectly calibrated two-source forecaster: train rates equal
    // test rates exactly -> REL = 0 and the identity is the true
    // Brier score 0.125 in micro
    val cal = brier(Seq(
      (0L, "x", 1L), (2L, "x", 0L),                     // train x: f=1/2
      (4L, "y", 0L), (6L, "y", 0L),                     // train y: f=0
      (1L, "x", 1L), (3L, "x", 1L), (5L, "x", 0L), (7L, "x", 0L),
      (9L, "y", 0L), (11L, "y", 0L), (13L, "y", 0L), (15L, "y", 0L)))
    assert((cal.getLong(0), cal.getLong(1)) == ((8L, 2L)))
    assert(cal.getLong(2) == 250000L)                   // pbar = 2/8
    assert(cal.getLong(3) == 0L, "calibrated forecaster has zero REL")
    assert(cal.getLong(4) == 62500L)                    // RES
    assert(cal.getLong(5) == 187500L)                   // UNC = p(1-p)
    assert(cal.getLong(6) == 125000L,
      "identity REL - RES + UNC equals the true Brier score 0.125")
    // a source with no train rows forecasts the GLOBAL train rate
    val fb = brier(Seq(
      (0L, "x", 1L), (2L, "x", 0L),                     // global f = 1/2
      (1L, "z", 1L), (3L, "z", 1L)))                    // z: o=1, f=500000
    assert(fb.getLong(1) == 1L && fb.getLong(2) == 1000000L)
    // REL = (f-o)^2 = (1/2)^2 = 0.25
    assert(fb.getLong(3) == 62500L * 4)
    // sf replay of the headline identity column
    val Array(r) = TextOps.q306BrierDecomposition(spark, sf0001).collect()
    assert(r.getLong(6) == r.getLong(3) - r.getLong(4) + r.getLong(5))
    assert(r.getLong(5) > 0L, "fixture labels are not constant")
  }

  test("q323 temperature mix: 1:4 corpus tempers to the hand isqrt weights") {
    import spark.implicits._
    // shares 0.2/0.8 -> r = isqrt(2e11)=447213, isqrt(8e11)=894427;
    // w = 333333 / 666666 ppm; oversample = 1666 / 833 milli: the
    // tail source samples 1.67x its raw share, the head 0.83x
    val rows = (Seq.fill(2)("a") ++ Seq.fill(8)("b")).toDF("source")
    val got = TextOps.temperatureMixOf(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "a" -> ((2L, 200000L, 333333L, 1666L)),
      "b" -> ((8L, 800000L, 666666L, 833L)),
    ))
  }

  test("q323 on the sf fixture: weights near-normalize, tempering monotone") {
    val rows = TextOps.q323TemperatureMix(spark, sf0001).collect()
    assert(rows.length > 1)
    // floor-rounded weights sum to 1e6 minus at most one ppm per source
    val wSum = rows.map(_.getLong(3)).sum
    assert(wSum <= 1000000L && wSum >= 1000000L - rows.length)
    // sqrt-tempering compresses: smaller shares get >= oversampling
    val bySh = rows.sortBy(_.getLong(2))
    assert(bySh.head.getLong(4) >= bySh.last.getLong(4))
    // and every oversample factor straddles 1000 the right way round
    rows.foreach { r =>
      if (r.getLong(2) < 1000000L / rows.length)
        assert(r.getLong(4) >= 1000L, s"tail source under-sampled: $r")
    }
  }

  test("q343 planted disjoint vocab: target-like positive, pool-like negative") {
    import spark.implicits._
    // target 'en' docs speak only vocab A; 'xx' docs only vocab B.
    // A-features are target-enriched (positive log-ratio), B-features
    // appear ONLY in the raw pool (negative), so the weight signs are
    // knowable by construction. Vocab chosen so no two features share
    // an md5 bucket — a collision really does bleed weight across
    // vocabularies (observed with 'gamma beta' vs 'zeta theta'),
    // which is hashed-DSIR's documented approximation, not a bug.
    val docs = Seq(
      (1L, "en", "alpha beta gamma alpha beta"),
      (2L, "en", "beta gamma alpha gamma beta"),
      (3L, "xx", "omega kappa sigma omega kappa"),
      (4L, "xx", "kappa sigma omega sigma kappa"),
      (5L, "en", "alpha gamma beta alpha gamma"),
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.dsirOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    Seq(1L, 2L, 5L).foreach { d =>
      assert(got(d)._1 > 0 && got(d)._2, s"target-vocab doc $d: ${got(d)}")
    }
    Seq(3L, 4L).foreach { d =>
      assert(got(d)._1 < 0 && !got(d)._2, s"pool-only-vocab doc $d: ${got(d)}")
    }
  }

  test("q343 on the sf fixture: en docs average higher than non-en") {
    import spark.implicits._
    val w = TextOps.q343DsirWeights(spark, sf0001)
      .join(graft.Tables.documents(spark, sf0001)
        .select($"doc_id", $"lang"), "doc_id")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("dsir_micro")))
    val en = w.filter(_._1 == "en").map(_._2)
    val rest = w.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum.toDouble / en.length > rest.sum.toDouble / rest.length,
      "the importance weight must rank target-language docs above the pool")
  }

  test("q346 fertility: in-vocab words cost 1 piece, OOV cost ceil(len/4)") {
    val rows = TextOps.q346TokenizerFertility(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, pieces) = (r.getLong(1), r.getLong(2))
      val fert = r.getLong(3)
      assert(pieces >= words, "a word costs at least one piece")
      assert(fert >= 1000L, s"fertility below 1.0 impossible: $r")
      assert(fert == 1000L * pieces / words)
      val oovPpm = r.getLong(4)
      assert(oovPpm >= 0L && oovPpm <= 1000000L)
      // fertility exceeds 1.0 exactly when some word fell out of vocab
      assert((fert > 1000L) == (oovPpm > 0L) ||
        // ...unless every OOV word is shorter than the fallback width
        oovPpm > 0L, s"fertility/oov inconsistent: $r")
    }
  }

  test("q350 curriculum: unique positions, easy-first within source, interleaved") {
    val rows = TextOps.q350CurriculumSchedule(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // schedule positions are globally unique
    assert(rows.map(_._5).distinct.length == rows.length)
    // easy-first within each source: rank order == difficulty order
    rows.groupBy(_._2).foreach { case (_, src) =>
      val byRank = src.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to src.length))
    }
    // interleave: among the first n_sources positions, no source twice
    val nSources = rows.map(_._2).distinct.length
    val head = rows.sortBy(_._5).take(nSources).map(_._2)
    assert(head.distinct.length == head.length,
      s"schedule head repeats a source: ${head.toSeq}")
  }

  test("q352 logreg: planted separable corpus is learned to perfect accuracy") {
    import spark.implicits._
    // en docs: 20 distinct non-stopword tokens (diversity 1000, stopword 0);
    // xx docs: 'the' x20 (diversity 50, stopword 1000) — linearly separable
    val docs = (0 until 6).flatMap { i =>
      Seq((2L * i, (0 until 20).map(j => s"w${j}x").mkString(" "), "en"),
          (2L * i + 1, Seq.fill(20)("the").mkString(" "), "xx"))
    }.toDF("doc_id", "text", "lang")
    val rows = TextOps.logregOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == TextOps.logregRounds + 1)
    // round 0 = untrained: zero weights, coin-flip prediction = 50% here
    assert(rows.head == ((0L, 0L, 0L, 0L, 0L, 500000L)))
    // trained model separates perfectly from round 1 on
    assert(rows.tail.forall(_._6 == 1000000L),
      s"accuracy trajectory: ${rows.map(_._6).toSeq}")
    // and learned the right signs: diversity votes en, stopwords vote xx
    val last = rows.last
    assert(last._3 > 0L && last._4 < 0L,
      s"final weights (bias, div, stop, len) = (${last._2}, ${last._3}, ${last._4}, ${last._5})")
  }

  test("q353 NB lang-ID: disjoint-vocab corpus classifies held-out docs perfectly") {
    import spark.implicits._
    // the same bucket rule the query applies, computed independently
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"nb:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map(b => f"$b%02x").mkString, 16) % 100
    }
    // two languages with fully disjoint vocabularies
    val docs = (0L until 100L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val pfx = if (lang == "aa") "a" else "b"
      (i, (0 until 12).map(j => s"$pfx${j % 5}").mkString(" "), lang)
    }
    val heldOut = docs.filter(d => bucket(d._1) >= 80)
    assert(heldOut.map(_._3).distinct.size == 2, "fixture must hold out both langs")
    val rows = TextOps.nbLangidOf(docs.toDF("doc_id", "text", "lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(rows.length == heldOut.size)
    // disjoint vocab => every held-out doc is classified correctly
    assert(rows.forall(r => r._2 == r._3 && r._4 == 1L),
      s"misclassified: ${rows.filter(_._4 == 0L).toSeq}")
  }

  test("q353 NB lang-ID: all-OOV doc falls back to priors + per-lang OOV mass") {
    import spark.implicits._
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"nb:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map(b => f"$b%02x").mkString, 16) % 100
    }
    val oovId = (200L until 400L).find(bucket(_) >= 80).get
    // balanced doc counts (equal priors); lang bb docs 3x longer, so
    // T_bb > T_aa and the OOV weight ln(1/(T+V)) favors aa
    val base = (0L until 60L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val pfx = if (lang == "aa") "a" else "b"
      val n = if (lang == "aa") 8 else 24
      (i, (0 until n).map(j => s"$pfx${j % 6}").mkString(" "), lang)
    }
    val docs = base :+ ((oovId, "zz1 zz2 zz3 zz4", "aa"))
    val rows = TextOps.nbLangidOf(docs.toDF("doc_id", "text", "lang")).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val oovPred = rows.find(_._1 == oovId).get._2
    assert(oovPred == "aa", s"all-OOV doc predicted $oovPred, expected aa")
  }

  test("q363 gate apply: frozen weights equal q352's final row; keep = p >= 1/2") {
    val docs = graft.Tables.documents(spark, sf0001)
    val lastRow = TextOps.logregOf(docs).collect().last
    val fitted = TextOps.logregFit(docs)
    assert(fitted.toSeq == (1 to 4).map(lastRow.getLong),
      s"fit ${fitted.toSeq} != trajectory ${(1 to 4).map(lastRow.getLong)}")
    val applied = TextOps.q363LogregGateApply(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(applied.length == docs.count())
    assert(applied.forall(r => (r._3 == 1L) == (r._2 >= 500000L)))
    // on the content-free word soup the model settles on the majority
    // class — probabilities spread but stay under 1/2 (keep liveness is
    // exercised on the separable planted corpus in the q352 spec)
    assert(applied.map(_._2).distinct.length > 1)
  }

  test("q352 logreg: driver replay of the integer GD matches the query exactly") {
    val feats = TextOps.logregFeatures(
        graft.Tables.documents(spark, sf0001))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val w = Array(0L, 0L, 0L, 0L)
    val expect = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    for (r <- 0 to TextOps.logregRounds) {
      var ok = 0L
      val g = Array(0L, 0L, 0L, 0L)
      feats.foreach { case (xb, xd, xs, xl, y) =>
        val z = (w(0) * xb + w(1) * xd + w(2) * xs + w(3) * xl) / 1000L
        val p = math.max(0L, math.min(1000000L, 500000L + z / 4L))
        if ((p >= 500000L) == (y == 1L)) ok += 1
        val e = (p - 1000000L * y) / 1000L
        g(0) += e * xb; g(1) += e * xd; g(2) += e * xs; g(3) += e * xl
      }
      val n = feats.length.toLong
      expect += ((r.toLong, w(0), w(1), w(2), w(3), 1000000L * ok / n))
      if (r < TextOps.logregRounds)
        for (j <- 0 until 4) w(j) -= TextOps.logregLr * (g(j) / n)
    }
    val got = TextOps.q352QualityLogreg(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expect.toSeq)
  }

  test("q380 length buckets: sorting by length strictly cuts padding waste") {
    val rows = TextOps.q380LengthBuckets(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val arrival = rows.find(_._1 == "arrival").get
    val sorted = rows.find(_._1 == "length_sorted").get
    // same corpus, same batch count, same true token mass
    assert(arrival._2 == sorted._2 && arrival._3 == sorted._3)
    // the report's point: bucketing strictly reduces padded volume
    assert(sorted._4 < arrival._4,
      s"padded: sorted=${sorted._4} arrival=${arrival._4}")
    assert(sorted._5 < arrival._5)
    // padding never negative, waste_ppm consistent with its parts
    rows.foreach { r =>
      assert(r._4 >= r._3)
      assert(r._5 == 1000000L * (r._4 - r._3) / r._4)
    }
  }

  test("q382 loop detector: planted period-3 loop reads exactly, short doc sentinels") {
    val got = TextOps.q382LoopDetect(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // planted loop: 90 tokens of walk/run/jump -> lag 3 matches all 87
    val loop = got.find(_._1 == -1L).get
    assert(loop._2 == 90L && loop._3 == 3L && loop._4 == 1000000L &&
      loop._5 == 1L, s"planted loop row: $loop")
    // too-short plant: honest sentinels
    val short = got.find(_._1 == -2L).get
    assert(short._3 == -1L && short._4 == -1L && short._5 == 0L)
    // corpus docs are word soup: none should read as looping
    assert(got.filter(_._1 >= 0).forall(_._5 == 0L))
  }

  test("q384 html extraction: every verdict branch fires on its plant") {
    val rows = TextOps.q384HtmlExtract(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    val rich = rows.find(_._1 == -1L).get
    val nav = rows.find(_._1 == -2L).get
    val stub = rows.find(_._1 == -3L).get
    assert(rich._7 == "keep", s"rich page: $rich")
    // script/style payload must not leak into the extracted text
    assert(rich._3 < rich._2)
    assert(rich._5 > 0)
    assert(nav._7 == "drop_link_heavy", s"nav page: $nav")
    assert(nav._6 >= TextOps.htmlLinkTauPpm)
    assert(stub._7 == "drop_short")
    // markup-free corpus docs: zero tags, zero links, text = raw-ish
    val corpus = rows.filter(_._1 >= 0)
    assert(corpus.forall(r => r._5 == 0L && r._4 == 0L))
    assert(corpus.forall(r => r._7 != "drop_link_heavy"))
  }

  test("q385 bpe serve: planted merge compresses held-out text exactly") {
    import spark.implicits._
    // train: 'abab' x3 and 'ab' x2 -> round-1 merge is (a,b); with k=1
    // the model is exactly {ab}
    val train = Seq("abab abab abab ab ab").toDF("text")
    val serve = Seq((1L, "abab baba"), (2L, "zz")).toDF("doc_id", "text")
    val got = TextOps.bpeApplyOf(train, serve, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: 'abab' -> [ab, ab] (2 toks / 4 chars); 'baba' -> [b, ab, a]
    // (greedy left-to-right: b+a no, a+b yes at pos 2) = 3 toks / 4 chars
    assert(got.find(_._1 == 1L).get == ((1L, 8L, 5L, 625000L)))
    // doc 2: no learned symbol applies -> chars = tokens
    assert(got.find(_._1 == 2L).get == ((2L, 2L, 2L, 1000000L)))
    // sf corpus: merges only ever shrink, never grow
    val sf = TextOps.q385BpeApply(spark, sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(sf.forall { case (chars, toks) => toks <= chars })
    assert(sf.map(_._2).sum < sf.map(_._1).sum,
      "train-learned merges must compress held-out text somewhere")
  }

  test("q438 chat lint: every planted shape gets its exact verdict — " +
      "valid with/without system head, double-user, ends-on-user, empty") {
    val rows = TextOps.q438ChatFormatLint(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    rows.foreach { case (id, nTurns, seq, patternOk, hasEmpty, valid) =>
      (id % 5) match {
        case 0 => assert(seq == "suaua" && nTurns == 5L &&
          patternOk && !hasEmpty && valid)
        case 1 => assert(seq == "ua" && patternOk && valid)
        case 2 => assert(seq == "uua" && !patternOk && !valid)
        case 3 => assert(seq == "uau" && !patternOk && !valid)
        case _ => assert(seq == "ua" && patternOk && hasEmpty && !valid)
      }
    }
    // exactly the two well-formed shapes are valid — the lint separates
    assert(rows.count(_._6) == rows.count(_._1 % 5 < 2))
  }

  test("q439 length bias: the planted 70/30 longer-wins skew shows in " +
      "every populated gap bucket; counts conserve the pair build") {
    val rows = TextOps.q439LengthBiasAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    // the audit's overall rate equals the planted construction:
    // pairs with pair_id % 10 < 7 choose the longer side
    val longerWins = rows.map(r => r._2 * r._3 / 1000000.0).sum
    assert(math.abs(longerWins / n - 0.7) < 0.05,
      s"overall longer-wins ${longerWins / n}")
    // ppm values are exact integers in [0, 1e6]
    assert(rows.forall(r => r._3 >= 0L && r._3 <= 1000000L))
  }

  test("q440 loop detection: planted period-1 and period-2 loops flag " +
      "with exact spans; unplanted docs keep their natural small runs") {
    val rows = TextOps.q440LoopDetection(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    val byId = rows.map(r => r._1 -> r).toMap
    // doc 0: %7 == 0 → " loop"×8 appended → period-1 span ≥ 8
    assert(byId(0L)._2 >= 8L && byId(0L)._5)
    // doc 11: %11 == 0 (and not %7) → ping-pong ×4 → period-2 span ≥ 8
    assert(byId(11L)._3 >= 8L && byId(11L)._5)
    // every %7 and %11 doc is loopy; they are the clear majority of flags
    rows.foreach { case (id, _, _, _, loopy) =>
      if (id % 7 == 0 || id % 11 == 0) assert(loopy, s"doc $id") }
    val planted = rows.count(r => r._1 % 7 == 0 || r._1 % 11 == 0)
    assert(rows.count(_._5) >= planted)
  }

  test("q398 mojibake: planted artifacts count exactly; the corpus " +
      "itself is clean; the clean plant hits nothing") {
    val got = TextOps.q398MojibakeAudit(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exactly the planted hits: corpus contributes zero to every class
    assert(got == Map(
      "latin1_double" -> ((1L, 2L)),
      "nbsp_artifact" -> ((1L, 1L)),
      "replacement"   -> ((1L, 3L)),
      "smart_quote"   -> ((1L, 2L))), got.toString)
  }

  test("q483 NB quality classifier separates the planted strata: " +
      "held-out AUC >= 0.95; curated keeps, noise drops") {
    import org.apache.spark.sql.functions._
    val auc = TextOps.aucOf(TextOps.q483Gate(spark, sf0001)
      .select(col("sum_llr").as("score"), col("curated").as("label")))
      .collect().head
    val aucPpm = auc.getLong(2)
    assert(aucPpm >= 950000L,
      s"NB classifier failed to separate curated from noise: $aucPpm ppm")
    val rates = TextOps.q483NbQualityClassifier(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rates.nonEmpty)
    rates.foreach { case (src, cur, n, keep, ppm) =>
      assert(keep <= n && ppm >= 0L && ppm <= 1000000L, s"$src/$cur: $keep/$n")
      assert(ppm == keep * 1000000L / n)
    }
    // the gate must actually gate: curated keep rate far above noise
    val curKeep = rates.filter(_._2 == 1L).map(_._4).sum.toDouble /
      rates.filter(_._2 == 1L).map(_._3).sum
    val noiseKeep = rates.filter(_._2 == 0L).map(_._4).sum.toDouble /
      rates.filter(_._2 == 0L).map(_._3).sum
    assert(curKeep >= 0.9 && noiseKeep <= 0.1,
      s"keep rates curated=$curKeep noise=$noiseKeep")
  }

  test("q484 fertility audit surfaces the planted under-served " +
      "language: zh tokens-per-kchar strictly tops every other lang") {
    val got = TextOps.q484TokenizerFertility(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5), r.getLong(6)))
    assert(got.map(_._1).contains("zh"), got.mkString(","))
    val zh = got.find(_._1 == "zh").get._3
    got.filter(_._1 != "zh").foreach { case (l, _, fert, _) =>
      assert(zh > fert,
        s"planted skew not surfaced: zh=$zh vs $l=$fert toks/kchar")
    }
    // merges really compress the served majority: fertility < 1000
    // (1000 = one token per char, the unmerged ceiling)
    assert(got.filter(_._1 != "zh").forall(_._3 < 1000L), got.mkString(","))
    got.foreach { case (l, n, fert, bpt) =>
      assert(n > 0 && fert > 0 && bpt >= 1000L, s"$l: $n/$fert/$bpt")
    }
  }

  test("q485 DoReMi weights: ppm shares normalize, order tracks excess " +
      "loss monotonically, hard domains upweight") {
    val got = TextOps.q485DoremiWeights(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(got.length >= 2)
    val total = got.map(_._3).sum
    // integer floors lose < 1 ppm per source
    assert(total <= 1000000L && total >= 1000000L - got.length,
      s"weights sum to $total ppm")
    // multiplicative weights are monotone in excess loss
    got.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3,
        s"${a._1}(excess=${a._2}) got ${a._3} > ${b._1}(${b._2}) ${b._3}")
    }
    // above-average-loss domains sit above the uniform share,
    // below-average below it (the DoReMi direction)
    val uniform = 1000000L / got.length
    got.foreach { case (src, ex, w) =>
      if (ex > 20000L) assert(w > uniform, s"$src hard but not upweighted")
      if (ex < -20000L) assert(w < uniform, s"$src easy but not downweighted")
    }
  }

  test("q488 epoch shuffle: orders are reproducible, conserve docs, " +
      "and genuinely differ across epochs") {
    val a = TextOps.q488EpochShuffle(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val b = TextOps.q488EpochShuffle(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(a == b, "the shuffle must be bit-reproducible")
    val total = graft.Tables.documents(spark, sf0001).count()
    (0L until TextOps.shuffleEpochs.toLong).foreach { e =>
      val shards = a.filter(_._1._1 == e)
      assert(shards.values.map(_._1).sum == total,
        s"epoch $e loses or duplicates documents")
    }
    // different epochs must produce genuinely different orders: the
    // per-epoch checksum vectors differ pairwise
    val sums = (0L until TextOps.shuffleEpochs.toLong).map(e =>
      a.filter(_._1._1 == e).toSeq.sortBy(_._1._2).map(_._2._3))
    sums.combinations(2).foreach { case Seq(x, y) =>
      assert(x != y, "two epochs shuffled identically")
    }
  }

  test("q502 token-budget freeze: the global quality-ordered greedy " +
      "stops exactly at the 40% budget line") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("freeze").toString
    // quality q = (n_chars*1000) div (nt+1): doc1 q=4000, doc3 q=3000,
    // doc2 q=1250; total tokens 6, budget 6*2/5 = 2 -> only doc1 fits
    Seq(
      (1L, "aaaaaaaaa bb", "en", "t", 12L),
      (2L, "a b c", "en", "t", 5L),
      (3L, "abcdef", "en", "t", 6L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextOps.q502TokenBudgetFreeze(spark, tmp).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      == ((3L, 6L, 1L, 2L)), row.toString)
  }

  test("q510 FIM plan: 40/80 split geometry, PSM/SPM parity mix, " +
      "short docs fall back to AR with zero sentinel overhead") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fim").toString
    Seq(
      (0L, "x" * 100, "en", "s", 100L), // even id, len 100 -> psm
      (1L, "y" * 51, "en", "s", 51L),   // odd id -> spm
      (2L, "z" * 10, "en", "s", 10L),   // < 50 chars -> ar
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.q510FimTransformPlan(spark, tmp).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // psm len 100: middle = 80 - 40 = 40; spm len 51: 40 - 20 = 20
    assert(got == Seq(
      ("ar", 1L, 10L, 0L, 0L),
      ("psm", 1L, 100L, 40L, 3L),
      ("spm", 1L, 51L, 20L, 3L)), got.toString)
  }

  test("q515 UNIMAX waterfill: low-resource langs cap at max epochs, " +
      "the high-resource lang absorbs the slack, allocations fill the " +
      "budget") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("unimax").toString
    // token masses: lo=10, mid=20, hi=90 -> budget 120, caps (1.2x)
    // 12/24/108; lo+mid cap, hi gets theta = (120-36)/1 = 84
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    Seq((0L, words(10), "lo", "s", 10L), (1L, words(20), "mid", "s", 20L),
      (2L, words(90), "hi", "s", 90L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.q515UnimaxAllocation(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("hi", 90L, 84L, false, 9333L),
      ("lo", 10L, 12L, true, 12000L),
      ("mid", 20L, 24L, true, 12000L)), got.toString)
    // allocations spend exactly the budget (integer floor on theta)
    assert(got.map(_._3).sum == 120L)
  }

  test("q511 synthetic-marker audit: substring hits count (including " +
      "inside longer words), rate and flag threshold are exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("slop").toString
    Seq(
      // hits: slow x2 + merge x1 = 3 -> flagged; toks = 4
      (0L, "slow slowmergely ok", "en", "sA", 19L),
      (1L, "clean text here today", "en", "sA", 21L),
      // 'sparkly' contains 'spark': 1 hit, not flagged
      (2L, "sparkly words", "en", "sB", 13L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.q511SyntheticMarkerAudit(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).toSeq
    // sA: 2 docs, 3 hits, 1 flagged; sB: 1 doc, 1 hit, 0 flagged
    assert(got == Seq(("sA", 2L, 3L, 1L), ("sB", 1L, 1L, 0L)),
      got.toString)
  }
}
