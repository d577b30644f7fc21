package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.DedupOps

/** Property-based invariants (SURVEY.md §5.2): JSON round-trip,
  * dedup idempotence, and union row-count conservation — generated
  * inputs (raw ScalaCheck generators, deterministic seeds), not
  * fixtures, so the properties hold beyond the testdata
  * distribution. Case counts are small: each case is a Spark job. */
class PropertySpec extends SparkSuite {

  private val postGen: Gen[(Long, Long, String, String)] = for {
    userId <- Gen.choose(1L, 10L)
    id <- Gen.choose(1L, 1000L)
    title <- Gen.alphaNumStr.map(_.take(20))
    body <- Gen.asciiPrintableStr.map(_.take(50).replace("\\", "").replace("\"", ""))
  } yield (userId, id, title, body)

  private def sample[A](g: Gen[A], i: Int): A =
    g.pureApply(Gen.Parameters.default, Seed(42L + i))

  test("to_json ∘ from_json is identity on the posts contract schema (S7)") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("userId", LongType), StructField("id", LongType),
      StructField("title", StringType), StructField("body", StringType)))
    (0 until 10).foreach { i =>
      val rows = sample(Gen.listOfN(5, postGen), i)
      val df = rows.toDF("userId", "id", "title", "body")
      val back = df
        .select(from_json(to_json(struct($"userId", $"id", $"title", $"body")),
          schema).as("s"))
        .select($"s.userId", $"s.id", $"s.title", $"s.body")
      assert(back.except(df).isEmpty && df.except(back).isEmpty, s"case $i: $rows")
    }
  }

  test("exact dedup is idempotent: every keeper is itself kept") {
    import spark.implicits._
    (0 until 5).foreach { i =>
      val rows = sample(Gen.listOfN(8, postGen), 100 + i)
      val tmp = java.nio.file.Files.createTempDirectory("prop").toString
      rows.zipWithIndex
        .map { case ((_, _, t, b), j) => (j.toLong, s"$t $b", "en", "t", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val once = DedupOps.q64ExactDedup(spark, tmp).collect()
      // fingerprints unique, keepers distinct, copies sum to input size
      assert(once.map(_.getString(0)).distinct.length == once.length)
      assert(once.map(_.getLong(1)).distinct.length == once.length)
      assert(once.map(_.getLong(2)).sum == rows.length)
    }
  }

  test("SecondMax UDAF is partition-order-insensitive and exact") {
    import graft.ops.ExtOps.SecondMax
    (0 until 10).foreach { i =>
      val xs = sample(Gen.listOfN(20, Gen.choose(-1000.0, 1000.0)), 400 + i)
      val expected = xs.distinct.sorted(Ordering[Double].reverse)
        .drop(1).headOption.getOrElse(Double.NegativeInfinity)
      // fold in three different partition orders → same result
      val orders = Seq(xs, xs.reverse, xs.sortBy(math.sin))
      val results = orders.map { o =>
        val (l, r) = o.splitAt(o.length / 2)
        SecondMax.finish(SecondMax.merge(
          l.foldLeft(SecondMax.zero)(SecondMax.reduce),
          r.foldLeft(SecondMax.zero)(SecondMax.reduce)))
      }
      assert(results.forall(_ == expected), s"case $i: $results vs $expected")
    }
  }

  test("spansN/shinglesN geometry: count, width, content, dedup (span-family base)") {
    import spark.implicits._
    import graft.ops.DedupOps.{spansN, shinglesN}
    // tiny alphabet forces repeated tokens/spans; every span operator
    // (q53, q55, q56, q58, q66) builds on exactly this geometry
    val gen = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd")))
    (0 until 8).foreach { i =>
      val toks = sample(gen, 500 + i)
      val text = toks.mkString(" ")
      Seq(3, 8).foreach { k =>
        val row = Seq(text).toDF("text")
          .select(spansN($"text", k).as("sp"), shinglesN($"text", k).as("sh"))
          .head()
        val expected =
          if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toSeq
          else Seq.empty[String]
        assert(row.getSeq[String](0) == expected, s"case $i k=$k spans")
        assert(row.getSeq[String](1) == expected.distinct, s"case $i k=$k shingles")
      }
    }
  }

  test("union conserves row counts (append-only load invariant, S8)") {
    import spark.implicits._
    (0 until 10).foreach { i =>
      val a = sample(Gen.listOfN(6, postGen), 200 + i)
      val b = sample(Gen.listOfN(6, postGen), 300 + i)
      val da = a.toDF("userId", "id", "title", "body")
      val db = b.toDF("userId", "id", "title", "body")
      assert(da.unionByName(db).count() == a.length + b.length)
    }
  }
}
