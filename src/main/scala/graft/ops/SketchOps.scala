package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bounded-memory sketch operators: Count-Min frequency estimation
  * and Bloom-filter join pre-filtering. Both exist for the same
  * 100 TB reason — the EXACT structure (a distinct-key set, a full
  * vocabulary count) grows with the data, while the sketch is a
  * FIXED-size summary the driver/executors can always hold, bought
  * with a quantified, one-sided error. The reference delegates both
  * shapes to BigQuery (reference `src/load/main.py:23-38` ships rows
  * to a warehouse); here they are explicit relational plans whose
  * hash functions are md5-derived and therefore engine-reproducible:
  * the DuckDB oracles replay sketch construction bit-for-bit, so
  * "approximate" never means "unverifiable".
  */
object SketchOps {

  // ---------------------------------------------------------------- q153
  /** Count-Min sketch frequency estimation over the document token
    * stream, probed for one document's vocabulary.
    *
    * The sketch is [[cmsDepth]] × [[cmsWidth]] counters — 3 KiB of
    * state no matter whether the corpus has 10⁵ or 10¹² token
    * occurrences. Construction is one corpus scan: each token fans
    * out to [[cmsDepth]] (row, bucket) cells and a single hash
    * aggregate counts cells with map-side combine, so the shuffle
    * carries at most depth × width × partitions partial rows —
    * NEVER the vocabulary. That is the whole point at scale: exact
    * per-token counting shuffles a row per distinct token (unbounded
    * for URL/id-like streams), the sketch shuffles a constant.
    *
    * Estimates: for each probe token, est = min over rows of its
    * cell — the classic CM guarantee est ≥ exact (counts only ever
    * collide upward), with overshoot bounded by e·N/width at
    * probability 1−e^−depth. The probe set here is doc 0's distinct
    * tokens; the query also computes the exact counts (a second,
    * probe-filtered corpus pass — diagnostic only, a production
    * probe skips it) so the one-sided error is visible per row and
    * the spec can pin `est ≥ exact` corpus-wide. Hashes are 16-bit
    * md5 truncations mod width, seeded by the row index — the q49/
    * q65 engine-portable idiom, replayed verbatim in the oracle. */
  val cmsDepth = 3
  val cmsWidth = 1024

  private def tokCol(c: Column): Column = split(lower(c), " ")

  /** CM bucket of `tok` for sketch row `j` (column int). */
  private def cmsBucket(j: Column, tok: Column): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"), tok)), 1, 4), 16, 10)
      .cast("long") % cmsWidth

  def q153CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = array((0 until cmsDepth).map(lit): _*)
    val tokens = Tables.documentsSpread(s, dir)
      .select(explode(tokCol($"text")).as("tok"))
    val cells = tokens
      .select($"tok", explode(rows).as("j"))
      .select($"j", cmsBucket($"j", $"tok").as("bucket"))
      .groupBy($"j", $"bucket").agg(count(lit(1)).as("cnt"))
    val probes = Tables.documents(s, dir).where($"doc_id" === 0)
      .select(explode(tokCol($"text")).as("tok")).distinct()
    val est = probes
      .select($"tok", explode(rows).as("j"))
      .select($"tok", $"j", cmsBucket($"j", $"tok").as("bucket"))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy($"tok").agg(min($"cnt").as("cms_estimate"))
    val exact = tokens.join(broadcast(probes), Seq("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("exact_n"))
    est.join(exact, Seq("tok"))
      .select($"tok".as("token"), $"exact_n", $"cms_estimate",
        ($"cms_estimate" - $"exact_n").as("overcount"))
      .orderBy($"token")
  }

  private val q153Oracle = {
    val js = (0 until cmsDepth).map(j => s"($j)").mkString(", ")
    s"""WITH tk AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
       |hr AS (SELECT j FROM (VALUES $js) AS t(j)),
       |cells AS (
       |  SELECT j,
       |    ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 4))::BIGINT
       |      % $cmsWidth AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM tk, hr GROUP BY 1, 2),
       |probes AS (
       |  SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents WHERE doc_id = 0),
       |est AS (
       |  SELECT p.tok, min(c.cnt) AS cms_estimate
       |  FROM probes p CROSS JOIN hr
       |  JOIN cells c ON c.j = hr.j AND c.bucket =
       |    ('0x' || substr(md5(CAST(hr.j AS VARCHAR) || ':' || p.tok), 1, 4))::BIGINT
       |      % $cmsWidth
       |  GROUP BY 1),
       |ex AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM tk
       |  WHERE tok IN (SELECT tok FROM probes) GROUP BY 1)
       |SELECT p.tok AS token, ex.exact_n, est.cms_estimate,
       |  est.cms_estimate - ex.exact_n AS overcount
       |FROM probes p JOIN ex ON p.tok = ex.tok JOIN est ON p.tok = est.tok
       |ORDER BY token""".stripMargin
  }

  // ---------------------------------------------------------------- q156
  /** Bloom-filter join pre-filtering: the manual form of the runtime
    * row-group/shuffle filter every warehouse applies to selective
    * joins. The build side (customers in one market segment) is
    * summarized into a [[bloomBits]]-bit Bloom filter held as a
    * RELATION of ≤ [[bloomBits]]/64 (word, bits) rows — never a
    * driver-side bitmap, never a collect. The probe side (orders)
    * tests its own key's [[bloomHashes]] bit positions via that many
    * broadcast joins + bitmask checks BEFORE the exact semi join, so
    * at scale the expensive key shuffle sees only rows that pass the
    * filter. Bloom filters have one-sided error: no false negatives
    * (every true match passes), tunable false positives (~n·k/m per
    * hash here) — which is why the exact semi join stays and the
    * result is EXACTLY the unfiltered join's (the oracle runs the
    * plain semi join; the hash match proves transparency; the spec
    * pins the pass-rate bound). Bit positions are md5-derived, so
    * filter contents are deterministic cross-engine. */
  val bloomBits = 1 << 16
  val bloomHashes = 2
  val bloomSegment = "BUILDING"

  private def bloomPos(h: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"$h:"), key.cast("string"))), 1, 5), 16, 10)
      .cast("long") % bloomBits

  def q156BloomPrejoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keys = Tables.customer(s, dir)
      .where($"c_mktsegment" === bloomSegment).select($"c_custkey")
    val words = keys
      .select(explode(array((0 until bloomHashes).map(lit): _*)).as("h"),
        $"c_custkey")
      .select((conv(substring(md5(concat($"h".cast("string"), lit(":"),
          $"c_custkey".cast("string"))), 1, 5), 16, 10)
        .cast("long") % bloomBits).as("pos"))
      .select(expr("pos div 64").as("word"),
        expr("shiftleft(1L, cast(pos % 64 AS INT))").as("mask"))
      .groupBy($"word").agg(expr("bit_or(mask)").as("bits"))
    val probed = (0 until bloomHashes).foldLeft(Tables.orders(s, dir)) {
      (df, h) =>
        val b = words.select($"word".as("bword"), $"bits".as("bbits"))
        df.withColumn("bpos", bloomPos(h, col("o_custkey")))
          .join(broadcast(b), expr("bpos div 64") === col("bword"))
          .where(expr("(bbits & shiftleft(1L, cast(bpos % 64 AS INT))) != 0"))
          .drop("bpos", "bword", "bbits")
    }
    probed
      .join(keys, probed("o_custkey") === keys("c_custkey"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double")
          .as("sum_total"))
      .orderBy($"o_orderpriority")
  }

  private val q156Oracle =
    s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
       |FROM orders
       |WHERE o_custkey IN
       |  (SELECT c_custkey FROM customer WHERE c_mktsegment = '$bloomSegment')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_cms_heavy_hitters" -> (q153CmsHeavyHitters _),
    "q156_bloom_prejoin"     -> (q156BloomPrejoin _),
  )

  val oracles: Map[String, String] = Map(
    "q153_cms_heavy_hitters" -> q153Oracle,
    "q156_bloom_prejoin"     -> q156Oracle,
  )
}
