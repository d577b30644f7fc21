package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Privacy-audit operators: release-gating checks a pipeline runs
  * BEFORE publishing a derived dataset. The reference ships raw rows
  * straight into a warehouse (reference `src/load/main.py:23-38`);
  * an engine that exports training corpora needs the inverse
  * discipline — prove a release is safe to hand out. Complements the
  * content-level scrubbing family (q54/q57 PII redaction): those fix
  * VALUES, these audit STRUCTURE (how identifying the quasi-identifier
  * combination is).
  */
object PrivacyOps {

  // ---------------------------------------------------------------- q161
  /** A quasi-identifier group smaller than this re-identifies its
    * members (the k in k-anonymity). 5 is the conventional floor in
    * published release checklists. */
  val kThreshold = 5

  /** Generalization grain for the account-balance quasi-identifier:
    * raw balances are near-unique (useless to audit, trivially
    * identifying); banding is the standard generalization step. */
  val balBand = 4000

  /** k-anonymity audit over the customer table's quasi-identifiers
    * (market segment × nation bucket × balance band): per-group size
    * `k` and an `at_risk` flag for groups below [[kThreshold]] — the
    * table a release gate reads to decide suppress-vs-generalize.
    *
    * One hash aggregate; group cardinality is bounded by the
    * quasi-identifier DOMAIN (segments × buckets × bands), not by
    * rows, so the result is dimension-sized no matter the corpus —
    * the audit costs one scan + one map-side-combining shuffle at
    * 100 TB. The flag is computed in the same projection (no second
    * pass, no join back). A real release iterates: widen [[balBand]]
    * until `at_risk` empties; that loop re-runs only this one agg. */
  def q161KAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    kAnonymityOf(
      Tables.customer(s, dir).select(
        $"c_mktsegment".as("segment"),
        ($"c_nationkey" % 5).cast("long").as("nation_bucket"),
        floor($"c_acctbal" / balBand).cast("long").as("bal_band")))
  }

  /** The audit on any pre-generalized quasi-identifier frame —
    * separated so the spec can plant a group of known size k <
    * [[kThreshold]] and see exactly it flagged. */
  private[ops] def kAnonymityOf(quasi: DataFrame): DataFrame = {
    val s = quasi.sparkSession
    import s.implicits._
    quasi
      .groupBy($"segment", $"nation_bucket", $"bal_band")
      .agg(count(lit(1)).as("k"))
      .withColumn("at_risk", $"k" < kThreshold)
      .orderBy($"segment", $"nation_bucket", $"bal_band")
  }

  private val q161Oracle =
    s"""SELECT c_mktsegment AS segment,
       |  CAST(c_nationkey % 5 AS BIGINT) AS nation_bucket,
       |  CAST(floor(c_acctbal / $balBand) AS BIGINT) AS bal_band,
       |  CAST(count(*) AS BIGINT) AS k,
       |  count(*) < $kThreshold AS at_risk
       |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q162
  /** Quantized CDF of a discrete-Laplace (two-sided geometric,
    * α = 0.5 ⇒ ε = ln 2) noise distribution on support [-4, 4], in
    * millionths: (noise value, cumulative threshold). Inverse-CDF
    * sampling walks this table with a uniform draw. ONE source of
    * truth — the Spark projection and the oracle SQL both interpolate
    * these constants, so the mechanism cannot desynchronize. */
  val noiseCdfPpm: Seq[(Int, Long)] = Seq(
    -4 -> 21739L, -3 -> 65217L, -2 -> 152174L, -1 -> 326087L,
    0 -> 673913L, 1 -> 847826L, 2 -> 934783L, 3 -> 978261L, 4 -> 1000000L)

  /** Differential-privacy-shaped noisy-count release: the
    * (lang × source) histogram with discrete-Laplace noise added to
    * every cell, negatives clamped to zero, true counts never
    * emitted — the mechanism a pipeline uses to publish corpus
    * composition stats without certifying any exact cell.
    *
    * The uniform draw is md5("noise:" + cell key) reduced mod 10⁶ —
    * deterministic per cell, so the release is reproducible across
    * engines/retries and exactly hash-oracle-able (the documented
    * stand-in discipline of q49's sampling: a production release
    * swaps in a cryptographic RNG and the unquantized distribution;
    * the operator — group, draw, invert the CDF, clamp, suppress the
    * raw counts — is unchanged). Cost: one map-side-combining agg to
    * domain-bounded cells; the noise is a projection. */
  def q162NoisyRelease(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val u = conv(substring(md5(concat(lit("noise:"), $"lang", lit("|"), $"source")),
      1, 5), 16, 10).cast("long") % 1000000L
    val noise = noiseCdfPpm.init.foldRight(lit(noiseCdfPpm.last._1): Column) {
      case ((k, thr), acc) => when($"u" < thr, k).otherwise(acc)
    }
    Tables.documents(s, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("c"))
      .withColumn("u", u)
      .select($"lang", $"source",
        greatest(lit(0L), $"c" + noise.cast("long")).as("noisy_count"))
      .orderBy($"lang", $"source")
  }

  private val q162Oracle = {
    val cases = noiseCdfPpm.init
      .map { case (k, thr) => s"WHEN u < $thr THEN $k" }.mkString(" ")
    s"""WITH g AS (
       |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
       |n AS (
       |  SELECT lang, source, c,
       |    ('0x' || substr(md5('noise:' || lang || '|' || source), 1, 5))::BIGINT
       |      % 1000000 AS u
       |  FROM g)
       |SELECT lang, source,
       |  greatest(0, c + CASE $cases ELSE ${noiseCdfPpm.last._1} END) AS noisy_count
       |FROM n ORDER BY lang, source""".stripMargin
  }

  // ---------------------------------------------------------------- q229
  /** Pseudonymized cross-dataset linkage: user ids in two extracts
    * (browse events / purchase events) replace with a salted-md5
    * token, and the extracts JOIN ON THE TOKEN — proving the
    * pipeline property pseudonymization must preserve: consistent
    * tokens keep entity linkage across datasets while raw
    * identifiers never appear in any output column. q161 audits
    * whether a release is identifying, q162 noises counts; this is
    * the pseudonymize-then-share operator itself (the GDPR
    * "pseudonymisation" Art. 4(5) shape: re-identification requires
    * the separately-held salt).
    *
    * Token = 64-bit md5 prefix of salt‖id (q49's engine-identical
    * device) computed in the SCAN projection — ids never shuffle;
    * both sides aggregate to token grain map-side before the join.
    * The fixture events split by type, so the join is token-to-token
    * across genuinely different extracts. */
  def q229PseudonymizedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def tok(c: Column): Column =
      substring(md5(concat(lit("pseud-v1:"), c.cast("string"))), 1, 16)
    val ev = Tables.events(s, dir)
      .select(tok($"user_id").as("token"), $"event_type")
    val browse = ev.where($"event_type".isin("view", "click"))
      .groupBy($"token").agg(count(lit(1)).as("n_browse"))
    val buys = ev.where($"event_type" === "purchase")
      .groupBy($"token").agg(count(lit(1)).as("n_purchases"))
    browse.join(buys, "token")
      .select($"token", $"n_browse", $"n_purchases")
      .orderBy($"token")
  }

  private val q229Oracle =
    """WITH ev AS (
      |  SELECT substr(md5('pseud-v1:' || CAST(user_id AS VARCHAR)), 1, 16)
      |      AS token,
      |    event_type
      |  FROM events),
      |browse AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS n_browse
      |  FROM ev WHERE event_type IN ('view', 'click') GROUP BY 1),
      |buys AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS n_purchases
      |  FROM ev WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT b.token, b.n_browse, p.n_purchases
      |FROM browse b JOIN buys p ON b.token = p.token
      |ORDER BY b.token""".stripMargin

  // ---------------------------------------------------------------- q313
  /** A quasi-identifier group whose sensitive attribute shows fewer
    * than this many distinct values fails distinct l-diversity. 3 is
    * the conventional published floor (Machanavajjhala et al. 2007
    * use l=3 in their running examples). */
  val lThreshold = 3

  /** l-diversity audit — the attribute-disclosure check k-anonymity
    * (q161) misses: a group can be comfortably large (k ≥ 5) yet
    * give away its members' sensitive value because everyone in it
    * SHARES that value. Per quasi-identifier group (market segment ×
    * nation bucket, q161's generalization discipline) over the
    * orders fact joined to its customer: group size k, distinct
    * sensitive values l (order priority), the modal sensitive share
    * in ppm (the recursive-(c,l) ingredient: a group can pass
    * distinct-l yet be 99% one value), and the at_risk flag
    * l < [[lThreshold]].
    *
    * Scale shape: the customer dim broadcasts into the fact scan;
    * then ONE hash agg to (quasi × sensitive) grain — bounded by
    * DOMAIN (segments × buckets × priorities), not rows — and a
    * second agg to quasi grain over that dimension-sized frame. The
    * fact table shuffles only its (quasi, sensitive) cells,
    * map-side combined. */
  def q313LDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lDiversityOf(
      Tables.orders(s, dir).select($"o_custkey", $"o_orderpriority")
        .join(broadcast(Tables.customer(s, dir).select(
          $"c_custkey", $"c_mktsegment".as("segment"),
          ($"c_nationkey" % 5).cast("long").as("nation_bucket"))),
          $"o_custkey" === $"c_custkey")
        .select($"segment", $"nation_bucket",
          $"o_orderpriority".as("sensitive")))
  }

  /** The audit on any (segment, nation_bucket, sensitive) frame —
    * separated so the spec can plant a large-but-uniform group (k
    * passes, l fails) and a small diverse one. */
  private[ops] def lDiversityOf(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    rows
      .groupBy($"segment", $"nation_bucket", $"sensitive")
      .agg(count(lit(1)).as("c"))
      .groupBy($"segment", $"nation_bucket")
      .agg(sum($"c").as("k"), count(lit(1)).as("l"),
        max($"c").as("modal_c"))
      .select($"segment", $"nation_bucket", $"k", $"l",
        expr("(1000000 * modal_c) div k").as("modal_share_ppm"),
        ($"l" < lThreshold).as("at_risk"))
      .orderBy($"segment", $"nation_bucket")
  }

  private val q313Oracle =
    s"""WITH rows_ AS (
       |  SELECT c_mktsegment AS segment,
       |    CAST(c_nationkey % 5 AS BIGINT) AS nation_bucket,
       |    o_orderpriority AS sensitive
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |cell AS (
       |  SELECT segment, nation_bucket, sensitive,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM rows_ GROUP BY 1, 2, 3)
       |SELECT segment, nation_bucket,
       |  CAST(sum(c) AS BIGINT) AS k,
       |  CAST(count(*) AS BIGINT) AS l,
       |  CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS modal_share_ppm,
       |  count(*) < $lThreshold AS at_risk
       |FROM cell GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q317
  /** A group whose sensitive-value distribution sits farther than
    * this (in ppm of the ordered EMD) from the GLOBAL distribution
    * fails t-closeness. 0.15 is the running-example threshold in Li,
    * Li & Venkatasubramanian (ICDE 2007), who introduce the test. */
  val tThresholdPpm = 150000L

  /** t-closeness audit (Li et al. 2007) — the third rung of the
    * release-gate ladder: q161 checks groups are LARGE, q313 checks
    * they're VARIED, this checks their sensitive distribution isn't
    * INFORMATIVE. A group can pass both k and l yet leak (90% URGENT
    * where the corpus is 20% — membership alone shifts an attacker's
    * posterior). Per quasi-identifier group: the Earth Mover's
    * Distance between the group's order-priority distribution and
    * the global one, under the ORDERED-attribute ground distance
    * (Li et al. §4: EMD = (1/(m−1))·Σ_j |Σ_{i≤j}(p_i − q_i)| over
    * the m ordered values — priorities are prefixed 1..5, so the
    * lexicographic sort IS the ordinal sort). Shares are mirrored
    * micro floors ((10⁶·cnt) div k), so every intermediate is exact
    * BIGINT and both engines emit identical bits regardless of
    * corpus size — no N²-magnitude products (the exact-rational form
    * would overflow at warehouse N).
    *
    * Scale shape: q313's — broadcast customer dim into the fact
    * scan, ONE map-side-combining agg to the (quasi × sensitive)
    * cell grain (bounded by DOMAIN, not rows). Everything after —
    * the dense value spine (honest zeros: a missing value still
    * shifts mass), the global marginal, the cumulative window — is
    * arithmetic on that dimension-sized frame; the window partitions
    * by group over ≤ m rows each. */
  def q317TCloseness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tClosenessOf(
      Tables.orders(s, dir).select($"o_custkey", $"o_orderpriority")
        .join(broadcast(Tables.customer(s, dir).select(
          $"c_custkey", $"c_mktsegment".as("segment"),
          ($"c_nationkey" % 5).cast("long").as("nation_bucket"))),
          $"o_custkey" === $"c_custkey")
        .select($"segment", $"nation_bucket",
          $"o_orderpriority".as("sensitive")))
  }

  /** The audit on any (segment, nation_bucket, sensitive) frame —
    * separated so the spec can plant a global-mirroring group (t=0)
    * and a single-value group (t = the hand-computed EMD). */
  private[ops] def tClosenessOf(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // domain-bounded and referenced four times (global marginal,
    // totals, group sizes, the spine join) — cut it so the corpus
    // agg beneath runs once, not per reference
    val cells = rows
      .groupBy($"segment", $"nation_bucket", $"sensitive")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val global = cells.groupBy($"sensitive").agg(sum($"c").as("g"))
    val tot = global.agg(sum($"g").as("n_total"),
      count(lit(1)).as("m"))
    val groups = cells.groupBy($"segment", $"nation_bucket")
      .agg(sum($"c").as("k"))
    // Dense spine: every group × every globally-seen sensitive value.
    val spine = groups.crossJoin(broadcast(global))
      .join(broadcast(cells),
        Seq("segment", "nation_bucket", "sensitive"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .select($"segment", $"nation_bucket", $"sensitive", $"k", $"m",
        (expr("(1000000 * c) div k") -
          expr("(1000000 * g) div n_total")).as("delta_micro"))
    val wCum = Window.partitionBy($"segment", $"nation_bucket")
      .orderBy($"sensitive")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("cum", sum($"delta_micro").over(wCum))
      .groupBy($"segment", $"nation_bucket")
      .agg(max($"k").as("k"), max($"m").as("m"),
        sum(abs($"cum")).as("abs_cum_sum"))
      .select($"segment", $"nation_bucket", $"k",
        expr("CASE WHEN m = 1 THEN 0 ELSE abs_cum_sum div (m - 1) END")
          .as("t_ppm"))
      .withColumn("at_risk", $"t_ppm" > tThresholdPpm)
      .orderBy($"segment", $"nation_bucket")
  }

  private val q317Oracle =
    s"""WITH rows_ AS (
       |  SELECT c_mktsegment AS segment,
       |    CAST(c_nationkey % 5 AS BIGINT) AS nation_bucket,
       |    o_orderpriority AS sensitive
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |cell AS (
       |  SELECT segment, nation_bucket, sensitive,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM rows_ GROUP BY 1, 2, 3),
       |gmarg AS (
       |  SELECT sensitive, CAST(sum(c) AS BIGINT) AS g
       |  FROM cell GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(g) AS BIGINT) AS n_total,
       |    CAST(count(*) AS BIGINT) AS m
       |  FROM gmarg),
       |grp AS (
       |  SELECT segment, nation_bucket, CAST(sum(c) AS BIGINT) AS k
       |  FROM cell GROUP BY 1, 2),
       |spine AS (
       |  SELECT gr.segment, gr.nation_bucket, gl.sensitive, gr.k, t.m,
       |    (1000000 * COALESCE(ce.c, 0)) // gr.k
       |      - (1000000 * gl.g) // t.n_total AS delta_micro
       |  FROM grp gr CROSS JOIN gmarg gl CROSS JOIN tot t
       |  LEFT JOIN cell ce ON ce.segment = gr.segment
       |    AND ce.nation_bucket = gr.nation_bucket
       |    AND ce.sensitive = gl.sensitive),
       |cum AS (
       |  SELECT segment, nation_bucket, k, m,
       |    CAST(sum(delta_micro) OVER (
       |      PARTITION BY segment, nation_bucket ORDER BY sensitive
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM spine)
       |SELECT segment, nation_bucket, max(k) AS k,
       |  CAST(CASE WHEN max(m) = 1 THEN 0
       |    ELSE sum(abs(cum)) // (max(m) - 1) END AS BIGINT) AS t_ppm,
       |  CAST(CASE WHEN max(m) = 1 THEN 0
       |    ELSE sum(abs(cum)) // (max(m) - 1) END AS BIGINT)
       |    > $tThresholdPpm AS at_risk
       |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q347
  /** Candidate balance-band widths, coarsening left to right — the
    * generalization ladder the release search climbs. */
  val ladderBands: Seq[Long] = Seq(2000L, 4000L, 8000L, 16000L, 32000L)

  /** Generalization-ladder search — the automation of q161's manual
    * loop ("widen [[balBand]] until at_risk empties"): ONE pass
    * evaluates every candidate band width and reports, per rung,
    * the group count, the number of sub-k groups, the share of rows
    * sitting in them (what you'd have to suppress if you shipped at
    * that rung), whether the rung passes k-anonymity outright, and
    * `chosen` on the FINEST passing rung — maximum utility at full
    * protection, the standard generalization-lattice objective
    * (Samarati 2001's minimal generalization, on the one-dimensional
    * band lattice). If no rung passes, no rung is chosen and the
    * caller falls back to suppression (`at_risk_rows_ppm` of the
    * coarsest rung is exactly the suppression budget).
    *
    * Scale shape: the corpus explodes ×|ladder| into ONE
    * map-side-combining agg at (band × quasi) grain — bounded by
    * |ladder| · quasi DOMAIN, not rows; everything after (per-rung
    * rollup, the min-passing-band window) runs on the |ladder|-row
    * frame. One scan however tall the ladder. */
  def q347GeneralizationLadder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val groups = Tables.customer(s, dir)
      .select($"c_mktsegment".as("segment"),
        ($"c_nationkey" % 5).cast("long").as("nation_bucket"),
        $"c_acctbal",
        explode(typedLit(ladderBands)).as("band"))
      .groupBy($"band", $"segment", $"nation_bucket",
        floor($"c_acctbal" / $"band").cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"))
    val rungs = groups.groupBy($"band")
      .agg(count(lit(1)).as("n_groups"),
        sum(when($"k" < kThreshold, 1L).otherwise(0L)).as("n_at_risk"),
        sum(when($"k" < kThreshold, $"k").otherwise(0L)).as("risk_rows"),
        sum($"k").as("n_rows"))
      .select($"band", $"n_groups", $"n_at_risk",
        expr("(1000000 * risk_rows) div n_rows").as("at_risk_rows_ppm"),
        ($"n_at_risk" === 0L).as("passes"))
    rungs
      .withColumn("chosen", $"passes" &&
        $"band" === min(when($"passes", $"band")).over(
          Window.partitionBy()))
      .orderBy($"band")
  }

  private val q347Oracle =
    s"""WITH g AS (
       |  SELECT b.band, c_mktsegment AS segment,
       |    CAST(c_nationkey % 5 AS BIGINT) AS nation_bucket,
       |    CAST(floor(c_acctbal / b.band) AS BIGINT) AS bal_band,
       |    CAST(count(*) AS BIGINT) AS k
       |  FROM customer, (SELECT CAST(unnest([${ladderBands.mkString(", ")}])
       |    AS BIGINT) AS band) b
       |  GROUP BY 1, 2, 3, 4),
       |r AS (
       |  SELECT band, CAST(count(*) AS BIGINT) AS n_groups,
       |    CAST(sum(CASE WHEN k < $kThreshold THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_at_risk,
       |    CAST((1000000 * sum(CASE WHEN k < $kThreshold THEN k ELSE 0 END))
       |      // sum(k) AS BIGINT) AS at_risk_rows_ppm,
       |    sum(CASE WHEN k < $kThreshold THEN 1 ELSE 0 END) = 0 AS passes
       |  FROM g GROUP BY 1)
       |SELECT band, n_groups, n_at_risk, at_risk_rows_ppm, passes,
       |  passes AND band = min(CASE WHEN passes THEN band END) OVER ()
       |    AS chosen
       |FROM r ORDER BY band""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q347_generalization_ladder" -> (q347GeneralizationLadder _),
    "q161_k_anonymity"  -> (q161KAnonymity _),
    "q162_noisy_release" -> (q162NoisyRelease _),
    "q229_pseudonymized_join" -> (q229PseudonymizedJoin _),
    "q313_l_diversity"  -> (q313LDiversity _),
    "q317_t_closeness"  -> (q317TCloseness _),
  )

  val oracles: Map[String, String] = Map(
    "q347_generalization_ladder" -> q347Oracle,
    "q161_k_anonymity"  -> q161Oracle,
    "q162_noisy_release" -> q162Oracle,
    "q229_pseudonymized_join" -> q229Oracle,
    "q313_l_diversity"  -> q313Oracle,
    "q317_t_closeness"  -> q317Oracle,
  )
}
