package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics over the `events` table: rolling windows on
  * densified series, funnel staging, and cohort retention — the
  * product-analytics queries the reference delegates to BigQuery,
  * re-expressed as Spark plans that survive 100 TB of events.
  *
  * The common scale device: reduce the raw stream FIRST (per-slot /
  * per-user aggregates shrink cardinality from rows to slots/users),
  * then run the expensive shape (window, fold, join) on the bounded
  * intermediate. The raw event stream shuffles at most once, on its
  * natural key.
  */
object EventOps {

  // ---------------------------------------------------------------- q101
  /** 24-hour moving average per event type, composed directly on
    * q99's gap-filled series — rolling stats are only correct on a
    * DENSE series (a missing hour would silently stretch the window),
    * which is exactly why q99 exists. `rowsBetween(-23, 0)` is safe
    * here BECAUSE the series is dense: rows == hours, so the frame is
    * the trailing day. The window partitions by event_type, but its
    * input is the bounded spine (slots × types, independent of corpus
    * size) — 100 TB of raw events were already reduced to per-slot
    * counts by one shuffle in q99. avg = exact integer sum / count,
    * then one double division: engine-identical. */
  def q101MovingAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"h").rowsBetween(-23, 0)
    Relational.q99GapFill(s, dir)
      .withColumn("ma24", avg($"n").over(w))
      .orderBy($"h", $"event_type")
  }

  private val q101Oracle =
    s"""WITH filled AS (${Relational.q99Oracle.replace("ORDER BY h, event_type", "")})
       |SELECT h, event_type, n,
       |  AVG(n) OVER (PARTITION BY event_type ORDER BY h
       |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS ma24
       |FROM filled ORDER BY h, event_type""".stripMargin

  // ---------------------------------------------------------------- q102
  /** Funnel staging: how far did each user get through
    * view → click → purchase, in event-time order? One shuffle
    * (groupBy user), then a per-user IN-GROUP fold: sort the user's
    * events once, map to stage codes, fold "advance only on the next
    * expected stage". No self-joins (the k-joins formulation shuffles
    * the stream k times), no driver logic; per-group memory is
    * bounded by per-user activity, which real pipelines bound anyway
    * (dropDuplicates / activity caps upstream). The identical fold
    * runs in the oracle (list_reduce with a prepended 0 seed), so
    * the staging is hash-verified cross-engine. Ties are impossible:
    * the sort key includes the unique event_id. */
  /** The staging pipeline on any (user_id, ts, event_id, event_type)
    * frame — separated so the spec can drive it with planted
    * mis-ordered fixtures (the sf corpus takes every user to stage 3,
    * which would leave the no-advance branches untested). */
  private[ops] def funnelOf(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy($"user_id")
      .agg(sort_array(collect_list(
        struct($"ts", $"event_id", $"event_type"))).as("evs"))
      .select($"user_id",
        expr("""aggregate(
            transform(evs, e -> CASE e.event_type
              WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 3 ELSE 0 END),
            0, (st, c) -> IF(c = st + 1, st + 1, st))""").as("funnel_stage"))
  }

  def q102FunnelStages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    funnelOf(Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type"))
      .orderBy($"user_id")
  }

  private val q102Oracle =
    """WITH u AS (
      |  SELECT user_id,
      |    list_sort(list({'ts': ts, 'event_id': event_id,
      |                    'event_type': event_type})) AS evs
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT user_id,
      |    list_transform(evs, e -> CASE e.event_type
      |      WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |      WHEN 'purchase' THEN 3 ELSE 0 END) AS codes
      |  FROM u)
      |SELECT user_id,
      |  list_reduce(list_prepend(0, codes),
      |    (st, c) -> CASE WHEN c = st + 1 THEN st + 1 ELSE st END) AS funnel_stage
      |FROM c ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q103
  /** Cohort retention: users grouped by their first-signup day, each
    * later active day bucketed into whole weeks since signup, counted
    * as distinct users per (cohort, offset) — the retention matrix.
    * Phase 1 reduces the stream to one row per user (min signup ts);
    * phase 2 joins that small dim back on user_id (broadcast here; at
    * 100 TB both sides are user-keyed, q86's bucketed layout applies)
    * and reduces to distinct (cohort, offset, user) before the final
    * count. Pre-signup activity lands in negative offsets — kept, as
    * the honest report (dropping it silently is how dashboards lie). */
  def q103CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val cohorts = ev.where($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(date_trunc("day", min($"ts")).as("cohort_day"))
    ev.select($"user_id", date_trunc("day", $"ts").as("act_day"))
      .join(broadcast(cohorts), "user_id")
      .select($"cohort_day", $"user_id",
        expr("CAST(floor(datediff(act_day, cohort_day) / 7.0) AS BIGINT)")
          .as("offset_weeks"))
      .distinct()
      .groupBy($"cohort_day", $"offset_weeks")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_day", $"offset_weeks")
  }

  private val q103Oracle =
    """WITH c AS (
      |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT cohort_day, e.user_id,
      |    CAST(floor(datediff('day', cohort_day, date_trunc('day', ts)) / 7.0) AS BIGINT)
      |      AS offset_weeks
      |  FROM events e JOIN c ON e.user_id = c.user_id)
      |SELECT cohort_day, offset_weeks, count(*) AS n_users
      |FROM a GROUP BY 1, 2 ORDER BY cohort_day, offset_weeks""".stripMargin

  // ---------------------------------------------------------------- q117
  /** Last-touch attribution — credit each purchase to the user's most
    * recent click within a 7-day lookback, else mark it organic.
    * Uses q18's scalable as-of device (union both event kinds, ONE
    * window per user with `last(..., ignoreNulls)` carrying the
    * latest click forward) instead of a range join — one shuffle on
    * user_id, linear per-user state, no per-purchase probe. Equal
    * timestamps resolve click-before-purchase (a same-instant click
    * attributes), and event_id completes the total order so
    * duplicate-timestamp clicks attribute identically in both
    * engines. Gap math is exact integer microseconds
    * (unix_micros / epoch_us — TESTDATA's µs-truncated timestamps). */
  val attributionWindowUs: Long = 7L * 86400 * 1000000

  def q117Attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        when($"event_type" === "click", 0).otherwise(1).as("side"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"tus", $"side", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click",
        last(when($"side" === 0, $"event_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_us",
        last(when($"side" === 0, $"tus"), ignoreNulls = true).over(w))
      .where($"side" === 1)
      .withColumn("in_window",
        $"last_click_us".isNotNull &&
          $"tus" - $"last_click_us" <= attributionWindowUs)
      .select($"event_id".as("purchase_id"), $"user_id",
        when($"in_window", $"last_click").as("attributed_click"),
        when($"in_window", expr("(tus - last_click_us) div 1000000"))
          .as("gap_seconds"),
        when($"in_window", "click").otherwise("organic").as("channel"))
      .orderBy($"purchase_id")
  }

  private val q117Oracle =
    s"""WITH u AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id,
       |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |w AS (
       |  SELECT *,
       |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
       |      OVER win AS last_click,
       |    last_value(CASE WHEN side = 0 THEN tus END IGNORE NULLS)
       |      OVER win AS last_click_us
       |  FROM u
       |  WINDOW win AS (PARTITION BY user_id ORDER BY tus, side, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |p AS (
       |  SELECT *, last_click_us IS NOT NULL
       |    AND tus - last_click_us <= ${attributionWindowUs} AS in_window
       |  FROM w WHERE side = 1)
       |SELECT event_id AS purchase_id, user_id,
       |  CASE WHEN in_window THEN last_click END AS attributed_click,
       |  CASE WHEN in_window THEN (tus - last_click_us) // 1000000 END
       |    AS gap_seconds,
       |  CASE WHEN in_window THEN 'click' ELSE 'organic' END AS channel
       |FROM p ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q134
  /** Robust anomaly report per event type: median/MAD (median absolute
    * deviation) and the count of observations beyond [[madK]]·MAD —
    * the outlier detector that survives the outliers it hunts (mean/
    * stddev is dragged by the very spikes it should flag; the median
    * breaks down only past 50% contamination).
    *
    * Two passes by necessity (MAD is a median OF deviations from a
    * median — not one-pass expressible), but each pass is one
    * shuffle on event_type and the intermediates joined back are
    * GROUP-cardinality, so both joins broadcast; the raw stream is
    * scanned twice and never shuffled wider than its natural key.
    * `percentile` is Spark's exact interpolated percentile =
    * DuckDB's quantile_cont (q19's proven equivalence), and the
    * anomaly predicate `|v − med| > k·MAD` is the same IEEE
    * expression shape in both engines, so the report hash-matches
    * without rounding. */
  val madK = 5

  def q134AnomalyMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    madReportOf(Tables.events(s, dir).select($"event_type", $"value"))
  }

  /** The report on any (event_type, value) frame — separated so the
    * spec can plant a constant series (MAD = 0: ANY deviation flags,
    * the degenerate branch the sf corpus never hits) and hand-sized
    * spikes. */
  private[ops] def madReportOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("ad", abs($"value" - $"med"))
    val mad = dev.groupBy($"event_type")
      .agg(expr("percentile(ad, 0.5D)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(min($"med").as("med"), min($"mad").as("mad"),
        count(lit(1)).as("n"),
        sum(when($"ad" > lit(madK) * $"mad", 1L).otherwise(0L)).as("n_anomalies"))
      .orderBy($"event_type")
  }

  private val q134Oracle =
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1),
       |dev AS (
       |  SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
       |  FROM events e JOIN med m ON e.event_type = m.event_type),
       |mad AS (
       |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
       |  FROM dev GROUP BY 1)
       |SELECT d.event_type, min(d.med) AS med, min(m.mad) AS mad,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN d.ad > $madK * m.mad THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_anomalies
       |FROM dev d JOIN mad m ON d.event_type = m.event_type
       |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Per-group trend line: OLS slope/intercept of event value over
    * time, in FIXED-POINT integer arithmetic so the result is
    * bit-exact under any partitioning (the metric-drift monitor a
    * pipeline alerts on — an alert threshold must not depend on
    * which executor summed first; double covariance accumulation
    * is partition-order-sensitive, q122's PageRank lesson).
    *
    * x = days since 2024-01-01 (small integers — centering keeps
    * every closed-form term far from BIGINT range: n·Σxy peaks
    * ~2.8e16 at sf0.01, ~2.8e18 at sf0.1, both < 9.2e18), y
    * quantized to exact micro-units. One shuffle: the five sums are
    * a single partial-aggregated groupBy; the closed form
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) then runs on
    * GROUP-cardinality rows. `div` truncates toward zero in Spark
    * exactly as DuckDB's `//` does (negative slopes — signup trends
    * down in the fixture — exercise that). The intercept reuses the
    * TRUNCATED slope so both engines derive it from identical
    * integers. */
  def q135TrendOls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trendOlsOf(Tables.events(s, dir).select($"event_type", $"ts", $"value"))
  }

  /** The regression on any (event_type, ts, value) frame — separated
    * so the spec can plant an exact line (slope/intercept known in
    * closed form) and a negative trend. */
  private[ops] def trendOlsOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val pts = ev.select($"event_type",
      datediff(to_date(date_trunc("day", $"ts")), lit("2024-01-01").cast("date"))
        .cast("long").as("x"),
      expr("CAST(round(value * 1000000D) AS BIGINT)").as("yq"))
    pts.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"yq").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"yq").as("sxy"))
      .withColumn("slope_micro",
        expr("(n * sxy - sx * sy) div (n * sxx - sx * sx)"))
      .select($"event_type", $"n", $"slope_micro",
        expr("(sy - slope_micro * sx) div n").as("intercept_micro"))
      .orderBy($"event_type")
  }

  private val q135Oracle =
    """WITH pts AS (
      |  SELECT event_type,
      |    datediff('day', DATE '2024-01-01',
      |             CAST(date_trunc('day', ts) AS DATE)) AS x,
      |    CAST(round(value * 1000000) AS BIGINT) AS yq
      |  FROM events),
      |sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * yq) AS BIGINT) AS sxy
      |  FROM pts GROUP BY 1)
      |SELECT event_type, n,
      |  (n * sxy - sx * sy) // (n * sxx - sx * sx) AS slope_micro,
      |  (sy - ((n * sxy - sx * sy) // (n * sxx - sx * sx)) * sx) // n
      |    AS intercept_micro
      |FROM sums ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q138
  /** SCD Type-2 dimension build: collapse each user's event-type
    * stream into validity intervals — (value, valid_from, valid_to,
    * is_current) with consecutive equal values run-length merged —
    * the slowly-changing-dimension history every warehouse keeps and
    * the reference's BigQuery tables imply but never materialize.
    *
    * One shuffle on user_id; every window reuses that partitioning
    * (change detection via null-safe lag compare, run ids via
    * running sum, valid_to via lead over the already-reduced run
    * rows). Per-user state is linear in that user's events — the
    * same bound the q32/q35 session family documents. The run-row
    * ORDER BY includes the run id: two adjacent runs can share a
    * boundary timestamp (equal-µs events of different types straddle
    * a run break), and valid_from alone would leave lead()
    * nondeterministic there. */
  def q138Scd2History(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scd2Of(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id", $"event_type"))
  }

  /** The history build on any (user_id, tus, event_id, event_type)
    * frame — separated so the spec can plant value runs with known
    * intervals, including the equal-µs run boundary. */
  private[ops] def scd2Of(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val wRun = Window.partitionBy($"user_id").orderBy($"valid_from", $"run")
    ev
      .withColumn("brk",
        when(lag($"event_type", 1).over(w) <=> $"event_type", 0L).otherwise(1L))
      .withColumn("run", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"run")
      .agg(min($"event_type").as("event_type"), min($"tus").as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead($"valid_from", 1).over(wRun))
      .select($"user_id", $"event_type", $"valid_from", $"valid_to",
        when($"valid_to".isNull, 1).otherwise(0).as("is_current"), $"n_events")
      .orderBy($"user_id", $"valid_from", $"event_type")
  }

  private val q138Oracle =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
      |chg AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |    THEN 1 ELSE 0 END AS brk
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      |runs AS (
      |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      |  FROM chg),
      |hist AS (
      |  SELECT user_id, run, min(event_type) AS event_type,
      |    min(tus) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
      |  FROM runs GROUP BY 1, 2)
      |SELECT user_id, event_type, valid_from,
      |  lead(valid_from) OVER w2 AS valid_to,
      |  CASE WHEN lead(valid_from) OVER w2 IS NULL THEN 1 ELSE 0 END
      |    AS is_current,
      |  n_events
      |FROM hist
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, run)
      |ORDER BY user_id, valid_from, event_type""".stripMargin

  // ---------------------------------------------------------------- q139
  /** Interval-overlap join at scale: which pairs of users had
    * CONCURRENT sessions, and how often? Sessions are the 30-minute-
    * gap groupings (q32's semantics, built batch-side with the q138
    * run machinery); the output is overlap counts per user pair.
    *
    * The naive plan is a θ-join on `a.st <= b.en AND b.st <= a.en` —
    * a cross product at scale (Spark executes it as BNLJ). Instead
    * the intervals are GRIDDED: each session explodes to the
    * [[overlapBucketUs]] time buckets it spans (sessions are
    * gap-bounded, so almost always 1-2 buckets), pairs join on the
    * bucket equi-key, the exact overlap predicate re-filters, and a
    * distinct on the session-pair key dedupes boundary-straddling
    * matches. Work scales with Σ per-bucket-density², tunable by
    * bucket width — the standard interval-join decomposition Spark
    * lacks natively. */
  val sessionGapUs2: Long = 30L * 60 * 1000 * 1000

  /** Grid width. Correctness is width-independent (two sessions
    * overlap ⟺ they share the bucket of any point in the overlap),
    * so this is purely the density dial: work ∝ Σ per-bucket count².
    * One hour beats one day ~20× on the fixture's mostly-instant
    * sessions; a corpus of long sessions would dial it back up. */
  val overlapBucketUs: Long = 3600L * 1000 * 1000

  def q139SessionOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionOverlapOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id"))
  }

  /** The overlap join on any (user_id, tus, event_id) frame —
    * separated so the spec can plant bucket-straddling sessions (the
    * distinct-dedupe branch), touching endpoints, and disjoint
    * sessions. */
  private[ops] def sessionOverlapOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val sess = ev
      .withColumn("brk", when(
        $"tus" - lag($"tus", 1).over(w) <= sessionGapUs2, 0L).otherwise(1L))
      .withColumn("sid", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"tus").as("st"), max($"tus").as("en"))
    val gridded = sess.select($"user_id", $"sid", $"st", $"en",
      explode(sequence(expr(s"st div $overlapBucketUs"),
        expr(s"en div $overlapBucketUs"))).as("bucket"))
    val a = gridded.select($"bucket", $"user_id".as("user_a"),
      $"sid".as("sid_a"), $"st".as("st_a"), $"en".as("en_a"))
    val b = gridded.select($"bucket", $"user_id".as("user_b"),
      $"sid".as("sid_b"), $"st".as("st_b"), $"en".as("en_b"))
    a.join(b, Seq("bucket"))
      .where($"user_a" < $"user_b" &&
        $"st_a" <= $"en_b" && $"st_b" <= $"en_a")
      .select($"user_a", $"sid_a", $"user_b", $"sid_b")
      .distinct()
      .groupBy($"user_a", $"user_b")
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy($"user_a", $"user_b")
  }

  private val q139Oracle =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
       |brk AS (
       |  SELECT *, CASE WHEN tus - lag(tus) OVER w <= $sessionGapUs2
       |    THEN 0 ELSE 1 END AS b
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
       |runs AS (
       |  SELECT *, CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
       |  FROM brk),
       |sess AS (
       |  SELECT user_id, sid, min(tus) AS st, max(tus) AS en
       |  FROM runs GROUP BY 1, 2)
       |SELECT a.user_id AS user_a, b.user_id AS user_b,
       |  CAST(count(*) AS BIGINT) AS n_overlaps
       |FROM sess a JOIN sess b
       |  ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q141
  /** Event-transition matrix (first-order Markov): for each ordered
    * pair of event types, how often does the second follow the first
    * in a user's stream, and with what conditional probability —
    * the behavior model behind next-action prediction and funnel
    * anomaly alerts.
    *
    * One shuffle on user_id for the lead() window, then the pair
    * aggregation over a TYPE²-cardinality key space (25 cells here;
    * bounded by the schema, not the corpus). Probabilities are
    * fixed-point parts-per-million computed by integer division of
    * exact counts — engine-identical, no double division. The row
    * total divides transitions FROM the type (terminal events —
    * each user's last — have no outgoing edge and are excluded by
    * lead()'s null, which is the standard Markov estimator). */
  def q141TransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    transitionsOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type".as("from_type")))
  }

  /** The estimator on any (user_id, tus, event_id, from_type) frame —
    * separated so the spec can plant sequences whose conditional
    * probabilities are hand-derivable. */
  private[ops] def transitionsOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val pairs = ev
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .where($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy($"from_type")
    pairs
      .withColumn("row_total", sum($"n").over(wFrom))
      .select($"from_type", $"to_type", $"n",
        expr("(1000000 * n) div row_total").as("p_ppm"))
      .orderBy($"from_type", $"to_type")
  }

  private val q141Oracle =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id,
      |    event_type AS from_type
      |  FROM events),
      |nxt AS (
      |  SELECT *, lead(from_type) OVER (PARTITION BY user_id
      |    ORDER BY tus, event_id) AS to_type
      |  FROM ev),
      |pairs AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
      |    AS p_ppm
      |FROM pairs ORDER BY from_type, to_type""".stripMargin

  // ---------------------------------------------------------------- q149
  /** Exact distinct-user rollup across time grains (day → week →
    * month) WITHOUT re-counting the raw stream per grain: the stream
    * reduces ONCE to the distinct (user, day) set — the expensive
    * shuffle — and the coarser grains re-distinct that already-tiny
    * set (users × active-days, orders of magnitude below the event
    * count). Distinct users are not summable across periods (the
    * whole reason this op exists — a user active twice a week is one
    * weekly user), so the hierarchy must re-distinct, but never from
    * raw. Day/week/month truncations agree between engines
    * (ISO Monday weeks in both). */
  def q149DistinctRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, dir)
      .select($"user_id", date_trunc("day", $"ts").as("day"))
      .distinct()
    def grain(name: String, trunc: DataFrame => DataFrame): DataFrame =
      trunc(base).distinct()
        .groupBy($"period").agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("grain"), $"period", $"n_users")
    grain("day",   _.select($"user_id", $"day".as("period")))
      .unionAll(grain("week",
        _.select($"user_id", date_trunc("week", $"day").as("period"))))
      .unionAll(grain("month",
        _.select($"user_id", date_trunc("month", $"day").as("period"))))
      .orderBy($"grain", $"period")
  }

  private val q149Oracle =
    """WITH base AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |d AS (
      |  SELECT 'day' AS grain, day AS period,
      |    CAST(count(*) AS BIGINT) AS n_users
      |  FROM base GROUP BY 2),
      |w AS (
      |  SELECT 'week' AS grain, period, CAST(count(*) AS BIGINT) AS n_users
      |  FROM (SELECT DISTINCT user_id, date_trunc('week', day) AS period
      |        FROM base) GROUP BY 2),
      |m AS (
      |  SELECT 'month' AS grain, period, CAST(count(*) AS BIGINT) AS n_users
      |  FROM (SELECT DISTINCT user_id, date_trunc('month', day) AS period
      |        FROM base) GROUP BY 2)
      |SELECT * FROM d UNION ALL SELECT * FROM w UNION ALL SELECT * FROM m
      |ORDER BY grain, period""".stripMargin

  // ---------------------------------------------------------------- q151
  /** Duration-capped sessionization: a session closes on
    * [[cappedGapUs]] of inactivity OR when it has run for
    * [[cappedMaxUs]] — the production semantics (billing windows,
    * abuse control) that plain gap sessionization (q32/q35) lacks.
    * The cap makes the operator NON-window-expressible: each break
    * depends on the session's ANCHOR, which depends on every prior
    * break — a data-dependent fold, not a frame. Spark runs it as a
    * per-user in-group fold (one shuffle on user_id, the q102
    * device, state O(1) + closed-session list bounded by the user's
    * span/cap); the oracle steps the SAME recurrence with a
    * RECURSIVE CTE (q74/q79's device). Both the gap branch and the
    * cap branch fire on the sf corpus (~13% of session opens are
    * cap-splits), so the hash proves the full recurrence, not just
    * the easy half. */
  val cappedGapUs: Long = 12L * 3600 * 1000000
  val cappedMaxUs: Long = 24L * 3600 * 1000000

  def q151CappedSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cappedSessionsOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id"))
  }

  /** The fold on any (user_id, tus, event_id) frame — separated so
    * the spec can plant a dense run that only the cap splits and a
    * sparse run that only the gap splits. */
  private[ops] def cappedSessionsOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val folded = ev
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"tus", $"event_id"))).as("evs"))
      .select($"user_id", expr(
        s"""aggregate(
           |  transform(evs, e -> e.tus),
           |  struct(
           |    CAST(array() AS ARRAY<STRUCT<st: BIGINT, en: BIGINT, n: BIGINT>>)
           |      AS closed,
           |    -1L AS cst, -1L AS cen, 0L AS cn),
           |  (acc, t) -> CASE
           |    WHEN acc.cst = -1L THEN
           |      struct(acc.closed AS closed, t AS cst, t AS cen, 1L AS cn)
           |    WHEN t - acc.cen > ${cappedGapUs}L OR t - acc.cst > ${cappedMaxUs}L
           |      THEN struct(
           |        concat(acc.closed,
           |          array(struct(acc.cst AS st, acc.cen AS en, acc.cn AS n)))
           |          AS closed,
           |        t AS cst, t AS cen, 1L AS cn)
           |    ELSE struct(acc.closed AS closed, acc.cst AS cst, t AS cen,
           |      acc.cn + 1L AS cn) END,
           |  acc -> concat(acc.closed,
           |    array(struct(acc.cst AS st, acc.cen AS en, acc.cn AS n))))
           |""".stripMargin).as("sessions"))
    folded
      .select($"user_id", posexplode($"sessions").as(Seq("pos", "sess")))
      .select($"user_id", ($"pos" + 1).cast("long").as("sid"),
        $"sess.st".as("session_start"), $"sess.en".as("session_end"),
        $"sess.n".as("n_events"))
      .orderBy($"user_id", $"sid")
  }

  private val q151Oracle =
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |rec AS (
       |  SELECT user_id, rn, tus, tus AS anchor, CAST(1 AS BIGINT) AS sid
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.rn, e.tus,
       |    CASE WHEN e.tus - r.tus > $cappedGapUs
       |           OR e.tus - r.anchor > $cappedMaxUs
       |      THEN e.tus ELSE r.anchor END,
       |    r.sid + CASE WHEN e.tus - r.tus > $cappedGapUs
       |              OR e.tus - r.anchor > $cappedMaxUs THEN 1 ELSE 0 END
       |  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
       |SELECT user_id, sid, min(tus) AS session_start, max(tus) AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM rec GROUP BY 1, 2 ORDER BY user_id, sid""".stripMargin

  // ---------------------------------------------------------------- q152
  /** Ingestion-freshness report — the operational check every feed
    * needs: per event type, the newest event's lag behind the
    * newest event anywhere (a stuck producer shows up as a growing
    * lag), plus activity in the trailing 24 h window before that
    * global high-water mark. Exact integer µs math on the already-
    * aggregated per-type extremes; the only corpus pass is one
    * partial-aggregated groupBy, the global max is a 1-row broadcast.
    * (The STREAMING twin of this check is the watermark itself —
    * this is the batch-side audit a scheduler alerts on.) */
  def q152FreshnessReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_type", unix_micros($"ts").as("tus"))
    val global = ev.agg(max($"tus").as("hwm"))
    ev.crossJoin(broadcast(global))
      .groupBy($"event_type")
      .agg(max($"tus").as("max_tus"),
        min($"hwm").as("hwm"),
        sum(when($"tus" >= $"hwm" - 86400000000L, 1L).otherwise(0L))
          .as("n_last_24h"))
      .select($"event_type",
        expr("(hwm - max_tus) div 60000000").as("lag_minutes"),
        $"n_last_24h")
      .orderBy($"event_type")
  }

  private val q152Oracle =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS tus FROM events),
      |g AS (SELECT max(tus) AS hwm FROM ev)
      |SELECT event_type,
      |  (hwm - max(tus)) // 60000000 AS lag_minutes,
      |  CAST(sum(CASE WHEN tus >= hwm - 86400000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_last_24h
      |FROM ev, g GROUP BY event_type, hwm
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Token-bucket admission control per user — the rate-limit /
    * ingestion-quota operator (abuse throttling, per-tenant fairness,
    * bounded-cost sampling of hyperactive keys). Each user's bucket
    * holds at most [[bucketCapMicro]] micro-tokens, refills at 1
    * token per [[bucketRefillUsPerMicro]] µs, and each event costs
    * [[bucketCostMicro]]; an event is admitted iff the refilled
    * balance covers the cost. Like q151, the decision is a
    * data-dependent RECURRENCE (each admission depends on every
    * prior admission through the balance), so no window frame
    * expresses it: Spark runs a per-user sort-based in-group fold
    * (one shuffle on user_id, O(1) state per user), the oracle steps
    * the same recurrence as a RECURSIVE CTE. All arithmetic is
    * integer µs / micro-tokens with floor division on non-negative
    * operands, so both engines compute bit-identical balances. At
    * sf0.01 ~6 % of events are rejected, so both branches fire on
    * the corpus (the spec additionally plants each branch alone).
    * Per-event verdicts stay inside the fold; only per-user totals
    * (n_events, n_admitted, n_rejected, final balance) come out. */
  val bucketCapMicro: Long = 2000000L     // 2 tokens
  val bucketCostMicro: Long = 1000000L    // 1 token per event
  val bucketRefillUsPerMicro: Long = 14400L // 1 token per 4 h

  def q154TokenBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tokenBucketOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id"))
  }

  /** The fold on any (user_id, tus, event_id) frame — separated so
    * the spec can plant a burst that only rejection handles and a
    * spaced run that is fully admitted. */
  private[ops] def tokenBucketOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val (cap, cost, refill) =
      (bucketCapMicro, bucketCostMicro, bucketRefillUsPerMicro)
    ev.groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"tus", $"event_id"))).as("evs"))
      .select($"user_id", size($"evs").cast("long").as("n_events"), expr(
        s"""aggregate(
           |  transform(evs, e -> e.tus),
           |  struct(-1L AS last, 0L AS tok, 0L AS adm),
           |  (acc, t) -> CASE
           |    WHEN acc.last = -1L THEN
           |      struct(t AS last, ${cap - cost}L AS tok, 1L AS adm)
           |    WHEN least(${cap}L, acc.tok + (t - acc.last) div ${refill}L)
           |        >= ${cost}L THEN
           |      struct(t AS last,
           |        least(${cap}L, acc.tok + (t - acc.last) div ${refill}L)
           |          - ${cost}L AS tok,
           |        acc.adm + 1L AS adm)
           |    ELSE
           |      struct(t AS last,
           |        least(${cap}L, acc.tok + (t - acc.last) div ${refill}L)
           |          AS tok,
           |        acc.adm AS adm) END,
           |  acc -> struct(acc.tok AS tok, acc.adm AS adm))
           |""".stripMargin).as("fin"))
      .select($"user_id", $"n_events", $"fin.adm".as("n_admitted"),
        ($"n_events" - $"fin.adm").as("n_rejected"),
        $"fin.tok".as("final_balance_micro"))
      .orderBy($"user_id")
  }

  private val q154Oracle = {
    val (cap, cost, refill) =
      (bucketCapMicro, bucketCostMicro, bucketRefillUsPerMicro)
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events),
       |rec AS (
       |  SELECT user_id, rn, tus, CAST(${cap - cost} AS BIGINT) AS tok,
       |    CAST(1 AS BIGINT) AS adm
       |  FROM ev WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.rn, e.tus,
       |    CASE WHEN least($cap, r.tok + (e.tus - r.tus) // $refill) >= $cost
       |      THEN least($cap, r.tok + (e.tus - r.tus) // $refill) - $cost
       |      ELSE least($cap, r.tok + (e.tus - r.tus) // $refill) END,
       |    r.adm + CASE
       |      WHEN least($cap, r.tok + (e.tus - r.tus) // $refill) >= $cost
       |      THEN 1 ELSE 0 END
       |  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  max(adm) AS n_admitted,
       |  CAST(count(*) AS BIGINT) - max(adm) AS n_rejected,
       |  arg_max(tok, rn) AS final_balance_micro
       |FROM rec GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q163
  /** CUSUM slack (denominator of mean): drift smaller than mean/50
    * is absorbed, not accumulated. */
  val cusumSlackDiv = 50
  /** CUSUM alarm threshold (denominator of mean). */
  val cusumAlarmDiv = 10

  /** CUSUM changepoint detection over the daily revenue series — the
    * classic sequential drift detector (Page 1954): S⁺ accumulates
    * positive deviations beyond a slack band, S⁻ negative ones, and
    * either statistic crossing the threshold raises an alarm. A
    * monitoring pipeline runs this nightly to catch level shifts
    * (pipeline regression, data loss upstream) that per-day
    * thresholds (q134's MAD flags single outliers) miss because each
    * individual day looks normal.
    *
    * All arithmetic is exact integer micro-units: daily sums quantize
    * per ROW (q135's device), the baseline mean / slack / threshold
    * are integer divisions of the series totals, and the recurrence
    * `S⁺ ← max(0, S⁺ + x − μ − k)` folds in-group (q151's device —
    * the running statistic depends on its own previous value, which
    * no window frame expresses). Scale shape: the raw stream reduces
    * to one row per DAY in a map-side-combining agg first, so the
    * fold's array is calendar-bounded (a decade ≈ 3.7k elements),
    * never event-bounded; the oracle steps the same recurrence as a
    * RECURSIVE CTE (q154's device). */
  def q163CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cusumOf(Tables.events(s, dir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value * 1000000D) AS BIGINT)")).as("x")))
  }

  /** The detector on any (day, x) daily frame — separated so the
    * spec can plant a level shift at a known day and see the alarm
    * rise there and only there. */
  private[ops] def cusumOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    daily
      .agg(sort_array(collect_list(struct($"day", $"x"))).as("ds"))
      .withColumn("mu", expr("aggregate(ds, 0L, (a, d) -> a + d.x) div size(ds)"))
      .withColumn("kk", expr(s"mu div $cusumSlackDiv"))
      .withColumn("hh", expr(s"mu div $cusumAlarmDiv"))
      .select(explode(expr(
        """aggregate(ds,
          |  struct(
          |    CAST(array() AS
          |      ARRAY<STRUCT<day DATE, x BIGINT, s_pos BIGINT, s_neg BIGINT>>)
          |      AS out,
          |    0L AS sp, 0L AS sn),
          |  (acc, d) -> struct(
          |    concat(acc.out, array(struct(
          |      d.day AS day, d.x AS x,
          |      greatest(0L, acc.sp + d.x - mu - kk) AS s_pos,
          |      greatest(0L, acc.sn + mu - kk - d.x) AS s_neg))) AS out,
          |    greatest(0L, acc.sp + d.x - mu - kk) AS sp,
          |    greatest(0L, acc.sn + mu - kk - d.x) AS sn),
          |  acc -> acc.out)""".stripMargin)).as("r"),
        $"hh")
      .select($"r.day", $"r.x", $"r.s_pos", $"r.s_neg",
        ($"r.s_pos" > $"hh" || $"r.s_neg" > $"hh").as("alarm"))
      .orderBy($"day")
  }

  private val q163Oracle =
    s"""WITH RECURSIVE daily AS (
       |  SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM (
       |    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |      CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS x
       |    FROM events GROUP BY 1)),
       |st AS (
       |  SELECT CAST(sum(x) // count(*) AS BIGINT) AS mu,
       |    CAST((sum(x) // count(*)) // $cusumSlackDiv AS BIGINT) AS kk,
       |    CAST((sum(x) // count(*)) // $cusumAlarmDiv AS BIGINT) AS hh
       |  FROM daily),
       |rec AS (
       |  SELECT d.rn, d.day, d.x,
       |    greatest(0, d.x - st.mu - st.kk) AS sp,
       |    greatest(0, st.mu - st.kk - d.x) AS sn
       |  FROM daily d, st WHERE d.rn = 1
       |  UNION ALL
       |  SELECT d.rn, d.day, d.x,
       |    greatest(0, r.sp + d.x - st.mu - st.kk),
       |    greatest(0, r.sn + st.mu - st.kk - d.x)
       |  FROM daily d JOIN rec r ON d.rn = r.rn + 1, st)
       |SELECT day, x, sp AS s_pos, sn AS s_neg,
       |  (sp > st.hh OR sn > st.hh) AS alarm
       |FROM rec, st ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q169
  /** Seasonal traffic profile with residual anomalies: the
    * (day-of-week × hour-of-day) expected-load grid every
    * capacity-planning and alerting pipeline keeps, plus a per-cell
    * count of observed slots that deviated beyond 2× from their
    * cell's mean — q134 flags outliers against a GLOBAL baseline,
    * this one against the seasonal shape (3am Sunday is not low
    * traffic if every Sunday 3am looks like that).
    *
    * The stream reduces to (date, hour) slot counts first (one
    * map-side-combining shuffle; slot cardinality is
    * calendar-bounded), then the profile statistics ride a
    * (dow, hour) window whose exchange the final grouping reuses —
    * no second pass over raw events. The anomaly test is exact
    * integer cross-multiplication (2·n·slots < total), never a
    * float mean comparison, so the grid is hash-stable. */
  def q169SeasonalProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val slots = Tables.events(s, dir)
      .groupBy(to_date($"ts").as("d"), hour($"ts").cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", (dayofweek($"d") - 1).cast("long"))
    val w = Window.partitionBy($"dow", $"hr")
    slots
      .withColumn("n_slots", count(lit(1)).over(w))
      .withColumn("total", sum($"n").over(w))
      .withColumn("anom",
        when(lit(2) * $"n" * $"n_slots" < $"total" ||
          $"n" * $"n_slots" > lit(2) * $"total", 1L).otherwise(0L))
      .groupBy($"dow", $"hr")
      .agg(max($"n_slots").as("n_slots"), max($"total").as("total"),
        sum($"anom").as("n_anom"))
      .select($"dow", $"hr", $"n_slots", $"total",
        expr("(1000000 * total) div n_slots").as("mean_micro"), $"n_anom")
      .orderBy($"dow", $"hr")
  }

  private val q169Oracle =
    """WITH slots AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |    CAST(extract(hour FROM ts) AS BIGINT) AS hr,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT CAST(dayofweek(d) AS BIGINT) AS dow, hr, n,
      |    CAST(count(*) OVER w AS BIGINT) AS n_slots,
      |    CAST(sum(n) OVER w AS BIGINT) AS total
      |  FROM slots
      |  WINDOW w AS (PARTITION BY dayofweek(d), hr))
      |SELECT dow, hr, max(n_slots) AS n_slots, max(total) AS total,
      |  CAST((1000000 * max(total)) // max(n_slots) AS BIGINT) AS mean_micro,
      |  CAST(sum(CASE WHEN 2 * n * n_slots < total
      |    OR n * n_slots > 2 * total THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
      |FROM g GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin

  // ---------------------------------------------------------------- q171
  /** Context length of the q171 training windows (context → next
    * event). */
  val seqContextLen = 3

  /** Sequence-dataset builder: slide a ([[seqContextLen]] context,
    * 1 target) window over every user's event-type history — the
    * supervised next-event-prediction examples a sequential
    * recommender / behavioral-LM trains on, built directly from the
    * event log. Every (user, position) yields one example; users
    * with ≤ [[seqContextLen]] events yield none (no padding — the
    * honest variant; padded examples are a projection away).
    *
    * One shuffle (groupBy user), then the window slide is IN-ARRAY
    * (q102's fold discipline): sort each user's events once, project
    * type codes, explode positions. Fan-out is events-per-user
    * bounded, the same bound every per-user op here relies on. The
    * (ts, event_id) sort key is a total order, so the emitted
    * context arrays are hash-stable cross-engine. */
  def q171EventSequences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // context is serialized '|'-joined (always exactly seqContextLen
    // entries, never empty): the driver's comparator hashes scalar
    // cells, not arrays. The array-shaped core stays in sequencesOf
    // for the spec and downstream consumers.
    sequencesOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type"))
      .select($"user_id", $"pos",
        concat_ws("|", $"context").as("context"), $"target")
  }

  /** The builder on any (user_id, tus, event_id, event_type) frame —
    * separated so the spec can plant a short history (no examples)
    * and a known sequence (hand-written examples). */
  private[ops] def sequencesOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val k = seqContextLen
    ev.groupBy($"user_id")
      .agg(sort_array(collect_list(
        struct($"tus", $"event_id", $"event_type"))).as("evs"))
      .select($"user_id",
        expr("transform(evs, e -> e.event_type)").as("types"))
      .where(size($"types") > k)
      .select($"user_id", posexplode(expr(
        s"""transform(sequence(1, size(types) - $k), i ->
           |  struct(slice(types, i, $k) AS context,
           |         element_at(types, i + $k) AS target))""".stripMargin)))
      .select($"user_id", ($"pos" + 1).cast("long").as("pos"),
        $"col.context", $"col.target")
      .orderBy($"user_id", $"pos")
  }

  private val q171Oracle =
    s"""WITH u AS (
       |  SELECT user_id,
       |    list_sort(list({'tus': epoch_us(ts), 'event_id': event_id,
       |                    'event_type': event_type})) AS evs
       |  FROM events GROUP BY user_id),
       |t AS (
       |  SELECT user_id, list_transform(evs, e -> e.event_type) AS types
       |  FROM u)
       |SELECT user_id, CAST(i AS BIGINT) AS pos,
       |  array_to_string(types[i:i + ${seqContextLen - 1}], '|') AS context,
       |  types[i + $seqContextLen] AS target
       |FROM t, unnest(range(1, len(types) - ${seqContextLen - 1})) AS r(i)
       |ORDER BY user_id, pos""".stripMargin

  // ---------------------------------------------------------------- q178
  /** Linear multi-touch attribution: every purchase splits its credit
    * EQUALLY across all of the user's clicks in the trailing 7-day
    * window — the multi-touch counterpart of q117's last-touch (which
    * awards winner-take-all and so systematically overpays the final
    * channel). Per purchase: the touch count and the per-touch credit
    * in ppm (integer division; the ≤ n_touches−1 ppm remainder is
    * deliberately dropped rather than smeared — documented, exact,
    * and hash-stable).
    *
    * NO interval join: clicks and purchases ride ONE user-partitioned
    * window with a RANGE frame over integer microseconds
    * (`range [-7d, 0]` counting click flags) — the trailing-window
    * count every engine evaluates in linear per-user time, where the
    * join formulation builds purchases × clicks pairs. Same-µs ties:
    * a RANGE frame includes ALL peers of the current order value in
    * both engines, so a same-instant click attributes (q117's tie
    * rule, inherited for free). One shuffle on user_id. */
  def q178LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"tus")
      .rangeBetween(-attributionWindowUs, 0)
    Tables.events(s, dir)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type")
      .withColumn("n_touches",
        sum(when($"event_type" === "click", 1L).otherwise(0L)).over(w))
      .where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"n_touches",
        when($"n_touches" > 0, expr("1000000 div n_touches")).otherwise(0L)
          .as("credit_each_ppm"),
        when($"n_touches" > 0, "attributed").otherwise("organic")
          .as("channel"))
      .orderBy($"purchase_id")
  }

  private val q178Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |c AS (
       |  SELECT *, CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY tus
       |          RANGE BETWEEN $attributionWindowUs PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS n_touches
       |  FROM ev)
       |SELECT event_id AS purchase_id, n_touches,
       |  CASE WHEN n_touches > 0 THEN 1000000 // n_touches ELSE 0 END
       |    AS credit_each_ppm,
       |  CASE WHEN n_touches > 0 THEN 'attributed' ELSE 'organic' END
       |    AS channel
       |FROM c WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q185
  /** Temporal (as-of) join of facts against SCD2 validity intervals:
    * attribute each purchase to the BROWSING REGIME (the user's q138
    * run of non-purchase activity) active at purchase time — the
    * fact-to-versioned-dimension lookup every warehouse with SCD2
    * dims runs ("which catalog version / price list / account tier
    * applied to this transaction?"). Purchases before any regime
    * resolve to 'none' (left-join honesty, q103's posture).
    *
    * NO interval join: dimension CHANGES and facts union into ONE
    * user-partitioned window and the regime carries forward with
    * `last(_, ignoreNulls)` — q18/q117's as-of device, one shuffle,
    * linear per-user state, where the BETWEEN formulation (the
    * oracle) probes every fact against every interval. Tie order at
    * equal µs: changes apply BEFORE facts (a same-instant regime
    * change governs the purchase — q117's rule), and zero-width runs
    * (q138's equal-µs boundaries) sort by valid_to so the surviving
    * run is what carries. */
  def q185TemporalRegimeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    temporalRegimeOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type"))
  }

  /** The lookup on any (user_id, tus, event_id, event_type) frame —
    * separated so the spec can plant pre-regime purchases, same-µs
    * changes, and zero-width runs. */
  private[ops] def temporalRegimeOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dim = scd2Of(ev.where($"event_type" =!= "purchase"))
    val changes = dim.select($"user_id", $"valid_from".as("tus"),
      coalesce($"valid_to", lit(Long.MaxValue)).as("tie"),
      lit(0).as("kind"), $"event_type".as("rtyp"),
      $"valid_from".as("rfrom"), lit(null).cast("long").as("purchase_id"))
    val facts = ev.where($"event_type" === "purchase")
      .select($"user_id", $"tus", lit(Long.MaxValue).as("tie"),
        lit(1).as("kind"), lit(null).cast("string").as("rtyp"),
        lit(null).cast("long").as("rfrom"), $"event_id".as("purchase_id"))
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"kind", $"tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changes.unionByName(facts)
      .withColumn("cur_typ", last($"rtyp", ignoreNulls = true).over(w))
      .withColumn("cur_from", last($"rfrom", ignoreNulls = true).over(w))
      .where($"kind" === 1)
      .select($"purchase_id",
        coalesce($"cur_typ", lit("none")).as("regime_type"),
        $"cur_from".as("regime_from"))
      .orderBy($"purchase_id")
  }

  private val q185Oracle =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
      |b AS (SELECT * FROM ev WHERE event_type <> 'purchase'),
      |chg AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |    THEN 1 ELSE 0 END AS brk
      |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      |runs AS (
      |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      |  FROM chg),
      |hist AS (
      |  SELECT user_id, run, min(event_type) AS event_type,
      |    min(tus) AS valid_from
      |  FROM runs GROUP BY 1, 2),
      |d AS (
      |  SELECT user_id, event_type, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id
      |      ORDER BY valid_from, run) AS valid_to
      |  FROM hist),
      |p AS (
      |  SELECT event_id AS purchase_id, user_id, tus
      |  FROM ev WHERE event_type = 'purchase')
      |SELECT p.purchase_id,
      |  COALESCE(d.event_type, 'none') AS regime_type,
      |  d.valid_from AS regime_from
      |FROM p LEFT JOIN d
      |  ON p.user_id = d.user_id AND d.valid_from <= p.tus
      |  AND (d.valid_to IS NULL OR p.tus < d.valid_to)
      |ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q189
  /** Top-k cut for q189's path report. */
  val pathTopK = 20

  /** Frequent 3-step behavior paths: count every CONTIGUOUS
    * (a → b → c) event-type transition across all users' event-time
    * order and report the top [[pathTopK]] — the path-mining step
    * behind funnel DISCOVERY (q102 measures a funnel someone already
    * hypothesized; this surfaces which sequences actually happen) and
    * the empirical check on q141's first-order Markov assumption
    * (a path count far off `n(ab)·P(c|b)` marks second-order
    * structure). Same in-array slide as q171 (one groupBy-user
    * shuffle, per-user fan-out), then a path-cardinality count
    * (≤ |types|³ groups) and a deterministic total-order top-k
    * (count desc, path asc — ties can't reorder across engines). */
  def q189FrequentPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type")
      .groupBy($"user_id")
      .agg(sort_array(collect_list(
        struct($"tus", $"event_id", $"event_type"))).as("evs"))
      .select(explode(expr(
        """transform(sequence(1, greatest(0, size(evs) - 2)), i ->
          |  struct(evs[i - 1].event_type AS s1,
          |         evs[i].event_type AS s2,
          |         evs[i + 1].event_type AS s3))""".stripMargin)).as("p"))
      .groupBy($"p.s1", $"p.s2", $"p.s3")
      .agg(count(lit(1)).as("n_paths"))
      .orderBy($"n_paths".desc, $"s1", $"s2", $"s3")
      .limit(pathTopK)
  }

  private val q189Oracle =
    s"""WITH u AS (
       |  SELECT user_id,
       |    list_transform(
       |      list_sort(list({'tus': epoch_us(ts), 'event_id': event_id,
       |                      'event_type': event_type})),
       |      e -> e.event_type) AS t
       |  FROM events GROUP BY user_id),
       |p AS (
       |  SELECT t[i] AS s1, t[i + 1] AS s2, t[i + 2] AS s3
       |  FROM u, unnest(range(1, len(t) - 1)) AS r(i))
       |SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n_paths
       |FROM p GROUP BY 1, 2, 3
       |ORDER BY n_paths DESC, s1, s2, s3 LIMIT $pathTopK""".stripMargin

  // ---------------------------------------------------------------- q190
  /** Cohort LTV curves: cumulative purchase revenue per signup
    * cohort by week offset — the lifetime-value report that turns
    * q103's retention MATRIX (who comes back) into money (what
    * coming back is worth); the pair is how acquisition spend gets
    * justified. Same cohort derivation and honest negative-offset
    * posture as q103 (pre-signup purchases land in negative weeks,
    * kept); revenue is per-row micro-quantized (q135's device) and
    * the cumulative curve is one calendar-bounded window over the
    * already-reduced (cohort × week) grid, so the raw stream
    * shuffles once. */
  def q190CohortLtv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val cohorts = ev.where($"event_type" === "signup")
      .groupBy($"user_id")
      .agg(to_date(date_trunc("day", min($"ts"))).as("cohort_day"))
    val weekly = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts", expr("CAST(round(value * 1000000D) AS BIGINT)").as("vq"))
      .join(broadcast(cohorts), "user_id")
      .select($"cohort_day",
        expr("CAST(floor(datediff(to_date(date_trunc('day', ts)), cohort_day) / 7.0) AS BIGINT)")
          .as("wk"), $"vq")
      .groupBy($"cohort_day", $"wk")
      .agg(count(lit(1)).as("n"), sum($"vq").as("rev"))
    val w = Window.partitionBy($"cohort_day").orderBy($"wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly.withColumn("cum_rev", sum($"rev").over(w))
      .select($"cohort_day", $"wk", $"n", $"rev", $"cum_rev")
      .orderBy($"cohort_day", $"wk")
  }

  private val q190Oracle =
    """WITH c AS (
      |  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, c.cohort_day,
      |    CAST(floor(datediff('day', cohort_day,
      |      CAST(date_trunc('day', ts) AS DATE)) / 7.0) AS BIGINT) AS wk,
      |    CAST(round(value * 1000000) AS BIGINT) AS vq
      |  FROM events e JOIN c USING (user_id) WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT cohort_day, wk, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(vq) AS BIGINT) AS rev
      |  FROM p GROUP BY 1, 2)
      |SELECT cohort_day, wk, n, rev,
      |  CAST(sum(rev) OVER (PARTITION BY cohort_day ORDER BY wk
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev
      |FROM w ORDER BY cohort_day, wk""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Traffic burstiness per event type: the Fano factor (variance ∕
    * mean of daily counts) in fixed-point ppm — 1.0 marks Poisson
    * arrivals; higher means bursty/clumped traffic (capacity must be
    * provisioned for peaks, sampling windows stratified), lower
    * means regularized/throttled flow. Exact integers end to end:
    * daily counts, then Var/mean = (k·Σn² − (Σn)²) ∕ (k·Σn) on raw
    * sums — numerator non-negative by Cauchy–Schwarz, so truncating
    * division agrees cross-engine. The stream reduces to
    * calendar-bounded daily counts in one map-side-combining
    * shuffle; the statistic is a type-cardinality fold. */
  def q192BurstinessFano(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("k"), sum($"n").as("sn"),
        sum($"n" * $"n").as("sn2"))
      .select($"event_type", $"k", $"sn",
        expr("(1000000 * (k * sn2 - sn * sn)) div (k * sn)").as("fano_ppm"))
      .orderBy($"event_type")
  }

  private val q192Oracle =
    """WITH d AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(n) AS BIGINT) AS sn, CAST(sum(n * n) AS BIGINT) AS sn2
      |  FROM d GROUP BY 1)
      |SELECT event_type, k, sn,
      |  CAST((1000000 * (k * sn2 - sn * sn)) // (k * sn) AS BIGINT) AS fano_ppm
      |FROM s ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q197
  /** Activity-interval length (µs) for q197: each event keeps its
    * user "online" for five minutes. */
  val activityUs: Long = 5L * 60 * 1000000

  /** Interval-union coverage: each event opens a [ts, ts+5 min)
    * activity interval; per user, merge every overlapping interval
    * and report the merged-interval count and total COVERED time —
    * the usage/billing metric naive `n_events × 5 min` over-counts
    * whenever activity overlaps (it always does). This is the
    * gaps-and-islands technique: an interval starts a new island iff
    * its start exceeds the running MAX of all previous ends (not
    * `lag(en)` — an interval fully inside an earlier long one must
    * not split the island), islands = running sum of those breaks,
    * then one aggregate per island. One shuffle on user_id; both
    * windows and the final per-user rollup ride the same partition.
    * Exact integer µs end to end. */
  def q197IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    intervalCoverageOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("st"),
        (unix_micros($"ts") + activityUs).as("en")))
  }

  /** The union on any (user_id, st, en) interval frame — separated
    * so the spec can plant nested, chained, and disjoint intervals. */
  private[ops] def intervalCoverageOf(iv: DataFrame): DataFrame = {
    val s = iv.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy($"user_id").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy($"user_id").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("brk",
        when($"st" > max($"en").over(wPrev), 1L).otherwise(0L))
      .withColumn("grp", sum($"brk").over(wRun))
      .groupBy($"user_id", $"grp")
      .agg(min($"st").as("ist"), max($"en").as("ien"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum($"ien" - $"ist").as("covered_us"))
      .orderBy($"user_id")
  }

  private val q197Oracle =
    s"""WITH iv AS (
       |  SELECT user_id, epoch_us(ts) AS st,
       |    epoch_us(ts) + $activityUs AS en
       |  FROM events),
       |o AS (
       |  SELECT *, CASE WHEN st > max(en) OVER (PARTITION BY user_id
       |      ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS brk
       |  FROM iv),
       |g AS (
       |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY st, en
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
       |  FROM o),
       |m AS (
       |  SELECT user_id, grp, min(st) AS st, max(en) AS en
       |  FROM g GROUP BY 1, 2)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
       |  CAST(sum(en - st) AS BIGINT) AS covered_us
       |FROM m GROUP BY 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q202
  /** Exact Gini coefficient of event value per type — the inequality
    * summary behind "do a few whales carry this revenue?" (q193's
    * HHI measures SOURCE concentration; Gini measures the VALUE
    * distribution's own skew). Closed rank form on exact integers:
    * G = (2·Σi·xᵢ − (n+1)·Σx) ∕ (n·Σx) over ascending-sorted values
    * — one rank window + one aggregate, no pairwise |xᵢ−xⱼ| blowup.
    * Values quantize to CENTS (not micros): Gini is scale-invariant,
    * and the coarser grid keeps 10⁶·Σi·x inside BIGINT at much
    * larger n (headroom to ~10⁷ rows/group at this value range; a
    * bigger deployment re-grids, same property). Duplicate values
    * get arbitrary distinct ranks — the rank SUM over a tie block is
    * order-independent, so the statistic is deterministic anyway. */
  def q202Gini(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"x")
    Tables.events(s, dir)
      .select($"event_type", expr("CAST(round(value * 100D) AS BIGINT)").as("x"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"i" * $"x").as("six"))
      .select($"event_type", $"n",
        expr("(1000000 * (2 * six - (n + 1) * sx)) div (n * sx)").as("gini_ppm"))
      .orderBy($"event_type")
  }

  private val q202Oracle =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events),
      |r AS (
      |  SELECT event_type, x,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT)
      |      AS i
      |  FROM v),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(i * x) AS BIGINT) AS six
      |  FROM r GROUP BY 1)
      |SELECT event_type, n,
      |  CAST((1000000 * (2 * six - (n + 1) * sx)) // (n * sx) AS BIGINT)
      |    AS gini_ppm
      |FROM s ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q203
  /** Two-sample Kolmogorov–Smirnov drift statistic between the
    * month's first and second half: D = max |F̂₁(x) − F̂₂(x)| in ppm
    * — the distribution-shape drift test that catches what q115's
    * binned PSI smooths away (PSI needs a bin grid; KS compares the
    * FULL empirical CDFs, sensitive to any quantile shift). Exact
    * integers end to end: both CDFs ride ONE value-ordered RANGE
    * window (peers included, so the CDF is evaluated exactly AT each
    * value in both engines), and the sup-difference cross-multiplies
    * |ca·n_b − cb·n_a| instead of dividing — no float CDF anywhere.
    * One sort-shuffle of (half, value) pairs; the two-pass
    * alternative (per-sample CDFs then merge) shuffles twice for no
    * benefit. */
  def q203KsDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, dir)
      .select(
        when(dayofmonth($"ts") <= 15, 0L).otherwise(1L).as("half"),
        expr("CAST(round(value * 1000000D) AS BIGINT)").as("x"))
    val tot = v.agg(
      sum(when($"half" === 0L, 1L).otherwise(0L)).as("na"),
      sum(when($"half" === 1L, 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy($"x")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    v.withColumn("ca", sum(when($"half" === 0L, 1L).otherwise(0L)).over(w))
      .withColumn("cb", sum(when($"half" === 1L, 1L).otherwise(0L)).over(w))
      .crossJoin(broadcast(tot))
      .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
        max(abs($"ca" * $"nb" - $"cb" * $"na")).as("dmax"))
      .select($"n_a", $"n_b",
        expr("(1000000 * dmax) div (n_a * n_b)").as("ks_ppm"))
  }

  private val q203Oracle =
    """WITH v AS (
      |  SELECT CASE WHEN extract(day FROM ts) <= 15 THEN 0 ELSE 1 END AS half,
      |    CAST(round(value * 1000000) AS BIGINT) AS x
      |  FROM events),
      |n AS (
      |  SELECT CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM v),
      |c AS (
      |  SELECT x,
      |    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
      |      OVER (ORDER BY x RANGE UNBOUNDED PRECEDING) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
      |      OVER (ORDER BY x RANGE UNBOUNDED PRECEDING) AS BIGINT) AS cb
      |  FROM v)
      |SELECT max(n.na) AS n_a, max(n.nb) AS n_b,
      |  CAST((1000000 * max(abs(ca * nb - cb * na))) // (max(n.na) * max(n.nb))
      |    AS BIGINT) AS ks_ppm
      |FROM c, n""".stripMargin

  // ---------------------------------------------------------------- q204
  /** Conversion window (µs) for q204. */
  val conversionWindowUs: Long = 3600L * 1000000

  /** View→purchase conversion rate per day: of each day's views, how
    * many were followed by a purchase from the same user within one
    * hour — q178/q117 attribute a purchase BACKWARD to its touches;
    * this measures FORWARD from the exposure, which is the number an
    * experiment reads (conversion of views, not provenance of
    * purchases). Forward as-of without an interval join: one
    * DESCENDING per-user window carries the nearest LATER purchase
    * time onto every event (`last(_, ignoreNulls)` over rows
    * strictly before the current one in the descending order — the
    * exact mirror of q117's backward carry), then the conversion
    * test and daily rate are projections. Same-µs purchase: the
    * (tus, event_id) descending total order places a same-instant
    * purchase with a HIGHER event id "later", so it converts —
    * deterministic in both engines. */
  def q204ConversionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where($"event_type".isin("view", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type", to_date($"ts").as("day"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"tus".desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("next_p",
        last(when($"event_type" === "purchase", $"tus"), ignoreNulls = true)
          .over(w))
      .where($"event_type" === "view")
      .groupBy($"day")
      .agg(count(lit(1)).as("n_views"),
        sum(when($"next_p".isNotNull &&
          $"next_p" - $"tus" <= conversionWindowUs, 1L).otherwise(0L))
          .as("n_converted"))
      .select($"day", $"n_views", $"n_converted",
        expr("(1000000 * n_converted) div n_views").as("conv_ppm"))
      .orderBy($"day")
  }

  private val q204Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
       |    CAST(date_trunc('day', ts) AS DATE) AS day
       |  FROM events WHERE event_type IN ('view', 'purchase')),
       |c AS (
       |  SELECT *, last(CASE WHEN event_type = 'purchase' THEN tus END IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY tus DESC, event_id DESC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_p
       |  FROM ev)
       |SELECT day, CAST(count(*) AS BIGINT) AS n_views,
       |  CAST(sum(CASE WHEN next_p IS NOT NULL
       |    AND next_p - tus <= $conversionWindowUs THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_converted,
       |  CAST((1000000 * sum(CASE WHEN next_p IS NOT NULL
       |    AND next_p - tus <= $conversionWindowUs THEN 1 ELSE 0 END))
       |    // count(*) AS BIGINT) AS conv_ppm
       |FROM c WHERE event_type = 'view'
       |GROUP BY day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q205
  /** Resample count for q205 (the 2nd/31st order statistics of 32
    * resample means bracket a ~94% interval). */
  val bootResamples = 32

  /** Quantized Poisson(1) CDF in ppm — the per-(resample, row)
    * weight distribution of the POISSON bootstrap, the variant that
    * distributes: classic resampling draws n rows WITH replacement
    * (a global, coordination-heavy operation), while Poisson(1)
    * weights are independent per row, so every resample is a pure
    * projection over one scan. ONE constant table interpolated into
    * both engines (q162's discipline). */
  val poissonCdfPpm: Seq[(Int, Long)] = Seq(
    0 -> 367879L, 1 -> 735759L, 2 -> 919699L, 3 -> 981012L,
    4 -> 996340L, 5 -> 999406L, 6 -> 999917L, 7 -> 1000000L)

  /** Bootstrap confidence interval for mean purchase value via the
    * Poisson bootstrap: [[bootResamples]] deterministic resamples
    * (md5 per (resample, row) → inverse-CDF Poisson weight), each
    * mean an exact integer-weighted ratio, the interval the 2nd and
    * 31st order statistics of the resample means. Error bars from
    * the data itself with NO distributional assumption — and the
    * whole machine is hash-reproducible, so "the CI of this metric"
    * is itself a regression-checkable artifact. Cost: resamples ×
    * rows weight projections over one scan, reduced by a
    * map-side-combining agg to `bootResamples` rows; no shuffle ever
    * carries more than (resample, partial sums). */
  def q205BootstrapCi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = Tables.events(s, dir).where($"event_type" === "purchase")
      .select($"event_id", expr("CAST(round(value * 1000000D) AS BIGINT)").as("x"))
    val point = v.agg(count(lit(1)).as("n"),
      expr("CAST(sum(x) AS BIGINT) div count(1)").as("point_mean_micro"))
    val wt = poissonCdfPpm.init.foldRight(lit(poissonCdfPpm.last._1): Column) {
      case ((k, thr), acc) => when($"u" < thr, k).otherwise(acc)
    }
    val means = v
      .crossJoin(s.range(bootResamples).select($"id".as("bi")))
      .withColumn("u", conv(substring(md5(concat(lit("boot:"),
        $"bi".cast("string"), lit(":"), $"event_id".cast("string"))),
        1, 5), 16, 10).cast("long") % 1000000L)
      .withColumn("wt", wt.cast("long"))
      .groupBy($"bi")
      .agg(expr("CAST(sum(wt * x) AS BIGINT) div CAST(sum(wt) AS BIGINT)")
        .as("mean_micro"))
      .withColumn("rn", row_number().over(Window.orderBy($"mean_micro")))
    val lo = means.where($"rn" === 2).select($"mean_micro".as("ci_lo_micro"))
    val hi = means.where($"rn" === bootResamples - 1)
      .select($"mean_micro".as("ci_hi_micro"))
    point.crossJoin(lo).crossJoin(hi)
  }

  private val q205Oracle = {
    val cases = poissonCdfPpm.init
      .map { case (k, thr) => s"WHEN u < $thr THEN $k" }.mkString(" ")
    s"""WITH v AS (
       |  SELECT event_id, CAST(round(value * 1000000) AS BIGINT) AS x
       |  FROM events WHERE event_type = 'purchase'),
       |b AS (SELECT r.range AS bi FROM range($bootResamples) r),
       |w AS (
       |  SELECT bi, x, CASE $cases ELSE ${poissonCdfPpm.last._1} END AS wt
       |  FROM (
       |    SELECT bi, x,
       |      ('0x' || substr(md5('boot:' || CAST(bi AS VARCHAR) || ':'
       |        || CAST(event_id AS VARCHAR)), 1, 5))::BIGINT % 1000000 AS u
       |    FROM v, b)),
       |m AS (
       |  SELECT bi, CAST(sum(wt * x) AS BIGINT) // CAST(sum(wt) AS BIGINT)
       |    AS mean_micro
       |  FROM w GROUP BY bi),
       |r AS (
       |  SELECT mean_micro, row_number() OVER (ORDER BY mean_micro) AS rn
       |  FROM m),
       |p AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) // count(*) AS point_mean_micro
       |  FROM v)
       |SELECT p.n, p.point_mean_micro,
       |  (SELECT mean_micro FROM r WHERE rn = 2) AS ci_lo_micro,
       |  (SELECT mean_micro FROM r WHERE rn = ${bootResamples - 1})
       |    AS ci_hi_micro
       |FROM p""".stripMargin
  }

  // ---------------------------------------------------------------- q207
  /** A/B experiment readout with χ² significance in EXACT integers:
    * per-user success (any purchase above [[abSuccessValue]]) split
    * by the parity arm, per-arm rates in ppm, signed lift, and a
    * significance verdict from the 2×2 χ² test — evaluated as the
    * cross-multiplied comparison 25·N·(ad−bc)² > 96·∏margins
    * (χ² > 3.84 = 96∕25, the 5% critical value) so no float χ² is
    * ever formed and the verdict is hash-stable. The parity split is
    * a true null (no real treatment), so the expected verdict is
    * NOT significant — which is exactly what an A/A-test readout
    * should say; the spec plants a real effect and sees the verdict
    * flip. Two map-side-combining aggregates (per-user, then 2×2);
    * integer headroom to ~10⁶ users per arm at this formulation
    * (wider deployments rescale the comparison). */
  val abSuccessValue = 99.5

  def q207AbReadout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    abReadoutOf(Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" &&
        $"value" > abSuccessValue, 1L).otherwise(0L)).as("success"))
      .select(($"user_id" % 2).as("arm"), $"success"))
  }

  /** The readout on any (arm 0/1, success 0/1) frame — separated so
    * the spec can plant a genuine treatment effect. */
  private[ops] def abReadoutOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    users
      .agg(
        sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 0L, $"success").otherwise(0L)).as("s_a"),
        sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when($"arm" === 1L, $"success").otherwise(0L)).as("s_b"))
      .select($"n_a", $"s_a", $"n_b", $"s_b",
        expr("(1000000 * s_a) div n_a").as("rate_a_ppm"),
        expr("(1000000 * s_b) div n_b").as("rate_b_ppm"),
        (expr("(1000000 * s_b) div n_b") - expr("(1000000 * s_a) div n_a"))
          .as("lift_ppm"),
        expr("""25 * (n_a + n_b)
          |  * (s_a * (n_b - s_b) - s_b * (n_a - s_a))
          |  * (s_a * (n_b - s_b) - s_b * (n_a - s_a))
          |  > 96 * n_a * n_b * (s_a + s_b)
          |      * ((n_a - s_a) + (n_b - s_b))""".stripMargin)
          .as("significant"))
  }

  private val q207Oracle =
    s"""WITH u AS (
       |  SELECT user_id % 2 AS arm,
       |    max(CASE WHEN event_type = 'purchase' AND value > $abSuccessValue
       |      THEN 1 ELSE 0 END) AS success
       |  FROM events GROUP BY user_id),
       |c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 0 THEN success ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 1 THEN success ELSE 0 END) AS BIGINT) AS s_b
       |  FROM u)
       |SELECT n_a, s_a, n_b, s_b,
       |  CAST((1000000 * s_a) // n_a AS BIGINT) AS rate_a_ppm,
       |  CAST((1000000 * s_b) // n_b AS BIGINT) AS rate_b_ppm,
       |  CAST((1000000 * s_b) // n_b - (1000000 * s_a) // n_a AS BIGINT)
       |    AS lift_ppm,
       |  25 * (n_a + n_b)
       |    * (s_a * (n_b - s_b) - s_b * (n_a - s_a))
       |    * (s_a * (n_b - s_b) - s_b * (n_a - s_a))
       |  > 96 * n_a * n_b * (s_a + s_b) * ((n_a - s_a) + (n_b - s_b))
       |    AS significant
       |FROM c""".stripMargin

  // ---------------------------------------------------------------- q208
  /** Censoring horizon (hours after signup) for q208. */
  val survivalHorizonH = 72L

  /** Kaplan–Meier survival curve for time-to-first-purchase after
    * signup, right-censored at [[survivalHorizonH]] hours — the
    * conversion-latency analysis that a plain "72-hour conversion
    * rate" (q204's style) flattens: KM shows WHEN conversions
    * happen and handles users the observation window cut off
    * without biasing the curve (dropping censored users overstates
    * early conversion; counting them as failures understates it).
    *
    * The product-limit estimator Π(1 − dᵢ/nᵢ) is a float product —
    * order-dependent and not hash-stable — so the curve is kept in
    * LOG space: per-step `floor((ln(n−d) − ln(n))·10⁶)` micro-nats
    * (q125's ln discipline; exact integer inputs, one fixed-form ln
    * each) and the cumulative curve is an integer running sum. A
    * consumer exponentiates for display; monotonicity and
    * cross-engine equality live in the integers. One pass to
    * per-user labels, risk-set arithmetic on the hour grid. */
  def q208SurvivalCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val su = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("s"))
    val fp = ev.where($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p"))
      .join(su, "user_id").where($"p" >= $"s")
      .groupBy($"user_id").agg(min($"p").as("p"))
    val lab = su.join(fp, Seq("user_id"), "left")
      .select($"user_id",
        expr(s"""CASE WHEN p IS NOT NULL
          |  AND (p - s) div 3600000000 <= $survivalHorizonH
          |  THEN (p - s) div 3600000000 ELSE ${survivalHorizonH}L END""".stripMargin)
          .as("t_h"),
        expr(s"""CASE WHEN p IS NOT NULL
          |  AND (p - s) div 3600000000 <= $survivalHorizonH
          |  THEN 1L ELSE 0L END""".stripMargin).as("ev"))
    val total = lab.agg(count(lit(1)).as("total"))
    val grid = lab.groupBy($"t_h")
      .agg(count(lit(1)).as("n_leave"), sum($"ev").as("n_events"))
    val wPrev = Window.orderBy($"t_h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy($"t_h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(total))
      .withColumn("at_risk",
        $"total" - coalesce(sum($"n_leave").over(wPrev), lit(0L)))
      .withColumn("log_step",
        when($"n_events" === 0L, 0L)
          .when($"at_risk" > $"n_events",
            expr("""CAST(floor((ln(CAST(at_risk - n_events AS DOUBLE))
              |  - ln(CAST(at_risk AS DOUBLE))) * 1000000.0) AS BIGINT)"""
              .stripMargin)))
      .withColumn("cum_log_surv_micro", sum($"log_step").over(wCum))
      .select($"t_h", $"at_risk", $"n_events",
        ($"n_leave" - $"n_events").as("n_censored"), $"cum_log_surv_micro")
      .orderBy($"t_h")
  }

  private val q208Oracle =
    s"""WITH su AS (
       |  SELECT user_id, min(epoch_us(ts)) AS s FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |fp AS (
       |  SELECT e.user_id, min(epoch_us(ts)) AS p
       |  FROM events e JOIN su USING (user_id)
       |  WHERE event_type = 'purchase' AND epoch_us(ts) >= su.s GROUP BY 1),
       |lab AS (
       |  SELECT su.user_id,
       |    CASE WHEN fp.p IS NOT NULL
       |      AND (fp.p - su.s) // 3600000000 <= $survivalHorizonH
       |      THEN (fp.p - su.s) // 3600000000 ELSE $survivalHorizonH END AS t_h,
       |    CASE WHEN fp.p IS NOT NULL
       |      AND (fp.p - su.s) // 3600000000 <= $survivalHorizonH
       |      THEN 1 ELSE 0 END AS ev
       |  FROM su LEFT JOIN fp ON su.user_id = fp.user_id),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM lab),
       |grid AS (
       |  SELECT t_h, CAST(count(*) AS BIGINT) AS n_leave,
       |    CAST(sum(ev) AS BIGINT) AS n_events
       |  FROM lab GROUP BY 1),
       |km AS (
       |  SELECT t_h, n_leave, n_events,
       |    total - COALESCE(CAST(sum(n_leave) OVER (ORDER BY t_h
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      AS at_risk
       |  FROM grid, t),
       |lg AS (
       |  SELECT t_h, at_risk, n_events, n_leave,
       |    CASE WHEN n_events = 0 THEN 0
       |      WHEN at_risk > n_events THEN
       |        CAST(floor((ln(CAST(at_risk - n_events AS DOUBLE))
       |          - ln(CAST(at_risk AS DOUBLE))) * 1000000.0) AS BIGINT)
       |      ELSE NULL END AS log_step
       |  FROM km)
       |SELECT CAST(t_h AS BIGINT) AS t_h, at_risk, n_events,
       |  n_leave - n_events AS n_censored,
       |  CAST(sum(log_step) OVER (ORDER BY t_h ROWS UNBOUNDED PRECEDING)
       |    AS BIGINT) AS cum_log_surv_micro
       |FROM lg ORDER BY t_h""".stripMargin

  // ---------------------------------------------------------------- q209
  /** Inter-purchase cadence quantiles: the p25/p50/p75/p90 of gaps
    * between a user's consecutive purchases, pooled across users —
    * the repeat-purchase rhythm behind replenishment reminders and
    * churn-risk windows ("a user 2× past their p75 gap is lapsing").
    * Exact DISCRETE order statistics, no interpolation: the k-th
    * quantile is the smallest gap whose rank satisfies the integer
    * cross-inequality (4·rank ≥ n for p25, etc.) — q175's
    * first-crossing device on ranks instead of cumulative volume,
    * engine-identical because both sides pick an actual data value
    * under a total order. Per-user gaps via one lag window; the
    * pooled ranking sorts GAPS (one per purchase, far fewer than
    * events). */
  def q209PurchaseGaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val gaps = Tables.events(s, dir)
      .where($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id")
      .withColumn("gap", $"tus" - lag($"tus", 1).over(wu))
      .where($"gap".isNotNull)
      .select($"gap")
    gaps
      .withColumn("rn", row_number().over(Window.orderBy($"gap")).cast("long"))
      .crossJoin(broadcast(gaps.agg(count(lit(1)).as("n"))))
      .agg(
        max($"n").as("n_gaps"),
        min(when(lit(4) * $"rn" >= $"n", $"gap")).as("p25_us"),
        min(when(lit(2) * $"rn" >= $"n", $"gap")).as("p50_us"),
        min(when(lit(4) * $"rn" >= lit(3) * $"n", $"gap")).as("p75_us"),
        min(when(lit(10) * $"rn" >= lit(9) * $"n", $"gap")).as("p90_us"))
  }

  private val q209Oracle =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events
      |  WHERE event_type = 'purchase'),
      |g AS (
      |  SELECT tus - lag(tus) OVER (PARTITION BY user_id
      |    ORDER BY tus, event_id) AS gap
      |  FROM p),
      |gg AS (SELECT gap FROM g WHERE gap IS NOT NULL),
      |r AS (
      |  SELECT gap, CAST(row_number() OVER (ORDER BY gap) AS BIGINT) AS rn
      |  FROM gg),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gg)
      |SELECT max(n.n) AS n_gaps,
      |  min(CASE WHEN 4 * rn >= n THEN gap END) AS p25_us,
      |  min(CASE WHEN 2 * rn >= n THEN gap END) AS p50_us,
      |  min(CASE WHEN 4 * rn >= 3 * n THEN gap END) AS p75_us,
      |  min(CASE WHEN 10 * rn >= 9 * n THEN gap END) AS p90_us
      |FROM r, n""".stripMargin

  // ---------------------------------------------------------------- q217
  /** EWMA numerator (of 64): smoothing weight α = 13/64 ≈ 0.2. */
  val ewmaNum = 13L
  /** Band half-width in EW mean-absolute-deviations. */
  val ewmaBandK = 3L
  /** Points before the band arms (EW stats need burn-in). */
  val ewmaWarmup = 8

  /** EWMA control chart over the per-type daily event counts — the
    * third sequential monitor in the family: q134's MAD flags single
    * outliers against a STATIC robust center, q163's CUSUM
    * accumulates small persistent drift, and this tracks a MOVING
    * level so a series with a legitimate trend doesn't alarm forever
    * (CUSUM's fixed baseline does). Each day is tested against the
    * PREVIOUS day's smoothed state — `|x−s| > k·d` with s, d frozen
    * before the point folds in — so a spike can't widen its own band
    * and mask itself.
    *
    * Exact integer fixed point end-to-end: counts scale to ppm, the
    * recurrences `s ← (13x + 51s) div 64`, `d ← (13|x−s| + 51d) div
    * 64` stay in BIGINT (headroom: daily counts to ~7·10¹¹ before
    * 13·x·10⁶ nears 2⁶³; a bigger deployment drops the ppm scale),
    * and both engines truncate identically (operands never negative,
    * so floor = trunc). The recurrence depends on its own previous
    * value — no window frame expresses that — so it folds in-group
    * (q163's device) over the calendar-bounded daily series; the raw
    * stream reduces to one row per (type, day) in a map-side-
    * combining agg first. Oracle steps the same recurrence as a
    * RECURSIVE CTE partitioned by event_type. */
  def q217EwmaBand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ewmaOf(Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  /** The chart on any (event_type, day, n) daily frame — separated so
    * the spec can plant a constant series (band never arms a false
    * alarm, s tracks x exactly) and a level shift (alarm exactly at
    * the shift day). */
  private[ops] def ewmaOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    daily
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"day", $"n"))).as("ds"))
      .select($"event_type", explode(expr(
        s"""aggregate(ds,
           |  struct(
           |    CAST(array() AS ARRAY<STRUCT<day DATE, n BIGINT,
           |      ewma_ppm BIGINT, ewmd_ppm BIGINT, oob BOOLEAN>>) AS out,
           |    0L AS sp, 0L AS dp, 0 AS t),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(struct(
           |      e.day AS day, e.n AS n,
           |      CASE WHEN acc.t = 0 THEN e.n * 1000000L
           |           ELSE ($ewmaNum * e.n * 1000000L
           |                 + ${64 - ewmaNum} * acc.sp) div 64 END AS ewma_ppm,
           |      CASE WHEN acc.t = 0 THEN 0L
           |           ELSE ($ewmaNum * abs(e.n * 1000000L - acc.sp)
           |                 + ${64 - ewmaNum} * acc.dp) div 64 END AS ewmd_ppm,
           |      acc.t >= $ewmaWarmup AND
           |        abs(e.n * 1000000L - acc.sp) > $ewmaBandK * acc.dp AS oob))) AS out,
           |    CASE WHEN acc.t = 0 THEN e.n * 1000000L
           |         ELSE ($ewmaNum * e.n * 1000000L
           |               + ${64 - ewmaNum} * acc.sp) div 64 END AS sp,
           |    CASE WHEN acc.t = 0 THEN 0L
           |         ELSE ($ewmaNum * abs(e.n * 1000000L - acc.sp)
           |               + ${64 - ewmaNum} * acc.dp) div 64 END AS dp,
           |    acc.t + 1 AS t),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select($"event_type", $"r.day", $"r.n",
        $"r.ewma_ppm", $"r.ewmd_ppm", $"r.oob")
      .orderBy($"event_type", $"day")
  }

  private val q217Oracle =
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, day, n,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |  FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |          CAST(count(*) AS BIGINT) AS n
       |        FROM events GROUP BY 1, 2)),
       |rec AS (
       |  SELECT event_type, rn, day, n,
       |    CAST(n * 1000000 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d,
       |    FALSE AS oob
       |  FROM daily WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn, d2.day, d2.n,
       |    CAST(($ewmaNum * d2.n * 1000000 + ${64 - ewmaNum} * r.s) // 64
       |      AS BIGINT),
       |    CAST(($ewmaNum * abs(d2.n * 1000000 - r.s)
       |          + ${64 - ewmaNum} * r.d) // 64 AS BIGINT),
       |    d2.rn > $ewmaWarmup AND abs(d2.n * 1000000 - r.s) > $ewmaBandK * r.d
       |  FROM daily d2 JOIN rec r
       |    ON d2.event_type = r.event_type AND d2.rn = r.rn + 1)
       |SELECT event_type, day, n, s AS ewma_ppm, d AS ewmd_ppm, oob
       |FROM rec ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q377
  /** Holt level numerator (of 4): α = 1/4. */
  val holtAlphaNum = 1L
  /** Holt trend numerator (of 8): β = 1/8. */
  val holtBetaNum = 1L

  /** Holt double exponential smoothing (level + trend) over the
    * per-type daily counts — the FORECASTING member of the
    * sequential family: q217's EWMA tracks a moving level but lags a
    * trending series forever (its one-step forecast is flat); Holt
    * carries an explicit trend state so the one-step-ahead forecast
    * l + b extrapolates the slope. Emitted per day: the forecast
    * made YESTERDAY for today (honest out-of-sample, NULL on day 1 —
    * no fabricated baseline, q211's posture), the updated level and
    * trend, and the absolute forecast error — the per-day series
    * q294's MASE denominators summarize.
    *
    * Exact integer fixed point: counts in ppm, recurrences
    * l ← (x + 3·(l+b)) div 4 and b ← ((l′−l) + 7·b) div 8 in BIGINT
    * (α = 1/4, β = 1/8 — power-of-two numerators keep every step a
    * shift-friendly division; trend and level deltas go NEGATIVE, and
    * Spark `div` and DuckDB `//` both truncate toward zero — the
    * q172-verified convention this file leans on). The recurrence
    * reads its own previous state — not window-expressible — so it
    * folds in-group (q163/q217's device) over the calendar-bounded
    * daily series after the stream reduces to (type, day) grain in
    * one map-side-combining agg. Oracle: RECURSIVE CTE stepping the
    * identical recurrence per type. */
  def q377HoltTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    holtOf(Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  /** The smoother on any (event_type, day, n) daily frame — separated
    * so the spec can plant an exact line (trend state converges onto
    * the true slope) and a constant series (trend pinned at 0, error
    * 0 from day 2). */
  private[ops] def holtOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val lvl = s"(e.n * 1000000L + 3 * (acc.lp + acc.bp)) div 4"
    daily
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"day", $"n"))).as("ds"))
      .select($"event_type", explode(expr(
        s"""aggregate(ds,
           |  struct(
           |    CAST(array() AS ARRAY<STRUCT<day DATE, n BIGINT,
           |      fc_ppm BIGINT, level_ppm BIGINT, trend_ppm BIGINT,
           |      abs_err_ppm BIGINT>>) AS out,
           |    0L AS lp, 0L AS bp, 0 AS t),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(struct(
           |      e.day AS day, e.n AS n,
           |      CASE WHEN acc.t = 0 THEN CAST(NULL AS BIGINT)
           |           ELSE acc.lp + acc.bp END AS fc_ppm,
           |      CASE WHEN acc.t = 0 THEN e.n * 1000000L
           |           ELSE $lvl END AS level_ppm,
           |      CASE WHEN acc.t = 0 THEN 0L
           |           ELSE (($lvl) - acc.lp + 7 * acc.bp) div 8 END
           |        AS trend_ppm,
           |      CASE WHEN acc.t = 0 THEN CAST(NULL AS BIGINT)
           |           ELSE abs(e.n * 1000000L - (acc.lp + acc.bp)) END
           |        AS abs_err_ppm))) AS out,
           |    CASE WHEN acc.t = 0 THEN e.n * 1000000L
           |         ELSE $lvl END AS lp,
           |    CASE WHEN acc.t = 0 THEN 0L
           |         ELSE (($lvl) - acc.lp + 7 * acc.bp) div 8 END AS bp,
           |    acc.t + 1 AS t),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select($"event_type", $"r.day", $"r.n", $"r.fc_ppm",
        $"r.level_ppm", $"r.trend_ppm", $"r.abs_err_ppm")
      .orderBy($"event_type", $"day")
  }

  private val q377Oracle =
    s"""WITH RECURSIVE daily AS (
       |  SELECT event_type, day, n,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
       |  FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |          CAST(count(*) AS BIGINT) AS n
       |        FROM events GROUP BY 1, 2)),
       |rec AS (
       |  SELECT event_type, rn, day, n,
       |    CAST(NULL AS BIGINT) AS fc,
       |    CAST(n * 1000000 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
       |    CAST(NULL AS BIGINT) AS err
       |  FROM daily WHERE rn = 1
       |  UNION ALL
       |  SELECT d2.event_type, d2.rn, d2.day, d2.n,
       |    r.l + r.b,
       |    CAST((d2.n * 1000000 + 3 * (r.l + r.b)) // 4 AS BIGINT),
       |    CAST((((d2.n * 1000000 + 3 * (r.l + r.b)) // 4) - r.l + 7 * r.b) // 8
       |      AS BIGINT),
       |    abs(d2.n * 1000000 - (r.l + r.b))
       |  FROM daily d2 JOIN rec r
       |    ON d2.event_type = r.event_type AND d2.rn = r.rn + 1)
       |SELECT event_type, day, n, fc AS fc_ppm, l AS level_ppm,
       |  b AS trend_ppm, err AS abs_err_ppm
       |FROM rec ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q223
  /** LOCF (last-observation-carried-forward) backfill of the hourly
    * per-type value series — the OTHER gap-filling semantics: q99
    * fills missing COUNT slots with zero (correct for counts), but a
    * level-like measure (sensor reading, price, balance) must carry
    * the last seen value forward, tagged honestly as imputed and
    * with its AGE, so downstream consumers can bound staleness
    * instead of mistaking a 5-day-old carry for a fresh reading.
    * Leading slots before a type's first observation stay NULL — no
    * fabricated baseline (q211's posture).
    *
    * `last(v, ignoreNulls)` over the per-type hour window does the
    * carry; `max(when(observed, h))` over the same frame dates the
    * carried value; staleness is exact integer hour arithmetic on
    * hour-aligned stamps. The window input is the q99 spine —
    * calendar × type bounded, not event bounded; raw events reduce
    * in one map-side-combining agg first. Oracle: DuckDB's
    * last_value(... IGNORE NULLS) over the same frame. */
  def q223LocfBackfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(date_trunc("hour", $"ts").as("h"), $"event_type",
        expr("CAST(round(value * 1000000D) AS BIGINT)").as("vq"))
    val agg = ev.groupBy($"h", $"event_type").agg(sum($"vq").as("v"))
    val bounds = ev.agg(min($"h").as("mn"), max($"h").as("mx"))
    val spine = bounds
      .select(explode(sequence($"mn", $"mx", expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(ev.select($"event_type").distinct())
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(agg, Seq("h", "event_type"), "left")
      .withColumn("v_filled", last($"v", ignoreNulls = true).over(w))
      .withColumn("last_seen", max(when($"v".isNotNull, $"h")).over(w))
      .select($"h", $"event_type", $"v_filled".as("vsum_micro"),
        ($"v".isNull && $"v_filled".isNotNull).as("was_filled"),
        expr("""CAST((CAST(h AS LONG) - CAST(last_seen AS LONG)) div 3600
               |  AS BIGINT)""".stripMargin).as("staleness_hours"))
      .orderBy($"h", $"event_type")
  }

  private val q223Oracle =
    """WITH ev AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type,
      |    CAST(round(value * 1000000) AS BIGINT) AS vq
      |  FROM events),
      |agg AS (
      |  SELECT h, event_type, CAST(sum(vq) AS BIGINT) AS v
      |  FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT unnest(generate_series(
      |      (SELECT min(h) FROM ev), (SELECT max(h) FROM ev),
      |      INTERVAL 1 HOUR)) AS h,
      |    t.event_type
      |  FROM (SELECT DISTINCT event_type FROM ev) t),
      |j AS (
      |  SELECT s.h, s.event_type, a.v FROM spine s
      |  LEFT JOIN agg a ON s.h = a.h AND s.event_type = a.event_type),
      |f AS (
      |  SELECT h, event_type, v,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
      |      ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS v_filled,
      |    max(CASE WHEN v IS NOT NULL THEN h END) OVER (
      |      PARTITION BY event_type
      |      ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS last_seen
      |  FROM j)
      |SELECT h, event_type, v_filled AS vsum_micro,
      |  (v IS NULL AND v_filled IS NOT NULL) AS was_filled,
      |  CAST(date_diff('hour', last_seen, h) AS BIGINT) AS staleness_hours
      |FROM f ORDER BY h, event_type""".stripMargin

  // ---------------------------------------------------------------- q230
  /** Merged activity intervals — q197's union MATERIALIZED: where
    * q197 reports per-user coverage totals, this emits the merged
    * interval LIST itself (user, ordinal, start, end, event count),
    * the shape downstream systems consume directly (billing line
    * items, session exports, audit timelines). Same gaps-and-islands
    * device and the same single user-key shuffle; the ordinal is a
    * rank over the per-user ISLAND grain (bounded by islands, not
    * events), and every column is exact integer µs. */
  def q230MergedIntervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("st"),
        (unix_micros($"ts") + activityUs).as("en"))
    val wPrev = Window.partitionBy($"user_id").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy($"user_id").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("brk",
        when($"st" > max($"en").over(wPrev), 1L).otherwise(0L))
      .withColumn("grp", sum($"brk").over(wRun))
      .groupBy($"user_id", $"grp")
      .agg(min($"st").as("start_us"), max($"en").as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("iv_idx", row_number().over(
        Window.partitionBy($"user_id").orderBy($"start_us")).cast("long"))
      .select($"user_id", $"iv_idx", $"start_us", $"end_us", $"n_events")
      .orderBy($"user_id", $"iv_idx")
  }

  private val q230Oracle =
    s"""WITH iv AS (
       |  SELECT user_id, epoch_us(ts) AS st,
       |    epoch_us(ts) + $activityUs AS en
       |  FROM events),
       |o AS (
       |  SELECT *, CASE WHEN st > max(en) OVER (PARTITION BY user_id
       |      ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS brk
       |  FROM iv),
       |g AS (
       |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY st, en
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
       |  FROM o),
       |m AS (
       |  SELECT user_id, grp, min(st) AS start_us, max(en) AS end_us,
       |    CAST(count(*) AS BIGINT) AS n_events
       |  FROM g GROUP BY 1, 2)
       |SELECT user_id,
       |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_us)
       |    AS BIGINT) AS iv_idx,
       |  start_us, end_us, n_events
       |FROM m ORDER BY user_id, iv_idx""".stripMargin

  // ---------------------------------------------------------------- q231
  /** Half-life horizon: weekly halving, zeroed past 20 halvings. */
  val halfLifeDays = 7L

  /** Batch recency-weighted popularity — the "what's hot" ranking
    * with a 7-day half-life, computed as exact integers: weight =
    * 10⁶ >> (age_days div 7) (power-of-two halving buckets — the
    * fixed-point stand-in for 2^(−age/7), deterministic in both
    * engines), zeroed beyond 20 halvings so the shift never wraps
    * (Java's `>>` masks the shift count at 64 — an unguarded
    * 140-day-old event would weigh FULL again; the guard is the
    * correctness point, and the spec plants it). q158 maintains the
    * decayed score INCREMENTALLY in a stream; this is the one-scan
    * batch equivalent a nightly job runs. Age anchors to the
    * dataset's own max event time (no wall clock — reproducible).
    * One projection + one 5-row agg; share/rank windows run on the
    * type-grain result. */
  def q231DecayedPopularity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select($"event_type", unix_micros($"ts").as("tus"))
    val asOf = ev.agg(max($"tus").as("as_of"))
    val scored = ev.crossJoin(broadcast(asOf))
      .select($"event_type",
        expr(s"(as_of - tus) div ${86400L * 1000000L} div $halfLifeDays")
          .as("k"))
      .select($"event_type",
        expr("CASE WHEN k >= 20 THEN 0L ELSE shiftright(1000000L, CAST(k AS INT)) END")
          .as("w"))
    val w = Window.partitionBy()
    scored
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"w").as("score"))
      .withColumn("share_ppm",
        expr("(1000000 * score) div sum(score) OVER ()"))
      .withColumn("rnk", row_number().over(
        w.orderBy($"score".desc, $"event_type")).cast("long"))
      .select($"event_type", $"n_events", $"score", $"share_ppm", $"rnk")
      .orderBy($"rnk")
  }

  private val q231Oracle =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    (((SELECT max(epoch_us(ts)) FROM events) - epoch_us(ts))
       |      // ${86400L * 1000000L}) // $halfLifeDays AS k
       |  FROM events),
       |sc AS (
       |  SELECT event_type,
       |    CASE WHEN k >= 20 THEN 0
       |         ELSE 1000000 >> CAST(k AS INTEGER) END AS w
       |  FROM ev),
       |g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |    CAST(sum(w) AS BIGINT) AS score
       |  FROM sc GROUP BY 1)
       |SELECT event_type, n_events, score,
       |  CAST((1000000 * score) // (sum(score) OVER ()) AS BIGINT)
       |    AS share_ppm,
       |  CAST(row_number() OVER (ORDER BY score DESC, event_type)
       |    AS BIGINT) AS rnk
       |FROM g ORDER BY rnk""".stripMargin

  // ---------------------------------------------------------------- q232
  /** Completeness gate — the "data downtime" check run before
    * trusting a day's data: per (event_type, day), the arrived row
    * count against the MEDIAN of the trailing 7 OBSERVED days
    * (robust to one bad day in the baseline, unlike a mean — and a
    * fully-missing day shortens the frame rather than polluting the
    * median with a zero) with a ppm ratio and a
    * first-match status band; the first 7 days report 'no_baseline'
    * honestly instead of comparing against a fabricated one (q211's
    * posture). q152 measures arrival LATENCY; this measures arrival
    * VOLUME — the two halves of an ingestion SLA.
    *
    * The exact 7-value median is element 4 of the sorted trailing
    * frame (collect_list over rows −7..−1 — a constant-size frame,
    * not a growing state), computed identically in DuckDB via
    * list() OVER. Series grain is calendar × type bounded; the raw
    * stream reduces in one map-side-combining agg first. */
  def q232CompletenessGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-7, -1)
    daily
      .withColumn("trail", sort_array(collect_list($"n").over(w)))
      .withColumn("med",
        when(size($"trail") === 7, element_at($"trail", 4)))
      .select($"event_type", $"day", $"n", $"med",
        when($"med".isNotNull, expr("(1000000 * n) div med"))
          .as("ratio_ppm"))
      .withColumn("status",
        when($"med".isNull, "no_baseline")
          .when($"ratio_ppm" < 700000L, "alert")
          .when($"ratio_ppm" < 900000L, "warn")
          .otherwise("ok"))
      .orderBy($"event_type", $"day")
  }

  private val q232Oracle =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, day, n,
      |    list_sort(list(n) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS trail
      |  FROM daily),
      |m AS (
      |  SELECT event_type, day, n,
      |    CASE WHEN len(trail) = 7 THEN trail[4] END AS med
      |  FROM t),
      |r AS (
      |  SELECT event_type, day, n, med,
      |    CASE WHEN med IS NOT NULL
      |      THEN CAST((1000000 * n) // med AS BIGINT) END AS ratio_ppm
      |  FROM m)
      |SELECT event_type, day, n, med, ratio_ppm,
      |  CASE WHEN med IS NULL THEN 'no_baseline'
      |       WHEN ratio_ppm < 700000 THEN 'alert'
      |       WHEN ratio_ppm < 900000 THEN 'warn'
      |       ELSE 'ok' END AS status
      |FROM r ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------- q233
  /** Burst gap: same user+type events closer than this collapse. */
  val burstGapUs = 5L * 1000000

  /** Telemetry burst collapse — near-duplicate EVENT suppression:
    * instrumentation double-fires (retries, double-clicks, SDK
    * re-sends with fresh ids) defeat q33's exact-id dedup because
    * every duplicate has a NEW event id; the telemetry-cleaning
    * convention collapses each burst of same-(user, type) events
    * with inter-event gaps under 5 s to its FIRST event. Same
    * gaps-and-islands shape as q197 but on point gaps (lag, not
    * running-max — bursts chain transitively by consecutive gaps).
    * Output is the per-type accounting a pipeline owner reads
    * (kept/collapsed/ppm); one shuffle on the (user, type) key. */
  def q233BurstCollapse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    burstCollapseOf(Tables.events(s, dir)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("tus")))
  }

  /** The collapse on any (user_id, event_type, event_id, tus) frame —
    * separated so the spec can plant chained bursts (transitivity:
    * 3 events 4 s apart are ONE burst though first↔last is 8 s). */
  private[ops] def burstCollapseOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"tus", $"event_id")
    val marked = ev
      .withColumn("gap", $"tus" - lag($"tus", 1).over(wk))
      .withColumn("first_of_burst",
        ($"gap".isNull || $"gap" >= burstGapUs).cast("long"))
    marked
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_raw"),
        sum($"first_of_burst").as("n_kept"))
      .select($"event_type", $"n_raw", $"n_kept",
        ($"n_raw" - $"n_kept").as("n_collapsed"),
        expr("(1000000 * (n_raw - n_kept)) div n_raw").as("collapse_ppm"))
      .orderBy($"event_type")
  }

  private val q233Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus
       |  FROM events),
       |g AS (
       |  SELECT event_type,
       |    tus - lag(tus) OVER (PARTITION BY user_id, event_type
       |      ORDER BY tus, event_id) AS gap
       |  FROM ev),
       |k AS (
       |  SELECT event_type,
       |    CASE WHEN gap IS NULL OR gap >= $burstGapUs THEN 1 ELSE 0 END
       |      AS first_of_burst
       |  FROM g)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw,
       |  CAST(sum(first_of_burst) AS BIGINT) AS n_kept,
       |  CAST(count(*) - sum(first_of_burst) AS BIGINT) AS n_collapsed,
       |  CAST((1000000 * (count(*) - sum(first_of_burst))) // count(*)
       |    AS BIGINT) AS collapse_ppm
       |FROM k GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q234
  /** Unordered checklist completion — the SET-based funnel: a user
    * "completes" a day when they perform ALL of view, click, and
    * purchase in that day, in ANY order (q102's staged funnel
    * requires the order; activation checklists — "did the trial user
    * try all three features?" — don't care). Per (user, day) the
    * event types fold into a 3-bit mask with bit_or (one map-side-
    * combining agg — the mask is the whole per-user state, 3 bits,
    * vs collecting type sets), then a day-grain rollup counts
    * completers. Exact integers; mask semantics mirrored verbatim. */
  def q234ChecklistCompletion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(to_date($"ts").as("day"), $"user_id",
        when($"event_type" === "view", 1L)
          .when($"event_type" === "click", 2L)
          .when($"event_type" === "purchase", 4L).otherwise(0L).as("bit"))
      .groupBy($"day", $"user_id")
      .agg(expr("bit_or(bit)").as("mask"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_active_users"),
        sum(when($"mask" === 7L, 1L).otherwise(0L)).as("n_completed"))
      .select($"day", $"n_active_users", $"n_completed",
        expr("(1000000 * n_completed) div n_active_users")
          .as("completion_ppm"))
      .orderBy($"day")
  }

  private val q234Oracle =
    """WITH b AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |      WHEN 'purchase' THEN 4 ELSE 0 END AS bit
      |  FROM events),
      |m AS (
      |  SELECT day, user_id, bit_or(bit) AS mask
      |  FROM b GROUP BY 1, 2)
      |SELECT day, CAST(count(*) AS BIGINT) AS n_active_users,
      |  CAST(sum(CASE WHEN mask = 7 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_completed,
      |  CAST((1000000 * sum(CASE WHEN mask = 7 THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS completion_ppm
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q236
  /** Attribution model comparison — first-touch vs last-touch credit
    * side by side per channel (view / click / signup; purchases with
    * no 7-day touch report as 'organic'): the position-bias table
    * that settles "does our last-touch report overpay the closing
    * channel?" q117 IS last-touch and q178 spreads linearly; this
    * runs both endpoint models in ONE user-partitioned pass and
    * diffs them. First/last pick by min/max over an (instant,
    * event_id, channel) struct in a RANGE [−7 d, 0] frame — q117's
    * same-instant tie rule inherited, event_id completing the total
    * order — and nulls (non-touch rows) fall out of min/max in both
    * engines. The final fan-out is a 2-element explode at PURCHASE
    * grain, then a channel-sized agg. One shuffle on user_id. */
  def q236AttributionCompare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where($"event_type".isin("view", "click", "signup", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type")
    val wR = Window.partitionBy($"user_id").orderBy($"tus")
      .rangeBetween(-attributionWindowUs, 0)
    val touch = when($"event_type" =!= "purchase",
      struct($"tus", $"event_id", $"event_type".as("ch")))
    ev
      .withColumn("ft", min(touch).over(wR))
      .withColumn("lt", max(touch).over(wR))
      .where($"event_type" === "purchase")
      .select(explode(array(
        struct(lit("first").as("model"),
          coalesce($"ft.ch", lit("organic")).as("channel")),
        struct(lit("last").as("model"),
          coalesce($"lt.ch", lit("organic")).as("channel")))).as("mc"))
      .groupBy($"mc.channel".as("channel"))
      .agg(sum(when($"mc.model" === "first", 1L).otherwise(0L))
        .as("first_touch_convs"),
        sum(when($"mc.model" === "last", 1L).otherwise(0L))
          .as("last_touch_convs"))
      .withColumn("last_minus_first",
        $"last_touch_convs" - $"first_touch_convs")
      .orderBy($"channel")
  }

  private val q236Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events
       |  WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
       |w AS (
       |  SELECT *,
       |    min(CASE WHEN event_type <> 'purchase'
       |      THEN struct_pack(tus := tus, event_id := event_id,
       |        ch := event_type) END)
       |      OVER (PARTITION BY user_id ORDER BY tus
       |        RANGE BETWEEN $attributionWindowUs PRECEDING AND CURRENT ROW)
       |      AS ft,
       |    max(CASE WHEN event_type <> 'purchase'
       |      THEN struct_pack(tus := tus, event_id := event_id,
       |        ch := event_type) END)
       |      OVER (PARTITION BY user_id ORDER BY tus
       |        RANGE BETWEEN $attributionWindowUs PRECEDING AND CURRENT ROW)
       |      AS lt
       |  FROM ev),
       |p AS (
       |  SELECT COALESCE(ft.ch, 'organic') AS fch,
       |    COALESCE(lt.ch, 'organic') AS lch
       |  FROM w WHERE event_type = 'purchase'),
       |u AS (
       |  SELECT fch AS channel, 1 AS f, 0 AS l FROM p
       |  UNION ALL
       |  SELECT lch AS channel, 0 AS f, 1 AS l FROM p)
       |SELECT channel, CAST(sum(f) AS BIGINT) AS first_touch_convs,
       |  CAST(sum(l) AS BIGINT) AS last_touch_convs,
       |  CAST(sum(l) - sum(f) AS BIGINT) AS last_minus_first
       |FROM u GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q237
  /** Daily value-percentile bands — the observability chart every
    * latency/amount dashboard is built on: per day, the exact
    * discrete p10/p50/p90/p99 of event value (micro-units), by the
    * q209 first-crossing rank device with per-DAY ranking windows
    * (each day's rank partition is day-bounded; the q212 per-slice
    * shape). q19/q43 summarize the whole corpus; a band chart needs
    * the time axis. All integers; min/max ride along free. */
  def q237DailyPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"day")
    Tables.events(s, dir)
      .select(to_date($"ts").as("day"),
        expr("CAST(round(value * 1000000D) AS BIGINT)").as("v"))
      .withColumn("rn", row_number().over(w.orderBy($"v")).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy($"day")
      .agg(max($"n").as("n"),
        min(when(lit(10) * $"rn" >= $"n", $"v")).as("p10_micro"),
        min(when(lit(2) * $"rn" >= $"n", $"v")).as("p50_micro"),
        min(when(lit(10) * $"rn" >= lit(9) * $"n", $"v")).as("p90_micro"),
        min(when(lit(100) * $"rn" >= lit(99) * $"n", $"v")).as("p99_micro"))
      .orderBy($"day")
  }

  private val q237Oracle =
    """WITH v AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(round(value * 1000000) AS BIGINT) AS v
      |  FROM events),
      |r AS (
      |  SELECT day, v,
      |    CAST(row_number() OVER (PARTITION BY day ORDER BY v) AS BIGINT)
      |      AS rn,
      |    CAST(count(*) OVER (PARTITION BY day) AS BIGINT) AS n
      |  FROM v)
      |SELECT day, max(n) AS n,
      |  min(CASE WHEN 10 * rn >= n THEN v END) AS p10_micro,
      |  min(CASE WHEN 2 * rn >= n THEN v END) AS p50_micro,
      |  min(CASE WHEN 10 * rn >= 9 * n THEN v END) AS p90_micro,
      |  min(CASE WHEN 100 * rn >= 99 * n THEN v END) AS p99_micro
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q238
  /** New-vs-returning decomposition of daily actives — the first
    * split any DAU chart gets: per day, how many active users are
    * seen for the FIRST time vs returning (q103 follows one cohort
    * forward; this labels every day's actives by cohort membership
    * in place). Per-user first day is one map-side-combining agg on
    * the user grain; the (day, user) activity grid joins against it
    * on user_id — one shuffle each side — and rolls up to the
    * calendar-bounded day grain. new + returning = active by
    * construction; the spec asserts the telescoping invariant
    * Σ new = total distinct users. */
  def q238NewVsReturning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val act = Tables.events(s, dir)
      .select(to_date($"ts").as("day"), $"user_id").distinct()
    val first = act.groupBy($"user_id").agg(min($"day").as("first_day"))
    act.join(first, "user_id")
      .groupBy($"day")
      .agg(count(lit(1)).as("n_active"),
        sum(when($"day" === $"first_day", 1L).otherwise(0L)).as("n_new"))
      .select($"day", $"n_active", $"n_new",
        ($"n_active" - $"n_new").as("n_returning"),
        expr("(1000000 * n_new) div n_active").as("new_share_ppm"))
      .orderBy($"day")
  }

  private val q238Oracle =
    """WITH act AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      |  FROM events),
      |f AS (
      |  SELECT user_id, min(day) AS first_day FROM act GROUP BY 1)
      |SELECT a.day, CAST(count(*) AS BIGINT) AS n_active,
      |  CAST(sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(count(*) - sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_returning,
      |  CAST((1000000 * sum(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS new_share_ppm
      |FROM act a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q244
  /** Time-weighted average (TWAP) per event type — the CORRECT mean
    * for an irregularly-sampled level series: each observation
    * holds until the next one, so it weighs by its holding DURATION
    * (a burst of 100 readings in one minute must not dominate a
    * quiet day at the same level — the plain mean lets it; both are
    * emitted so the gap is visible). Durations via one lead window
    * per type; the last observation holds to the global series end.
    * Exact integers: seconds × micro-value per term caps terms at
    * ~10¹¹ (bounded re-grid documented for larger spans — q202's
    * convention), duplicate-instant readings get zero duration by
    * the (tus, event_id) total order, deterministically. */
  def q244Twap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select($"event_type", unix_micros($"ts").as("tus"), $"event_id",
        expr("CAST(round(value * 1000000D) AS BIGINT)").as("v"))
    val horizon = ev.agg(max($"tus").as("hz"))
    val w = Window.partitionBy($"event_type").orderBy($"tus", $"event_id")
    ev.crossJoin(broadcast(horizon))
      .withColumn("dur_s",
        expr("(coalesce(lead(tus, 1) OVER (PARTITION BY event_type " +
          "ORDER BY tus, event_id), hz) - tus) div 1000000"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"dur_s").as("held_s"),
        sum($"dur_s" * $"v").as("wsum"), sum($"v").as("vsum"))
      .select($"event_type", $"n", $"held_s",
        expr("wsum div held_s").as("twap_micro"),
        expr("vsum div n").as("mean_micro"))
      .orderBy($"event_type")
  }

  private val q244Oracle =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS tus, event_id,
      |    CAST(round(value * 1000000) AS BIGINT) AS v
      |  FROM events),
      |d AS (
      |  SELECT event_type, v,
      |    (COALESCE(lead(tus) OVER (PARTITION BY event_type
      |        ORDER BY tus, event_id),
      |      (SELECT max(tus) FROM ev)) - tus) // 1000000 AS dur_s
      |  FROM ev)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(dur_s) AS BIGINT) AS held_s,
      |  CAST(sum(dur_s * v) // sum(dur_s) AS BIGINT) AS twap_micro,
      |  CAST(sum(v) // count(*) AS BIGINT) AS mean_micro
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q248
  /** SCD2 validity audit — the release gate for any versioned
    * dimension: per key, version intervals must CHAIN (each row's
    * valid_to equals the next valid_from — a gap loses history, an
    * overlap double-attributes facts) and exactly ONE version may be
    * open. q142 gates value-level contracts; this gates the TEMPORAL
    * structure q185's as-of joins silently depend on. Run against
    * q138's own build the violation counts must read zero (and do —
    * the audit is how a pipeline PROVES that); the spec drives the
    * separated checker with planted gap/overlap/double-current
    * fixtures to show each counter fires. One key-partitioned lead
    * window + one rollup. */
  def q248Scd2Audit(s: SparkSession, dir: String): DataFrame =
    scd2AuditOf(q138Scd2History(s, dir))

  /** The audit on any (user_id, event_type, valid_from, valid_to,
    * is_current, n_events) history frame. */
  private[ops] def scd2AuditOf(hist: DataFrame): DataFrame = {
    val s = hist.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"valid_from")
    hist
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .select($"user_id", $"valid_to", $"next_from", $"is_current")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("nv"),
        sum(when($"next_from".isNotNull && $"valid_to" < $"next_from", 1L)
          .otherwise(0L)).as("gaps"),
        sum(when($"next_from".isNotNull && $"valid_to" > $"next_from", 1L)
          .otherwise(0L)).as("overlaps"),
        sum($"is_current".cast("long")).as("n_current"))
      .agg(count(lit(1)).as("n_keys"), sum($"nv").as("n_versions"),
        sum($"gaps").as("n_gaps"), sum($"overlaps").as("n_overlaps"),
        sum(when($"n_current" =!= 1L, 1L).otherwise(0L))
          .as("n_keys_bad_current"))
      .withColumn("consistent",
        $"n_gaps" === 0L && $"n_overlaps" === 0L &&
          $"n_keys_bad_current" === 0L)
  }

  // q138's CTE chain flattened to siblings (DuckDB cannot parse a
  // WINDOW-clause query nested as a CTE body), final select as hist0
  private val q248Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
       |chg AS (
       |  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
       |    THEN 1 ELSE 0 END AS brk
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
       |runs AS (
       |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
       |  FROM chg),
       |hist AS (
       |  SELECT user_id, run, min(event_type) AS event_type,
       |    min(tus) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
       |  FROM runs GROUP BY 1, 2),
       |hist0 AS (
       |  SELECT user_id, valid_from,
       |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run)
       |      AS valid_to,
       |    CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
       |      ORDER BY valid_from, run) IS NULL THEN 1 ELSE 0 END AS is_current
       |  FROM hist),
       |nx AS (
       |  SELECT user_id, valid_to, is_current,
       |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
       |      AS next_from
       |  FROM hist0),
       |per_key AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS nv,
       |    CAST(sum(CASE WHEN next_from IS NOT NULL AND valid_to < next_from
       |      THEN 1 ELSE 0 END) AS BIGINT) AS gaps,
       |    CAST(sum(CASE WHEN next_from IS NOT NULL AND valid_to > next_from
       |      THEN 1 ELSE 0 END) AS BIGINT) AS ovl,
       |    CAST(sum(is_current) AS BIGINT) AS n_current
       |  FROM nx GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(sum(nv) AS BIGINT) AS n_versions,
       |  CAST(sum(gaps) AS BIGINT) AS n_gaps,
       |  CAST(sum(ovl) AS BIGINT) AS n_overlaps,
       |  CAST(sum(CASE WHEN n_current <> 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_keys_bad_current,
       |  CASE WHEN sum(gaps) = 0 AND sum(ovl) = 0
       |    AND sum(CASE WHEN n_current <> 1 THEN 1 ELSE 0 END) = 0
       |    THEN TRUE ELSE FALSE END AS consistent
       |FROM per_key""".stripMargin

  // ---------------------------------------------------------------- q249
  /** Conditional entropy of the behavior Markov chain — how
    * PREDICTABLE is the next event given the current one: per prior
    * state, H(next|prev) over q141's transition counts in exact
    * integer micro-nats (q222's per-group formula: L(n) −
    * Σc·L(c) div n, fixed-form floored ln), plus each state's share
    * of transitions. A near-zero row means that state's successor is
    * nearly deterministic (funnel-like); the uniform-transition
    * fixture should sit near ln(5)≈1.609e6. Transition counts are
    * TYPE²-bounded — every window and aggregate here runs on a
    * domain-sized frame; the stream contributes q141's one shuffle. */
  def q249EntropyRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = q141TransitionMatrix(s, dir)
      .select($"from_type", $"to_type", $"n")
    t.groupBy($"from_type")
      .agg(sum($"n").as("n_trans"),
        sum($"n" * expr(
          "CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000D) AS BIGINT)"))
          .as("sum_clc"))
      .select($"from_type", $"n_trans",
        (expr("CAST(floor(ln(CAST(n_trans AS DOUBLE)) * 1000000D) AS BIGINT)")
          - expr("sum_clc div n_trans")).as("h_micro"))
      .withColumn("share_ppm",
        expr("(1000000 * n_trans) div sum(n_trans) OVER ()"))
      .orderBy($"from_type")
  }

  private val q249Oracle =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id,
      |    event_type AS from_type
      |  FROM events),
      |p AS (
      |  SELECT from_type,
      |    lead(from_type) OVER (PARTITION BY user_id ORDER BY tus, event_id)
      |      AS to_type
      |  FROM ev),
      |tc AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |h AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_trans,
      |    CAST(sum(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000)
      |      AS BIGINT)) AS BIGINT) AS sum_clc
      |  FROM tc GROUP BY 1)
      |SELECT from_type, n_trans,
      |  CAST(floor(ln(CAST(n_trans AS DOUBLE)) * 1000000) AS BIGINT)
      |    - sum_clc // n_trans AS h_micro,
      |  CAST((1000000 * n_trans) // (sum(n_trans) OVER ()) AS BIGINT)
      |    AS share_ppm
      |FROM h ORDER BY from_type""".stripMargin

  // ---------------------------------------------------------------- q250
  /** Incident-exposure measure — Σ|activity ∩ incident| per user:
    * how much of each user's active time fell inside error-storm
    * hours (incident hours = hourly error counts at or above their
    * own p90, the self-calibrating threshold). The billing/SLA-credit
    * and blast-radius question, computed as a pure interval
    * intersection: merged activity intervals (q230's islands)
    * explode into the hour cells they touch (5-minute activity spans
    * ≤ 2 cells — bounded fan-out, q139's gridded-join device), join
    * the DOMAIN-bounded incident-hour spine on the hour key, and the
    * per-cell overlap is exact integer µs clamp arithmetic. No
    * interval×interval BNLJ anywhere. */
  def q250IncidentExposure(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600L * 1000000L
    val errHours = Tables.events(s, dir)
      .where($"event_type" === "error")
      .groupBy(expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    val incidents = errHours
      .withColumn("rn", row_number().over(Window.orderBy($"n")).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .withColumn("p90", min(when(lit(10) * $"rn" >= lit(9) * $"cnt", $"n"))
        .over(wAll))
      .where($"n" >= $"p90")
      .select($"h")
    // q230's merged islands, inline
    val iv = Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("st"),
        (unix_micros($"ts") + activityUs).as("en"))
    val wPrev = Window.partitionBy($"user_id").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy($"user_id").orderBy($"st", $"en")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = iv
      .withColumn("brk",
        when($"st" > max($"en").over(wPrev), 1L).otherwise(0L))
      .withColumn("grp", sum($"brk").over(wRun))
      .groupBy($"user_id", $"grp")
      .agg(min($"st").as("ist"), max($"en").as("ien"))
    merged
      .select($"user_id", $"ist", $"ien",
        explode(expr(s"sequence(ist div $hourUs, (ien - 1) div $hourUs)"))
          .as("h"))
      .join(incidents, Seq("h"), "left_semi")
      .select($"user_id", ($"ien" - $"ist").as("len"),
        (least($"ien", ($"h" + 1) * hourUs) -
          greatest($"ist", $"h" * hourUs)).as("ov"))
      .groupBy($"user_id")
      .agg(sum($"ov").as("exposed_us"))
      .join(merged.groupBy($"user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"ien" - $"ist").as("covered_us")), Seq("user_id"), "right")
      .select($"user_id", $"n_intervals", $"covered_us",
        coalesce($"exposed_us", lit(0L)).as("exposed_us"))
      .withColumn("exposed_ppm",
        expr("(1000000 * exposed_us) div covered_us"))
      .orderBy($"user_id")
  }

  private val q250Oracle =
    s"""WITH eh AS (
       |  SELECT epoch_us(ts) // ${3600L * 1000000L} AS h,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events WHERE event_type = 'error' GROUP BY 1),
       |thr AS (
       |  SELECT min(CASE WHEN 10 * rn >= 9 * cnt THEN n END) AS p90 FROM (
       |    SELECT n, CAST(row_number() OVER (ORDER BY n) AS BIGINT) AS rn,
       |      CAST(count(*) OVER () AS BIGINT) AS cnt
       |    FROM eh)),
       |inc AS (SELECT h FROM eh, thr WHERE n >= p90),
       |iv AS (
       |  SELECT user_id, epoch_us(ts) AS st,
       |    epoch_us(ts) + $activityUs AS en
       |  FROM events),
       |o AS (
       |  SELECT *, CASE WHEN st > max(en) OVER (PARTITION BY user_id
       |      ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS brk
       |  FROM iv),
       |g AS (
       |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY st, en
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
       |  FROM o),
       |m AS (
       |  SELECT user_id, grp, min(st) AS ist, max(en) AS ien
       |  FROM g GROUP BY 1, 2),
       |cells AS (
       |  SELECT user_id, ist, ien,
       |    unnest(generate_series(ist // ${3600L * 1000000L},
       |      (ien - 1) // ${3600L * 1000000L})) AS h
       |  FROM m),
       |hit AS (
       |  SELECT c.user_id,
       |    least(c.ien, (c.h + 1) * ${3600L * 1000000L}) -
       |      greatest(c.ist, c.h * ${3600L * 1000000L}) AS ov
       |  FROM cells c JOIN inc USING (h)),
       |ex AS (
       |  SELECT user_id, CAST(sum(ov) AS BIGINT) AS exposed_us
       |  FROM hit GROUP BY 1),
       |cov AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
       |    CAST(sum(ien - ist) AS BIGINT) AS covered_us
       |  FROM m GROUP BY 1)
       |SELECT cov.user_id, cov.n_intervals, cov.covered_us,
       |  CAST(COALESCE(ex.exposed_us, 0) AS BIGINT) AS exposed_us,
       |  CAST((1000000 * COALESCE(ex.exposed_us, 0)) // cov.covered_us
       |    AS BIGINT) AS exposed_ppm
       |FROM cov LEFT JOIN ex USING (user_id)
       |ORDER BY cov.user_id""".stripMargin

  // ---------------------------------------------------------------- q255
  /** Power-iteration steps for the stationary distribution — fixed;
    * a dense 5-state chain mixes in far fewer. */
  val stationaryIters = 8

  /** Stationary distribution of the behavior Markov chain — where a
    * user's session settles in the long run, the one-number-per-state
    * summary that turns q141's transition matrix into capacity /
    * attention weights (q249 says how predictable each state is;
    * this says how much time the chain spends there). π starts
    * uniform and takes [[stationaryIters]] exact fixed-point steps
    * π′ = πT: each step is Σᵢ πᵢ·p_ij in ppm·ppm summed THEN
    * floor-divided once by 10⁶ (≤ 5·10¹² — safely BIGINT), so every
    * iterate is engine-identical. Floored division bleeds ≤ a few
    * ppm of mass per step (reported, spec-bounded); a state with no
    * outgoing transitions would drain (none here — the chain is
    * dense).
    *
    * Scale shape: everything after q141's one stream shuffle runs on
    * TYPE²-bounded frames — 8 joins over 25-row inputs; the corpus
    * is touched exactly once. */
  def q255StationaryDist(s: SparkSession, dir: String): DataFrame =
    stationaryOf(q141TransitionMatrix(s, dir))

  /** The fixed-point iteration on any (from_type, to_type, p_ppm)
    * matrix — separated so the spec can plant chains with
    * closed-form stationary distributions. */
  private[ops] def stationaryOf(matrix: DataFrame): DataFrame = {
    val s = matrix.sparkSession
    import s.implicits._
    val t = matrix.select($"from_type", $"to_type", $"p_ppm")
    val states = t.select($"from_type".as("state")).distinct()
    var pi = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("k"))))
      .select($"state", expr("1000000 div k").as("pi_ppm"))
    for (_ <- 1 to stationaryIters)
      pi = t.join(pi, t("from_type") === pi("state"))
        .groupBy($"to_type")
        .agg(expr("sum(pi_ppm * p_ppm) div 1000000").as("pi_ppm"))
        .select($"to_type".as("state"), $"pi_ppm")
    pi.orderBy($"state")
  }

  private val q255Oracle = {
    val steps = (1 to stationaryIters).map { i =>
      s"""p$i AS (
         |  SELECT t.to_type AS state,
         |    CAST(sum(p.pi_ppm * t.p_ppm) // 1000000 AS BIGINT) AS pi_ppm
         |  FROM t JOIN p${i - 1} p ON t.from_type = p.state GROUP BY 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id,
       |    event_type AS from_type
       |  FROM events),
       |nxt AS (
       |  SELECT *, lead(from_type) OVER (PARTITION BY user_id
       |    ORDER BY tus, event_id) AS to_type
       |  FROM ev),
       |pairs AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (
       |  SELECT from_type, to_type,
       |    (1000000 * n) // CAST(SUM(n) OVER (PARTITION BY from_type)
       |      AS BIGINT) AS p_ppm
       |  FROM pairs),
       |st AS (SELECT DISTINCT from_type AS state FROM t),
       |p0 AS (
       |  SELECT state, CAST(1000000 // (SELECT count(*) FROM st) AS BIGINT)
       |    AS pi_ppm
       |  FROM st),
       |$steps
       |SELECT state, pi_ppm FROM p$stationaryIters ORDER BY state""".stripMargin
  }

  // ---------------------------------------------------------------- q257
  /** Error-budget threshold (ppm of events that may be errors) and
    * the multi-window alert rule's burn factor — interpolated into
    * the oracle so query and SQL can never drift. */
  val burnBudgetPpm = 200000L
  val burnFactor = 2L
  val burnLongHours = 6

  /** Multi-window burn-rate alerting (the SRE-workbook page rule):
    * an hour pages when the SHORT window (that hour) burns error
    * budget at ≥ [[burnFactor]]× AND the LONG trailing
    * [[burnLongHours]]-hour window is also over budget — the
    * combination that suppresses both one-spike flapping (long
    * window gates it) and slow-burn blindness (short window ages
    * out). Rates are exact integer ppm on the DENSE hour spine
    * (q99's gap-fill discipline: an hour with no traffic is rate 0,
    * not a missing row — and row-frames equal time-frames only
    * because the spine is dense).
    *
    * Scale shape: one partial agg of the stream to hour grain, then
    * every window runs on the SPINE (bounded by the time span, not
    * the corpus). The trailing window is ROWS [[burnLongHours]]−1
    * PRECEDING over that spine. */
  def q257BurnRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600L * 1000000L
    val hourly = Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("n_events"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"))
    val spine = hourly
      .agg(min($"h").as("lo"), max($"h").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    val wLong = Window.orderBy($"h")
      .rowsBetween(-(burnLongHours - 1), Window.currentRow)
    spine.join(hourly, Seq("h"), "left")
      .select($"h", coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"n_errors", lit(0L)).as("n_errors"))
      .withColumn("long_events", sum($"n_events").over(wLong))
      .withColumn("long_errors", sum($"n_errors").over(wLong))
      .select($"h", $"n_events", $"n_errors",
        when($"n_events" === 0, 0L)
          .otherwise(expr("(1000000 * n_errors) div n_events")).as("short_ppm"),
        when($"long_events" === 0, 0L)
          .otherwise(expr("(1000000 * long_errors) div long_events"))
          .as("long_ppm"))
      .withColumn("alert",
        $"short_ppm" >= burnFactor * burnBudgetPpm &&
          $"long_ppm" >= burnBudgetPpm)
      .orderBy($"h")
  }

  private val q257Oracle =
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // ${3600L * 1000000L} AS h,
       |    CAST(count(*) AS BIGINT) AS n_events,
       |    CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_errors
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(h), max(h))) AS h FROM hourly),
       |base AS (
       |  SELECT s.h, COALESCE(y.n_events, 0) AS n_events,
       |    COALESCE(y.n_errors, 0) AS n_errors
       |  FROM spine s LEFT JOIN hourly y USING (h)),
       |win AS (
       |  SELECT *,
       |    sum(n_events) OVER (ORDER BY h ROWS BETWEEN ${burnLongHours - 1}
       |      PRECEDING AND CURRENT ROW) AS long_events,
       |    sum(n_errors) OVER (ORDER BY h ROWS BETWEEN ${burnLongHours - 1}
       |      PRECEDING AND CURRENT ROW) AS long_errors
       |  FROM base)
       |SELECT h, n_events, n_errors,
       |  CAST(CASE WHEN n_events = 0 THEN 0
       |    ELSE (1000000 * n_errors) // n_events END AS BIGINT) AS short_ppm,
       |  CAST(CASE WHEN long_events = 0 THEN 0
       |    ELSE (1000000 * long_errors) // long_events END AS BIGINT)
       |    AS long_ppm,
       |  CASE WHEN n_events = 0 THEN 0
       |    ELSE (1000000 * n_errors) // n_events END
       |    >= $burnFactor * $burnBudgetPpm
       |  AND CASE WHEN long_events = 0 THEN 0
       |    ELSE (1000000 * long_errors) // long_events END
       |    >= $burnBudgetPpm AS alert
       |FROM win ORDER BY h""".stripMargin

  // ---------------------------------------------------------------- q258
  /** SPRT hypotheses and Wald boundaries, precomputed to floored
    * micro-nats at compile time and interpolated into the oracle —
    * the two ln-ratio increments are the ONLY transcendentals, and
    * they never touch data. H0: success rate p0 vs H1: p1;
    * α = β = 0.05 ⇒ boundaries ±ln(19). */
  val sprtP0 = 0.2
  val sprtP1 = 0.3
  val sprtL1Micro: Long = // ln(p1/p0) per success
    math.floor(math.log(sprtP1 / sprtP0) * 1e6).toLong
  val sprtL0Micro: Long = // ln((1-p1)/(1-p0)) per failure
    math.floor(math.log((1 - sprtP1) / (1 - sprtP0)) * 1e6).toLong
  val sprtBoundMicro: Long = math.floor(math.log(19.0) * 1e6).toLong

  /** Sequential probability ratio test monitor (Wald) — the
    * peeking-safe experiment readout q207's fixed-horizon chi-square
    * can't give: per DAY, the cumulative log-likelihood ratio of
    * H1 (success rate [[sprtP1]]) against H0 ([[sprtP0]]) over
    * purchase trials (success = value > [[abSuccessValue]], q207's
    * definition), with Wald's ±ln(19) decision boundaries and the
    * day the test first becomes decisive. Every LLR is exact
    * integer micro-nats: trials·constant products of BIGINTs, no
    * transcendental ever evaluated on data.
    *
    * Scale shape: one partial agg of the stream to day grain, then
    * cumulative windows on the DAY spine (bounded by the time span);
    * the first-crossing marker is a spine-grain min — no second
    * corpus pass. */
  def q258SprtMonitor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400L * 1000000L
    val daily = Tables.events(s, dir)
      .where($"event_type" === "purchase")
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(count(lit(1)).as("n_trials"),
        sum(when($"value" > abSuccessValue, 1L).otherwise(0L)).as("n_success"))
    val wCum = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    daily
      .withColumn("cum_llr_micro",
        sum($"n_success" * sprtL1Micro +
          ($"n_trials" - $"n_success") * sprtL0Micro).over(wCum))
      .withColumn("decision",
        when($"cum_llr_micro" >= sprtBoundMicro, "reject_h0")
          .when($"cum_llr_micro" <= -sprtBoundMicro, "accept_h0")
          .otherwise("continue"))
      .withColumn("first_decisive_day",
        min(when($"decision" =!= "continue", $"day")).over(wAll))
      .select($"day", $"n_trials", $"n_success", $"cum_llr_micro",
        $"decision", ($"day" === $"first_decisive_day").as("is_first_cross"))
      .orderBy($"day")
  }

  private val q258Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(count(*) AS BIGINT) AS n_trials,
       |    CAST(count(*) FILTER (value > $abSuccessValue) AS BIGINT)
       |      AS n_success
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |c AS (
       |  SELECT *, CAST(sum(n_success * ($sprtL1Micro)
       |      + (n_trials - n_success) * ($sprtL0Micro))
       |      OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS cum_llr_micro
       |  FROM daily),
       |d AS (
       |  SELECT *, CASE WHEN cum_llr_micro >= $sprtBoundMicro THEN 'reject_h0'
       |    WHEN cum_llr_micro <= -$sprtBoundMicro THEN 'accept_h0'
       |    ELSE 'continue' END AS decision
       |  FROM c)
       |SELECT day, n_trials, n_success, cum_llr_micro, decision,
       |  day = min(CASE WHEN decision <> 'continue' THEN day END) OVER ()
       |    AS is_first_cross
       |FROM d ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q260
  /** Theil–Sen robust trend of daily event volume — the slope
    * estimate one outage or traffic spike can't drag (q135's OLS
    * line moves with every outlier; the MEDIAN of pairwise slopes
    * has a 29% breakdown point). Slopes are exact micro-events/day:
    * (1e6·Δcount) div Δday for every day pair, and the median is the
    * exact lower-median order statistic via the first-crossing rank
    * inequality (q209's device). The intercept is the median of
    * per-day (count·1e6 − slope·day) residual levels, same device.
    *
    * Scale shape: the corpus reduces ONCE to the day spine; the
    * pairwise join is SPINE², bounded by the time span squared
    * (30 days → 435 pairs; never corpus-sized), and both medians
    * rank spine-sized sets. */
  def q260TheilSen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    theilSenOf(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  /** The estimator on any (day, n) frame — separated so the spec can
    * plant a perfect line plus an outlier the median must shrug off. */
  private[ops] def theilSenOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val a = daily.select($"day".as("da"), $"n".as("na"))
    val b = daily.select($"day".as("db"), $"n".as("nb"))
    val slopes = a.join(b, $"da" < $"db")
      .select(expr("(1000000 * (nb - na)) div (db - da)").as("slope"))
    val wS = Window.orderBy($"slope")
    val slopeMed = slopes
      .withColumn("rn", row_number().over(wS).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .where(lit(2) * $"rn" >= $"cnt").orderBy($"slope").limit(1)
      .select($"slope".as("slope_micro"))
    val wL = Window.orderBy($"level")
    daily.crossJoin(broadcast(slopeMed))
      .select($"slope_micro", ($"n" * 1000000L - $"slope_micro" * $"day")
        .as("level"))
      .withColumn("rn", row_number().over(wL).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
      .where(lit(2) * $"rn" >= $"cnt").orderBy($"level").limit(1)
      .select($"slope_micro", $"level".as("intercept_micro"))
  }

  private val q260Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |sl AS (
       |  SELECT (1000000 * (b.n - a.n)) // (b.day - a.day) AS slope
       |  FROM daily a JOIN daily b ON a.day < b.day),
       |sm AS (
       |  SELECT slope AS slope_micro FROM (
       |    SELECT slope, CAST(row_number() OVER (ORDER BY slope) AS BIGINT)
       |      AS rn, CAST(count(*) OVER () AS BIGINT) AS cnt
       |    FROM sl) WHERE 2 * rn >= cnt ORDER BY slope LIMIT 1),
       |lv AS (
       |  SELECT slope_micro, n * 1000000 - slope_micro * day AS level
       |  FROM daily, sm)
       |SELECT slope_micro, level AS intercept_micro FROM (
       |  SELECT *, CAST(row_number() OVER (ORDER BY level) AS BIGINT) AS rn,
       |    CAST(count(*) OVER () AS BIGINT) AS cnt
       |  FROM lv) WHERE 2 * rn >= cnt ORDER BY level LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q261
  /** Earliest funnel-completion SPAN — the MATCH_RECOGNIZE-shaped
    * question q102 (stage reached) can't answer: WHEN did each user
    * first complete view→click→purchase and how long did it take.
    * The greedy fold (first view, first click after it, first
    * purchase after that) finds exactly the earliest completing
    * purchase of the pattern v.*c.*p. Same in-group device as q102 —
    * sort_array + a struct-state aggregate() (codegen'd, no UDF) —
    * with (tv, tc, tp) micro-timestamp state and −1 sentinels, so
    * both engines fold the identical total order (ts, event_id).
    *
    * Scale shape: ONE shuffle on user_id; per-user state is three
    * BIGINTs regardless of stream length. */
  def q261FunnelSpan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    funnelSpanOf(Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
        $"event_type"))
  }

  /** The fold on any (user_id, tus, event_id, event_type) frame —
    * separated so the spec can plant pattern edge cases. */
  private[ops] def funnelSpanOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    ev
      .groupBy($"user_id")
      .agg(sort_array(collect_list(
        struct($"tus", $"event_id", $"event_type"))).as("evs"))
      .select($"user_id",
        expr("""aggregate(evs,
            named_struct('tv', -1L, 'tc', -1L, 'tp', -1L),
            (st, e) -> named_struct(
              'tv', IF(st.tv = -1L AND e.event_type = 'view', e.tus, st.tv),
              'tc', IF(st.tc = -1L AND st.tv <> -1L
                       AND e.event_type = 'click', e.tus, st.tc),
              'tp', IF(st.tp = -1L AND st.tc <> -1L
                       AND e.event_type = 'purchase', e.tus, st.tp)))""")
          .as("st"))
      .select($"user_id", ($"st.tp" =!= -1L).as("completed"),
        $"st.tv".as("tv_us"), $"st.tc".as("tc_us"), $"st.tp".as("tp_us"),
        when($"st.tp" =!= -1L, $"st.tp" - $"st.tv").otherwise(-1L)
          .as("span_us"))
      .orderBy($"user_id")
  }

  private val q261Oracle =
    """WITH u AS (
      |  SELECT user_id,
      |    list_sort(list({'tus': epoch_us(ts), 'event_id': event_id,
      |                    'event_type': event_type})) AS evs
      |  FROM events GROUP BY user_id),
      |f AS (
      |  SELECT user_id,
      |    list_reduce(list_prepend({'tv': CAST(-1 AS BIGINT),
      |        'tc': CAST(-1 AS BIGINT), 'tp': CAST(-1 AS BIGINT),
      |        'ty': 'init'},
      |      list_transform(evs, e -> {'tv': e.tus, 'tc': e.tus,
      |        'tp': e.tus, 'ty': e.event_type})),
      |      (st, e) -> {
      |        'tv': CASE WHEN st.tv = -1 AND e.ty = 'view'
      |                THEN e.tv ELSE st.tv END,
      |        'tc': CASE WHEN st.tc = -1 AND st.tv <> -1 AND e.ty = 'click'
      |                THEN e.tc ELSE st.tc END,
      |        'tp': CASE WHEN st.tp = -1 AND st.tc <> -1 AND e.ty = 'purchase'
      |                THEN e.tp ELSE st.tp END,
      |        'ty': 'st'}) AS st
      |  FROM u)
      |SELECT user_id, st.tp <> -1 AS completed,
      |  CAST(st.tv AS BIGINT) AS tv_us, CAST(st.tc AS BIGINT) AS tc_us,
      |  CAST(st.tp AS BIGINT) AS tp_us,
      |  CAST(CASE WHEN st.tp <> -1 THEN st.tp - st.tv ELSE -1 END AS BIGINT)
      |    AS span_us
      |FROM f ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q262
  /** CUPED variance-reduced experiment readout (Deng et al. 2013) —
    * the estimator production experimentation platforms actually
    * ship: per user, the PRE-period covariate X (centi-value sum of
    * all events before the data-derived midpoint day) soaks up
    * between-user variance in the POST-period revenue metric Y
    * (centi-value of purchases), θ = Cov(X,Y)/Var(X) pooled across
    * arms (arm = user_id % 2, q207's convention). Reports θ (milli),
    * the achieved variance reduction ρ² (ppm — CUPED's exact gain),
    * and raw vs adjusted mean lift. All moments use q247's
    * integer-centering discipline: centi-unit BIGINTs, mean = sum
    * div n, products of centered values — no double accumulation
    * anywhere.
    *
    * Scale shape: the stream reduces ONCE to user grain (one
    * shuffle); every later frame is user-grain or a 1-row broadcast.
    * Like q74's fixpoint reuse, the user frame is an independent
    * subtree on each side of the broadcast — two passes, zero
    * corpus-wide exchanges beyond the first. */
  def q262Cuped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select($"user_id", expr(s"unix_micros(ts) div $dayUs").as("day"),
        $"event_type", expr("CAST(round(value * 100D) AS BIGINT)").as("cv"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val users = ev.crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg(sum(when($"day" < $"mid", $"cv").otherwise(0L)).as("x"),
        sum(when($"day" >= $"mid" && $"event_type" === "purchase", $"cv")
          .otherwise(0L)).as("y"))
      .select(($"user_id" % 2).as("arm"), $"x", $"y")
    cupedOf(users)
  }

  /** The estimator on any (arm 0/1, x, y) user frame — separated so
    * the spec can plant a known covariate structure. */
  private[ops] def cupedOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    val m = users.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
      sum($"y").as("sy"))
    val c = users.crossJoin(broadcast(m))
      .select($"arm", ($"x" - expr("sx div n")).as("cx"),
        ($"y" - expr("sy div n")).as("cy"))
    val sums = c.agg(count(lit(1)).as("n"),
      sum($"cx" * $"cx").as("sxx"), sum($"cy" * $"cy").as("syy"),
      sum($"cx" * $"cy").as("sxy"),
      sum(when($"arm" === 1, $"cy").otherwise(0L)).as("syb"),
      sum(when($"arm" === 0, $"cy").otherwise(0L)).as("sya"),
      sum(when($"arm" === 1, $"cx").otherwise(0L)).as("sxb"),
      sum(when($"arm" === 0, $"cx").otherwise(0L)).as("sxa"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("nb"))
    sums.select($"n", $"nb",
      expr("(1000 * sxy) div sxx").as("theta_milli"),
      expr("""((1000 * sxy) div
             |  ((CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
             |    * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT))
             |   div 1000)) AS rho""".stripMargin),
      expr("syb div nb - sya div (n - nb)").as("raw_lift_centi"),
      expr("""(1000 * syb - ((1000 * sxy) div sxx) * sxb) div (1000 * nb)
             |  - (1000 * sya - ((1000 * sxy) div sxx) * sxa)
             |    div (1000 * (n - nb))""".stripMargin)
        .as("adj_lift_centi"))
      .select($"n".as("n_users"), $"nb".as("n_treatment"), $"theta_milli",
        expr("(rho * rho) div 1000000").as("rho2_ppm"),
        $"raw_lift_centi", $"adj_lift_centi")
  }

  private val q262Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    event_type, CAST(round(value * 100) AS BIGINT) AS cv
       |  FROM events),
       |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
       |users AS (
       |  SELECT user_id % 2 AS arm,
       |    CAST(sum(CASE WHEN day < mid THEN cv ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN day >= mid AND event_type = 'purchase'
       |      THEN cv ELSE 0 END) AS BIGINT) AS y
       |  FROM ev, mid GROUP BY user_id),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
       |      FROM users),
       |c AS (
       |  SELECT arm, x - (sx // n) AS cx, y - (sy // n) AS cy
       |  FROM users, m),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(cx * cx) AS BIGINT) AS sxx,
       |    CAST(sum(cy * cy) AS BIGINT) AS syy,
       |    CAST(sum(cx * cy) AS BIGINT) AS sxy,
       |    CAST(sum(CASE WHEN arm = 1 THEN cy ELSE 0 END) AS BIGINT) AS syb,
       |    CAST(sum(CASE WHEN arm = 0 THEN cy ELSE 0 END) AS BIGINT) AS sya,
       |    CAST(sum(CASE WHEN arm = 1 THEN cx ELSE 0 END) AS BIGINT) AS sxb,
       |    CAST(sum(CASE WHEN arm = 0 THEN cx ELSE 0 END) AS BIGINT) AS sxa,
       |    CAST(count(*) FILTER (arm = 1) AS BIGINT) AS nb
       |  FROM c)
       |SELECT n AS n_users, nb AS n_treatment,
       |  CAST((1000 * sxy) // sxx AS BIGINT) AS theta_milli,
       |  CAST((((1000 * sxy) //
       |    ((CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
       |      * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT)) // 1000))
       |    * ((1000 * sxy) //
       |    ((CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
       |      * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT)) // 1000)))
       |    // 1000000 AS BIGINT) AS rho2_ppm,
       |  CAST(syb // nb - sya // (n - nb) AS BIGINT) AS raw_lift_centi,
       |  CAST((1000 * syb - ((1000 * sxy) // sxx) * sxb) // (1000 * nb)
       |    - (1000 * sya - ((1000 * sxy) // sxx) * sxa)
       |      // (1000 * (n - nb)) AS BIGINT) AS adj_lift_centi
       |FROM sums""".stripMargin

  // ---------------------------------------------------------------- q264
  /** Difference-in-differences readout with a parallel-trends
    * diagnostic — the quasi-experimental estimator for when
    * treatment was NOT randomized by unit (a rollout hit arm 1 at
    * the midpoint): effect = (B_post − B_pre) − (A_post − A_pre) on
    * per-user-mean centi-revenue, valid only if the arms trended in
    * parallel BEFORE the switch — so the report carries each arm's
    * pre-period daily OLS slope (q135's exact fixed-point formula)
    * and their gap, the number a reviewer checks before believing
    * the estimate. Same split conventions as q262 (arm = user_id%2,
    * data-derived midpoint day), so the two readouts triangulate.
    *
    * Scale shape: one partial agg to (arm × day) grain — everything
    * after runs on spine-sized frames; per-arm user counts come from
    * the same pass via distinct-user conditional aggs. */
  def q264DiffInDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select($"user_id", expr(s"unix_micros(ts) div $dayUs").as("day"),
        $"event_type", expr("CAST(round(value * 100D) AS BIGINT)").as("cv"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val base = ev.crossJoin(broadcast(mid))
      .select(($"user_id" % 2).as("arm"), $"user_id", $"day",
        ($"day" >= $"mid").as("post"),
        when($"event_type" === "purchase", $"cv").otherwise(0L).as("rev"))
    val users = base.groupBy($"arm")
      .agg(countDistinct($"user_id").as("nu"))
    val cells = base.groupBy($"arm", $"post")
      .agg(sum($"rev").as("rev"))
    val daily = base.where(!$"post")
      .groupBy($"arm", $"day").agg(sum($"rev").as("y"))
    val slopes = daily.groupBy($"arm")
      .agg(count(lit(1)).as("nd"), sum($"day").as("sx"), sum($"y").as("sy"),
        sum($"day" * $"day").as("sxx"), sum($"day" * $"y").as("sxy"))
      .select($"arm",
        expr("""(1000000 * (nd * sxy - sx * sy))
               |  div (nd * sxx - sx * sx)""".stripMargin).as("slope_micro"))
    val w = cells.join(users, "arm")
      .select($"arm", $"post", expr("rev div nu").as("mean_centi"))
    val g = (arm: Int, post: Boolean) =>
      max(when($"arm" === arm && $"post" === post, $"mean_centi"))
    w.agg(
      g(0, false).as("pre_a_centi"), g(0, true).as("post_a_centi"),
      g(1, false).as("pre_b_centi"), g(1, true).as("post_b_centi"))
      .crossJoin(broadcast(slopes.agg(
        max(when($"arm" === 0, $"slope_micro")).as("pre_slope_a_micro"),
        max(when($"arm" === 1, $"slope_micro")).as("pre_slope_b_micro"))))
      .select($"pre_a_centi", $"post_a_centi", $"pre_b_centi",
        $"post_b_centi",
        (($"post_b_centi" - $"pre_b_centi") -
          ($"post_a_centi" - $"pre_a_centi")).as("did_centi"),
        $"pre_slope_a_micro", $"pre_slope_b_micro",
        ($"pre_slope_b_micro" - $"pre_slope_a_micro").as("trend_gap_micro"))
  }

  private val q264Oracle =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    event_type, CAST(round(value * 100) AS BIGINT) AS cv
       |  FROM events),
       |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
       |base AS (
       |  SELECT user_id % 2 AS arm, user_id, day, day >= mid AS post,
       |    CASE WHEN event_type = 'purchase' THEN cv ELSE 0 END AS rev
       |  FROM ev, mid),
       |users AS (
       |  SELECT arm, CAST(count(DISTINCT user_id) AS BIGINT) AS nu
       |  FROM base GROUP BY 1),
       |cells AS (
       |  SELECT arm, post, CAST(sum(rev) AS BIGINT) AS rev
       |  FROM base GROUP BY 1, 2),
       |daily AS (
       |  SELECT arm, day, CAST(sum(rev) AS BIGINT) AS y
       |  FROM base WHERE NOT post GROUP BY 1, 2),
       |slopes AS (
       |  SELECT arm,
       |    (1000000 * (count(*) * sum(day * y) - sum(day) * sum(y)))
       |      // (count(*) * sum(day * day) - sum(day) * sum(day))
       |      AS slope_micro
       |  FROM daily GROUP BY 1),
       |w AS (
       |  SELECT c.arm, c.post, c.rev // u.nu AS mean_centi
       |  FROM cells c JOIN users u USING (arm)),
       |flat AS (
       |  SELECT
       |    max(CASE WHEN arm = 0 AND NOT post THEN mean_centi END) AS pre_a,
       |    max(CASE WHEN arm = 0 AND post THEN mean_centi END) AS post_a,
       |    max(CASE WHEN arm = 1 AND NOT post THEN mean_centi END) AS pre_b,
       |    max(CASE WHEN arm = 1 AND post THEN mean_centi END) AS post_b
       |  FROM w),
       |sl AS (
       |  SELECT max(CASE WHEN arm = 0 THEN slope_micro END) AS sa,
       |    max(CASE WHEN arm = 1 THEN slope_micro END) AS sb
       |  FROM slopes)
       |SELECT CAST(pre_a AS BIGINT) AS pre_a_centi,
       |  CAST(post_a AS BIGINT) AS post_a_centi,
       |  CAST(pre_b AS BIGINT) AS pre_b_centi,
       |  CAST(post_b AS BIGINT) AS post_b_centi,
       |  CAST((post_b - pre_b) - (post_a - pre_a) AS BIGINT) AS did_centi,
       |  CAST(sa AS BIGINT) AS pre_slope_a_micro,
       |  CAST(sb AS BIGINT) AS pre_slope_b_micro,
       |  CAST(sb - sa AS BIGINT) AS trend_gap_micro
       |FROM flat, sl""".stripMargin

  // ---------------------------------------------------------------- q266
  /** Order-independent replica digest — "is the copy byte-identical"
    * without moving the data: per day, the row count plus TWO
    * salt-decorrelated XOR folds of a per-row md5-derived 60-bit
    * integer over the full row payload. XOR is commutative/
    * associative, so the digest is invariant to partitioning and
    * row order (exactly what a cross-cluster comparison needs) and
    * aggregates map-side; the second salt catches the classic
    * single-xor blind spot (a PAIR of identical rows xors to zero —
    * losing both would go unseen by one fold, but the salted
    * companion hash of a duplicated row is a DIFFERENT value, so
    * count+xor₂ still moves). No arithmetic sums, so nothing can
    * overflow under ANSI mode at any scale.
    *
    * Scale shape: pure projection + one day-grain partial agg. */
  def q266ReplicaDigest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    def h(salt: String) = expr(
      s"""CAST(conv(substring(md5(concat_ws('|', '$salt',
         |  CAST(user_id AS STRING), CAST(event_id AS STRING),
         |  CAST(unix_micros(ts) AS STRING), event_type,
         |  CAST(CAST(round(value * 1000000D) AS BIGINT) AS STRING))),
         |  1, 15), 16, 10) AS BIGINT)""".stripMargin)
    Tables.events(s, dir)
      .select(expr(s"unix_micros(ts) div $dayUs").as("day"),
        h("d1").as("h1"), h("d2").as("h2"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h1)").as("digest1"), expr("bit_xor(h2)").as("digest2"))
      .orderBy($"day")
  }

  private val q266Oracle = {
    def h(salt: String) =
      s"""('0x' || substr(md5(concat_ws('|', '$salt',
         |  CAST(user_id AS VARCHAR), CAST(event_id AS VARCHAR),
         |  CAST(epoch_us(ts) AS VARCHAR), event_type,
         |  CAST(CAST(round(value * 1000000) AS BIGINT) AS VARCHAR))),
         |  1, 15))::BIGINT""".stripMargin
    s"""SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(bit_xor(${h("d1")}) AS BIGINT) AS digest1,
       |  CAST(bit_xor(${h("d2")}) AS BIGINT) AS digest2
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  // ---------------------------------------------------------------- q267
  /** Log-rank test between the two arms' time-to-purchase survival —
    * the standard "are these two survival curves the same" test
    * q208's single-arm KM can't answer (did the treatment speed up
    * conversion, accounting for censoring — comparing raw 72 h rates
    * throws censored users away). Same conventions as q208: time =
    * hours from first signup to first purchase, right-censored at
    * [[survivalHorizonH]]; arm = user_id % 2 (q207's convention).
    * Per death-hour: observed arm-1 deaths vs the hypergeometric
    * expectation d·n₁/n and variance d·n₁·(n−n₁)·(n−d)/(n²·(n−1)),
    * accumulated in exact milli/micro fixed-point (every term is a
    * floored ratio of exact BIGINT products; χ² = Δ²_milli div
    * V_micro is exact to its printed precision — BIGINT-safe to
    * ~10⁶ total deaths, the 10³-split (q247) applies beyond).
    *
    * Scale shape: one pass reduces the stream to per-user labels,
    * a second to (hour × arm) cells; risk sets are REVERSE cumsums
    * on the gap-filled 73×2 grid — every window is spine-grain. */
  def q267LogRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600L * 1000000L
    val ev = Tables.events(s, dir)
    val su = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("s"))
    val fp = ev.where($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p"))
      .join(su, "user_id").where($"p" >= $"s")
      .groupBy($"user_id").agg(min(expr(s"(p - s) div $hourUs")).as("th"))
    val users = su.join(fp.select($"user_id", $"th"), Seq("user_id"), "left")
      .select(($"user_id" % 2).as("arm"),
        when($"th".isNotNull && $"th" < survivalHorizonH, $"th")
          .otherwise(survivalHorizonH).as("t"),
        ($"th".isNotNull && $"th" < survivalHorizonH).as("death"))
    val cells = users.groupBy($"t", $"arm")
      .agg(count(lit(1)).as("nc"),
        sum(when($"death", 1L).otherwise(0L)).as("dc"))
    val spine = s.range(0, survivalHorizonH + 1).select($"id".as("t"))
      .crossJoin(s.range(0, 2).select($"id".as("arm")))
    val wRisk = Window.partitionBy($"arm").orderBy($"t".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = spine.join(cells, Seq("t", "arm"), "left")
      .select($"t", $"arm", coalesce($"nc", lit(0L)).as("nc"),
        coalesce($"dc", lit(0L)).as("dc"))
      .withColumn("at_risk", sum($"nc").over(wRisk))
    val byT = grid.groupBy($"t")
      .agg(sum($"dc").as("d"), sum($"at_risk").as("n"),
        sum(when($"arm" === 1, $"dc").otherwise(0L)).as("d1"),
        sum(when($"arm" === 1, $"at_risk").otherwise(0L)).as("n1"))
      .where($"d" >= 1)
    byT.agg(count(lit(1)).as("n_times"), sum($"d1").as("o1"),
      sum(expr("(1000 * d * n1) div n")).as("e1_milli"),
      sum(expr("""CASE WHEN n > 1 THEN
        (1000000 * d * n1 * (n - n1) * (n - d)) div (n * n * (n - 1))
        ELSE 0 END""")).as("v_micro"))
      .select($"n_times", $"o1", $"e1_milli", $"v_micro",
        expr("""((1000 * o1 - e1_milli) * (1000 * o1 - e1_milli))
               |  div v_micro""".stripMargin).as("chi2_milli"))
  }

  private val q267Oracle =
    s"""WITH su AS (
       |  SELECT user_id, min(epoch_us(ts)) AS s FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |fp AS (
       |  SELECT e.user_id,
       |    min((epoch_us(e.ts) - su.s) // ${3600L * 1000000L}) AS th
       |  FROM events e JOIN su ON e.user_id = su.user_id
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s
       |  GROUP BY 1),
       |users AS (
       |  SELECT su.user_id % 2 AS arm,
       |    CASE WHEN fp.th IS NOT NULL AND fp.th < $survivalHorizonH
       |      THEN fp.th ELSE $survivalHorizonH END AS t,
       |    fp.th IS NOT NULL AND fp.th < $survivalHorizonH AS death
       |  FROM su LEFT JOIN fp USING (user_id)),
       |cells AS (
       |  SELECT t, arm, CAST(count(*) AS BIGINT) AS nc,
       |    CAST(count(*) FILTER (death) AS BIGINT) AS dc
       |  FROM users GROUP BY 1, 2),
       |spine AS (
       |  SELECT t, arm
       |  FROM (SELECT unnest(range(0, ${survivalHorizonH + 1})) AS t),
       |       (SELECT unnest(range(0, 2)) AS arm)),
       |grid AS (
       |  SELECT s.t, s.arm, COALESCE(c.nc, 0) AS nc, COALESCE(c.dc, 0) AS dc,
       |    CAST(sum(COALESCE(c.nc, 0)) OVER (PARTITION BY s.arm
       |      ORDER BY s.t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS at_risk
       |  FROM spine s LEFT JOIN cells c ON c.t = s.t AND c.arm = s.arm),
       |byt AS (
       |  SELECT t, CAST(sum(dc) AS BIGINT) AS d,
       |    CAST(sum(at_risk) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN arm = 1 THEN dc ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN arm = 1 THEN at_risk ELSE 0 END) AS BIGINT)
       |      AS n1
       |  FROM grid GROUP BY 1 HAVING sum(dc) >= 1),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_times,
       |    CAST(sum(d1) AS BIGINT) AS o1,
       |    CAST(sum((1000 * d * n1) // n) AS BIGINT) AS e1_milli,
       |    CAST(sum(CASE WHEN n > 1 THEN
       |      (1000000 * d * n1 * (n - n1) * (n - d)) // (n * n * (n - 1))
       |      ELSE 0 END) AS BIGINT) AS v_micro
       |  FROM byt)
       |SELECT n_times, o1, e1_milli, v_micro,
       |  CAST(((1000 * o1 - e1_milli) * (1000 * o1 - e1_milli)) // v_micro
       |    AS BIGINT) AS chi2_milli
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q269
  /** Deseasonalized anomaly monitor — q134 flags raw outliers, which
    * on traffic data just re-discovers rush hour; this one removes
    * the weekly seasonality FIRST (expected value per week-hour cell
    * h mod 168, exact lower median over the dense q257-style hour
    * spine) and scores the RESIDUALS with the Iglewicz–Hoaglin
    * modified z (0.6745·(r−med)/MAD ≥ 3.5), medians exact via the
    * first-crossing rank device (q260's), MAD floored at 1 so a
    * perfectly regular corpus degrades to "any deviation flags"
    * rather than dividing by zero. What pages on-call: an hour that
    * is odd FOR THAT HOUR OF THE WEEK, not merely a busy one.
    *
    * Scale shape: one partial agg to the hour spine; the 168-cell
    * profile broadcasts back; medians and scores are spine-grain
    * windows (bounded by the time span, never the corpus). */
  def q269SeasonalAnomalies(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourUs = 3600L * 1000000L
    seasonalAnomaliesOfHourly(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $hourUs").as("h"))
      .agg(count(lit(1)).as("y")))
  }

  /** The monitor on any (h, y) hourly frame — separated so the spec
    * can plant a spike (the sparse sf0.001 fixture is too quiet to
    * page, which the monitor correctly reports as zero anomalies). */
  private[ops] def seasonalAnomaliesOfHourly(hourly: DataFrame): DataFrame = {
    val s = hourly.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val spine = hourly.agg(min($"h").as("lo"), max($"h").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    val dense = spine.join(hourly, Seq("h"), "left")
      .select($"h", coalesce($"y", lit(0L)).as("y"),
        ($"h" % 168).as("cell"))
    // per-cell LOWER-MEDIAN expectation (not the mean: one spike would
    // contaminate its own seasonal twins' baseline and page all three)
    val wc = Window.partitionBy($"cell").orderBy($"y")
    val profile = dense
      .withColumn("rn", row_number().over(wc).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"cell")))
      .where(lit(2) * $"rn" >= $"cnt")
      .groupBy($"cell").agg(min($"y").as("e"))
    val res = dense.join(broadcast(profile), "cell")
      .select($"h", $"y", $"e", ($"y" - $"e").as("r"))
    def lowerMedian(df: DataFrame, c: String): DataFrame = {
      val w = Window.orderBy(col(c))
      df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
        .where(lit(2) * $"rn" >= $"cnt").orderBy(col(c)).limit(1)
        .select(col(c))
    }
    val med = lowerMedian(res.select($"r"), "r")
      .select($"r".as("med"))
    val withMed = res.crossJoin(broadcast(med))
    val mad = lowerMedian(
      withMed.select(abs($"r" - $"med").as("ad")), "ad")
      .select($"ad".as("mad"))
    withMed.crossJoin(broadcast(mad))
      .select($"h", $"y".as("n_events"), $"e".as("expected"), $"r"
        .as("residual"),
        expr("(6745 * (r - med)) div (10 * greatest(mad, 1))")
          .as("z_milli"))
      .withColumn("is_anomaly", abs($"z_milli") >= 3500L)
      .orderBy($"h")
  }

  private val q269Oracle =
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // ${3600L * 1000000L} AS h,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(h), max(h))) AS h FROM hourly),
       |dense AS (
       |  SELECT s.h, COALESCE(y.y, 0) AS y, s.h % 168 AS cell
       |  FROM spine s LEFT JOIN hourly y USING (h)),
       |profile AS (
       |  SELECT cell, CAST(min(y) AS BIGINT) AS e FROM (
       |    SELECT cell, y,
       |      CAST(row_number() OVER (PARTITION BY cell ORDER BY y)
       |        AS BIGINT) AS rn,
       |      CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS cnt
       |    FROM dense) WHERE 2 * rn >= cnt GROUP BY cell),
       |res AS (
       |  SELECT d.h, d.y, p.e, d.y - p.e AS r
       |  FROM dense d JOIN profile p USING (cell)),
       |med AS (
       |  SELECT r AS med FROM (
       |    SELECT r, CAST(row_number() OVER (ORDER BY r) AS BIGINT) AS rn,
       |      CAST(count(*) OVER () AS BIGINT) AS cnt
       |    FROM res) WHERE 2 * rn >= cnt ORDER BY r LIMIT 1),
       |mad AS (
       |  SELECT ad AS mad FROM (
       |    SELECT abs(r - med) AS ad,
       |      CAST(row_number() OVER (ORDER BY abs(r - med)) AS BIGINT) AS rn,
       |      CAST(count(*) OVER () AS BIGINT) AS cnt
       |    FROM res, med) WHERE 2 * rn >= cnt ORDER BY ad LIMIT 1)
       |SELECT h, y AS n_events, e AS expected, r AS residual,
       |  CAST((6745 * (r - med)) // (10 * greatest(mad, 1)) AS BIGINT)
       |    AS z_milli,
       |  abs((6745 * (r - med)) // (10 * greatest(mad, 1))) >= 3500
       |    AS is_anomaly
       |FROM res, med, mad ORDER BY h""".stripMargin

  // ---------------------------------------------------------------- q270
  /** Mann–Whitney rank-sum TEST between the two arms' per-user
    * revenue — the significance readout for heavy-tailed metrics
    * where q207's mean-difference is whale-hostage (one big spender
    * moves means, not ranks) and where q196's AUC states separation
    * without a null: doubled midranks (q196's integer device) at
    * VALUE grain, the exact tie-corrected null variance
    * Var(2U) = n₁n₂·((n+1)n(n−1) − Σ(t³−t)) / (3n(n−1)), and
    * χ²₍₁₎ = (2U−n₁n₂)²/Var(2U) in milli fixed-point via a
    * denominator-first split (divide Var's two factors down before
    * multiplying — q247's 10³-split idea; every intermediate is a
    * floored ratio of exact BIGINT products, emitted identically by
    * both engines). (n+1)n(n−1) caps BIGINT at ~2×10⁶ users — a
    * bigger experiment tests on a deterministic per-arm sample
    * (q49's bucket trick), which is statistically all it needs.
    * Degenerate corpora (one-armed, all-tied, or n<2) emit a −1
    * sentinel, never NULL and never a divide-by-zero.
    *
    * Scale shape: one pass to user grain, one to VALUE grain; the
    * rank device is a running count over distinct metric values, so
    * the corpus-sized user frame is never globally sorted — only
    * the (much smaller) distinct-value frame is. */
  def q270MannWhitney(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mannWhitneyOf(Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase",
        expr("CAST(round(value * 1000000D) AS BIGINT)")).otherwise(0L))
        .as("v"))
      .select(($"user_id" % 2).as("arm"), $"v"))
  }

  /** The test on any (arm 0/1, v BIGINT) frame — separated so the
    * spec can plant separated arms, a null corpus, and the all-tied
    * sentinel. */
  private[ops] def mannWhitneyOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cells = users.groupBy($"v")
      .agg(count(lit(1)).as("t"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("t1"))
    val wLess = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("lt", coalesce(sum($"t").over(wLess), lit(0L)))
    ranked.agg(
      sum($"t").as("n"), sum($"t1").as("n1"),
      sum($"t1" * (lit(2L) * $"lt" + $"t" + 1L)).as("r1_2"),
      sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
      .select($"n", $"n1", ($"n" - $"n1").as("n2"),
        ($"r1_2" - $"n1" * ($"n1" + 1L)).as("u1_scaled"), $"tie_term")
      .select($"n", $"n1", $"n2", $"u1_scaled", $"tie_term",
        expr("""CASE
          |  WHEN n < 2 OR n1 = 0 OR n2 = 0 THEN -1
          |  WHEN ((n + 1) * n * (n - 1) - tie_term)
          |       div (3 * n * (n - 1)) = 0 THEN -1
          |  ELSE ((1000 * (u1_scaled - n1 * n2) * (u1_scaled - n1 * n2))
          |        div (n1 * n2))
          |       div (((n + 1) * n * (n - 1) - tie_term)
          |            div (3 * n * (n - 1)))
          |END""".stripMargin).as("chi2_milli"))
  }

  private val q270Oracle =
    """WITH users AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS v
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
      |  FROM users GROUP BY 1),
      |rk AS (
      |  SELECT t, t1,
      |    COALESCE(CAST(sum(t) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS lt
      |  FROM cells),
      |agg AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(t1) AS BIGINT) AS n1,
      |    CAST(sum(t1 * (2 * lt + t + 1)) AS BIGINT) AS r1_2,
      |    CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
      |  FROM rk),
      |d AS (
      |  SELECT n, n1, n - n1 AS n2,
      |    r1_2 - n1 * (n1 + 1) AS u1_scaled, tie_term
      |  FROM agg)
      |SELECT n, n1, n2, u1_scaled, tie_term,
      |  CASE
      |    WHEN n < 2 OR n1 = 0 OR n2 = 0 THEN -1
      |    WHEN ((n + 1) * n * (n - 1) - tie_term)
      |         // (3 * n * (n - 1)) = 0 THEN -1
      |    ELSE ((1000 * (u1_scaled - n1 * n2) * (u1_scaled - n1 * n2))
      |          // (n1 * n2))
      |         // (((n + 1) * n * (n - 1) - tie_term)
      |              // (3 * n * (n - 1)))
      |  END AS chi2_milli
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- q271
  /** Autocorrelation function + Ljung–Box portmanteau of the daily
    * event-count series — the "is there structure left" diagnostic
    * that decides whether q135's trend or q169's seasonal profile
    * actually explained the series, and the one q217/q163 monitors
    * assume has been checked (their false-positive rates blow up on
    * autocorrelated residuals). Lags 1..7 on the DENSE day spine
    * (zero-traffic days are real observations, not gaps):
    * r_k = Σc_t·c_{t+k} / Σc_t² in exact milli fixed-point over
    * n-scaled centered counts c_t = n·y_t − Σy (q247's
    * integer-centering — no float means anywhere), and the
    * cumulative Ljung–Box Q(m) = n(n+2)·Σ_{k≤m} r_k²/(n−k) in milli
    * from the same integers. A constant series has no defined ACF
    * and reports NULL (q206's honest-posture convention), never a
    * divide-by-zero. n·y keeps c² inside BIGINT to ~10⁹ events/day
    * over ~10³ days; a bigger corpus re-grids y (q202's discipline).
    *
    * Scale shape: one partial agg to the day spine; everything after
    * is day-grain — the n-scaled centering broadcasts two scalars,
    * the 7 lag products are spine-joins, and the Q cumsum is a
    * 7-row window. */
  def q271AcfLjungBox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    acfOf(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("d"))
      .agg(count(lit(1)).as("y")))
  }

  /** ACF + Ljung–Box on any (d, y) daily frame — separated so the
    * spec can plant an alternating series (r₁ ≈ −1000, r₂ ≈ +1000)
    * and the constant-series NULL. */
  private[ops] def acfOf(daily: DataFrame, maxLag: Int = 7): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val spine = daily.agg(min($"d").as("lo"), max($"d").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("d"))
    val dense = spine.join(daily, Seq("d"), "left")
      .select($"d", coalesce($"y", lit(0L)).as("y"))
    val tot = dense.agg(count(lit(1)).as("n"), sum($"y").as("sy"))
    val cen = dense.crossJoin(broadcast(tot))
      .select($"d", ($"n" * $"y" - $"sy").as("c"), $"n")
    val den = cen.agg(sum($"c" * $"c").as("css"), max($"n").as("n"))
    val lags = s.range(1, maxLag + 1L).select($"id".as("lag"))
    val num = lags.crossJoin(cen.select($"d", $"c"))
      .join(cen.select(($"d").as("d2"), $"c".as("c2")),
        $"d2" === $"d" + $"lag")
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"), sum($"c" * $"c2").as("num"))
    val r = num.crossJoin(broadcast(den.select($"css", $"n")))
      .select($"lag", $"n_pairs", $"n",
        when($"css" > 0L, expr("(1000 * num) div css")).as("r_milli"))
    val wCum = Window.orderBy($"lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.withColumn("term", expr("(r_milli * r_milli) div (n - lag)"))
      .withColumn("cum", sum($"term").over(wCum))
      .select($"lag", $"n_pairs", $"r_milli",
        when($"r_milli".isNotNull,
          expr("(n * (n + 2) * cum) div 1000")).as("lb_q_milli"))
      .orderBy($"lag")
  }

  private val q271Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(d), max(d))) AS d FROM daily),
       |dense AS (
       |  SELECT s.d, COALESCE(y.y, 0) AS y
       |  FROM spine s LEFT JOIN daily y USING (d)),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
       |  FROM dense),
       |cen AS (SELECT d, n * y - sy AS c, n FROM dense, tot),
       |den AS (
       |  SELECT CAST(sum(c * c) AS BIGINT) AS css, max(n) AS n FROM cen),
       |lags AS (SELECT unnest(range(1, 8)) AS lag),
       |num AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(a.c * b.c) AS BIGINT) AS num
       |  FROM lags, cen a, cen b WHERE b.d = a.d + lag
       |  GROUP BY 1),
       |r AS (
       |  SELECT lag, n_pairs, den.n,
       |    CASE WHEN den.css > 0 THEN (1000 * num) // den.css END AS r_milli
       |  FROM num, den),
       |t AS (
       |  SELECT lag, n_pairs, r_milli, n,
       |    (r_milli * r_milli) // (n - lag) AS term
       |  FROM r)
       |SELECT lag, n_pairs, r_milli,
       |  CASE WHEN r_milli IS NOT NULL THEN
       |    (n * (n + 2) * CAST(sum(term) OVER (ORDER BY lag
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT)) // 1000
       |  END AS lb_q_milli
       |FROM t ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------- q274
  /** Spearman rank correlation between per-user activity and
    * revenue — the monotone-association readout q247's Pearson
    * misses on heavy-tailed metrics (a whale's revenue drags the
    * moments; its RANK is one step). Doubled midranks (q196's
    * integer device) for BOTH variables, built at VALUE grain and
    * joined back, then q247's exact centered-product machinery on
    * the doubled ranks. Σdr = n(n+1) exactly, so the centering
    * constant n+1 is exact — no floored mean anywhere; ρ_ppm uses
    * q247's fixed-form floored sqrt + 10³-split. Degenerate inputs
    * (either variable constant) report NULL (q206's honest
    * posture). Centered rank products cap BIGINT near ~10⁶ users; a
    * bigger corpus tests on a deterministic sample (q49's trick) —
    * rank statistics are sample-stable.
    *
    * Scale shape: one pass to user grain; each rank table is a
    * value-grain running count joined back on its value; one scalar
    * agg ends it. The corpus-sized user frame is never globally
    * sorted. */
  def q274Spearman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    spearmanOf(Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("x"),
        sum(when($"event_type" === "purchase",
          expr("CAST(round(value * 1000000D) AS BIGINT)")).otherwise(0L))
          .as("y"))
      .select($"x", $"y"))
  }

  /** Spearman on any (x BIGINT, y BIGINT) frame — separated so the
    * spec can plant perfect, inverted, and constant columns. */
  private[ops] def spearmanOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def drCells(df: DataFrame, c: String): DataFrame = {
      val wLess = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.groupBy(col(c)).agg(count(lit(1)).as("t"))
        .withColumn("lt", coalesce(sum($"t").over(wLess), lit(0L)))
        .select(col(c), (lit(2L) * $"lt" + $"t" + 1L).as(s"dr_$c"))
    }
    val ranked = users
      .join(drCells(users.select($"x"), "x"), "x")
      .join(drCells(users.select($"y"), "y"), "y")
    val tot = users.agg(count(lit(1)).as("n"))
    val cen = ranked.crossJoin(broadcast(tot))
      .select(($"dr_x" - ($"n" + 1L)).as("cx"),
        ($"dr_y" - ($"n" + 1L)).as("cy"), $"n")
    cen.agg(max($"n").as("n"), sum($"cx" * $"cy").as("sxy"),
      sum($"cx" * $"cx").as("sxx"), sum($"cy" * $"cy").as("syy"))
      .select($"n", $"sxy", $"sxx", $"syy",
        expr("""CASE WHEN sxx = 0 OR syy = 0 THEN NULL
          |  WHEN (CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
          |        * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT))
          |       div 1000 = 0 THEN NULL
          |  ELSE (1000 * sxy) div
          |    ((CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
          |      * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT))
          |     div 1000)
          |END""".stripMargin).as("rho_ppm"))
  }

  private val q274Oracle =
    """WITH users AS (
      |  SELECT CAST(count(*) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |xc AS (SELECT x, CAST(count(*) AS BIGINT) AS t FROM users GROUP BY 1),
      |xr AS (
      |  SELECT x, 2 * COALESCE(CAST(sum(t) OVER (ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |    + t + 1 AS dr_x
      |  FROM xc),
      |yc AS (SELECT y, CAST(count(*) AS BIGINT) AS t FROM users GROUP BY 1),
      |yr AS (
      |  SELECT y, 2 * COALESCE(CAST(sum(t) OVER (ORDER BY y
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |    + t + 1 AS dr_y
      |  FROM yc),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
      |cen AS (
      |  SELECT dr_x - (n + 1) AS cx, dr_y - (n + 1) AS cy
      |  FROM users JOIN xr USING (x) JOIN yr USING (y), tot),
      |sums AS (
      |  SELECT CAST(sum(cx * cy) AS BIGINT) AS sxy,
      |    CAST(sum(cx * cx) AS BIGINT) AS sxx,
      |    CAST(sum(cy * cy) AS BIGINT) AS syy
      |  FROM cen)
      |SELECT n, sxy, sxx, syy,
      |  CASE WHEN sxx = 0 OR syy = 0 THEN NULL
      |    WHEN (CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
      |          * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT))
      |         // 1000 = 0 THEN NULL
      |    ELSE (1000 * sxy) //
      |      ((CAST(floor(sqrt(CAST(sxx AS DOUBLE))) AS BIGINT)
      |        * CAST(floor(sqrt(CAST(syy AS DOUBLE))) AS BIGINT))
      |       // 1000)
      |  END AS rho_ppm
      |FROM sums, tot""".stripMargin

  // ---------------------------------------------------------------- q275
  /** Day-spine queue backlog under fixed service capacity — "did the
    * pipeline keep up, and how deep did it get behind": arrivals a_t
    * vs capacity C (the exact integer mean daily arrival — sized for
    * average load, so bursts must queue), with
    * backlog_t = max(0, backlog_{t−1} + a_t − C). NOT a sequential
    * fold: the Lindley recursion has the closed form
    * backlog_t = P_t − least(0, min_{k≤t} P_k) over net prefix sums
    * P, so two spine-grain windows express the imperative loop
    * exactly — the single-GLOBAL-queue complement to q154's per-key
    * in-group fold (windows can't carry per-key state; they CAN
    * carry this). Spec proves the closed form against a literal
    * fold and a planted burst.
    *
    * Scale shape: one partial agg to the day spine; the capacity
    * scalar broadcasts; both windows are day-grain. */
  def q275QueueBacklog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    backlogOf(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("d"))
      .agg(count(lit(1)).as("y")))
  }

  /** The closed-form backlog on any (d, y) daily frame — separated
    * so the spec can plant a burst-then-drain series. */
  private[ops] def backlogOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val spine = daily.agg(min($"d").as("lo"), max($"d").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("d"))
    val dense = spine.join(daily, Seq("d"), "left")
      .select($"d", coalesce($"y", lit(0L)).as("y"))
    val cap = dense.agg(expr("sum(y) div count(1)").as("cap"))
    val wCum = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.crossJoin(broadcast(cap))
      .withColumn("p", sum($"y" - $"cap").over(wCum))
      .withColumn("mn", min($"p").over(wCum))
      .select($"d", $"y".as("arrivals"), $"cap".as("capacity"),
        ($"p" - least(lit(0L), $"mn")).as("backlog"))
      .orderBy($"d")
  }

  private val q275Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(d), max(d))) AS d FROM daily),
       |dense AS (
       |  SELECT s.d, COALESCE(y.y, 0) AS y
       |  FROM spine s LEFT JOIN daily y USING (d)),
       |cap AS (
       |  SELECT CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS cap
       |  FROM dense),
       |p AS (
       |  SELECT d, y, cap,
       |    CAST(sum(y - cap) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS p
       |  FROM dense, cap),
       |m AS (
       |  SELECT d, y, cap, p,
       |    CAST(min(p) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS mn
       |  FROM p)
       |SELECT d, y AS arrivals, cap AS capacity,
       |  p - least(0, mn) AS backlog
       |FROM m ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- q276
  /** Mergeable log₂-bucket percentiles of event value per type —
    * the HdrHistogram idiom for latency-style metrics at fleet
    * scale: each shard reduces to (type, bucket, count) cells —
    * bucket = MSB position of 1+v via q263's length(bin(·)) device,
    * exact integers on both engines, no transcendental on data —
    * and cells ADD across shards (the whole point: merging exact
    * quantiles needs the full data; merging this sketch is a
    * count-sum). p50/p95/p99 read off the ≤64-bucket cumsum by the
    * exact rational first-crossing 100·cum ≥ p·n (no ceil, no
    * floats), reporting the bucket's value bounds — the honest
    * ±bucket-width answer a log histogram gives.
    *
    * Scale shape: one partial agg to (type × ≤64) cells; cumsum and
    * crossing run on the cell frame; the 3-row pct spine
    * broadcasts. */
  def q276LogHistPctl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, dir)
      .select($"event_type",
        expr("CAST(length(bin(1 + CAST(round(value * 1000000D) AS BIGINT)))" +
          " AS BIGINT)").as("b"))
      .groupBy($"event_type", $"b").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"event_type").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("n",
        sum($"cnt").over(Window.partitionBy($"event_type")))
    val pcts = Seq(50L, 95L, 99L).toDF("pct")
    cum.crossJoin(broadcast(pcts))
      .where($"cum" * 100L >= $"pct" * $"n")
      .groupBy($"event_type", $"pct")
      .agg(max($"n").as("n"), min($"b").as("bucket"))
      .select($"event_type", $"pct", $"n", $"bucket",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT)) - 1")
          .as("lo_micro"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 2")
          .as("hi_micro"))
      .orderBy($"event_type", $"pct")
  }

  private val q276Oracle =
    """WITH cells AS (
      |  SELECT event_type,
      |    CAST(length(bin(1 + CAST(round(value * 1000000) AS BIGINT)))
      |      AS BIGINT) AS b,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, b, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY b
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM cells),
      |pcts AS (SELECT CAST(unnest([50, 95, 99]) AS BIGINT) AS pct),
      |hit AS (
      |  SELECT event_type, pct, max(n) AS n, min(b) AS bucket
      |  FROM cum, pcts WHERE cum * 100 >= pct * n
      |  GROUP BY 1, 2)
      |SELECT event_type, pct, n, bucket,
      |  (CAST(1 AS BIGINT) << CAST(bucket - 1 AS INT)) - 1 AS lo_micro,
      |  (CAST(1 AS BIGINT) << CAST(bucket AS INT)) - 2 AS hi_micro
      |FROM hit ORDER BY event_type, pct""".stripMargin

  // ---------------------------------------------------------------- q282
  /** Mantel–Haenszel pooled odds ratio across signup-weekpart
    * strata — the Simpson's-paradox guard for the q207-style A/B
    * readout: if arm assignment correlates with WHEN users signed up
    * (weekpart populations convert differently), the crude odds
    * ratio mixes cohort effects into the treatment effect; MH pools
    * the per-stratum 2×2 tables as Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ),
    * weighting each stratum by its information. Outcome = purchased
    * within 24 h of first signup (q267's su/fp conventions; "ever
    * purchased" is degenerate on this corpus — every signup user
    * eventually buys). Exact milli fixed-point (per-stratum floored
    * BIGINT ratios, identically on both engines); both the crude and
    * pooled ratios are emitted so the gap IS the confounding
    * diagnostic. −1 sentinels where a ratio is undefined (zero
    * denominator), never NULL or ∞.
    *
    * Scale shape: one pass to user grain (arm, stratum, converted),
    * one to the 2×2×2 cell grid; everything after is cell-grain. */
  def q282MantelHaenszel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, dir)
    val su = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("s"))
    val fp = ev.where($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p"))
      .join(su, "user_id").where($"p" >= $"s")
      .groupBy($"user_id").agg(min($"p").as("p"))
    val users = su.join(fp, Seq("user_id"), "left")
      .select(($"user_id" % 2).as("arm"),
        expr(s"CASE WHEN (s div $dayUs) % 7 < 4 THEN 0 ELSE 1 END")
          .as("stratum"),
        when($"p".isNotNull && $"p" - $"s" < dayUs, 1L).otherwise(0L)
          .as("conv"))
    val cells = users.groupBy($"stratum")
      .agg(sum(when($"arm" === 1 && $"conv" === 1, 1L).otherwise(0L)).as("a"),
        sum(when($"arm" === 1 && $"conv" === 0, 1L).otherwise(0L)).as("b"),
        sum(when($"arm" === 0 && $"conv" === 1, 1L).otherwise(0L)).as("c"),
        sum(when($"arm" === 0 && $"conv" === 0, 1L).otherwise(0L)).as("d"))
      .withColumn("n", $"a" + $"b" + $"c" + $"d")
    cells.agg(count(lit(1)).as("n_strata"),
      sum($"a").as("ta"), sum($"b").as("tb"),
      sum($"c").as("tc"), sum($"d").as("td"),
      sum(expr("(1000000 * a * d) div n")).as("num"),
      sum(expr("(1000 * b * c) div n")).as("den"))
      .select($"n_strata",
        expr("""CASE WHEN tb * tc = 0 THEN -1
          |  ELSE (1000 * ta * td) div (tb * tc) END""".stripMargin)
          .as("or_crude_milli"),
        expr("CASE WHEN den = 0 THEN -1 ELSE num div den END")
          .as("or_mh_milli"))
  }

  private val q282Oracle =
    s"""WITH su AS (
       |  SELECT user_id, min(epoch_us(ts)) AS s FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |fp AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS p
       |  FROM events e JOIN su ON e.user_id = su.user_id
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s
       |  GROUP BY 1),
       |users AS (
       |  SELECT su.user_id % 2 AS arm,
       |    CASE WHEN (su.s // ${86400L * 1000000L}) % 7 < 4
       |      THEN 0 ELSE 1 END AS stratum,
       |    CASE WHEN fp.p IS NOT NULL
       |        AND fp.p - su.s < ${86400L * 1000000L}
       |      THEN 1 ELSE 0 END AS conv
       |  FROM su LEFT JOIN fp USING (user_id)),
       |cells AS (
       |  SELECT stratum,
       |    CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS d
       |  FROM users GROUP BY 1),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
       |    CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
       |    CAST(sum(c) AS BIGINT) AS tc, CAST(sum(d) AS BIGINT) AS td,
       |    CAST(sum((1000000 * a * d) // (a + b + c + d)) AS BIGINT) AS num,
       |    CAST(sum((1000 * b * c) // (a + b + c + d)) AS BIGINT) AS den
       |  FROM cells)
       |SELECT n_strata,
       |  CASE WHEN tb * tc = 0 THEN -1
       |    ELSE (1000 * ta * td) // (tb * tc) END AS or_crude_milli,
       |  CASE WHEN den = 0 THEN -1 ELSE num // den END AS or_mh_milli
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q283
  /** McNemar's paired flip test across the corpus midpoint — the
    * before/after readout on the SAME users that two independent
    * proportions (q207) would get wrong (paired data: each user is
    * their own control): split every signup user's purchases at the
    * corpus half-time, count discordant users (converted before
    * only, b; after only, c), and χ²₍₁₎ = (b−c)²/(b+c) in exact
    * milli — concordant users carry no information about the change
    * and drop out by construction. −1 sentinel when no user flipped
    * either way.
    *
    * Scale shape: the midpoint is a two-scalar agg broadcast back;
    * one pass reduces events to per-user (pre, post) flags; the
    * test is one row. */
  def q283McNemar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val mid = ev.agg(expr(
      "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid"))
    val su = ev.where($"event_type" === "signup")
      .select($"user_id").distinct()
    val flags = ev.where($"event_type" === "purchase")
      .crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg(max(when(unix_micros($"ts") < $"mid", 1L).otherwise(0L))
        .as("pre"),
        max(when(unix_micros($"ts") >= $"mid", 1L).otherwise(0L))
          .as("post"))
    su.join(flags, Seq("user_id"), "left")
      .select(coalesce($"pre", lit(0L)).as("pre"),
        coalesce($"post", lit(0L)).as("post"))
      .agg(count(lit(1)).as("n_users"),
        sum($"pre" * $"post").as("n_both"),
        sum($"pre" * (lit(1L) - $"post")).as("n_pre_only"),
        sum((lit(1L) - $"pre") * $"post").as("n_post_only"),
        sum((lit(1L) - $"pre") * (lit(1L) - $"post")).as("n_neither"))
      .select($"n_users", $"n_both", $"n_pre_only", $"n_post_only",
        $"n_neither",
        expr("""CASE WHEN n_pre_only + n_post_only = 0 THEN -1
          |  ELSE (1000 * (n_pre_only - n_post_only)
          |        * (n_pre_only - n_post_only))
          |       div (n_pre_only + n_post_only) END""".stripMargin)
          .as("chi2_milli"))
  }

  private val q283Oracle =
    """WITH mid AS (
      |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
      |  FROM events),
      |su AS (SELECT DISTINCT user_id FROM events
      |  WHERE event_type = 'signup'),
      |flags AS (
      |  SELECT user_id,
      |    CAST(max(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pre,
      |    CAST(max(CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END)
      |      AS BIGINT) AS post
      |  FROM events, mid WHERE event_type = 'purchase' GROUP BY 1),
      |users AS (
      |  SELECT COALESCE(f.pre, 0) AS pre, COALESCE(f.post, 0) AS post
      |  FROM su LEFT JOIN flags f USING (user_id)),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(pre * post) AS BIGINT) AS n_both,
      |    CAST(sum(pre * (1 - post)) AS BIGINT) AS n_pre_only,
      |    CAST(sum((1 - pre) * post) AS BIGINT) AS n_post_only,
      |    CAST(sum((1 - pre) * (1 - post)) AS BIGINT) AS n_neither
      |  FROM users)
      |SELECT n_users, n_both, n_pre_only, n_post_only, n_neither,
      |  CASE WHEN n_pre_only + n_post_only = 0 THEN -1
      |    ELSE (1000 * (n_pre_only - n_post_only)
      |          * (n_pre_only - n_post_only))
      |         // (n_pre_only + n_post_only) END AS chi2_milli
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q284
  /** Cochran–Armitage trend test — "does conversion RISE with
    * engagement level", the ordered-dose question q282's 2×2
    * machinery flattens away: users in activity tertiles (exact
    * ntile(3) under the (n_events, user_id) total order via
    * [[Ranks.withGlobalRank]]) with scores
    * w = 0,1,2, outcome = 24 h conversion (q282's convention).
    * n-scaled integer statistic T′ = n·Σwᵢaᵢ − A·Σwᵢnᵢ and variance
    * factors A(n−A)·[nΣwᵢ²nᵢ − (Σwᵢnᵢ)²]/n, χ² in milli via the
    * q270 denominator-first split — exact floored BIGINT ratios on
    * both engines. −1 sentinel when the variance degenerates (all
    * users converted, none did, or one tertile holds everyone).
    *
    * Scale shape: one pass to user grain; the tertile cut is the
    * hierarchical rank (range-bucketed windows + broadcast offsets —
    * no single-partition sort); the test folds the 3-row level table
    * to one row. */
  def q284TrendTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, dir)
    val su = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("s"))
    val act = ev.groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    val fp = ev.where($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p"))
      .join(su, "user_id").where($"p" >= $"s")
      .groupBy($"user_id").agg(min($"p").as("p"))
    val graded = su.join(act, "user_id").join(fp, Seq("user_id"), "left")
      .select($"user_id", $"n_events",
        when($"p".isNotNull && $"p" - $"s" < dayUs, 1L).otherwise(0L)
          .as("conv"))
    // materialize=false: the input is a bounded user-grain frame (a
    // triple recompute costs less than the pin), and the scan-pruning
    // PlanSpec pin on this query needs the events scan visible
    val users = Ranks.withGlobalRank(graded, $"n_events", $"user_id",
        "__gr", nName = "__gn", materialize = false)
      .withColumn("w", Ranks.ntileExpr(3, "__gr", "__gn") - 1)
    val lv = users.groupBy($"w")
      .agg(count(lit(1)).as("nw"), sum($"conv").as("aw"))
    lv.agg(sum($"nw").as("n"), sum($"aw").as("a"),
      sum($"w" * $"aw").as("swa"), sum($"w" * $"nw").as("swn"),
      sum($"w" * $"w" * $"nw").as("sw2n"))
      .select($"n", $"a",
        ($"n" * $"swa" - $"a" * $"swn").as("t_scaled"),
        ($"n" * $"sw2n" - $"swn" * $"swn").as("v_factor"))
      .select($"n", $"a", $"t_scaled", $"v_factor",
        expr("""CASE
          |  WHEN a = 0 OR a = n OR v_factor = 0
          |    OR (a * (n - a) * v_factor) div (n * n) = 0 THEN -1
          |  ELSE (1000 * t_scaled * t_scaled)
          |       div ((a * (n - a) * v_factor) div (n * n) * n)
          |END""".stripMargin).as("chi2_milli"))
  }

  private val q284Oracle =
    s"""WITH su AS (
       |  SELECT user_id, min(epoch_us(ts)) AS s FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |act AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1),
       |fp AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS p
       |  FROM events e JOIN su ON e.user_id = su.user_id
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s
       |  GROUP BY 1),
       |users AS (
       |  SELECT CAST(ntile(3) OVER (ORDER BY act.n_events, su.user_id) - 1
       |      AS BIGINT) AS w,
       |    CASE WHEN fp.p IS NOT NULL
       |        AND fp.p - su.s < ${86400L * 1000000L}
       |      THEN 1 ELSE 0 END AS conv
       |  FROM su JOIN act USING (user_id) LEFT JOIN fp USING (user_id)),
       |lv AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS nw,
       |    CAST(sum(conv) AS BIGINT) AS aw
       |  FROM users GROUP BY 1),
       |agg AS (
       |  SELECT CAST(sum(nw) AS BIGINT) AS n, CAST(sum(aw) AS BIGINT) AS a,
       |    CAST(sum(w * aw) AS BIGINT) AS swa,
       |    CAST(sum(w * nw) AS BIGINT) AS swn,
       |    CAST(sum(w * w * nw) AS BIGINT) AS sw2n
       |  FROM lv),
       |d AS (
       |  SELECT n, a, n * swa - a * swn AS t_scaled,
       |    n * sw2n - swn * swn AS v_factor
       |  FROM agg)
       |SELECT n, a, t_scaled, v_factor,
       |  CASE
       |    WHEN a = 0 OR a = n OR v_factor = 0
       |      OR (a * (n - a) * v_factor) // (n * n) = 0 THEN -1
       |    ELSE (1000 * t_scaled * t_scaled)
       |         // ((a * (n - a) * v_factor) // (n * n) * n)
       |  END AS chi2_milli
       |FROM d""".stripMargin

  // ---------------------------------------------------------------- q286
  /** Quantile treatment effect — WHERE in the revenue distribution
    * the treatment acted, the distributional readout a mean lift
    * (q207) or rank test (q270) can't localize: per arm the exact
    * lower decile values of per-user purchase revenue (q209's
    * first-crossing rank device, built at VALUE grain per arm) and
    * their per-decile differences. A whale-only effect shows at d9
    * with flat d1–d5; a broad effect shifts every decile.
    *
    * Scale shape: one pass to user grain, one to (arm × value)
    * cells; crossings run on the cell frame against a broadcast
    * 9-row decile spine; the corpus is never globally sorted. */
  def q286QuantileEffect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val users = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase",
        expr("CAST(round(value * 1000000D) AS BIGINT)")).otherwise(0L))
        .as("v"))
      .select(($"user_id" % 2).as("arm"), $"v")
    val cells = users.groupBy($"arm", $"v").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"arm").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"arm")))
    val ds = s.range(1, 10).select($"id".as("decile"))
    cum.crossJoin(broadcast(ds))
      .where($"cum" * 10L >= $"decile" * $"n")
      .groupBy($"decile")
      .agg(min(when($"arm" === 1, $"v")).as("treat_micro"),
        min(when($"arm" === 0, $"v")).as("ctrl_micro"))
      .select($"decile", $"treat_micro", $"ctrl_micro",
        ($"treat_micro" - $"ctrl_micro").as("qte_micro"))
      .orderBy($"decile")
  }

  private val q286Oracle =
    """WITH users AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS v
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT arm, v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM users GROUP BY 1, 2),
      |cum AS (
      |  SELECT arm, v,
      |    CAST(sum(cnt) OVER (PARTITION BY arm ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY arm) AS BIGINT) AS n
      |  FROM cells),
      |ds AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS decile)
      |SELECT decile,
      |  min(CASE WHEN arm = 1 THEN v END) AS treat_micro,
      |  min(CASE WHEN arm = 0 THEN v END) AS ctrl_micro,
      |  min(CASE WHEN arm = 1 THEN v END)
      |    - min(CASE WHEN arm = 0 THEN v END) AS qte_micro
      |FROM cum, ds WHERE cum * 10 >= decile * n
      |GROUP BY 1 ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q287
  /** Weekly growth accounting — the additivity-checked
    * new/retained/resurrected/churned decomposition every growth
    * dashboard runs (q238 splits new vs returning; this closes the
    * loop with the conservation identities WAU_t = new + retained +
    * resurrected and churned_t = WAU_{t−1} − retained_t, so the
    * numbers can't silently double-count). Per user-week: new iff
    * first-ever week, retained iff active the immediately previous
    * week, resurrected iff returning after a gap ≥ 2 weeks.
    *
    * Scale shape: one pass to distinct (user, week), one user-key
    * shuffle for the per-user lag window, one partial agg to the
    * dense week spine; churn is a week-grain lag. */
  def q287GrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wkUs = 7L * 86400L * 1000000L
    val uw = Tables.events(s, dir)
      .select($"user_id", expr(s"unix_micros(ts) div $wkUs").as("wk"))
      .distinct()
    val wUser = Window.partitionBy($"user_id").orderBy($"wk")
    val tagged = uw
      .withColumn("prev", lag($"wk", 1).over(wUser))
      .select($"wk",
        when($"prev".isNull, 1L).otherwise(0L).as("is_new"),
        when($"prev" === $"wk" - 1L, 1L).otherwise(0L).as("is_ret"),
        when($"prev".isNotNull && $"prev" < $"wk" - 1L, 1L).otherwise(0L)
          .as("is_res"))
    val weekly = tagged.groupBy($"wk")
      .agg(count(lit(1)).as("wau"), sum($"is_new").as("n_new"),
        sum($"is_ret").as("n_retained"), sum($"is_res").as("n_resurrected"))
    val spine = weekly.agg(min($"wk").as("lo"), max($"wk").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("wk"))
    val dense = spine.join(weekly, Seq("wk"), "left")
      .select($"wk", coalesce($"wau", lit(0L)).as("wau"),
        coalesce($"n_new", lit(0L)).as("n_new"),
        coalesce($"n_retained", lit(0L)).as("n_retained"),
        coalesce($"n_resurrected", lit(0L)).as("n_resurrected"))
    dense
      .withColumn("n_churned",
        coalesce(lag($"wau", 1).over(Window.orderBy($"wk")), lit(0L))
          - $"n_retained")
      .orderBy($"wk")
  }

  private val q287Oracle =
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id,
       |    epoch_us(ts) // ${7L * 86400L * 1000000L} AS wk
       |  FROM events),
       |tagged AS (
       |  SELECT wk,
       |    CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS is_new,
       |    CASE WHEN prev = wk - 1 THEN 1 ELSE 0 END AS is_ret,
       |    CASE WHEN prev IS NOT NULL AND prev < wk - 1 THEN 1 ELSE 0 END
       |      AS is_res
       |  FROM (
       |    SELECT wk, lag(wk) OVER (PARTITION BY user_id ORDER BY wk)
       |      AS prev
       |    FROM uw)),
       |weekly AS (
       |  SELECT wk, CAST(count(*) AS BIGINT) AS wau,
       |    CAST(sum(is_new) AS BIGINT) AS n_new,
       |    CAST(sum(is_ret) AS BIGINT) AS n_retained,
       |    CAST(sum(is_res) AS BIGINT) AS n_resurrected
       |  FROM tagged GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(wk), max(wk))) AS wk FROM weekly),
       |dense AS (
       |  SELECT s.wk, COALESCE(w.wau, 0) AS wau,
       |    COALESCE(w.n_new, 0) AS n_new,
       |    COALESCE(w.n_retained, 0) AS n_retained,
       |    COALESCE(w.n_resurrected, 0) AS n_resurrected
       |  FROM spine s LEFT JOIN weekly w USING (wk))
       |SELECT wk, wau, n_new, n_retained, n_resurrected,
       |  COALESCE(lag(wau) OVER (ORDER BY wk), 0) - n_retained
       |    AS n_churned
       |FROM dense ORDER BY wk""".stripMargin

  // ---------------------------------------------------------------- q293
  /** Percentile rollup gap — the measured refutation of the
    * dashboard shortcut "average the daily p99s": percentiles do
    * not compose, and this emits the TRUE corpus p99 of event value
    * next to the mean and max of the daily p99s, with the relative
    * gap in ppm. Teams page on the averaged number all the time;
    * the honest fix (q276's mergeable sketch) is in this library,
    * and this query prices exactly what the shortcut gets wrong on
    * THIS corpus. All exact: per-day and global p99 via the rational
    * first-crossing at value grain (q209's device).
    *
    * Scale shape: one pass to (day × value) cells serves the daily
    * crossings; a second value-grain fold serves the global one;
    * the report is one row. */
  def q293PctlRollupGap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, dir)
      .select(expr(s"unix_micros(ts) div $dayUs").as("d"),
        expr("CAST(round(value * 1000000D) AS BIGINT)").as("v"))
    val cells = ev.groupBy($"d", $"v").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"d").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = cells
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"d")))
      .where($"cum" * 100L >= $"n" * 99L)
      .groupBy($"d").agg(min($"v").as("p99"))
    val gcells = cells.groupBy($"v").agg(sum($"cnt").as("cnt"))
    val wG = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = gcells
      .withColumn("cum", sum($"cnt").over(wG))
      .withColumn("n", sum($"cnt").over(Window.partitionBy()))
      .where($"cum" * 100L >= $"n" * 99L)
      .agg(min($"v").as("true_p99"))
    daily.agg(count(lit(1)).as("n_days"),
      expr("sum(p99) div count(1)").as("mean_daily_p99"),
      max($"p99").as("max_daily_p99"))
      .crossJoin(broadcast(global))
      .select($"n_days", $"true_p99", $"mean_daily_p99", $"max_daily_p99",
        expr("(1000000 * abs(mean_daily_p99 - true_p99)) div true_p99")
          .as("gap_ppm"))
  }

  private val q293Oracle =
    s"""WITH ev AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS d,
       |    CAST(round(value * 1000000) AS BIGINT) AS v
       |  FROM events),
       |cells AS (
       |  SELECT d, v, CAST(count(*) AS BIGINT) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |daily AS (
       |  SELECT d, CAST(min(v) AS BIGINT) AS p99 FROM (
       |    SELECT d, v,
       |      CAST(sum(cnt) OVER (PARTITION BY d ORDER BY v
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |      CAST(sum(cnt) OVER (PARTITION BY d) AS BIGINT) AS n
       |    FROM cells) WHERE cum * 100 >= n * 99 GROUP BY 1),
       |gcells AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM cells GROUP BY 1),
       |gl AS (
       |  SELECT CAST(min(v) AS BIGINT) AS true_p99 FROM (
       |    SELECT v,
       |      CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |        AS BIGINT) AS cum,
       |      CAST(sum(cnt) OVER () AS BIGINT) AS n
       |    FROM gcells) WHERE cum * 100 >= n * 99)
       |SELECT CAST(count(*) AS BIGINT) AS n_days,
       |  true_p99,
       |  CAST(sum(p99) // count(*) AS BIGINT) AS mean_daily_p99,
       |  CAST(max(p99) AS BIGINT) AS max_daily_p99,
       |  CAST((1000000 * abs(sum(p99) // count(*) - true_p99)) // true_p99
       |    AS BIGINT) AS gap_ppm
       |FROM daily, gl GROUP BY true_p99""".stripMargin

  // ---------------------------------------------------------------- q294
  /** Forecast-baseline report (MASE) — before anyone ships a model
    * on this series, the two no-skill baselines and their ratio:
    * naive (ŷ_t = y_{t−1}) vs seasonal-naive (ŷ_t = y_{t−7}) MAE on
    * the daily event counts, both evaluated on the SAME window
    * (t ≥ lo+7 — unequal windows would bias the comparison), and
    * MASE = MAE_snaive/MAE_naive in milli. Below 1000 means weekly
    * seasonality carries real signal (q169's profile is then worth
    * modeling); a model that can't beat the better of these two
    * numbers is noise. Exact integer MAEs in milli-count units.
    *
    * Scale shape: one partial agg to the dense day spine; the two
    * lag comparisons are spine self-joins; the report is one row. */
  def q294ForecastBaselines(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val daily = Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("d"))
      .agg(count(lit(1)).as("y"))
    val spine = daily.agg(min($"d").as("lo"), max($"d").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("d"),
        $"lo")
    val dense = spine.join(daily, Seq("d"), "left")
      .select($"d", $"lo", coalesce($"y", lit(0L)).as("y"))
    val l1 = dense.select(($"d" + 1L).as("d"), $"y".as("y1"))
    val l7 = dense.select(($"d" + 7L).as("d"), $"y".as("y7"))
    dense.join(l1, "d").join(l7, "d")
      .where($"d" >= $"lo" + 7L)
      .agg(count(lit(1)).as("n_eval"),
        sum(abs($"y" - $"y1")).as("ae1"),
        sum(abs($"y" - $"y7")).as("ae7"))
      .select($"n_eval",
        expr("(1000 * ae1) div n_eval").as("mae_naive_milli"),
        expr("(1000 * ae7) div n_eval").as("mae_snaive_milli"),
        expr("CASE WHEN ae1 = 0 THEN -1 ELSE (1000 * ae7) div ae1 END")
          .as("mase_milli"))
  }

  private val q294Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
       |spine AS (
       |  SELECT unnest(generate_series(lo, hi)) AS d, lo FROM bounds),
       |dense AS (
       |  SELECT s.d, s.lo, COALESCE(y.y, 0) AS y
       |  FROM spine s LEFT JOIN daily y USING (d)),
       |j AS (
       |  SELECT a.d, a.y, b.y AS y1, c.y AS y7
       |  FROM dense a JOIN dense b ON b.d = a.d - 1
       |  JOIN dense c ON c.d = a.d - 7
       |  WHERE a.d >= a.lo + 7),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_eval,
       |    CAST(sum(abs(y - y1)) AS BIGINT) AS ae1,
       |    CAST(sum(abs(y - y7)) AS BIGINT) AS ae7
       |  FROM j)
       |SELECT n_eval,
       |  (1000 * ae1) // n_eval AS mae_naive_milli,
       |  (1000 * ae7) // n_eval AS mae_snaive_milli,
       |  CASE WHEN ae1 = 0 THEN -1 ELSE (1000 * ae7) // ae1 END
       |    AS mase_milli
       |FROM agg""".stripMargin

  // ---------------------------------------------------------------- q295
  /** Qini uplift curve — does targeting by engagement actually buy
    * incremental conversions, the uplift question q218's lift curve
    * (response only) can't answer because it ignores the control
    * arm: users ranked by activity (exact ntile(10) under the
    * (n_events DESC, user_id) total order via
    * [[Ranks.withGlobalRank]]), per decile both arms' 24 h
    * conversions, incremental
    * uplift in ppm, and the cumulative Qini
    * Q(k) = CumConvT − CumConvC·CumNT/CumNC in milli-conversions.
    * A genuinely predictive targeting score front-loads Q; a flat
    * random-ish score walks to the overall effect. NULL (not a
    * crash) where a decile or prefix lacks control users.
    *
    * Scale shape: one pass to user grain; the decile cut is the
    * hierarchical rank, and the Qini prefix sums ride a broadcast
    * triangular join over the 10-row decile frame — no
    * single-partition WindowExec anywhere in the plan. */
  def q295QiniCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, dir)
    val su = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min(unix_micros($"ts")).as("s"))
    val act = ev.groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    val fp = ev.where($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p"))
      .join(su, "user_id").where($"p" >= $"s")
      .groupBy($"user_id").agg(min($"p").as("p"))
    val graded = su.join(act, "user_id").join(fp, Seq("user_id"), "left")
      .select($"user_id", ($"user_id" % 2).as("arm"), $"n_events",
        when($"p".isNotNull && $"p" - $"s" < dayUs, 1L).otherwise(0L)
          .as("conv"))
    // n_events DESC = negated-key ASC under the hierarchical rank
    val users = Ranks.withGlobalRank(graded, -$"n_events", $"user_id",
        "__gr", nName = "__gn")
      .withColumn("decile", Ranks.ntileExpr(10, "__gr", "__gn"))
    val cells = users.groupBy($"decile")
      .agg(sum(when($"arm" === 1, 1L).otherwise(0L)).as("nt"),
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("nc"),
        sum(when($"arm" === 1, $"conv").otherwise(0L)).as("ct"),
        sum(when($"arm" === 0, $"conv").otherwise(0L)).as("cc"))
    // cumulative prefix over the 10-row decile frame via a broadcast
    // triangular self-join (Ranks' offsets tier) — trivially small,
    // but keeps this plan free of single-partition WindowExec
    val prior = cells.select($"decile".as("d2"), $"nt".as("nt2"),
      $"nc".as("nc2"), $"ct".as("ct2"), $"cc".as("cc2"))
    cells.join(broadcast(prior), $"d2" <= $"decile")
      .groupBy($"decile")
      .agg(max($"nt").as("nt"), max($"nc").as("nc"),
        max($"ct").as("ct"), max($"cc").as("cc"),
        sum($"nt2").as("cnt"), sum($"nc2").as("cnc"),
        sum($"ct2").as("cct"), sum($"cc2").as("ccc"))
      .select($"decile", $"nt".as("n_treat"), $"nc".as("n_ctrl"),
        $"ct".as("conv_treat"), $"cc".as("conv_ctrl"),
        expr("""CASE WHEN nt = 0 OR nc = 0 THEN NULL
          |  ELSE (1000000 * ct) div nt - (1000000 * cc) div nc
          |END""".stripMargin).as("uplift_ppm"),
        expr("""CASE WHEN cnc = 0 THEN NULL
          |  ELSE 1000 * cct - (1000 * ccc * cnt) div cnc
          |END""".stripMargin).as("qini_milli"))
      .orderBy($"decile")
  }

  private val q295Oracle =
    s"""WITH su AS (
       |  SELECT user_id, min(epoch_us(ts)) AS s FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |act AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1),
       |fp AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS p
       |  FROM events e JOIN su ON e.user_id = su.user_id
       |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s
       |  GROUP BY 1),
       |users AS (
       |  SELECT su.user_id % 2 AS arm,
       |    CAST(ntile(10) OVER (ORDER BY act.n_events DESC, su.user_id)
       |      AS BIGINT) AS decile,
       |    CASE WHEN fp.p IS NOT NULL
       |        AND fp.p - su.s < ${86400L * 1000000L}
       |      THEN 1 ELSE 0 END AS conv
       |  FROM su JOIN act USING (user_id) LEFT JOIN fp USING (user_id)),
       |cells AS (
       |  SELECT decile,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS ct,
       |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS cc
       |  FROM users GROUP BY 1),
       |cum AS (
       |  SELECT decile, nt, nc, ct, cc,
       |    CAST(sum(nt) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cnt,
       |    CAST(sum(nc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cnc,
       |    CAST(sum(ct) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cct,
       |    CAST(sum(cc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS ccc
       |  FROM cells)
       |SELECT decile, nt AS n_treat, nc AS n_ctrl, ct AS conv_treat,
       |  cc AS conv_ctrl,
       |  CASE WHEN nt = 0 OR nc = 0 THEN NULL
       |    ELSE (1000000 * ct) // nt - (1000000 * cc) // nc
       |  END AS uplift_ppm,
       |  CASE WHEN cnc = 0 THEN NULL
       |    ELSE 1000 * cct - (1000 * ccc * cnt) // cnc
       |  END AS qini_milli
       |FROM cum ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q296
  /** Session-gap sensitivity sweep — how much the "30-minute
    * session" convention actually matters on THIS corpus: session
    * counts and events-per-session at gap thresholds of 5/15/30/60/
    * 120 minutes, all from ONE pass over the per-event gaps (a
    * session starts where the gap to the user's previous event
    * exceeds the threshold — so n_sessions is five conditional sums
    * over the same lag column, unpivoted through a literal spine;
    * the corpus is never widened 5×). A flat curve means the q32/
    * q139 sessionizers are robust here; a steep one means the
    * threshold IS a modeling decision and deserves a footnote.
    *
    * Scale shape: one user-key lag window, one 5-expression agg,
    * a 5-row spine unpivot. */
  def q296SessionSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val wU = Window.partitionBy($"user_id").orderBy($"tus")
    val gaps = Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"))
      .withColumn("gap", $"tus" - lag($"tus", 1).over(wU))
    def starts(mins: Long) =
      sum(when($"gap".isNull || $"gap" > mins * 60000000L, 1L)
        .otherwise(0L)).as(s"s$mins")
    val one = gaps.agg(countDistinct($"user_id").as("nu"),
      count(lit(1)).as("ne"),
      starts(5), starts(15), starts(30), starts(60), starts(120))
    val spine = Seq(5L, 15L, 30L, 60L, 120L).toDF("gap_mins")
    one.crossJoin(broadcast(spine))
      .select($"gap_mins", $"nu".as("n_users"), $"ne".as("n_events"),
        expr("""CASE gap_mins WHEN 5 THEN s5 WHEN 15 THEN s15
          |  WHEN 30 THEN s30 WHEN 60 THEN s60 ELSE s120 END"""
          .stripMargin).as("n_sessions"))
      .withColumn("events_per_session_milli",
        expr("(1000 * n_events) div n_sessions"))
      .orderBy($"gap_mins")
  }

  private val q296Oracle =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts))
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
      |  FROM events),
      |one AS (
      |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
      |    CAST(count(*) AS BIGINT) AS ne,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 5 * CAST(60000000 AS BIGINT)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS s5,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 15 * CAST(60000000 AS BIGINT)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS s15,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 30 * CAST(60000000 AS BIGINT)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS s30,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 60 * CAST(60000000 AS BIGINT)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS s60,
      |    CAST(sum(CASE WHEN gap IS NULL OR gap > 120 * CAST(60000000 AS BIGINT)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS s120
      |  FROM g),
      |spine AS (SELECT CAST(unnest([5, 15, 30, 60, 120]) AS BIGINT)
      |  AS gap_mins)
      |SELECT gap_mins, nu AS n_users, ne AS n_events,
      |  CASE gap_mins WHEN 5 THEN s5 WHEN 15 THEN s15 WHEN 30 THEN s30
      |    WHEN 60 THEN s60 ELSE s120 END AS n_sessions,
      |  (1000 * ne) // (CASE gap_mins WHEN 5 THEN s5 WHEN 15 THEN s15
      |    WHEN 30 THEN s30 WHEN 60 THEN s60 ELSE s120 END)
      |    AS events_per_session_milli
      |FROM one, spine ORDER BY gap_mins""".stripMargin

  // ---------------------------------------------------------------- q302
  /** Number of user-cohort slices in the q302 subgroup screen. */
  val fdrSlices = 12L

  /** BH-FDR rejection level, in micro (5%). */
  val fdrAlphaMicro = 50000L

  /** Benjamini–Hochberg FDR screen over per-slice subgroup tests —
    * the multiple-testing gate q207/q206 leave open: read out an
    * experiment in 12 user cohorts and ~46% of null experiments show
    * ≥1 "significant" slice at raw α=5%; BH's step-up caps the
    * expected FALSE-DISCOVERY share among flagged slices at α
    * (Benjamini & Hochberg 1995). Per slice (user cohort
    * `(user_id div 2) % 12`, orthogonal to the `% 2` arm split), the
    * 2×2 conversion table gets the exact integer χ²₁
    * (q207's cross-product form, denominator-first split so
    * BIGINT survives ~3·10⁵ users/slice; bigger slices sample first,
    * q49's trick), then a DISTRIBUTION-FREE p bound via Markov on
    * E[χ²₁]=1: p ≤ 1/χ² — conservative but exactly computable in
    * integers, and BH under a pointwise-conservative p bound still
    * controls FDR (rejections only shrink). The step-up itself is
    * [[bhFdrOf]] on any (slice, p_micro) frame: rank ascending,
    * adjusted p = suffix-min of p·m/rank (ties get equal adjusted
    * values regardless of tie-break — the suffix-min smooths them),
    * reject ⇔ p_adj ≤ α. Cohorts with an empty margin (no arm or
    * all-success/all-fail) carry zero evidence: χ²=0, p=1.
    *
    * Scale shape: one pass to user grain, one slice-grain agg
    * (12 rows), then the BH windows run on the 12-row frame —
    * everything after the first agg is slice-cardinality, i.e. free;
    * the corpus is never globally sorted. */
  def q302BhFdr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" &&
        $"value" > abSuccessValue, 1L).otherwise(0L)).as("success"))
      .select(expr(s"(user_id div 2) % $fdrSlices").as("slice"),
        ($"user_id" % 2).as("arm"), $"success")
      .groupBy($"slice")
      .agg(
        sum(when($"arm" === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 0L, $"success").otherwise(0L)).as("s_a"),
        sum(when($"arm" === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when($"arm" === 1L, $"success").otherwise(0L)).as("s_b"))
      .select($"slice", $"n_a", $"s_a", $"n_b", $"s_b",
        expr("""CASE WHEN n_a = 0 OR n_b = 0 OR s_a + s_b = 0
          |  OR (n_a - s_a) + (n_b - s_b) = 0 THEN 0
          |  ELSE (1000 * (n_a + n_b)
          |    * (((s_a * (n_b - s_b) - s_b * (n_a - s_a))
          |        * (s_a * (n_b - s_b) - s_b * (n_a - s_a)))
          |       div (n_a * n_b)))
          |    div ((s_a + s_b) * ((n_a - s_a) + (n_b - s_b)))
          |END""".stripMargin).as("chi2_milli"))
      .withColumn("p_micro",
        expr("least(1000000L, 1000000000L div greatest(chi2_milli, 1L))"))
    bhFdrOf(cells, fdrAlphaMicro)
      .orderBy($"slice")
  }

  /** The BH step-up on any frame carrying (slice, p_micro) — kept
    * separate so the spec can plant exact p vectors (the step-up
    * rescue, tie smoothing, the all-null corpus) and so any test's p
    * column plugs in. Appends m-scaled rank, adjusted p (suffix-min
    * of p·m/rank, capped at 1), and the α-level verdict; all other
    * input columns pass through. */
  private[ops] def bhFdrOf(tests: DataFrame, alphaMicro: Long): DataFrame = {
    val s = tests.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val m = Window.partitionBy()
    val asc = Window.orderBy($"p_micro", $"slice")
    val suffix = Window.orderBy($"p_micro".desc, $"slice".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tests
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("p_rank", row_number().over(asc))
      .withColumn("p_adj_micro",
        min(expr("least(1000000L, (p_micro * m) div p_rank)")).over(suffix))
      .withColumn("reject", $"p_adj_micro" <= alphaMicro)
      .drop("m")
  }

  private val q302Oracle =
    s"""WITH u AS (
       |  SELECT (user_id // 2) % $fdrSlices AS slice, user_id % 2 AS arm,
       |    max(CASE WHEN event_type = 'purchase' AND value > $abSuccessValue
       |      THEN 1 ELSE 0 END) AS success
       |  FROM events GROUP BY user_id),
       |c AS (
       |  SELECT slice,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 0 THEN success ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 1 THEN success ELSE 0 END) AS BIGINT) AS s_b
       |  FROM u GROUP BY slice),
       |t AS (
       |  SELECT slice, n_a, s_a, n_b, s_b,
       |    CAST(CASE WHEN n_a = 0 OR n_b = 0 OR s_a + s_b = 0
       |      OR (n_a - s_a) + (n_b - s_b) = 0 THEN 0
       |      ELSE (1000 * (n_a + n_b)
       |        * (((s_a * (n_b - s_b) - s_b * (n_a - s_a))
       |            * (s_a * (n_b - s_b) - s_b * (n_a - s_a)))
       |           // (n_a * n_b)))
       |        // ((s_a + s_b) * ((n_a - s_a) + (n_b - s_b)))
       |    END AS BIGINT) AS chi2_milli
       |  FROM c),
       |p AS (
       |  SELECT *, least(1000000, 1000000000 // greatest(chi2_milli, 1))
       |    AS p_micro,
       |    CAST(count(*) OVER () AS BIGINT) AS m,
       |    CAST(row_number() OVER (ORDER BY
       |      least(1000000, 1000000000 // greatest(chi2_milli, 1)), slice)
       |      AS BIGINT) AS p_rank
       |  FROM t)
       |SELECT slice, n_a, s_a, n_b, s_b, chi2_milli, p_micro, p_rank,
       |  CAST(min(least(1000000, (p_micro * m) // p_rank)) OVER (
       |    ORDER BY p_micro DESC, slice DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS p_adj_micro,
       |  min(least(1000000, (p_micro * m) // p_rank)) OVER (
       |    ORDER BY p_micro DESC, slice DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    <= $fdrAlphaMicro AS reject
       |FROM p ORDER BY slice""".stripMargin

  // ---------------------------------------------------------------- q303
  /** Kruskal–Wallis k-group rank test: does order value distribution
    * differ across the five o_orderpriority classes? The k-group
    * generalization of q270's two-arm rank-sum (q270 compares arms;
    * this asks whether ANY of k segments differs), on ranks so the
    * verdict is whale-proof where a k-group ANOVA on means is not.
    * Same doubled-midrank device at VALUE grain (cents of
    * o_totalprice — exact integers): per group g, 2·(rank sum)
    * R2_g = Σ_cells t_g·(2·lt + t + 1); then
    * H = [3·Σ R2_g²/n_g / (n(n+1)) − 3(n+1)] / C with the tie
    * correction C = 1 − Σ(t³−t)/(n³−n), all in milli fixed point
    * with mirrored floors (per-group 10³·R2_g² div n_g first, then
    * the two outer divisions; C as a milli ratio). Truncation can
    * leave a −ε where theory says 0, clamped to 0 in both engines.
    * 10³·R2_g² caps BIGINT at ~2·10⁴ rows — a bigger corpus tests on
    * a deterministic sample (q49's bucket trick), which is
    * statistically all it needs (q270's convention). Degenerate
    * inputs (n<2, k<2, or all-tied ⇒ C=0) emit the −1 sentinel.
    * Verdict at α=5% against [[TextOps.chi2CritMilli]] at dof=k−1
    * (the shared constant-table device).
    *
    * Scale shape: one pass to (group, value) cells; the global rank
    * device is a window over the DISTINCT-value spine (never a
    * corpus sort), and everything after the cell agg is
    * k-cardinality. */
  def q303KruskalWallis(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    kruskalWallisOf(Tables.orders(s, dir)
      .select($"o_orderpriority".as("g"),
        expr("CAST(round(o_totalprice * 100D) AS BIGINT)").as("v")))
  }

  /** The test on any (g, v BIGINT) frame — separated so the spec can
    * plant separated groups, an all-tied corpus, and a single-group
    * frame. */
  private[ops] def kruskalWallisOf(pts: DataFrame): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val gcells = pts.groupBy($"g", $"v").agg(count(lit(1)).as("tg"))
    val cells = gcells.groupBy($"v").agg(sum($"tg").as("t"))
    val wLess = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("lt", coalesce(sum($"t").over(wLess), lit(0L)))
    val groups = gcells.join(ranked, "v")
      .groupBy($"g")
      .agg(sum($"tg").as("ng"),
        sum($"tg" * (lit(2L) * $"lt" + $"t" + 1L)).as("r2"))
    val critCase = TextOps.chi2CritMilli
      .map { case (d, c) => s"WHEN $d THEN ${c}L" }.mkString(" ")
    groups
      .agg(sum($"ng").as("n"), count(lit(1)).as("k"),
        sum(expr("(1000 * r2 * r2) div ng")).as("a_milli"))
      .crossJoin(cells.agg(
        coalesce(sum($"t" * $"t" * $"t" - $"t"), lit(0L)).as("tie_term")))
      .select($"n", $"k", $"tie_term",
        expr("""CASE
          |  WHEN n < 2 OR k < 2 THEN -1
          |  WHEN 1000 - (1000 * tie_term) div (n * n * n - n) <= 0 THEN -1
          |  ELSE greatest(0L,
          |    (1000 * ((3 * a_milli) div (n * (n + 1)) - 3000 * (n + 1)))
          |    div (1000 - (1000 * tie_term) div (n * n * n - n)))
          |END""".stripMargin).as("h_milli"))
      .withColumn("crit_milli",
        expr(s"CASE k - 1 $critCase ELSE -1L END"))
      // an out-of-table dof (crit_milli = -1) must NOT read as
      // significant: any non-negative h would beat the -1 sentinel
      .withColumn("significant",
        $"crit_milli" >= 0L && $"h_milli" > $"crit_milli")
  }

  private val q303Oracle = {
    val critCase = TextOps.chi2CritMilli
      .map { case (d, c) => s"WHEN $d THEN $c" }.mkString(" ")
    s"""WITH pts AS (
       |  SELECT o_orderpriority AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders),
       |gcells AS (
       |  SELECT g, v, CAST(count(*) AS BIGINT) AS tg
       |  FROM pts GROUP BY 1, 2),
       |cells AS (
       |  SELECT v, CAST(sum(tg) AS BIGINT) AS t FROM gcells GROUP BY 1),
       |rk AS (
       |  SELECT v, t,
       |    COALESCE(CAST(sum(t) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS lt
       |  FROM cells),
       |grp AS (
       |  SELECT g, CAST(sum(tg) AS BIGINT) AS ng,
       |    CAST(sum(tg * (2 * lt + t + 1)) AS BIGINT) AS r2
       |  FROM gcells JOIN rk USING (v) GROUP BY g),
       |agg AS (
       |  SELECT CAST(sum(ng) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum((1000 * r2 * r2) // ng) AS BIGINT) AS a_milli,
       |    (SELECT COALESCE(CAST(sum(t * t * t - t) AS BIGINT), 0)
       |     FROM cells) AS tie_term
       |  FROM grp)
       |SELECT n, k, tie_term,
       |  CAST(CASE
       |    WHEN n < 2 OR k < 2 THEN -1
       |    WHEN 1000 - (1000 * tie_term) // (n * n * n - n) <= 0 THEN -1
       |    ELSE greatest(0,
       |      (1000 * ((3 * a_milli) // (n * (n + 1)) - 3000 * (n + 1)))
       |      // (1000 - (1000 * tie_term) // (n * n * n - n)))
       |  END AS BIGINT) AS h_milli,
       |  CAST(CASE k - 1 $critCase ELSE -1 END AS BIGINT) AS crit_milli,
       |  CASE k - 1 $critCase ELSE -1 END >= 0 AND CASE
       |    WHEN n < 2 OR k < 2 THEN -1
       |    WHEN 1000 - (1000 * tie_term) // (n * n * n - n) <= 0 THEN -1
       |    ELSE greatest(0,
       |      (1000 * ((3 * a_milli) // (n * (n + 1)) - 3000 * (n + 1)))
       |      // (1000 - (1000 * tie_term) // (n * n * n - n)))
       |  END > CASE k - 1 $critCase ELSE -1 END AS significant
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- q311
  /** Kendall tau-b between daily traffic and daily purchase revenue —
    * the PAIR-level monotone-association readout next to q274's
    * Spearman: tau asks "of all day pairs, what share move the same
    * way?", which survives any monotone rescaling of either series
    * and degrades more gracefully under ties (the -b denominator
    * discounts them symmetrically). Exact integer counting:
    * concordant/discordant from sign products over the day-pair
    * join, tie corrections n1/n2 from value-grain counts, and
    * tau_ppm = 10⁶(C−D) div floor(√((n0−n1)(n0−n2))) — ONE floored
    * sqrt of the product (q274's two-factor split would zero out at
    * day-grain magnitudes), NULL when either factor is 0 (a constant
    * series has no defined tau, q274's posture).
    *
    * Scale shape: the pair join is DAY grain — bounded by calendar
    * (d(d−1)/2 pairs for d days; 10 years ≈ 6.7M pairs), never by
    * rows; the corpus reduces map-side to d rows first. BIGINT holds
    * to ~3M days (C−D ≤ n0 ≤ 4.5·10¹² at 10⁶ ppm). */
  def q311KendallTau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    kendallTauOf(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(count(lit(1)).as("x"),
        sum(when($"event_type" === "purchase",
          expr("CAST(round(value * 1000000D) AS BIGINT)")).otherwise(0L))
          .as("y")))
  }

  /** tau-b on any (day, x, y) frame — separated so the spec can plant
    * perfect agreement, perfect inversion, ties, and a constant
    * column. */
  private[ops] def kendallTauOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val a = daily.select($"day".as("da"), $"x".as("xa"), $"y".as("ya"))
    val b = daily.select($"day".as("db"), $"x".as("xb"), $"y".as("yb"))
    val pairs = a.join(b, $"da" < $"db")
      .select((signum(($"xb" - $"xa").cast("double")).cast("long") *
        signum(($"yb" - $"ya").cast("double")).cast("long")).as("sgn"),
        ($"xa" === $"xb").cast("long").as("tx"),
        ($"ya" === $"yb").cast("long").as("ty"))
      .agg(sum(when($"sgn" === 1L, 1L).otherwise(0L)).as("concordant"),
        sum(when($"sgn" === -1L, 1L).otherwise(0L)).as("discordant"),
        count(lit(1)).as("n0"), sum($"tx").as("n1"), sum($"ty").as("n2"))
    pairs.select(
      $"concordant", $"discordant", $"n0", $"n1", $"n2",
      expr("""CASE WHEN n0 = n1 OR n0 = n2 THEN NULL
        |  ELSE (1000000 * (concordant - discordant)) div
        |    CAST(floor(sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE)))
        |      AS BIGINT)
        |END""".stripMargin).as("tau_ppm"))
  }

  private val q311Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(count(*) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |p AS (
       |  SELECT
       |    CAST(sum(CASE WHEN sign(b.x - a.x) * sign(b.y - a.y) = 1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       |    CAST(sum(CASE WHEN sign(b.x - a.x) * sign(b.y - a.y) = -1
       |      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       |    CAST(count(*) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS n2
       |  FROM daily a JOIN daily b ON a.day < b.day)
       |SELECT concordant, discordant, n0, n1, n2,
       |  CASE WHEN n0 = n1 OR n0 = n2 THEN NULL
       |    ELSE CAST((1000000 * (concordant - discordant)) //
       |      CAST(floor(sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE)))
       |        AS BIGINT) AS BIGINT)
       |  END AS tau_ppm
       |FROM p""".stripMargin

  // ---------------------------------------------------------------- q314
  /** −ln(α/2)·10⁶ for α = 0.05, frozen into BOTH engines: the Pettitt
    * approximation p ≈ 2·exp(−6K²/(N³+N²)) crosses α exactly when
    * the exponent passes this constant (the ln-discipline of q242's
    * critical-value table: the one transcendental leaves integer
    * arithmetic as a literal, not a runtime call). */
  val pettittCritMicro = 3688879L

  /** Pettitt changepoint test on the daily event-count series — the
    * RANK-based single-changepoint locator next to q163's CUSUM
    * (CUSUM tracks a known baseline mean; Pettitt asks "did the
    * distribution shift SOMEWHERE, and when?" with no baseline and
    * no normality assumption — the monitor you run on a series whose
    * scale you don't trust yet). U_t = 2·Σ_{i≤t} r_i − t(N+1) via
    * doubled midranks (q196's integer device; the identity to the
    * sign-pair definition holds exactly, ties via midranks), K =
    * max|U_t| over t < N, changepoint = earliest argmax day, and the
    * significance exponent 6K²·10⁶ div (N³+N²) compared against
    * [[pettittCritMicro]].
    *
    * Scale shape: corpus → day grain map-side; ranks are a
    * value-grain agg joined back (q274's device); ONE ordered
    * cumulative window over the day spine (calendar-bounded, the
    * accepted single-partition spine of q260/q294); one argmax pick
    * ends it. BIGINT safety: K ≤ N²/4 under a maximal level shift,
    * so the exponent divides K² by N FIRST (the q270
    * denominator-first split, mirrored in the oracle) — then
    * 6·10⁶·(K² div N) ≤ 6·10⁶·N³/16 stays in BIGINT to
    * N ≲ 2.8×10⁴ days (~77 years daily); the naive 6·10⁶·K² form
    * would overflow at N ≈ 2.2×10³ days (~6 years) under a strong
    * shift. The split's extra floor costs at most
    * 6·10⁶/(N²+N) micro-nats (≤ 6.5 milli-nats at N = 30) — both
    * engines floor identically. Beyond ~2.8×10⁴ days, re-grid to
    * weeks first (q193's convention). */
  def q314PettittChangepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    pettittOf(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  /** The test on any (day, n) frame — separated so the spec can plant
    * a clean level shift (argmax lands exactly on the break) and a
    * shuffled-constant null (insignificant). */
  private[ops] def pettittOf(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // doubled midranks at value grain: dr(v) = 2·(#less) + (#tied) + 1
    val wLess = Window.orderBy($"n").rowsBetween(Window.unboundedPreceding, -1)
    val dr = daily.groupBy($"n").agg(count(lit(1)).as("t"))
      .withColumn("lt", coalesce(sum($"t").over(wLess), lit(0L)))
      .select($"n", (lit(2L) * $"lt" + $"t" + 1L).as("dr"))
    val wDay = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    val u = daily.join(dr, "n")
      .withColumn("cum", sum($"dr").over(wDay))
      .withColumn("t", row_number().over(Window.orderBy($"day")).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
      .where($"t" < $"nn") // U_N ≡ 0 by construction; t ranges 1..N−1
      .select($"day", $"nn", ($"cum" - $"t" * ($"nn" + 1L)).as("u"))
    val wPick = Window.orderBy(abs($"u").desc, $"day".asc)
    u.withColumn("rk", row_number().over(wPick))
      .where($"rk" === 1)
      .select($"nn".as("n_days"), abs($"u").as("k_stat"),
        $"day".as("cp_day"), $"u".as("u_at_cp"),
        expr("(6000000 * ((u * u) div nn)) div (nn * nn + nn)")
          .as("exp_micro"))
      .withColumn("significant", $"exp_micro" > pettittCritMicro)
  }

  private val q314Oracle =
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |dc AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY 1),
       |dr AS (
       |  SELECT n, 2 * COALESCE(CAST(sum(t) OVER (ORDER BY n
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |    + t + 1 AS dr
       |  FROM dc),
       |u AS (
       |  SELECT day,
       |    CAST(count(*) OVER () AS BIGINT) + 1 AS np1,
       |    CAST(count(*) OVER () AS BIGINT) AS nn,
       |    CAST(sum(dr) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - CAST(row_number() OVER (ORDER BY day) AS BIGINT)
       |        * (CAST(count(*) OVER () AS BIGINT) + 1) AS uu,
       |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
       |  FROM daily JOIN dr USING (n)),
       |pick AS (
       |  SELECT nn, day, uu,
       |    row_number() OVER (ORDER BY abs(uu) DESC, day ASC) AS rk
       |  FROM u WHERE t < nn)
       |SELECT nn AS n_days, abs(uu) AS k_stat, day AS cp_day, uu AS u_at_cp,
       |  (6000000 * ((uu * uu) // nn)) // (nn * nn + nn) AS exp_micro,
       |  (6000000 * ((uu * uu) // nn)) // (nn * nn + nn) > $pettittCritMicro
       |    AS significant
       |FROM pick WHERE rk = 1""".stripMargin

  // ---------------------------------------------------------------- q318
  /** Wilcoxon signed-rank test on per-user activity, first half vs
    * second half of the observation window — the PAIRED rank test
    * completing the family: q270 (Mann–Whitney) compares two
    * INDEPENDENT arms, q283 (McNemar) pairs BINARY outcomes; this
    * pairs a continuous-ish metric within the same user, which is
    * the right tool for "did engagement shift?" because each user is
    * their own control (between-user variance, the thing that
    * swamps q270 on heavy-tailed users, cancels in the difference).
    * Mechanics: d_u = second-half − first-half event count (the
    * split point is the window midpoint, a broadcast scalar); zero
    * differences drop (the standard Wilcoxon treatment); doubled
    * midranks of |d| at VALUE grain (q196's integer device), the
    * doubled statistic D = Σ_{d>0} r₂ with E[D] = n(n+1)/2 and the
    * tie-corrected Var(D) = (2n(n+1)(2n+1) − Σ(t³−t))/12, and
    * χ²₍₁₎ = (D−E)²/Var(D) in milli via the denominator-first split
    * (both (D−E)² and Var(D) are divided by n(n+1) BEFORE the ratio
    * — q270's discipline; every floor is mirrored by the oracle, and
    * the magnitudes stay inside BIGINT to ~7×10⁴ pairs; a bigger
    * cohort samples first, q49's trick, which is statistically all a
    * rank test needs). Degenerate frames (n < 2, or the floored
    * variance hits 0 at tiny n where the normal approximation is
    * meaningless anyway) report the −1 sentinel.
    *
    * Scale shape: one pass to user grain (map-side combined), one to
    * |d|-VALUE grain; the rank device is a running count over
    * distinct |d| values, so no corpus-sized sort anywhere. */
  def q318WilcoxonSignedRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", unix_micros($"ts").as("tus"))
    val mid = ev.agg(
      expr("(min(tus) + max(tus)) div 2").as("mid_us"))
    wilcoxonOf(ev.crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg((sum(when($"tus" >= $"mid_us", 1L).otherwise(0L)) -
        sum(when($"tus" < $"mid_us", 1L).otherwise(0L))).as("d")))
  }

  /** The test on any (user, d BIGINT) frame — separated so the spec
    * can plant hand-ranked differences, ties, a symmetric null, and
    * the all-zero sentinel. */
  private[ops] def wilcoxonOf(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val crit = TextOps.chi2CritMilli.toMap.apply(1)
    val cells = pairs.filter($"d" =!= 0L)
      .select(abs($"d").as("ad"), ($"d" > 0L).as("pos"))
      .groupBy($"ad")
      .agg(count(lit(1)).as("t"),
        sum(when($"pos", 1L).otherwise(0L)).as("tp"))
    val wLess = Window.orderBy($"ad")
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("lt", coalesce(sum($"t").over(wLess), lit(0L)))
      .agg(sum($"t").as("n"), sum($"tp").as("n_pos"),
        sum($"tp" * (lit(2L) * $"lt" + $"t" + 1L)).as("w_plus_2"),
        sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
      .select($"n", $"n_pos", ($"n" - $"n_pos").as("n_neg"),
        $"w_plus_2", $"tie_term",
        expr(s"""CASE
          |  WHEN n IS NULL OR n < 2 THEN -1
          |  WHEN ((2 * n * (n + 1) * (2 * n + 1) - tie_term) div 12)
          |       div (n * (n + 1)) = 0 THEN -1
          |  ELSE (1000 * (((w_plus_2 - (n * (n + 1)) div 2)
          |                 * (w_plus_2 - (n * (n + 1)) div 2))
          |                div (n * (n + 1))))
          |       div (((2 * n * (n + 1) * (2 * n + 1) - tie_term) div 12)
          |            div (n * (n + 1)))
          |END""".stripMargin).as("chi2_milli"))
      .withColumn("significant", $"chi2_milli" > crit)
      .na.fill(-1L, Seq("n", "n_pos", "n_neg", "w_plus_2", "tie_term"))
  }

  private val q318Oracle = {
    val crit = TextOps.chi2CritMilli.toMap.apply(1)
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
       |mid AS (
       |  SELECT CAST((min(tus) + max(tus)) // 2 AS BIGINT) AS mid_us
       |  FROM ev),
       |pairs AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN tus >= mid_us THEN 1 ELSE 0 END)
       |      - sum(CASE WHEN tus < mid_us THEN 1 ELSE 0 END) AS BIGINT)
       |      AS d
       |  FROM ev, mid GROUP BY user_id),
       |cells AS (
       |  SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
       |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp
       |  FROM pairs WHERE d <> 0 GROUP BY 1),
       |rk AS (
       |  SELECT t, tp,
       |    COALESCE(CAST(sum(t) OVER (ORDER BY ad
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS lt
       |  FROM cells),
       |agg AS (
       |  SELECT CAST(sum(t) AS BIGINT) AS n,
       |    CAST(sum(tp) AS BIGINT) AS n_pos,
       |    CAST(sum(tp * (2 * lt + t + 1)) AS BIGINT) AS w_plus_2,
       |    CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
       |  FROM rk)
       |SELECT COALESCE(n, -1) AS n, COALESCE(n_pos, -1) AS n_pos,
       |  COALESCE(n - n_pos, -1) AS n_neg,
       |  COALESCE(w_plus_2, -1) AS w_plus_2,
       |  COALESCE(tie_term, -1) AS tie_term,
       |  CASE
       |    WHEN n IS NULL OR n < 2 THEN -1
       |    WHEN ((2 * n * (n + 1) * (2 * n + 1) - tie_term) // 12)
       |         // (n * (n + 1)) = 0 THEN -1
       |    ELSE (1000 * (((w_plus_2 - (n * (n + 1)) // 2)
       |                   * (w_plus_2 - (n * (n + 1)) // 2))
       |                  // (n * (n + 1))))
       |         // (((2 * n * (n + 1) * (2 * n + 1) - tie_term) // 12)
       |              // (n * (n + 1)))
       |  END AS chi2_milli,
       |  CASE
       |    WHEN n IS NULL OR n < 2 THEN -1
       |    WHEN ((2 * n * (n + 1) * (2 * n + 1) - tie_term) // 12)
       |         // (n * (n + 1)) = 0 THEN -1
       |    ELSE (1000 * (((w_plus_2 - (n * (n + 1)) // 2)
       |                   * (w_plus_2 - (n * (n + 1)) // 2))
       |                  // (n * (n + 1))))
       |         // (((2 * n * (n + 1) * (2 * n + 1) - tie_term) // 12)
       |              // (n * (n + 1)))
       |  END > $crit AS significant
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- q319
  /** Lags probed by the cross-correlation scan, in days each side. */
  val ccfMaxLag = 7

  /** Cross-correlation lead–lag scan between daily traffic (event
    * count) and daily purchase revenue — the DIRECTIONAL question
    * q311/q274 can't answer: they score same-day association; this
    * slides one series past the other (lags −7..+7) and reads WHERE
    * the correlation peaks ("revenue trails traffic by k days" = the
    * peak at +k), which is the lead-lag a capacity planner or a
    * marketing-mix model actually wants. Per lag: Pearson r over the
    * aligned day pairs in ppm, via the uncentered one-pass identity
    * r = (nΣxy−ΣxΣy)/√((nΣxx−(Σx)²)(nΣyy−(Σy)²)) — all-BIGINT on
    * quantized units (revenue in cents; counts raw), the 10³×10³
    * denominator split (q247's device) and the fixed-form floored
    * sqrt. Zero-variance sides report NULL r (q274's posture: an
    * undefined correlation is undefined, not 0); the peak flag marks
    * the max-r lag. Cents keep Σy² inside BIGINT to ~10⁵ days of
    * ~10⁹-cent daily revenue; a bigger corpus re-grids to dollars
    * (q202's discipline).
    *
    * Scale shape: ONE partial agg to the day grain; the lag fan-out
    * is day-frame × 15 literal lags (calendar-bounded, never
    * row-bounded) joined back to the day frame — everything after
    * the first agg is arithmetic on frames the size of the calendar,
    * and the dense spine keeps zero-traffic days as real points. */
  def q319CcfLeadLag(s: SparkSession, dir: String): DataFrame =
    ccfOf(ccfDailyProbe(s, dir))

  /** The corpus→day-grain reduction feeding [[ccfOf]], exposed so
    * PlanSpec can pin its scan pruning + map-side combine (the
    * localCheckpoint inside ccfOf truncates the visible plan —
    * q71's ivfAssignmentPlan device). */
  private[graft] def ccfDailyProbe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("d"))
      .agg(count(lit(1)).as("x"),
        sum(when($"event_type" === "purchase",
          expr("CAST(round(value * 100D) AS BIGINT)")).otherwise(0L))
          .as("y"))
  }

  /** The scan on any (d, x, y) day frame — separated so the spec can
    * plant a shifted-copy series (peak at the known lag) and a
    * constant side (NULL posture). Densifies the spine itself so
    * gap days count as zeros. */
  private[ops] def ccfOf(daily0: DataFrame): DataFrame = {
    val s = daily0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bounds = daily0.agg(min($"d").as("d0"), max($"d").as("d1"))
    val spine = bounds.select(
      explode(sequence($"d0", $"d1")).as("d"))
    // Calendar-bounded and read twice (both sides of the lag join):
    // checkpoint so the corpus agg beneath it runs once.
    val daily = spine.join(daily0, Seq("d"), "left")
      .na.fill(0L, Seq("x", "y"))
      .localCheckpoint()
    val lags = s.range(-ccfMaxLag, ccfMaxLag + 1L).toDF("lag")
    val pairs = daily.crossJoin(broadcast(lags))
      .join(daily.select($"d".as("d2"), $"x".as("xb"), $"y".as("yb")),
        $"d2" === $"d" + $"lag")
    val sums = pairs.groupBy($"lag").agg(
      count(lit(1)).as("n_pairs"),
      sum($"x").as("sx"), sum($"yb").as("sy"),
      sum($"x" * $"yb").as("sxy"),
      sum($"x" * $"x").as("sxx"), sum($"yb" * $"yb").as("syy"))
    val r = sums.select($"lag", $"n_pairs",
      expr("""CASE
        |  WHEN n_pairs < 2
        |    OR n_pairs * sxx - sx * sx = 0
        |    OR n_pairs * syy - sy * sy = 0 THEN NULL
        |  ELSE (1000 * (n_pairs * sxy - sx * sy)) div
        |    ((CAST(floor(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)))
        |        AS BIGINT)
        |      * CAST(floor(sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
        |        AS BIGINT)) div 1000)
        |END""".stripMargin).as("r_ppm"))
    r.withColumn("is_peak",
      $"r_ppm".isNotNull &&
        $"r_ppm" === max($"r_ppm").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .orderBy($"lag")
  }

  private val q319Oracle = {
    val dayUs = 86400L * 1000000L
    s"""WITH daily0 AS (
       |  SELECT epoch_us(ts) // $dayUs AS d,
       |    CAST(count(*) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(d), max(d))) AS d FROM daily0),
       |daily AS (
       |  SELECT s.d, COALESCE(y0.x, 0) AS x, COALESCE(y0.y, 0) AS y
       |  FROM spine s LEFT JOIN daily0 y0 USING (d)),
       |lags AS (
       |  SELECT unnest(generate_series(-$ccfMaxLag, $ccfMaxLag)) AS lag),
       |pairs AS (
       |  SELECT l.lag, a.x, b.y AS yb
       |  FROM daily a CROSS JOIN lags l
       |  JOIN daily b ON b.d = a.d + l.lag),
       |sums AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yb) AS BIGINT) AS sy,
       |    CAST(sum(x * yb) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(yb * yb) AS BIGINT) AS syy
       |  FROM pairs GROUP BY 1),
       |r AS (
       |  SELECT lag, n_pairs,
       |    CASE
       |      WHEN n_pairs < 2
       |        OR n_pairs * sxx - sx * sx = 0
       |        OR n_pairs * syy - sy * sy = 0 THEN NULL
       |      ELSE CAST((1000 * (n_pairs * sxy - sx * sy)) //
       |        ((CAST(floor(sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)))
       |            AS BIGINT)
       |          * CAST(floor(sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
       |            AS BIGINT)) // 1000) AS BIGINT)
       |    END AS r_ppm
       |  FROM sums)
       |SELECT lag, n_pairs, r_ppm,
       |  r_ppm IS NOT NULL AND r_ppm = (SELECT max(r_ppm) FROM r)
       |    AS is_peak
       |FROM r ORDER BY lag""".stripMargin
  }

  // ---------------------------------------------------------------- q324
  /** Jonckheere–Terpstra ordered-alternative trend test on order
    * value across the five o_orderpriority classes — the question
    * q303's Kruskal–Wallis can't pose: KW asks "do the groups
    * differ AT ALL?"; JT asks "do values RISE with priority?" and
    * buys real power by spending it only on the ordered alternative
    * (q284 is its binary-outcome sibling; this is the continuous
    * one). Doubled statistic 2J = Σ_{i<j} Σ_v t_j(v)·(2·lt_i(v) +
    * t_i(v)) — pairwise Mann–Whitney counts summed over ordered
    * group pairs, ties at half weight — computed from ONE window
    * pass over the value-grain spine with per-group conditional
    * running counts (never a corpus sort). E[2J] = (N²−Σn_i²)/2,
    * the standard null variance Var(J) = (N²(2N+3) −
    * Σn_i²(2n_i+3))/72, and χ²₍₁₎ in milli via the
    * denominator-first split (q318's device; mirrored floors both
    * engines). The no-tie variance is used and the TIE MASS IS
    * REPORTED (tie_pairs column) so the reader can see the
    * approximation's size — cents-grain order values make ties
    * measure-zero here; a heavily tied metric should use q303.
    * direction = sign(2J − E[2J]): +1 rising, −1 falling.
    *
    * Scale shape: one pass to order grain, one to value grain; the
    * value spine carries 5 running counters. BIGINT safety: the
    * squared numerator is never formed (see the split at the χ²
    * projection) — the binding term is 1000·(2J−E)² div N ≈ 160·N³,
    * safe to N ≈ 3.8×10⁵ orders; a bigger corpus samples first
    * (q49, q270's posture). */
  def q324JonckheereTrend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    jonckheereOf(Tables.orders(s, dir).select(
      expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
      expr("CAST(round(o_totalprice * 100D) AS BIGINT)").as("v")))
  }

  /** The test on any (g 1..5 ordered, v BIGINT) frame — separated so
    * the spec can plant perfectly rising, falling, and tied frames
    * with hand-computed 2J. */
  private[ops] def jonckheereOf(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tAggs = (1L to 5L).map(g =>
      sum(when($"g" === g, 1L).otherwise(0L)).as(s"t$g"))
    val cells = rows.groupBy($"v").agg(tAggs.head, tAggs.tail: _*)
    val wLess = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = cells.select(Seq($"v") ++
      (1L to 5L).map(g => $"t$g") ++
      (1L to 5L).map(g =>
        coalesce(sum(col(s"t$g")).over(wLess), lit(0L)).as(s"lt$g")): _*)
    // 2J contribution at value v: over ordered pairs i<j,
    // t_j(v) * (2*lt_i(v) + t_i(v)); tie_pairs counts the same-value
    // cross-group pairs the half-weight convention touches
    val pairs = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i, j)
    val j2Term = pairs.map { case (i, j) =>
      s"t$j * (2 * lt$i + t$i)" }.mkString(" + ")
    val tieTerm = pairs.map { case (i, j) => s"t$i * t$j" }.mkString(" + ")
    val nTerms = (1 to 5).map(g => s"sum(t$g)").mkString(" + ")
    val n2Terms = (1 to 5).map(g => s"sum(t$g) * sum(t$g)").mkString(" + ")
    val n3Terms = (1 to 5).map(g =>
      s"sum(t$g) * sum(t$g) * (2 * sum(t$g) + 3)").mkString(" + ")
    run.agg(
      expr(s"CAST(($nTerms) AS BIGINT)").as("n"),
      expr(s"CAST(($n2Terms) AS BIGINT)").as("sum_n2"),
      expr(s"CAST(($n3Terms) AS BIGINT)").as("sum_n3"),
      expr(s"CAST(sum($j2Term) AS BIGINT)").as("j2"),
      expr(s"CAST(sum($tieTerm) AS BIGINT)").as("tie_pairs"))
      // (2J−E)² itself overflows BIGINT at N ≈ 9×10⁴ (|2J−E| reaches
      // ~0.4·N² under a strong ordered trend), so the square is never
      // formed: with a = |2J−E| = q·n + r, a² div n = q·a + (r·a) div n
      // EXACTLY, and every intermediate stays ≤ ~0.4·N³ — safe to
      // N ≈ 3.8×10⁵ orders (the 1000× milli scaling binds first).
      // Mirrored in the oracle; a bigger corpus samples first (q49).
      .withColumn("e_j2", expr("(n * n - sum_n2) div 2"))
      .withColumn("a", abs($"j2" - $"e_j2"))
      .withColumn("vn", expr(
        "CASE WHEN n < 2 THEN 0 " +
          "ELSE ((n * n * (2 * n + 3) - sum_n3) div 18) div n END"))
      .select($"n", $"j2", $"tie_pairs", $"e_j2",
        expr("""CASE
          |  WHEN n < 2 OR vn = 0 THEN -1
          |  ELSE (1000 * ((a div n) * a + ((a % n) * a) div n)) div vn
          |END""".stripMargin).as("chi2_milli"),
        signum($"j2" - $"e_j2").cast("long").as("direction"))
      .withColumn("significant",
        $"chi2_milli" > TextOps.chi2CritMilli.toMap.apply(1))
  }

  private val q324Oracle = {
    val pairs = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i, j)
    val j2Term = pairs.map { case (i, j) =>
      s"t$j * (2 * lt$i + t$i)" }.mkString(" + ")
    val tieTerm = pairs.map { case (i, j) => s"t$i * t$j" }.mkString(" + ")
    val tCols = (1 to 5).map(g =>
      s"CAST(sum(CASE WHEN g = $g THEN 1 ELSE 0 END) AS BIGINT) AS t$g")
      .mkString(", ")
    val ltCols = (1 to 5).map(g =>
      s"""COALESCE(CAST(sum(t$g) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS lt$g""".stripMargin).mkString(", ")
    val nTerms = (1 to 5).map(g => s"sum(t$g)").mkString(" + ")
    val n2Terms = (1 to 5).map(g => s"sum(t$g) * sum(t$g)").mkString(" + ")
    val n3Terms = (1 to 5).map(g =>
      s"sum(t$g) * sum(t$g) * (2 * sum(t$g) + 3)").mkString(" + ")
    val crit = TextOps.chi2CritMilli.toMap.apply(1)
    s"""WITH rows_ AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders),
       |cells AS (SELECT v, $tCols FROM rows_ GROUP BY 1),
       |run AS (SELECT *, $ltCols FROM cells),
       |agg AS (
       |  SELECT CAST($nTerms AS BIGINT) AS n,
       |    CAST($n2Terms AS BIGINT) AS sum_n2,
       |    CAST($n3Terms AS BIGINT) AS sum_n3,
       |    CAST(sum($j2Term) AS BIGINT) AS j2,
       |    CAST(sum($tieTerm) AS BIGINT) AS tie_pairs
       |  FROM run),
       |agg2 AS (
       |  SELECT n, j2, tie_pairs,
       |    (n * n - sum_n2) // 2 AS e_j2,
       |    abs(j2 - (n * n - sum_n2) // 2) AS a,
       |    CASE WHEN n < 2 THEN 0
       |      ELSE ((n * n * (2 * n + 3) - sum_n3) // 18) // n END AS vn
       |  FROM agg)
       |SELECT n, j2, tie_pairs, e_j2,
       |  CASE
       |    WHEN n < 2 OR vn = 0 THEN -1
       |    ELSE (1000 * ((a // n) * a + ((a % n) * a) // n)) // vn
       |  END AS chi2_milli,
       |  CAST(sign(j2 - e_j2) AS BIGINT) AS direction,
       |  CASE
       |    WHEN n < 2 OR vn = 0 THEN -1
       |    ELSE (1000 * ((a // n) * a + ((a % n) * a) // n)) // vn
       |  END > $crit AS significant
       |FROM agg2""".stripMargin
  }

  // ---------------------------------------------------------------- q325
  /** Cliff's delta effect size between the two arms' per-user
    * revenue — the MAGNITUDE companion q270's p-value refuses to be:
    * δ = P(X₁ > X₀) − P(X₀ > X₁) ∈ [−1, 1], a dominance probability
    * that survives heavy tails and means nothing can hide behind a
    * huge n (q207's mean gap is unit-laden, q270's χ² grows with n
    * even for trivial effects — δ is the number you compare across
    * experiments). Exactly 2U₁/(n₁n₂) − 1 from the SAME value-grain
    * doubled-midrank device as q270, so δ_milli = (1000·(2U₁ −
    * n₁n₂)) div (n₁n₂) is exact BIGINT with mirrored truncation.
    * The conventional magnitude bands (Romano et al. 2006:
    * negligible < 0.147, small < 0.33, medium < 0.474, else large)
    * are frozen milli literals in both engines.
    *
    * Scale shape: q270's — one user-grain pass, one value-grain
    * pass, a running count over distinct values; no corpus sort. */
  def q325CliffsDelta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cliffsDeltaOf(Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase",
        expr("CAST(round(value * 1000000D) AS BIGINT)")).otherwise(0L))
        .as("v"))
      .select(($"user_id" % 2).as("arm"), $"v"))
  }

  /** The effect size on any (arm 0/1, v BIGINT) frame — separated so
    * the spec can plant full dominance (±1000), a null interleave
    * (0), and the one-armed sentinel. */
  private[ops] def cliffsDeltaOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cells = users.groupBy($"v")
      .agg(count(lit(1)).as("t"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("t1"))
    val wLess = Window.orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, -1)
    cells
      .withColumn("lt", coalesce(sum($"t").over(wLess), lit(0L)))
      .agg(sum($"t").as("n"), sum($"t1").as("n1"),
        sum($"t1" * (lit(2L) * $"lt" + $"t" + 1L)).as("r1_2"))
      .select($"n1", ($"n" - $"n1").as("n2"),
        ($"r1_2" - $"n1" * ($"n1" + 1L)).as("u1_2"))
      .select($"n1", $"n2", $"u1_2",
        expr("""CASE WHEN n1 = 0 OR n2 = 0 THEN -2000
          |  ELSE (1000 * (u1_2 - n1 * n2)) div (n1 * n2)
          |END""".stripMargin).as("delta_milli"))
      .withColumn("magnitude", expr(
        """CASE WHEN delta_milli = -2000 THEN 'undefined'
          |  WHEN abs(delta_milli) < 147 THEN 'negligible'
          |  WHEN abs(delta_milli) < 330 THEN 'small'
          |  WHEN abs(delta_milli) < 474 THEN 'medium'
          |  ELSE 'large' END""".stripMargin))
  }

  private val q325Oracle =
    """WITH users AS (
      |  SELECT user_id % 2 AS arm,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS v
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
      |  FROM users GROUP BY 1),
      |rk AS (
      |  SELECT t, t1,
      |    COALESCE(CAST(sum(t) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS lt
      |  FROM cells),
      |agg AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(t1) AS BIGINT) AS n1,
      |    CAST(sum(t1 * (2 * lt + t + 1)) AS BIGINT) AS r1_2
      |  FROM rk),
      |d AS (
      |  SELECT n1, n - n1 AS n2, r1_2 - n1 * (n1 + 1) AS u1_2 FROM agg),
      |f AS (
      |  SELECT n1, n2, u1_2,
      |    CASE WHEN n1 = 0 OR n2 = 0 THEN -2000
      |      ELSE (1000 * (u1_2 - n1 * n2)) // (n1 * n2)
      |    END AS delta_milli
      |  FROM d)
      |SELECT n1, n2, u1_2, delta_milli,
      |  CASE WHEN delta_milli = -2000 THEN 'undefined'
      |    WHEN abs(delta_milli) < 147 THEN 'negligible'
      |    WHEN abs(delta_milli) < 330 THEN 'small'
      |    WHEN abs(delta_milli) < 474 THEN 'medium'
      |    ELSE 'large' END AS magnitude
      |FROM f""".stripMargin

  // ---------------------------------------------------------------- q327
  /** Friedman test across the five order priorities, blocked by
    * nation — the WITHIN-BLOCK k-treatment rank test closing the
    * family: q270/q325 compare two independent arms, q303 k
    * independent groups, q318 two paired halves; Friedman asks "do
    * treatments differ CONSISTENTLY across blocks?" where each
    * nation is its own control (cross-nation scale differences,
    * which would swamp q303 here, cancel inside the block — the
    * blocked design's whole point). Metric: priority-j revenue
    * cents inside nation b (dense 25×5 spine, honest zeros); ranks
    * within each block via doubled midranks (the tie device at
    * block grain — blocks are k rows, so the per-block window is
    * domain-sized); χ²_F = 3·ΣR₂ⱼ²·10³ div (n·k·(k+1)) −
    * 3000·n·(k+1) with mirrored floors, verdict against the shared
    * crit table at dof = k−1. The standard no-tie form is used and
    * the within-block tie mass is REPORTED (cents totals make exact
    * ties measure-zero; an all-tied block contributes identical
    * midranks to every treatment and cancels in ΣR², so the stat
    * degrades gracefully rather than silently inflating).
    *
    * Scale shape: one pass to the (block × treatment) cell grain —
    * bounded by DOMAIN — then windows over k-row blocks and a
    * treatment-grain agg; the corpus shuffles only its cells,
    * map-side combined. */
  def q327Friedman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select($"c_custkey", $"c_nationkey".as("b"))),
        $"o_custkey" === $"c_custkey")
      .select($"b",
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("j"),
        expr("CAST(round(o_totalprice * 100D) AS BIGINT)").as("cents"))
      .groupBy($"b", $"j").agg(sum($"cents").as("x"))
      // domain-bounded, read twice (block list + the spine join)
      .localCheckpoint()
    // dense spine: every block × every treatment, zero-filled
    val spine = cells.select($"b").distinct()
      .crossJoin(cells.sparkSession.range(1, 6).toDF("j"))
    friedmanOf(spine.join(cells, Seq("b", "j"), "left")
      .na.fill(0L, Seq("x")))
  }

  /** The test on any dense (b, j, x) frame (every block carries every
    * treatment exactly once) — separated so the spec can plant
    * consistent orderings, a tied block, and a null shuffle. */
  private[ops] def friedmanOf(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // RANGE, not ROWS: a ROWS frame would count earlier-sorted
    // tie-peers and make tied midranks order-dependent
    val wLess = Window.partitionBy($"b").orderBy($"x")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wTie = Window.partitionBy($"b", $"x")
    // doubled midrank of treatment j inside block b
    val ranked = rows
      .withColumn("t", count(lit(1)).over(wTie))
      .withColumn("lt", coalesce(
        sum(lit(1L)).over(wLess), lit(0L)))
    val critCase = TextOps.chi2CritMilli
      .map { case (d, c) => s"WHEN $d THEN ${c}L" }
      .mkString("CASE k - 1 ", " ", " ELSE -1L END")
    ranked
      .withColumn("r2", lit(2L) * $"lt" + $"t" + 1L)
      .withColumn("tie", $"t" - 1L)
      .groupBy($"j")
      .agg(sum($"r2").as("rj2"), sum($"tie").as("ties"),
        count(lit(1)).as("nb"))
      .agg(count(lit(1)).as("k"), max($"nb").as("n"),
        sum($"rj2" * $"rj2").as("sum_rj2_sq"),
        expr("sum(ties) div 2").as("tie_pairs"))
      .select($"k", $"n", $"tie_pairs",
        expr("""CASE WHEN n < 2 OR k < 2 THEN -1
          |  ELSE greatest(0,
          |    (3000 * sum_rj2_sq) div (n * k * (k + 1))
          |    - 3000 * n * (k + 1))
          |END""".stripMargin).as("chi2_milli"))
      .withColumn("crit_milli", expr(critCase))
      // same guard as q303: crit_milli = -1 (dof outside the 1–24
      // table) must force significant = false, not "any chi2 wins" —
      // the shipped q327 is always k = 5/dof = 4, but this private
      // helper accepts arbitrary k
      .withColumn("significant",
        $"crit_milli" >= 0L && $"chi2_milli" > $"crit_milli")
  }

  private val q327Oracle = {
    val critCase = TextOps.chi2CritMilli
      .map { case (d, c) => s"WHEN $d THEN $c" }
      .mkString("CASE k - 1 ", " ", " ELSE -1 END")
    s"""WITH cells0 AS (
       |  SELECT c.c_nationkey AS b,
       |    CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS j,
       |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS x
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY 1, 2),
       |spine AS (
       |  SELECT b, j FROM (SELECT DISTINCT b FROM cells0),
       |    (SELECT unnest(range(1, 6)) AS j)),
       |cells AS (
       |  SELECT s.b, s.j, COALESCE(c.x, 0) AS x
       |  FROM spine s LEFT JOIN cells0 c ON s.b = c.b AND s.j = c.j),
       |rk AS (
       |  SELECT b, j,
       |    CAST(count(*) OVER (PARTITION BY b, x) AS BIGINT) AS t,
       |    COALESCE(CAST(count(*) OVER (PARTITION BY b ORDER BY x
       |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS lt
       |  FROM cells),
       |pj AS (
       |  SELECT j, CAST(sum(2 * lt + t + 1) AS BIGINT) AS rj2,
       |    CAST(sum(t - 1) AS BIGINT) AS ties,
       |    CAST(count(*) AS BIGINT) AS nb
       |  FROM rk GROUP BY 1),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, max(nb) AS n,
       |    CAST(sum(rj2 * rj2) AS BIGINT) AS sum_rj2_sq,
       |    CAST(sum(ties) // 2 AS BIGINT) AS tie_pairs
       |  FROM pj)
       |SELECT k, n, tie_pairs,
       |  CASE WHEN n < 2 OR k < 2 THEN -1
       |    ELSE greatest(0,
       |      (3000 * sum_rj2_sq) // (n * k * (k + 1))
       |      - 3000 * n * (k + 1))
       |  END AS chi2_milli,
       |  CAST($critCase AS BIGINT) AS crit_milli,
       |  $critCase >= 0 AND CASE WHEN n < 2 OR k < 2 THEN -1
       |    ELSE greatest(0,
       |      (3000 * sum_rj2_sq) // (n * k * (k + 1))
       |      - 3000 * n * (k + 1))
       |  END > $critCase AS significant
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------- q329
  /** Split-conformal miscoverage level: intervals target ≥ 90%
    * marginal coverage, the guarantee level conformal papers
    * conventionally demonstrate (Vovk et al. 2005; Lei et al. 2018). */
  val conformalAlphaPct = 10L

  /** Split-conformal prediction intervals around the seasonal-naive
    * forecaster — the DISTRIBUTION-FREE uncertainty quantification
    * the eval family lacks: q294 scores the forecaster's point error
    * (MASE), q205 bootstraps a CI for a mean; conformal wraps ANY
    * predictor's point forecasts in intervals with a finite-sample
    * marginal-coverage guarantee that needs no distributional
    * assumption at all — exactly the honest wrapper for the naive
    * baselines a pipeline actually runs. Mechanics (Lei et al.
    * 2018's split recipe): ŷ(d) = y(d−7) on the dense day spine;
    * the PREDICTABLE days split in half by time order; calibration
    * absolute residuals ranked; q̂ = the ⌈(1−α)(n_cal+1)⌉-th
    * smallest (the +1 is what buys the finite-sample guarantee);
    * test-half coverage of [ŷ−q̂, ŷ+q̂] reported in ppm against the
    * 900 000 target. All exact integers: counts, integer ranks, one
    * ordered pick — no quantile interpolation anywhere. k > n_cal
    * (too few calibration days at this α) reports the −1 sentinel
    * rather than an infinite interval.
    *
    * Scale shape: ONE corpus→day partial agg; everything after is
    * calendar-bounded (spine self-join at lag 7, one ordered window
    * over the calibration frame, one test-grain agg). */
  def q329ConformalIntervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    conformalOf(Tables.events(s, dir)
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("d"))
      .agg(count(lit(1)).as("y")))
  }

  /** The recipe on any (d, y) day frame — separated so the spec can
    * plant an exactly-periodic series (q̂ = 0, coverage 10⁶), a
    * test-half shock (hand-exact coverage drop), and the
    * too-few-days sentinel. Densifies the spine itself. */
  private[ops] def conformalOf(daily0: DataFrame): DataFrame = {
    val s = daily0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bounds = daily0.agg(min($"d").as("d0"), max($"d").as("d1"))
    val spine = bounds.select(explode(sequence($"d0", $"d1")).as("d"))
    val daily = spine.join(daily0, Seq("d"), "left")
      .na.fill(0L, Seq("y"))
      .localCheckpoint()
    val pred = daily.join(
      daily.select(($"d" + 7L).as("d"), $"y".as("y_hat")), Seq("d"))
      .withColumn("r", abs($"y" - $"y_hat"))
      .withColumn("rn", row_number().over(Window.orderBy($"d")))
      .crossJoin(broadcast(daily.agg(
        expr("(count(1) - 7) div 2").as("n_cal"))))
      .localCheckpoint()
    val k = expr(s"((100 - $conformalAlphaPct) * (n_cal + 1) + 99) div 100")
    // always one row — NULL q_hat when k exceeds n_cal, so the test
    // rows survive the join and the sentinel path matches the oracle
    val qhat = pred.where($"rn" <= $"n_cal")
      .withColumn("rr", row_number().over(Window.orderBy($"r", $"d")))
      .where($"rr" === k)
      .agg(max($"r").as("q_hat"))
    val test = pred.where($"rn" > $"n_cal")
    test.crossJoin(broadcast(qhat))
      .agg(max($"n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        max($"q_hat").as("q_hat"),
        sum(when($"r" <= $"q_hat", 1L).otherwise(0L)).as("n_covered"))
      .select($"n_cal", $"n_test",
        coalesce($"q_hat", lit(-1L)).as("q_hat"),
        coalesce($"n_covered", lit(-1L)).as("n_covered"),
        coalesce(expr("(1000000 * n_covered) div n_test"), lit(-1L))
          .as("coverage_ppm"))
      .withColumn("target_ppm", lit((100L - conformalAlphaPct) * 10000L))
  }

  private val q329Oracle = {
    val dayUs = 86400L * 1000000L
    s"""WITH daily0 AS (
       |  SELECT epoch_us(ts) // $dayUs AS d,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series(min(d), max(d))) AS d FROM daily0),
       |daily AS (
       |  SELECT s.d, COALESCE(y0.y, 0) AS y
       |  FROM spine s LEFT JOIN daily0 y0 USING (d)),
       |nc AS (
       |  SELECT CAST((count(*) - 7) // 2 AS BIGINT) AS n_cal FROM daily),
       |pred AS (
       |  SELECT a.d, abs(a.y - b.y) AS r,
       |    row_number() OVER (ORDER BY a.d) AS rn, nc.n_cal
       |  FROM daily a JOIN daily b ON a.d = b.d + 7, nc),
       |qh AS (
       |  SELECT r AS q_hat FROM (
       |    SELECT r, row_number() OVER (ORDER BY r, d) AS rr,
       |      ((100 - $conformalAlphaPct) * (n_cal + 1) + 99) // 100 AS k
       |    FROM pred WHERE rn <= n_cal)
       |  WHERE rr = k),
       |ag AS (
       |  SELECT max(p.n_cal) AS n_cal,
       |    CAST(count(*) AS BIGINT) AS n_test,
       |    max(q.q_hat) AS q_hat,
       |    CAST(sum(CASE WHEN p.r <= q.q_hat THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_covered
       |  FROM (SELECT * FROM pred WHERE rn > n_cal) p
       |  LEFT JOIN qh q ON TRUE)
       |SELECT n_cal, n_test,
       |  COALESCE(q_hat, -1) AS q_hat,
       |  COALESCE(n_covered, -1) AS n_covered,
       |  COALESCE((1000000 * n_covered) // n_test, -1) AS coverage_ppm,
       |  CAST(${(100L - conformalAlphaPct) * 10000L} AS BIGINT)
       |    AS target_ppm
       |FROM ag""".stripMargin
  }

  // ---------------------------------------------------------------- q349
  /** Micro-seconds per interpolation week. */
  val interpWeekUs = 7L * 24 * 3600 * 1000000L

  /** Interpolating as-of join — the enrichment q18's nearest-match
    * as-of cannot express: each purchase event reads the corpus-wide
    * weekly spend level AT ITS INSTANT, linearly interpolated
    * between the bracketing week totals (the pandas
    * merge_asof-then-interpolate composite, as one relational
    * plan). The fraction-through-week is quantized to millesimals
    * (`off_k = (1000·off_us) div week_us`, 0–999) so
    * `v_w + ((v_{w+1} − v_w) · off_k) div 1000` stays exact BIGINT
    * at ANY corpus scale — the naive `Δv·off_us` product overflows
    * at sf0.1 already (Δv ~ 5·10⁸ cents × 6·10¹¹ µs), the quantized
    * form is safe to |Δv| ≈ 9·10¹⁵ cents. Probes in the last
    * observed week have no right bracket and are excluded by the
    * inner join (interpolation needs both ends; a LOCF variant is
    * q223's device) — disclosed, not silent: the join IS the
    * contract.
    *
    * Scale shape: the weekly series is a dimension-sized agg
    * (weeks, not rows) joined BROADCAST twice (left and right
    * bracket); probes never shuffle. Values ride as exact cents via
    * the DECIMAL route. */
  def q349InterpolatedAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", $"event_type", unix_micros($"ts").as("ts_us"),
        ($"value".cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val weekly = ev
      .groupBy(expr(s"ts_us div $interpWeekUs").as("w"))
      .agg(sum($"cents").as("v"))
    val probes = ev.where($"event_type" === "purchase")
      .select($"event_id", $"ts_us",
        expr(s"ts_us div $interpWeekUs").as("w"),
        expr(s"(1000 * (ts_us % $interpWeekUs)) div $interpWeekUs").as("off_k"))
    probes
      .join(broadcast(weekly), Seq("w"))
      .join(broadcast(weekly.select(($"w" - 1).as("w"), $"v".as("v_next"))),
        Seq("w"))
      .select($"event_id", $"w", $"off_k", $"v".as("week_cents"),
        $"v_next".as("next_week_cents"),
        ($"v" + expr("((v_next - v) * off_k) div 1000")).as("interp_cents"))
      .orderBy($"event_id")
  }

  private val q349Oracle =
    s"""WITH ev AS (
       |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
       |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |wk AS (
       |  SELECT ts_us // $interpWeekUs AS w, CAST(sum(cents) AS BIGINT) AS v
       |  FROM ev GROUP BY 1),
       |pr AS (
       |  SELECT event_id, ts_us // $interpWeekUs AS w,
       |    (1000 * (ts_us % $interpWeekUs)) // $interpWeekUs AS off_k
       |  FROM ev WHERE event_type = 'purchase')
       |SELECT pr.event_id, pr.w, pr.off_k,
       |  a.v AS week_cents, b.v AS next_week_cents,
       |  a.v + ((b.v - a.v) * pr.off_k) // 1000 AS interp_cents
       |FROM pr
       |JOIN wk a ON a.w = pr.w
       |JOIN wk b ON b.w = pr.w + 1
       |ORDER BY pr.event_id""".stripMargin

  // ---------------------------------------------------------------- q391
  /** Jackknife buckets. 32 keeps every intermediate inside BIGINT by
    * a wide margin (see the bound note on [[jackknifeOf]]) while
    * giving the variance estimate 31 degrees of freedom — the
    * standard delete-one-GROUP grid when the unit of randomization
    * (a customer) is coarser than the unit of measurement (an
    * order). */
  val jackBuckets = 32

  /** Delete-one-bucket jackknife for a RATIO metric (cents per
    * order) — the variance device every experiment readout over a
    * ratio needs and a naive per-row variance gets WRONG twice: a
    * ratio of sums is not a mean of rows (no row-level variance
    * exists), and orders of one customer are correlated (the
    * clustered unit must leave together). Customers hash (salted md5,
    * the q49 engine-portable draw) into [[jackBuckets]] buckets; each
    * leave-one-out estimate θ̂₍ᵢ₎ = (S_rev − revᵢ) div (S_cnt −
    * cntᵢ) comes from the TOTALS minus the bucket row — one
    * bucket-grain aggregate, never a second corpus pass per
    * replicate, which is what makes 32 replicates at 100 TB cost one
    * shuffle of 32 rows. Variance in exact integers via the
    * multiply-through identity Σ(θᵢ−θ̄)² = (B·Σθᵢ² − (Σθᵢ)²)/B, so
    * var_jack = (B−1)·(B·Σθᵢ² − (Σθᵢ)²) div B² — no fractional mean
    * ever materializes. CI = θ̂ ± 2·se, se = floored √var (the q247
    * device).
    *
    * BIGINT bound (disclosed exactly, the q314 lesson): the largest
    * intermediates are B·Σθᵢ² and (Σθᵢ)², both ≈ B²·θ̄²; with
    * B = 32, B²·θ̄² ≤ 9.2·10¹⁸ requires θ̄ ≤ 9.5·10⁷ cents ≈ $950k
    * mean ticket — ~600× TPC-H's ~$150k orders; re-grid to coarser
    * money units if a corpus ever nears it. */
  def q391JackknifeRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    jackknifeOf(Tables.orders(s, dir)
      .select(
        (conv(substring(md5(concat(lit("jack:"), $"o_custkey".cast("string"))),
          1, 4), 16, 10).cast("long") % jackBuckets).as("b"),
        expr("CAST(round(o_totalprice * 100D) AS BIGINT)").as("rev")))
  }

  /** The jackknife on any (b, rev) frame — separated so the spec can
    * plant hand-computable buckets and the degenerate single-bucket
    * frame (B < 2 ⇒ −1 sentinels: no replicate variance exists). */
  private[ops] def jackknifeOf(rows: DataFrame): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    val buckets = rows.groupBy($"b")
      .agg(sum($"rev").as("brev"), count(lit(1)).as("bcnt"))
    val tot = buckets.agg(sum($"brev").as("srev"), sum($"bcnt").as("scnt"),
      count(lit(1)).as("nb"))
    buckets.crossJoin(broadcast(tot))
      .select($"nb", $"srev", $"scnt",
        // B = 1 leaves an empty complement — θᵢ undefined; emit 0,
        // the readout is all sentinels in that branch anyway
        expr("""CASE WHEN nb < 2 THEN 0L
          |  ELSE (srev - brev) div (scnt - bcnt) END""".stripMargin)
          .as("theta_i"))
      .groupBy($"nb", $"srev", $"scnt")
      .agg(sum($"theta_i").as("s_theta"),
        sum($"theta_i" * $"theta_i").as("s_theta2"))
      // Σ(θᵢ−θ̄)² = (BΣθ² − S²)/B (multiply-through identity), so
      // var_jack = (B−1)/B of it = (B−1)(BΣθ² − S²)/B²
      .select(
        $"nb".as("n_buckets"),
        expr("srev div scnt").as("theta_cents"),
        expr("""CASE WHEN nb < 2 THEN -1 ELSE
          |  ((nb - 1) * (nb * s_theta2 - s_theta * s_theta))
          |  div (nb * nb) END""".stripMargin).as("jack_var_cents2"))
      .withColumn("jack_se_cents",
        expr("""CASE WHEN jack_var_cents2 < 0 THEN -1 ELSE
          |  CAST(floor(sqrt(CAST(jack_var_cents2 AS DOUBLE))) AS BIGINT)
          |END""".stripMargin))
      .withColumn("ci_lo_cents",
        when($"jack_se_cents" < 0, lit(-1L))
          .otherwise($"theta_cents" - lit(2L) * $"jack_se_cents"))
      .withColumn("ci_hi_cents",
        when($"jack_se_cents" < 0, lit(-1L))
          .otherwise($"theta_cents" + lit(2L) * $"jack_se_cents"))
  }

  private val q391Oracle =
    s"""WITH rows0 AS (
       |  SELECT ('0x' || substr(md5('jack:' || CAST(o_custkey AS VARCHAR)),
       |      1, 4))::BIGINT % $jackBuckets AS b,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS rev
       |  FROM orders),
       |bk AS (
       |  SELECT b, CAST(sum(rev) AS BIGINT) AS brev,
       |    CAST(count(*) AS BIGINT) AS bcnt
       |  FROM rows0 GROUP BY 1),
       |t AS (
       |  SELECT CAST(sum(brev) AS BIGINT) AS srev,
       |    CAST(sum(bcnt) AS BIGINT) AS scnt,
       |    CAST(count(*) AS BIGINT) AS nb
       |  FROM bk),
       |th AS (
       |  SELECT nb, srev, scnt,
       |    CASE WHEN nb < 2 THEN 0
       |      ELSE (srev - brev) // (scnt - bcnt) END AS theta_i
       |  FROM bk, t),
       |ag AS (
       |  SELECT nb, srev, scnt,
       |    CAST(sum(theta_i) AS BIGINT) AS s_theta,
       |    CAST(sum(theta_i * theta_i) AS BIGINT) AS s_theta2
       |  FROM th GROUP BY 1, 2, 3)
       |SELECT nb AS n_buckets, srev // scnt AS theta_cents,
       |  CASE WHEN nb < 2 THEN -1 ELSE
       |    ((nb - 1) * (nb * s_theta2 - s_theta * s_theta))
       |    // (nb * nb) END AS jack_var_cents2,
       |  CASE WHEN nb < 2 THEN -1 ELSE
       |    CAST(floor(sqrt(CAST(((nb - 1) * (nb * s_theta2 - s_theta * s_theta))
       |      // (nb * nb) AS DOUBLE))) AS BIGINT) END AS jack_se_cents,
       |  CASE WHEN nb < 2 THEN -1 ELSE
       |    srev // scnt - 2 * CAST(floor(sqrt(CAST(
       |      ((nb - 1) * (nb * s_theta2 - s_theta * s_theta))
       |      // (nb * nb) AS DOUBLE))) AS BIGINT) END AS ci_lo_cents,
       |  CASE WHEN nb < 2 THEN -1 ELSE
       |    srev // scnt + 2 * CAST(floor(sqrt(CAST(
       |      ((nb - 1) * (nb * s_theta2 - s_theta * s_theta))
       |      // (nb * nb) AS DOUBLE))) AS BIGINT) END AS ci_hi_cents
       |FROM ag""".stripMargin

  // ---------------------------------------------------------------- q402
  /** SRM critical value: χ²(1 dof) at α = 0.001 in milli units —
    * Kohavi's recommended guardrail level for sample-ratio-mismatch
    * alarms (an SRM is an ENGINEERING bug signal, so the test runs
    * far stricter than the 5% effect-readout convention; a 5% gate
    * would page on 1 in 20 healthy experiments). */
  val srmCritMilli = 10828L

  /** Sample-ratio-mismatch gate (Kohavi et al., "Trustworthy Online
    * Controlled Experiments" ch. 21) — the integrity check that must
    * pass BEFORE q207's effect readout is worth reading: under a
    * 50/50 split, arm counts off by more than chance mean the
    * ASSIGNMENT or LOGGING is broken (bot filtering one arm, a
    * redirect dropping sessions) and every downstream p-value is
    * garbage. Goodness-of-fit χ² against the intended ratio
    * collapses, at 50/50, to (n_a−n_b)²/(n_a+n_b) — computed in
    * exact milli integers, verdict vs [[srmCritMilli]]. Two
    * assignments are audited side by side: the healthy parity split
    * (a true null — must NOT alarm) and a deliberately lossy one
    * (arm 1 users with user_id%10 < 6 dropped, the one-sided logging
    * loss SRM exists to catch — alarms from sf0.01 up; at sf0.001
    * the 15-user frame is under-powered, disclosed). One
    * user-distinct pass, two 2-row aggregates. */
  def q402SrmGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val users = Tables.events(s, dir).select($"user_id").distinct()
      .select($"user_id", ($"user_id" % 2).as("arm"))
    val parity = users.select(lit("parity").as("assignment"), $"arm")
    val lossy = users
      .where(!($"arm" === 1 && $"user_id" % 10 < 6))
      .select(lit("lossy").as("assignment"), $"arm")
    srmOf(parity.unionByName(lossy))
  }

  /** The gate on any (assignment, arm 0/1) frame — separated so the
    * spec can plant exact 600/400 and 500/500 splits. */
  private[ops] def srmOf(arms: DataFrame): DataFrame = {
    val s = arms.sparkSession
    import s.implicits._
    arms.groupBy($"assignment")
      .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"))
      .select($"assignment", $"n_a", $"n_b",
        expr("(1000 * (n_a - n_b) * (n_a - n_b)) div (n_a + n_b)")
          .as("chi2_milli"))
      .withColumn("srm_detected", $"chi2_milli" > srmCritMilli)
      .orderBy($"assignment")
  }

  private val q402Oracle =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |arms AS (
       |  SELECT 'parity' AS assignment, user_id % 2 AS arm FROM u
       |  UNION ALL
       |  SELECT 'lossy', user_id % 2 FROM u
       |  WHERE NOT (user_id % 2 = 1 AND user_id % 10 < 6)),
       |g AS (
       |  SELECT assignment,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM arms GROUP BY 1)
       |SELECT assignment, n_a, n_b,
       |  (1000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b) AS chi2_milli,
       |  (1000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b) > $srmCritMilli
       |    AS srm_detected
       |FROM g ORDER BY assignment""".stripMargin

  // ---------------------------------------------------------------- q408
  /** Activity strata for q408 — total-event-count bands (width 20,
    * capped at 5). Fixture-calibrated grid; a production run picks
    * domain strata (signup cohort, platform) the same way. */
  val ipwStrataWidth = 20L
  val ipwStrataCap = 5L

  /** Observational ATE by exact post-stratification ≡ IPW with
    * within-stratum propensities (Rosenbaum & Rubin 1983; Horvitz–
    * Thompson/Hájek) — the estimator for when NOBODY randomized:
    * "treatment" here is self-selected (users whose error share
    * exceeds the uniform 1/5), and it confounds with activity (more
    * events ⇒ more errors AND more purchase revenue), so the naive
    * treated-vs-control difference is biased by construction. The
    * fix: stratify on activity, difference means WITHIN each
    * stratum, and reweight by stratum population — algebraically
    * identical to Hájek-IPW when ê(x) is the exact within-stratum
    * treated fraction (the identity is the docstring's proof
    * obligation, not a claim: ŵ = t/ê + (1−t)/(1−ê) with exact ê
    * reproduces the stratified estimator term by term). Strata with
    * an arm missing carry no causal information and are excluded,
    * COUNTED, and reported — silent dropping is how observational
    * readouts lie. Exact integers: cents sums, floored per-stratum
    * means, population-weighted recombination in micro-cents. One
    * user-grain aggregate → stratum-grain frame (≤ 6 rows); nothing
    * corpus-sized shuffles twice. */
  def q408StratifiedAte(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ipwAteOf(Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_err"),
        sum(when($"event_type" === "purchase",
          expr("CAST(round(value * 100D) AS BIGINT)")).otherwise(0L))
          .as("y_cents"))
      .select(
        least(expr(s"n_ev div $ipwStrataWidth"), lit(ipwStrataCap)).as("x"),
        (lit(5L) * $"n_err" > $"n_ev").cast("long").as("t"),
        $"y_cents"))
  }

  /** The estimator on any (x stratum, t 0/1, y_cents) frame —
    * separated so the spec can plant a confound the naive difference
    * gets wrong and the stratified estimate gets right. */
  private[ops] def ipwAteOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    val strata = users.groupBy($"x")
      .agg(count(lit(1)).as("n"),
        sum($"t").as("n1"),
        sum(when($"t" === 1L, $"y_cents").otherwise(0L)).as("y1"),
        sum(when($"t" === 0L, $"y_cents").otherwise(0L)).as("y0"))
      .withColumn("kept", $"n1" > 0L && $"n1" < $"n")
    strata.agg(
      sum($"n").as("n_users"),
      count(lit(1)).as("n_strata"),
      sum(when($"kept", 1L).otherwise(0L)).as("n_strata_kept"),
      sum(when($"kept", $"n").otherwise(0L)).as("n_kept"),
      sum($"n1").as("n_treated"),
      sum($"y1").as("sy1"), sum($"y0").as("sy0"),
      sum(when($"kept",
        $"n" * (expr("y1 div n1") - expr("y0 div (n - n1)")))
        .otherwise(0L)).as("w_diff"))
      .select($"n_users", $"n_strata", $"n_strata_kept", $"n_kept",
        // naive: treated mean minus control mean, ignoring strata
        (expr("sy1 div n_treated") -
          expr("sy0 div (n_users - n_treated)")).as("naive_diff_cents"),
        // stratified ≡ Hájek-IPW: population-weighted within-stratum
        // differences over the common-support strata
        expr("CASE WHEN n_kept = 0 THEN -1 ELSE w_diff div n_kept END")
          .as("strat_diff_cents"))
  }

  private val q408Oracle =
    s"""WITH u AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
       |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_err,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y_cents
       |  FROM events GROUP BY 1),
       |pts AS (
       |  SELECT least(n_ev // $ipwStrataWidth, $ipwStrataCap) AS x,
       |    CASE WHEN 5 * n_err > n_ev THEN 1 ELSE 0 END AS t,
       |    y_cents
       |  FROM u),
       |st AS (
       |  SELECT x, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(t) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN t = 1 THEN y_cents ELSE 0 END) AS BIGINT) AS y1,
       |    CAST(sum(CASE WHEN t = 0 THEN y_cents ELSE 0 END) AS BIGINT) AS y0
       |  FROM pts GROUP BY 1),
       |ag AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n_users,
       |    CAST(count(*) AS BIGINT) AS n_strata,
       |    CAST(sum(CASE WHEN n1 > 0 AND n1 < n THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_strata_kept,
       |    CAST(sum(CASE WHEN n1 > 0 AND n1 < n THEN n ELSE 0 END) AS BIGINT)
       |      AS n_kept,
       |    CAST(sum(n1) AS BIGINT) AS n_treated,
       |    CAST(sum(y1) AS BIGINT) AS sy1,
       |    CAST(sum(y0) AS BIGINT) AS sy0,
       |    CAST(sum(CASE WHEN n1 > 0 AND n1 < n
       |      THEN n * (y1 // n1 - y0 // (n - n1)) ELSE 0 END) AS BIGINT)
       |      AS w_diff
       |  FROM st)
       |SELECT n_users, n_strata, n_strata_kept, n_kept,
       |  sy1 // n_treated - sy0 // (n_users - n_treated)
       |    AS naive_diff_cents,
       |  CASE WHEN n_kept = 0 THEN -1
       |       ELSE w_diff // n_kept END AS strat_diff_cents
       |FROM ag""".stripMargin

  // ---------------------------------------------------------------- q410
  /** Channel states for the attribution chain (every non-purchase
    * event type) and the hop budget: the readout is the K-hop
    * conversion probability — journeys longer than [[mkRounds]] hops
    * contribute their first K hops (geometric tail, disclosed in the
    * metric's definition, identical in both engines). */
  val mkChannels = Seq("click", "error", "signup", "view")
  val mkRounds = 12

  /** Markov removal-effect attribution (Anderl et al. 2016) — the
    * model-based credit the first/last/linear family (q117, q190,
    * q350's comparison) cannot give: build the per-user journey
    * chain start → channel⋯ → conv/null (cut at the FIRST purchase),
    * estimate the transition matrix, and price each channel by how
    * much K-hop conversion probability DISAPPEARS when that channel
    * is deleted from the graph (its inbound edges retarget to null —
    * the customer who would have passed through it is lost). Credit
    * = each channel's removal effect, floor-normalized to ppm.
    * Everything heavy is one windowed pass over the event stream
    * (journey cut + lead transitions) and one count to the
    * ≤ (|channels|+1)×(|channels|+3) transition grain; the chain
    * solve itself is control-plane — a ≤36-cell integer-ppm matrix
    * iterated [[mkRounds]] times on the driver (q71's model-bounded
    * collect discipline), once per scenario (base + one per removed
    * channel). The oracle replays journey extraction relationally
    * and unrolls the SAME ppm iteration per scenario — floor
    * arithmetic, so the replay is bit-exact. */
  def q410MarkovAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    markovRemovalOf(Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type"))
  }

  /** The full pipeline on any (user_id, ts, event_id, event_type)
    * frame — separated so the spec can plant a chain where one
    * channel is the sole gateway to conversion (removal effect 10⁶)
    * and another is pure dead-end noise (effect 0). */
  private[ops] def markovRemovalOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val staged = ev
      .withColumn("rn", row_number().over(w))
      .withColumn("fp", min(when($"event_type" === "purchase", $"rn"))
        .over(Window.partitionBy($"user_id")))
      .where($"fp".isNull || $"rn" <= $"fp")
      .withColumn("state",
        when($"event_type" === "purchase", "conv").otherwise($"event_type"))
    val w2 = Window.partitionBy($"user_id").orderBy($"rn")
    val steps = staged
      .withColumn("nxt", lead($"state", 1).over(w2))
      .withColumn("to",
        coalesce($"nxt", when($"state" =!= "conv", lit("null"))))
    val trans = steps.where($"state" =!= "conv")
      .select($"state".as("from_s"), $"to".as("to_s"))
      .unionByName(steps.where($"rn" === 1)
        .select(lit("start").as("from_s"), $"state".as("to_s")))
      .groupBy($"from_s", $"to_s").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // ---- control plane: ≤36 cells, iterated in exact ppm ----
    val states = "start" +: mkChannels
    def pConv(drop: Option[String]): Long = {
      val redirected = trans.map { case (f, t, c) =>
        (f, if (drop.contains(t)) "null" else t, c) }
      val tot = redirected.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p = redirected.groupBy(x => (x._1, x._2)).view
        .mapValues(_.map(_._3).sum).toMap
      def ppm(f: String, t: String): Long =
        tot.get(f).filter(_ > 0L)
          .map(n => 1000000L * p.getOrElse((f, t), 0L) / n).getOrElse(0L)
      var v = (states.map(_ -> 0L) ++ Seq("conv" -> 1000000L, "null" -> 0L))
        .toMap
      (1 to mkRounds).foreach { _ =>
        // sum the ppm·v products FIRST, divide once — the exact shape
        // the oracle's sum(p_ppm * v) // 1e6 replays (term-wise floor
        // would drift); terms ≤ 1e12 × 7 states, far inside BIGINT
        val nv = states.map { f =>
          f -> (states ++ Seq("conv", "null"))
            .map(t => ppm(f, t) * v(t)).sum / 1000000L
        }.toMap
        v = nv ++ Map("conv" -> 1000000L, "null" -> 0L)
      }
      v("start")
    }
    val base = pConv(None)
    val rows = mkChannels.map { c =>
      val removed = pConv(Some(c))
      val effect =
        if (base <= 0L) -1L else 1000000L - 1000000L * removed / base
      (c, base, removed, effect)
    }
    val totEffect = rows.map(_._4).filter(_ > 0L).sum
    rows.map { case (c, b, r, e) =>
      val credit =
        if (totEffect <= 0L || e < 0L) -1L else 1000000L * e / totEffect
      (c, b, r, e, credit)
    }.toDF("channel", "p_base_ppm", "p_removed_ppm", "removal_ppm",
      "credit_ppm")
      .orderBy($"channel")
  }

  private val q410Oracle = {
    val states = "start" +: mkChannels
    val allTo = states ++ Seq("conv", "null")
    val stateVals = states.map(st => s"('$st')").mkString(", ")
    def scenario(tag: String, drop: Option[String]): String = {
      val redirect = drop
        .map(d => s"CASE WHEN to_s = '$d' THEN 'null' ELSE to_s END")
        .getOrElse("to_s")
      // the FIRST union branch names the columns — alias it
      val v0 = allTo.map { st =>
        val vv = if (st == "conv") 1000000 else 0
        s"SELECT '$st' AS state, $vv AS v"
      }.mkString("\n  UNION ALL ")
      val rounds = (1 to mkRounds).map { k =>
        s"""v_${tag}_$k AS (
           |  SELECT st.state,
           |    COALESCE((SELECT CAST(sum(p.p_ppm * v.v) // 1000000 AS BIGINT)
           |      FROM p_$tag p JOIN v_${tag}_${k - 1} v ON v.state = p.to_s
           |      WHERE p.from_s = st.state), 0) AS v
           |  FROM st
           |  UNION ALL SELECT 'conv', 1000000
           |  UNION ALL SELECT 'null', 0)""".stripMargin
      }.mkString(",\n")
      s"""p_$tag AS (
         |  SELECT from_s, $redirect AS to_s,
         |    CAST((1000000 * sum(cnt)) // sum(sum(cnt)) OVER
         |      (PARTITION BY from_s) AS BIGINT) AS p_ppm
         |  FROM trans GROUP BY 1, 2),
         |v_${tag}_0 AS (
         |  $v0),
         |$rounds""".stripMargin
    }
    val scenarios = (("base", None: Option[String]) +:
      mkChannels.map(c => (c, Some(c))))
      .map { case (t, d) => scenario(t, d) }.mkString(",\n")
    val chanRows = mkChannels.map { c =>
      s"""SELECT '$c' AS channel,
         |  (SELECT v FROM v_base_$mkRounds WHERE state = 'start')
         |    AS p_base_ppm,
         |  (SELECT v FROM v_${c}_$mkRounds WHERE state = 'start')
         |    AS p_removed_ppm""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ev0 AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS rn
       |  FROM events),
       |cut AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
       |    OVER (PARTITION BY user_id) AS fp
       |  FROM ev0),
       |st0 AS (
       |  SELECT user_id, rn,
       |    CASE WHEN event_type = 'purchase' THEN 'conv'
       |         ELSE event_type END AS state
       |  FROM cut WHERE fp IS NULL OR rn <= fp),
       |steps AS (
       |  SELECT user_id, rn, state,
       |    COALESCE(lead(state) OVER (PARTITION BY user_id ORDER BY rn),
       |      CASE WHEN state <> 'conv' THEN 'null' END) AS to_s
       |  FROM st0),
       |trans AS (
       |  SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT state AS from_s, to_s FROM steps WHERE state <> 'conv'
       |    UNION ALL
       |    SELECT 'start', state FROM steps WHERE rn = 1)
       |  GROUP BY 1, 2),
       |st(state) AS (VALUES $stateVals),
       |$scenarios,
       |ch AS (
       |  $chanRows)
       |SELECT channel, p_base_ppm, p_removed_ppm,
       |  CASE WHEN p_base_ppm <= 0 THEN -1
       |       ELSE 1000000 - (1000000 * p_removed_ppm) // p_base_ppm END
       |    AS removal_ppm,
       |  CAST(CASE WHEN (SELECT sum(CASE WHEN p_base_ppm > 0 AND
       |      1000000 - (1000000 * p_removed_ppm) // p_base_ppm > 0
       |      THEN 1000000 - (1000000 * p_removed_ppm) // p_base_ppm
       |      ELSE 0 END) FROM ch) <= 0
       |      OR p_base_ppm <= 0
       |      OR 1000000 - (1000000 * p_removed_ppm) // p_base_ppm < 0
       |    THEN -1
       |    ELSE (1000000 * (1000000 - (1000000 * p_removed_ppm)
       |      // p_base_ppm))
       |      // (SELECT sum(CASE WHEN p_base_ppm > 0 AND
       |        1000000 - (1000000 * p_removed_ppm) // p_base_ppm > 0
       |        THEN 1000000 - (1000000 * p_removed_ppm) // p_base_ppm
       |        ELSE 0 END) FROM ch)
       |  END AS BIGINT) AS credit_ppm
       |FROM ch ORDER BY channel""".stripMargin
  }

  // ---------------------------------------------------------------- q411
  /** Slope grid for the quantile fit: −40..40 steps of 100 cents/day
    * (fixture-calibrated span around the revenue trend; a production
    * run seeds the grid from q273's Theil–Sen slope ± k·MAD). Taus:
    * the quartile/median/p90 lines — divergence between them IS the
    * heteroscedasticity readout. */
  val qrSlopes: Seq[Long] = (-40L to 40L).map(_ * 100L)
  val qrTausPpm: Seq[Long] = Seq(250000L, 500000L, 900000L)

  /** Grid quantile regression (Koenker & Bassett 1978) — conditional
    * QUANTILE lines where q135's OLS fits the conditional mean and
    * q273's Theil–Sen the median pairwise slope: fit y = a + b·t at
    * τ = .25/.50/.90 by exact pinball-loss minimization over a fixed
    * slope grid, profiling the intercept out in closed form (for
    * fixed b, the optimal a is the discrete τ-quantile of the
    * residuals — the q175 first-crossing rank device). A p90 line
    * steeper than the median line means the upper tail grows faster
    * than the middle — the heteroscedasticity signal a single OLS
    * line cannot show. Everything exact integers: residuals in
    * cents, pinball loss in τ_ppm-weighted cents, argmin per tau
    * with the smaller-slope tie-break. Plan: the day-grain frame
    * (calendar-bounded) cross-joins the 81×3 grid — ≤ 243·D rows,
    * one rank window per (tau, slope) group, one argmin window per
    * tau; the corpus reduces to D rows first. */
  def q411QuantileRegression(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    quantRegOf(Tables.events(s, dir)
      .where($"event_type" === "purchase")
      .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(sum(expr("CAST(round(value * 100D) AS BIGINT)")).as("y")))
  }

  /** The fit on any (day, y cents) frame — separated so the spec can
    * plant an exact heteroscedastic fan (known quantile slopes). */
  private[ops] def quantRegOf(daily0: DataFrame): DataFrame = {
    val s = daily0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = daily0
      .crossJoin(broadcast(daily0.agg(min($"day").as("d0"),
        count(lit(1)).as("nd"))))
      .select(($"day" - $"d0").as("t"), $"y", $"nd")
    val grid = qrTausPpm.toDF("tau_ppm")
      .crossJoin(qrSlopes.toDF("b"))
    val res = daily.crossJoin(broadcast(grid))
      .select($"tau_ppm", $"b", $"t", $"y", $"nd",
        ($"y" - $"b" * $"t").as("r"))
    val wRank = Window.partitionBy($"tau_ppm", $"b").orderBy($"r")
    // intercept = the ⌈τ·n⌉-th smallest residual (first-crossing)
    val icept = res
      .withColumn("rn", row_number().over(wRank))
      .where($"rn" === expr("(tau_ppm * nd + 999999) div 1000000"))
      .select($"tau_ppm".as("tp"), $"b".as("bb"), $"r".as("a"))
    val loss = res
      .join(broadcast(icept),
        $"tau_ppm" === $"tp" && $"b" === $"bb")
      .groupBy($"tau_ppm", $"b", $"a")
      .agg(sum(
        when($"r" > $"a", $"tau_ppm" * ($"r" - $"a"))
          .otherwise((lit(1000000L) - $"tau_ppm") * ($"a" - $"r")))
        .as("pinball"))
    val wBest = Window.partitionBy($"tau_ppm")
      .orderBy($"pinball".asc, $"b".asc)
    loss.withColumn("rk", row_number().over(wBest)).where($"rk" === 1)
      .select($"tau_ppm", $"b".as("slope_cents_per_day"),
        $"a".as("intercept_cents"), $"pinball")
      .orderBy($"tau_ppm")
  }

  private val q411Oracle = {
    val dayUs = 86400L * 1000000L
    val slopeVals = qrSlopes.map(b => s"($b)").mkString(", ")
    val tauVals = qrTausPpm.map(t => s"($t)").mkString(", ")
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // $dayUs AS day,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |base AS (
       |  SELECT CAST(day - (SELECT min(day) FROM daily) AS BIGINT) AS t, y,
       |    (SELECT CAST(count(*) AS BIGINT) FROM daily) AS nd
       |  FROM daily),
       |taus(tau_ppm) AS (VALUES $tauVals),
       |slopes(b) AS (VALUES $slopeVals),
       |res AS (
       |  SELECT tau_ppm, b, t, y, nd, y - b * t AS r
       |  FROM base, taus, slopes),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY tau_ppm, b ORDER BY r)
       |    AS rn
       |  FROM res),
       |icept AS (
       |  SELECT tau_ppm, b, r AS a FROM rk
       |  WHERE rn = (tau_ppm * nd + 999999) // 1000000),
       |loss AS (
       |  SELECT res.tau_ppm, res.b, a,
       |    CAST(sum(CASE WHEN r > a THEN res.tau_ppm * (r - a)
       |      ELSE (1000000 - res.tau_ppm) * (a - r) END) AS BIGINT)
       |      AS pinball
       |  FROM res JOIN icept ON res.tau_ppm = icept.tau_ppm
       |    AND res.b = icept.b
       |  GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT *, row_number() OVER (PARTITION BY tau_ppm
       |    ORDER BY pinball ASC, b ASC) AS rk2
       |  FROM loss)
       |SELECT CAST(tau_ppm AS BIGINT) AS tau_ppm,
       |  CAST(b AS BIGINT) AS slope_cents_per_day,
       |  CAST(a AS BIGINT) AS intercept_cents, pinball
       |FROM best WHERE rk2 = 1 ORDER BY tau_ppm""".stripMargin
  }

  // ---------------------------------------------------------------- q504
  /** [NS] SFT TURN-FLATTENING accounting — the planning pass a
    * supervised-fine-tuning pipeline runs before exploding multi-turn
    * dialogs into per-assistant-turn training samples: each dialog of
    * T turns yields one sample per assistant turn, whose input is the
    * full conversation PREFIX — so sample cost is the prefix token
    * sum, and the batch/packing planner needs (samples, total context
    * tokens, how many exceed the context budget and truncate) BEFORE
    * materializing O(T²/2) tokens of flattened text. The fixture
    * models dialogs from the events stream (user_id = dialog, turns
    * ordered by (ts, event_id), roles alternating user/assistant,
    * per-turn token count derived deterministically from event_id)
    * and reports the accounting per dialog cohort. Scale shape: ONE
    * shuffle by dialog id, a window prefix-sum inside it, cohort
    * fold — the flatten itself would ride the same window
    * (collect_list prefix + concat), which is why the accounting
    * operator shares its plan. Context budget [[sftContextBudget]]
    * tokens; all arithmetic exact BIGINT. */
  val sftContextBudget = 64L

  def q504SftTurnFlatten(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("_q504_events")
    s.sql(
      s"""WITH t AS (
         |  SELECT user_id,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts, event_id) AS turn,
         |    1 + (event_id % 7) AS nt
         |  FROM _q504_events),
         |c AS (
         |  SELECT user_id, turn, nt,
         |    sum(nt) OVER (PARTITION BY user_id ORDER BY turn) AS ctx
         |  FROM t)
         |SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_dialogs,
         |  CAST(sum(CASE WHEN turn % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_samples,
         |  CAST(sum(CASE WHEN turn % 2 = 0 THEN ctx ELSE 0 END) AS BIGINT)
         |    AS context_tokens,
         |  CAST(sum(CASE WHEN turn % 2 = 0 AND ctx > $sftContextBudget
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
         |FROM c GROUP BY user_id % 10 ORDER BY cohort""".stripMargin)
  }

  private val q504Oracle =
    """WITH t AS (
      |  SELECT user_id,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS turn,
      |    1 + (event_id % 7) AS nt
      |  FROM events),
      |c AS (
      |  SELECT user_id, turn, nt,
      |    sum(nt) OVER (PARTITION BY user_id ORDER BY turn) AS ctx
      |  FROM t)
      |SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_dialogs,
      |  CAST(sum(CASE WHEN turn % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_samples,
      |  CAST(sum(CASE WHEN turn % 2 = 0 THEN ctx ELSE 0 END) AS BIGINT)
      |    AS context_tokens,
      |  CAST(sum(CASE WHEN turn % 2 = 0 AND ctx > 64
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
      |FROM c GROUP BY user_id % 10 ORDER BY cohort""".stripMargin

  // ---------------------------------------------------------------- q512
  /** AGENT-TRAJECTORY INTEGRITY LINT — the admission gate agentic SFT
    * data needs before tool-use traces become training rows: in a
    * call/result protocol every RESULT must follow a CALL in its own
    * stream, and a stream that only ever calls without observing a
    * result is truncated. Framed on the fixture's event streams
    * (view = the call, purchase = the result, per-user streams
    * ordered by time): a PURCHASE with no strictly-earlier VIEW by
    * the same user is an ORPHANED result (protocol violation — the
    * whole stream is quarantined, not repaired), and a stream with
    * views but zero purchases is DANGLING (truncated trajectory —
    * usable for call-format training only). The readout buckets every
    * stream into exactly one class, so the counts reconcile to the
    * user universe. ONE user-grain shuffle of (user, ts, type)
    * triples — the payload column never moves; at 100 TB the lint is
    * a projection plus one aggregation keyed by the stream id. */
  def q512TrajectoryLint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_type")
      .where($"event_type".isin("view", "purchase"))
    val perUser = ev.groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("first_view"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("n_res"),
        sum(when($"event_type" === "view", 1L).otherwise(0L))
          .as("n_call"))
    // orphaned = a result with NO strictly-earlier call: purchases
    // at-or-before the stream's first view, or in view-less streams
    val marked = ev.where($"event_type" === "purchase")
      .join(perUser.select($"user_id", $"first_view"), Seq("user_id"),
        "left")
      .groupBy($"user_id")
      .agg(sum(when($"first_view".isNull ||
        $"ts" <= $"first_view", 1L).otherwise(0L)).as("orphans"))
    val cls = perUser
      .join(marked, Seq("user_id"), "left")
      .withColumn("orphans", coalesce($"orphans", lit(0L)))
      .withColumn("class",
        when($"orphans" > 0L, lit("quarantined"))
          .when($"n_call" > 0L && $"n_res" === 0L, lit("dangling"))
          .when($"n_call" === 0L && $"n_res" === 0L, lit("empty"))
          .otherwise(lit("clean")))
    cls.groupBy($"class")
      .agg(count(lit(1)).as("n_streams"),
        sum($"n_call").as("n_calls"),
        sum($"n_res").as("n_results"))
      .orderBy($"class")
  }

  private val q512Oracle =
    """WITH ev AS (
      |  SELECT user_id, ts, event_type FROM events
      |  WHERE event_type IN ('view', 'purchase')),
      |pu AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS n_res,
      |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_call
      |  FROM ev GROUP BY user_id),
      |orph AS (
      |  SELECT e.user_id,
      |    sum(CASE WHEN p.first_view IS NULL OR e.ts <= p.first_view
      |      THEN 1 ELSE 0 END) AS orphans
      |  FROM ev e JOIN pu p USING (user_id)
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      |cls AS (
      |  SELECT p.user_id, p.n_call, p.n_res,
      |    CASE WHEN coalesce(o.orphans, 0) > 0 THEN 'quarantined'
      |      WHEN p.n_call > 0 AND p.n_res = 0 THEN 'dangling'
      |      WHEN p.n_call = 0 AND p.n_res = 0 THEN 'empty'
      |      ELSE 'clean' END AS class
      |  FROM pu p LEFT JOIN orph o USING (user_id))
      |SELECT class,
      |  CAST(count(*) AS BIGINT) AS n_streams,
      |  CAST(sum(n_call) AS BIGINT) AS n_calls,
      |  CAST(sum(n_res) AS BIGINT) AS n_results
      |FROM cls GROUP BY class ORDER BY class""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q512_trajectory_lint" -> (q512TrajectoryLint _),
    "q504_sft_turn_flatten" -> (q504SftTurnFlatten _),
    "q411_quantile_regression" -> (q411QuantileRegression _),
    "q410_markov_attribution" -> (q410MarkovAttribution _),
    "q408_stratified_ate" -> (q408StratifiedAte _),
    "q402_srm_gate" -> (q402SrmGate _),
    "q391_jackknife_ratio"  -> (q391JackknifeRatio _),
    "q349_interpolated_asof" -> (q349InterpolatedAsof _),
    "q329_conformal_intervals" -> (q329ConformalIntervals _),
    "q327_friedman"         -> (q327Friedman _),
    "q324_jonckheere_trend" -> (q324JonckheereTrend _),
    "q325_cliffs_delta"     -> (q325CliffsDelta _),
    "q318_wilcoxon_signed_rank" -> (q318WilcoxonSignedRank _),
    "q319_ccf_lead_lag"     -> (q319CcfLeadLag _),
    "q311_kendall_tau"      -> (q311KendallTau _),
    "q314_pettitt_changepoint" -> (q314PettittChangepoint _),
    "q302_bh_fdr"           -> (q302BhFdr _),
    "q303_kruskal_wallis"   -> (q303KruskalWallis _),
    "q270_mann_whitney"     -> (q270MannWhitney _),
    "q287_growth_accounting" -> (q287GrowthAccounting _),
    "q293_pctl_rollup_gap"  -> (q293PctlRollupGap _),
    "q294_forecast_baselines" -> (q294ForecastBaselines _),
    "q295_qini_curve"       -> (q295QiniCurve _),
    "q296_session_sweep"    -> (q296SessionSweep _),
    "q271_acf_ljung_box"    -> (q271AcfLjungBox _),
    "q274_spearman"         -> (q274Spearman _),
    "q275_queue_backlog"    -> (q275QueueBacklog _),
    "q276_log_hist_pctl"    -> (q276LogHistPctl _),
    "q282_mantel_haenszel"  -> (q282MantelHaenszel _),
    "q283_mcnemar"          -> (q283McNemar _),
    "q284_trend_test"       -> (q284TrendTest _),
    "q286_quantile_effect"  -> (q286QuantileEffect _),
    "q269_seasonal_anomalies" -> (q269SeasonalAnomalies _),
    "q267_log_rank"         -> (q267LogRank _),
    "q264_diff_in_diff"     -> (q264DiffInDiff _),
    "q266_replica_digest"   -> (q266ReplicaDigest _),
    "q261_funnel_span"      -> (q261FunnelSpan _),
    "q262_cuped"            -> (q262Cuped _),
    "q258_sprt_monitor"     -> (q258SprtMonitor _),
    "q260_theil_sen"        -> (q260TheilSen _),
    "q255_stationary_dist"  -> (q255StationaryDist _),
    "q257_burn_rate"        -> (q257BurnRate _),
    "q101_moving_avg"       -> (q101MovingAvg _),
    "q163_cusum_changepoint" -> (q163CusumChangepoint _),
    "q217_ewma_band"        -> (q217EwmaBand _),
    "q377_holt_trend"       -> (q377HoltTrend _),
    "q223_locf_backfill"    -> (q223LocfBackfill _),
    "q230_merged_intervals" -> (q230MergedIntervals _),
    "q231_decayed_popularity" -> (q231DecayedPopularity _),
    "q232_completeness_gate" -> (q232CompletenessGate _),
    "q233_burst_collapse"   -> (q233BurstCollapse _),
    "q234_checklist_completion" -> (q234ChecklistCompletion _),
    "q236_attribution_compare" -> (q236AttributionCompare _),
    "q237_daily_percentiles" -> (q237DailyPercentiles _),
    "q238_new_vs_returning" -> (q238NewVsReturning _),
    "q244_twap"             -> (q244Twap _),
    "q248_scd2_audit"       -> (q248Scd2Audit _),
    "q169_seasonal_profile" -> (q169SeasonalProfile _),
    "q171_event_sequences"  -> (q171EventSequences _),
    "q178_linear_attribution" -> (q178LinearAttribution _),
    "q185_temporal_regime_join" -> (q185TemporalRegimeJoin _),
    "q189_frequent_paths"   -> (q189FrequentPaths _),
    "q190_cohort_ltv"       -> (q190CohortLtv _),
    "q192_burstiness_fano"  -> (q192BurstinessFano _),
    "q197_interval_coverage" -> (q197IntervalCoverage _),
    "q202_gini"             -> (q202Gini _),
    "q203_ks_drift"         -> (q203KsDrift _),
    "q204_conversion_window" -> (q204ConversionWindow _),
    "q205_bootstrap_ci"     -> (q205BootstrapCi _),
    "q207_ab_readout"       -> (q207AbReadout _),
    "q208_survival_curve"   -> (q208SurvivalCurve _),
    "q209_purchase_gaps"    -> (q209PurchaseGaps _),
    "q102_funnel_stages"    -> (q102FunnelStages _),
    "q103_cohort_retention" -> (q103CohortRetention _),
    "q117_attribution"      -> (q117Attribution _),
    "q134_anomaly_mad"      -> (q134AnomalyMad _),
    "q135_trend_ols"        -> (q135TrendOls _),
    "q138_scd2_history"     -> (q138Scd2History _),
    "q139_session_overlap"  -> (q139SessionOverlap _),
    "q141_transition_matrix" -> (q141TransitionMatrix _),
    "q149_distinct_rollup"  -> (q149DistinctRollup _),
    "q151_capped_sessions"  -> (q151CappedSessions _),
    "q152_freshness_report" -> (q152FreshnessReport _),
    "q154_token_bucket"     -> (q154TokenBucket _),
    "q249_entropy_rate"     -> (q249EntropyRate _),
    "q250_incident_exposure" -> (q250IncidentExposure _),
  )

  val oracles: Map[String, String] = Map(
    "q512_trajectory_lint" -> q512Oracle,
    "q504_sft_turn_flatten" -> q504Oracle,
    "q411_quantile_regression" -> q411Oracle,
    "q410_markov_attribution" -> q410Oracle,
    "q408_stratified_ate" -> q408Oracle,
    "q402_srm_gate" -> q402Oracle,
    "q391_jackknife_ratio"  -> q391Oracle,
    "q349_interpolated_asof" -> q349Oracle,
    "q329_conformal_intervals" -> q329Oracle,
    "q327_friedman"         -> q327Oracle,
    "q324_jonckheere_trend" -> q324Oracle,
    "q325_cliffs_delta"     -> q325Oracle,
    "q318_wilcoxon_signed_rank" -> q318Oracle,
    "q319_ccf_lead_lag"     -> q319Oracle,
    "q311_kendall_tau"      -> q311Oracle,
    "q314_pettitt_changepoint" -> q314Oracle,
    "q302_bh_fdr"           -> q302Oracle,
    "q303_kruskal_wallis"   -> q303Oracle,
    "q249_entropy_rate"     -> q249Oracle,
    "q250_incident_exposure" -> q250Oracle,
    "q255_stationary_dist"  -> q255Oracle,
    "q257_burn_rate"        -> q257Oracle,
    "q258_sprt_monitor"     -> q258Oracle,
    "q260_theil_sen"        -> q260Oracle,
    "q261_funnel_span"      -> q261Oracle,
    "q262_cuped"            -> q262Oracle,
    "q264_diff_in_diff"     -> q264Oracle,
    "q266_replica_digest"   -> q266Oracle,
    "q267_log_rank"         -> q267Oracle,
    "q269_seasonal_anomalies" -> q269Oracle,
    "q270_mann_whitney"     -> q270Oracle,
    "q271_acf_ljung_box"    -> q271Oracle,
    "q274_spearman"         -> q274Oracle,
    "q275_queue_backlog"    -> q275Oracle,
    "q276_log_hist_pctl"    -> q276Oracle,
    "q282_mantel_haenszel"  -> q282Oracle,
    "q283_mcnemar"          -> q283Oracle,
    "q284_trend_test"       -> q284Oracle,
    "q286_quantile_effect"  -> q286Oracle,
    "q287_growth_accounting" -> q287Oracle,
    "q293_pctl_rollup_gap"  -> q293Oracle,
    "q294_forecast_baselines" -> q294Oracle,
    "q295_qini_curve"       -> q295Oracle,
    "q296_session_sweep"    -> q296Oracle,
    "q101_moving_avg"       -> q101Oracle,
    "q163_cusum_changepoint" -> q163Oracle,
    "q217_ewma_band"        -> q217Oracle,
    "q377_holt_trend"       -> q377Oracle,
    "q223_locf_backfill"    -> q223Oracle,
    "q230_merged_intervals" -> q230Oracle,
    "q231_decayed_popularity" -> q231Oracle,
    "q232_completeness_gate" -> q232Oracle,
    "q233_burst_collapse"   -> q233Oracle,
    "q234_checklist_completion" -> q234Oracle,
    "q236_attribution_compare" -> q236Oracle,
    "q237_daily_percentiles" -> q237Oracle,
    "q238_new_vs_returning" -> q238Oracle,
    "q244_twap"             -> q244Oracle,
    "q248_scd2_audit"       -> q248Oracle,
    "q169_seasonal_profile" -> q169Oracle,
    "q171_event_sequences"  -> q171Oracle,
    "q178_linear_attribution" -> q178Oracle,
    "q185_temporal_regime_join" -> q185Oracle,
    "q189_frequent_paths"   -> q189Oracle,
    "q190_cohort_ltv"       -> q190Oracle,
    "q192_burstiness_fano"  -> q192Oracle,
    "q197_interval_coverage" -> q197Oracle,
    "q202_gini"             -> q202Oracle,
    "q203_ks_drift"         -> q203Oracle,
    "q204_conversion_window" -> q204Oracle,
    "q205_bootstrap_ci"     -> q205Oracle,
    "q207_ab_readout"       -> q207Oracle,
    "q208_survival_curve"   -> q208Oracle,
    "q209_purchase_gaps"    -> q209Oracle,
    "q102_funnel_stages"    -> q102Oracle,
    "q103_cohort_retention" -> q103Oracle,
    "q117_attribution"      -> q117Oracle,
    "q134_anomaly_mad"      -> q134Oracle,
    "q135_trend_ols"        -> q135Oracle,
    "q138_scd2_history"     -> q138Oracle,
    "q139_session_overlap"  -> q139Oracle,
    "q141_transition_matrix" -> q141Oracle,
    "q149_distinct_rollup"  -> q149Oracle,
    "q151_capped_sessions"  -> q151Oracle,
    "q152_freshness_report" -> q152Oracle,
    "q154_token_bucket"     -> q154Oracle,
  )
}
