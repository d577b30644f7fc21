package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical global ranking — the scale-safe replacement for a
  * `Window.orderBy(...)` with no `partitionBy`, which funnels the
  * ENTIRE population through one task (Spark's own
  * "WindowExec: No Partition Defined" warning). Same two-tier device
  * as q133's prefix sum (`ExtOps.scala`), generalized to an
  * arbitrary sort key:
  *
  *  1. the key range `[min, max]` (one map-side-combining agg,
  *     broadcast back) is cut into ≤ [[rankBuckets]] equal-width
  *     RANGE buckets — bucket id is monotone in the key, so ranks
  *     compose across buckets;
  *  2. in-bucket `row_number` / running sums run under
  *     `Window.partitionBy(bucket)` — each bucket is one ordinary
  *     window partition (~n/[[rankBuckets]] rows for a roughly
  *     uniform key);
  *  3. cross-bucket offsets come from the bucket-grain totals frame
  *     (≤ [[rankBuckets]] rows) via a broadcast triangular self-join
  *     — O(B²) pairs of a tiny frame, NO window at the top tier, so
  *     no single-partition WindowExec exists anywhere in the plan.
  *
  * Exact integer arithmetic end-to-end: the result is bit-equal to
  * the single global window the oracles use.
  *
  * Preconditions: `key` must cast losslessly to BIGINT and be
  * non-null; `(key, tie)` must be a total order (tie non-null,
  * unique per row). Descending keys: pass the negated column. A
  * CONSTANT key degenerates to one bucket (there is no scalable
  * total order under a constant key — re-key on the tiebreaker if
  * that is the real workload). Key skew concentrates rows in few
  * buckets; equal-width cuts are the deterministic choice (sampled
  * range partitioning is not reproducible), and AQE splits oversized
  * post-shuffle partitions downstream.
  */
object Ranks {

  /** Range buckets per ranking — the fan-out of the hierarchical
    * rank. 64 keeps the offsets frame trivial (≤64 rows, ≤4096
    * triangular pairs) while cutting the largest single-task sort to
    * ~1/64 of the population; raise it for deeper clusters. */
  val rankBuckets = 64L

  /** `df` plus a global BIGINT `row_number() OVER (ORDER BY key, tie)`
    * column named `rnName`; for each `(col, name)` in `sums`, a
    * BIGINT running `SUM(col)` over the same order (inclusive of the
    * current row) named `name`; and, when `nName` is non-null, the
    * total row count as BIGINT column `nName` (the ntile companion —
    * see [[ntileExpr]]). */
  /** `materialize` (default true): the input subplan is referenced
    * three times below (the [min,max] agg, the in-bucket window
    * branch, the bucket-totals branch); without a cut each reference
    * re-executes whatever produced `df` — for corpus-scored inputs
    * (q199/q304: a full LM-scoring pass) that triples the dominant
    * cost, so the NARROW (id, key, summed-cols) projection is pinned
    * once (the q273 bounded-frame localCheckpoint idiom at the rank
    * boundary; measured 2× across the family at sf0.1). Pass false
    * when the input is a cheap bounded aggregate AND the caller
    * wants the source scan visible in the final plan (the checkpoint
    * starts the plan at a LogicalRDD, hiding pushdown/pruning from
    * plan pins — q284's case). */
  def withGlobalRank(df: DataFrame, key: Column, tie: Column,
      rnName: String, sums: Seq[(Column, String)] = Nil,
      nName: String = null, materialize: Boolean = true): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__rk", key.cast("long"))
    val base = if (materialize) keyed.localCheckpoint() else keyed
    val rng = base.agg(min($"__rk").as("__kmin"), max($"__rk").as("__kmax"),
      count(lit(1)).cast("long").as("__n"))
    val bucketed = base.crossJoin(broadcast(rng))
      .withColumn("__b", expr(
        s"(__rk - __kmin) div (((__kmax - __kmin) div $rankBuckets) + 1)"))
    val wIn = Window.partitionBy($"__b").orderBy($"__rk", tie)
    val wCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var inRanked = bucketed.withColumn("__rn_in", row_number().over(wIn))
    sums.zipWithIndex.foreach { case ((c, _), i) =>
      inRanked = inRanked.withColumn(s"__s_in_$i", sum(c).over(wCum))
    }
    val totAggs = count(lit(1)).cast("long").as("__c") +:
      sums.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"__t_$i") }
    val totals = bucketed.groupBy($"__b").agg(totAggs.head, totAggs.tail: _*)
    val lower = totals.select(
      ($"__b".as("__b2") +: $"__c".as("__c2") +:
        sums.indices.map(i => col(s"__t_$i").as(s"__t2_$i"))): _*)
    val offAggs = coalesce(sum($"__c2"), lit(0L)).as("__off") +:
      sums.zipWithIndex.map { case (_, i) =>
        coalesce(sum(col(s"__t2_$i")), lit(0L)).as(s"__soff_$i")
      }
    val offsets = totals.join(broadcast(lower), $"__b2" < $"__b", "left")
      .groupBy($"__b").agg(offAggs.head, offAggs.tail: _*)
    var out = inRanked.join(broadcast(offsets), Seq("__b"))
      .withColumn(rnName, ($"__off" + $"__rn_in").cast("long"))
    sums.zipWithIndex.foreach { case ((_, name), i) =>
      out = out.withColumn(name,
        (col(s"__soff_$i") + col(s"__s_in_$i")).cast("long"))
    }
    if (nName != null) out = out.withColumn(nName, $"__n")
    out.drop(
      (Seq("__rk", "__kmin", "__kmax", "__n", "__b", "__rn_in", "__off") ++
        sums.indices.flatMap(i => Seq(s"__s_in_$i", s"__soff_$i"))): _*)
  }

  /** Exact `ntile(k)` bucket (1-based BIGINT) from a global
    * row_number column `rn` and total-count column `n` (both by
    * name, as produced by [[withGlobalRank]]): the first `n % k`
    * tiles carry `n div k + 1` rows, the rest `n div k` — SQL ntile
    * semantics, reproduced arithmetically so no window is needed.
    * The `n < k` edge (each row its own tile) lands entirely in the
    * THEN branch, so the ELSE's division by `n div k = 0` is never
    * evaluated. */
  def ntileExpr(k: Int, rn: String, n: String): Column = expr(
    s"""CAST(CASE
       |  WHEN $rn <= ($n % $k) * (($n div $k) + 1)
       |    THEN ($rn - 1) div (($n div $k) + 1) + 1
       |  ELSE ($n % $k)
       |    + ($rn - 1 - ($n % $k) * (($n div $k) + 1)) div ($n div $k) + 1
       |END AS BIGINT)""".stripMargin)
}
