package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator sweep (SURVEY.md §2.2): scan, filter,
  * projection, joins (all variants), aggregation, windows, set ops,
  * sort/limit/top-k.
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §7.4):
  *  - every query ends in a total-order ORDER BY;
  *  - double aggregates are computed in exact DECIMAL then cast to
  *    double, so Spark's partial-agg ordering can't change the result;
  *  - integer-typed computed outputs are cast to BIGINT/long on both
  *    sides (Spark row_number is int, DuckDB's is int64).
  *
  * Scale notes: dimension joins (region/nation/customer/supplier/part)
  * are explicitly `broadcast()`-hinted — at 100 TB the fact table never
  * shuffles for a dim join. Aggregations are declarative groupBy/agg so
  * Catalyst plans partial (map-side) aggregation automatically.
  */
object Relational {

  /** Exact-decimal cast for 2-dp synthetic money/quantity columns. */
  private def dec(c: Column): Column  = c.cast("decimal(12,2)")
  /** Exact-decimal cast for 2-dp rate columns (discount/tax in [0,1]). */
  private def rate(c: Column): Column = c.cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(3,2)")
  /** Deterministic sum of a 2-dp double column: exact decimal sum → double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg → sort. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (one - rate($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (one - rate($"l_discount")) * (one + rate($"l_tax")))
          .cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(rate($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Filter + projection: predicates and column pruning reach the scan. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_quantity" > 45.0 && $"l_discount" >= 0.05 &&
        $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_returnflag" =!= "A")
      .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        $"l_quantity", $"l_extendedprice", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity", $"l_returnflag")
  }

  private val q02Oracle =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |WHERE l_quantity > 45.0 AND l_discount >= 0.05
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag <> 'A'
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q5 shape: multiway join, dims broadcast, fact never shuffled
    * for the dim joins — the plan that survives a 100× scale-up. */
  def q03RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li  = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
    val cust = Tables.customer(s, dir)
    val nat  = Tables.nation(s, dir)
    val reg  = Tables.region(s, dir).filter($"r_name" === "ASIA")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * (one - rate($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q03Oracle =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Window top-k per group: row_number + filter (the scalable top-k). */
  def q12TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rn")
  }

  private val q12Oracle =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_revenue_by_nation" -> (q03RevenueByNation _),
    "q12_topk_per_group"  -> (q12TopKPerGroup _),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Oracle,
    "q02_filter_project"  -> q02Oracle,
    "q03_revenue_by_nation" -> q03Oracle,
    "q12_topk_per_group"  -> q12Oracle,
  )
}
