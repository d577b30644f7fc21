package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Engine extensibility surface (SURVEY.md §2.2 "UDF / UDAF / UDTF")
  * and auxiliary source formats.
  *
  * The engine's stance is functions-not-UDFs on every hot path; this
  * module demonstrates that the extension points nevertheless exist
  * and compose: a scalar Scala `udf`, a typed `Aggregator` UDAF, and
  * a CSV round-trip source. The UDAF is deliberately order-insensitive
  * (max-tracking, no floating summation) so its result is exact and
  * DuckDB-comparable regardless of partitioning.
  */
object ExtOps {

  // ---------------------------------------------------------------- q26
  /** Scalar UDF: discount band. Catalyst can't see into it (no
    * pushdown/codegen through the lambda) — acceptable for a
    * low-cardinality derived grouping key, never for a filter you
    * want pushed to the scan. */
  private val discountBand = udf { d: Double =>
    if (d < 0.03) "low" else if (d < 0.07) "mid" else "high"
  }

  /** Typed UDAF: second-largest distinct value. Buffer is (max1,
    * max2); merge is commutative+associative, comparisons only — no
    * double summation, so the result is exact under any partition
    * order (the property that makes it safely oracle-comparable).
    * A group with fewer than two distinct values yields NULL (boxed
    * output), matching SQL's `max(x) FILTER (x < max)` — the -∞
    * sentinel never escapes the buffer. */
  object SecondMax extends Aggregator[Double, (Double, Double), java.lang.Double] {
    private val MinV = Double.NegativeInfinity
    def zero: (Double, Double) = (MinV, MinV)
    def reduce(b: (Double, Double), x: Double): (Double, Double) = insert(b, x)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      insert(insert(a, b._1), b._2)
    private def insert(b: (Double, Double), x: Double): (Double, Double) =
      if (x == b._1 || x == b._2) b             // distinct semantics
      else if (x > b._1) (x, b._1)
      else if (x > b._2) (b._1, x)
      else b
    def finish(b: (Double, Double)): java.lang.Double =
      if (b._2 == MinV) null else Double.box(b._2)
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.product
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  def q26UdfUdaf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val secondMax = udaf(SecondMax)
    Tables.lineitem(s, dir)
      .select(discountBand($"l_discount").as("band"), $"l_extendedprice")
      .groupBy($"band")
      .agg(count(lit(1)).as("n"),
        max($"l_extendedprice").as("max_price"),
        secondMax($"l_extendedprice").as("second_max_price"))
      .orderBy($"band")
  }

  private val q26Oracle =
    """WITH t AS (
      |  SELECT CASE WHEN l_discount < 0.03 THEN 'low'
      |              WHEN l_discount < 0.07 THEN 'mid'
      |              ELSE 'high' END AS band,
      |         l_extendedprice
      |  FROM lineitem),
      |m AS (SELECT band, max(l_extendedprice) mx FROM t GROUP BY band)
      |SELECT t.band, count(*) AS n, max(l_extendedprice) AS max_price,
      |  max(l_extendedprice) FILTER (l_extendedprice < mx) AS second_max_price
      |FROM t JOIN m ON t.band = m.band
      |GROUP BY t.band ORDER BY t.band""".stripMargin

  // ---------------------------------------------------------------- q81
  /** CSV source/sink round-trip: write `nation` as headered CSV,
    * read it back with a declared schema (FAILFAST — the contract
    * path never infers), prove fidelity against the parquet oracle.
    * CSV is the interchange format; Parquet stays the table format. */
  def q81CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft_csv").toString
    Tables.nation(s, dir)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST")
      .csv(tmp)
      .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
        $"n_regionkey".cast("long").as("n_regionkey"))
      .orderBy($"n_nationkey")
  }

  private val q81Oracle =
    """SELECT CAST(n_nationkey AS BIGINT) n_nationkey, n_name,
      |  CAST(n_regionkey AS BIGINT) n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q82
  /** ORC source/sink round-trip — the second columnar format Spark
    * ships natively (vectorized reader, predicate pushdown, the
    * format a warehouse migration actually hands you). `supplier`
    * exercises long/string/int/double fidelity; the declared-schema
    * read mirrors q81's no-inference contract stance, and the oracle
    * is the parquet original, so any encode/decode drift fails the
    * hash. */
  def q82OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft_orc").toString
    Tables.supplier(s, dir).write.mode("overwrite").orc(tmp)
    s.read.schema(StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))))
      .orc(tmp)
      .orderBy($"s_suppkey")
  }

  private val q82Oracle =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_udf_udaf"      -> (q26UdfUdaf _),
    "q81_csv_roundtrip" -> (q81CsvRoundtrip _),
    "q82_orc_roundtrip" -> (q82OrcRoundtrip _),
  )

  val oracles: Map[String, String] = Map(
    "q26_udf_udaf"      -> q26Oracle,
    "q81_csv_roundtrip" -> q81Oracle,
    "q82_orc_roundtrip" -> q82Oracle,
  )
}
